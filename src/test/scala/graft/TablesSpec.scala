package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{BINARY, DOUBLE, INT64}
import org.apache.parquet.schema.Types
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-encoding robustness for `events.ts` (round-7 regression).
  *
  * The driver's testdata generator has shipped `ts` in three parquet
  * encodings across rounds — TIMESTAMP(NANOS) (Spark reads it as Long
  * under the `nanosAsLong` legacy conf), plain `timestamp[us]`
  * (TIMESTAMP_NTZ under Spark 4 inference), and `timestamp[us, UTC]`
  * (TIMESTAMP) — and a re-encode between rounds broke `Stats.twap`
  * (`unix_micros` rejects NTZ) without any test going red. This spec
  * pins the contract: [[Tables.load]] normalizes every encoding to
  * session-TZ TIMESTAMP, and the events-consuming operator battery
  * returns bit-identical results on all three.
  */
class TablesSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private val sfDir = "/root/testdata/sf0.001"

  /** The battery: every registry query that consumes ONLY the events
    * table — window dedup, lag/lead, sessionize, OHLC resample, hourly
    * gap-fill+ffill, TWAP (the round-7 casualty), realized variance. */
  private val battery = Seq("q02_dedup_latest", "q15_window_lag",
    "q25_sessionize", "q59_ohlc_bars", "q77_gap_fill", "q91_twap",
    "q121_realized_variance")

  // one fixture set for the whole suite: <tmp>/<enc>/events.parquet
  private lazy val fixtures: Map[String, String] = {
    val base = Files.createTempDirectory("graft-ts-enc").toString
    val canonical = Tables.events(spark, sfDir) // normalized: ts TIMESTAMP
    assert(canonical.schema("ts").dataType == TimestampType)

    // LTZ: timestamp[us] adjusted-to-UTC (pin MICROS; Spark's default
    // INT96 would also read back as TIMESTAMP but is deprecated)
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    canonical.coalesce(1).write.mode("overwrite")
      .parquet(s"$base/ltz/events.parquet")

    // NTZ: timestamp[us] NOT adjusted to UTC — byte-for-byte the shape
    // the regenerated driver testdata ships (the round-7 breaker)
    canonical.withColumn("ts", col("ts").cast(TimestampNTZType))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$base/ntz/events.parquet")

    // NANOS: genuine TIMESTAMP(NANOS) annotation, which Spark's writer
    // cannot produce — written via parquet-java's example writer so the
    // `nanosAsLong` legacy-conf read path is exercised for real
    // written as a part file inside an events.parquet DIRECTORY so the
    // batch reader and the file stream source (needs a dir) both work
    writeNanosFixture(canonical, s"$base/nanos/events.parquet/part-0.parquet")

    Map("ltz" -> s"$base/ltz", "ntz" -> s"$base/ntz",
        "nanos" -> s"$base/nanos")
  }

  private def writeNanosFixture(canonical: DataFrame, file: String): Unit = {
    val schema = Types.buildMessage()
      .optional(INT64).named("event_id")
      .optional(INT64)
        .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS))
        .named("ts")
      .optional(INT64).named("user_id")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .optional(DOUBLE).named("value")
      .optional(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val rows = canonical.select(col("event_id"),
        (unix_micros(col("ts")) * 1000L).as("ts_nanos"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .collect() // sf0.001 fixture: 1k rows, test-only
    val writer = ExampleParquetWriter.builder(new Path(file))
      .withType(schema).withConf(new Configuration()).build()
    val factory = new SimpleGroupFactory(schema)
    try rows.foreach { r =>
      val g = factory.newGroup()
      if (!r.isNullAt(0)) g.append("event_id", r.getLong(0))
      if (!r.isNullAt(1)) g.append("ts", r.getLong(1))
      if (!r.isNullAt(2)) g.append("user_id", r.getLong(2))
      if (!r.isNullAt(3)) g.append("event_type", r.getString(3))
      if (!r.isNullAt(4)) g.append("value", r.getDouble(4))
      if (!r.isNullAt(5)) g.append("props", r.getString(5))
      writer.write(g)
    } finally writer.close()
  }

  test("Tables.load normalizes all three ts encodings to TIMESTAMP") {
    fixtures.foreach { case (enc, dir) =>
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType == TimestampType,
        s"$enc: expected TIMESTAMP after load, got ${df.schema("ts").dataType}")
    }
  }

  test("raw fixture schemas differ as intended (the spec tests something)") {
    // guard against a future Spark writer change silently collapsing the
    // three fixtures into one encoding
    import org.apache.spark.sql.types.LongType
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = fixtures.map { case (enc, dir) =>
      enc -> spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType }
    assert(raw("ltz") == TimestampType)
    assert(raw("ntz") == TimestampNTZType)
    assert(raw("nanos") == LongType)
  }

  test("events rows are value-identical across encodings") {
    val sets = fixtures.view.mapValues { dir =>
      Tables.events(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .collect().map(_.toSeq).toSet
    }.toMap
    assert(sets("ntz") == sets("ltz"), "ntz vs ltz")
    assert(sets("nanos") == sets("ltz"), "nanos vs ltz")
    assert(sets("ltz").size == 1000)
  }

  test("events operator battery is identical across all three encodings") {
    battery.foreach { q =>
      val fn = SparkEntry.queries(q)
      val results = fixtures.view.mapValues { dir =>
        val out = fn(spark, dir)
        // timestamps compared as epoch micros so NTZ-vs-LTZ display
        // differences can't mask (or fake) a value difference
        val cols = out.schema.fields.map { f => f.dataType match {
          case TimestampType | TimestampNTZType =>
            unix_micros(col(f.name).cast(TimestampType)).as(f.name)
          case _ => col(f.name)
        }}
        out.select(cols.toIndexedSeq: _*).collect().map(_.toSeq).toSet
      }.toMap
      assert(results("ltz").nonEmpty, s"$q returned no rows")
      assert(results("ntz") == results("ltz"), s"$q: ntz differs from ltz")
      assert(results("nanos") == results("ltz"), s"$q: nanos differs from ltz")
      spark.catalog.clearCache()
    }
  }

  test("streaming watermark path tolerates every encoding") {
    // file-source micro-batch over each fixture dir: watermark + windowed
    // count must agree across encodings (watermarks require TIMESTAMP —
    // the normalize-at-load contract is what makes this work for NTZ/nanos)
    val counts = fixtures.map { case (enc, dir) =>
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val schema = spark.read.parquet(s"$dir/events.parquet").schema
      val stream = Tables.normalizeTs(
        spark.readStream.schema(schema).parquet(s"$dir/events.parquet"), "ts")
      val q = stream.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 day")).count()
        .writeStream.format("memory").queryName(s"ts_enc_$enc")
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000),
        s"$enc: stream did not terminate within 120 s — partial table")
      val out = spark.table(s"ts_enc_$enc")
        .select(unix_micros(col("window.start")), col("count"))
        .collect().map(_.toSeq).toSet
      enc -> out
    }
    assert(counts("ltz").nonEmpty)
    assert(counts("ntz") == counts("ltz"))
    assert(counts("nanos") == counts("ltz"))
  }
}
