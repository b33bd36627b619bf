package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The quantile sketch's lifecycle and laws (round 12 — the sketch
  * suite's fourth axis): persisted build / append-merge / read, the
  * k ≥ n exactness law, and the winsorizedStats degrade wiring.
  */
class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def events(ids: Range, types: Int = 3) =
    ids.map(i => (i.toLong, s"t${i % types}", (i * 37 % 101) / 7.0 + i % 13))
      .toDF("event_id", "event_type", "value")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("lifecycle: build + append equals a rebuild on the union") {
    val standing = events(0 until 800)
    val batch = events(800 until 1000)
    val root = java.nio.file.Files.createTempDirectory("graft_qsk_l")
      .toString + "/q"
    graft.ops.Stats.buildQuantileSketch(standing, "event_type", "event_id",
      col("value"), k = 64, root)
    graft.ops.Stats.appendQuantileSketch(spark, batch, "event_type",
      "event_id", col("value"), root)
    val appended = rows(spark.read.parquet(s"$root/samples"))
    val root2 = java.nio.file.Files.createTempDirectory("graft_qsk_l2")
      .toString + "/q"
    graft.ops.Stats.buildQuantileSketch(standing.unionByName(batch),
      "event_type", "event_id", col("value"), k = 64, root2)
    val rebuilt = rows(spark.read.parquet(s"$root2/samples"))
    assert(appended === rebuilt,
      "append-merge must equal a rebuild on corpus ∪ batch (bit-equal samples)")
    // and the read path equals the self-deriving sweep on the union
    val fromSketch = rows(graft.ops.Stats.quantileFromSketch(spark, root))
    val selfDerived = rows(graft.ops.Stats.quantileSketch(
      standing.unionByName(batch), "event_type", "event_id",
      col("value"), k = 64))
    assert(fromSketch === selfDerived, "indexed ≡ inline")
  }

  test("law: with k >= group size the sketch IS the group — estimates " +
    "equal exact percentiles bit-for-bit") {
    val df = events(0 until 300)
    val audit = graft.ops.Stats.quantileSketchAudit(df, "event_type",
      "event_id", col("value"), k = 1000)
    val bad = audit.filter(
      graft.ops.Stats.QuantileProbs.map(p =>
        col("err_" + graft.ops.Stats.probName(p)) =!= 0.0)
        .reduce(_ || _))
    assert(bad.count() === 0, "k >= n must zero every error column")
    assert(audit.filter(col("k_eff") =!= col("n")).count() === 0)
  }

  test("re-delivered batch rows collapse: appending an overlapping " +
    "batch equals appending only its new rows") {
    val standing = events(0 until 500)
    val overlapping = events(400 until 700) // 100 re-delivered rows
    val root = java.nio.file.Files.createTempDirectory("graft_qsk_d")
      .toString + "/q"
    graft.ops.Stats.buildQuantileSketch(standing, "event_type", "event_id",
      col("value"), k = 32, root)
    graft.ops.Stats.appendQuantileSketch(spark, overlapping, "event_type",
      "event_id", col("value"), root)
    val got = rows(spark.read.parquet(s"$root/samples"))
    val root2 = java.nio.file.Files.createTempDirectory("graft_qsk_d2")
      .toString + "/q"
    graft.ops.Stats.buildQuantileSketch(events(0 until 700), "event_type",
      "event_id", col("value"), k = 32, root2)
    assert(got === rows(spark.read.parquet(s"$root2/samples")))
  }

  test("winsorizedStats degrade: past the distinct guard with sampleK >= " +
    "group size, cuts come from the sample and equal the exact path") {
    val df = events(0 until 400)
    val exact = rows(graft.ops.Stats.winsorizedStats(df, "event_type",
      col("value"), pLo = 0.05, pHi = 0.95))
    // force the degrade (guard of 1 distinct value) with a sample big
    // enough to BE each group — the cut derivation must then match the
    // exact path bit-for-bit
    val degraded = rows(graft.ops.Stats.winsorizedStats(df, "event_type",
      col("value"), pLo = 0.05, pHi = 0.95, idCol = Some("event_id"),
      maxExactDistinct = 1L, sampleK = 100000))
    assert(degraded === exact)
  }

  test("winsorizedStats degrade without idCol refuses loudly") {
    val df = events(0 until 100)
    val e = intercept[IllegalArgumentException] {
      graft.ops.Stats.winsorizedStats(df, "event_type", col("value"),
        pLo = 0.05, pHi = 0.95, maxExactDistinct = 1L).collect()
    }
    assert(e.getMessage.contains("pass idCol"))
  }

  test("empty input: zero-row frames produce zero-row sketches, not errors") {
    val df = events(0 until 0)
    assert(graft.ops.Stats.quantileSketch(df, "event_type", "event_id",
      col("value"), k = 8).count() === 0)
    val root = java.nio.file.Files.createTempDirectory("graft_qsk_e")
      .toString + "/q"
    graft.ops.Stats.buildQuantileSketch(df, "event_type", "event_id",
      col("value"), k = 8, root)
    assert(graft.ops.Stats.quantileFromSketch(spark, root).count() === 0)
  }

  test("quantileDriftFromSketch equals the self-deriving drift on the " +
    "sketch's build corpus (indexed ≡ inline)") {
    val baseline = events(0 until 600)
    val current = events(600 until 800)
    val root = java.nio.file.Files.createTempDirectory("graft_qsk_dr")
      .toString + "/q"
    graft.ops.Stats.buildQuantileSketch(baseline, "event_type", "event_id",
      col("value"), k = 64, root)
    val inline = rows(graft.ops.Stats.quantileDrift(current, baseline,
      "event_type", "event_id", col("value"), k = 64))
    val indexed = rows(graft.ops.Stats.quantileDriftFromSketch(spark,
      current, root, "event_type", "event_id", col("value")))
    assert(indexed === inline)
  }

  test("percentilesGuarded: degrade with sampleK >= group size equals " +
    "the exact path; refusal without idCol") {
    val df = events(0 until 400)
    val exact = rows(graft.ops.Stats.percentilesGuarded(df, "event_type",
      col("value"), Seq(0.25, 0.5, 0.75)))
    val degraded = rows(graft.ops.Stats.percentilesGuarded(df, "event_type",
      col("value"), Seq(0.25, 0.5, 0.75), idCol = Some("event_id"),
      maxExactDistinct = 1L, sampleK = 100000))
    assert(degraded === exact)
    val e = intercept[IllegalArgumentException] {
      graft.ops.Stats.percentilesGuarded(df, "event_type", col("value"),
        Seq(0.5), maxExactDistinct = 1L).collect()
    }
    assert(e.getMessage.contains("pass idCol"))
  }

  test("append crash mid-swap self-heals on the next read") {
    val root = java.nio.file.Files.createTempDirectory("graft_qsk_c")
      .toString + "/q"
    graft.ops.Stats.buildQuantileSketch(events(0 until 300), "event_type",
      "event_id", col("value"), k = 16, root)
    val expected = rows(graft.ops.Stats.quantileFromSketch(spark, root))
    val live = s"$root/samples"
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(live).repartition(1)
      .write.mode("overwrite").parquet(live + "_swap_staging")
    fs.create(new org.apache.hadoop.fs.Path(live + "_swap_staging",
      "_graft_staged_complete"), true).close()
    require(fs.rename(new org.apache.hadoop.fs.Path(live),
      new org.apache.hadoop.fs.Path(live + "_swap_old")))
    assert(rows(graft.ops.Stats.quantileFromSketch(spark, root)) === expected)
  }
}
