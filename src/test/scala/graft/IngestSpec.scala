package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

import graft.ops.Ingest

/** Ingestion sources: paged REST-style fetch (S1), safe-coerced
  * collection rows (S2), JSON inference (S7).
  */
class IngestSpec extends AnyFunSuite {

  test("ORC write/read roundtrip preserves rows, schema, and nulls") {
    val spark0 = TestSession.spark
    import spark0.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_spec").toString + "/t"
    val df = Seq(("a", Some(1.5), 10L), ("b", None, 20L), ("a", Some(-2.25), 30L))
      .toDF("k", "v", "n")
    graft.engine.Layout.writeOrc(df, dir)
    val back = graft.ops.Ingest.fromOrc(spark0, dir)
    // names+types survive (nullability widens on any columnar read-back)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.as[(String, Option[Double], Long)].collect().toSet ===
      Set(("a", Some(1.5), 10L), ("b", None, 20L), ("a", Some(-2.25), 30L)))
  }
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def coin(id: String, price: Any): Map[String, Any] =
    Map("id" -> id, "symbol" -> id.take(3), "name" -> id.capitalize,
      "current_price" -> price, "market_cap" -> 1000L,
      "total_volume" -> 10L, "last_updated" -> "2024-01-01T00:00:00Z")

  test("paged fetch concatenates pages and stops at the first empty page") {
    val pages = Map(
      1 -> Seq(coin("bitcoin", 50000.0), coin("ethereum", 3000.0)),
      2 -> Seq(coin("dogecoin", 0.1)),
      3 -> Seq.empty[Map[String, Any]],
      4 -> Seq(coin("ghost", 1.0))) // never reached: page 3 was empty
    val df = Ingest.fetchPaged(spark, p => pages(p), maxPages = 10)
    assert(df.count() === 3)
    assert(df.select("id").as[String].collect().toSet ===
      Set("bitcoin", "ethereum", "dogecoin"))
  }

  test("row coercion defaults bad numerics and drops rows missing identity") {
    val raw = Seq(
      coin("bitcoin", "not-a-number"),      // price coerced to 0.0
      coin("ethereum", 3000.0) - "id")      // dropped: no id
    val df = Ingest.rowsFromMaps(spark, raw)
    val rows = df.select("id", "current_price").as[(String, Double)].collect()
    assert(rows.toSeq === Seq(("bitcoin", 0.0)))
  }

  test("json ingestion infers the payload schema") {
    val json = Seq(
      """{"id":"bitcoin","current_price":50000.5,"market_cap":123}""",
      """{"id":"ethereum","current_price":3000.25,"market_cap":456}""").toDS()
    val df = Ingest.fromJson(spark, json)
    assert(df.columns.sorted.toSeq === Seq("current_price", "id", "market_cap"))
    assert(df.count() === 2)
  }

  test("stratified sample: seeded, reproducible, approximately proportional") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val total = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val strata = total.keys.toSeq.sorted
    val fracs = strata.zipWithIndex
      .map { case (s, i) => s -> (if (i % 2 == 0) 0.5 else 0.0) }.toMap
    val sampled = Ingest.stratifiedSample(docs, "source", fracs, seed = 42L)
    val got = sampled.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // dropped strata are absent; kept strata near 50% (Bernoulli tolerance)
    strata.zipWithIndex.foreach { case (s, i) =>
      if (i % 2 == 1) assert(!got.contains(s))
      else {
        val expect = total(s) * 0.5
        assert(math.abs(got(s) - expect) <= expect * 0.5, s"stratum $s: ${got(s)} vs $expect")
      }
    }
    // same seed → identical sample (reproducible curation)
    val again = Ingest.stratifiedSample(docs, "source", fracs, seed = 42L).count()
    assert(again === sampled.count())
  }

  test("csv ingestion parses typed rows and quarantines malformed ones") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_in")
    java.nio.file.Files.write(dir.resolve("in.csv"),
      "id,price\n1,10.5\n2,notanumber\n3,7.25\n".getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("price", DoubleType)))
    // cache so the full schema parses once: with column pruning, a scan
    // that never reads `price` would not notice row 2 is malformed
    val got = Ingest.fromCsv(spark, dir.toString, schema).cache()
    got.count()
    val good = got.filter(col("_corrupt_record").isNull)
      .select("id", "price").as[(Long, Double)].collect().toSet
    assert(good === Set((1L, 10.5), (3L, 7.25)))
    // the malformed row survives for quarantine with its raw line intact
    val bad = got.filter(col("_corrupt_record").isNotNull)
      .select("id", "_corrupt_record").as[(Long, String)].collect()
    assert(bad.toSeq === Seq((2L, "2,notanumber")))
  }
}
