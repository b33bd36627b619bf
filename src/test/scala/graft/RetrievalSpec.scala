package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Retrieval
import graft.vector.Similarity

/** Hybrid retrieval (RRF fusion) and filtered ANN. */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("rrfFuse: two-list arithmetic, union semantics, id tiebreak") {
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "lex_rank")
    val dense = Seq((20L, 1L), (40L, 2L)).toDF("id", "dense_rank")
    val out = Retrieval.rrfFuse(lex, dense, kRrf = 60, topK = 10)
      .as[(Long, Option[Long], Option[Long], Double)].collect().toSeq
    // 20 appears on both lists: 1/62 + 1/61 beats every single-list score
    assert(out.head._1 === 20L)
    assert(out.head._4 === BigDecimal(1.0 / 62 + 1.0 / 61)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // one-sided ids keep their single-term score (missing term = 0)
    val m = out.map(r => r._1 -> r._4).toMap
    assert(m(10L) === BigDecimal(1.0 / 61)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(m(40L) === BigDecimal(1.0 / 62)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // 10 (lex rank 1) and 40 (dense rank 2): 1/61 > 1/62; 20 > 10 > 40 > 30
    assert(out.map(_._1) === Seq(20L, 10L, 40L, 30L))
  }

  test("rrfFuse: equal scores break ties by id ascending") {
    val lex = Seq((7L, 1L)).toDF("id", "lex_rank")
    val dense = Seq((3L, 1L)).toDF("id", "dense_rank")
    val out = Retrieval.rrfFuse(lex, dense, kRrf = 60, topK = 10)
      .select("id").as[Long].collect().toSeq
    assert(out === Seq(3L, 7L))
  }

  test("hybridTopK: fuses the BM25 and cosine lists over the testdata corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Retrieval.hybridTopK(docs, emb, "doc_id", "text",
      "vec_id", "embedding", Seq("spark", "vector", "merge"), 0L,
      perList = 10, topK = 10)
    val rows = out.collect()
    assert(rows.length === 10)
    // the fused score must equal the recomputed terms row by row
    rows.foreach { r =>
      val lexT = if (r.isNullAt(1)) 0.0 else 1.0 / (60 + r.getLong(1))
      val denT = if (r.isNullAt(2)) 0.0 else 1.0 / (60 + r.getLong(2))
      val want = BigDecimal(lexT + denT)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === want)
    }
    // descending by fused score with the id tiebreak (total order)
    val key = rows.map(r => (-r.getDouble(3), r.getLong(0))).toSeq
    assert(key === key.sorted)
  }

  test("filteredTopK: selective predicate takes the exact path; broad-path probe at full width matches it") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val idx = java.nio.file.Files.createTempDirectory("graft_fann").toString + "/index"
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", idx)
    val allowed = emb.filter(col("label") === 1).select(col("vec_id").as("id"))
    val exact = Similarity.cosineTopK(
        emb.filter(col("label") === 1 || col("vec_id") === 0L),
        "vec_id", "embedding", 0L, 10)
      .as[(Long, Double)].collect().toSeq
    // selective path (default budget): exact by construction
    val sel = Similarity.filteredTopK(spark, idx, emb, "vec_id", "embedding",
        allowed, 0L, 10)
      .as[(Long, Double)].collect().toSeq
    assert(sel === exact)
    // broad path forced (budget 0) at FULL probe width: the pruned
    // probe degenerates to a full scan, so it must equal the exact
    // scan — the law anchoring the width/recall trade
    val broadFull = Similarity.filteredTopK(spark, idx, emb, "vec_id",
        "embedding", allowed, 0L, 10,
        nProbe = graft.ops.GuardBounds.DefaultIvfCentroids,
        bruteForceBelow = 0L)
      .as[(Long, Double)].collect().toSeq
    assert(broadFull === exact)
    // narrow probe: hits are a subset of some valid ranking and every
    // hit satisfies the predicate (recall < 1 is allowed, leakage is not)
    val narrow = Similarity.filteredTopK(spark, idx, emb, "vec_id",
        "embedding", allowed, 0L, 10, nProbe = 4, bruteForceBelow = 0L)
      .as[(Long, Double)].collect().toSeq
    val labels = emb.filter(col("vec_id").isin(narrow.map(_._1): _*))
      .select("label").distinct().as[Int].collect().toSeq
    assert(labels === Seq(1))
  }

  test("ivfProbeWhere: empty predicate set yields an empty result; bad frame shape refuses") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val idx = java.nio.file.Files.createTempDirectory("graft_fann2").toString + "/index"
    Similarity.buildIvfIndex(emb, "vec_id", "embedding", idx, nCentroids = 4)
    val none = emb.filter(col("label") === -1).select(col("vec_id").as("id"))
    assert(Similarity.ivfProbeByIdWhere(spark, idx, emb, "vec_id", "embedding",
      none, 0L, 10, nProbe = 4).count() === 0L)
    val bad = emb.select(col("vec_id"), col("label"))
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfProbeWhere(spark, idx, bad, Seq(1.0, 0.0), 5)
    }
    assert(e.getMessage.contains("single `id` column"))
  }
}
