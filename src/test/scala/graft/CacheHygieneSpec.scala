package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Caches
import graft.multimodal.Curate
import graft.text.{Clusters, Dedup}

/** The round-8 leak, pinned: operator-internal persist()s and
  * checkpoint blocks must not accumulate across repeated in-session
  * calls. `getPersistentRDDs` is the deterministic instrument — the
  * BENCH_r08 symptom (q162 degrading 4.7 → 10.4 → 21.3 s across reps)
  * was orphaned storage, so "no storage growth" IS the regression
  * gate, without a flaky wall-clock assertion. (The steady-state
  * TIMING evidence lives in BASELINE.md via DevAppendSteady.)
  */
class CacheHygieneSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private def storedRdds: Int = spark.sparkContext.getPersistentRDDs.size

  /** Sweep everything (other suites share this JVM), then snapshot. */
  private def cleanBaseline(): Int = {
    Caches.releaseAll()
    spark.catalog.clearCache()
    storedRdds
  }

  private def docsDf(tag: String) = Seq(
    1L -> s"alpha beta gamma delta epsilon zeta $tag one",
    2L -> s"alpha beta gamma delta epsilon zeta $tag one",
    3L -> s"totally different words nothing shared here $tag",
    4L -> s"another unrelated document with its own tokens $tag"
  ).toDF("doc_id", "text")

  test("appendManifest is self-cleaning: N appends leave only N batch-sized results") {
    val corpus = docsDf("corpus")
    val base = cleanBaseline()
    (1 to 3).foreach { i =>
      val batch = Seq((100L + i) -> s"alpha beta gamma delta epsilon zeta corpus one")
        .toDF("doc_id", "text")
      val out = Curate.appendManifest(spark, corpus, batch, "doc_id", "text")
      assert(out.count() == 1)
      // each call may leave ONLY its own materialized result (1 RDD) —
      // the r8 leak left ~6+ corpus-sized internals per call
      assert(storedRdds - base <= i,
        s"append $i leaked internals: $storedRdds stored vs baseline $base")
    }
    Caches.releaseAll()
    assert(storedRdds <= base, "releaseAll did not restore the baseline")
  }

  test("appendDedup verdicts identical under the self-cleaning wrapper") {
    val corpus = docsDf("x")
    val batch = Seq(
      50L -> "alpha beta gamma delta epsilon zeta x one", // dup of 1
      51L -> "fresh novel content seen nowhere else at all"
    ).toDF("doc_id", "text")
    val rows = Clusters.appendDedup(corpus, batch, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getBoolean(2)))
    assert(rows.toSeq == Seq(
      (50L, Some(1L), false), // duplicates corpus doc 1 (min of its component)
      (51L, None, true)))     // novel → kept
    Caches.releaseAll()
  }

  test("jaccardPairs internals are registry-tracked and released by releaseAll") {
    val base = cleanBaseline()
    val pairs = Dedup.jaccardPairs(docsDf("y"), "doc_id", "text", 3, 0.5)
    assert(pairs.count() == 1) // docs 1-2 are exact dups
    assert(storedRdds > base, "expected the shingle relation persisted")
    Caches.releaseAll()
    assert(storedRdds <= base, "releaseAll left shingle storage behind")
  }

  test("connectedComponents star path frees intermediate rounds in-loop") {
    val base = cleanBaseline()
    // maxLocalEdges = 0 forces the distributed star rounds on a graph
    // small enough for a unit test; the chain needs several rounds
    val edges = (1L until 16L).map(i => (i, i + 1)).toDF("src", "dst")
    val comp = Clusters.connectedComponents(edges, "src", "dst",
      maxLocalEdges = 0L)
    assert(comp.select(countDistinct(col("component"))).head().getLong(0) == 1)
    assert(comp.agg(min(col("component"))).head().getLong(0) == 1L)
    // only the FINAL round's checkpoint may remain (plus nothing else):
    // before the fix every round's blocks lingered until driver GC
    assert(storedRdds - base <= 1,
      s"star rounds leaked intermediates: $storedRdds vs baseline $base")
    Caches.releaseAll()
    assert(storedRdds <= base)
  }

  test("releaseSince releases only frames tracked after the mark") {
    val base = cleanBaseline()
    val before = Caches.persisted("hygiene.before", docsDf("a"))
    before.count()
    val m = Caches.mark()
    val after = Caches.persisted("hygiene.after", docsDf("b"))
    after.count()
    val mid = storedRdds
    Caches.releaseSince(m)
    assert(storedRdds < mid, "releaseSince freed nothing")
    assert(Caches.trackedCount == m)
    Caches.releaseAll()
    assert(Caches.trackedCount == 0)
    assert(storedRdds <= base)
  }
}
