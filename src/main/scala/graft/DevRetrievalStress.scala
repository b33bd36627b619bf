package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Retrieval-family scale battery (round-14 verdict item #6): the
  * q140/q161 lesson says toy-scale equality specs don't certify the
  * regime that carries the scale claim — so build/append/probe the
  * persisted BM25 and IVF tiers, plus the hybrid fusion, astride a 1×
  * and a 10× corpus and record how each verb's cost actually moves.
  *
  * Expected shape (the claims under test):
  *   - builds scale ~linearly (one corpus pass each);
  *   - appends are batch-proportional — FLAT across corpus growth;
  *   - the BM25 probe grows with the MATCHING-ROW slice (the query
  *     terms' tf rows: ~10× more matching docs at 10×), never with a
  *     corpus re-tokenize — the gap between those two slopes is the
  *     entire value of the build/probe split;
  *   - the IVF probe grows with the probed lists (nProbe/nCentroids
  *     of the corpus);
  *   - the multi-query forms pay their corpus-side cost once per
  *     BATCH: a 3-query hybridProbeJoin must cost ~1×, not ~3×, its
  *     single-query twin.
  *
  * Usage: runMain graft.DevRetrievalStress [reps]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS — as Bench.
  */
object DevRetrievalStress {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.text.TextStats
    import graft.vector.Similarity
    import graft.ops.Retrieval

    def timed(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[retrievalstress] $label%-38s $s%8.3f s  (rows=$n)")
      s
    }
    def warm(label: String)(f: => Long): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = ts.map(_._1).min
      println(f"[retrievalstress] $label%-38s $best%8.3f s warm-min of $reps  (rows=${ts.head._2})")
      best
    }

    val docs1 = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val emb1 = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
    // 10×: replicas keep the text (same matching slope per doc) under
    // remapped ids; the replica suffix varies doclen/vocabulary a
    // little so the corpora aren't pathologically identical
    val rep = spark.range(10).select(col("id").as("_r"))
    val docs10 = docs1.crossJoin(rep)
      .select((col("doc_id") * 16 + col("_r")).as("doc_id"),
        concat(col("text"), lit(" rep"), col("_r")).as("text"))
    val emb10 = emb1.crossJoin(rep)
      .select((col("vec_id") * 16 + col("_r")).as("vec_id"), col("embedding"))
    val batch1 = docs1.limit(100)
      .select((col("doc_id") + 100000000L).as("doc_id"), col("text"))
    val terms = Seq("spark", "vector", "merge")
    val qs = Seq((0L, Seq("spark", "vector", "merge")),
        (16L, Seq("hash", "join", "stream")),
        (32L, Seq("window", "sort"))).toDF("query_id", "terms")

    for ((scale, d, e) <- Seq(("1x", docs1, emb1), ("10x", docs10, emb10))) {
      val nDocs = d.count(); val nVecs = e.count()
      println(s"[retrievalstress] ===== $scale: $nDocs docs, $nVecs vectors =====")
      val bmIdx = java.nio.file.Files.createTempDirectory(s"graft_rs_bm_$scale")
        .toString + "/index"
      val ivfIdx = java.nio.file.Files.createTempDirectory(s"graft_rs_ivf_$scale")
        .toString + "/index"
      timed(s"$scale bm25_build") {
        TextStats.buildBm25Index(d, "doc_id", "text", bmIdx); nDocs }
      timed(s"$scale ivf_build") {
        Similarity.buildIvfIndex(e, "vec_id", "embedding", ivfIdx); nVecs }
      warm(s"$scale bm25_append_100docs") {
        // fresh ids per rep (appends must carry new docs)
        val b = batch1.select(
          (col("doc_id") + (scala.util.Random.nextInt(1 << 20).toLong << 32))
            .as("doc_id"), col("text"))
        TextStats.appendBm25Index(b, "doc_id", "text", bmIdx); 100L }
      warm(s"$scale bm25_probe") {
        TextStats.bm25Probe(spark, bmIdx, terms).count() }
      warm(s"$scale bm25_probe_join_3q") {
        TextStats.bm25ProbeJoin(spark, bmIdx, qs).count() }
      warm(s"$scale ivf_probe") {
        Similarity.ivfProbeById(spark, ivfIdx, e, "vec_id", "embedding",
          0L, 10).count() }
      warm(s"$scale hybrid_probe_1q") {
        Retrieval.hybridProbeTopK(spark, bmIdx, ivfIdx, e, "vec_id",
          "embedding", terms, 0L).count() }
      warm(s"$scale hybrid_probe_join_3q") {
        val n = Retrieval.hybridProbeJoin(spark, bmIdx, ivfIdx, e,
          "vec_id", "embedding", qs).count()
        graft.engine.Caches.releaseAll()
        n }
      graft.engine.Caches.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
