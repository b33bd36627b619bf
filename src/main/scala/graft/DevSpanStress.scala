package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress for the exact-substring span family: run dupSpans and
  * stripDupSpans on the sf0.1 corpus and on a 10× replica built from
  * id-shifted copies. The replica is a WORST CASE on purpose — every
  * document is then duplicated k× corpus-wide, so every non-first copy
  * is one whole-doc span: marking rows grow linearly with the corpus
  * while output stays span-shaped, and wall-clock should track the
  * gram volume (~linear), never pairs (a pairwise formulation would be
  * k² in the copy count).
  *
  * Usage: runMain graft.DevSpanStress [k]
  */
object DevSpanStress {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val base = docs.count()

    def replicate(times: Int) = (0 until times)
      .map(i => docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("text")))
      .reduce(_ unionByName _)

    for (times <- Seq(1, k)) {
      val corpus = replicate(times)
      val t0 = System.nanoTime()
      val nSpans = text.Dedup.dupSpans(corpus, "doc_id", "text", 5).count()
      val t1 = System.nanoTime()
      val removed = text.Dedup.stripDupSpans(corpus, "doc_id", "text", 5)
        .agg(sum(col("n_removed"))).head().getLong(0)
      val t2 = System.nanoTime()
      println(f"[spans] ${times}x (${base * times} docs): " +
        f"dupSpans $nSpans spans in ${(t1 - t0) / 1e9}%.1f s, " +
        f"strip removed $removed tokens in ${(t2 - t1) / 1e9}%.1f s")
      graft.engine.Caches.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
