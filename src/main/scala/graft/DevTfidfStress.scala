package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-linearity stress for the hashing-trick TF-IDF family: the
  * sf0.1 documents replicated Nx under shifted ids (worst case for a
  * vectorizer — the vocabulary stops growing, so every token becomes
  * maximally frequent) and the sparse + dense paths timed at each
  * scale. The claim: one token shuffle + one (doc, bucket) aggregation
  * ⇒ wall-clock tracks token volume, with no vocabulary- or
  * pair-shaped blowup. Results recorded in BASELINE.md.
  */
object DevTfidfStress {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 3, 10)
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master("local[32]"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    for (r <- reps) {
      val corpus = (1 to r).map(k =>
          docs.select((col("doc_id") + lit(1000000L) * k).as("doc_id"),
            col("text")))
        .reduce(_ unionByName _)
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val nSparse = graft.text.TextStats.hashedTfidf(
          corpus, "doc_id", "text", 64).count()
        val t1 = System.nanoTime()
        val nDense = graft.text.TextStats.hashedTfidfEmbed(
          corpus, "doc_id", "text", 64).count()
        val t2 = System.nanoTime()
        println(f"[tfidfstress] x$r rep$i sparse_rows=$nSparse " +
          f"sparse=${(t1 - t0) / 1e9}%.2f s dense_rows=$nDense " +
          f"dense=${(t2 - t1) / 1e9}%.2f s")
        graft.engine.Caches.releaseAll()
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
