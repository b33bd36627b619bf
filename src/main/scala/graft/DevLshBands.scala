package graft

import org.apache.spark.sql.SparkSession

/** Measurement harness for the scale-parametric q39 gate (round-13):
  * at each testdata sf, does auto-banded hyperplane LSH
  * (Similarity.lshBandsForRecall's expected-miss bound) reproduce the
  * exact all-pairs near-dup set? Prints the derived band count and
  * the exact/LSH pair counts plus any missed pairs — the evidence the
  * oracle `measuredOn` entries cite.
  */
object DevLshBands {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import vector.Similarity
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = Tables.load(spark, dir, "embeddings")
      val n = emb.count()
      val bands = Similarity.lshBandsForRecall(n, 0.4)
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(Similarity.embedNearDup(emb, "vec_id", "embedding", 0.4))
      graft.engine.Caches.releaseAll(); spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val lsh = pairs(Similarity.embedNearDupLsh(emb, "vec_id", "embedding",
        0.4, nBands = -1))
      val secs = (System.nanoTime() - t0) / 1e9
      graft.engine.Caches.releaseAll(); spark.catalog.clearCache()
      val missed = exact -- lsh
      val spurious = lsh -- exact
      println(f"[lsh] $sf n=$n bands=$bands exact=${exact.size} " +
        f"lsh=${lsh.size} missed=${missed.size} spurious=${spurious.size} " +
        f"lsh_secs=$secs%.2f ${if (missed.isEmpty && spurious.isEmpty) "TOTAL" else missed.take(5).toString}")
    }
    spark.stop()
  }
}
