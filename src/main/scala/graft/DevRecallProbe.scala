package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostics for the ANN recall levers: what does nProbe=4
  * coarse pruning alone cost (exact in-list ranking = any ADC
  * variant's ceiling), and what do raw vs residual ADC read under it.
  */
object DevRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, sfDir, "embeddings")
    import vector.Similarity
    val exact = Similarity.cosineTopK(emb, "vec_id", "embedding", 0L, 10)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    for (np <- Seq(2, 4, 8, 16)) {
      val cents = Similarity.centroids(emb, "vec_id", "embedding", 16)
      val asg = Similarity.ivfAssign(emb, cents, "vec_id", "embedding")
      val q = emb.filter(col("vec_id") === 0L).select(col("embedding").as("_q"))
      val probed = cents.crossJoin(broadcast(q))
        .withColumn("_cos", Similarity.cosine(col("centroid_vec"), col("_q")))
        .orderBy(col("_cos").desc, col("centroid_id").asc).limit(np)
        .select(col("centroid_id").as("cluster"))
      val inList = asg.join(broadcast(probed), Seq("cluster"))
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      val ceiling = exact.count(inList.contains) / 10.0
      println(s"[recall] nProbe=$np in-list ceiling=$ceiling")
      graft.engine.Caches.releaseAll(); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
