package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Batch-proportionality stress for the ANN JOIN (q197 family): build
  * the IVFADC index once on the sf0.1 embeddings, then probe-join
  * batches of growing size (replicating the corpus vectors under
  * shifted query ids so every query is a real vector) and report
  * wall-clock per batch size. The claim under test: cost tracks
  * Σ_q |probed lists of q| — linear in the batch — and never the
  * batch × corpus product a naive cross-join similarity would pay.
  * Results recorded in BASELINE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.DevAnnStress [sizes...]
  */
object DevAnnStress {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(20, 200, 2000, 20000)
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, sfDir, "embeddings")
    val n = emb.count()
    val idx = java.nio.file.Files.createTempDirectory("graft_ann_stress")
      .toString + "/index"
    val t0 = System.nanoTime()
    graft.vector.Similarity.buildIvfAdcIndex(emb, "vec_id", "embedding", idx)
    graft.engine.Caches.releaseAll()
    println(f"[annstress] corpus=$n build=${(System.nanoTime() - t0) / 1e9}%.2f s")
    for (b <- sizes) {
      // replicate corpus vectors under shifted ids until the batch is
      // full — every query is a genuine vector, ids never collide with
      // the corpus ids (shift = 1e9 * replica)
      val reps = (b + n - 1) / n
      val batch = (1L to reps).map(r =>
          emb.select((col("vec_id") + lit(1000000000L) * r).as("vec_id"),
            col("embedding")))
        .reduce(_ unionByName _)
        .orderBy("vec_id").limit(b)
      for (i <- 1 to 2) {
        val t = System.nanoTime()
        val rows = graft.vector.Similarity.ivfAdcProbeJoin(
          spark, idx, batch, "vec_id", "embedding", 10).count()
        println(f"[annstress] batch=$b rep$i rows=$rows " +
          f"time=${(System.nanoTime() - t) / 1e9}%.2f s")
        graft.engine.Caches.releaseAll()
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
