package graft

import org.apache.spark.sql.SparkSession

// dev scratch — run ONE registry query under the exact Bench session
// (Sessions.tune, local[N], fresh scans, N reps) to reproduce bench
// timings in isolation.
object DevBenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_NO_CLEAR=1 keeps caches across reps — the round-8
    // leak reproducer (a self-cleaning operator must stay flat anyway)
    val noClear = sys.env.get("SPARK_GRAFT_NO_CLEAR").contains("1")
    for (q <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      println(f"[one] $q rep$i n=$n time=${(System.nanoTime() - t0) / 1e9}%.3f s")
      if (!noClear) {
        graft.engine.Caches.releaseAll()
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
