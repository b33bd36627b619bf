package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// dev scratch — stage-level timing of the q63/q68 clustering path
object DevProfileCc {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.load(spark, dir, "documents")
    val jac = time("jaccardPairs") {
      val j = graft.text.Dedup.jaccardPairs(docs, "doc_id", "text", 5, 0.5)
        .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .localCheckpoint(true) // materialized INSIDE the timed block
      println("  pairs=" + j.count()); j
    }
    spark.catalog.clearCache()
    // exact-dup star edges: mirrors Clusters.dupClusters' internal
    // construction (md5 group → min-id star) — drift risk accepted for
    // a dev profiler whose purpose is timing the stages that method
    // composes; q63's oracle is the correctness authority
    val exact = {
      val byHash = docs.select(col("doc_id").cast("long").as("id"), md5(col("text")).as("h"))
      byHash.withColumn("src", min(col("id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("h")))
        .filter(col("id") =!= col("src"))
        .select(col("src"), col("id").as("dst"))
    }.localCheckpoint(true)
    time("connectedComponents on materialized edges") {
      val c = graft.text.Clusters.connectedComponents(jac.union(exact), "src", "dst")
      println("  labeled=" + c.count())
    }
    spark.catalog.clearCache()
    time("full q63") {
      println("  rows=" + SparkEntry.queries("q63_dup_clusters")(spark, dir).count())
    }
    spark.stop()
  }
}
