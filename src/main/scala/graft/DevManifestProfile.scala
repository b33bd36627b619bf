package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Component-level timing of the unified multimodal manifest (q160):
  * where do its seconds go — codec+hash per modality, banded pair
  * joins, the CC walk, or the final assembly? Used to decide whether
  * any non-codec stage is worth re-planning.
  */
object DevManifestProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master("local[32]"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, sfDir, "documents")
    def time[A](label: String)(f: => A): A = {
      val t = System.nanoTime()
      val r = f
      println(f"[mprof] $label%-28s ${(System.nanoTime() - t) / 1e9}%6.2f s")
      r
    }
    for (_ <- 1 to 2) {
      time("imageHashes(count)") {
        multimodal.Media.imageHashes(spark,
          multimodal.Media.imageHashTable(spark, docs, "doc_id")).count()
      }
      time("audioHashes(count)") {
        multimodal.Media.audioHashes(spark,
          multimodal.Media.audioHashTable(spark, docs, "doc_id")).count()
      }
      time("phashBandedPairs") {
        multimodal.Media.phashBandedPairs(spark,
          multimodal.Media.imageHashTable(spark, docs, "doc_id")).count()
      }
      time("audioHashBandedPairs") {
        multimodal.Media.audioHashBandedPairs(spark,
          multimodal.Media.audioHashTable(spark, docs, "doc_id")).count()
      }
      time("jaccardPairs") {
        text.Dedup.jaccardPairs(docs, "doc_id", "text", 5, 0.5).count()
      }
      time("unifiedManifest(full)") {
        multimodal.Curate.unifiedManifest(spark, docs, "doc_id", "text",
          Seq(("train", 90), ("val", 5), ("test", 5))).count()
      }
      graft.engine.Caches.releaseAll()
      spark.catalog.clearCache()
      println("[mprof] ---")
    }
    spark.stop()
  }
}
