package graft

import org.apache.spark.sql.SparkSession

// dev scratch: BPE training cost + top merges on the real corpus
object DevBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val n = args.headOption.map(_.toInt).getOrElse(30)
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master("local[8]"), shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val t0 = System.nanoTime()
    val merges = text.Curation.trainBpe(docs, "text", n).collect()
    println(f"[bpe] $n merges in ${(System.nanoTime() - t0) / 1e9}%.1f s; top: " +
      merges.take(10).map(r => s"${r.getString(1)}+${r.getString(2)}=${r.getLong(4)}").mkString(", "))
    spark.stop()
  }
}
