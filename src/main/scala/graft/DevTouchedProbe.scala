package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// dev scratch — measures the q162 trim's premise at a given sf: what
// fraction of corpus docs hold at least one batch-prefix shingle
// (the b-side window population after the round-12 restriction).
object DevTouchedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.Dedup
    val docs = Tables.load(spark, sfDir, "documents")
    val batch = docs.filter(col("source") === "src0")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val s = Dedup.shingleSets(docs.select(col("doc_id").cast("long")
      .as("doc_id"), col("text")), "doc_id", "text", 5).persist()
    val freq = s.groupBy(col("shingle")).agg(count(lit(1)).as("freq"))
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col("doc"))
    val fresh = batch.select(col("doc_id").as("doc"))
    val prefixNew = s.join(broadcast(fresh), Seq("doc"), "left_semi")
      .join(freq, "shingle")
      .withColumn("_r", row_number().over(
        byDoc.orderBy(col("freq").asc, col("shingle").asc)))
      .withColumn("_n", count(lit(1)).over(byDoc))
      .filter(col("_r") <= col("_n") - ceil(lit(0.5) * col("_n")) + 1)
      .filter(col("freq") >= 2 && col("freq") <= 100000)
      .select(col("doc"), col("shingle"))
    val touched = s.join(prefixNew.select("shingle").distinct(),
      Seq("shingle"), "left_semi").select("doc").distinct().count()
    val total = s.select("doc").distinct().count()
    val nBatch = fresh.count()
    println(s"[probe] sf=$sfDir batch=$nBatch touched=$touched total=$total " +
      f"frac=${touched.toDouble / total}%.3f")
    spark.stop()
  }
}
