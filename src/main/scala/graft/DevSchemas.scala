package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// dev scratch — print the exact on-disk schema (DDL + nullability) of
// every persisted index table, to pin the explicit read schemas.
object DevSchemas {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master("local[8]"), shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val emb = Tables.load(spark, sfDir, "embeddings")

    val sig = java.nio.file.Files.createTempDirectory("graft_sch_sig")
      .toString + "/index"
    graft.multimodal.Curate.buildSignatureIndex(spark, docs, "doc_id",
      "text", sig)
    graft.multimodal.Curate.buildEdgeIndex(spark, sig)
    val bm = java.nio.file.Files.createTempDirectory("graft_sch_bm")
      .toString + "/index"
    graft.text.TextStats.buildBm25Index(docs, "doc_id", "text", bm)
    val ivf = java.nio.file.Files.createTempDirectory("graft_sch_ivf")
      .toString + "/index"
    graft.vector.Similarity.buildIvfIndex(emb, "vec_id", "embedding", ivf)
    val adc = java.nio.file.Files.createTempDirectory("graft_sch_adc")
      .toString + "/index"
    graft.vector.Similarity.buildIvfAdcIndex(emb, "vec_id", "embedding", adc)
    // record a tombstone so the tombstones table exists
    graft.multimodal.Curate.deleteFromSignatureIndex(spark, sig,
      docs.limit(1).select("doc_id"), "doc_id", purgeAboveRows = 100000L)

    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    for ((root, name) <- Seq((sig, "SIG"), (bm, "BM25"), (ivf, "IVF"),
        (adc, "ADC"))) {
      fs.listStatus(new org.apache.hadoop.fs.Path(root))
        .filter(_.isDirectory).map(_.getPath).sortBy(_.getName).foreach { p =>
        try {
          val df = spark.read.parquet(p.toString)
          println(s"[schema] $name/${p.getName}: " + df.schema.fields.map(f =>
            s"${f.name}:${f.dataType.sql}${if (f.nullable) "" else " NOT NULL"}")
            .mkString(", "))
        } catch { case e: Exception =>
          println(s"[schema] $name/${p.getName}: UNREADABLE ${e.getMessage.take(60)}")
        }
      }
    }
    spark.stop()
  }
}
