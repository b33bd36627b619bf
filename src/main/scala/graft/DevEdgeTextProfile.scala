package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

// dev scratch — decomposes q162's dominant stage (the incremental
// text-edge join) term by term over a PERSISTED sAll, mirroring
// incrementalJaccardPairsFromShingles step for step.
object DevEdgeTextProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.Dedup
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    val docs = Tables.load(spark, sfDir, "documents")
    val batch = docs.filter(col("source") === "src0")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val s = time("sAll persist+count") {
      val d = Dedup.shingleSets(docs.select(col("doc_id").cast("long")
        .as("doc_id"), col("text")), "doc_id", "text", 5).persist()
      println(s"[prof]   sAll rows = ${d.count()}")
      d
    }
    val fresh = batch.select(col("doc_id").as("doc")).distinct()
    val freq = time("freq agg") {
      val f = s.groupBy(col("shingle")).agg(count(lit(1)).as("freq")).persist()
      println(s"[prof]   freq rows = ${f.count()}")
      f
    }
    val byDoc = Window.partitionBy(col("doc"))
    def prefixes(rel: org.apache.spark.sql.DataFrame) =
      rel.join(freq, "shingle")
        .withColumn("_r", row_number().over(
          byDoc.orderBy(col("freq").asc, col("shingle").asc)))
        .withColumn("_n", count(lit(1)).over(byDoc))
        .filter(col("_r") <= col("_n") - ceil(lit(0.5) * col("_n")) + 1)
        .filter(col("freq") >= 2 && col("freq") <= 100000)
        .select(col("doc"), col("shingle"))
    val prefixNew = time("prefixNew (batch windows)") {
      val p = prefixes(s.join(broadcast(fresh), Seq("doc"), "left_semi"))
        .persist()
      println(s"[prof]   prefixNew rows = ${p.count()}")
      p
    }
    val touched = time("touched docs") {
      val t = s.join(prefixNew.select("shingle").distinct()
          .hint("shuffle_hash"), Seq("shingle"), "left_semi")
        .select("doc").distinct().persist()
      println(s"[prof]   touched rows = ${t.count()}")
      t
    }
    val prefixesB = time("prefixesB (touched windows)") {
      val p = prefixes(s.join(touched.hint("shuffle_hash"),
        Seq("doc"), "left_semi")).persist()
      println(s"[prof]   prefixesB rows = ${p.count()}")
      p
    }
    val cands = time("candidate join+distinct") {
      val c = prefixNew.as("a").join(prefixesB.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc") =!= col("b.doc"))
        .select(least(col("a.doc"), col("b.doc")).as("doc_a"),
          greatest(col("a.doc"), col("b.doc")).as("doc_b")).distinct()
        .persist()
      println(s"[prof]   cands rows = ${c.count()}")
      c
    }
    time("verifyJaccard") {
      println(s"[prof]   verified = ${Dedup.verifyJaccard(s, cands, 0.5).count()}")
    }
    spark.stop()
  }
}
