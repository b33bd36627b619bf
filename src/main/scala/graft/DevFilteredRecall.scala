package graft

import org.apache.spark.sql.functions._

import graft.vector.Similarity

/** Measurement behind filteredTopK's adaptive switch: for each
  * testdata corpus and probe width, does the FILTERED probe
  * (label = 1, query vec 0) return exactly the filtered exact scan's
  * top-10? Measured: sf0.001 needs nProbe=14, sf0.01 needs the FULL
  * 16 — i.e. on an isotropic corpus a 10%-selectivity filter defeats
  * IVF pruning, which is why selective predicates take the exact
  * prefilter path and only broad ones probe (the DevLshBands /
  * DevRecallProbe measure-first discipline).
  */
object DevFilteredRecall {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local("graft-dev-filtered-recall")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, dir)
      val idx = java.nio.file.Files.createTempDirectory("graft_frec").toString + "/index"
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", idx)
      val allowed = emb.filter(col("label") === 1).select(col("vec_id").as("id"))
      val exact = Similarity.cosineTopK(
          emb.filter(col("label") === 1 || col("vec_id") === 0L),
          "vec_id", "embedding", 0L, 10)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      for (nProbe <- Seq(8, 10, 12, 14, 16)) {
        val probe = Similarity.ivfProbeByIdWhere(spark, idx, emb,
            "vec_id", "embedding", allowed, 0L, 10, nProbe = nProbe)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
        val hit = probe.count(exact.contains)
        println(s"$sf nProbe=$nProbe overlap=$hit/${exact.size} " +
          s"exactEq=${probe == exact}")
      }
    }
    spark.stop()
  }
}
