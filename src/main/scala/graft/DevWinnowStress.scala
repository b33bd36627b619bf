package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress for the round-10 families (round-10 verdict item 6,
  * the DevSpanStress pattern): winnow overlap + append, C4 line-dedup,
  * and the sketch audits, each on the sf0.1 corpus and on a k×
  * id-shifted replica. Replication is the saturated-duplication WORST
  * CASE: every doc (and so every winnow fingerprint and every line)
  * is duplicated k× corpus-wide.
  *
  * What linearity means per family — outputs and shuffles scale
  * differently, and only the SHUFFLE is the 100 TB claim:
  *   - winnow pairs: the fp-keyed shuffle is linear in rows; the PAIR
  *     OUTPUT is inherently Σc² over fp buckets (k² per duplicated
  *     group) — that is the operator's semantics, and the
  *     hot_fingerprint guard is what bounds it. Time should track
  *     rows + output size, never corpus².
  *   - append: batch-proportional — the k× corpus only enlarges the
  *     probe side of the one fp join.
  *   - line-dedup: one line-keyed shuffle + one doc reassembly, both
  *     linear; output rows = input docs.
  *   - sketches (CMS/HLL/KMV): register/sample state is FIXED; a k×
  *     scan should cost ~k× the gram stream and estimates must not
  *     move (the distinct sets are unchanged under replication).
  *
  * Usage: runMain graft.DevWinnowStress [k]
  */
object DevWinnowStress {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(10)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.engine.Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"),
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val base = docs.count()

    def replicate(times: Int) = (0 until times)
      .map(i => docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("text")))
      .reduce(_ unionByName _)

    def timed(label: String, times: Int)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[winnow-stress] $label ${times}x (${base * times} docs): " +
        f"n=$n in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      graft.engine.Caches.releaseAll()
      spark.catalog.clearCache()
    }

    for (times <- Seq(1, k)) {
      val corpus = replicate(times)
      timed("winnow_pairs", times) {
        text.TextStats.winnowOverlapPairs(corpus, "doc_id", "text",
          3, 4, 2L).count()
      }
      timed("winnow_append", times) {
        // the q223 shape: doc_id%10==0 of the ORIGINAL ids is the batch;
        // replicas of batch docs land on the corpus side, so the append
        // probes a batch of fixed size against a k× standing corpus
        text.TextStats.appendWinnowOverlapPairs(
          corpus.filter(col("doc_id") % 10 =!= 0 ||
            col("doc_id") >= 10000000L),
          corpus.filter(col("doc_id") % 10 === 0 &&
            col("doc_id") < 10000000L),
          "doc_id", "text", 3, 4, 2L).count()
      }
      timed("line_dedup", times) {
        text.Curation.corpusLineDedup(corpus, "doc_id", "text").count()
      }
      timed("cms_heavyhitters", times) {
        text.TextStats.cmsHeavyHitters(corpus, "text", 3).count()
      }
      timed("hll_audit", times) {
        text.TextStats.hllDistinctAudit(corpus, "text", 3).count()
      }
      timed("kmv_overlap", times) {
        // sources survive replication via a modulo tag so the slice
        // count stays fixed while each slice's gram stream grows k×
        text.TextStats.kmvOverlapAudit(
          corpus.withColumn("source",
            concat(lit("src"), pmod(col("doc_id"), lit(20L)))),
          "source", "text", 3, k = 64).count()
      }
    }
    spark.stop()
  }
}
