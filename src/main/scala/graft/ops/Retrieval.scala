package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion of a lexical (BM25) and a
  * dense (cosine) ranked list — the standard first-stage retriever a
  * RAG / curation pipeline runs against a corpus (sparse catches exact
  * terminology, dense catches paraphrase; RRF fuses them without score
  * calibration, which is exactly why Cormack & Clarke, SIGIR 2009
  * proposed it: ranks are comparable across systems, raw scores are
  * not).
  *
  * Scale posture: each side is produced by its own scale-safe ranker
  * (BM25 = one token shuffle, top-N via TakeOrderedAndProject;
  * cosineTopK = map + TakeOrderedAndProject) and is AT MOST `perList`
  * rows when it reaches the fusion, so the single-partition rank
  * windows and the full-outer join here run on bounded driver-scale
  * frames by construction — the corpus never reaches this operator.
  */
object Retrieval {

  /** Rank a bounded scored list: `row_number` over (score desc, id asc).
    * The input MUST already be bounded (top-N of some ranker) — the
    * unpartitioned window is deliberate and safe only because of that
    * contract (documented at both call sites below).
    */
  private def ranked(list: DataFrame, idCol: String, scoreCol: String,
                     rankName: String): DataFrame =
    list.withColumn(rankName,
        row_number().over(
          Window.orderBy(col(scoreCol).desc, col(idCol).asc)).cast("long"))
      .select(col(idCol).as("id"), col(rankName))

  /** Reciprocal-rank fusion of two bounded ranked lists:
    * `rrf(d) = Σ_list 1/(kRrf + rank_list(d))`, absent-from-a-list
    * contributing 0 (the union semantics — a doc only one retriever
    * found still scores). `kRrf = 60` is the constant the original
    * paper fixed and every production fusion ships unchanged.
    *
    * Determinism/oracle: each term is one double division of exact
    * integers and the two-term sum has one pinned operand order
    * (lexical + dense), so the doubles agree bit-for-bit with the SQL
    * twin; presentation-rounded at 9 dp with the id tiebreak making
    * the top-k cut a total order.
    */
  def rrfFuse(lex: DataFrame, dense: DataFrame, kRrf: Int = 60,
              topK: Int = 10): DataFrame = {
    val fused = lex.join(dense, Seq("id"), "full_outer")
    fused.select(col("id"), col("lex_rank"), col("dense_rank"),
        round(
          coalesce(lit(1.0) / (lit(kRrf) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("dense_rank")), lit(0.0)),
          9).as("rrf"))
      .orderBy(col("rrf").desc, col("id").asc)
      .limit(topK)
  }

  /** End-to-end hybrid top-k: BM25 over `docs` for `queryTerms` fused
    * with exact cosine over `emb` for `queryVecId` (query-by-example),
    * joined on `doc id = vec id`. Ids present on only one side keep
    * their one-list score — at sf0.1 the corpus has 5,000 docs but
    * 2,000 embeddings, so one-sided ids are the NORMAL case, not an
    * edge.
    *
    * `perList` bounds BOTH lists before fusion (the rank-window safety
    * contract of [[rrfFuse]]); `topK` cuts the fused result.
    */
  def hybridTopK(docs: DataFrame, emb: DataFrame,
                 docIdCol: String, textCol: String,
                 vecIdCol: String, vecCol: String,
                 queryTerms: Seq[String], queryVecId: Long,
                 perList: Int = 20, kRrf: Int = 60,
                 topK: Int = 10): DataFrame = {
    // top-perList per side via sort+limit (TakeOrderedAndProject — no
    // global sort materializes), THEN the bounded rank window
    val lex = ranked(
      graft.text.TextStats.bm25(docs, docIdCol, textCol, queryTerms)
        .orderBy(col("bm25").desc, col(docIdCol).asc).limit(perList),
      docIdCol, "bm25", "lex_rank")
    val dense = ranked(
      graft.vector.Similarity.cosineTopK(emb, vecIdCol, vecCol, queryVecId,
        perList),
      vecIdCol, "cos_sim", "dense_rank")
    rrfFuse(lex, dense, kRrf, topK)
  }
}
