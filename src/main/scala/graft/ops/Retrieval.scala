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

  /** [[hybridTopK]] over PERSISTED indexes — the production stack: the
    * lexical list comes from the bucket-pruned BM25 probe
    * ([[graft.text.TextStats.bm25Probe]]) and the dense list from the
    * partition-pruned IVF probe
    * ([[graft.vector.Similarity.ivfProbeById]]), so a query touches
    * only the query terms' tf slice and nProbe cluster dirs — no
    * corpus tokenize, no full vector scan. On corpora where the IVF
    * probe's recall is total (the q81 premise) the fused output equals
    * the inline [[hybridTopK]] exactly, which is how q247 shares
    * q242's oracle verbatim.
    */
  def hybridProbeTopK(spark: org.apache.spark.sql.SparkSession,
                      bm25IndexPath: String, ivfIndexPath: String,
                      emb: DataFrame, vecIdCol: String, vecCol: String,
                      queryTerms: Seq[String], queryVecId: Long,
                      perList: Int = 10, kRrf: Int = 60,
                      topK: Int = 10, nProbe: Int = 4): DataFrame = {
    val lex = ranked(
      graft.text.TextStats.bm25Probe(spark, bm25IndexPath, queryTerms)
        .orderBy(col("bm25").desc, col("doc_id").asc).limit(perList),
      "doc_id", "bm25", "lex_rank")
    val dense = ranked(
      graft.vector.Similarity.ivfProbeById(spark, ivfIndexPath, emb,
        vecIdCol, vecCol, queryVecId, perList, nProbe),
      vecIdCol, "cos_sim", "dense_rank")
    rrfFuse(lex, dense, kRrf, topK)
  }

  /** The batch (JOIN) form of [[hybridProbeTopK]] — hybrid serving as
    * ONE distributed plan over a whole query batch: every query row
    * (`query_id` = its vec_id in `emb`, `terms` = its lexical terms)
    * gets its fused top-k, with the lexical lists from ONE
    * bucket-pruned multi-query BM25 probe
    * ([[graft.text.TextStats.bm25ProbeJoin]]) and the dense lists from
    * ONE partition-pruned multi-query IVF probe
    * ([[graft.vector.Similarity.ivfProbeJoin]]) — the corpus-side cost
    * is paid once per BATCH, not once per query, which is what lets a
    * streaming serving sink run this per micro-batch.
    *
    * Per-query rows equal [[hybridProbeTopK]] run query-by-query (the
    * RetrievalSpec law): each side is cut to its per-query top-
    * `perList` under the probe's total order (score desc, id asc) by a
    * rank window PARTITIONED BY query_id — bounded per query by
    * construction, never a global sort — and [[rrfFuse]]'s pinned
    * arithmetic runs on the (query_id, id)-keyed full-outer join.
    */
  def hybridProbeJoin(spark: org.apache.spark.sql.SparkSession,
                      bm25IndexPath: String, ivfIndexPath: String,
                      emb: DataFrame, vecIdCol: String, vecCol: String,
                      queries: DataFrame,
                      qIdCol: String = "query_id", termsCol: String = "terms",
                      perList: Int = 10, kRrf: Int = 60,
                      topK: Int = 10, nProbe: Int = 4): DataFrame = {
    val perQuery = Window.partitionBy(col("query_id"))
    def cutRank(list: DataFrame, idCol: String, scoreCol: String,
                rankName: String): DataFrame =
      list.withColumn(rankName, row_number().over(
          perQuery.orderBy(col(scoreCol).desc, col(idCol).asc)).cast("long"))
        .filter(col(rankName) <= perList)
        .select(col("query_id"), col(idCol).as("id"), col(rankName))
    val lex = cutRank(
      graft.text.TextStats.bm25ProbeJoin(spark, bm25IndexPath,
        queries.select(col(qIdCol).as("query_id"), col(termsCol))),
      "doc_id", "bm25", "lex_rank")
    // dense queries by example: the batch's ids fetched from the
    // corpus in one semi-join — no per-query head() collect
    val qVecs = emb.join(
        broadcast(queries.select(col(qIdCol).cast("long").as("query_id"))),
        col(vecIdCol) === col("query_id"))
      .select(col("query_id"), col(vecCol))
    val dense = cutRank(
      graft.vector.Similarity.ivfProbeJoin(spark, ivfIndexPath, qVecs,
        "query_id", vecCol, perList, nProbe),
      "id", "cos_sim", "dense_rank")
    lex.join(dense, Seq("query_id", "id"), "full_outer")
      .select(col("query_id"), col("id"), col("lex_rank"), col("dense_rank"),
        round(
          coalesce(lit(1.0) / (lit(kRrf) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("dense_rank")), lit(0.0)),
          9).as("rrf"))
      .withColumn("_rk", row_number().over(
        perQuery.orderBy(col("rrf").desc, col("id").asc)))
      .filter(col("_rk") <= topK)
      .drop("_rk")
  }

  /** Retrieval-quality report for ONE ranked list against a relevance
    * set: precision@k, MRR (reciprocal rank of the first relevant
    * hit), DCG@k and nDCG@k — the metrics every retrieval deployment
    * watches before trusting an index or a fusion (recall@k already
    * lives in [[graft.vector.Similarity.annRecall]]; these add the
    * GRADED view, where rank position matters).
    *
    * `ranking` is a bounded scored list (the [[rrfFuse]] contract);
    * `relevantIds` is the ground-truth id frame (single `id` column);
    * `nRelevantTotal` the corpus-wide relevant count — IDCG@k places
    * min(R, k) relevant docs at the top, the standard normalization,
    * so a query with fewer than k relevant docs can still reach
    * nDCG 1.0.
    *
    * Determinism: each DCG term 1/log2(rank+1) is a transcendental —
    * fixed to the 12-dp grid per term before the exact decimal sum
    * (never ship a raw libm output; the q184 lesson); precision and
    * MRR are exact-integer quotients emitted unrounded
    * (bit-deterministic, the q107 discipline); DCG/nDCG present at
    * 6 dp.
    */
  def retrievalEval(ranking: DataFrame, idCol: String, scoreCol: String,
                    relevantIds: DataFrame, nRelevantTotal: Long,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    require(relevantIds.columns.sameElements(Array("id")),
      s"retrievalEval: relevantIds must be a single `id` column, got ${relevantIds.columns.mkString(",")}")
    val r = ranked(ranking, idCol, scoreCol, "rank")
      .filter(col("rank") <= k)
      .join(relevantIds.withColumn("_rel", lit(1L)), Seq("id"), "left")
      .withColumn("_rel", coalesce(col("_rel"), lit(0L)))
      .withColumn("_gain",
        round(col("_rel").cast("double") / log2(col("rank") + lit(1)), 12)
          .cast(DecimalType(28, 12)))
    // IDCG@k is a driver-side constant: min(R, k) ideal terms on the
    // same 12-dp grid, summed exactly
    val idcg = (1 to math.min(nRelevantTotal, k.toLong).toInt)
      .map(i => BigDecimal(1.0 / (math.log(i + 1.0) / math.log(2.0)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP))
      .sum
    r.agg(
        count(lit(1)).as("_n"),
        sum(col("_rel")).as("_nrel"),
        min(when(col("_rel") === 1L, col("rank"))).as("_first"),
        sum(col("_gain")).as("_dcg"))
      .select(
        lit(k).cast("int").as("k"),
        col("_nrel").cast("long").as("n_rel"),
        (col("_nrel").cast("double") / lit(k)).as("precision_at_k"),
        coalesce(lit(1.0) / col("_first"), lit(0.0)).as("mrr"),
        round(col("_dcg").cast("double"), 6).as("dcg"),
        (if (idcg > 0)
          round((col("_dcg") / lit(idcg.toDouble)).cast("double"), 6)
        else lit(0.0)).as("ndcg"))
  }

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein, SIGIR
    * 1998) of a bounded candidate list: greedily pick
    * argmax λ·sim(d, q) − (1−λ)·max_{s∈S} sim(d, s), trading query
    * relevance against redundancy with what's already selected — the
    * diversity stage a RAG pipeline runs between retrieval and the
    * context window.
    *
    * The greedy recurrence is inherently sequential, so it runs
    * driver-side over the BOUNDED candidate list (the A3 pattern:
    * `nCandidates ≤ 128` enforced loudly; candidate scan, pair-sim
    * matrix, and top-N cut all stay distributed, and only
    * N + N·(N−1) small rows ever reach the driver). Determinism: both
    * sim inputs are the engine-convention 6-dp-rounded cosines, the
    * score is the UNROUNDED double λ·simq − (1−λ)·maxSim on one
    * pinned operand order (bit-identical in any IEEE engine — never
    * re-rounded, the q107 discipline), ties break by id ascending.
    */
  def mmrRerank(emb: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int, nCandidates: Int = 20,
                lambda: Double = 0.7): DataFrame = {
    require(nCandidates <= 128,
      s"mmrRerank: nCandidates=$nCandidates exceeds the bounded-rerank cap of 128 " +
        "— the greedy stage is driver-side by design and must stay small; " +
        "cut the candidate list with the distributed retriever first")
    require(k <= nCandidates, s"mmrRerank: k=$k > nCandidates=$nCandidates")
    val spark = emb.sparkSession
    val cands = graft.vector.Similarity.cosineTopK(emb, idCol, vecCol,
      queryId, nCandidates)
    val simq = cands.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // pairwise 6-dp cosines among candidates only: N² bounded rows
    val cv = emb.filter(col(idCol).isin(simq.keySet.toSeq: _*))
      .select(col(idCol).as("_i"), col(vecCol).as("_v"))
    val pair = cv.as("a").crossJoin(cv.as("b"))
      .filter(col("a._i") =!= col("b._i"))
      .select(col("a._i").as("ia"), col("b._i").as("ib"),
        round(graft.vector.Similarity.cosine(col("a._v"), col("b._v")), 6)
          .as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val selected = scala.collection.mutable.ArrayBuffer[(Long, Double, Double)]()
    val remaining = scala.collection.mutable.SortedSet[Long]() ++ simq.keySet
    while (selected.size < k && remaining.nonEmpty) {
      val best = remaining.map { id =>
        val div = if (selected.isEmpty) 0.0
          else selected.map(s => pair((id, s._1))).max
        (id, simq(id), lambda * simq(id) - (1.0 - lambda) * div)
      }.reduceLeft { (a, b) =>
        if (b._3 > a._3 || (b._3 == a._3 && b._1 < a._1)) b else a
      }
      selected += best
      remaining -= best._1
    }
    import spark.implicits._
    selected.toSeq.zipWithIndex
      .map { case ((id, sq, sc), i) => (i + 1L, id, sq, sc) }
      .toDF("mmr_rank", "id", "cos_sim", "mmr_score")
  }
}
