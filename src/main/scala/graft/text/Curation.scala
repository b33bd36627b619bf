package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-curation operators a training-data pipeline needs beyond
  * dedup: fixed-size overlapping chunking (context-window packing /
  * RAG indexing), eval-set decontamination (n-gram overlap against a
  * held-out benchmark corpus), and n-gram language-model statistics.
  * All pure column expressions over the one tokenization kernel
  * ([[TextStats.tokens]]) — map-side except the final aggregations.
  */
object Curation {

  /** Split each document into overlapping token windows of `chunkSize`
    * tokens starting every `stride` tokens (stride < chunkSize ⇒
    * overlap of chunkSize - stride). The final chunk may be shorter;
    * empty docs yield no chunks. Pure explode — no shuffle, no state:
    * at 100 TB this is a map-only pass fused into the parquet scan.
    */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got stride=$stride chunkSize=$chunkSize")
    df.select(col(idCol).cast("long").as("doc_id"),
        TextStats.tokens(col(textCol)).as("_w"))
      // whitespace-only text tokenizes to [""], not [] — filter that shape
      .filter(!(size(col("_w")) === 1 && element_at(col("_w"), 1) === lit("")))
      .select(col("doc_id"), col("_w"),
        explode(sequence(lit(0), size(col("_w")) - 1, lit(stride))).as("_start"))
      .select(col("doc_id"),
        (col("_start") / lit(stride)).cast("long").as("chunk_idx"),
        array_join(slice(col("_w"), col("_start") + 1, lit(chunkSize)), " ").as("chunk_text"),
        least(lit(chunkSize), size(col("_w")) - col("_start")).cast("long").as("n_tokens"))
  }

  /** Benchmark decontamination: for every training doc (`evalPred`
    * false), count distinct `shingleN`-gram shingles it shares with the
    * eval corpus (`evalPred` true) and flag any overlap. The eval
    * shingle set is usually small by nature (benchmarks are tiny next to
    * a training corpus), so it is broadcast — the training side streams
    * through a map-side hash join with no shuffle of the corpus.
    *
    * Guarded: a broadcast is only FORCED while the eval set is at most
    * `broadcastMaxShingles` distinct shingles (counted first — the set
    * is persisted, so the count also materializes the relation the join
    * reuses). Above that, a user decontaminating against a huge held-out
    * corpus gets a shuffle hash join — both sides partition by shingle —
    * instead of a driver/executor OOM from an unbounded forced broadcast.
    * Cache contract: caller releases (see Similarity.normed).
    */
  def contamination(df: DataFrame, idCol: String, textCol: String,
                    evalPred: org.apache.spark.sql.Column,
                    shingleN: Int = 5,
                    broadcastMaxShingles: Long = graft.ops.GuardBounds.MaxEvalShingles): DataFrame =
    contaminationImpl(df, idCol, textCol, evalPred, shingleN,
      broadcastMaxShingles, bloomItems = None)

  /** Shared body of [[contamination]] / [[contaminationBloom]]: ONE
    * implementation so "the bloom variant is bit-identical" holds by
    * construction — the only divergence is the optional map-side
    * pre-filter spliced onto the training shingle stream.
    */
  private def contaminationImpl(df: DataFrame, idCol: String, textCol: String,
                                evalPred: org.apache.spark.sql.Column,
                                shingleN: Int, broadcastMaxShingles: Long,
                                bloomItems: Option[Long]): DataFrame = {
    import org.apache.spark.sql.GraftColumn
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    // NULL evalPred means TRAIN (SQL three-valued semantics — see
    // Dedup.contaminationSpans); filter(!pred) alone would drop the
    // doc from both sides
    val flagged = df.withColumn("_is_eval", coalesce(evalPred, lit(false)))
    val evalShingles = graft.engine.Caches.persisted("contamination.evalShingles",
      Dedup.shingleSets(
          flagged.filter(col("_is_eval")), idCol, textCol, shingleN)
        .select(col("shingle")).distinct())
    val trainDocs = flagged.filter(!col("_is_eval"))
    val ids = trainDocs.select(col(idCol).cast("long").as("doc_id"))
    val nEval = evalShingles.count()
    if (nEval == 0) {
      // empty eval corpus: nothing can be contaminated (and the bloom
      // aggregate would yield a null sketch) — short-circuit
      evalShingles.unpersist()
      ids.select(col("doc_id"), lit(0L).as("n_shared"),
        lit(false).as("contaminated"))
    } else {
      val trainShingles = Dedup.shingleSets(trainDocs, idCol, textCol, shingleN)
      val candidates = bloomItems match {
        case None => trainShingles
        case Some(expected) =>
          // ~16 bits/item ⇒ fpp ≈ 5e-4; the exact join erases the fp tail
          val items = math.max(expected, nEval)
          val bloomAgg = GraftColumn(new BloomFilterAggregate(
              GraftColumn.expr(xxhash64(col("shingle"))),
              Literal(items), Literal(items * 16L))
            .toAggregateExpression())
          val bloom = evalShingles.select(bloomAgg.as("bf"))
            .head().getAs[Array[Byte]](0)
          trainShingles.filter(GraftColumn(BloomFilterMightContain(
            Literal.create(bloom, org.apache.spark.sql.types.BinaryType),
            GraftColumn.expr(xxhash64(col("shingle"))))))
      }
      val evalSide =
        if (nEval <= broadcastMaxShingles) broadcast(evalShingles)
        else evalShingles.hint("shuffle_hash")
      val hits = candidates
        .join(evalSide, "shingle")
        // shingleSets is distinct per doc ⇒ plain count = distinct shared
        .groupBy(col("doc").as("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
      ids.join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"))
        .withColumn("contaminated", col("n_shared") > 0)
    }
  }

  /** [[contamination]] with a Bloom-filter pre-filter on the training
    * side — the pattern Spark's own runtime row-level filtering applies
    * to shuffle joins, made explicit for the one join in this engine
    * whose probe side is the entire corpus.
    *
    * Why it matters at 100 TB: exact decontamination must route every
    * training shingle through a join against the eval set. Even with the
    * eval side broadcast, every corpus shingle is still *produced* and
    * *probed*; with the shuffle fallback the whole corpus shuffles. Here
    * a Bloom filter over `xxhash64(shingle)` of the eval set (a few MiB
    * for millions of shingles — `numBits/8` bytes, built by ONE
    * distributed aggregate) is applied map-side to the training shingle
    * stream *before* the join, so only candidate shingles (true matches
    * + the fpp tail) reach it. False positives are then removed by the
    * exact join — the result is bit-identical to [[contamination]];
    * false negatives are impossible by Bloom construction.
    *
    * The single collected bloom binary is bounded by `numBits/8` (2 MiB
    * at the defaults) regardless of corpus size — a legitimate
    * driver-side scalar, same as Spark's InjectRuntimeFilter subquery
    * result. Catalyst codegen's both bloom expressions
    * (BloomFilterMightContain implements doGenCode), so the pre-filter
    * rides inside the scan's WholeStageCodegen span.
    */
  def contaminationBloom(df: DataFrame, idCol: String, textCol: String,
                         evalPred: org.apache.spark.sql.Column,
                         shingleN: Int = 5,
                         expectedEvalShingles: Long = 1L << 20,
                         broadcastMaxShingles: Long = graft.ops.GuardBounds.MaxEvalShingles): DataFrame =
    contaminationImpl(df, idCol, textCol, evalPred, shingleN,
      broadcastMaxShingles, bloomItems = Some(expectedEvalShingles))

  /** Deterministic per-group sample: the `k` docs of each group with the
    * smallest multiplicative hash of their id — a reproducible stand-in
    * for reservoir sampling (same marginal uniformity over a hashed id
    * space, but stable across runs, partitionings, and cluster sizes,
    * which random reservoirs are not; reproducibility is what a training
    * pipeline actually needs from its subsampling step). Knuth's 2654435761
    * multiplier, arithmetic kept inside Long under ANSI mode by reducing
    * mod 1e9+7 BEFORE multiplying.
    *
    * One shuffle (by group); the rank window is a WindowGroupLimit after
    * Catalyst's top-k pushdown, so each partition keeps only k rows —
    * nothing resembling a per-group sort of the full corpus survives.
    */
  /** Deterministic train/val/test assignment by id hash — the split
    * primitive of every training pipeline. Each row's bucket is a
    * multiplicative hash of its id mod 100 (the [[hashSample]] mixer:
    * engine-portable integer arithmetic, so the DuckDB oracle replays it
    * bit-for-bit), and `pcts` carves the 100 buckets into named splits
    * (e.g. train 80 / val 10 / test 10).
    *
    * MAP-ONLY on purpose: the assignment is a pure projection — no
    * shuffle, no state — so it fuses into the scan and costs nothing at
    * 100 TB, and a row's split never changes when the corpus grows,
    * is repartitioned, or is re-read (rand()-based splits lose all
    * three). Proportions are statistically exact (hash ⊥ any stratum
    * column), not count-exact; a count-exact stratified split needs a
    * per-stratum total order — one sort task per stratum, a driver-sized
    * bottleneck at scale — which is why production splits hash. The
    * per-stratum balance is itself checkable with one groupBy (see the
    * q101 registration).
    */
  def splitAssign(df: DataFrame, idCol: String,
                  pcts: Seq[(String, Int)]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(_._2 > 0),
      "splitAssign: every split needs a positive percentage")
    require(pcts.map(_._2).sum == 100,
      s"splitAssign: percentages must sum to 100, got ${pcts.map(_._2).sum}")
    val p = 1000000007L
    val h = pmod(pmod(col(idCol).cast("long"), lit(p)) * lit(2654435761L), lit(p))
    val bucket = pmod(h, lit(100L))
    val cum = pcts.scanLeft(0) { case (acc, (_, pc)) => acc + pc }.tail
    // when-chain over cumulative thresholds; last split is the otherwise
    val split = pcts.zip(cum).dropRight(1).foldRight(lit(pcts.last._1)) {
      case (((name, _), c), els) => when(bucket < c, lit(name)).otherwise(els)
    }
    df.withColumn("split", split)
  }

  /** Deterministic epoch shuffle: the (shard, position-in-shard) layout
    * a training job reads — shard files written in `shard_pos` order ARE
    * the epoch's global sample order. The per-row key mixes the id hash
    * with the epoch (same engine-portable mixer as [[hashSample]]), so
    * every epoch is a different but fully reproducible permutation.
    *
    * Scale posture: a naive global `ORDER BY hash` + row_number ends in
    * a SINGLE-partition window — the driver-shaped bottleneck. Sharding
    * first (`pmod(key, shards)`) makes the sort per-shard: one Exchange
    * on the shard id, `shards` independent sorts of n/`shards` rows
    * each, and the total order is recovered as (shard, shard_pos) —
    * exactly how epoch shuffles are laid out on disk at scale.
    */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
                   shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive, got $shards")
    require(epoch >= 0, s"epoch must be non-negative, got $epoch")
    val p = 1000000007L
    // pmod(id,p)·2654435761 < 2.7e18 and the epoch term is tiny: the sum
    // stays under Long.Max, so ANSI arithmetic cannot overflow
    val h = pmod(pmod(col(idCol).cast("long"), lit(p)) * lit(2654435761L)
      + lit(epoch.toLong) * lit(976369L), lit(p))
    val w = Window.partitionBy(col("shard")).orderBy(col("_h").asc,
      col(idCol).asc)
    df.withColumn("_h", h)
      .withColumn("shard", pmod(col("_h"), lit(shards.toLong)))
      .withColumn("shard_pos", row_number().over(w))
      .drop("_h")
  }

  def hashSample(df: DataFrame, groupCol: String, idCol: String,
                 k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val p = 1000000007L
    val h = pmod(pmod(col(idCol).cast("long"), lit(p)) * lit(2654435761L), lit(p))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("_h").asc, col(idCol).asc)
    df.withColumn("_h", h)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
      .drop("_h")
  }

  /** Weighted sampling without replacement by exponential keys
    * (Efraimidis & Spirakis 2006): each row draws key = u^(1/w) for a
    * uniform u and the k LARGEST keys are the sample — the
    * one-pass, fully distributed way to sample a corpus proportionally
    * to quality scores / lengths / temperatures, and the weighted
    * complement of [[hashSample]]'s uniform rank. Ranking uses the
    * monotone-equivalent ln(u)/w (no pow), u derives from the q96
    * multiplicative id-hash mapped into (0, 1], so the "random" draw
    * is reproducible under reruns and repartitioning. Rows with a
    * non-positive or null weight are excluded.
    *
    * `es_key` fixes to the 12-dp grid BEFORE the ranking (ln is the
    * one transcendental here, and engines disagree at the last ulp —
    * the zipfSlope rule); ties on the grid resolve by id.
    *
    * Plan/scale: map-only key computation fused into the scan; the
    * top-k is a TakeOrderedAndProject (k per partition, merge k —
    * never a global sort); the rank column is a window over the
    * ALREADY-CUT k rows.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
                     k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val p = 1000000007L
    val h = pmod(pmod(col(idCol).cast("long"), lit(p)) * lit(2654435761L),
      lit(p))
    val u = (h + lit(1L)).cast("double") / lit((p + 1).toDouble)
    val key = round(log(u) / weightCol.cast("double"), 12)
    val wRank = Window.orderBy(col("es_key").desc, col(idCol).asc)
    df.filter(weightCol.isNotNull && weightCol > 0)
      // weight reports in the column's magnitude as DOUBLE: the key
      // uses the full double weight, so a long-truncated report would
      // show 0 for fractional weights (quality scores in (0,1)) that
      // ranked perfectly well — round-8 advice
      .select(col(idCol), weightCol.cast("double").as("weight"),
        key.as("es_key"))
      .orderBy(col("es_key").desc, col(idCol).asc)
      .limit(k)
      .withColumn("sample_rank", row_number().over(wRank))
  }

  /** Gopher-style rule-based quality filter (Rae et al. 2021, §A1.1 —
    * the rule family MassiveText shipped and C4/RefinedWeb variants
    * reuse): per document,
    *   len_ok       minWords ≤ words ≤ maxWords
    *   word_len_ok  mean word length ∈ [3, 10]
    *   symbol_ok    symbol-token ("#", "...", "…") share ≤ 0.1
    *   alpha_ok     ≥ 0.8 of words contain a letter
    *   bullet_ok    ≤ 0.9 of lines start with a bullet
    *   ellipsis_ok  ≤ 0.3 of lines end with an ellipsis
    *   stopword_ok  ≥ 2 distinct common stopwords present
    * and `keep` = all of them. Complements [[graft.text.TextStats]]'s
    * continuous quality SCORES with the standard named thresholds a
    * curation pipeline actually gates on.
    *
    * Every ratio rule is evaluated in EXACT integer arithmetic
    * (e.g. mean-length ∈ [3,10] ⇔ 3·n ≤ Σlen ≤ 10·n), so the verdicts
    * are bit-identical on any engine — no float thresholds to drift.
    * Pure column expressions over one projection: map-only, fused into
    * the scan at any scale.
    */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
                   minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val stop = Array("the", "be", "to", "of", "and", "that", "have",
      "with", "a", "in")
    val toks = filter(TextStats.tokens(col(textCol)), t => t =!= lit(""))
    val lines = split(col(textCol), "\n", -1)
    df.select(col(idCol), col(textCol),
        size(toks).cast("long").as("_nw"),
        aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
          .as("_sumlen"),
        size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
          .as("_nalpha"),
        size(filter(toks, t => t.isin("#", "...", "…"))).cast("long")
          .as("_nsym"),
        size(lines).cast("long").as("_nlines"),
        size(filter(lines, l => l.startsWith("- ") || l.startsWith("* ") ||
          l.startsWith("• "))).cast("long").as("_nbullet"),
        size(filter(lines, l => l.endsWith("...") || l.endsWith("…")))
          .cast("long").as("_nell"),
        size(array_intersect(array_distinct(toks),
          lit(stop))).cast("long").as("_nstop"))
      .select(col(idCol).cast("long").as("doc_id"),
        col("_nw").as("n_words"),
        (col("_nw") >= minWords && col("_nw") <= maxWords).as("len_ok"),
        (col("_nw") > 0 && lit(3L) * col("_nw") <= col("_sumlen") &&
          col("_sumlen") <= lit(10L) * col("_nw")).as("word_len_ok"),
        (lit(10L) * col("_nsym") <= col("_nw")).as("symbol_ok"),
        (lit(5L) * col("_nalpha") >= lit(4L) * col("_nw")).as("alpha_ok"),
        (lit(10L) * col("_nbullet") <= lit(9L) * col("_nlines"))
          .as("bullet_ok"),
        (lit(10L) * col("_nell") <= lit(3L) * col("_nlines"))
          .as("ellipsis_ok"),
        (col("_nstop") >= 2L).as("stopword_ok"))
      .withColumn("keep",
        col("len_ok") && col("word_len_ok") && col("symbol_ok") &&
        col("alpha_ok") && col("bullet_ok") && col("ellipsis_ok") &&
        col("stopword_ok"))
  }

  /** Stratified sampling with Neyman (optimal) allocation: a fixed
    * total budget `totalN` splits across strata proportionally to
    * n_s·σ_s — stratum size times the population stddev of `sizeCol` —
    * the allocation that minimizes the variance of a stratified mean
    * estimate (Neyman 1934; the budgeted eval-set construction move:
    * spend the labeling/eval budget where the data varies). Fractional
    * ideals resolve to integer quotas by LARGEST-REMAINDER (Hamilton)
    * apportionment: floor every ideal, then hand the leftover units to
    * the largest remainders (ties → stratum name asc). A quota caps at
    * the stratum's row count (no redistribution — an undershoot is
    * reported by the quota column, not silently moved). If every
    * stratum is constant (all σ = 0) the weights degenerate and
    * allocation falls back proportional-to-size. Within a stratum the
    * sample is the [[hashSample]] multiplicative-hash rank — stable
    * under reruns and repartitioning.
    *
    * Determinism across engines: σ comes from exact decimal power
    * sums; σ, ideals, and remainders fix to a 9-dp grid before
    * floor/compare; weights are exact DECIMAL(28,6) sums.
    *
    * Plan/scale: one hash agg to stratum stats (aggregate-sized), the
    * quota arithmetic rides unpartitioned windows over that one-row-
    * per-stratum frame (single-partition by design — fine for any real
    * stratum cardinality, and it avoids self-join lineage), then
    * quotas broadcast back onto the row stream and one per-stratum
    * rank window cuts the sample. The big table is scanned twice
    * (stats + rank) and shuffled once (the rank window).
    */
  def neymanSample(df: DataFrame, stratumCol: String, idCol: String,
                   sizeCol: Column, totalN: Int): DataFrame = {
    require(totalN > 0, s"totalN must be positive, got $totalN")
    val p = 1000000007L
    val v = sizeCol.cast(DecimalType(18, 6))
    def dd(c: Column) = c.cast("double")
    val nS = count(lit(1))
    val varS = (dd(sum((v * v).cast(DecimalType(38, 12)))) -
      dd(sum(v)) * dd(sum(v)) / nS) / nS
    val strata = df.groupBy(col(stratumCol))
      .agg(nS.cast("long").as("n_rows"),
        round(sqrt(greatest(varS, lit(0.0))), 9).as("_sd"))
      .withColumn("_w", round(col("n_rows") * col("_sd"), 6)
        .cast(DecimalType(28, 6)))
    // the allocation arithmetic rides UNPARTITIONED windows over the
    // aggregate-sized strata frame (one row per stratum): totals,
    // base-sum, and the remainder rank all need the whole frame, and a
    // window avoids the self-join lineage a crossJoin(agg-of-self)
    // would create
    val wAll = Window.partitionBy()
    val ideal = when(dd(col("_wTot")) > 0,
        round(lit(totalN.toDouble) * dd(col("_w")) / dd(col("_wTot")), 9))
      .otherwise(round(lit(totalN.toDouble) * col("n_rows") / col("_nTot"), 9))
    val wRem = Window.orderBy(col("_rem").desc, col(stratumCol).asc)
    val quotas = strata
      .withColumn("_wTot", sum(col("_w")).over(wAll))
      .withColumn("_nTot", sum(col("n_rows")).over(wAll))
      .withColumn("_ideal", ideal)
      .withColumn("_base", floor(col("_ideal")))
      .withColumn("_rem", round(col("_ideal") - col("_base"), 9))
      .withColumn("_baseSum", sum(col("_base")).over(wAll))
      .withColumn("_xr", row_number().over(wRem))
      .withColumn("quota",
        least(col("_base") + when(col("_xr") <=
            greatest(lit(totalN.toLong) - col("_baseSum"), lit(0L)), 1L)
          .otherwise(0L), col("n_rows")).cast("long"))
      .select(col(stratumCol).as("_qStratum"), col("quota"))
    val h = pmod(pmod(col(idCol).cast("long"), lit(p)) * lit(2654435761L),
      lit(p))
    val wRank = Window.partitionBy(col(stratumCol))
      .orderBy(col("_h").asc, col(idCol).asc)
    df.join(broadcast(quotas), col(stratumCol) === col("_qStratum"))
      .withColumn("_h", h)
      .withColumn("sample_rank", row_number().over(wRank))
      .filter(col("sample_rank") <= col("quota"))
      .select(col(stratumCol), col(idCol), col("sample_rank"), col("quota"))
  }

  /** CCNet-style line-level boilerplate removal: drop every line whose
    * DISTINCT-document frequency exceeds `maxLineDf` (navigation chrome,
    * cookie banners, license headers — the text that repeats across a
    * crawl without being a document-level duplicate), then reassemble
    * each doc from its surviving lines in original order. Docs whose
    * every line is boilerplate disappear (nothing left to train on).
    *
    * Shape: posexplode (map-only) → line-frequency hash agg → hash join
    * back → per-doc collect_list bounded by the doc's own line count.
    * The collected struct carries the line index, so reassembly is
    * deterministic (sort_array on the index) without a window sort.
    */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
                       maxLineDf: Long = 1L): DataFrame = {
    val lines = df.select(col(idCol).cast("long").as("doc_id"),
      posexplode(split(col(textCol), "\n")).as(Seq("line_idx", "line")))
    val freq = lines.groupBy(col("line"))
      .agg(count_distinct(col("doc_id")).as("_ldf"))
    lines.join(freq, "line")
      .filter(col("_ldf") <= maxLineDf)
      .groupBy(col("doc_id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("line_idx"), col("line")))),
            s => s.getField("line")), "\n").as("clean_text"),
        count(lit(1)).as("n_lines_kept"))
  }

  /** Per-document TF-IDF, top-`topK` terms per doc:
    * tf = n(term, doc) / n(doc); idf = ln(N / df(term)); ranked with a
    * deterministic (tfidf desc, term asc) tiebreak on ROUNDED scores so
    * the ordering is engine-portable. The doc-frequency join shuffles
    * by term — the standard inverted-index shape — and the corpus total
    * is a broadcast scalar, so nothing funnels through the driver.
    */
  def tfIdf(df: DataFrame, idCol: String, textCol: String, topK: Int): DataFrame = {
    val tok = df.select(col(idCol).cast("long").as("doc_id"),
      explode(TextStats.tokens(col(textCol))).as("term"))
    val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("n"))
      .withColumn("n_doc", sum(col("n")).over(Window.partitionBy("doc_id")))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val total = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(total))
      .withColumn("tfidf", round((col("n") / col("n_doc")) *
        log(col("n_docs") / col("df")), 6))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc))
        .cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("doc_id"), col("term"), col("tfidf"), col("rnk"))
  }

  /** End-to-end corpus curation: quality gate (token count + stopword
    * ratio) → transitive near-dup clustering keeping only each cluster's
    * canonical doc → deterministic id-modulo train/val/test assignment.
    * Returns the surviving docs with quality features and a `split`
    * column. Every stage is the scale-path variant: map-side feature
    * computation, prefix-filtered near-dup candidates, O(log n)
    * component rounds, modulo split (cluster-size invariant).
    */
  def curate(df: DataFrame, idCol: String, textCol: String,
             minTokens: Int, maxStopwordRatio: Double,
             shingleN: Int = 5, threshold: Double = 0.5): DataFrame = {
    val good = TextStats.qualityFeatures(df, textCol)
      .filter(col("n_tokens") >= minTokens &&
        col("stopword_ratio") <= maxStopwordRatio)
    val keep = Clusters.dupClusters(good, idCol, textCol, shingleN, threshold)
      .filter(col("is_canonical")).select(col("doc_id").as("_did"))
    good.withColumn("_did", col(idCol).cast("long"))
      .join(keep, "_did")
      .withColumn("split",
        when(pmod(col("_did"), lit(10)) < 8, lit("train"))
          .when(pmod(col("_did"), lit(10)) === 8, lit("val"))
          .otherwise(lit("test")))
      .drop("_did")
  }

  /** Regex PII redaction: replace email addresses, phone numbers
    * (10-digit with optional country code), and IPv4 addresses with
    * typed placeholder tokens, and count the redactions per doc. Pure
    * `regexp_replace` / `regexp_count` projections — map-side, fused
    * into the scan. The phone pattern is fenced with digit lookarounds
    * so it never fires inside a longer digit run (card numbers, ids);
    * lookbehind is Java-regex-only, so the q143 oracle gate checks the
    * detector against ID-ARITHMETIC ground truth (constructed PII with
    * known counts and lengths) rather than a second regex engine —
    * plus a generative law over random PII mixes in LawsProps.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern =
    "(?<![0-9])\\+?(?:[0-9]{1,3}[- .])?\\(?[0-9]{3}\\)?[- .]?[0-9]{3}[- .]?[0-9]{4}(?![0-9])"
  val Ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val redactions = Seq(
      EmailPattern -> "<EMAIL>", PhonePattern -> "<PHONE>", Ipv4Pattern -> "<IP>")
    // count each pattern on the text AS THE PREVIOUS PASS LEFT IT, so a
    // span consumed by an earlier replacement (an email whose local part
    // looks like a phone) is not double-counted: n_redactions equals the
    // number of placeholders actually inserted
    val (scrubbed, counts) = redactions
      .foldLeft((col(textCol), Seq.empty[org.apache.spark.sql.Column])) {
        case ((cur, cs), (p, tag)) =>
          (regexp_replace(cur, p, tag), cs :+ regexp_count(cur, lit(p)))
      }
    df.withColumn("n_redactions", counts.reduce(_ + _).cast("long"))
      .withColumn(textCol, scrubbed)
  }

  /** Checksum-validated PII extension over [[redactPii]]: IBAN
    * (ISO 7064 mod-97), payment cards (Luhn), and IPv6 — the classes a
    * regex alone over- or under-redacts — run FIRST via the codegen'd
    * [[graft.functions.RedactExtExpr]] (most-specific-first: a card's
    * digit run must be tagged before the phone pattern could touch it),
    * then the email/phone/IPv4 regex family on the scrubbed text.
    * Checksum-invalid candidates stay VERBATIM (scrubbing a failed-
    * checksum run destroys non-PII data for zero privacy gain).
    * Separate operator so [[redactPii]]'s q143 surface is unchanged;
    * q151 gates this one with valid items AND one-digit-off twins.
    */
  def redactPiiExtended(df: DataFrame, textCol: String): DataFrame = {
    import org.apache.spark.sql.GraftColumn
    val ext = GraftColumn(
      graft.functions.RedactExtExpr(GraftColumn.expr(col(textCol))))
    redactPii(
        df.withColumn("_ext", ext).withColumn(textCol, col("_ext.text")),
        textCol)
      .withColumn("n_iban", col("_ext.n_iban").cast("long"))
      .withColumn("n_card", col("_ext.n_card").cast("long"))
      .withColumn("n_ip6", col("_ext.n_ip6").cast("long"))
      .withColumn("n_redactions", col("n_redactions") +
        col("n_iban") + col("n_card") + col("n_ip6"))
      .drop("_ext")
  }

  /** Materialized sequence packing: assign docs to fixed token-budget
    * batches by a running per-source token sum (deterministic doc_id
    * order ⇒ identical batches on any cluster size), then concatenate
    * each batch's texts in doc order with an explicit separator — the
    * actual training-sequence artifact, not just the batch stats. The
    * collect_list is bounded by the token budget, never the corpus.
    */
  def packedSequences(df: DataFrame, idCol: String, textCol: String,
                      sourceCol: String, budget: Long,
                      sep: String = " <eos> "): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    // explicit ROWS frame: the default RANGE frame would sum ALL peer
    // rows of a duplicated id at once, shifting every tied row into the
    // same (later) batch and diverging from the row-at-a-time semantics
    val w = Window.partitionBy(col(sourceCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", TextStats.tokenCount(col(textCol)).cast("long"))
      .withColumn("batch_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens")) / budget).cast("long"))
      .groupBy(col(sourceCol), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("batch_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col(idCol), col(textCol)))),
            _.getField(textCol)), sep).as("packed_text"))
  }

  /** Training-mix resampling: each source gets an epoch weight w — docs
    * are repeated floor(w) times plus one more for the deterministic
    * id-modulo fraction (w = 2.3 ⇒ every doc twice, and the stable 30%
    * of ids a third time). Map-side explode of a per-row copy count: no
    * shuffle, no RNG, identical output on any cluster size — the
    * down/up-sampling mixture step of a training-data pipeline
    * (e.g. Wikipedia × 3 epochs, web crawl × 0.3).
    * Output repeats each kept doc with `epoch` = 0..copies-1.
    */
  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
                    weights: Map[String, Double],
                    defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values.toSeq :+ defaultWeight).forall(_ >= 0),
      "mixture weights must be non-negative")
    val w = weights.foldLeft(lit(defaultWeight)) { case (acc, (s, wt)) =>
      when(col(sourceCol) === s, lit(wt)).otherwise(acc)
    }
    // copies = floor(w) + (id mod 100 < round(frac·100) ? 1 : 0); the
    // fractional part is resolved at 1% granularity on a stable id hash
    df.withColumn("_w", w)
      .withColumn("_copies", (floor(col("_w")) +
        when(pmod(col(idCol).cast("long"), lit(100L)) <
          round(
            (col("_w") - floor(col("_w"))) * 100), 1L).otherwise(0L)).cast("long"))
      .filter(col("_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("_copies") - 1)))
      .drop("_w", "_copies")
  }

  /** Temperature-scaled source sampling weights — the multilingual /
    * multi-source α-sampling rule (sample source s with probability
    * ∝ pₛᵅ where pₛ is its natural token share; α = 1 keeps the natural
    * mix, α → 0 approaches uniform, the standard knob for keeping big
    * web crawls from drowning small high-quality sources; cf. the
    * sampling-temperature scheme in multilingual LM training, e.g.
    * mBERT/XLM-R exponent sampling). Emits per source: doc/token
    * counts, the natural share, the α-scaled target share, and
    * `rate = target/natural` — the factor [[mixtureSample]] then
    * applies as its weight map.
    *
    * Determinism: token totals are exact longs; the natural share is
    * one double division of exact integers (bit-stable); pow() runs on
    * those doubles and is then FIXED as a rounded DECIMAL(28,12)
    * before the normalizing sum, so the Σqᵅ denominator is an exact
    * decimal sum (order-independent) rather than a float reduction
    * whose result depends on aggregation order. Final shares/rates are
    * rounded doubles. The whole computation happens on the
    * AGGREGATE-sized per-source frame; the corpus is touched by one
    * token-count aggregation only.
    */
  def temperatureWeights(df: DataFrame, sourceCol: String, textCol: String,
                         alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    import org.apache.spark.sql.types.DecimalType
    val perSrc = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(TextStats.tokenCount(col(textCol)).cast("long")).as("n_tokens"))
    val tot = Window.partitionBy() // single-row frame: k sources, not data
    val scored = perSrc
      .withColumn("natural_share",
        col("n_tokens").cast("double") / sum(col("n_tokens")).over(tot))
      .withColumn("_q", round(pow(col("natural_share"), lit(alpha)), 12)
        .cast(DecimalType(28, 12)))
    scored
      .withColumn("target_share",
        round(col("_q").cast("double") /
          sum(col("_q")).over(tot).cast("double"), 9))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        round(col("natural_share"), 9).as("natural_share"),
        col("target_share"),
        round(col("target_share") /
          (col("n_tokens").cast("double") /
            sum(col("n_tokens")).over(tot)), 6).as("rate"))
  }

  /** Gopher/MassiveText-style repetition signal: the fraction of a
    * doc's 3-gram shingles that are repeats of an earlier one —
    * `(total - distinct) / total`. Pure per-row column expressions over
    * the two native shingle forms (with and without dedupe): map-side,
    * fused into the scan, no shuffle at all.
    */
  def repetitionRatio(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3): DataFrame = {
    import org.apache.spark.sql.GraftColumn
    val toks = TextStats.tokens(col(textCol))
    val all = GraftColumn(graft.functions.ShinglesExpr(
      GraftColumn.expr(toks), n, distinct = false))
    val set = GraftColumn(graft.functions.ShinglesExpr(
      GraftColumn.expr(toks), n, distinct = true))
    df.select(col(idCol).cast("long").as("doc_id"),
        size(all).cast("long").as("n_shingles"),
        size(set).cast("long").as("_nd"))
      .withColumn("dup_ratio", round(
        (col("n_shingles") - col("_nd")) / col("n_shingles"), 6))
      .drop("_nd")
  }

  /** Per-doc mean bigram log-probability under the corpus bigram LM —
    * a model-free fluency/perplexity proxy for quality filtering: docs
    * whose transitions are rare corpus-wide score low. The corpus LM is
    * one hash aggregation; scoring joins each doc's bigrams to it
    * (inverted-index shape). Each ln(p) is rounded then summed as an
    * exact decimal so the per-doc mean is partition-order-independent.
    */
  def docLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = df.select(col(idCol).cast("long").as("doc_id"),
      explode(Dedup.shinglesOfTokens(
        TextStats.tokens(col(textCol)), 2)).as("bigram"))
    val lm = bg.groupBy("bigram").agg(count(lit(1)).as("n"))
      .withColumn("nw1", sum(col("n")).over(
        Window.partitionBy(substring_index(col("bigram"), " ", 1))))
    bg.join(lm, "bigram")
      .withColumn("_lp", round(log(col("n") / col("nw1")), 9)
        .cast(org.apache.spark.sql.types.DecimalType(20, 9)))
      .groupBy("doc_id")
      .agg(round(sum(col("_lp")).cast("double") / count(lit(1)), 6)
          .as("avg_logprob"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Bigram language-model statistics: corpus-wide bigram counts with
    * the conditional probability p(w2 | w1) = n(w1 w2) / n(w1 ·).
    * One explode + one hash aggregation + one window over the (tiny)
    * distinct-bigram table — the corpus itself is never shuffled.
    * Short docs (< 2 tokens) contribute their whole text as a single
    * "bigram", mirroring [[graft.functions.ShinglesExpr]]'s fallback.
    */
  /** Learn `nMerges` byte-pair-encoding merge rules from the corpus
    * (Sennrich, Haddow & Birch, ACL 2016): start from whitespace words
    * split into character symbols with a word-end marker, repeatedly
    * merge the most frequent adjacent symbol pair. Returns the merge
    * table `(rank, left, right, merged, pair_count)` — the artifact a
    * tokenizer ships (q28's regex segmentation is the APPLY-side
    * heuristic; this is the LEARNED vocabulary).
    *
    * Distributed shape — the part that matters at 100 TB: training
    * runs on the DISTINCT-WORD frequency table (one corpus pass; BPE
    * statistics are word-count-weighted, so the working set is
    * vocabulary-sized forever after). Each iteration is one
    * explode+aggregate over that frame (map-side partials) with only
    * the winning pair — two strings — reaching the driver, and the
    * merge applies corpus-side as a single left-to-right fold
    * expression (`aggregate` HOF, no UDF). Iteration state is
    * checkpointed per round with the previous round's blocks released
    * immediately (the connectedComponents discipline), so plans stay
    * flat and storage bounded at ~1 round.
    *
    * Deterministic: ties break (count desc, left asc, right asc);
    * training stops early when no pair reaches `minPairCount`.
    */
  def trainBpe(df: DataFrame, textCol: String, nMerges: Int,
               minPairCount: Long = 2L): DataFrame = {
    import org.apache.spark.sql.GraftCheckpoint
    require(nMerges >= 1 && nMerges <= 1000,
      s"nMerges must be in [1, 1000], got $nMerges")
    val spark = df.sparkSession
    val words = df
      .select(explode(TextStats.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      // chars + the word-end marker (its own symbol, the Sennrich
      // convention — merges can then learn suffixes distinctly)
      .select(col("n"),
        concat(split(col("word"), ""), array(lit("</w>"))).as("syms"))
    var (seqs, releaseSeqs) = GraftCheckpoint.withHandle(words, eager = false)
    val merges = scala.collection.mutable.ArrayBuffer[(String, String, Long)]()
    var done = false
    while (!done && merges.size < nMerges) {
      val top = seqs
        .select(col("n"), col("syms"), posexplode(col("syms")).as(Seq("i", "l")))
        // try_: the last symbol has no right neighbour (ANSI element_at
        // would throw past the end); null rows drop in the next filter
        .withColumn("r", try_element_at(col("syms"), col("i") + 2))
        .filter(col("r").isNotNull)
        .groupBy(col("l"), col("r")).agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty || top.head.getLong(2) < minPairCount) done = true
      else {
        val (l, r) = (top.head.getString(0), top.head.getString(1))
        merges += ((l, r, top.head.getLong(2)))
        val (next, releaseNext) = GraftCheckpoint.withHandle(
          seqs.select(col("n"), mergeFold(col("syms"), l, r).as("syms")),
          eager = false)
        next.count() // materialize before freeing the previous round
        releaseSeqs(); releaseSeqs = releaseNext
        seqs = next
      }
    }
    releaseSeqs()
    import spark.implicits._
    merges.toSeq.zipWithIndex
      .map { case ((l, r, c), i) => (i.toLong, l, r, l + r, c) }
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** One left-to-right greedy merge pass of adjacent pair (l, r) over a
    * symbol array — the classic BPE application step, as a pure fold
    * (`aggregate` HOF; codegen'd, no UDF). Non-overlapping leftmost
    * occurrences merge: "a a a a" under (a, a) becomes "aa aa".
    */
  private def mergeFold(syms: Column, l: String, r: String): Column =
    aggregate(syms,
      array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false)),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(s))))

  /** Segment every document with a LEARNED merge table ([[trainBpe]]):
    * each word starts as characters + marker and replays the merges in
    * rank order. `merges` is the bounded driver-side rule list (the
    * tokenizer artifact — vocabulary-sized, never corpus data).
    * Returns `(original columns..., bpe_tokens, n_bpe_tokens)`.
    */
  def applyBpe(df: DataFrame, textCol: String,
               merges: Seq[(String, String)]): DataFrame = {
    require(merges.size <= 200,
      s"applyBpe chains one fold per rule (${merges.size}); segment with " +
        "a dedicated tokenizer artifact beyond 200 merges")
    df.withColumn("_bpe_words", TextStats.tokens(col(textCol)))
      .withColumn("bpe_tokens",
        flatten(transform(filter(col("_bpe_words"), w => w =!= ""), w =>
          merges.foldLeft(concat(split(w, ""), array(lit("</w>")))) {
            case (c, (l, r)) => mergeFold(c, l, r) })))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")).cast("long"))
      .drop("_bpe_words")
  }

  /** Tokenizer-fit audit of a merge table over a corpus slice column:
    * per group, total whitespace words, total BPE tokens under
    * `merges`, words that merged to a SINGLE token (in-vocabulary
    * whole words), fertility (tokens per word — the standard
    * tokenizer-efficiency metric; a fertility creep on a new source
    * means the tokenizer undersegments it and token budgets silently
    * inflate) and the whole-word rate. Fertility/rate are unrounded
    * exact-integer quotients (q107 discipline), NULL for empty groups.
    *
    * Scale shape: per-word merge folds and the per-doc counts all fuse
    * into the scan (map-only, same folds as [[applyBpe]] via the
    * shared [[mergeFold]]); the only shuffle is the final
    * group-count aggregate, whose state is slice-count-sized.
    */
  def bpeFertility(df: DataFrame, groupCol: String, textCol: String,
                   merges: Seq[(String, String)]): DataFrame = {
    require(merges.size <= 200,
      s"bpeFertility chains one fold per rule (${merges.size}); audit " +
        "with a dedicated tokenizer artifact beyond 200 merges")
    val words = filter(TextStats.tokens(col(textCol)), w => w =!= "")
    val wc = transform(words, w =>
      size(merges.foldLeft(concat(split(w, ""), array(lit("</w>")))) {
        case (c, (l, r)) => mergeFold(c, l, r) }).cast("long"))
    df.select(col(groupCol), wc.as("_wc"))
      .select(col(groupCol),
        size(col("_wc")).cast("long").as("_nw"),
        aggregate(col("_wc"), lit(0L), (a, x) => a + x).as("_nt"),
        aggregate(col("_wc"), lit(0L), (a, x) =>
          a + when(x === lit(1L), lit(1L)).otherwise(lit(0L))).as("_ns"))
      .groupBy(col(groupCol))
      .agg(sum(col("_nw")).cast("long").as("n_words"),
        sum(col("_nt")).cast("long").as("n_bpe_tokens"),
        sum(col("_ns")).cast("long").as("n_whole"))
      .select(col(groupCol), col("n_words"), col("n_bpe_tokens"),
        col("n_whole"),
        when(col("n_words") > 0,
          col("n_bpe_tokens") / col("n_words")).as("fertility"),
        when(col("n_words") > 0,
          col("n_whole") / col("n_words")).as("whole_word_rate"))
  }

  def bigramStats(df: DataFrame, textCol: String, topK: Int): DataFrame =
    df.select(explode(Dedup.shinglesOfTokens(
        TextStats.tokens(col(textCol)), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .withColumn("p_cond", round(col("n") / sum(col("n")).over(
        Window.partitionBy(substring_index(col("bigram"), " ", 1))), 6))
      .orderBy(col("n").desc, col("bigram").asc)
      .limit(topK)

  /** DSIR importance log-weights (Xie, Santurkar, Ma & Liang, "Data
    * Selection for Language Models via Importance Resampling",
    * NeurIPS 2023, §2): score every raw document by how much more
    * likely its hashed n-gram features are under a TARGET feature
    * distribution (the `targetPred` slice — a trusted high-quality
    * reference) than under the raw-corpus distribution:
    *
    *   log w(x) = Σ_b c_x(b) · (ln p_tgt(b) − ln p_raw(b))
    *
    * with features = unigrams ++ word bigrams (the paper's feature
    * set) hashed into `dim` buckets via the engine-portable md5
    * convention shared with [[TextStats.hashedTfidf]], and add-1
    * smoothing over the `dim`-bucket domain on both sides (so unseen
    * buckets carry a finite penalty, not −∞). A null `targetPred`
    * counts to raw only — the doc still scores, it just isn't part
    * of the reference slice.
    *
    * Scale shape — the part that matters at 100 TB: ONE
    * feature-explode shuffle to (doc, bucket) counts; both feature
    * distributions are `dim`-bounded aggregates BROADCAST back onto
    * the per-doc counts, so the corpus shuffles once and nothing
    * distribution-sized ever moves again. Each ln is fixed to the
    * 12-dp grid separately, the log-likelihood-ratio difference and
    * the weighted sum are exact decimals — the per-doc weight is
    * partition-order-independent and the DuckDB oracle replays it
    * bit-for-bit. Returns `(doc_id, n_feats, log_weight)`.
    */
  def dsirLogWeights(df: DataFrame, idCol: String, textCol: String,
                     targetPred: Column, dim: Int = 64): DataFrame = {
    require(dim >= 2 && dim <= 65536, s"dim must be in [2, 65536], got $dim")
    val docs = df.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("_t"), targetPred.as("_tgt"))
    val toks = TextStats.tokens(col("_t"))
    // spread the scan (guide §2.2): tokenize + bigram shingle + per-feat
    // md5 all run upstream of the (doc, bucket) exchange — one task on
    // a single-file input; identity at scale
    val feats = graft.engine.Layout.spreadForCompute(docs)
      .select(col("doc_id"), col("_tgt"),
        explode(concat(toks, Dedup.shinglesOfTokens(toks, 2))).as("feat"))
      .filter(col("feat") =!= "")
      .select(col("doc_id"), col("_tgt"),
        (conv(substring(md5(col("feat")), 1, 8), 16, 10).cast("long")
          % lit(dim.toLong)).as("bucket"))
    val perDoc = feats.groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("c"))
    // dim-bounded: the ONLY state besides the one (doc, bucket) shuffle
    val dist = feats.groupBy(col("bucket"))
      .agg(count(lit(1)).as("c_raw"),
        sum(when(col("_tgt"), lit(1L)).otherwise(lit(0L))).as("c_tgt"))
    val totals = dist.agg(sum(col("c_raw")).as("t_raw"),
      sum(col("c_tgt")).as("t_tgt"))
    val llr = dist.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (round(log((col("c_tgt") + lit(1L)).cast("double") /
            (col("t_tgt") + lit(dim.toLong)).cast("double")), 12)
            .cast(DecimalType(16, 12)) -
          round(log((col("c_raw") + lit(1L)).cast("double") /
            (col("t_raw") + lit(dim.toLong)).cast("double")), 12)
            .cast(DecimalType(16, 12))).as("_llr"))
    perDoc.join(broadcast(llr), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_feats"),
        round(sum(col("c").cast(DecimalType(7, 0)) * col("_llr"))
          .cast("double"), 6).as("log_weight"))
  }

  /** Gumbel-top-k weighted sampling WITHOUT replacement in log space —
    * the resampling draw DSIR §2.2 pairs with [[dsirLogWeights]]:
    * key = logW + g with g = −ln(−ln u) and u the reproducible q96
    * multiplicative id-hash mapped into (0, 1); the k LARGEST keys are
    * the sample. Distributionally the Gumbel-max draw equals
    * [[weightedSample]]'s exponential-key draw, but it consumes the
    * weight as a LOG — numerically safe when log-weights span hundreds
    * of nats, where exp(logW) would flush a double to 0/∞.
    *
    * `gumbel_key` fixes to the 12-dp grid before ranking (two nested
    * ln calls — the one transcendental here); ties resolve by id.
    * Plan/scale: map-only key fused into the scan, top-k is a
    * TakeOrderedAndProject (k per partition, merge k — never a global
    * sort), rank windows over the already-cut k rows.
    */
  def gumbelTopK(df: DataFrame, idCol: String, logWeightCol: Column,
                 k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val p = 1000000007L
    val h = pmod(pmod(col(idCol).cast("long"), lit(p)) * lit(2654435761L),
      lit(p))
    val u = (h + lit(1L)).cast("double") / lit((p + 1).toDouble)
    val key = round(logWeightCol.cast("double") - log(-log(u)), 12)
    val wRank = Window.orderBy(col("gumbel_key").desc, col(idCol).asc)
    df.filter(logWeightCol.isNotNull)
      .select(col(idCol), logWeightCol.cast("double").as("log_weight"),
        key.as("gumbel_key"))
      .orderBy(col("gumbel_key").desc, col(idCol).asc)
      .limit(k)
      .withColumn("sample_rank", row_number().over(wRank))
  }

  /** Gopher REPETITION rules (Rae et al. 2021, Table A1's second
    * half — the within-document repetition family [[gopherFilter]]
    * deliberately left out): a document is machine-generated spam when
    * too much of it is the same line / n-gram over and over.
    *
    *   - dup_line:        repeated-line occurrences (beyond each
    *                      line's first) ≤ 30% of lines
    *   - dup_line_chars:  characters in those repeats ≤ 20% of chars
    *   - top_bigram:      chars covered by the single most frequent
    *                      word bigram ≤ 20% of chars
    *   - dup_5gram:       chars in repeated 5-gram occurrences
    *                      (beyond first) ≤ 15% of chars
    *
    * All verdicts are EXACT integer inequalities (the
    * [[gopherFilter]] discipline — 10·dup ≤ 3·n, never a float
    * threshold), so the DuckDB oracle replays them bit-for-bit.
    *
    * Scale shape: ZERO shuffles. Every counter is a fold over the
    * doc's own sorted line/shingle array (duplicate counting on a
    * sorted array is adjacent-equality), so the whole operator is one
    * map-only projection fused into the scan — per-row state is
    * doc-sized, nothing is exchanged. The top-bigram scan keeps the
    * LEXICOGRAPHICALLY FIRST gram among count ties (sorted order makes
    * that the first run encountered, so strict `>` suffices).
    */
  def repetitionRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(TextStats.tokens(col(textCol)), t => t =!= lit(""))
    val lines = array_sort(filter(split(col(textCol), "\n", -1),
      l => l =!= lit("")))
    val g2 = array_sort(Dedup.shinglesOfTokens(toks, 2))
    val g5 = array_sort(Dedup.shinglesOfTokens(toks, 5))
    // occurrences beyond each element's first, on a sorted array: an
    // element equal to its predecessor is a repeat (element_at is
    // 1-based, so index i's predecessor is element_at(a, i))
    def dupN(a: Column): Column =
      size(filter(a, (x, i) => i > 0 && x === element_at(a, i))).cast("long")
    def dupChars(a: Column): Column =
      aggregate(filter(a, (x, i) => i > 0 && x === element_at(a, i)),
        lit(0L), (acc, x) => acc + length(x).cast("long"))
    // single most frequent gram: run-length fold over the sorted array
    val topInit = struct(lit(null).cast("string").as("p"),
      lit(0L).as("run"), lit(0L).as("bc"), lit(null).cast("string").as("bg"))
    def topGram(a: Column): Column =
      aggregate(a, topInit, (acc, x) => {
        val run = when(x === acc.getField("p"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("p"), run.as("run"),
          when(run > acc.getField("bc"), run)
            .otherwise(acc.getField("bc")).as("bc"),
          when(run > acc.getField("bc"), x)
            .otherwise(acc.getField("bg")).as("bg"))
      })
    df.select(col(idCol).cast("long").as("doc_id"),
        length(col(textCol)).cast("long").as("total_chars"),
        size(lines).cast("long").as("n_lines"),
        dupN(lines).as("dup_lines"),
        dupChars(lines).as("dup_line_chars"),
        topGram(g2).as("_top"),
        dupChars(g5).as("dup_5gram_chars"))
      .select(col("doc_id"), col("total_chars"), col("n_lines"),
        col("dup_lines"), col("dup_line_chars"),
        col("_top").getField("bg").as("top_bigram"),
        col("_top").getField("bc").as("top_bigram_n"),
        (col("_top").getField("bc") *
          length(col("_top").getField("bg")).cast("long"))
          .as("top_bigram_chars"),
        col("dup_5gram_chars"))
      .withColumn("dup_line_ok",
        lit(10L) * col("dup_lines") <= lit(3L) * col("n_lines"))
      .withColumn("dup_line_char_ok",
        lit(5L) * col("dup_line_chars") <= col("total_chars"))
      .withColumn("top_bigram_ok",
        lit(5L) * col("top_bigram_chars") <= col("total_chars"))
      .withColumn("dup_5gram_ok",
        lit(20L) * col("dup_5gram_chars") <= lit(3L) * col("total_chars"))
      .withColumn("keep", col("dup_line_ok") && col("dup_line_char_ok") &&
        col("top_bigram_ok") && col("dup_5gram_ok"))
  }

  /** C4-style corpus-level line deduplication (Raffel et al. 2020
    * §2.2's boilerplate rule, at line granularity): a line occurring
    * in `minDf`-or-more places across the WHOLE corpus (cookie
    * banners, nav menus, licence footers) is removed everywhere
    * except its single canonical first occurrence — smallest
    * (doc_id, line position) wins, a total order, so the survivor is
    * deterministic under any partitioning. Blank/whitespace-only
    * lines never participate (they'd all "duplicate" each other and
    * the removal would mangle document structure); they are always
    * kept. Returns one row per doc: the cleaned text plus kept /
    * removed counters.
    *
    * Scale shape: one shuffle keyed on the LINE to count occurrences
    * and elect the canonical keeper (both from the same aggregate —
    * min_by rides the count pass), a `shuffle_hash` join back (the
    * line-stats relation is corpus-derived — never broadcast), and
    * one shuffle on doc_id to reassemble. No pair space, nothing
    * driver-sized: the heaviest key is the most-duplicated line,
    * whose group is count-sized, not corpus-sized.
    */
  def corpusLineDedup(df: DataFrame, idCol: String, textCol: String,
                      minDf: Int = 2): DataFrame = {
    require(minDf >= 2, s"minDf must be >= 2, got $minDf")
    val lines = df.select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
    val active = lines.filter(trim(col("line")) =!= "")
    val stats = active.groupBy(col("line"))
      .agg(count(lit(1)).as("_df"),
        min(struct(col("doc_id"), col("pos"))).as("_keeper"))
    val judged = active
      .join(stats.hint("shuffle_hash"), Seq("line"))
      .select(col("doc_id"), col("pos"), col("line"),
        (col("_df") < minDf ||
          (col("_keeper.doc_id") === col("doc_id") &&
           col("_keeper.pos") === col("pos"))).as("_keep"))
    // blank lines never carry a verdict: always kept
    judged
      .unionByName(lines.filter(trim(col("line")) === "")
        .withColumn("_keep", lit(true)))
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(array_sort(
            collect_list(when(col("_keep"),
              struct(col("pos"), col("line"))))),
          s => s.getField("line")), "\n").as("text_clean"),
        count(lit(1)).as("n_lines"),
        sum(when(!col("_keep"), 1L).otherwise(0L)).as("n_removed"))
  }

  /** CCNet-style n-gram language-model quality scoring (Wenzek et al.
    * 2020 §3.3, with a bigram LM in place of KenLM's 5-gram): train an
    * add-1-smoothed bigram model on the TARGET slice (the trusted
    * reference text), score every document by its average negative
    * log-likelihood per bigram event —
    *
    *   P(w | p) = (c_tgt(p,w) + 1) / (c_tgt(p·) + V)
    *   avg_nll(x) = −(1/n_x) Σ events ln P(w | p)
    *
    * with V = |distinct target unigrams| + 1 (one UNK type). LOW
    * avg_nll ≈ fluent under the reference distribution; the CCNet
    * head/middle/tail split is a quantile cut over this column.
    * Complements [[dsirLogWeights]]: DSIR scores docs against a target
    * unigram+bigram HASHED distribution ratio, this scores fluency
    * under a CONDITIONAL model — the two disagree exactly on docs made
    * of common words in uncommon order.
    *
    * Scale shape: one corpus shuffle to (doc, bigram) counts, then two
    * hash joins against the vocab²-bounded LM relations
    * (`shuffle_hash`-hinted — vocabulary tables are corpus-derived, so
    * never broadcast, but sort-free hash joins keep them cheap); the
    * vocab-size scalar V is the only broadcast. Each ln fixes to the
    * 12-dp grid, the per-doc sum is an exact decimal — the DuckDB
    * oracle replays the model bit-for-bit. Docs with fewer than two
    * tokens have no bigram event and drop (the caller's length gate
    * owns those). Returns `(doc_id, n_bigrams, avg_nll)`.
    */
  def lmPerplexity(df: DataFrame, idCol: String, textCol: String,
                   targetPred: Column): DataFrame = {
    val docs = df.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("_t"), targetPred.as("_tgt"))
    val toks = filter(TextStats.tokens(col("_t")), t => t =!= lit(""))
    val events = docs.filter(size(toks) >= 2)
      .select(col("doc_id"), col("_tgt"),
        explode(Dedup.shinglesOfTokens(toks, 2)).as("g"))
    val perDoc = events.groupBy(col("doc_id"), col("g"))
      .agg(count(lit(1)).as("c"))
      .withColumn("p", substring_index(col("g"), " ", 1))
    val lmBi = events.filter(col("_tgt")).groupBy(col("g"))
      .agg(count(lit(1)).as("c_pw"))
    val lmPref = lmBi.groupBy(substring_index(col("g"), " ", 1).as("p"))
      .agg(sum(col("c_pw")).as("c_p"))
    val vocab = docs.filter(col("_tgt"))
      .select(explode(toks).as("w"))
      .agg((countDistinct(col("w")) + lit(1L)).as("v"))
    perDoc
      .join(lmBi.hint("shuffle_hash"), Seq("g"), "left")
      .join(lmPref.hint("shuffle_hash"), Seq("p"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("_lnp",
        round(log((coalesce(col("c_pw"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("c_p"), lit(0L)) + col("v")).cast("double")), 12)
          .cast(DecimalType(16, 12)))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_bigrams"),
        round(-sum(col("c").cast(DecimalType(7, 0)) * col("_lnp"))
          .cast("double") / sum(col("c")), 6).as("avg_nll"))
  }

  /** q205's FIXED merge table — a stand-in for a shipped tokenizer
    * artifact ([[graft.text.Curation.trainBpe]] learns such tables;
    * applying one is the production-side operation). Rules chain
    * (rule 3 consumes rule 1+2's outputs, rule 7 consumes 4+6's) so
    * the gate exercises merge-on-merged composition, and every rule
    * has left ≠ right — the condition under which the oracle's
    * replace-fixpoint provably equals the engine's single fold pass
    * (see bpeApplyOracleSql).
    */
  val FixedBpeMerges: Seq[(String, String)] = Seq(
    ("e", "</w>"), ("t", "h"), ("th", "e</w>"), ("a", "n"), ("i", "n"),
    ("d", "</w>"), ("an", "d</w>"), ("o", "u"), ("e", "r"), ("in", "g"))
}
