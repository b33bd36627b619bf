package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for a training-data pipeline over `documents`:
  * exact (content hash), n-gram Jaccard, MinHash+LSH, and SimHash.
  *
  * Scale posture (the whole point of these operators):
  *   - exact dedup is one hash-groupBy — embarrassingly parallel;
  *   - pairwise Jaccard is NEVER all-pairs: candidates come from an
  *     equi-join on shared shingles (or LSH band buckets), so cost is
  *     Σ bucket², bounded by shingle selectivity, not n²;
  *   - MinHash+LSH is the 100 TB path: signature computation is a single
  *     groupBy over (doc, shingle); banding turns near-dup search into an
  *     equi-join on (band, bandHash);
  *   - SimHash blocks by 16-bit chunks (pigeonhole: hamming ≤ 3 over 4
  *     chunks ⇒ one chunk equal), then verifies with `bit_count(xor)`.
  * All built-in expressions/HOFs — no UDFs.
  */
object Dedup {

  /** Exact dedup: group identical content by md5, keep min id as the
    * representative (deterministic).
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Word n-gram shingles over a token array (duplicates preserved);
    * documents shorter than n yield their single full-token shingle.
    * Native [[graft.functions.ShinglesExpr]] — one codegen'd pass.
    */
  def shinglesOfTokens(toks: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumn(graft.functions.ShinglesExpr(
      org.apache.spark.sql.GraftColumn.expr(toks), n, distinct = false))

  def shingles(text: Column, n: Int): Column =
    shinglesOfTokens(TextStats.tokens(text), n)

  /** (id, shingle) set representation — distinct shingles per doc, with
    * tokenize → shingle → dedupe fused into one native projection.
    */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.GraftColumn
    val shingleSet = GraftColumn(graft.functions.ShinglesExpr(
      GraftColumn.expr(TextStats.tokens(col(textCol))), n, distinct = true))
    // NOT spread here (r15 A/B): this is also every APPEND path's
    // batch-shingle entry, where the extra exchange + task fan-out
    // measured q161 2.1→2.8 s warm — the corpus-shaped entry point
    // (jaccardPairs) spreads its input instead (q85 1.06→0.80 s)
    df.select(col(idCol).as("doc"), explode(shingleSet).as("shingle"))
  }

  /** Exact n-gram Jaccard near-dup pairs with prefix filtering (the
    * AllPairs/PPJoin candidate scheme — Bayardo et al. WWW'07, Xiao et
    * al. WWW'08): shingles get a global canonical order (rarest first);
    * a doc of n shingles only joins on its first n - ceil(t·n) + 1 of
    * them. Completeness: jaccard(a,b) >= t implies overlap >= t·n_a and
    * >= t·n_b, and the globally-smallest shared shingle then provably
    * falls inside BOTH prefixes — so no qualifying pair is missed, while
    * the candidate join shrinks quadratically in the prefix fraction.
    * This is what keeps all-pairs similarity feasible at corpus scale;
    * candidates are then verified with exact shared counts, so results
    * are identical to the naive all-shared-shingles join.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double,
                   hotShingleCap: Int = graft.ops.GuardBounds.HotShingleCap): DataFrame = {
    // the shingle relation feeds ranking, verification, and sizes:
    // materialize it once instead of re-tokenizing the corpus each time.
    // (Lazy result → the CALLER releases after its action via
    // graft.engine.Caches.releaseAll(), the registry this persist is
    // tracked in; see the cache contract on Similarity.normed.)
    // spread the corpus scan (guide §2.2): tokenize+shingle run fused
    // into it, one task on a single-file input; identity at scale. The
    // spread sits HERE (the corpus-shaped entry) and not in shingleSets
    // (also the append paths' batch entry, where it measured slower).
    val s = graft.engine.Caches.persisted("jaccardPairs.shingles",
      shingleSets(graft.engine.Layout.spreadForCompute(df),
        idCol, textCol, n))
    jaccardPairsFromShingles(s, threshold, hotShingleCap)
  }

  /** [[jaccardPairs]] over a PRECOMPUTED `(doc, shingle)` set relation —
    * the build/probe split applied to text dedup: a standing corpus
    * persists its shingle index once
    * ([[graft.multimodal.Curate.buildSignatureIndex]]) and every pair
    * consumer starts here instead of re-tokenizing the corpus. `s` is
    * referenced by ranking, candidates, and verification — the CALLER
    * materializes it (persist or parquet-backed).
    */
  private[graft] def jaccardPairsFromShingles(s: DataFrame,
                                              threshold: Double,
                                              hotShingleCap: Int): DataFrame = {
    val prefixes = shinglePrefixes(s, threshold, hotShingleCap)
    val cands = prefixes.as("a").join(prefixes.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b")).distinct()
    verifyJaccard(s, cands, threshold)
  }

  /** The prefix-filter half of the AllPairs scheme over a (persisted)
    * shingle relation — ONE definition shared by [[jaccardPairs]] and
    * [[incrementalJaccardPairs]] so a change to the bound or the cap
    * semantics cannot desync the two (the jacPairsCte discipline,
    * applied to the Scala side). Rank + doc size ride one window pass
    * (same partitioning → one shuffle).
    */
  private def shinglePrefixes(s: DataFrame, threshold: Double,
                              hotShingleCap: Int): DataFrame =
    shinglePrefixesWithFreq(s,
      s.groupBy(col("shingle")).agg(count(lit(1)).as("freq")),
      threshold, hotShingleCap)

  /** [[shinglePrefixes]] with the frequency relation supplied by the
    * caller — the incremental path computes GLOBAL frequencies once
    * (ordering and caps must see true corpus counts) but runs the
    * per-doc rank windows over a doc SUBSET (round-12 q162 trim).
    */
  private def shinglePrefixesWithFreq(s: DataFrame, freq: DataFrame,
                                      threshold: Double,
                                      hotShingleCap: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc"))
    s.join(freq, "shingle")
      .withColumn("_r", row_number().over(
        byDoc.orderBy(col("freq").asc, col("shingle").asc)))
      .withColumn("_n", count(lit(1)).over(byDoc))
      .filter(col("_r") <= col("_n") - ceil(lit(threshold) * col("_n")) + 1)
      // a shingle unique to one doc can never witness a pair, and the
      // smallest SHARED shingle always has freq >= 2 — still complete
      .filter(col("freq") >= 2)
      // hot-shingle cap: a degenerate shingle shared by k docs makes a
      // k² candidate bucket, so shingles hotter than the cap are barred
      // from WITNESSING candidates (they still count in the verify join,
      // so surviving pairs keep their exact jaccard). Because canonical
      // order is rarest-first, a pair is lost only if its very rarest
      // shared shingle exceeds the cap — i.e. the overlap is pure
      // boilerplate. Exact whenever max shingle freq <= cap.
      .filter(col("freq") <= hotShingleCap)
      .select(col("doc"), col("shingle"))
  }

  /** The verification half: exact shared-shingle counts for unordered
    * candidate pairs `(doc_a < doc_b)` off the same persisted shingle
    * relation, scored as true Jaccard and thresholded — shared by both
    * pair entry points (false candidates die here, so results are
    * independent of which candidate scheme produced them).
    */
  private[graft] def verifyJaccard(s: DataFrame, cands: DataFrame,
                                   threshold: Double): DataFrame = {
    val sizes = s.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    cands
      .join(s.as("sa"), col("sa.doc") === col("doc_a"))
      .join(s.as("sb"), col("sb.doc") === col("doc_b") &&
        col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Incremental near-dup pairs for corpus APPEND: exact n-gram Jaccard
    * pairs that touch at least one NEW document — batch×corpus and
    * batch×batch edges, NEVER corpus×corpus. The routine append-time
    * question ("which arriving docs duplicate something we already
    * have, or each other") must not re-pay the full corpus pair join:
    * here the candidate join is prefix(new) ⋈ prefix(all), so its cost
    * scales with the BATCH's shingle footprint times bucket selectivity
    * while the corpus side contributes only the linear
    * shingle/frequency pass (which a production pipeline materializes
    * once and maintains incrementally — the IVF build/probe split
    * applied to dedup; this entry point recomputes it for
    * self-containment).
    *
    * Same prefix-filter completeness argument as [[jaccardPairs]]: a
    * qualifying pair has its rarest shared shingle inside BOTH
    * prefixes, and one side of every wanted pair is new, so the
    * asymmetric join loses nothing. Same hot-shingle cap with the same
    * exactness condition. Emitted pairs are unordered-normalized
    * (doc_a < doc_b) with their exact verified jaccard — identical
    * rows to `jaccardPairs(corpus ∪ batch) filtered to ≥1 new side`.
    * Cache contract: caller releases via Caches.releaseAll() (one
    * tracked shingle relation).
    */
  def incrementalJaccardPairs(all: DataFrame, newIds: DataFrame,
                              idCol: String, textCol: String,
                              n: Int, threshold: Double,
                              hotShingleCap: Int = graft.ops.GuardBounds.HotShingleCap): DataFrame = {
    val s = graft.engine.Caches.persisted("incrementalJaccardPairs.shingles",
      shingleSets(all, idCol, textCol, n))
    // `newIds` carries the batch's ids in ITS `idCol` column (same name
    // as `all`'s) — resolved by name, never by position
    incrementalJaccardPairsFromShingles(s,
      newIds.select(col(idCol).as("doc")), threshold, hotShingleCap)
  }

  /** [[incrementalJaccardPairs]] over a PRECOMPUTED full `(doc,
    * shingle)` relation (corpus index ∪ batch shingles) — what an
    * indexed append runs so the corpus is never re-tokenized. `fresh`
    * is a single `doc` column of batch ids; caller materializes `s`.
    */
  private[graft] def incrementalJaccardPairsFromShingles(
      s: DataFrame, fresh0: DataFrame, threshold: Double,
      hotShingleCap: Int,
      freqOpt: Option[DataFrame] = None,
      restrict: Boolean = false): DataFrame = {
    val fresh = fresh0.select(col("doc")).distinct()
    // round-12 q162 trim, threshold-switched (the contamination
    // broadcast→shuffle-hash fallback pattern): un-restricted, the
    // corpus is small enough that ONE windows pass over everything,
    // with frequencies aggregated off the CACHED relation, beats
    // extra stages (measured at sf0.1: the restricted shape's
    // semi-joins + second window + indexed-freq merge cost ~2 s of
    // pure job overhead to save ~1.5 s of small scans — fixed
    // overhead dominates tiny data). The switch is the CALLER's
    // `restrict` flag, decided from FREE metadata (indexed appends
    // compare the shingle parquet's byte size against
    // PrefixRestrictAboveBytes — a count() action here measured
    // +0.9 s on q161 by serializing the sAll materialization into
    // its own job). RESTRICTED, the two
    // corpus-proportional terms change shape: global frequencies come
    // precomputed from the index when offered (`freqOpt` —
    // vocabulary-sized persisted counts SUM-merged with the batch's
    // deltas; lazy, so the small path never executes the merge), and
    // the per-doc rank windows run over just the docs holding >= 1
    // batch-prefix shingle — a b-side row can join only on a shingle
    // the batch prefixes carry, and a doc's prefix depends only on
    // its OWN shingles plus the GLOBAL freq, so restricting the doc
    // set changes no surviving prefix row: candidates, and therefore
    // verified pairs, are identical (spec-pinned both shapes). Work
    // past the switch scales with batch-prefix fan-out
    // (≤ hotShingleCap per shingle, guarded) plus one probe scan,
    // never corpus windows.
    val cands =
      if (!restrict) {
        // freq stays INLINE in the prefix plan (one fused job, the r11
        // shape) — persisting it as a separate cached relation here
        // measured q161 +~1 s (the round-8 extra-cache-layer lesson);
        // the restricted branch persists it because TWO window passes
        // consume it there
        val prefixes = shinglePrefixes(s, threshold, hotShingleCap)
        val prefixNew = prefixes.join(broadcast(fresh), Seq("doc"),
          "left_semi")
        prefixNew.as("a").join(prefixes.as("b"),
            col("a.shingle") === col("b.shingle") &&
              col("a.doc") =!= col("b.doc"))
          .select(least(col("a.doc"), col("b.doc")).as("doc_a"),
            greatest(col("a.doc"), col("b.doc")).as("doc_b")).distinct()
      } else {
        val freq = graft.engine.Caches.persisted("incJaccard.freq",
          freqOpt.getOrElse(
            s.groupBy(col("shingle")).agg(count(lit(1)).as("freq"))))
        val prefixNew = graft.engine.Caches.persisted(
          "incJaccard.prefixNew",
          shinglePrefixesWithFreq(
            s.join(broadcast(fresh), Seq("doc"), "left_semi"),
            freq, threshold, hotShingleCap))
        val touched = s.join(prefixNew.select(col("shingle")).distinct()
            .hint("shuffle_hash"), Seq("shingle"), "left_semi")
          .select(col("doc")).distinct()
        val prefixesB = shinglePrefixesWithFreq(
          s.join(touched.hint("shuffle_hash"), Seq("doc"), "left_semi"),
          freq, threshold, hotShingleCap)
        prefixNew.as("a").join(prefixesB.as("b"),
            col("a.shingle") === col("b.shingle") &&
              col("a.doc") =!= col("b.doc"))
          .select(least(col("a.doc"), col("b.doc")).as("doc_a"),
            greatest(col("a.doc"), col("b.doc")).as("doc_b")).distinct()
      }
    verifyJaccard(s, cands, threshold)
  }

  /** Asymmetric shingle CONTAINMENT pairs: C = shared / min(|A|, |B|) —
    * the near-dup measure Jaccard is blind to, because a small document
    * copied verbatim inside a much larger one has tiny Jaccard (the
    * union is dominated by the big doc) but containment ≈ 1 (Broder
    * 1997 introduced resemblance AND containment as the two sketch
    * measures for exactly this reason). The curation use: quote-farm /
    * wrapper pages that embed a whole source article.
    *
    * Candidate scheme: the Jaccard prefix bound adapted to the
    * asymmetric measure. C(a,b) >= t implies overlap >= t·min(n_a,n_b),
    * so the prefix guarantee (some shared shingle among the first
    * n - ceil(t·n) + 1 in canonical rarest-first order) provably holds
    * for the SMALLER side of every qualifying pair — but nothing
    * useful bounds the larger side's prefix. Hence the join is
    * prefix(potential-smaller) ⋈ FULL shingle relation, not prefix ⋈
    * prefix: every doc plays the "smaller" role through its prefix and
    * the "larger" role through its full set, and the unordered pair
    * survives via least/greatest + distinct. Same hot-shingle cap as
    * [[jaccardPairs]] on BOTH sides (a capped shingle cannot witness,
    * but still counts in verification — exact whenever max shingle
    * freq <= cap). Verification recomputes exact shared counts, so
    * emitted pairs carry true containment AND jaccard.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int, threshold: Double,
                       hotShingleCap: Int = graft.ops.GuardBounds.HotShingleCap): DataFrame = {
    val s = graft.engine.Caches.persisted("containmentPairs.shingles",
      shingleSets(df, idCol, textCol, n))
    val sizes = s.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    val freq = s.groupBy(col("shingle")).agg(count(lit(1)).as("freq"))
    val byDoc = Window.partitionBy(col("doc"))
    val ranked = s.join(freq, "shingle")
      .filter(col("freq") >= 2 && col("freq") <= hotShingleCap)
    // prefix over the freq-FILTERED list (n' <= n): still complete —
    // every shared shingle has freq >= 2 so it survives the filter, and
    // overlap >= ceil(t·n_a) >= ceil(t·n'_a); if all shared shingles sat
    // outside the first n' - ceil(t·n') + 1, overlap <= ceil(t·n') - 1,
    // a contradiction. The filtered prefix is strictly smaller, so this
    // tightens the candidate join rather than weakening it.
    val prefixes = ranked
      .withColumn("_r", row_number().over(
        byDoc.orderBy(col("freq").asc, col("shingle").asc)))
      .withColumn("_n", count(lit(1)).over(byDoc))
      .filter(col("_r") <= col("_n") - ceil(lit(threshold) * col("_n")) + 1)
      .select(col("doc"), col("shingle"))
    val cands = prefixes.as("a")
      .join(ranked.select(col("doc"), col("shingle")).as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") =!= col("b.doc"))
      .select(least(col("a.doc"), col("b.doc")).as("doc_a"),
        greatest(col("a.doc"), col("b.doc")).as("doc_b"))
      .distinct()
    cands
      .join(s.as("sa"), col("sa.doc") === col("doc_a"))
      .join(s.as("sb"), col("sb.doc") === col("doc_b") &&
        col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("containment",
        col("shared").cast("double") / least(col("n_a"), col("n_b")))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
        col("containment"),
        (col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared"))).as("jaccard"))
  }

  /** MinHash signatures: for seed i, sig[i] = min over shingles of
    * xxhash64(i, shingle). One shuffle (groupBy doc).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, numHashes: Int): DataFrame =
    minhashSignaturesFromSets(shingleSets(df, idCol, textCol, shingleN), numHashes)

  /** Signature computation over a precomputed (doc, shingle) relation. */
  def minhashSignaturesFromSets(s: DataFrame, numHashes: Int): DataFrame = {
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"_h$i"))
    s.groupBy(col("doc"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc"),
        array((0 until numHashes).map(i => col(s"_h$i")): _*).as("signature"))
  }

  /** LSH banding: signature split into `bands` rows of r = num/bands;
    * band hash = xxhash64 over the slice. Docs sharing any (band, hash)
    * bucket are candidates.
    */
  def lshBands(sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val r = numHashes / bands
    require(bands * r == numHashes, "bands must divide numHashes")
    sig.select(col("doc"), explode(
      transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"), xxhash64(slice(col("signature"), b * r + 1, lit(r))).as("bh"))))
      .as("band_bucket"))
      .select(col("doc"), col("band_bucket.band").as("band"), col("band_bucket.bh").as("bh"))
  }

  /** Full MinHash+LSH near-dup pipeline: candidates from band buckets,
    * verified with true shingle Jaccard. Returns (doc_a, doc_b, jaccard).
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 5, numHashes: Int = 32, bands: Int = 8,
                 threshold: Double = 0.5): DataFrame = {
    // one tokenization pass feeds signatures, sizes, and the verify join
    val s = graft.engine.Caches.persisted("minhashLsh.shingles",
      shingleSets(df, idCol, textCol, shingleN))
    val sig = minhashSignaturesFromSets(s, numHashes)
    val bandsDf = lshBands(sig, numHashes, bands)
    val cands = bandsDf.as("a").join(bandsDf.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b")).distinct()
    val sizes = s.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    cands
      .join(s.as("sa"), col("sa.doc") === col("doc_a"))
      .join(s.as("sb"), col("sb.doc") === col("doc_b") && col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
      .join(sizes.select(col("doc").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 64-bit SimHash over the token stream (token hash = xxhash64 seed 42;
    * bit i of the fingerprint is set iff more than half the tokens have
    * bit i set — identical to the classic sign(Σ ±1) criterion). Backed
    * by the native [[graft.functions.SimHashExpr]]: one codegen'd pass
    * over primitive hashes, no per-token/per-bit lambda dispatch.
    * `tokensCol` must hold array<string> tokens.
    */
  def simhash64(tokensCol: String): Column =
    org.apache.spark.sql.GraftColumn(
      graft.functions.SimHashExpr(
        org.apache.spark.sql.GraftColumn.expr(col(tokensCol))))

  /** SimHash near-dup pairs with hamming distance <= maxDist (<= 3 for the
    * 4×16-bit chunk blocking to be lossless by pigeonhole).
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "chunk blocking is only complete for hamming <= 3")
    val withSig = df
      .withColumn("_toks", TextStats.tokens(col(textCol)))
      .withColumn("simhash", simhash64("_toks"))
      .select(col(idCol).as("doc"), col("simhash"))
    val chunked = withSig.select(col("doc"), col("simhash"), explode(array(
      (0 until 4).map(j => struct(lit(j).as("chunk"),
        shiftright(col("simhash"), 16 * j).bitwiseAND(lit(0xFFFFL)).as("ck"))): _*)).as("c"))
      .select(col("doc"), col("simhash"), col("c.chunk").as("chunk"), col("c.ck").as("ck"))
    // self-joined: compute each signature once, not twice
    val chunkedP = graft.engine.Caches.persisted("simhashPairs.chunks", chunked)
    chunkedP.as("a").join(chunkedP.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      // filter BEFORE distinct (the hammingBandedPairs order): chunk-
      // colliding far pairs die before the dedup shuffle
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /** Positional n-gram relation: `(doc, pos, shingle)` with pos the
    * 0-based token index of the shingle's first token, duplicates
    * PRESERVED (unlike [[shingleSets]]) — the substrate of exact
    * duplicated-SPAN analysis. Docs shorter than n contribute their
    * single full-token shingle at pos 0.
    */
  def shinglePositions(df: DataFrame, idCol: String, textCol: String,
                       n: Int): DataFrame =
    df.select(col(idCol).as("doc"),
        TextStats.tokens(col(textCol)).as("_toks"))
      .select(col("doc"), size(col("_toks")).cast("long").as("doc_tokens"),
        posexplode(shinglesOfTokens(col("_toks"), n)).as(Seq("pos", "shingle")))
      .select(col("doc"), col("pos").cast("long").as("pos"), col("shingle"),
        col("doc_tokens"))

  /** Exact duplicated-span detection — the span-level half of
    * "Deduplicating Training Data Makes Language Models Better" (Lee
    * et al., ACL'22, ExactSubstr): every occurrence of an n-token
    * window that also occurs ANYWHERE else in the corpus (another doc
    * or the same doc), EXCEPT the globally first occurrence
    * (lexicographic (doc, pos) — the copy every other occurrence
    * would be deduplicated against), marks its token range; per doc,
    * overlapping/touching ranges merge into maximal spans. Returns
    * one row per merged span: `(doc_id, span_start, span_end,
    * span_tokens)`, token indices 0-based inclusive.
    *
    * Lee et al. find duplicated substrings with a parallel suffix
    * array; the positional n-gram formulation is the Spark-native
    * equivalent at fixed granularity n (a duplicated substring of
    * length L >= n is exactly a run of L - n + 1 duplicated n-gram
    * positions, which the islands merge reassembles — so spans agree
    * with the suffix-array answer for every duplicate of length >= n,
    * and shorter duplicates are below the detection floor by design).
    *
    * Scale posture: ONE shuffle by shingle (freq + global-min window
    * share it), one window pass by doc for the islands merge — no
    * pair space at any point, unlike the pairwise Jaccard family; a
    * shingle duplicated k times costs k rows, never k². 100 TB-shaped
    * by construction.
    */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
               n: Int): DataFrame = {
    val sp = shinglePositions(df, idCol, textCol, n)
    val byShingle = Window.partitionBy(col("shingle"))
    val removed = sp
      .withColumn("_freq", count(lit(1)).over(byShingle))
      .withColumn("_first",
        min(struct(col("doc"), col("pos"))).over(byShingle))
      .filter(col("_freq") >= 2 &&
        !(col("doc") === col("_first.doc") && col("pos") === col("_first.pos")))
      .select(col("doc"), col("pos").as("_s"),
        // a window at pos spans to pos+n-1, clipped to the doc's last
        // token (the short-doc whole-text shingle ends there)
        least(col("pos") + lit(n.toLong) - 1L, col("doc_tokens") - 1L)
          .as("_e"))
    spansFromMarked(removed)
  }

  /** Gaps-and-islands merge of marked `(doc, _s, _e)` token ranges into
    * maximal per-doc spans — shared by [[dupSpans]] and
    * [[incrementalDupSpans]] (the mergeIntervals walk, kept here
    * because the SPANS themselves are the output).
    */
  private def spansFromMarked(removed: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc")).orderBy(col("_s").asc, col("_e").asc)
    val prevMaxEnd = max(col("_e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    removed
      .withColumn("_brk",
        when(prevMaxEnd.isNull || col("_s") > prevMaxEnd + 1L, 1L)
          .otherwise(0L))
      .withColumn("_isl", sum(col("_brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc").as("doc_id"), col("_isl"))
      .agg(min(col("_s")).as("span_start"), max(col("_e")).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_tokens"))
  }

  /** Append-time duplicated spans: the [[dupSpans]] verdicts for BATCH
    * documents only, marked against corpus ∪ batch under the same
    * global keep-first rule — identical rows to
    * `dupSpans(corpus ∪ batch)` filtered to batch docs (ScalaCheck
    * law), because islands merge per doc and a batch doc's marks
    * depend only on the global gram index.
    *
    * The [[incrementalJaccardPairs]] economics applied to spans: the
    * gram index (frequency + first occurrence per shingle) is ONE
    * linear pass over the union — the part a production pipeline
    * materializes once and maintains per append; recomputed here for
    * self-containment — while the marking join is batch-proportional
    * (batch grams equi-join the index by shingle; output rows scale
    * with the batch). Never corpus² and never corpus-sized output.
    */
  def incrementalDupSpans(corpus: DataFrame, batch: DataFrame,
                          idCol: String, textCol: String,
                          n: Int): DataFrame = {
    val c = corpus.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    val b = batch.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("text"))
    val index = shinglePositions(c.union(b), "doc_id", "text", n)
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("_freq"),
        min(struct(col("doc"), col("pos"))).as("_first"))
    val marked = shinglePositions(b, "doc_id", "text", n)
      .join(index, Seq("shingle"))
      .filter(col("_freq") >= 2 &&
        !(col("doc") === col("_first.doc") && col("pos") === col("_first.pos")))
      .select(col("doc"), col("pos").as("_s"),
        least(col("pos") + lit(n.toLong) - 1L, col("doc_tokens") - 1L)
          .as("_e"))
    spansFromMarked(marked)
  }

  /** Exact-substring DEDUP: strip every duplicated span ([[dupSpans]],
    * first occurrence kept corpus-wide) from each document and emit
    * the surviving text — the operator Lee et al. apply before
    * training. One row per input doc: `(doc_id, n_tokens, n_removed,
    * clean_text)` where `clean_text` joins the kept tokens with single
    * spaces (empty string when the whole doc was a duplicate).
    *
    * The strip is a doc-keyed range anti-join of token positions
    * against the span list (span count per doc is bounded by the
    * doc's own token count — never corpus-sized), then an ordered
    * re-assembly per doc.
    */
  def stripDupSpans(df: DataFrame, idCol: String, textCol: String,
                    n: Int): DataFrame =
    stripSpans(df, idCol, textCol, dupSpans(df, idCol, textCol, n))

  /** Span-level eval DECONTAMINATION: for every training doc
    * (`evalPred` false), the maximal token spans covered by n-grams
    * that occur ANYWHERE in the eval corpus (`evalPred` true) — the
    * [[graft.text.Curation.contamination]] verdict made surgical:
    * that operator flags whole documents, this one says WHERE, so a
    * pipeline can excise the contaminated spans (via [[stripSpans]])
    * instead of dropping entire documents that merely quote a
    * benchmark item. No keep-first rule here — EVERY eval occurrence
    * marks (the reference corpus is authoritative, not a peer).
    *
    * Shape: eval shingle set (linear, usually broadcast-small) semi-
    * joins the positional train grams — batch-proportional output,
    * the [[incrementalDupSpans]] economics with the eval set as the
    * index; then the shared islands merge per doc.
    */
  def contaminationSpans(df: DataFrame, idCol: String, textCol: String,
                         evalPred: Column, n: Int): DataFrame = {
    // NULL evalPred (e.g. a null source column) means TRAIN, matching
    // SQL three-valued semantics (`source = 'src0'` is NULL ⇒ the doc
    // is not in the eval set but IS in `NOT IN (eval)`); a bare
    // filter(!pred) would silently drop such docs from both sides
    val flagged = df.withColumn("_is_eval", coalesce(evalPred, lit(false)))
    val evalShingles = shingleSets(flagged.filter(col("_is_eval")),
        idCol, textCol, n)
      .select(col("shingle")).distinct()
    val marked = shinglePositions(flagged.filter(!col("_is_eval")),
        idCol, textCol, n)
      .join(evalShingles, Seq("shingle"), "left_semi")
      .select(col("doc"), col("pos").as("_s"),
        least(col("pos") + lit(n.toLong) - 1L, col("doc_tokens") - 1L)
          .as("_e"))
    spansFromMarked(marked)
  }

  /** Strip precomputed spans from documents — the apply-half shared by
    * [[stripDupSpans]] (dup spans) and span decontamination
    * ([[contaminationSpans]]): doc-keyed range anti-join of token
    * positions against the span list, ordered re-assembly. `spans`
    * carries `(doc_id, span_start, span_end)`.
    */
  def stripSpans(df: DataFrame, idCol: String, textCol: String,
                 spans: DataFrame): DataFrame = {
    val sp = spans.select(col("doc_id").as("doc"), col("span_start"),
      col("span_end"))
    val toks = df.select(col(idCol).as("doc"),
        posexplode(TextStats.tokens(col(textCol))).as(Seq("pos", "tok")))
      .select(col("doc"), col("pos").cast("long").as("pos"), col("tok"))
    val kept = toks.join(sp,
        toks("doc") === sp("doc") &&
          col("pos") >= col("span_start") && col("pos") <= col("span_end"),
        "left_anti")
    df.select(col(idCol).as("doc"))
      .join(kept.groupBy(col("doc"))
          .agg(count(lit(1)).as("_kept"),
            array_join(array_sort(collect_list(struct(col("pos"), col("tok"))))
              .getField("tok"), " ").as("clean_text")),
        Seq("doc"), "left")
      .join(toks.groupBy(col("doc")).agg(count(lit(1)).as("n_tokens")),
        Seq("doc"))
      .select(col("doc").as("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Rank distinct duplicated-span TEXTS by corpus-wide burden — the
    * reporting half of ExactSubstr dedup ([[dupSpans]]): which exact
    * strings (license headers, navigation chrome, quoted passages) are
    * being re-ingested, how many docs carry them, and how many tokens
    * they would remove. One row per distinct span string:
    * `(span_text, n_occurrences, n_docs, dup_tokens)`, heaviest first.
    *
    * Shape: the span list (already no-pair-space) doc-equi-joins the
    * token arrays to slice out each span's text — spans per doc are
    * bounded by the doc's own token count, so the join output is
    * corpus-linear — then one hash aggregation by span text and a
    * TakeOrderedAndProject top-k. Deterministic: ties by span text asc.
    */
  def topDupSpans(df: DataFrame, idCol: String, textCol: String,
                  n: Int, k: Int): DataFrame = {
    val spans = dupSpans(df, idCol, textCol, n)
    val toks = df.select(col(idCol).cast("long").as("doc_id"),
      TextStats.tokens(col(textCol)).as("_toks"))
    spans.join(toks, Seq("doc_id"))
      .select(col("doc_id"),
        array_join(slice(col("_toks"), (col("span_start") + 1L).cast("int"),
          col("span_tokens").cast("int")), " ").as("span_text"),
        col("span_tokens"))
      .groupBy(col("span_text"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("span_tokens")).as("dup_tokens"))
      .orderBy(col("dup_tokens").desc, col("span_text").asc)
      .limit(k)
  }

  /** Cross-document duplicated-shingle fraction per doc: the share of a
    * doc's distinct n-gram shingles that also occur in at least one
    * OTHER document — the span-level duplication signal behind
    * "Deduplicating Training Data Makes Language Models Better" (Lee et
    * al., ACL'22): pairwise dedup (jaccardPairs/minhash) finds
    * near-identical DOCUMENTS, this finds boilerplate-heavy docs whose
    * text is stitched from fragments shared across the corpus. Cost: the
    * one shingle relation + a doc-frequency aggregation + one join back
    * — the same inverted-index shape as TF-IDF, no pair space at all.
    * (`shingleSets` is distinct-per-doc, so shingle count = doc
    * frequency.)
    */
  def dupShingleFraction(df: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame = {
    // spread the corpus scan (guide §2.2; identity at scale) — the
    // shingle relation is referenced twice below, and the spread's
    // exchange doubles as a reuse point so the tokenize+shingle subtree
    // runs once instead of twice (q85 1.06 -> 0.80 s warm)
    val s = shingleSets(graft.engine.Layout.spreadForCompute(df),
      idCol, textCol, n)
    val freq = s.groupBy(col("shingle")).agg(count(lit(1)).as("_df"))
    s.join(freq, "shingle")
      .groupBy(col("doc").as("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"), col("n_shingles"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_shingles"), 6).as("dup_fraction"))
  }

  /** Cross-source duplication matrix: near-dup PAIR counts by
    * unordered source pair — the provenance view of the dedup problem
    * (q109 answers "which source is polluted"; this answers "which
    * sources copy from EACH OTHER", the signal that tells a crawl
    * operator two feeds mirror the same upstream and one can be
    * dropped wholesale). Pairs come from [[jaccardPairs]] (exact dups
    * included — identical text has Jaccard 1); sources attach by two
    * key-joins of the pair list (pair-sized, ≪ corpus) against the
    * doc→source projection, and the pair key is canonicalized
    * (least, greatest) so A↔B and B↔A count as one cell. Within-source
    * duplication shows on the diagonal.
    */
  def crossSourceDupMatrix(df: DataFrame, idCol: String, textCol: String,
                           srcCol: String, n: Int,
                           threshold: Double): DataFrame = {
    val pairs = jaccardPairs(df, idCol, textCol, n, threshold)
      .select(col("doc_a"), col("doc_b"))
    val src = df.select(col(idCol).cast("long").as("_id"),
      col(srcCol).as("_src"))
    pairs
      .join(src.select(col("_id").as("doc_a"), col("_src").as("_sa")), Seq("doc_a"))
      .join(src.select(col("_id").as("doc_b"), col("_src").as("_sb")), Seq("doc_b"))
      .select(least(col("_sa"), col("_sb")).as("source_a"),
        greatest(col("_sa"), col("_sb")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_dup_pairs"))
  }

  /** Per-document n-gram NOVELTY under ingestion order: the fraction
    * of a doc's distinct shingles whose FIRST corpus occurrence (min
    * doc id — ids are the ingestion order) is the doc itself. The
    * order-aware complement of [[dupShingleFraction]]: that one scores
    * symmetric cross-doc duplication; this one answers "how much does
    * each successive document still add" — the marginal-novelty curve
    * behind dedup-then-train data-value arguments (cf. the
    * deduplication/memorization line of Lee et al. 2022).
    *
    * `novelty` is the unrounded exact-integer quotient (q107 rounding
    * discipline). Shape/scale: shingle sets explode map-side; ONE
    * shingle-keyed Exchange serves both the min-doc window and the
    * per-doc re-aggregation — no pair space, no join.
    */
  def noveltyFraction(df: DataFrame, idCol: String, textCol: String,
                      n: Int): DataFrame = {
    val byShingle = Window.partitionBy(col("shingle"))
    // spread the corpus scan (the dupShingleFraction shape)
    shingleSets(graft.engine.Layout.spreadForCompute(df), idCol, textCol, n)
      .withColumn("_first", min(col("doc")).over(byShingle))
      .groupBy(col("doc").as("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("_first") === col("doc"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty", col("n_novel") / col("n_shingles"))
  }

  /** Corpus-overlap matrix: Jaccard similarity of the DISTINCT shingle
    * VOCABULARIES of every pair of corpus slices — the corpus-level
    * complement of [[crossSourceDupMatrix]] (that one counts duplicated
    * DOCUMENT pairs; this one measures how much two slices talk about
    * the same n-grams at all, the overlap signal behind "is this new
    * crawl additive or a re-crawl" and source-weighting decisions).
    *
    * Pairs with an empty intersection are ABSENT (the matrix is sparse
    * by construction — at thousands of slices, emitting k²/2 zero
    * cells would dwarf the signal). `jaccard` is the unrounded double
    * quotient of exact longs (the q107 rounding-tie discipline).
    *
    * Shape/scale: one (slice, shingle) distinct (shuffle by the pair),
    * then an inverted-index self-join keyed by shingle — the pair
    * expansion per shingle is bounded by how many SLICES share it
    * (≤ maxSlices, guarded), never by document count. Slice sizes
    * broadcast onto the aggregate-sized pair frame.
    */
  def corpusOverlap(df: DataFrame, sliceCol: String, textCol: String,
                    n: Int, maxSlices: Long = graft.ops.GuardBounds.MaxCorpusSlices): DataFrame = {
    val sets = graft.engine.Caches.persisted("corpusOverlap.sets",
      shingleSets(df, sliceCol, textCol, n)
        .select(col("doc").as("slice"), col("shingle")).distinct())
    val k = sets.select(col("slice")).distinct().count()
    require(k <= maxSlices,
      s"corpusOverlap is quadratic in slices (${k * (k - 1) / 2} pairs at " +
        s"k=$k > maxSlices=$maxSlices); aggregate slices first")
    val sizes = sets.groupBy(col("slice")).agg(count(lit(1)).as("n_sh"))
    val a = sets.select(col("slice").as("slice_a"), col("shingle"))
    val b = sets.select(col("slice").as("slice_b"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("slice_a") < col("slice_b"))
      .groupBy(col("slice_a"), col("slice_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(broadcast(sizes.select(col("slice").as("slice_a"),
        col("n_sh").as("n_a"))), Seq("slice_a"))
      .join(broadcast(sizes.select(col("slice").as("slice_b"),
        col("n_sh").as("n_b"))), Seq("slice_b"))
      .select(col("slice_a"), col("slice_b"), col("n_a"), col("n_b"),
        col("n_inter"),
        (col("n_inter") / (col("n_a") + col("n_b") - col("n_inter")))
          .as("jaccard"))
  }
}
