package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Word n-gram shingles of the whitespace token stream; documents
    * shorter than n yield their single full-token shingle.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextStats.tokens(text)
    when(size(toks) < n, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  /** (id, shingle) set representation — distinct shingles per doc. */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("doc"),
        explode(array_distinct(shingles(col(textCol), n))).as("shingle"))

  /** n-gram Jaccard near-dup pairs: join docs on shared shingles
    * (candidates), count shared, jaccard = |∩| / (|a|+|b|-|∩|).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double): DataFrame = {
    // the shingle relation feeds the self-join (twice) + the sizes agg:
    // materialize it once instead of re-tokenizing the corpus three times
    val s = shingleSets(df, idCol, textCol, n).persist()
    val sizes = s.groupBy(col("doc")).agg(count(lit(1)).as("n_sh"))
    val shared = s.as("a").join(s.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
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
    val s = shingleSets(df, idCol, textCol, shingleN).persist()
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

  /** 64-bit SimHash over the token stream (token hash = xxhash64; bit i of
    * the fingerprint is set iff more than half the tokens have bit i set —
    * identical to the classic sign(Σ ±1) criterion). Single row-local
    * pass: each token is hashed exactly ONCE (the inner `transform`), then
    * all 64 bit-counters accumulate in one `aggregate` with an
    * array-of-counters accumulator. No shuffle, no UDF. `tokensCol` must
    * hold array<string> tokens.
    */
  def simhash64(tokensCol: String): Column = expr(
    s"""aggregate(
       |  zip_with(
       |    aggregate(
       |      transform($tokensCol, t -> xxhash64(t)),
       |      array_repeat(0L, 64),
       |      (acc, h) -> zip_with(acc, sequence(0, 63),
       |        (a, i) -> a + (shiftright(h, i) & 1L))),
       |    sequence(0, 63),
       |    (c, i) -> if(2L * c > size($tokensCol), shiftleft(1L, i), 0L)),
       |  0L, (acc, v) -> acc + v)""".stripMargin)

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
      .persist() // self-joined: compute each signature once, not twice
    chunked.as("a").join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ck") === col("b.ck") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
