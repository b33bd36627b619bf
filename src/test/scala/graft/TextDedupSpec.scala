package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Dedup, TextStats}

/** Dedup family + text analysis semantics on crafted fixtures. */
class TextDedupSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again tonight"), // near-dup of 1
    (3L, "completely different words about spark query engines and shuffles here"),
    (4L, "the quick brown fox jumps over the lazy dog again and again today") // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts, keeps min id") {
    val g = Dedup.exactGroups(docs, "doc_id", "text")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(g === Set((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("shingles are sliding word n-grams; short docs fall back to one shingle") {
    val s = Dedup.shingles(lit("a b c d"), 3)
    val out = spark.range(1).select(s.as("sh")).as[Seq[String]].head()
    assert(out === Seq("a b c", "b c d"))
    val short = spark.range(1).select(Dedup.shingles(lit("a b"), 3).as("sh"))
      .as[Seq[String]].head()
    assert(short === Seq("a b"))
  }

  test("jaccard pairs finds near-dups and exact dups above threshold") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs((1L, 4L)) === 1.0) // exact dup
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) > 0.5)
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("appendDedup: batch verdicts against an existing corpus, batch-proportional edges") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely different words about spark query engines and shuffles here"),
      (3L, "a third corpus text with its own vocabulary and nothing shared at all")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // exact dup of corpus 1 → drop, dup_of = 1
      (10L, "the quick brown fox jumps over the lazy dog again and again today"),
      // near-dup of corpus 2 → drop, dup_of = 2
      (11L, "completely different words about spark query engines and shuffles there"),
      // novel → keep
      (12L, "entirely novel content mentioning streaming watermarks and state stores"),
      // batch-internal near-dup pair → 13 keeps (min id), 14 drops with no dup_of
      (13L, "shared batch content speaking of parquet footers and row group stats"),
      (14L, "shared batch content speaking of parquet footers and row group pages"),
      // both near-dup corpus 3's text? no — transitive check: 15 and 16
      // each near-dup corpus 3 but not each other strongly enough; both
      // must drop with dup_of = 3 through the shared corpus neighbor
      (15L, "a third corpus text with its own vocabulary and nothing shared at one"),
      (16L, "a third corpus text with its own vocabulary and nothing shared at two")
    ).toDF("doc_id", "text")
    val out = graft.text.Clusters.appendDedup(corpus, batch, "doc_id", "text",
        shingleN = 3, threshold = 0.5)
      .as[(Long, Option[Long], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    spark.catalog.clearCache()
    assert(out(10L) === ((Some(1L), false)), "exact corpus dup")
    assert(out(11L) === ((Some(2L), false)), "near corpus dup")
    assert(out(12L) === ((None, true)), "novel keeps")
    assert(out(13L) === ((None, true)), "batch-internal min keeps")
    assert(out(14L) === ((None, false)), "batch-internal non-min drops")
    assert(out(15L) === ((Some(3L), false)), "merged via corpus neighbor")
    assert(out(16L) === ((Some(3L), false)), "merged via corpus neighbor")
    assert(out.size === 7)
  }

  test("appendDedup equals full-corpus jaccardPairs filtered to new-side pairs") {
    // the asymmetric prefix(new) ⋈ prefix(all) candidate join must lose
    // nothing vs the symmetric all-pairs scheme on the same union corpus
    val all = docs // 1,2 near-dups; 4 exact dup of 1; 3 isolated
    val newIds = Seq(2L, 4L).toDF("doc_id")
    val inc = Dedup.incrementalJaccardPairs(all, newIds, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val full = Dedup.jaccardPairs(all, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
      .filter(p => Set(2L, 4L).contains(p._1) || Set(2L, 4L).contains(p._2))
      .toSet
    spark.catalog.clearCache()
    assert(inc === full)
    assert(inc.nonEmpty)
  }

  test("restricted prefix shape (past PrefixRestrictAboveBytes) equals the one-pass shape") {
    // the r12 threshold switch: forcing the restricted path
    // (restrict = true) must produce the same verified pairs as
    // the small-corpus one-pass path AND as the symmetric full scheme
    val all = docs
    val newIds = Seq(2L, 4L).toDF("doc_id")
    val s = Dedup.shingleSets(all, "doc_id", "text", 3).persist()
    val onePass = Dedup.incrementalJaccardPairsFromShingles(s,
        newIds.select(col("doc_id").as("doc")), 0.5, 100000,
        restrict = false)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    graft.engine.Caches.releaseAll()
    val restricted = Dedup.incrementalJaccardPairsFromShingles(s,
        newIds.select(col("doc_id").as("doc")), 0.5, 100000,
        restrict = true)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    graft.engine.Caches.releaseAll()
    spark.catalog.clearCache()
    assert(restricted === onePass)
    assert(restricted.nonEmpty)
  }

  test("hot-shingle cap: results unchanged when pairs are witnessed by rarer shingles") {
    // every doc shares the same stop-phrase shingle ("x y z" after the
    // leading trigram window passes over it); near-dup pairs also share
    // rare shingles, so barring the hot shingle from candidate
    // generation must not change the result set
    val stopDocs = Seq(
      (1L, "x y z alpha beta gamma delta"),
      (2L, "x y z alpha beta gamma epsilon"), // near-dup of 1
      (3L, "x y z totally unrelated content here"),
      (4L, "x y z other words entirely different")
    ).toDF("doc_id", "text")
    val unCapped = Dedup.jaccardPairs(stopDocs, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    // cap=3 bars the freq-4 "x y z" shingle from witnessing candidates
    val capped = Dedup.jaccardPairs(stopDocs, "doc_id", "text", 3, 0.5, hotShingleCap = 3)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(unCapped.nonEmpty)
    assert(capped === unCapped) // same pairs AND same exact jaccard values
  }

  test("minhash+LSH recovers the exact-jaccard pairs on near-dup corpus") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val approx = Dedup.minhashLsh(docs, "doc_id", "text",
        shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(approx === exact) // verification step makes precision exact; recall here is total
  }

  test("simhash: identical texts collide, near-dups are close, distinct are far") {
    val sigs = docs.withColumn("_toks", TextStats.tokens(col("text")))
      .select(col("doc_id"), Dedup.simhash64("_toks").as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(4L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(2L)) < hamming(sigs(1L), sigs(3L)))
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("clusterSafeSplits: clusters land whole in one split — zero leakage by construction") {
    import graft.text.{Clusters, Curation}
    // the fixture has a 3-member cluster {1,2,4} (near-dup + exact dup)
    // and a singleton {3}: the cluster must be split-pure and carry the
    // CLUSTER id's q101 hash, the singleton its own id's
    val out = Clusters.clusterSafeSplits(docs, "doc_id", "text",
        Seq(("train", 80), ("val", 10), ("test", 10)), shingleN = 3)
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 === 1L && out(2L)._1 === 1L && out(4L)._1 === 1L)
    assert(out(3L)._1 === 3L)
    assert(Set(out(1L)._2, out(2L)._2, out(4L)._2).size === 1) // split-pure
    // the q110 leak shape over this assignment is EMPTY — the property
    // the operator exists for (per-doc assignment can leak; this can't)
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select(col("doc_a"), col("doc_b"))
    val sp = Clusters.clusterSafeSplits(docs, "doc_id", "text",
        Seq(("train", 80), ("val", 10), ("test", 10)), shingleN = 3)
      .select(col("doc_id"), col("split"))
    val leaks = pairs
      .join(sp.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(sp.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
    assert(leaks.count() === 0L)
    // and the split values agree with splitAssign's hash of the cluster id
    val direct = Curation.splitAssign(
        Seq((1L, 0), (3L, 0)).toDF("cluster_id", "pad"), "cluster_id",
        Seq(("train", 80), ("val", 10), ("test", 10)))
      .as[(Long, Int, String)].collect().map(r => r._1 -> r._3).toMap
    assert(out(1L)._2 === direct(1L) && out(3L)._2 === direct(3L))
  }

  test("canonicalByQuality keeps the argmax-quality member, min id on ties") {
    // docs 1,2,4 cluster (exact dup 1=4, near-dup 2); doc 2 carries one
    // EXTRA word (14 tokens vs 13), so the NEAR-DUP wins the cluster —
    // where dupClusters' min-id rule would keep doc 1; 3 is a singleton
    val qdocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today tonight"),
      (3L, "completely different words about spark query engines and shuffles here"),
      (4L, "the quick brown fox jumps over the lazy dog again and again today")
    ).toDF("doc_id", "text")
    val got = graft.text.Clusters.canonicalByQuality(qdocs, "doc_id", "text",
        size(TextStats.tokens(col("text"))).cast("long"), 3, 0.5)
      .select("doc_id", "cluster_id", "cluster_size", "quality", "keep")
      .as[(Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(2L) === ((2L, 1L, 3L, 14L, true)))  // best quality wins
    assert(got(1L) === ((1L, 1L, 3L, 13L, false))) // min id, but shorter
    assert(got(4L) === ((4L, 1L, 3L, 13L, false)))
    assert(got(3L) === ((3L, 3L, 1L, 10L, true)))  // singleton keeps itself
  }

  test("canonicalByQuality tiebreak: equal quality keeps the smaller doc id") {
    val tie = Seq((7L, "same words exactly here"), (9L, "same words exactly here"))
      .toDF("doc_id", "text")
    val got = graft.text.Clusters.canonicalByQuality(tie, "doc_id", "text",
        size(TextStats.tokens(col("text"))).cast("long"), 3, 0.5)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(got(7L) === true && got(9L) === false)
  }

  test("invertedIndex: df counts all docs, postings cap pre-aggregation, minDf prunes") {
    val corpus = Seq(
      (10L, "alpha beta"), (11L, "alpha beta"), (12L, "alpha gamma"),
      (13L, "alpha delta")).toDF("doc_id", "text")
    val got = TextStats.invertedIndex(corpus, "doc_id", "text",
        minDf = 2, maxPostings = 3)
      .select("token", "df", "truncated", "postings")
      .as[(String, Long, Boolean, Seq[Long])].collect()
      .map(r => r._1 -> r).toMap
    // alpha: df 4 > cap 3 → truncated, postings = 3 SMALLEST ids, sorted
    assert(got("alpha") === (("alpha", 4L, true, Seq(10L, 11L, 12L))))
    assert(got("beta") === (("beta", 2L, false, Seq(10L, 11L))))
    // gamma/delta: df 1 < minDf → pruned
    assert(!got.contains("gamma") && !got.contains("delta"))
  }

  test("crossSourceDupMatrix: canonical source pairs, diagonal = within-source dups") {
    val corpus = Seq(
      (1L, "web", "the quick brown fox jumps over the lazy dog again today"),
      (2L, "curated", "the quick brown fox jumps over the lazy dog again today"),
      (3L, "web", "the quick brown fox jumps over the lazy dog again today"),
      (4L, "curated", "completely different text about engines and shuffles here now")
    ).toDF("doc_id", "source", "text")
    val got = graft.text.Dedup.crossSourceDupMatrix(corpus, "doc_id", "text",
        "source", n = 3, threshold = 0.5)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // dup pairs: (1,2) web↔curated, (1,3) web↔web, (2,3) curated↔web —
    // both cross pairs land in ONE canonical (curated, web) cell
    assert(got === Map(("curated", "web") -> 2L, ("web", "web") -> 1L))
  }

  test("token count collapses repeated whitespace") {
    val df = Seq(("  a   b \t c  ")).toDF("text")
    assert(df.select(TextStats.tokenCount(col("text"))).as[Int].head() === 3)
  }

  test("bpe-ish token count splits letter runs, digit runs, and symbols") {
    val df = Seq(("It's 2024, v2.0!")).toDF("text")
    // It / ' / s / 2024 / , / v / 2 / . / 0 / !  → 10
    assert(df.select(TextStats.bpeTokenCount(col("text"))).as[Int].head() === 10)
  }

  test("lang id picks the max-score dictionary with deterministic ties") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),   // en
      (2L, "der hund und die katze ist das haus"), // de
      (3L, "xyzzy plugh")                          // unknown
    ).toDF("doc_id", "text")
    val out = TextStats.langId(df, "text")
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "en", 2L -> "de", 3L -> "unknown"))
  }

  test("fingerprint is deterministic and order-sensitive") {
    val fp = (s: String) => spark.range(1)
      .select(TextStats.fingerprint(lit(s))).as[Long].head()
    assert(fp("a b c") === fp("a b c"))
    assert(fp("a b c") !== fp("c b a"))
    assert(fp("a b c") >= 0L && fp("a b c") < 1000000007L)
  }

  test("lengthQuantiles: exact interpolated percentiles per group") {
    // group g: lengths 1,2,3,4 tokens → p50 = 2.5 (interpolated),
    // p90 = 1 + 0.9·3 = 3.7; group h: single 2-token doc → all = 2
    val docs = Seq(
      ("g", "a"), ("g", "a b"), ("g", "a b c"), ("g", "a b c d"),
      ("h", "x y")).toDF("source", "text")
    val got = graft.text.TextStats.lengthQuantiles(docs, "source", "text",
        Seq(0.5, 0.9)).orderBy("source")
      .as[(String, Long, Double, Double)].collect()
    assert(got === Array(("g", 4L, 2.5, 3.7), ("h", 1L, 2.0, 2.0)))
    intercept[IllegalArgumentException] {
      graft.text.TextStats.lengthQuantiles(docs, "source", "text", Seq(1.5))
    }
  }

  test("containmentPairs finds the sub-document dup that Jaccard misses") {
    // doc 2's single shingle appears verbatim inside doc 4 (8 shingles):
    // containment = 1.0 but jaccard = 1/8 — invisible at any jaccard
    // threshold a dedup pass would actually use
    val docs = Seq(
      (1L, "a b c d e f"),                 // shingles: "a b c d e", "b c d e f"
      (2L, "a b c d e"),                   // one shingle
      (3L, "p q r s t u v w"),             // unrelated
      (4L, "x y z a b c d e q r s t")      // contains doc 2's shingle
    ).toDF("doc_id", "text")
    val out = Dedup.containmentPairs(docs, "doc_id", "text", n = 5,
        threshold = 0.8)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Double]("containment"), r.getAs[Double]("jaccard"))))
      .toMap
    assert(out.keySet === Set((1L, 2L), (2L, 4L)))
    assert(out((1L, 2L)) === ((1.0, 0.5)))    // 1 shared / min(2,1); 1/(2+1-1)
    assert(out((2L, 4L)) === ((1.0, 0.125)))  // 1 shared / min(1,8); 1/(1+8-1)
  }

  test("containmentPairs: no pair below the containment threshold") {
    val docs = Seq(
      (1L, "a b c d e f g h"),   // 4 shingles
      (2L, "a b c d e x y z")    // 4 shingles, shares only "a b c d e"
    ).toDF("doc_id", "text")
    // containment = 1/4 = 0.25 < 0.8 → empty
    assert(Dedup.containmentPairs(docs, "doc_id", "text", 5, 0.8).isEmpty)
  }

  test("zipfSlope matches the exact decimal-sum regression") {
    // freqs: a×4, b×2, c×1 → ranks 1,2,3; slope of ln(freq) on ln(rank)
    val docs = Seq(("s", "a a a a b b c")).toDF("source", "text")
    def fix(v: Double) =
      BigDecimal(v).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val xs = Seq(1, 2, 3).map(r => fix(math.log(r)))
    val ys = Seq(4, 2, 1).map(f => fix(math.log(f)))
    val n = 3
    val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum.toDouble
    val sxx = xs.map(a => a * a).sum.toDouble
    val want = BigDecimal((n * sxy - sx * sy) / (n * sxx - sx * sx))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val row = graft.text.TextStats.zipfSlope(docs, "source", "text")
      .collect().head
    assert(row.getAs[Long]("n_ranks") === 3L)
    assert(row.getAs[Double]("zipf_slope") === want)
  }

  test("tokenEntropy: uniform unigrams give ln(V); single token gives zero") {
    val docs = Seq(
      ("u", "a a b b"),     // uniform over 2 tokens: H = ln 2, eff = 1
      ("s", "x x x")        // one token: H = 0, efficiency undefined
    ).toDF("source", "text")
    val rows = graft.text.TextStats.tokenEntropy(docs, "source", "text")
      .orderBy("source").collect()
    val s = rows(0); val u = rows(1)
    assert(u.getAs[Long]("vocab_size") === 2L)
    assert(u.getAs[Long]("total_tokens") === 4L)
    assert(u.getAs[Double]("entropy") === 0.693147)
    assert(u.getAs[Double]("efficiency") === 1.0)
    assert(s.getAs[Double]("entropy") === 0.0)
    assert(s.isNullAt(s.fieldIndex("efficiency")))
  }

  test("zipfSlope: topK caps the rank range; degenerate group is NULL") {
    val docs = Seq(
      ("s", "a a a b b c d e f g"),  // 7 distinct tokens
      ("t", "solo")                  // one token → no regression
    ).toDF("source", "text")
    val rows = graft.text.TextStats.zipfSlope(docs, "source", "text",
        topK = 3).orderBy("source").collect()
    assert(rows(0).getAs[Long]("n_ranks") === 3L)   // capped from 7
    assert(rows(1).getAs[Long]("n_ranks") === 1L)
    assert(rows(1).isNullAt(rows(1).fieldIndex("zipf_slope")))
  }

  test("distributionDrift: smoothed shares, one-sided buckets, zero drift on identical slices") {
    import org.apache.spark.sql.functions.col
    // A: buckets 0,0,1 ; B: buckets 0,2 — bucket 1 is A-only, 2 B-only
    val a = Seq(0L, 0L, 1L).toDF("b")
    val b = Seq(0L, 2L).toDF("b")
    val got = graft.text.TextStats.distributionDrift(a, b, col("b"))
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // K=3 buckets; shares: A totals 3 → +K = 6; B totals 2 → +K = 5
    assert(got(0L)._2 === 2L && got(0L)._3 === 1L)
    assert(got(0L)._4 === 0.5)         // (2+1)/6
    assert(got(0L)._5 === 0.4)         // (1+1)/5
    assert(got(1L)._4 === BigDecimal(2.0 / 6).setScale(9,
      BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got(2L)._2 === 0L && got(2L)._3 === 1L)
    // KL total is identical on every row and positive for real drift
    val totals = got.values.map(_._7).toSet
    assert(totals.size === 1 && totals.head > 0.0)
    // identical slices: every contribution is exactly ln(1) = 0
    val same = graft.text.TextStats.distributionDrift(a, a, col("b"))
      .as[(Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(same.forall(r => r._6 === 0.0 && r._7 === 0.0))
  }

  test("vocabChurn: top-V overlap, Jaccard, disjoint and tied-cut cases") {
    import org.apache.spark.sql.functions.col
    val a = Seq((1L, "x x y")).toDF("doc_id", "text")
    val b = Seq((2L, "z z x")).toDF("doc_id", "text")
    // V=2: A={x,y}, B={z,x} → shared {x}, jaccard 1/3
    val got = graft.text.TextStats.vocabChurn(a, b, "text", 2)
      .as[(Long, Long, Long, Double)].collect().head
    assert(got === ((2L, 2L, 1L, 0.333333)))
    // V=1: A top-1 = x (freq 2); B top-1 = z (freq 2) → disjoint
    val d1 = graft.text.TextStats.vocabChurn(a, b, "text", 1)
      .as[(Long, Long, Long, Double)].collect().head
    assert(d1 === ((1L, 1L, 0L, 0.0)))
    // identical slices: full overlap
    val same = graft.text.TextStats.vocabChurn(a, a, "text", 2)
      .as[(Long, Long, Long, Double)].collect().head
    assert(same === ((2L, 2L, 2L, 1.0)))
  }

  test("centroidDrift: orthogonal centroids → 0, identical/scaled → 1") {
    import org.apache.spark.sql.functions.col
    val a = Seq(Array(1.0f, 0.0f), Array(3.0f, 0.0f)).map(Tuple1(_))
      .toDF("embedding") // mean (2, 0)
    val b = Seq(Array(0.0f, 2.0f), Array(0.0f, 2.0f)).map(Tuple1(_))
      .toDF("embedding") // mean (0, 2)
    val got = graft.vector.Similarity.centroidDrift(a, b, "embedding")
      .as[(Long, Option[Double], Double, Double)].collect().head
    assert(got === ((2L, Some(0.0), 2.0, 2.0)))
    // scaled copies of the same direction: cosine exactly 1
    val c = Seq(Array(2.0f, 2.0f)).map(Tuple1(_)).toDF("embedding")
    val d = Seq(Array(5.0f, 5.0f)).map(Tuple1(_)).toDF("embedding")
    val cd = graft.vector.Similarity.centroidDrift(c, d, "embedding")
      .as[(Long, Option[Double], Double, Double)].collect().head
    assert(cd._2 === Some(1.0))
    // a zero-centroid side: cosine undefined, not a divide-by-zero
    val z = Seq(Array(0.0f, 0.0f)).map(Tuple1(_)).toDF("embedding")
    assert(graft.vector.Similarity.centroidDrift(a, z, "embedding")
      .as[(Long, Option[Double], Double, Double)].collect().head._2 === None)
  }

  test("vocabCoverage: deterministic top-V cut, per-doc OOV, blank docs absent") {
    // freqs: x=3, w=3, y=1, z=1 — the vocabSize=2 cut ties at freq 3
    // and resolves token-asc: vocab = {w, x}
    val docs = Seq((1L, "x x y"), (2L, "x z"), (3L, "w w w"), (4L, " "))
      .toDF("doc_id", "text")
    val got = graft.text.TextStats.vocabCoverage(docs, "doc_id", "text", 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((3L, 1L, 0.333333)))
    assert(got(2L) === ((2L, 1L, 0.5)))
    assert(got(3L) === ((3L, 0L, 0.0)))
    assert(!got.contains(4L)) // blank doc: no tokens, no row
  }

  test("bm25: idf and tf saturation match the closed form; unmatched docs absent") {
    // N=3, Σdl=6, avgdl=2; term "spark": df=2
    val docs = Seq(
      (1L, "spark spark fast"), // dl 3, tf 2
      (2L, "slow table"),       // no match — absent from the result
      (3L, "spark")             // dl 1, tf 1
    ).toDF("doc_id", "text")
    val out = graft.text.TextStats.bm25(docs, "doc_id", "text", Seq("spark"))
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    def score(tf: Double, dl: Double): Double = {
      val idf = math.log((3.0 - 2.0 + 0.5) / (2.0 + 0.5) + 1.0)
      val comp = tf / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / 2.0))
      BigDecimal(idf * comp).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(out.toSeq === Seq((1L, 1L, score(2, 3)), (3L, 1L, score(1, 1))))
  }

  test("tokenPmi: doc-level co-occurrence counts, tie-broken top-k, fanout guard") {
    val docs = Seq((1L, "x y"), (2L, "x y"), (3L, "x z"), (4L, "w"))
      .toDF("doc_id", "text")
    val out = graft.text.TextStats.tokenPmi(docs, "doc_id", "text",
        vocabSize = 10, minPairDocs = 1L, topK = 10)
      .as[(String, String, Long, Long, Long, Double)].collect()
    def p(n: Double, cab: Double, ca: Double, cb: Double) =
      BigDecimal(math.log((n * cab) / (ca * cb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // pmi(x,y) = ln(4·2/(3·2)) and pmi(x,z) = ln(4·1/(3·1)) are EQUAL —
    // the tie resolves on (token_a, token_b)
    assert(out.toSeq === Seq(
      ("x", "y", 2L, 3L, 2L, p(4, 2, 3, 2)),
      ("x", "z", 1L, 3L, 1L, p(4, 1, 3, 1))))
    val e = intercept[IllegalArgumentException] {
      graft.text.TextStats.tokenPmi(docs, "doc_id", "text", 1001, 1L, 10)
    }
    assert(e.getMessage.contains("vocabSize"))
    spark.catalog.clearCache()
  }

  test("noveltyFraction: first occurrence owns the shingle, repeats score zero") {
    val docs = Seq(
      (1L, "a b c d e f"), // both 5-grams first seen here → 1.0
      (2L, "a b c d e"),   // its one shingle already seen at doc 1 → 0.0
      (3L, "z")            // short-doc fallback shingle, novel → 1.0
    ).toDF("doc_id", "text")
    val out = graft.text.Dedup.noveltyFraction(docs, "doc_id", "text", 5)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq((1L, 2L, 2L, 1.0), (2L, 1L, 0L, 0.0),
      (3L, 1L, 1L, 1.0)))
  }

  test("corpusOverlap: slice-vocabulary jaccard, empty intersections absent") {
    // A: shingles {"a b c d e","b c d e f"}; B: {"a b c d e"} (short-doc
    // fallback at exactly 5 tokens is NOT taken — one full shingle);
    // C: {"x"} (short-doc fallback). A∩B = 1, union = 2 ⇒ 0.5;
    // C intersects nothing ⇒ no C rows at all
    val docs = Seq(
      ("A", 1L, "a b c d e f"),
      ("B", 2L, "a b c d e"),
      ("C", 3L, "x")
    ).toDF("src", "doc_id", "text")
    val out = graft.text.Dedup.corpusOverlap(docs, "src", "text", 5)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq(("A", "B", 2L, 1L, 1L, 0.5)))
    spark.catalog.clearCache()
  }

  test("winnowFingerprints: every w-window covered, rightmost tie rule, short-doc single window") {
    // 8 tokens → 6 positional 3-grams → window starts 0..2 (w=4)
    val docs = Seq(
      (1L, "t0 t1 t2 t3 t4 t5 t6 t7"),
      (2L, "x y"),                       // < k tokens: one fallback gram
      (3L, "r r r r r r r r r r")       // all grams equal → one distinct fp
    ).toDF("doc_id", "text")
    val out = TextStats.winnowFingerprints(docs, "doc_id", "text", 3, 4)
      .as[(Long, Long, Long)].collect().toSeq
    val d1 = out.filter(_._1 == 1L).map(_._2).sorted
    // coverage guarantee: every start s in 0..2 has a selection in [s, s+3]
    assert((0L to 2L).forall(s => d1.exists(p => p >= s && p <= s + 3)), d1)
    assert(d1.forall(p => p >= 0 && p < 6))
    // short doc: exactly one fingerprint at pos 0
    assert(out.filter(_._1 == 2L).map(t => (t._2, t._3)).size === 1)
    assert(out.filter(_._1 == 2L).head._2 === 0L)
    // identical grams: equal hash everywhere, rightmost-min walks the
    // windows but the distinct (pos, fp) set still covers every window
    val d3 = out.filter(_._1 == 3L)
    assert(d3.map(_._3).distinct.size === 1, d3)
    assert((0L to 4L).forall(s => d3.exists(p => p._2 >= s && p._2 <= s + 3)))
    spark.catalog.clearCache()
  }

  test("winnowOverlapPairs: shared run guarantees a pair; disjoint docs absent; guard refuses") {
    // docs 1,2 share an 8-token run (>= w+k-1 = 6 → guaranteed shared
    // fingerprint); doc 3 shares no 3-gram with either
    val docs = Seq(
      (1L, "p q c1 c2 c3 c4 c5 c6 c7 c8"),
      (2L, "c1 c2 c3 c4 c5 c6 c7 c8 z z2"),
      (3L, "u v w x y")
    ).toDF("doc_id", "text")
    val out = TextStats.winnowOverlapPairs(docs, "doc_id", "text",
        k = 3, w = 4, minShared = 1L)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(out.map(p => (p._1, p._2)) === Seq((1L, 2L)))
    val (_, _, na, nb, sh, cont) = out.head
    assert(sh >= 1 && sh <= math.min(na, nb))
    assert(cont === sh.toDouble / math.min(na, nb))
    graft.engine.Caches.releaseAll()
    // guard: every doc shares the same hot fingerprint set
    val hot = Seq.tabulate(5)(i => (i.toLong, "same text here")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextStats.winnowOverlapPairs(hot, "doc_id", "text", 3, 4, 1L,
        hotFpCap = 3L).collect()
    }
    assert(e.getMessage.contains("hottest fingerprint"))
    graft.engine.Caches.releaseAll()
    spark.catalog.clearCache()
  }

  test("cmsHeavyHitters: estimates never undercount, heavy gram surfaces with exact count") {
    val heavy = (1 to 5).map(i => (i.toLong, "x y z"))
    val noise = Seq((10L, "p q r s"), (11L, "m n"))
    val docs = (heavy ++ noise).toDF("doc_id", "text")
    val out = TextStats.cmsHeavyHitters(docs, "text", 3, topK = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    val byGram = out.map(r => r._1 -> r).toMap
    assert(byGram("x y z")._2 === 5L)
    // CMS never undercounts; overestimate is the reported difference
    assert(out.forall(r => r._3 >= r._2 && r._4 === r._3 - r._2), out)
    // the whole-doc fallback gram for the 2-token doc participates
    assert(byGram.contains("m n"))
    graft.engine.Caches.releaseAll()
    spark.catalog.clearCache()
  }

  test("hllDistinctAudit: register sum consistent, exact count right, estimate near truth") {
    val docs = (1L to 40L).map(i => (i, s"w$i x$i y$i z$i")).toDF("doc_id", "text")
    val out = TextStats.hllDistinctAudit(docs, "text", 3, p = 10)
      .as[(Long, Long, Long, Long, Double, Option[Double])].collect().head
    val (m, vZero, sScaled, nExact, rawEst, errRatio) = out
    assert(m === 1024L)
    // 40 docs × 2 positional trigrams, all distinct
    assert(nExact === 80L)
    // register-sum identity: empty registers contribute 2^33 each and
    // every term is a power of two ≤ 2^33
    assert(sScaled >= vZero * (1L << 33) && sScaled <= 1024L * (1L << 33))
    // 80 distinct into 1024 registers: raw HLL reads high below 2.5m
    // (the regime the linear-counting correction exists for) but must
    // stay within the correction's own operating envelope
    assert(rawEst > 0 && errRatio.isDefined)
    assert(errRatio.get === rawEst / nExact)
    graft.engine.Caches.releaseAll()
    spark.catalog.clearCache()
  }

  test("hll register lifecycle: build+append == rebuild; estimates match the corpus-scan audit") {
    val corpus = Seq(
      (1L, "s1", "w1 w2 w3 w4 w5"),
      (2L, "s2", "x1 x2 x3 x4")).toDF("doc_id", "source", "text")
    val batch = Seq(
      (3L, "s1", "w3 w4 w5 w6 w7"),
      (4L, "s3", "y1 y2 y3")).toDF("doc_id", "source", "text")
    val all = corpus.unionByName(batch)
    val base = java.nio.file.Files.createTempDirectory("graft_hllreg")
      .toString
    // incremental: build on the corpus, merge the batch in
    TextStats.buildHllRegisters(corpus, "source", "text", 3, 10, s"$base/a")
    TextStats.appendHllRegisters(spark, batch, "source", "text", s"$base/a")
    // rebuild on the union
    TextStats.buildHllRegisters(all, "source", "text", 3, 10, s"$base/b")
    def regs(p: String) = spark.read.parquet(s"$p/registers")
      .as[(String, Long, Int)].collect().toSet
    assert(regs(s"$base/a") === regs(s"$base/b"),
      "append-merged registers diverged from a rebuild on the union")
    // global estimate off the file == the corpus-scan audit's estimate
    val fromFile = TextStats.hllEstimateFromRegisters(spark, s"$base/a")
      .as[(Long, Long, Long, Option[Double])].collect().head
    graft.engine.Caches.releaseAll()
    val audit = TextStats.hllDistinctAudit(all, "text", 3, p = 10)
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().head
    graft.engine.Caches.releaseAll()
    assert(fromFile === ((audit._1, audit._2, audit._3, audit._5)),
      "register-file estimate diverged from the corpus-scan audit")
    // per-group read matches the per-slice audit's estimate columns
    val perGrp = TextStats.hllEstimateFromRegisters(spark, s"$base/a",
        perGroup = true).orderBy("grp")
      .as[(String, Long, Long, Long, Option[Double])].collect().toSeq
    val bySrc = TextStats.hllBySource(all, "source", "text", 3, p = 10)
      .orderBy("source")
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect().toSeq
    graft.engine.Caches.releaseAll()
    assert(perGrp === bySrc.map(r => (r._1, 1024L, r._2, r._3, r._5)),
      "per-group register read diverged from the per-slice audit")
    spark.catalog.clearCache()
  }

  test("hllBySource: single source matches the global audit; empty slice reads NULL estimates") {
    val docs = Seq(
      (1L, "s1", "w1 w2 w3 w4"),
      (2L, "s1", "w5 w6 w7"),
      (3L, "s2", " ")
    ).toDF("doc_id", "source", "text")
    val bySrc = TextStats.hllBySource(docs, "source", "text", 3, p = 10)
      .orderBy("source")
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect()
    graft.engine.Caches.releaseAll()
    val global = TextStats.hllDistinctAudit(
        docs.filter($"source" === "s1"), "text", 3, p = 10)
      .as[(Long, Long, Long, Long, Double, Option[Double])].collect().head
    graft.engine.Caches.releaseAll()
    // s1 carries all grams: per-slice row == the global audit of s1
    assert(bySrc(0) === (("s1", global._2, global._3, global._4,
      Some(global._5), global._6)))
    // s2 has no grams: full-zero registers, NULL estimates
    assert(bySrc(1) === (("s2", 1024L, 1024L * (1L << 33), 0L, None, None)))
    spark.catalog.clearCache()
  }

  test("appendWinnowOverlapPairsFromFps: persisted-fp path equals the self-deriving form") {
    val corpus = Seq(
      (1L, "c1 c2 c3 c4 c5 c6 c7"),
      (2L, "c1 c2 c3 c4 c5 c6 c7 tail")).toDF("doc_id", "text")
    val batch = Seq((10L, "c1 c2 c3 c4 c5 c6 c7 fresh")).toDF("doc_id", "text")
    val self = TextStats.appendWinnowOverlapPairs(corpus, batch,
        "doc_id", "text", 3, 4, 1L)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    graft.engine.Caches.releaseAll()
    val fpsAll = TextStats.winnowFingerprints(
        corpus.unionByName(batch), "doc_id", "text", 3, 4)
      .select($"doc_id", $"fp").distinct().persist()
    fpsAll.count()
    val indexed = TextStats.appendWinnowOverlapPairsFromFps(fpsAll,
        batch.select($"doc_id"), 1L)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    fpsAll.unpersist()
    assert(self === indexed)
    // only pairs with the batch side appear
    assert(indexed.nonEmpty && indexed.forall(p => p._2 == 10L))
    spark.catalog.clearCache()
  }

  test("kmvOverlap: production sketch-only form equals the audit's estimate columns") {
    val docs = Seq(
      ("sA", (1 to 25).map(i => s"t$i").mkString(" ")),
      ("sB", (10 to 30).map(i => s"t$i").mkString(" ")),
      ("sC", "u1 u2 u3 u4 u5")).toDF("source", "text")
    val sweep = TextStats.kmvOverlap(docs, "source", "text", 3, k = 8)
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().toSet
    graft.engine.Caches.releaseAll()
    val audit = TextStats.kmvOverlapAudit(docs, "source", "text", 3, k = 8)
      .select($"slice_a", $"slice_b", $"k_eff", $"theta", $"c_inter",
        $"union_est", $"inter_est")
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().toSet
    graft.engine.Caches.releaseAll()
    assert(sweep === audit,
      "sketch-only sweep diverged from the audit's estimate columns")
    spark.catalog.clearCache()
  }

  test("cms sketch lifecycle: build+append == rebuild; lookups are exact-or-over, absent reads 0") {
    val corpus = Seq(
      (1L, "slow hash batch runs slow hash batch again"),
      (2L, "window fast query")).toDF("doc_id", "text")
    val batch = Seq((3L, "slow hash batch once more")).toDF("doc_id", "text")
    val all = corpus.unionByName(batch)
    val base = java.nio.file.Files.createTempDirectory("graft_cmsl")
      .toString
    TextStats.buildCmsSketch(corpus, "text", 3, s"$base/a")
    TextStats.appendCmsSketch(spark, batch, "text", s"$base/a")
    TextStats.buildCmsSketch(all, "text", 3, s"$base/b")
    def cells(p: String) = spark.read.parquet(s"$p/cms")
      .as[(Int, Long, Long)].collect().toSet
    assert(cells(s"$base/a") === cells(s"$base/b"),
      "summed sketch diverged from a rebuild on the union")
    val out = TextStats.cmsLookupFromSketch(spark, s"$base/a",
        Seq("slow hash batch", "window fast query", "absent gram here"))
      .as[(String, Long)].collect().toMap
    // CMS never undercounts: >= true counts (2 corpus + 1 batch; 1; 0)
    assert(out("slow hash batch") >= 3L)
    assert(out("window fast query") >= 1L)
    // tiny corpus, 4x1024 cells: the absent gram's cells are empty
    assert(out("absent gram here") === 0L)
    spark.catalog.clearCache()
  }

  test("kmv sample lifecycle: build+append == rebuild; sample-file estimates match the sweep") {
    val corpus = Seq(
      ("sA", (1 to 20).map(i => s"t$i").mkString(" ")),
      ("sB", (10 to 25).map(i => s"t$i").mkString(" "))).toDF("source", "text")
    val batch = Seq(
      ("sA", (18 to 30).map(i => s"t$i").mkString(" ")),
      ("sC", "u1 u2 u3 u4 u5")).toDF("source", "text")
    val all = corpus.unionByName(batch)
    val base = java.nio.file.Files.createTempDirectory("graft_kmvs")
      .toString
    TextStats.buildKmvSamples(corpus, "source", "text", 3, 8, s"$base/a")
    TextStats.appendKmvSamples(spark, batch, "source", "text", s"$base/a")
    TextStats.buildKmvSamples(all, "source", "text", 3, 8, s"$base/b")
    def samples(p: String) = spark.read.parquet(s"$p/samples")
      .as[(String, Long)].collect().toSet
    assert(samples(s"$base/a") === samples(s"$base/b"),
      "append-folded samples diverged from a rebuild on the union")
    val fromFile = TextStats.kmvOverlapFromSamples(spark, s"$base/a")
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().toSet
    graft.engine.Caches.releaseAll()
    val sweep = TextStats.kmvOverlap(all, "source", "text", 3, k = 8)
      .as[(String, String, Long, Long, Long, Double, Double)]
      .collect().toSet
    graft.engine.Caches.releaseAll()
    assert(fromFile === sweep,
      "sample-file estimates diverged from the self-deriving sweep")
    spark.catalog.clearCache()
  }

  test("kmvOverlapAudit: identical slices estimate inter == union; guard refuses on slices") {
    val text = (1 to 30).map(i => s"t$i").mkString(" ")
    val docs = Seq(("sA", text), ("sB", text), ("sC", "u1 u2 u3 u4 u5"))
      .toDF("source", "text")
    val out = TextStats.kmvOverlapAudit(docs, "source", "text", 3, k = 8)
      .orderBy("slice_a", "slice_b")
      .as[(String, String, Long, Long, Long, Double, Double, Long, Long)]
      .collect()
    graft.engine.Caches.releaseAll()
    val ab = out.find(r => r._1 == "sA" && r._2 == "sB").get
    // identical hash sets: every sampled hash is in both bottom-k sets
    assert(ab._3 === 8L && ab._5 === 8L)
    assert(ab._6 === ab._7) // union_est == inter_est
    assert(ab._8 === ab._9) // exact inter == exact union
    // disjoint slices: zero sampled intersection, zero exact overlap
    val ac = out.find(r => r._1 == "sA" && r._2 == "sC").get
    assert(ac._5 === 0L && ac._7 === 0.0 && ac._8 === 0L)
    val e = intercept[IllegalArgumentException] {
      TextStats.kmvOverlapAudit(docs, "source", "text", 3, k = 8,
        maxSlices = 2L).collect()
    }
    assert(e.getMessage.contains("quadratic in slices"))
    graft.engine.Caches.releaseAll()
    spark.catalog.clearCache()
  }

  test("corpusOverlap: refuses past the slice-count guard") {
    val docs = Seq(("A", "a"), ("B", "b"), ("C", "c")).toDF("src", "text")
    val e = intercept[IllegalArgumentException] {
      graft.text.Dedup.corpusOverlap(docs, "src", "text", 5, maxSlices = 2L)
        .collect()
    }
    assert(e.getMessage.contains("maxSlices"))
    spark.catalog.clearCache()
  }
}
