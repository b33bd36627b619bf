package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Clusters, Curation}

/** Corpus-curation semantics: connected-component dup clustering,
  * token chunking, decontamination, bigram LM stats.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("pageRank: symmetric cycle stays uniform, in-degree concentrates rank, mass conserved") {
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val pr = Clusters.pageRank(cyc, "src", "dst", iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(pr(1L) === 0.5 && pr(2L) === 0.5) // fixed point of the symmetric 2-cycle
    // 1↔2 plus 3→1: node 1 gains what 3 sheds; 3 keeps teleport only
    val star = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val pr2 = Clusters.pageRank(star, "src", "dst", iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(pr2(1L) > pr2(2L) && pr2(2L) > pr2(3L), pr2)
    // no dangling nodes → total rank mass stays 1
    assert(math.abs(pr2.values.sum - 1.0) < 1e-9, pr2)
  }

  test("labelPropagation spreads seed labels, pins seeds, ties break to smaller label") {
    // path 1-2-3-4-5 with seeds 1→10, 5→20: middle node 3 sees one of
    // each (tie) → smaller label 10; node 2 → 10; node 4 → 20
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq((1L, 10L), (5L, 20L)).toDF("node", "lab")
    val got = Clusters.labelPropagation(edges, "src", "dst", seeds, "node", "lab", 2)
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(10L) && got(5L) === Some(20L)) // seeds pinned
    assert(got(2L) === Some(10L) && got(4L) === Some(20L))
    assert(got(3L) === Some(10L)) // sees one 10 and one 20: tie → smallest
    // a third round lets the tie-broken 10 at node 3 tie node 4 as well —
    // synchronous LPA semantics, deterministic by the total tiebreak
    val got3 = Clusters.labelPropagation(edges, "src", "dst", seeds, "node", "lab", 3)
      .as[(Long, Option[Long])].collect().toMap
    assert(got3(4L) === Some(10L))
    // an isolated component never reached by a seed stays unlabeled
    val edges2 = edges.union(Seq((8L, 9L)).toDF("src", "dst"))
    val got2 = Clusters.labelPropagation(edges2, "src", "dst", seeds, "node", "lab", 3)
      .as[(Long, Option[Long])].collect().toMap
    assert(got2(8L) === None && got2(9L) === None)
  }

  test("stripBoilerplate removes cross-doc lines, keeps order, drops all-boilerplate docs") {
    val docs = Seq(
      (1L, "unique one\nCOOKIE BANNER\nunique two"),
      (2L, "COOKIE BANNER\nother text"),
      (3L, "COOKIE BANNER") // every line shared → nothing left to keep
    ).toDF("doc_id", "text")
    val got = Curation.stripBoilerplate(docs, "doc_id", "text")
      .as[(Long, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, "unique one\nunique two", 2L)))
    assert(got(2L) === ((2L, "other text", 1L)))
    assert(!got.contains(3L))
  }

  test("connectedComponents labels a chain with its minimum node") {
    // 1-2-3-4 chain plus isolated pair 10-11: transitivity across hops
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("src", "dst")
    val expect = Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (10L, 10L), (11L, 10L))
    val got = Clusters.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toSet
    assert(got === expect)
    // forcing past the local-solve threshold must give identical labels
    val dist = Clusters.connectedComponents(edges, "src", "dst",
        maxLocalEdges = 0).as[(Long, Long)].collect().toSet
    assert(dist === expect)
  }

  test("connectedComponents handles duplicate/reversed/self edges and empty input") {
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 3L), (1L, 2L)).toDF("src", "dst")
    val got = Clusters.connectedComponents(edges, "src", "dst")
      .as[(Long, Long)].collect().toSet
    // self-loop node 3 has no real edge — caller treats it as a singleton
    assert(got === Set((1L, 1L), (2L, 1L)))
    assert(Clusters.connectedComponents(
      Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst").isEmpty)
  }

  test("connectedComponents fails loudly when maxIter is exhausted") {
    // a 4-chain needs at least two rounds; maxIter = 1 must not return
    // a half-contracted (non-star) edge set
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (5L, 4L)).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      Clusters.connectedComponents(edges, "src", "dst", maxIter = 1,
        maxLocalEdges = 0).collect() // force the distributed rounds
    }
    assert(e.getMessage.contains("converge"))
  }

  test("dupClusters merges exact and near-dup edges transitively") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (3L, "completely different words about spark query engines and shuffles here"),
      (4L, "the quick brown fox jumps over the lazy dog again and again today"),
      // near-dup of 2 but not of 1 (two token edits from 1) — must still
      // land in cluster 1 through the 2-bridge
      (5L, "the quick brown fox jumps over the lazy dog again and again tonight ok")
    ).toDF("doc_id", "text")
    val got = Clusters.dupClusters(docs, "doc_id", "text", 3, 0.5)
      .select("doc_id", "cluster_id", "is_canonical")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set((1L, 1L, true), (2L, 1L, false), (3L, 3L, true),
      (4L, 1L, false), (5L, 1L, false)))
  }

  test("tokenChunks windows overlap and cover every token") {
    val docs = Seq((7L, (1 to 10).map(i => s"w$i").mkString(" ")), (8L, ""))
      .toDF("doc_id", "text")
    val got = Curation.tokenChunks(docs.filter(col("doc_id") === 7), "doc_id", "text", 4, 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_text", "n_tokens")
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq(
      (0L, "w1 w2 w3 w4", 4L), (1L, "w4 w5 w6 w7", 4L),
      (2L, "w7 w8 w9 w10", 4L), (3L, "w10", 1L)))
    assert(Curation.tokenChunks(docs, "doc_id", "text", 4, 4)
      .filter(col("doc_id") === 8).isEmpty) // empty doc → no chunks
  }

  test("contamination counts shared shingles against the eval slice only") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "eval"),
      (2L, "alpha beta gamma epsilon", "train"), // shares "alpha beta gamma"
      (3L, "zeta eta theta iota", "train")       // shares nothing
    ).toDF("doc_id", "text", "split")
    val got = Curation.contamination(docs, "doc_id", "text",
        col("split") === "eval", 3)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set((2L, 1L, true), (3L, 0L, false)))
  }

  test("contamination treats a NULL eval predicate as train (SQL NOT IN semantics)") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", Some("eval")),
      (2L, "alpha beta gamma epsilon", None), // null split: must stay TRAIN
      (3L, "zeta eta theta iota", Some("train"))
    ).toDF("doc_id", "text", "split")
    val pred = col("split") === "eval" // NULL for doc 2
    val got = Curation.contamination(docs, "doc_id", "text", pred, 3)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set((2L, 1L, true), (3L, 0L, false)))
    val spans = graft.text.Dedup.contaminationSpans(docs, "doc_id", "text", pred, 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans === Set((2L, 0L, 2L, 3L))) // "alpha beta gamma" covers tokens 0..2
  }

  test("contaminationBloom is bit-identical to exact contamination") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "eval"),
      (2L, "alpha beta gamma epsilon", "train"),
      (3L, "zeta eta theta iota", "train"),
      (4L, "beta gamma delta kappa", "train")
    ).toDF("doc_id", "text", "split")
    val pred = col("split") === "eval"
    val exact = Curation.contamination(docs, "doc_id", "text", pred, 3)
      .as[(Long, Long, Boolean)].collect().toSet
    val bloom = Curation.contaminationBloom(docs, "doc_id", "text", pred, 3)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(bloom === exact)
    assert(exact.contains((2L, 1L, true))) // sanity: overlap really exists
  }

  test("contaminationBloom with an empty eval corpus marks nothing") {
    val docs = Seq((1L, "a b c d", "train"), (2L, "e f g h", "train"))
      .toDF("doc_id", "text", "split")
    val got = Curation.contaminationBloom(docs, "doc_id", "text",
        col("split") === "eval", 3)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set((1L, 0L, false), (2L, 0L, false)))
  }

  test("hashSample is deterministic, honors k, and ranks by id-hash") {
    val docs = (1L to 50L).map(i => (if (i % 2 == 0) "even" else "odd", i))
      .toDF("src", "doc_id")
    val s1 = Curation.hashSample(docs, "src", "doc_id", 3)
      .select("src", "doc_id", "sample_rank")
      .as[(String, Long, Int)].collect().toSet
    val s2 = Curation.hashSample(docs.repartition(7), "src", "doc_id", 3)
      .select("src", "doc_id", "sample_rank")
      .as[(String, Long, Int)].collect().toSet
    assert(s1 === s2)                        // partitioning-independent
    assert(s1.count(_._1 == "even") === 3 && s1.count(_._1 == "odd") === 3)
    // rank 1 really is the argmin of the hash within the group
    val h = (i: Long) => ((i % 1000000007L) * 2654435761L) % 1000000007L
    val expectEven = (2L to 50L by 2).minBy(h)
    assert(s1.contains(("even", expectEven, 1)))
  }

  test("tfIdf: corpus-wide terms score zero, distinctive terms rank first") {
    val docs = Seq(
      (1L, "common alpha alpha"), (2L, "common beta"), (3L, "common gamma"))
      .toDF("doc_id", "text")
    val got = Curation.tfIdf(docs, "doc_id", "text", 2)
      .as[(Long, String, Double, Long)].collect()
      .map(r => (r._1, r._4) -> (r._2, r._3)).toMap
    // "common" appears in all 3 docs → idf = ln(1) = 0
    val doc1Top = got((1L, 1L))
    assert(doc1Top._1 === "alpha")
    assert(doc1Top._2 === math.rint((2.0 / 3.0) * math.log(3.0) * 1e6) / 1e6)
    assert(got((2L, 1L))._1 === "beta" && got((2L, 2L))._1 === "common")
    assert(got((2L, 2L))._2 === 0.0)
  }

  test("curate: quality gate, canonical-only dedup, deterministic split") {
    val long = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (10L, long),                      // kept, canonical, 10%10=0 → train
      (18L, long + " extra"),           // near-dup of 10 → dropped
      (28L, "too short"),               // quality-dropped
      (9L, (1 to 25).map(i => s"w$i").mkString(" "))) // kept, 9%10 → test
      .toDF("doc_id", "text")
    val got = Curation.curate(docs, "doc_id", "text",
        minTokens = 20, maxStopwordRatio = 0.5, shingleN = 5, threshold = 0.5)
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(got === Set((10L, "train"), (9L, "test")))
  }

  test("repetitionRatio counts repeated 3-grams; short docs score zero") {
    val docs = Seq(
      (1L, "a b c a b c a b c"), // 7 shingles, 3 distinct → 4/7 repeats
      (2L, "all distinct words here now"),
      (3L, "xy")                 // < 3 tokens → 1 fallback shingle, ratio 0
    ).toDF("doc_id", "text")
    val got = Curation.repetitionRatio(docs, "doc_id", "text", 3)
      .select("doc_id", "n_shingles", "dup_ratio")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) === ((7L, math.rint(4.0 / 7.0 * 1e6) / 1e6)))
    assert(got(2L) === ((3L, 0.0)))
    assert(got(3L) === ((1L, 0.0)))
  }

  test("docLogProb scores deterministic transitions at ln(1) = 0") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "c d")).toDF("doc_id", "text")
    // every w1 has exactly one continuation → p = 1 everywhere
    val got = Curation.docLogProb(docs, "doc_id", "text")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === Map(1L -> ((0.0, 1L)), 2L -> ((0.0, 1L)), 3L -> ((0.0, 1L))))
    // a doc with a 50/50 transition averages ln(0.5) over its bigrams
    val docs2 = Seq((1L, "a b"), (2L, "a c")).toDF("doc_id", "text")
    val got2 = Curation.docLogProb(docs2, "doc_id", "text")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got2(1L) === math.rint(math.log(0.5) * 1e6) / 1e6)
  }

  test("redactPii replaces emails, phones, and IPs with typed tokens") {
    val docs = Seq(
      (1L, "mail me at jane.doe+x@example.org or call +1 555-123-4567 now"),
      (2L, "server at 10.0.123.7 responded"),
      (3L, "nothing sensitive here"),
      (4L, "call 555-123-4567 or (555) 123-4567"),   // no country code
      (5L, "order 1234567812345678 shipped"),        // 16-digit run: not a phone
      (6L, "reach +15551234567@relay.example.com ok") // email consumes the phone-ish span
    ).toDF("doc_id", "text")
    val got = Curation.redactPii(docs, "text")
      .select("doc_id", "text", "n_redactions")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) === (("mail me at <EMAIL> or call <PHONE> now", 2L)))
    assert(got(2L) === (("server at <IP> responded", 1L)))
    assert(got(3L) === (("nothing sensitive here", 0L)))
    assert(got(4L) === (("call <PHONE> or <PHONE>", 2L)))
    assert(got(5L) === (("order 1234567812345678 shipped", 0L)))
    // one placeholder inserted → count is 1, not email+phone double-counted
    assert(got(6L) === (("reach <EMAIL> ok", 1L)))
  }

  test("packedSequences concatenates batch texts in doc order") {
    val docs = Seq(
      (1L, "a a a", "s"),  // 3 tokens
      (2L, "b b b", "s"),  // running sum 6 → batch 0 under budget 6? no: (6-3)/6=0
      (3L, "c c c", "s"),  // (9-3)/6=1 → batch 1
      (4L, "d", "t")
    ).toDF("doc_id", "text", "source")
    val got = Curation.packedSequences(docs, "doc_id", "text", "source", 6L)
      .select("source", "batch_id", "packed_text")
      .as[(String, Long, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("s", 0L)) === "a a a <eos> b b b")
    assert(got(("s", 1L)) === "c c c")
    assert(got(("t", 0L)) === "d")
  }

  test("mixtureSample repeats by epoch weight with deterministic fractions") {
    val docs = (0L until 100L).map(i =>
      (i, if (i < 50) "up" else "down", s"text$i")).toDF("doc_id", "source", "text")
    val got = Curation.mixtureSample(docs, "doc_id", "source",
      Map("up" -> 2.5, "down" -> 0.3))
    val bySrc = got.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // up: ids 0..49, every doc twice + ids with id%100 < 50 once more —
    // all 50 qualify → 150 rows. down: ids 50..99, only id%100 < 30 → none
    assert(bySrc === Map("up" -> 150L))
    // epochs enumerate 0..copies-1
    val epochs = got.filter(col("doc_id") === 0L)
      .select("epoch").as[Long].collect().sorted.toSeq
    assert(epochs === Seq(0L, 1L, 2L))
    // weight 0 drops the source entirely; default weight keeps one copy
    val zero = Curation.mixtureSample(docs, "doc_id", "source", Map("up" -> 0.0))
    assert(zero.groupBy("source").count().as[(String, Long)].collect().toMap
      === Map("down" -> 50L))
  }

  test("temperatureWeights: alpha=0.5 turns a 90/10 token mix into 75/25 targets") {
    // √0.9 = 3·√0.1, so the α=0.5 targets are exactly 3:1 — a clean
    // closed form that survives the 12dp decimal fixing of pow()
    val docs = Seq(
      ("big", Seq.fill(90)("w").mkString(" ")),
      ("small", Seq.fill(10)("w").mkString(" "))).toDF("source", "text")
    val got = Curation.temperatureWeights(docs, "source", "text", alpha = 0.5)
      .select("source", "n_docs", "n_tokens", "natural_share",
        "target_share", "rate")
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("big") === (("big", 1L, 90L, 0.9, 0.75, 0.833333)))
    assert(got("small") === (("small", 1L, 10L, 0.1, 0.25, 2.5)))
    // α = 1 keeps the natural mix: every rate 1.0
    val id = Curation.temperatureWeights(docs, "source", "text", alpha = 1.0)
      .select("source", "rate").as[(String, Double)].collect().toMap
    assert(id.values.forall(_ === 1.0), id)
  }

  test("bigramStats conditional probabilities sum against the first word") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "d e")).toDF("doc_id", "text")
    val got = Curation.bigramStats(docs, "text", 10)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("a b") === ((2L, 0.666667)))
    assert(got("a c") === ((1L, 0.333333)))
    assert(got("d e") === ((1L, 1.0)))
  }

  test("splitAssign: stable under growth/repartition, partitions the corpus, ~proportional") {
    val docs = (0L until 2000L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val split = Curation.splitAssign(docs, "doc_id",
        Seq(("train", 80), ("val", 10), ("test", 10)))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // every row gets exactly one of the three labels
    assert(split.size === 2000 && split.values.toSet.subsetOf(Set("train", "val", "test")))
    // proportions land near 80/10/10 (hash is uniform; tolerance ±5pp)
    val n = split.size.toDouble
    assert(math.abs(split.values.count(_ == "train") / n - 0.80) < 0.05, split.values.count(_ == "train"))
    assert(math.abs(split.values.count(_ == "val") / n - 0.10) < 0.05)
    // THE property rand() splits lose: growing the corpus and shuffling
    // its layout never reassigns an existing row
    val grown = (0L until 4000L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
      .repartition(13)
    val again = Curation.splitAssign(grown, "doc_id",
        Seq(("train", 80), ("val", 10), ("test", 10)))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    split.foreach { case (id, s) => assert(again(id) === s, s"doc $id reassigned") }
    intercept[IllegalArgumentException] {
      Curation.splitAssign(docs, "doc_id", Seq(("train", 90), ("val", 5)))
    }
  }

  test("epochShuffle: a permutation per epoch — contiguous shard positions, epochs differ") {
    val docs = (0L until 1000L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val e3 = Curation.epochShuffle(docs, "doc_id", epoch = 3, shards = 8)
      .select("doc_id", "shard", "shard_pos").as[(Long, Long, Int)].collect()
    assert(e3.length === 1000)
    // (shard, pos) is a bijection: per-shard positions are exactly 1..n_shard
    e3.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length),
        s"shard $shard positions not contiguous")
    }
    // deterministic: a repartitioned rerun reproduces every position
    val rerun = Curation.epochShuffle(docs.repartition(7), "doc_id", 3, 8)
      .select("doc_id", "shard", "shard_pos").as[(Long, Long, Int)].collect()
    assert(rerun.sortBy(_._1).toSeq === e3.sortBy(_._1).toSeq)
    // a different epoch is a different permutation of the same universe
    val e4 = Curation.epochShuffle(docs, "doc_id", epoch = 4, shards = 8)
      .select("doc_id", "shard", "shard_pos").as[(Long, Long, Int)].collect()
    assert(e4.map(r => (r._1, r._2, r._3)).toSet !== e3.map(r => (r._1, r._2, r._3)).toSet)
  }

  test("heavyHitters returns EXACTLY the >=minCount tokens even with a colliding sketch") {
    import graft.text.TextStats
    // 3 heavy tokens, a long tail of singletons
    val rows = (Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      Seq.fill(10)("gamma") ++ (0 until 300).map(i => s"tail$i"))
      .map(Tuple1(_)).toDF("tok")
    val truth = Map("alpha" -> 40L, "beta" -> 25L, "gamma" -> 10L)
    // eps=0.5 → a 4-cell-wide sketch: massive collision over-counting,
    // yet the exact second pass must still return precisely the truth
    val got = TextStats.heavyHitters(rows, array(col("tok")), minCount = 10L,
        eps = 0.5).as[(String, Long)].collect().toMap
    assert(got === truth, got)
    // threshold excludes gamma
    val got25 = TextStats.heavyHitters(rows, array(col("tok")), minCount = 25L)
      .as[(String, Long)].collect().toMap
    assert(got25 === truth.filter(_._2 >= 25L))
    // empty corpus → empty result, not a null-sketch crash
    assert(TextStats.heavyHitters(rows.limit(0), array(col("tok")), 5L).count() === 0L)
  }

  test("weightedSample: exponential-key order matches the closed form; nonpositive weights drop") {
    val rows = Seq((1L, 10L), (2L, 1000L), (3L, 1L), (4L, 0L))
    val df = rows.toDF("doc_id", "w")
    val out = Curation.weightedSample(df, "doc_id", col("w"), 10)
      .as[(Long, Double, Double, Int)].collect()
    val p = 1000000007L
    def key(id: Long, w: Long) = {
      val u = (((id % p) * 2654435761L % p) + 1).toDouble / (p + 1)
      BigDecimal(math.log(u) / w)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = rows.filter(_._2 > 0)
      .map { case (id, w) => (id, w, key(id, w)) }
      .sortBy { case (id, _, k) => (-k, id) }
      .zipWithIndex.map { case ((id, w, k), i) => (id, w.toDouble, k, i + 1) }
    assert(out.toSeq === expect)
  }

  test("gopherFilter: each named rule fires on its crafted violation") {
    val good = "the a " + Seq.fill(58)("data").mkString(" ") // 60 words
    val docs = Seq(
      (1L, good),                                  // passes every rule
      (2L, "the a data"),                          // too short
      (3L, Seq.fill(10)("- the item").mkString("\n")), // all-bullet lines
      (4L, "5 7 9")                                // no alphabetic words
    ).toDF("doc_id", "text")
    val out = Curation.gopherFilter(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(!out(2L).getAs[Boolean]("len_ok") && !out(2L).getAs[Boolean]("keep"))
    assert(!out(3L).getAs[Boolean]("bullet_ok"))
    assert(!out(4L).getAs[Boolean]("alpha_ok"))
    // mean word length of doc 1: 3+1+58·4 = 236 ∈ [3·60, 10·60]
    assert(out(1L).getAs[Boolean]("word_len_ok"))
    assert(out(1L).getAs[Long]("n_words") === 60L)
  }

  test("neymanSample: n·σ allocation, largest-remainder, quota caps at stratum size") {
    // A: {0,10} n=2 σ=5 w=10; B: {7,7,7} σ=0 w=0; C: {1,3} σ=1 w=2
    // N=5 ⇒ ideals A 25/6≈4.167, B 0, C 5/6≈0.833 ⇒ bases 4,0,0, one
    // leftover unit goes to C (largest remainder) ⇒ quotas A min(4,2)=2,
    // B 0, C 1; C's pick is doc 7 (smaller multiplicative hash than 6)
    val df = Seq(
      ("A", 1L, 0), ("A", 2L, 10),
      ("B", 3L, 7), ("B", 4L, 7), ("B", 5L, 7),
      ("C", 6L, 1), ("C", 7L, 3)
    ).toDF("src", "id", "sz")
    val out = Curation.neymanSample(df, "src", "id", col("sz"), 5)
      .orderBy("src", "sample_rank")
      .as[(String, Long, Int, Long)].collect()
    assert(out.map(_._1).toSeq === Seq("A", "A", "C"))
    assert(out.filter(_._1 == "A").map(_._4).toSet === Set(2L)) // capped quota
    assert(out.filter(_._1 == "C").map(r => (r._2, r._4)).toSeq ===
      Seq((7L, 1L)))
  }

  test("neymanSample: all-constant strata fall back to proportional allocation") {
    // every σ = 0 ⇒ W = 0 ⇒ ideals 3·2/5=1.2 and 3·3/5=1.8 ⇒ bases
    // 1,1, leftover to B ⇒ quotas A=1, B=2
    val df = Seq(
      ("A", 1L, 4), ("A", 2L, 4),
      ("B", 3L, 9), ("B", 4L, 9), ("B", 5L, 9)
    ).toDF("src", "id", "sz")
    val rows = Curation.neymanSample(df, "src", "id", col("sz"), 3)
      .as[(String, Long, Int, Long)].collect()
    assert(rows.count(_._1 == "A") === 1)
    assert(rows.count(_._1 == "B") === 2)
    assert(rows.filter(_._1 == "A").map(_._4).toSet === Set(1L))
    assert(rows.filter(_._1 == "B").map(_._4).toSet === Set(2L))
  }

  test("hashedTfidf/Embed: empty corpus and whitespace-only docs degrade safely") {
    import graft.text.TextStats
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextStats.hashedTfidf(empty, "doc_id", "text", 8).isEmpty)
    assert(TextStats.hashedTfidfEmbed(empty, "doc_id", "text", 8).isEmpty)
    val ws = Seq((1L, "   "), (2L, "a b a")).toDF("doc_id", "text")
    // whitespace-only doc: no tokens → no sparse buckets...
    assert(graft.text.TextStats.hashedTfidf(ws, "doc_id", "text", 8)
      .filter(col("doc_id") === 1L).isEmpty)
    // ...and a ZERO dense vector (kept in the frame, excluded by every
    // cosine consumer's zero-norm convention)
    val v1 = TextStats.hashedTfidfEmbed(ws, "doc_id", "text", 8)
      .filter(col("doc_id") === 1L).select("embedding")
      .as[Seq[Double]].head()
    assert(v1.size === 8 && v1.forall(_ == 0.0))
    // collisions sum: doc 2's 'a' (tf 2) and 'b' (tf 1) land in fixed
    // md5 buckets; total nonzero weight count is at most 2
    val v2 = TextStats.hashedTfidfEmbed(ws, "doc_id", "text", 8)
      .filter(col("doc_id") === 2L).select("embedding")
      .as[Seq[Double]].head()
    assert(v2.count(_ != 0.0) <= 2 && v2.exists(_ > 0.0))
  }

  test("clusterBalancedSample: quota larger than a cluster keeps every member once") {
    import graft.vector.Similarity
    val emb = (0L until 12L).map(i =>
        (i, if (i % 2 == 0) Seq(1.0f, 0.0f) else Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.clusterBalancedSample(emb, "vec_id", "embedding",
        2, 100)
      .as[(Long, Long, Long)].collect()
    assert(got.length === 12) // quota 100 > any cluster: nothing dropped
    assert(got.map(_._1).distinct.length === 12)
    // ranks are 1..size within each cluster
    got.groupBy(_._2).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toSeq === (1L to rs.size).toSeq)
    }
  }

  test("dsirLogWeights: disjoint-vocabulary target slice separates the corpus; null pred counts raw-only") {
    // target docs speak vocabulary A, the rest vocabulary B: every
    // A-doc's features are upweighted under p_tgt, so every A-doc must
    // outscore every B-doc (the DSIR separation the paper's Fig. 1
    // sanity-checks)
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", "tgt"),
      (2L, "beta gamma alpha gamma", "tgt"),
      (3L, "delta epsilon zeta delta", "raw"),
      (4L, "epsilon zeta delta zeta epsilon", "raw"),
      (5L, "zeta delta epsilon", null.asInstanceOf[String])
    ).toDF("doc_id", "text", "slice")
    val out = Curation.dsirLogWeights(docs, "doc_id", "text",
        col("slice") === "tgt", 64)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out.size === 5) // null-pred doc 5 still scores
    val tgtMin = Seq(1L, 2L).map(out).min
    val rawMax = Seq(3L, 4L, 5L).map(out).max
    assert(tgtMin > rawMax,
      s"target docs must outscore raw-only docs: $out")
    // n_feats = unigrams + bigrams: doc 1 has 5 tokens -> 5 + 4 = 9
    val nf = Curation.dsirLogWeights(docs, "doc_id", "text",
        col("slice") === "tgt", 64)
      .filter(col("doc_id") === 1L).select("n_feats").as[Long].head()
    assert(nf === 9L)
  }

  test("repetitionRules: dup lines, top bigram (tie→lexicographic), dup 5-grams, exact verdicts") {
    val docs = Seq(
      // one line, top bigram "aa bb" ×3 (of 5 bigrams), no dup 5-grams
      (1L, "aa bb aa bb aa bb"),
      // 5 lines: x×3, y×2 → 3 repeats beyond first, 3 repeat chars;
      // bigram tie "x y"=2 vs "y x"=2 → lexicographically smaller wins
      (2L, "x\ny\nx\ny\nx"),
      // single token: bigram/5-gram fall back to the whole doc
      (3L, "hello")
    ).toDF("doc_id", "text")
    val out = Curation.repetitionRules(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("total_chars") === 17L)
    assert(r1.getAs[Long]("n_lines") === 1L)
    assert(r1.getAs[Long]("dup_lines") === 0L)
    assert(r1.getAs[String]("top_bigram") === "aa bb")
    assert(r1.getAs[Long]("top_bigram_n") === 3L)
    assert(r1.getAs[Long]("top_bigram_chars") === 15L)
    assert(r1.getAs[Long]("dup_5gram_chars") === 0L)
    // 5*15 > 17 → top-bigram rule fails, everything else passes
    assert(!r1.getAs[Boolean]("top_bigram_ok"))
    assert(r1.getAs[Boolean]("dup_line_ok") &&
      r1.getAs[Boolean]("dup_line_char_ok") && r1.getAs[Boolean]("dup_5gram_ok"))
    assert(!r1.getAs[Boolean]("keep"))
    val r2 = out(1)
    assert(r2.getAs[Long]("n_lines") === 5L)
    assert(r2.getAs[Long]("dup_lines") === 3L)
    assert(r2.getAs[Long]("dup_line_chars") === 3L)
    assert(r2.getAs[String]("top_bigram") === "x y")
    assert(r2.getAs[Long]("top_bigram_n") === 2L)
    // 10*3 > 3*5 → dup-line rule fails
    assert(!r2.getAs[Boolean]("dup_line_ok") && !r2.getAs[Boolean]("keep"))
    val r3 = out(2)
    assert(r3.getAs[String]("top_bigram") === "hello")
    assert(r3.getAs[Long]("top_bigram_n") === 1L)
    assert(r3.getAs[Long]("top_bigram_chars") === 5L)
    // 5*5 > 5 chars → the fallback "bigram" is the whole doc, fails
    assert(!r3.getAs[Boolean]("top_bigram_ok"))
  }

  test("lmPerplexity: add-1 bigram LM on the target slice, OOV smoothing, <2-token docs drop") {
    def r12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Seq(
      (1L, "a b a", "en"),   // LM: "a b"×2 (with doc 2), "b a"×1
      (2L, "a b", "en"),
      (3L, "b c", "xx"),     // OOV bigram, known prefix b (c_p=1)
      (4L, "z", "xx")        // single token: no bigram event → drops
    ).toDF("doc_id", "text", "lang")
    val out = Curation.lmPerplexity(docs, "doc_id", "text",
        col("lang") === "en")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
    // V = |{a, b}| + 1 = 3; prefix counts: a→2, b→1
    val lnAB = r12(math.log(3.0 / 5.0))  // (2+1)/(2+3)
    val lnBA = r12(math.log(2.0 / 4.0))  // (1+1)/(1+3)
    val lnBC = r12(math.log(1.0 / 4.0))  // (0+1)/(1+3)
    assert(out(0) === ((1L, 2L, r6((-(lnAB + lnBA)).toDouble / 2))))
    assert(out(1) === ((2L, 1L, r6((-lnAB).toDouble / 1))))
    assert(out(2) === ((3L, 1L, r6((-lnBC).toDouble / 1))))
  }

  test("corpusLineDedup: canonical first survives, blanks always kept, clean reassembly") {
    val docs = Seq(
      (1L, "keep me\nDUP\nunique one"),
      (2L, "DUP\nother\n\nDUP"),   // DUP at (1,1),(2,0),(2,3) → keeper (1,1)
      (3L, "solo")
    ).toDF("doc_id", "text")
    val out = Curation.corpusLineDedup(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out(0) === ((1L, "keep me\nDUP\nunique one", 3L, 0L)))
    // both of doc 2's DUPs drop (keeper lives in doc 1); the blank stays
    assert(out(1) === ((2L, "other\n", 4L, 2L)))
    assert(out(2) === ((3L, "solo", 1L, 0L)))
  }

  test("bpeFertility: hand-checked totals, whole-word merges, null quotients on empty group") {
    val merges = Seq(("a", "b"), ("ab", "</w>"))
    val docs = Seq(
      ("s1", "ab ab xy"), // ab → [ab</w>] (whole); xy → [x,y,</w>]
      ("s1", ""),
      ("s2", "ba"),       // no rule applies: [b,a,</w>]
      ("s3", " ")         // zero words: quotients NULL
    ).toDF("source", "text")
    val out = Curation.bpeFertility(docs, "source", "text", merges)
      .orderBy("source")
      .as[(String, Long, Long, Long, Option[Double], Option[Double])]
      .collect()
    assert(out(0) === (("s1", 3L, 5L, 2L, Some(5.0 / 3), Some(2.0 / 3))))
    assert(out(1) === (("s2", 1L, 3L, 0L, Some(3.0), Some(0.0))))
    assert(out(2) === (("s3", 0L, 0L, 0L, None, None)))
  }

  test("gumbelTopK: matches the driver-side closed form; nulls drop; k caps at n") {
    val rows = Seq((1L, -2.5), (2L, 0.0), (3L, 3.25), (4L, -1.0))
    val df = rows.toDF("doc_id", "lw")
      .union(Seq((5L, null.asInstanceOf[java.lang.Double]))
        .toDF("doc_id", "lw"))
    val p = 1000000007L
    def key(id: Long, lw: Double) = {
      val u = (((id % p) * 2654435761L % p) + 1).toDouble / (p + 1)
      BigDecimal(lw - math.log(-math.log(u)))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = rows.map { case (id, lw) => (id, lw, key(id, lw)) }
      .sortBy { case (id, _, k) => (-k, id) }
      .zipWithIndex.map { case ((id, lw, k), i) => (id, lw, k, i + 1) }
    val out = Curation.gumbelTopK(df, "doc_id", col("lw"), 10)
      .as[(Long, Double, Double, Int)].collect()
    assert(out.toSeq === expect) // null row dropped, 4 rows though k=10
  }
}
