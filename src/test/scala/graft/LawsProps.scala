package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.ops.{Clean, Joins}

/** ScalaCheck laws for the core operators (SURVEY §5 plan item c): the
  * properties hold for ALL inputs, not just the curated fixtures — small
  * generated frames, one Spark job per evaluation.
  */
object LawsProps extends Properties("graft.laws") {
  lazy val spark = TestSession.spark
  import spark.implicits._

  // each evaluation runs a real Spark job — keep the sample count bounded
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val dedupRow = for {
    id <- Gen.choose(0, 4)
    ts <- Gen.choose(0L, 4L)
    ver <- Gen.choose(0L, 100L)
  } yield (id, ts, ver)

  property("dedupLatest: one row per key, carrying the max version") =
    forAll(Gen.nonEmptyListOf(dedupRow)) { rows =>
      val out = Clean.dedupLatest(rows.toDF("id", "ts", "ver"), Seq("id", "ts"), "ver")
        .as[(Int, Long, Long)].collect()
      val expect = rows.groupBy(r => (r._1, r._2)).map { case (k, g) => k -> g.map(_._3).max }
      out.length == expect.size &&
        out.forall { case (id, ts, ver) => expect((id, ts)) == ver }
    }

  property("saltedJoin: multiset-equal to the plain join for any salt count") =
    forAll(
      Gen.listOfN(30, Gen.zip(Gen.choose(0, 6), Gen.choose(0, 100))),
      Gen.listOfN(10, Gen.choose(0, 6)),
      Gen.choose(1, 5)) { (bigRows, smallKeys, salts) =>
      val big = bigRows.toDF("k", "v")
      val small = smallKeys.map(k => (k, s"n$k")).toDF("k", "name")
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("k", "v", "name").as[(Int, Int, String)].collect().sorted.toSeq
      canon(Joins.saltedJoin(big, small, Seq("k"), salts)) ==
        canon(big.join(small, Seq("k")))
    }

  property("asOfJoin: equals the per-row brute-force latest-right lookup") =
    forAll(
      Gen.listOfN(12, Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 12L))),
      Gen.listOfN(12, Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 12L), Gen.choose(0.0, 9.0)))) {
      (ls, rs) =>
        val left = ls.zipWithIndex.map { case ((u, ts), i) => (u, ts, i.toLong) }
        val right = rs.zipWithIndex.map { case ((u, ts, v), i) => (u, ts, v, i.toLong) }
        val got = Joins.asOfJoin(
          left.toDF("user_id", "ts", "lid"),
          right.toDF("user_id", "ts", "value", "rid"),
          Seq("user_id"), "ts", "ts", Seq(("value", "asof_value")),
          leftTiebreak = Some("lid"), rightTiebreak = Some("rid"))
          .select("lid", "asof_value")
          .as[(Long, Option[Double])].collect().toMap
        left.forall { case (u, lts, lid) =>
          val expect = right.filter(r => r._1 == u && r._2 <= lts)
            .sortBy(r => (r._2, r._4)).lastOption.map(_._3)
          got(lid) == expect
        }
    }

  property("enrich: partition_date == to_date(event ts), backfilled when null") =
    forAll(Gen.nonEmptyListOf(Gen.option(Gen.choose(0L, 200L * 86400)))) { secs =>
      val ing = java.sql.Timestamp.valueOf("2024-06-15 12:00:00")
      val rows = secs.map(_.map(s => new java.sql.Timestamp(s * 1000L)))
      val out = Clean.enrich(rows.toDF("last_updated"), "last_updated", Some(ing))
        .select("last_updated", "partition_date")
        .as[(java.sql.Timestamp, java.sql.Date)].collect()
      out.forall { case (ts, pd) =>
        ts != null && pd.toString == ts.toInstant.atZone(java.time.ZoneOffset.UTC)
          .toLocalDate.toString
      }
    }

  property("funnel: stage counts equal the brute-force progressive scan") =
    forAll(Gen.listOfN(30, Gen.zip(
      Gen.choose(0L, 5L), Gen.oneOf("view", "click", "purchase"), Gen.choose(0L, 50L)))) { evs =>
      evs.nonEmpty ==> {
        val df = evs.zipWithIndex
          .map { case ((u, t, s), i) => (u, t, new java.sql.Timestamp(s * 1000L + i)) }
          .toDF("user_id", "event_type", "ts")
        val got = graft.ops.Stats.funnel(df, "user_id", "event_type", "ts",
          Seq("view", "click", "purchase")).as[(String, Long)].collect().toMap
        // brute force: per user, earliest view, then earliest later click,
        // then earliest later purchase
        val byUser = evs.zipWithIndex.map { case ((u, t, s), i) => (u, t, s * 1000L + i) }
          .groupBy(_._1)
        def firstAfter(rows: Seq[(Long, String, Long)], t: String, after: Option[Long]) =
          rows.filter(r => r._2 == t && after.forall(r._3 > _)).map(_._3).minOption
        val stages = byUser.values.toSeq.map { rows =>
          val v = firstAfter(rows, "view", None)
          val c = v.flatMap(t => firstAfter(rows, "click", Some(t)))
          val p = c.flatMap(t => firstAfter(rows, "purchase", Some(t)))
          (v.isDefined, c.isDefined, p.isDefined)
        }
        got("view") == stages.count(_._1) &&
          got("click") == stages.count(_._2) &&
          got("purchase") == stages.count(_._3)
      }
    }

  property("mixtureSample: per-row copies follow floor(w) + stable fraction") =
    forAll(
      Gen.listOfN(20, Gen.choose(0L, 300L)),
      Gen.choose(0, 6), Gen.choose(0, 6)) { (ids, wa2, wb2) =>
      val (wa, wb) = (wa2 / 2.0, wb2 / 2.0) // weights on a 0.5 grid
      val rows = ids.distinct.map(i => (i, if (i % 2 == 0) "a" else "b"))
      val df = rows.toDF("doc_id", "source")
      val got = graft.text.Curation.mixtureSample(df, "doc_id", "source",
        Map("a" -> wa, "b" -> wb))
        .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
      def copies(id: Long, w: Double): Long =
        w.toLong + (if (id % 100 < math.rint((w - w.floor) * 100)) 1L else 0L)
      rows.forall { case (id, src) =>
        val c = copies(id, if (src == "a") wa else wb)
        got.getOrElse(id, 0L) == c
      }
    }

  property("tokenChunks: chunks tile the token stream with exact overlap") =
    forAll(Gen.choose(1, 40), Gen.choose(1, 8), Gen.choose(1, 8)) { (n, size0, stride0) =>
      val stride = math.min(stride0, size0)
      val toks = (1 to n).map(i => s"t$i")
      val got = graft.text.Curation.tokenChunks(
        Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"), "doc_id", "text",
        size0, stride)
        .orderBy("chunk_idx")
        .select("chunk_text").as[String].collect().map(_.split(" ").toSeq)
      val expect = (0 until n by stride).map(s => toks.slice(s, s + size0))
      got.toSeq == expect
    }

  property("cohortRetention: equals the brute-force per-user offset count") =
    forAll(Gen.listOfN(20, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 12L)))) { evs =>
      evs.nonEmpty ==> {
        val rows = evs.map { case (u, day) =>
          (u, java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 10:00:00")) }
        val got = graft.ops.Stats.cohortRetention(
          rows.toDF("user_id", "ts"), "user_id", "ts", 7)
          .as[(java.sql.Date, Long, Long)].collect()
          .map(r => (r._1.toString, r._2) -> r._3).toMap
        val firstDay = evs.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).min }
        val expect = evs.map { case (u, day) => (u, firstDay(u), day - firstDay(u)) }
          .filter(_._3 <= 7).distinct
          .groupBy { case (_, f, off) => (f"2024-01-${f + 1}%02d", off) }
          .map { case (k, g) => k -> g.map(_._1).distinct.size.toLong }
        got == expect
      }
    }

  property("connectedComponents: equals driver-side union-find on any graph") =
    forAll(Gen.listOfN(25, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))) { es =>
      val edges = es.filter { case (a, b) => a != b }
      edges.isEmpty || {
        // reference: textbook union-find with path compression
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expect = edges.flatMap(e => Seq(e._1, e._2)).distinct
          .map(n => n -> find(n)).toMap
        // min-id canonical labels: re-root each class at its minimum
        val minOf = expect.groupBy(_._2).map { case (r, m) => r -> m.keys.min }
        val got = graft.text.Clusters.connectedComponents(
          edges.toDF("src", "dst"), "src", "dst")
          .as[(Long, Long)].collect().toMap
        got == expect.map { case (n, r) => n -> minOf(r) }
      }
    }
}
