package graft

import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.InterleaveBits
import graft.engine.Layout

/** Custom Catalyst expressions: ArrayDot, InterleaveBits (Z-order), SQL
  * registration, and the Z-order clustering write path.
  */
class FunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("array_dot and zorder_key are callable from SQL after registration") {
    GraftColumn.registerFunctions(spark)
    val dot = spark.sql(
      "SELECT array_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))").as[Double].head()
    assert(dot === 11.0)
    val z = spark.sql("SELECT zorder_key(3, 0), zorder_key(0, 3)")
      .as[(Long, Long)].head()
    assert(z === ((5L, 10L))) // 0b11 spread to even bits = 0b101; odd = 0b1010
    val toks = spark.sql("SELECT tokens('Hello  spark world')")
      .as[Seq[String]].head()
    assert(toks === Seq("Hello", "spark", "world"))
  }

  test("LevenshteinPrefilter: banded rewrite is lossless, idempotent, leaves lower bounds alone") {
    import org.apache.spark.sql.GraftColumn
    import org.apache.spark.sql.functions.{col, levenshtein, lit}
    import graft.plans.LevenshteinPrefilter
    val pairs = Seq(
      ("kitten", "kitten"),   // 0
      ("kitten", "sitten"),   // 1
      ("kitten", "sitting"),  // 3
      ("abc", "xyz"),         // 3
      ("a", "abcdefg"),       // 6 — length gate alone kills it
      (null.asInstanceOf[String], "x")
    ).toDF("a", "b")
    def run(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      GraftColumn.ofRows(spark, plan).as[(String, String)].collect().toSet
    val orig = pairs.filter(levenshtein(col("a"), col("b")) <= lit(2))
    val analyzed = orig.queryExecution.analyzed
    val once = LevenshteinPrefilter(analyzed)
    // structure: the DP is banded and the length gate is in front
    val s = once.toString
    assert(s.contains("levenshtein(a") && s.contains("Some(2)"), s)
    assert(s.contains("abs("), s)
    // lossless on every distance class incl. the null row (dropped by both)
    assert(run(once) === orig.as[(String, String)].collect().toSet)
    assert(run(once) === Set(("kitten", "kitten"), ("kitten", "sitten")))
    // idempotent: a second optimizer pass finds nothing to rewrite
    assert(LevenshteinPrefilter(once) === once)
    // strict < maps to the k-1 band; lower bounds are not banded
    val strict = LevenshteinPrefilter(
      pairs.filter(levenshtein(col("a"), col("b")) < lit(2)).queryExecution.analyzed)
    assert(strict.toString.contains("Some(1)"), strict.toString)
    val lower = pairs.filter(levenshtein(col("a"), col("b")) >= lit(2))
      .queryExecution.analyzed
    assert(LevenshteinPrefilter(lower) === lower)
  }

  test("ewma_fold matches the interpreted HOF fold bit-for-bit at wide windows") {
    GraftColumn.registerFunctions(spark)
    // 500-element windows — far past the bounded-at-20 regime the HOF
    // version relied on; the native loop must agree bit-for-bit with
    // aggregate(slice(l,2,n-1), l[0], acc*(1-a)+a*x)
    val alpha = 0.25
    val rnd = new scala.util.Random(7)
    val arrs = Seq.tabulate(50)(i => (i.toLong,
      Seq.fill(1 + rnd.nextInt(500))(rnd.nextDouble() * 100 - 50)))
    val df = arrs.toDF("id", "l")
    val hof = df.select(col("id"),
        aggregate(slice(col("l"), lit(2), size(col("l")) - 1),
          get(col("l"), lit(0)),
          (acc, x) => acc * lit(1 - alpha) + lit(alpha) * x).as("e"))
      .as[(Long, Double)].collect().toMap
    val native = df.select(col("id"),
        expr(s"ewma_fold(l, ${alpha}D)").as("e"))
      .as[(Long, Double)].collect().toMap
    arrs.foreach { case (id, _) => assert(native(id) === hof(id), s"id=$id") }
    // empty frame → null (the when(size>0) guard the expression subsumes)
    assert(spark.sql(
      "SELECT ewma_fold(cast(array() as array<double>), 0.25D)").head().isNullAt(0))
    // float arrays widen per element like the HOF would
    val f = Seq((1L, Seq(1.0f, 2.0f))).toDF("id", "l")
      .select(expr("ewma_fold(l, 0.5D)")).as[Double].head()
    assert(f === (1.0 * 0.5 + 0.5 * 2.0))
  }

  test("cms_estimate agrees with the sketch library and never under-counts") {
    import org.apache.spark.util.sketch.CountMinSketch
    import graft.functions.CmsEstimate
    val items = Seq.fill(30)("hot") ++ Seq("cold", "warm", "warm")
    val cms = CountMinSketch.create(0.001, 0.99, 42)
    items.foreach(s => cms.addBinary(
      org.apache.spark.unsafe.types.UTF8String.fromString(s).getBytes))
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    val bytes = bos.toByteArray
    val df = Seq("hot", "warm", "cold", "absent").toDF("tok")
    val est = df.select(col("tok"), GraftColumn(CmsEstimate(
        GraftColumn.expr(col("tok")), bytes)).as("e"))
      .as[(String, Long)].collect().toMap
    // the codegen'd probe must agree with the library's own estimate...
    Seq("hot", "warm", "cold", "absent").foreach { s =>
      val direct = cms.estimateCount(
        org.apache.spark.unsafe.types.UTF8String.fromString(s).getBytes)
      assert(est(s) === direct, s)
    }
    // ...and a Count-Min estimate is always >= the true count
    assert(est("hot") >= 30 && est("warm") >= 2 && est("cold") >= 1 && est("absent") >= 0)
    // null input → null estimate (UnaryExpression null propagation)
    val n = Seq(Option.empty[String]).toDF("tok")
      .select(GraftColumn(CmsEstimate(GraftColumn.expr(col("tok")), bytes)))
      .head()
    assert(n.isNullAt(0))
    // and it must round-trip with what count_min_sketch(agg) produced:
    // same bytes per item in both passes
    val aggBytes = df.agg(count_min_sketch(col("tok"), lit(0.001), lit(0.99),
      lit(42)).as("c")).head().getAs[Array[Byte]]("c")
    val viaAgg = df.select(GraftColumn(CmsEstimate(
        GraftColumn.expr(col("tok")), aggBytes)).as("e"))
      .as[Long].collect()
    assert(viaAgg.forall(_ >= 1L)) // every probed item was added once
  }

  test("array_dot on float arrays matches the HOF formulation exactly") {
    val df = Seq((Seq(1.5f, -2.0f, 3.25f), Seq(0.5f, 4.0f, -1.0f))).toDF("a", "b")
    val native = df.select(graft.vector.Similarity.dot(col("a"), col("b"))).as[Double].head()
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)).as[Double].head()
    assert(native === hof)
  }

  test("interleave is the textbook Morton encoding") {
    assert(InterleaveBits.interleave(0, 0) === 0L)
    assert(InterleaveBits.interleave(1, 0) === 1L)
    assert(InterleaveBits.interleave(0, 1) === 2L)
    assert(InterleaveBits.interleave(0xFFFF, 0) === 0x55555555L)
    assert(InterleaveBits.interleave(0, 0xFFFF) === 0xAAAAAAAAL)
    // z-curve locality: nearby (x,y) cells share key prefixes
    assert(InterleaveBits.interleave(2, 2) === 12L) // after all of quadrant (0-1,0-1)
  }

  test("zOrderCluster preserves rows and sorts partitions by morton key") {
    val n = 1024
    val df = spark.range(n.toLong).select(
      (col("id") % 32).cast("int").as("x"),
      (col("id") / 32).cast("int").as("y"))
    val clustered = Layout.zOrderCluster(df, "x", "y", targetPartitions = 4)
    assert(clustered.count() === n)
    // within every output partition the recomputed z-key is non-decreasing
    val keyed = clustered.select(
      GraftColumn(InterleaveBits(
        GraftColumn.expr(((col("x").cast("double") / lit(31.0)) * 65535.0).cast("int")),
        GraftColumn.expr(((col("y").cast("double") / lit(31.0)) * 65535.0).cast("int")))).as("z"))
    val sortedWithin = keyed.as[Long].mapPartitions { it =>
      val v = it.toVector
      Iterator.single(v == v.sorted)
    }.collect()
    assert(sortedWithin.forall(identity))
  }

  test("hilbert index: bijection, unit-step adjacency (where Morton jumps), inverse round-trip") {
    import graft.functions.HilbertIndex
    val order = 5 // full 32×32 grid — exhaustive, not sampled
    val n = 1 << order
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x, y)
    val ds = cells.map { case (x, y) => HilbertIndex.xy2d(order, x, y) }
    // bijection: the keys are exactly 0 .. n²−1
    assert(ds.sorted === (0L until n.toLong * n).toVector.toSeq)
    // inverse round-trip
    cells.foreach { case (x, y) =>
      assert(HilbertIndex.d2xy(order, HilbertIndex.xy2d(order, x, y)) === ((x, y)))
    }
    // the defining locality property: consecutive keys are GRID-ADJACENT
    val byD = cells.zip(ds).sortBy(_._2).map(_._1)
    val steps = byD.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) }.toVector
    assert(steps.forall(_ === 1))
    // Morton on the same grid DOES jump across quadrant seams — the
    // comparison that motivates the Hilbert layout option
    val byZ = cells.sortBy { case (x, y) => InterleaveBits.interleave(x, y) }
    val zMax = byZ.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2) }.max
    assert(zMax > 1)
  }

  test("hilbertCluster preserves rows and yields tighter file bounding boxes than a lexicographic sort") {
    import graft.functions.HilbertIndex
    // uniform 64×64 grid of points, clustered into 16 files each way
    val n = 4096
    val df = spark.range(n.toLong).select(
      (col("id") % 64).cast("int").as("x"),
      (col("id") / 64).cast("int").as("y"))
    val hil = Layout.hilbertCluster(df, "x", "y", targetPartitions = 16)
    assert(hil.count() === n)
    // per-output-partition bounding-box LONGEST SIDE: a selective
    // predicate on either single column prunes a file iff the file's
    // extent in that column misses it, so the worst-dimension extent
    // is what min/max skipping pays for (areas tie here: lex boxes are
    // 4×64, hilbert ~16×16 — same area, very different pruning)
    def meanMaxDim(clustered: org.apache.spark.sql.DataFrame): Double = {
      val dims = clustered
        .withColumn("p", org.apache.spark.sql.functions.spark_partition_id())
        .groupBy("p")
        .agg((max(col("x")) - min(col("x")) + 1).as("w"),
          (max(col("y")) - min(col("y")) + 1).as("h"))
        .select(greatest(col("w"), col("h")).cast("double").as("m"))
        .as[Double].collect()
      dims.sum / dims.length
    }
    val lex = df.repartitionByRange(16, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y"))
    val hilDim = meanMaxDim(hil)
    val lexDim = meanMaxDim(lex)
    // lexicographic files span the whole y range (64); hilbert files
    // stay near-square (~16-24) — assert a 2× margin
    assert(hilDim * 2 <= lexDim,
      s"hilbert mean max-dim $hilDim not tighter than lexicographic $lexDim")
  }

  test("3-column morton interleave round-trips bit positions") {
    assert(InterleaveBits.interleave3(1, 0, 0) === 1L)
    assert(InterleaveBits.interleave3(0, 1, 0) === 2L)
    assert(InterleaveBits.interleave3(0, 0, 1) === 4L)
    assert(InterleaveBits.interleave3(0x1FFFFF, 0, 0) === 0x1249249249249249L)
    assert(InterleaveBits.interleave3(3, 3, 3) === 63L) // low two bits of all three
  }

  test("zOrderCluster3 handles mixed string/numeric columns and keeps rows") {
    val df = Seq(
      ("btc", 100.0, 10L), ("eth", 50.0, 5L), ("btc", 101.0, 11L),
      ("doge", 0.1, 1L), ("eth", 49.0, 4L))
      .toDF("symbol", "price", "cap")
    val out = Layout.zOrderCluster3(df, "symbol", "price", "cap", targetPartitions = 2)
    assert(out.count() === 5)
    assert(out.columns.toSeq === Seq("symbol", "price", "cap"))
  }

  test("salted join equals the plain join row-for-row") {
    val big = spark.range(1000).select(
      (col("id") % 3).as("k"), col("id").as("payload"))
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c"), (9L, "unmatched"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "payload", "name")
    val salted = graft.ops.Joins.saltedJoin(big, small, Seq("k"), salts = 8)
      .select("k", "payload", "name")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("running user totals accumulate across micro-batches (stateful stream)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Double)]
    val input = mem.toDF().toDF("user_id", "value")
    val q = graft.streaming.EventStream.runningUserTotals(spark, input)
      .writeStream.outputMode("update").format("memory")
      .queryName("running_totals").start()
    mem.addData((1L, 2.0), (1L, 3.0), (2L, 10.0))
    q.processAllAvailable()
    mem.addData((1L, 5.0))
    q.processAllAvailable()
    val rows = spark.table("running_totals")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    q.stop()
    // last emission for user 1 reflects all three events
    assert(rows.filter(_._1 == 1L).map(_._2).max === 3L)
    assert(rows.filter(_._1 == 1L).maxBy(_._2)._3 === 10.0)
    assert(rows.filter(_._1 == 2L).map(r => (r._2, r._3)).contains((1L, 10.0)))
  }
}
