package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Snapshots

/** Snapshot-table semantics: versioned commit, isolation, idempotence,
  * time travel, vacuum + orphan reaping.
  */
class SnapshotSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  test("write/read round-trips the latest version; time travel reaches older ones") {
    val t = Files.createTempDirectory("graft_snap").toString + "/t"
    val v1 = Snapshots.write(Seq((1, "a"), (2, "b")).toDF("k", "v"), t)
    val v2 = Snapshots.write(Seq((3, "c")).toDF("k", "v"), t)
    assert((v1, v2) === ((1L, 2L)))
    assert(Snapshots.read(spark, t).as[(Int, String)].collect().toSet === Set((3, "c")))
    assert(Snapshots.readVersion(spark, t, 1).as[(Int, String)].collect().toSet
      === Set((1, "a"), (2, "b")))
    val hist = Snapshots.history(spark, t).select("version").as[Long].collect().toSeq
    assert(hist === Seq(2L, 1L))
    // exact per-version write metrics in every manifest: v1 wrote 2 rows,
    // v2 wrote 1, each with >=1 file and >0 bytes
    val metrics = Snapshots.history(spark, t)
      .select("version", "num_files", "num_bytes", "num_rows")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(metrics(1L)._4 === 2L && metrics(2L)._4 === 1L, metrics)
    assert(metrics.values.forall(m => m._2 >= 1L && m._3 > 0L), metrics)
  }

  test("timestamp time travel resolves to the max version at or before the instant") {
    val t = Files.createTempDirectory("graft_snap_ts").toString + "/t"
    Snapshots.write(Seq((1, "a")).toDF("k", "v"), t)
    Thread.sleep(15) // commit timestamps are millis: force v1.ts < v2.ts
    Snapshots.write(Seq((2, "b")).toDF("k", "v"), t)
    val ts = Snapshots.commits(spark, t).map(c => c.version -> c.committedAt).toMap
    assert(ts(1L) < ts(2L))
    // exactly at a commit → that commit; between commits → the earlier
    // one; after the last → the latest; Delta's timestampAsOf rule
    assert(Snapshots.versionAt(spark, t, ts(1L)) === 1L)
    assert(Snapshots.versionAt(spark, t, ts(2L) - 1) === 1L)
    assert(Snapshots.versionAt(spark, t, ts(2L)) === 2L)
    assert(Snapshots.versionAt(spark, t, ts(2L) + 3600000L) === 2L)
    assert(Snapshots.readTimestamp(spark, t, ts(1L))
      .as[(Int, String)].collect().toSet === Set((1, "a")))
    assert(Snapshots.readTimestamp(spark, t,
        new java.sql.Timestamp(ts(2L)))
      .as[(Int, String)].collect().toSet === Set((2, "b")))
    // an instant before anything existed refuses (not an empty table)
    intercept[IllegalArgumentException] {
      Snapshots.readTimestamp(spark, t, ts(1L) - 1)
    }
    // changeFeed with wall-clock endpoints = changeFeed of the resolved
    // versions: (1,"a") deleted, (2,"b") inserted between the instants
    val feed = Snapshots.changeFeedByTime(spark, t, ts(1L), ts(2L), Seq("k"))
      .select("k", "change_type").as[(Int, String)].collect().toSet
    assert(feed === Set((1, "delete"), (2, "insert")))
  }

  test("timestamp resolution refuses when a corrupt manifest could change the answer") {
    val t = Files.createTempDirectory("graft_snap_ts_corrupt").toString + "/t"
    Snapshots.write(Seq((1, "a")).toDF("k", "v"), t)
    Thread.sleep(15)
    Snapshots.write(Seq((2, "b")).toDF("k", "v"), t)
    val ts = Snapshots.commits(spark, t).map(c => c.version -> c.committedAt).toMap
    // corrupt v2: its commit instant is now unknown
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$t/_snapshots/v2.json"),
      "garbage".getBytes("UTF-8"))
    // at/after v1's instant the corrupt v2 COULD have been live → loud
    val e = intercept[IllegalStateException] {
      Snapshots.versionAt(spark, t, ts(2L) + 1000L)
    }
    assert(e.getMessage.contains("v") && e.getMessage.contains("corrupt"), e.getMessage)
    intercept[IllegalStateException] { Snapshots.versionAt(spark, t, ts(1L)) }
    // corrupt versions BELOW the resolved one cannot change a
    // max-at-or-before answer: corrupt v1 instead, v2 still resolves
    val t2 = Files.createTempDirectory("graft_snap_ts_corrupt2").toString + "/t"
    Snapshots.write(Seq((1, "a")).toDF("k", "v"), t2)
    Thread.sleep(15)
    Snapshots.write(Seq((2, "b")).toDF("k", "v"), t2)
    val ts2 = Snapshots.commits(spark, t2).map(c => c.version -> c.committedAt).toMap
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$t2/_snapshots/v1.json"),
      "garbage".getBytes("UTF-8"))
    assert(Snapshots.versionAt(spark, t2, ts2(2L)) === 2L)
  }

  test("changeFeed between real versions replays onto v1 to reproduce v2 exactly") {
    val t = Files.createTempDirectory("graft_snap_cdc").toString + "/t"
    val before = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0))
      .toDF("k", "name", "bal")
    // v2: key 2 updated, key 3 deleted, key 4 inserted, key 1 untouched
    val after = Seq((1, "a", 10.0), (2, "b", 25.0), (4, "d", 40.0))
      .toDF("k", "name", "bal")
    Snapshots.writeVersioned(before, t, 1L)
    Snapshots.writeVersioned(after, t, 2L)
    val feed = Snapshots.changeFeed(spark, t, 1L, 2L, Seq("k"))
    val types = feed.select("k", "change_type").as[(Int, String)].collect().toMap
    assert(types === Map(2 -> "update", 3 -> "delete", 4 -> "insert")) // 1 unchanged → absent
    // the CDC inverse law, across an actual commit: apply(v1, feed) == v2
    val replayed = graft.engine.Upsert.applyChanges(
        Snapshots.readVersion(spark, t, 1L), feed, Seq("k"))
      .as[(Int, String, Double)].collect().toSet
    assert(replayed ===
      Snapshots.readVersion(spark, t, 2L).as[(Int, String, Double)].collect().toSet)
  }

  test("a reader pinned before a new commit still sees its own version") {
    val t = Files.createTempDirectory("graft_snap_iso").toString + "/t"
    Snapshots.write(Seq((1, "old")).toDF("k", "v"), t)
    val pinned = Snapshots.read(spark, t) // resolves the manifest NOW
    Snapshots.write(Seq((2, "new")).toDF("k", "v"), t)
    // the pinned scan still reads v1's immutable directory
    assert(pinned.as[(Int, String)].collect().toSet === Set((1, "old")))
    assert(Snapshots.read(spark, t).as[(Int, String)].collect().toSet === Set((2, "new")))
  }

  test("writeVersioned: same-tag replay skips, foreign-tag collision throws") {
    val t = Files.createTempDirectory("graft_snap_once").toString + "/t"
    assert(Snapshots.writeVersioned(Seq((1, "a")).toDF("k", "v"), t, 1,
      tag = Some("batch-0")))
    // replay of the same version by the same writer: skipped, data intact
    assert(!Snapshots.writeVersioned(Seq((9, "dup")).toDF("k", "v"), t, 1,
      tag = Some("batch-0")))
    assert(Snapshots.readVersion(spark, t, 1).as[(Int, String)].collect().toSet
      === Set((1, "a")))
    // a DIFFERENT writer colliding on the version must fail loudly, not
    // silently drop its data
    val e = intercept[IllegalStateException] {
      Snapshots.writeVersioned(Seq((8, "x")).toDF("k", "v"), t, 1,
        tag = Some("batch-99"))
    }
    assert(e.getMessage.contains("already committed"))
  }

  test("streaming snapshot sink commits one version per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = Files.createTempDirectory("graft_snap_stream").toString
    val mem = MemoryStream[(Long, Double)]
    val q = graft.streaming.EventStream.sinkSnapshots(
      mem.toDF().toDF("id", "value"), s"$t/table", s"$t/chk")
    mem.addData((1L, 1.0), (2L, 2.0))
    q.processAllAvailable()
    mem.addData((3L, 3.0))
    q.processAllAvailable()
    q.stop()
    assert(Snapshots.history(spark, s"$t/table").count() === 2)
    assert(Snapshots.read(spark, s"$t/table")
      .as[(Long, Double)].collect().toSet === Set((3L, 3.0)))
    assert(Snapshots.readVersion(spark, s"$t/table", 1)
      .as[(Long, Double)].collect().toSet === Set((1L, 1.0), (2L, 2.0)))
  }

  test("streaming rollup sink maintains the aggregate incrementally across restart") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val t = Files.createTempDirectory("graft_rollup").toString
    def start(mem: MemoryStream[(String, Long)]) =
      graft.streaming.EventStream.sinkRollup(
        mem.toDF().toDF("grp", "v"), s"$t/rollup", s"$t/chk",
        Seq("grp"), Seq("total" -> col("v")))
    val mem = MemoryStream[(String, Long)]
    val q1 = start(mem)
    mem.addData(("a", 1L), ("b", 10L))
    q1.processAllAvailable()
    mem.addData(("a", 2L), ("c", 100L))
    q1.processAllAvailable()
    q1.stop()
    // restart against the same checkpoint: batch counter continues
    val q2 = start(mem)
    mem.addData(("b", 20L), ("a", 4L))
    q2.processAllAvailable()
    q2.stop()
    // one committed version per batch, each a valid intermediate rollup
    assert(Snapshots.history(spark, s"$t/rollup").count() === 3)
    assert(Snapshots.readVersion(spark, s"$t/rollup", 1)
      .as[(String, Long, Long)].collect().toSet ===
      Set(("a", 1L, 1L), ("b", 1L, 10L)))
    // final state == a direct aggregate of everything ever streamed
    assert(Snapshots.read(spark, s"$t/rollup")
      .as[(String, Long, Long)].collect().toSet ===
      Set(("a", 3L, 7L), ("b", 2L, 30L), ("c", 1L, 100L)))
  }

  test("streaming distinct rollup merges HLL sketches across batches and restart") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions.col
    val t = Files.createTempDirectory("graft_distinct").toString
    def start(mem: MemoryStream[(String, Long)]) =
      graft.streaming.EventStream.sinkDistinctRollup(
        mem.toDF().toDF("grp", "user"), s"$t/rollup", s"$t/chk",
        Seq("grp"), col("user"))
    val mem = MemoryStream[(String, Long)]
    val q1 = start(mem)
    mem.addData(("a", 1L), ("a", 2L), ("b", 9L))
    q1.processAllAvailable()
    q1.stop()
    val q2 = start(mem) // restart: batch counter and sketches continue
    mem.addData(("a", 2L), ("a", 3L), ("b", 9L)) // user 2 and 9 repeat
    q2.processAllAvailable()
    q2.stop()
    val got = graft.engine.Incremental.sketchEstimates(
        Snapshots.read(spark, s"$t/rollup"), Seq("grp"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // n counts all rows ever; the sketch counts distinct users ever
    assert(got === Map("a" -> ((4L, 3L)), "b" -> ((2L, 1L))))
    assert(Snapshots.history(spark, s"$t/rollup").count() === 2)
  }

  test("deleteWhere commits a new version; time travel still reads the pre-delete rows") {
    import org.apache.spark.sql.functions.col
    val t = Files.createTempDirectory("graft_delete").toString + "/tbl"
    Snapshots.writeVersioned(
      Seq((1L, "keep"), (2L, "purge"), (3L, "keep"), (4L, "purge"))
        .toDF("id", "tag"), t, 1)
    val (deleted, v) = Snapshots.deleteWhere(spark, t, col("tag") === "purge")
    assert(deleted === 2L && v === 2L)
    assert(Snapshots.read(spark, t).as[(Long, String)].collect().toSet ===
      Set((1L, "keep"), (3L, "keep")))
    // audit trail: the pre-delete state stays readable until vacuum
    assert(Snapshots.readVersion(spark, t, 1).count() === 4)
    // null predicate rows are kept, not deleted
    val t2 = Files.createTempDirectory("graft_delete2").toString + "/tbl"
    Snapshots.writeVersioned(
      Seq((1L, Some(5.0)), (2L, None), (3L, Some(1.0))).toDF("id", "v"), t2, 1)
    val (d2, _) = Snapshots.deleteWhere(spark, t2, col("v") > 2.0)
    assert(d2 === 1L)
    assert(Snapshots.read(spark, t2).select("id").as[Long].collect().toSet
      === Set(2L, 3L))
  }

  test("updateWhere rewrites matching rows only; restore rolls back as a new commit") {
    import org.apache.spark.sql.functions.{col, lit}
    val t = Files.createTempDirectory("graft_update").toString + "/tbl"
    Snapshots.writeVersioned(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, Option.empty[String].orNull, 30.0))
        .toDF("id", "tag", "v"), t, 1)
    // null-predicate row (tag null) passes through untouched
    val (n, v2) = Snapshots.updateWhere(spark, t, col("tag") === "b",
      Map("v" -> (col("v") * 2), "tag" -> lit("B")))
    assert(n === 1L && v2 === 2L)
    assert(Snapshots.read(spark, t).as[(Long, Option[String], Double)]
      .collect().toSet === Set((1L, Some("a"), 10.0), (2L, Some("B"), 40.0),
        (3L, None, 30.0)))
    intercept[IllegalArgumentException] {
      Snapshots.updateWhere(spark, t, col("tag") === "a",
        Map("nope" -> lit(1)))
    }
    // pre-update semantics: assignments see the ORIGINAL row, so a
    // self-referential pair swaps (and listing tag before v — the order
    // that breaks a sequential withColumn rewrite — changes nothing)
    val ts = Files.createTempDirectory("graft_swap").toString + "/tbl"
    Snapshots.writeVersioned(Seq(("b", 7.0)).toDF("tag", "v"), ts, 1)
    Snapshots.updateWhere(spark, ts, col("tag") === "b",
      Map("tag" -> lit("B"), "v" -> (col("v") * 2)))
    assert(Snapshots.read(spark, ts).as[(String, Double)].collect().toSeq
      === Seq(("B", 14.0)))
    // restore: version 1's rows come back as version 3; v2 stays auditable
    val v3 = Snapshots.restore(spark, t, 1L)
    assert(v3 === 3L)
    assert(Snapshots.read(spark, t).as[(Long, Option[String], Double)]
      .collect().toSet === Set((1L, Some("a"), 10.0), (2L, Some("b"), 20.0),
        (3L, None, 30.0)))
    assert(Snapshots.readVersion(spark, t, 2)
      .filter(col("tag") === "B").count() === 1)
    intercept[IllegalArgumentException] { Snapshots.restore(spark, t, 99L) }
  }

  test("updateWhere casts assignments to the column's type — UPDATE never evolves schema") {
    import org.apache.spark.sql.functions.{col, lit}
    import org.apache.spark.sql.types.DecimalType
    val t = Files.createTempDirectory("graft_updtype").toString + "/tbl"
    Snapshots.writeVersioned(
      Seq((1L, BigDecimal("10.500000")), (2L, BigDecimal("20.000000")))
        .toDF("id", "v").select(col("id"), col("v").cast(DecimalType(18, 6)).as("v")),
      t, 1)
    val before = Snapshots.read(spark, t).schema
    // an int-literal assignment and a wider-decimal expression both land
    // as the column's own DECIMAL(18,6) — Delta UPDATE semantics; without
    // the cast this version would carry an INT column and the changeFeed
    // below would refuse on schema drift
    Snapshots.updateWhere(spark, t, col("id") === 1L, Map("v" -> lit(3)))
    Snapshots.updateWhere(spark, t, col("id") === 2L,
      Map("v" -> (col("v") * lit(BigDecimal("1.5")))))
    assert(Snapshots.read(spark, t).schema === before)
    val feed = Snapshots.changeFeed(spark, t, 1L, 3L, Seq("id"))
    assert(feed.filter(col("change_type") === "update").count() === 2L)
    assert(Snapshots.read(spark, t).as[(Long, BigDecimal)].collect().toSet
      === Set((1L, BigDecimal("3.000000")), (2L, BigDecimal("30.000000"))))
  }

  test("schema evolution: each version reads with its own schema; cross-schema diff fails loudly") {
    import org.apache.spark.sql.functions.{col, lit}
    val t = Files.createTempDirectory("graft_schema").toString + "/tbl"
    Snapshots.writeVersioned(Seq((1L, "x")).toDF("id", "tag"), t, 1)
    // v2 adds a column: the full-copy store makes evolution trivial —
    // every version is self-contained, time travel sees the old shape
    Snapshots.writeVersioned(
      Seq((1L, "x", 0.5)).toDF("id", "tag", "score"), t, 2)
    assert(Snapshots.readVersion(spark, t, 1).columns.toSeq === Seq("id", "tag"))
    assert(Snapshots.read(spark, t).columns.toSeq === Seq("id", "tag", "score"))
    // a change feed across differently-shaped versions must refuse,
    // not fabricate nulls for the missing column
    val e = intercept[IllegalArgumentException] {
      Snapshots.changeFeed(spark, t, 1L, 2L, Seq("id"))
    }
    assert(e.getMessage.contains("schemas differ"), e.getMessage)
    // updateWhere on the evolved shape touches the new column fine
    val (n, _) = Snapshots.updateWhere(spark, t, col("id") === 1L,
      Map("score" -> lit(0.9)))
    assert(n === 1L)
  }

  test("app-id marker: non-empty survives untouched, empty is repaired, id is stable") {
    import graft.streaming.EventStream
    val cp = Files.createTempDirectory("graft_appid").toString
    // a committed marker is immutable — adopted verbatim, never replaced
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(cp, "_graft_app_id"), "app-committed")
    assert(EventStream.ensureAppId(spark, cp) === "app-committed")
    assert(EventStream.ensureAppId(spark, cp) === "app-committed")
    // an empty marker (crash leftover) is repaired to a fresh stable id
    val cp2 = Files.createTempDirectory("graft_appid2").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(cp2, "_graft_app_id"), "")
    val id = EventStream.ensureAppId(spark, cp2)
    assert(id.startsWith("app-") && id.length > 4)
    assert(EventStream.ensureAppId(spark, cp2) === id)
  }

  test("snapshot sink restart resumes from the checkpoint without duplicate versions") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val t = Files.createTempDirectory("graft_snap_restart").toString
    val mem = MemoryStream[(Long, Double)]
    val q1 = graft.streaming.EventStream.sinkSnapshots(
      mem.toDF().toDF("id", "value"), s"$t/table", s"$t/chk")
    mem.addData((1L, 1.0))
    q1.processAllAvailable()
    q1.stop()
    // restart against the SAME checkpoint: the batch counter continues,
    // so new data becomes version 2 — never a re-commit of version 1
    val q2 = graft.streaming.EventStream.sinkSnapshots(
      mem.toDF().toDF("id", "value"), s"$t/table", s"$t/chk")
    mem.addData((2L, 2.0))
    q2.processAllAvailable()
    q2.stop()
    assert(Snapshots.history(spark, s"$t/table")
      .select("version").as[Long].collect().toSeq === Seq(2L, 1L))
    assert(Snapshots.readVersion(spark, s"$t/table", 1)
      .as[(Long, Double)].collect().toSet === Set((1L, 1.0)))
    assert(Snapshots.readVersion(spark, s"$t/table", 2)
      .as[(Long, Double)].collect().toSet === Set((2L, 2.0)))
  }

  test("a corrupt manifest blocks its own version loudly but not new writes") {
    val t = Files.createTempDirectory("graft_snap_corrupt").toString + "/t"
    Snapshots.write(Seq((1, "a")).toDF("k", "v"), t)
    // simulate external corruption of a manifest
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$t/_snapshots/v2.json"),
      "garbage".getBytes("UTF-8"))
    // new writes skip past the occupied-but-corrupt version number
    assert(Snapshots.write(Seq((3, "c")).toDF("k", "v"), t) === 3L)
    assert(Snapshots.read(spark, t).as[(Int, String)].collect().toSet === Set((3, "c")))
    // reading the corrupt version itself is a loud, specific error
    val e = intercept[IllegalStateException] { Snapshots.readVersion(spark, t, 2) }
    assert(e.getMessage.contains("corrupt"))
    // tags that would not survive the manifest round-trip are rejected
    intercept[IllegalArgumentException] {
      Snapshots.writeVersioned(Seq((4, "d")).toDF("k", "v"), t, 9,
        tag = Some("""bad"quote"""))
    }
  }

  test("vacuum removes old versions, reaps orphans, keeps the newest") {
    val t = Files.createTempDirectory("graft_snap_vac").toString + "/t"
    (1 to 3).foreach(i => Snapshots.write(Seq((i, s"v$i")).toDF("k", "v"), t))
    // crash orphan: a data dir that never got a manifest
    Seq((0, "orphan")).toDF("k", "v").write.parquet(s"$t/data/v9-deadbeef")
    assert(Snapshots.vacuum(spark, t, keepLast = 1, orphanAgeMs = 0L)
      === Seq(1L, 2L))
    // latest survives; vacuumed versions and the orphan are gone
    assert(Snapshots.read(spark, t).as[(Int, String)].collect().toSet === Set((3, "v3")))
    assert(Snapshots.history(spark, t).count() === 1)
    assert(!new java.io.File(s"$t/data/v9-deadbeef").exists())
    assert(new java.io.File(s"$t/data").listFiles().count(_.isDirectory) === 1)
    val e = intercept[IllegalArgumentException] {
      Snapshots.readVersion(spark, t, 1)
    }
    assert(e.getMessage.contains("vacuumed"))
    // retention: a young version inside minAgeMs is NOT reaped
    Snapshots.write(Seq((4, "v4")).toDF("k", "v"), t)
    assert(Snapshots.vacuum(spark, t, keepLast = 1, minAgeMs = 3600000L) === Seq.empty)
    assert(Snapshots.readVersion(spark, t, 3).count() === 1)
    // keepLast must retain at least one snapshot
    intercept[IllegalArgumentException] {
      Snapshots.vacuum(spark, t, keepLast = 0)
    }
  }
}
