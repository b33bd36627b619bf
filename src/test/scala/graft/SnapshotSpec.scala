package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Snapshots

/** Snapshot-table semantics: versioned commit, isolation, time travel,
  * vacuum.
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

  test("writeVersioned is idempotent: a replayed version never double-commits") {
    val t = Files.createTempDirectory("graft_snap_once").toString + "/t"
    assert(Snapshots.writeVersioned(Seq((1, "a")).toDF("k", "v"), t, 1))
    // replay of the same version (e.g. a retried micro-batch): skipped
    assert(!Snapshots.writeVersioned(Seq((9, "dup")).toDF("k", "v"), t, 1))
    assert(Snapshots.readVersion(spark, t, 1).as[(Int, String)].collect().toSet
      === Set((1, "a")))
    // a crashed attempt (data dir present, no manifest) is discarded
    Seq((7, "stale")).toDF("k", "v").write.parquet(s"$t/data/v2")
    assert(Snapshots.writeVersioned(Seq((2, "b")).toDF("k", "v"), t, 2))
    assert(Snapshots.read(spark, t).as[(Int, String)].collect().toSet === Set((2, "b")))
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

  test("vacuum removes old versions and their data, keeping the newest") {
    val t = Files.createTempDirectory("graft_snap_vac").toString + "/t"
    (1 to 3).foreach(i => Snapshots.write(Seq((i, s"v$i")).toDF("k", "v"), t))
    assert(Snapshots.vacuum(spark, t, keepLast = 1) === Seq(1L, 2L))
    // latest survives; vacuumed versions are gone from history AND disk
    assert(Snapshots.read(spark, t).as[(Int, String)].collect().toSet === Set((3, "v3")))
    assert(Snapshots.history(spark, t).count() === 1)
    assert(!new java.io.File(s"$t/data/v1").exists())
    val e = intercept[IllegalArgumentException] {
      Snapshots.readVersion(spark, t, 1)
    }
    assert(e.getMessage.contains("vacuumed"))
    // keepLast must retain at least one snapshot
    intercept[IllegalArgumentException] {
      Snapshots.vacuum(spark, t, keepLast = 0)
    }
  }
}
