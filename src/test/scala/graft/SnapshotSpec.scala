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
