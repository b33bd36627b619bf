package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Crash-injection battery for [[graft.engine.Layout.stagedReplace]] /
  * [[graft.engine.Layout.healStagedReplace]] — the round-12 verdict
  * item: the old delete-loop + rename-loop swap in compactFlat (and
  * the three sketch appends) could leave a LIVE table empty after a
  * crash, recoverable only by manual rescue from the staging dir.
  * The protocol under test: write staging → completion marker →
  * rename live→old → rename staging→live → move `_`-entries old→live
  * → delete old. Each test constructs one crash state by hand with
  * raw FS ops and proves the next call (or an explicit heal) restores
  * a complete, consistent table — and that NO state reads as an
  * empty-yet-present or mixed-file table.
  */
class StagedReplaceSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark
  import spark.implicits._

  private val Marker = "_graft_staged_complete"

  private def fs: FileSystem = FileSystem.get(
    new java.net.URI("file:///"), spark.sparkContext.hadoopConfiguration)

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_swap").toString + "/t"

  private def writeRows(path: String, from: Int, until: Int,
                        files: Int = 4): Unit =
    spark.range(from, until).select(col("id"))
      .repartition(files).write.mode("overwrite").parquet(path)

  private def ids(path: String): Set[Long] =
    spark.read.parquet(path).select(col("id"))
      .collect().map(_.getLong(0)).toSet

  /** Construct the post-staging state by hand: a COMPLETE staging dir
    * (data + marker) beside the live dir, without swapping.
    */
  private def stageComplete(live: String, from: Int, until: Int): String = {
    val stg = live + "_swap_staging"
    writeRows(stg, from, until)
    fs.create(new Path(stg, Marker), true).close()
    stg
  }

  test("happy path: stagedReplace swaps contents and carries _-entries") {
    val live = tmp()
    writeRows(live, 0, 100)
    graft.engine.Layout.logWrite(spark, live, "WRITE",
      Map("k" -> "v"), Map("num_rows" -> 100L))
    graft.engine.Layout.stagedReplace(spark, live) { stg =>
      writeRows(stg, 100, 150)
    }
    assert(ids(live) === (100L until 150L).toSet)
    // the manifest written against the OLD dir rode over the swap
    assert(fs.exists(new Path(live, "_graft_manifest")))
    assert(!fs.exists(new Path(live + "_swap_old")))
    assert(!fs.exists(new Path(live + "_swap_staging")))
  }

  test("crash before marker: live wins; only a writer heal discards staging") {
    val live = tmp()
    writeRows(live, 0, 50)
    writeRows(live + "_swap_staging", 50, 99) // NO completion marker
    // read-path heal: marker-less staging could be a concurrent
    // writer's staged write still materializing (ADVICE r12) — leave it
    graft.engine.Layout.healStagedReplace(spark, live)
    assert(ids(live) === (0L until 50L).toSet)
    assert(fs.exists(new Path(live + "_swap_staging")),
      "read-path heal discarded possibly-in-flight staging")
    // writer entry holds the single-writer role: the remnant is dead
    graft.engine.Layout.healStagedReplace(spark, live,
      discardMarkerless = true)
    assert(ids(live) === (0L until 50L).toSet)
    assert(!fs.exists(new Path(live + "_swap_staging")))
  }

  test("crash between the two renames: heal finishes the swap") {
    val live = tmp()
    writeRows(live, 0, 50)
    graft.engine.Layout.logWrite(spark, live, "WRITE",
      Map("k" -> "v"), Map("num_rows" -> 50L))
    stageComplete(live, 50, 99)
    // simulate: live→old rename happened, then the process died
    require(fs.rename(new Path(live), new Path(live + "_swap_old")))
    graft.engine.Layout.healStagedReplace(spark, live)
    assert(ids(live) === (50L until 99L).toSet)
    assert(fs.exists(new Path(live, "_graft_manifest")),
      "manifest must ride over a healed swap")
    assert(!fs.exists(new Path(live + "_swap_old")))
    assert(!fs.exists(new Path(live + "_swap_staging")))
  }

  test("crash after the second rename: heal moves _-entries and drops old") {
    val live = tmp()
    writeRows(live, 0, 50)
    graft.engine.Layout.logWrite(spark, live, "WRITE",
      Map("k" -> "v"), Map("num_rows" -> 50L))
    stageComplete(live, 50, 99)
    require(fs.rename(new Path(live), new Path(live + "_swap_old")))
    require(fs.rename(new Path(live + "_swap_staging"), new Path(live)))
    // died before the _-entry move + old delete
    graft.engine.Layout.healStagedReplace(spark, live)
    assert(ids(live) === (50L until 99L).toSet)
    assert(fs.exists(new Path(live, "_graft_manifest")))
    assert(!fs.exists(new Path(live + "_swap_old")))
  }

  test("snapshot carry-over: a file appended during the rewrite survives the swap") {
    // the lost-update window compactFlat had: files landing between the
    // rewrite's snapshot read and the swap were deleted with the old
    // dir — stagedReplaceSnapshot carries them over, exactly once
    val live = tmp()
    writeRows(live, 0, 50, files = 3)
    val staged = graft.engine.Layout.stagedReplaceSnapshot(spark, live) {
      (stg, files) =>
        assert(files.nonEmpty, "snapshot must list the entry-time files")
        spark.read.parquet(files: _*)
          .repartition(1).write.mode("overwrite").parquet(stg)
        // concurrent appender lands AFTER the snapshot listing
        spark.range(100, 110).select(col("id"))
          .coalesce(1).write.mode("append").parquet(live)
    }
    assert(staged.nonEmpty)
    assert(ids(live) === ((0L until 50L) ++ (100L until 110L)).toSet,
      "concurrent append lost or duplicated through the swap")
    assert(!fs.exists(new Path(live + "_swap_old")))
    // the returned staged paths read exactly the rewrite's own output
    assert(spark.read.parquet(staged: _*).count() === 50L)
  }

  test("snapshot carry-over: heal completes it after a post-swap crash") {
    val live = tmp()
    writeRows(live, 0, 50, files = 2)
    val snapNames = fs.listStatus(new Path(live))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName)
    // construct the crash state: swap done (live = staged content +
    // marker listing the snapshot), old still holds snapshot files AND
    // one concurrently appended file; the process died before finishSwap
    val old = live + "_swap_old"
    require(fs.rename(new Path(live), new Path(old)))
    spark.range(100, 110).select(col("id"))
      .coalesce(1).write.mode("append").parquet(old) // the concurrent file
    writeRows(live, 0, 50, files = 1) // the staged content, now live
    val out = fs.create(new Path(live, Marker), true)
    out.write(snapNames.mkString("\n").getBytes("UTF-8")); out.close()
    graft.engine.Layout.healStagedReplace(spark, live)
    assert(ids(live) === ((0L until 50L) ++ (100L until 110L)).toSet,
      "heal dropped the concurrent append (or duplicated the snapshot)")
    assert(!fs.exists(new Path(old)))
  }

  test("defensive: old present with no usable staging rolls BACK to old") {
    val live = tmp()
    writeRows(live, 0, 50)
    // a state the protocol cannot produce (live renamed away without a
    // complete staging) must still never lose the data
    require(fs.rename(new Path(live), new Path(live + "_swap_old")))
    graft.engine.Layout.healStagedReplace(spark, live)
    assert(ids(live) === (0L until 50L).toSet)
    assert(!fs.exists(new Path(live + "_swap_old")))
  }

  test("no protocol state reads as an empty-yet-present or mixed table") {
    // walk every crash state; at each, the live PATH either does not
    // exist (reader gets a retryable FileNotFound and heal completes
    // the swap) or reads EXACTLY the old or the new row set — never
    // empty, never a mix. This is the property the delete-loop swap
    // violated for its whole delete window.
    val oldRows = (0L until 50L).toSet
    val newRows = (50L until 99L).toSet
    def check(live: String): Unit =
      if (fs.exists(new Path(live))) {
        val got = ids(live)
        assert(got === oldRows || got === newRows,
          s"mixed/empty read: ${got.size} rows")
      }
    // state 1: staging mid-write (no marker)
    val s1 = tmp(); writeRows(s1, 0, 50); writeRows(s1 + "_swap_staging", 50, 99)
    check(s1)
    // state 2: staging complete, live intact
    val s2 = tmp(); writeRows(s2, 0, 50); stageComplete(s2, 50, 99)
    check(s2)
    // state 3: live renamed away (the µs window) — path missing is OK,
    // a read must throw, and heal restores the NEW data
    val s3 = tmp(); writeRows(s3, 0, 50); stageComplete(s3, 50, 99)
    require(fs.rename(new Path(s3), new Path(s3 + "_swap_old")))
    assert(!fs.exists(new Path(s3)))
    intercept[Exception] { spark.read.parquet(s3).collect() }
    graft.engine.Layout.healStagedReplace(spark, s3)
    assert(ids(s3) === newRows)
    // state 4: staging renamed in, old not yet deleted
    val s4 = tmp(); writeRows(s4, 0, 50); stageComplete(s4, 50, 99)
    require(fs.rename(new Path(s4), new Path(s4 + "_swap_old")))
    require(fs.rename(new Path(s4 + "_swap_staging"), new Path(s4)))
    check(s4)
    graft.engine.Layout.healStagedReplace(spark, s4)
    assert(ids(s4) === newRows)
  }

  test("compactFlat: crash-interrupted swap self-heals on the next call") {
    val live = tmp()
    writeRows(live, 0, 200, files = 12)
    // simulate a crash mid-compaction: a complete staging beside a
    // live dir renamed away (between the renames)
    val stg = live + "_swap_staging"
    spark.read.parquet(live).repartition(2)
      .write.mode("overwrite").parquet(stg)
    fs.create(new Path(stg, Marker), true).close()
    require(fs.rename(new Path(live), new Path(live + "_swap_old")))
    // the next maintenance call first heals, then compacts normally
    graft.engine.Layout.compactFlat(spark, live, targetFiles = 2)
    assert(ids(live) === (0L until 200L).toSet)
    assert(graft.engine.Layout.flatFileCount(spark, live) <= 2)
  }

  test("appendKmvSamples crash mid-swap: the read path heals on entry") {
    val docs = Seq(
      ("d1", "s1", "alpha beta gamma delta epsilon zeta"),
      ("d2", "s2", "beta gamma delta epsilon zeta eta"),
      ("d3", "s1", "one two three four five six"),
      ("d4", "s2", "two three four five six seven")
    ).toDF("doc_id", "source", "text")
    val root = java.nio.file.Files.createTempDirectory("graft_kmv_heal")
      .toString + "/kmv"
    graft.text.TextStats.buildKmvSamples(docs, "source", "text", n = 3,
      k = 8, root)
    val expected = graft.text.TextStats
      .kmvOverlapFromSamples(spark, root).collect().map(_.toString).sorted
    // simulate the worst crash: live samples renamed away, complete
    // staging holding identical content
    val live = s"$root/samples"
    spark.read.parquet(live).repartition(1)
      .write.mode("overwrite").parquet(live + "_swap_staging")
    fs.create(new Path(live + "_swap_staging", Marker), true).close()
    require(fs.rename(new Path(live), new Path(live + "_swap_old")))
    graft.engine.Caches.releaseAll() // drop the cached pre-crash relation
    val healed = graft.text.TextStats
      .kmvOverlapFromSamples(spark, root).collect().map(_.toString).sorted
    assert(healed === expected)
    assert(!fs.exists(new Path(live + "_swap_old")))
  }

  test("withWriterLease: mutual exclusion, release on exception, stale takeover, loud timeout") {
    import graft.engine.Layout
    val root = java.nio.file.Files.createTempDirectory("graft_wlease").toString + "/idx"
    // two threads contend: the critical sections must never overlap
    val active = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxActive = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 2).map { _ =>
      new Thread(() =>
        (0 until 3).foreach { _ =>
          Layout.withWriterLease(spark, root, waitMs = 30000L) {
            val n = active.incrementAndGet()
            maxActive.accumulateAndGet(n, Math.max(_, _))
            Thread.sleep(50)
            active.decrementAndGet()
          }
        })
    }
    threads.foreach(_.start()); threads.foreach(_.join(60000))
    assert(maxActive.get() === 1,
      s"two writers held the lease simultaneously (${maxActive.get()})")
    // the lease releases even when the body throws
    intercept[RuntimeException] {
      Layout.withWriterLease(spark, root) { throw new RuntimeException("boom") }
    }
    assert(!fs.exists(new Path(root, "_writer.lease")),
      "lease not released after a throwing body")
    // a STALE lease (dead holder: old mtime, no heartbeat) is claimed
    val lease = new Path(root, "_writer.lease")
    fs.create(lease, true).close()
    fs.setTimes(lease, System.currentTimeMillis() - 10 * 60 * 1000L, -1)
    var ran = false
    Layout.withWriterLease(spark, root, waitMs = 30000L) { ran = true }
    assert(ran, "stale lease was not taken over")
    // a FRESH lease blocks until the short wait budget expires — loudly
    fs.create(lease, true).close()
    try {
      val e = intercept[IllegalArgumentException] {
        Layout.withWriterLease(spark, root, waitMs = 500L) { () }
      }
      assert(e.getMessage.contains("could not acquire"), e.getMessage)
    } finally fs.delete(lease, false)
  }
}
