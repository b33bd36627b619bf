package org.apache.spark.sql

/** Bridge into the `sql` package for checkpointing with a RELEASE
  * HANDLE. `Dataset.localCheckpoint` persists the materialized rows as
  * RDD blocks but hands back no way to free them — `catalog.clearCache()`
  * only drops SQL-cache entries, so checkpoint blocks from an iterative
  * walk accumulate until the ContextCleaner happens to GC them (round-8
  * verdict: the q162 in-session degradation). This helper replicates the
  * classic `Dataset.localCheckpoint` recipe (execute → row-copy →
  * `RDD.localCheckpoint`) while keeping the underlying RDD, so the owner
  * can `unpersist` its blocks the moment no downstream plan needs them.
  *
  * DANGER contract: a local checkpoint TRUNCATES lineage once
  * materialized — after `release()` the returned frame is dead (an
  * action on it throws), unlike releasing a `persist()` which merely
  * recomputes. Callers release only when every dependent is itself
  * materialized or abandoned.
  */
object GraftCheckpoint {

  // Releasing a materialized local checkpoint makes RDD.unpersist log
  // "lineage has been truncated and cannot be recomputed" at WARN —
  // here that is the DESIGNED release of a provably-dead frame (old CC
  // rounds, scoped operator results), and hundreds of them drown real
  // warnings in Verify/Bench output. Suppression is TIME-BOXED to the
  // release window (set ERROR around the unpersist, restore after) but
  // still PROCESS-GLOBAL while active — a logger level cannot be
  // thread-scoped, so a genuine warning another thread routes through
  // MapPartitionsRDD during someone else's release window is still
  // swallowed; the improvement over the previous permanently-global
  // design is that the window is the few ms of the unpersist call, not
  // the process lifetime. Depth-counted so nested /
  // concurrent releases restore only when the last one exits.
  private val rddLoggerName = "org.apache.spark.rdd.MapPartitionsRDD"
  private val suppressLock = new Object
  private var suppressDepth = 0
  private var savedLevel: org.apache.logging.log4j.Level = null

  private def quietRelease(body: => Unit): Unit = {
    suppressLock.synchronized {
      if (suppressDepth == 0) {
        savedLevel = org.apache.logging.log4j.LogManager
          .getLogger(rddLoggerName).getLevel
        org.apache.logging.log4j.core.config.Configurator.setLevel(
          rddLoggerName, org.apache.logging.log4j.Level.ERROR)
      }
      suppressDepth += 1
    }
    try body
    finally suppressLock.synchronized {
      suppressDepth -= 1
      if (suppressDepth == 0)
        org.apache.logging.log4j.core.config.Configurator.setLevel(
          rddLoggerName, savedLevel)
    }
  }

  /** Local-checkpoint `df`; returns the checkpointed frame plus a
    * release thunk that frees its blocks. `eager` materializes now
    * (one job); lazy defers to the first action, as
    * `Dataset.localCheckpoint(false)` does.
    */
  def withHandle(df: DataFrame, eager: Boolean): (DataFrame, () => Unit) = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    val rdd = df.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    if (eager) rdd.count()
    val out = spark.internalCreateDataFrame(rdd, df.schema)
    (out, () => quietRelease { rdd.unpersist(blocking = false); () })
  }
}
