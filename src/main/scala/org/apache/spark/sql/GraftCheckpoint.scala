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
  // warnings in Verify/Bench output. Silence exactly that logger; every
  // other RDD warning still surfaces.
  org.apache.logging.log4j.core.config.Configurator.setLevel(
    "org.apache.spark.rdd.MapPartitionsRDD",
    org.apache.logging.log4j.Level.ERROR)

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
    (out, () => { rdd.unpersist(blocking = false); () })
  }
}
