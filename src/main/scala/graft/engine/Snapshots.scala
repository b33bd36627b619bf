package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-pinned snapshot tables: versioned writes with atomic
  * commit, snapshot-isolated reads, time travel, and VACUUM — the
  * storage semantics the reference gets from Delta
  * (src/utils/view_delta_history.py:44-75,
  * src/maintenance/delta_vacuum.py:27-45), rebuilt on plain parquet.
  *
  * Layout: `path/data/v<N>/` holds version N's immutable files;
  * `path/_snapshots/v<N>.json` is the commit record. A version is
  * visible iff its manifest exists, and the manifest is the LAST thing
  * written (tmp file + rename, which HDFS-compatible filesystems apply
  * atomically and refuse when the destination exists — so two racing
  * writers of the same version cannot both commit). Readers resolve the
  * manifest once and then scan a directory no writer will ever mutate:
  * a reader concurrent with any number of writes sees exactly one
  * version — the isolation plain overwrite-in-place cannot give.
  *
  * Scale posture: commit cost is one rename, independent of data size;
  * reads are ordinary pruned parquet scans of the pinned directory;
  * VACUUM deletes whole version directories, never inspecting files.
  */
object Snapshots {

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  private def manifestDir(path: String) = new Path(path, "_snapshots")

  private def versions(fs: FileSystem, path: String): Seq[Long] = {
    val dir = manifestDir(path)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .toSeq.sorted
  }

  /** Commit `df` as the next version; returns the committed version id.
    * Retries the version number if a concurrent writer wins the rename
    * race, so concurrent commits serialize instead of corrupting.
    */
  def write(df: DataFrame, path: String, maxRetries: Int = 5): Long = {
    val fs = fsFor(df.sparkSession, path)
    var attempt = 0
    while (attempt <= maxRetries) {
      val v = versions(fs, path).lastOption.getOrElse(0L) + 1L
      if (writeVersioned(df, path, v)) return v
      attempt += 1
    }
    throw new IllegalStateException(
      s"snapshot commit to $path lost $attempt version races")
  }

  /** Idempotent commit of an EXPLICIT version — the primitive a
    * streaming sink needs for exactly-once: a replayed micro-batch maps
    * to the same version, finds its manifest already present, and skips.
    * A data directory left by a crash that never reached the manifest
    * rename is discarded and rewritten. Returns false iff the version
    * was already committed (by this or any other writer).
    */
  def writeVersioned(df: DataFrame, path: String, version: Long): Boolean = {
    require(version > 0, s"versions start at 1, got $version")
    val spark = df.sparkSession
    val fs = fsFor(spark, path)
    val dir = manifestDir(path)
    if (fs.exists(new Path(dir, s"v$version.json"))) return false
    val dataDir = new Path(s"$path/data/v$version")
    if (fs.exists(dataDir)) fs.delete(dataDir, true) // crashed attempt
    df.write.parquet(dataDir.toString)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-v$version-${System.nanoTime()}.json")
    val out = fs.create(tmp, false)
    out.write(
      s"""{"version":$version,"dir":"data/v$version","committed_at":${System.currentTimeMillis()}}"""
        .getBytes("UTF-8"))
    out.close()
    if (fs.rename(tmp, new Path(dir, s"v$version.json"))) true
    else { fs.delete(tmp, false); false } // lost the race: already committed
  }

  /** Latest committed snapshot. The scan is pinned to that version's
    * immutable directory, so it stays consistent however many writes
    * land while the query runs.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    readVersion(spark, path,
      versions(fsFor(spark, path), path).lastOption.getOrElse(
        throw new IllegalArgumentException(s"no snapshots at $path")))

  /** Time travel to a specific committed version. */
  def readVersion(spark: SparkSession, path: String, version: Long): DataFrame = {
    val fs = fsFor(spark, path)
    require(fs.exists(new Path(manifestDir(path), s"v$version.json")),
      s"version $version of $path does not exist (vacuumed or never committed)")
    spark.read.parquet(s"$path/data/v$version")
  }

  /** Commit log, newest first — `DeltaTable.history()`'s surface.
    * Manifests are enumerated via the filesystem (globbing an empty
    * `_snapshots/` would throw from inside the reader).
    */
  def history(spark: SparkSession, path: String): DataFrame = {
    val files = versions(fsFor(spark, path), path)
      .map(v => s"$path/_snapshots/v$v.json")
    require(files.nonEmpty, s"no snapshots at $path")
    spark.read.json(files: _*)
      .select(col("version").cast("long"), col("dir"),
        (col("committed_at") / 1000).cast("timestamp").as("committed_at"))
      .orderBy(col("version").desc)
  }

  /** VACUUM: drop every version older than the newest `keepLast`,
    * deleting whole data directories (never file-by-file inspection).
    * Returns the removed version ids.
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int = 1): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the latest snapshot")
    val fs = fsFor(spark, path)
    val vs = versions(fs, path)
    val doomed = vs.dropRight(keepLast)
    doomed.foreach { v =>
      // manifest first: the version disappears from readers atomically,
      // then the unreachable data dir is reclaimed
      fs.delete(new Path(manifestDir(path), s"v$v.json"), false)
      fs.delete(new Path(s"$path/data/v$v"), true)
    }
    doomed
  }
}
