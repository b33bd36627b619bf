package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-pinned snapshot tables: versioned writes with atomic
  * commit, snapshot-isolated reads, time travel, and VACUUM — the
  * storage semantics the reference gets from Delta
  * (src/utils/view_delta_history.py:44-75,
  * src/maintenance/delta_vacuum.py:27-45), rebuilt on plain parquet.
  *
  * Layout: every write attempt lands in its own UNIQUE directory
  * `path/data/v<N>-<nonce>/` — no two writers ever touch the same
  * files — and `path/_snapshots/v<N>.json` records which attempt won.
  * A version is visible iff its manifest exists; the manifest is the
  * LAST thing written (tmp file + rename). Commit ordering is enforced
  * two ways: a JVM-wide lock per qualified table URI serializes racing
  * threads of one driver, and the rename refuses an existing
  * destination on HDFS-semantics filesystems for cross-process races
  * (local file:// rename can overwrite, hence the lock — single-JVM
  * local mode is the tested path; for multi-driver writers use an
  * HDFS-compatible store). Losing attempts delete only their own
  * directory. Readers resolve one manifest and then scan an immutable
  * directory: a reader concurrent with any number of writes sees
  * exactly one version.
  *
  * Scale posture: version discovery lists manifest FILENAMES only;
  * read/readVersion/write parse at most one manifest each, so hot
  * paths stay O(listing) however many versions accumulate (history and
  * vacuum, the maintenance calls, parse what they enumerate). Commit
  * cost is one rename, independent of data size; VACUUM deletes whole
  * version directories, never inspecting files, and takes a min-age so
  * pinned-but-running readers aren't yanked.
  */
object Snapshots {

  /** One committed version's manifest. `dir` is relative to the table
    * root; `tag` identifies the writer for idempotence checks (e.g. a
    * streaming sink's app+batch id). The metric fields are EXACT
    * per-version write metrics (the attempt dir holds precisely this
    * version's data); None for manifests written before metrics existed.
    */
  final case class Commit(version: Long, dir: String, committedAt: Long,
                          tag: Option[String],
                          numFiles: Option[Long] = None,
                          numBytes: Option[Long] = None,
                          numRows: Option[Long] = None)

  // serializes commits per table within this JVM (local file:// rename
  // does not refuse an existing destination, so the rename alone is not
  // enough to pick a single winner among racing threads) — see UriLocks
  private def lockFor(fs: FileSystem, path: String): Object =
    UriLocks.forPath(fs, new Path(path))

  // tags are embedded in hand-rolled JSON and parsed back with a regex:
  // restrict them to characters that survive both directions verbatim
  private val TagChars = "[A-Za-z0-9._#-]*".r

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    FileSystem.get(new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  private def manifestDir(path: String) = new Path(path, "_snapshots")

  private val NameRe = """v(\d+)\.json""".r
  private val VersionRe = """"version":(\d+)""".r
  private val DirRe = """"dir":"([^"]+)"""".r
  private val TsRe = """"committed_at":(\d+)""".r
  private val TagRe = """"tag":"([^"]*)"""".r
  private val FilesRe = """"num_files":(\d+)""".r
  private val BytesRe = """"num_bytes":(\d+)""".r
  private val RowsRe = """"num_rows":(\d+)""".r

  /** Committed version ids, oldest first — filename-based, so a
    * corrupt manifest still occupies its version number (it can be
    * read-blocked but never silently reassigned to a new writer).
    */
  def versions(spark: SparkSession, path: String): Seq[Long] =
    versionNames(fsFor(spark, path), path)

  private def versionNames(fs: FileSystem, path: String): Seq[Long] = {
    val dir = manifestDir(path)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).map(_.getPath.getName)
      // length guard: a foreign v<19+ digits>.json is not ours (same
      // robustness as the vacuum attempt-dir scan), never a crash source
      .collect { case NameRe(v) if v.length <= 18 => v.toLong }
      .toSeq.sorted
  }

  private def parseManifest(fs: FileSystem, p: Path): Option[Commit] =
    try {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      for {
        v <- VersionRe.findFirstMatchIn(text).map(_.group(1).toLong)
        d <- DirRe.findFirstMatchIn(text).map(_.group(1))
        t <- TsRe.findFirstMatchIn(text).map(_.group(1).toLong)
      } yield Commit(v, d, t, TagRe.findFirstMatchIn(text).map(_.group(1)),
        FilesRe.findFirstMatchIn(text).map(_.group(1).toLong),
        BytesRe.findFirstMatchIn(text).map(_.group(1).toLong),
        RowsRe.findFirstMatchIn(text).map(_.group(1).toLong))
    } catch { case _: java.io.IOException => None } // vacuumed mid-read

  private def commitOf(fs: FileSystem, path: String, version: Long): Option[Commit] =
    parseManifest(fs, new Path(manifestDir(path), s"v$version.json"))

  /** All committed versions with manifests parsed, oldest first —
    * maintenance-path helper (history, vacuum). Skips manifests a
    * concurrent vacuum deletes between listing and reading.
    */
  def commits(spark: SparkSession, path: String): Seq[Commit] = {
    val fs = fsFor(spark, path)
    versionNames(fs, path).flatMap(commitOf(fs, path, _))
  }

  /** Idempotent commit of an EXPLICIT version — the primitive a
    * streaming sink needs for exactly-once. Returns false iff this
    * version was already committed WITH THE SAME TAG (a replay — safe
    * to skip). A pre-existing commit with a different (or no) tag is a
    * version collision between distinct writers and throws, so data is
    * never silently dropped. Data lands in a unique per-attempt
    * directory: a losing attempt deletes only its own files.
    */
  def writeVersioned(df: DataFrame, path: String, version: Long,
                     tag: Option[String] = None): Boolean = {
    require(version > 0, s"versions start at 1, got $version")
    tag.foreach(t => require(TagChars.pattern.matcher(t).matches(),
      s"tag must match ${TagChars.regex}, got '$t'"))
    val spark = df.sparkSession
    val fs = fsFor(spark, path)
    val manifest = new Path(manifestDir(path), s"v$version.json")

    def verifyReplay(): Boolean = parseManifest(fs, manifest) match {
      case Some(c) if c.tag == tag && tag.isDefined => false // replay: skip
      case Some(c) => throw new SnapshotConflict(
        s"version $version of $path already committed by tag=${c.tag}; " +
          s"refusing to drop this write (tag=$tag)")
      case None => throw new IllegalStateException(
        s"manifest $manifest exists but is unreadable/corrupt — " +
          "repair or remove it before writing this version")
    }

    if (fs.exists(manifest)) return verifyReplay()
    // unique attempt directory — concurrent attempts never share files
    val rel = s"data/v$version-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.parquet(s"$path/$rel")
    // exact per-version metrics: the attempt dir holds precisely this
    // version's data (footer reads only — see Layout.parquetStats)
    val (nFiles, nBytes, nRows) = Layout.parquetStats(spark, s"$path/$rel")
    lockFor(fs, path).synchronized {
      if (fs.exists(manifest)) {
        fs.delete(new Path(s"$path/$rel"), true) // lost: drop our attempt
        verifyReplay()
      } else {
        val dir = manifestDir(path)
        fs.mkdirs(dir)
        val tmp = new Path(dir, s".tmp-v$version-${System.nanoTime()}.json")
        val tagJson = tag.map(t => s""","tag":"$t"""").getOrElse("")
        val out = fs.create(tmp, false)
        try out.write(
          (s"""{"version":$version,"dir":"$rel"""" +
            s""","committed_at":${System.currentTimeMillis()}""" +
            s""","num_files":$nFiles,"num_bytes":$nBytes,"num_rows":$nRows""" +
            s"""$tagJson}""")
            .getBytes("UTF-8"))
        finally out.close()
        if (fs.rename(tmp, manifest)) true
        else { // rename reported false: inspect who (if anyone) won
          fs.delete(tmp, false)
          parseManifest(fs, manifest) match {
            case Some(c) if c.dir == rel => true // OUR rename actually
              // landed despite the false return (retried-RPC ambiguity):
              // the data dir must survive
            case Some(_) =>
              fs.delete(new Path(s"$path/$rel"), true)
              verifyReplay()
            case None =>
              fs.delete(new Path(s"$path/$rel"), true)
              throw new SnapshotConflict( // no winner: transient failure
                s"commit rename for version $version of $path failed with " +
                  "no competing manifest — retryable")
          }
        }
      }
    }
  }

  /** Thrown when a version is already committed by a different writer. */
  final class SnapshotConflict(msg: String) extends IllegalStateException(msg)

  /** Commit `df` as the next version; returns the committed version id.
    * Retries the next number if a concurrent writer wins the race, so
    * concurrent commits serialize instead of corrupting. (Version
    * numbering is filename-based, so a corrupt manifest blocks reads of
    * ITS version but never this path.)
    */
  def write(df: DataFrame, path: String, maxRetries: Int = 5): Long = {
    val tag = Some(s"write-${java.util.UUID.randomUUID()}")
    val fs = fsFor(df.sparkSession, path)
    var attempt = 0
    while (attempt <= maxRetries) {
      val v = versionNames(fs, path).lastOption.getOrElse(0L) + 1L
      try {
        if (writeVersioned(df, path, v, tag)) return v
      } catch { case _: SnapshotConflict => () } // lost the race: next v
      attempt += 1
    }
    throw new IllegalStateException(
      s"snapshot commit to $path lost $attempt version races")
  }

  /** Latest committed snapshot. The scan is pinned to that version's
    * immutable directory, so it stays consistent however many writes
    * land while the query runs. Parses exactly one manifest.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val fs = fsFor(spark, path)
    val last = versionNames(fs, path).lastOption.getOrElse(
      throw new IllegalArgumentException(s"no snapshots at $path"))
    readVersion(spark, path, last)
  }

  /** Time travel to a specific committed version. */
  def readVersion(spark: SparkSession, path: String, version: Long): DataFrame = {
    val fs = fsFor(spark, path)
    commitOf(fs, path, version) match {
      case Some(c) => spark.read.parquet(s"$path/${c.dir}")
      case None if fs.exists(new Path(manifestDir(path), s"v$version.json")) =>
        throw new IllegalStateException(
          s"manifest for version $version of $path is unreadable/corrupt")
      case None => throw new IllegalArgumentException(
        s"version $version of $path does not exist (vacuumed or never committed)")
    }
  }

  /** Resolve a wall-clock instant to a committed version: the HIGHEST
    * version whose commit timestamp is ≤ `tsMillis` — Delta's
    * `timestampAsOf` resolution rule (the reference surfaces commit
    * timestamps in its history view precisely so users can pick one,
    * `src/utils/view_delta_history.py:44-75`). Throws if the instant
    * precedes the earliest commit (nothing existed yet) — same posture
    * as Delta rather than silently returning an empty table. Commit
    * timestamps are manifest metadata, so resolution is a driver-side
    * manifest scan, no Spark job.
    *
    * Corrupt manifests: a version whose manifest exists but does not
    * parse has an UNKNOWN commit instant. If such a version is above
    * the one this timestamp would otherwise resolve to, the answer
    * could be wrong (the corrupt version may have been live at `ts`) —
    * resolution then fails LOUDLY, matching [[readVersion]]'s posture
    * on the same manifest, instead of silently serving the older
    * version as "what was live then". Corrupt versions at or below the
    * resolved one cannot change a max-at-or-before answer and are
    * ignored (they stay read-blocked on direct access).
    */
  def versionAt(spark: SparkSession, path: String, tsMillis: Long): Long = {
    val fs = fsFor(spark, path)
    val names = versionNames(fs, path)
    val cs = names.flatMap(commitOf(fs, path, _))
    require(names.nonEmpty, s"no snapshots at $path")
    val corrupt = names.toSet -- cs.map(_.version).toSet
    val visible = cs.filter(_.committedAt <= tsMillis)
    val resolved = visible.map(_.version).maxOption
    val blocking = corrupt.filter(v => resolved.forall(v > _))
    if (blocking.nonEmpty) throw new IllegalStateException(
      s"manifest(s) for version(s) ${blocking.toSeq.sorted.mkString(", ")} " +
        s"of $path are unreadable/corrupt with unknown commit instants — " +
        s"cannot resolve timestamp $tsMillis; repair or remove them first")
    resolved.getOrElse(throw new IllegalArgumentException(
      s"timestamp $tsMillis precedes the earliest commit of $path " +
        s"(${cs.map(_.committedAt).min}); nothing to read"))
  }

  /** Time travel to the snapshot visible at a wall-clock instant —
    * Delta's `.option("timestampAsOf", …)`: [[versionAt]] resolution +
    * a [[readVersion]] scan pinned to that version's directory.
    */
  def readTimestamp(spark: SparkSession, path: String, tsMillis: Long): DataFrame =
    readVersion(spark, path, versionAt(spark, path, tsMillis))

  /** [[readTimestamp]] convenience overload for SQL timestamps. */
  def readTimestamp(spark: SparkSession, path: String,
                    ts: java.sql.Timestamp): DataFrame =
    readTimestamp(spark, path, ts.getTime)

  /** Change feed between two committed versions of a snapshot table —
    * Delta CDF's `table_changes(from, to)` surface, recovered from the
    * real version store: [[Upsert.changeCapture]] over
    * [[readVersion]](from) vs [[readVersion]](to). One full-outer keyed
    * join of the two version scans; [[Upsert.applyChanges]] replays the
    * feed onto `from` to reproduce `to` exactly (spec'd across an
    * actual commit).
    */
  def changeFeed(spark: SparkSession, path: String, fromVersion: Long,
                 toVersion: Long, keys: Seq[String]): DataFrame =
    Upsert.changeCapture(readVersion(spark, path, fromVersion),
      readVersion(spark, path, toVersion), keys)

  /** [[changeFeed]] with wall-clock endpoints: both instants resolve
    * through [[versionAt]] (Delta's `timestampAsOf` rule, corrupt
    * manifests refused), so "what changed between yesterday's snapshot
    * and now" needs no version bookkeeping from the caller.
    */
  def changeFeedByTime(spark: SparkSession, path: String, fromTsMillis: Long,
                       toTsMillis: Long, keys: Seq[String]): DataFrame = {
    // swapped bare-Long endpoints would silently INVERT the feed
    // (inserts reported as deletes) — refuse like the rest of the module
    require(fromTsMillis <= toTsMillis,
      s"changeFeedByTime: from ($fromTsMillis) must not exceed " +
        s"to ($toTsMillis) — a reversed feed inverts every change")
    changeFeed(spark, path, versionAt(spark, path, fromTsMillis),
      versionAt(spark, path, toTsMillis), keys)
  }

  /** Shared read-modify-commit step of the mutation verbs
    * ([[deleteWhere]]/[[updateWhere]]/[[restore]]): allocate the next
    * version above the current maximum and commit `f(latest)` there —
    * commit discipline lives in ONE place.
    */
  private def commitNext(spark: SparkSession, path: String)
                        (f: DataFrame => DataFrame): Long = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no snapshots at $path")
    val next = vs.max + 1
    writeVersioned(f(readVersion(spark, path, vs.max)), path, next)
    next
  }

  /** Null-safe predicate hit: mutation verbs act only on rows the
    * predicate AFFIRMATIVELY matches (SQL WHERE semantics — a null
    * predicate row is kept by DELETE and passed through by UPDATE).
    */
  private def matched(p: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.functions.{coalesce, lit}
    coalesce(p, lit(false))
  }

  /** Predicate DELETE as a snapshot commit — Delta's `DELETE WHERE` on
    * this store: reads the latest version, writes the surviving rows as
    * the next version, returns (rows deleted, new version). History
    * and time travel keep the pre-delete versions readable until
    * [[vacuum]] reclaims them — which is exactly the retention workflow
    * (audit first, purge later); a HARD delete (GDPR erasure) is this
    * followed by `vacuum(keepLast = 1)`. Copy-on-write like every
    * commit here: cost scales with the table, not the deleted fraction
    * — at 100 TB, partition the table and delete per-partition (the
    * [[graft.engine.Layout.upsertPartitions]] discipline) rather than
    * rewriting the world. One count job (the deleted rows) on top of
    * the rewrite scan.
    */
  def deleteWhere(spark: SparkSession, path: String,
                  predicate: org.apache.spark.sql.Column): (Long, Long) = {
    val hit = matched(predicate)
    var deleted = 0L
    val next = commitNext(spark, path) { cur =>
      deleted = cur.filter(hit).count()
      cur.filter(!hit)
    }
    (deleted, next)
  }

  /** Predicate UPDATE as a snapshot commit — Delta's `UPDATE SET …
    * WHERE` on this store: rows the predicate affirmatively matches get
    * each assignment applied; everything else (including null-predicate
    * rows) passes through untouched. SQL UPDATE semantics throughout:
    * the predicate AND every assignment RHS evaluate against the
    * PRE-UPDATE row in one projection — assignments never see each
    * other's results, so `Map("a" -> col("b"), "b" -> col("a"))` swaps
    * and assignment order is irrelevant. Each assignment RHS is cast to
    * the EXISTING column's type (Delta UPDATE semantics) — an UPDATE
    * must never change the table schema, or a later [[changeFeed]]
    * spanning the versions refuses with "schemas differ". Copy-on-write
    * like [[deleteWhere]]; returns (rows updated, new version).
    */
  def updateWhere(spark: SparkSession, path: String,
                  predicate: org.apache.spark.sql.Column,
                  assignments: Map[String, org.apache.spark.sql.Column])
      : (Long, Long) = {
    require(assignments.nonEmpty, "updateWhere needs at least one assignment")
    import org.apache.spark.sql.functions.when
    val hit = matched(predicate)
    var updated = 0L
    val next = commitNext(spark, path) { cur =>
      val unknown = assignments.keySet -- cur.columns.toSet
      require(unknown.isEmpty, s"updateWhere: no such column(s): " +
        unknown.toSeq.sorted.mkString(", "))
      updated = cur.filter(hit).count()
      cur.select(cur.columns.toSeq.map { c =>
        assignments.get(c) match {
          case Some(v) =>
            when(hit, v.cast(cur.schema(c).dataType)).otherwise(cur(c)).as(c)
          case None => cur(c)
        }
      }: _*)
    }
    (updated, next)
  }

  /** RESTORE TO VERSION — Delta's `RESTORE`: re-commits an older
    * version's rows as the NEW latest version, so the rollback is
    * itself an auditable commit (history shows the mistake and the
    * recovery; time travel still reaches the bad version until
    * [[vacuum]]). Returns the new version number.
    */
  def restore(spark: SparkSession, path: String, toVersion: Long): Long = {
    require(versions(spark, path).contains(toVersion),
      s"version $toVersion not present at $path")
    commitNext(spark, path)(_ => readVersion(spark, path, toVersion))
  }

  /** Commit log, newest first — `DeltaTable.history()`'s surface,
    * including per-version operation metrics (numFiles/numBytes/numRows,
    * null for pre-metrics manifests). Built from driver-side manifest
    * parses (metadata-sized), not a Spark job.
    */
  def history(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val cs = commits(spark, path)
    require(cs.nonEmpty, s"no snapshots at $path")
    cs.sortBy(-_.version)
      .map(c => (c.version, c.dir, new java.sql.Timestamp(c.committedAt),
        c.numFiles, c.numBytes, c.numRows))
      .toDF("version", "dir", "committed_at", "num_files", "num_bytes", "num_rows")
  }

  /** VACUUM: drop every version older than the newest `keepLast`,
    * provided it was committed at least `minAgeMs` ago — the retention
    * window that keeps already-pinned readers from having their files
    * deleted mid-scan (Delta's retention analog; 0 means reap
    * immediately). Also reaps crash orphans: attempt directories that
    * never got a manifest and tmp manifests that never renamed, both
    * only past `orphanAgeMs` — and a directory with a live `_temporary`
    * child (a Spark write still in flight) is left alone until it is a
    * day old regardless. Returns the removed version ids.
    *
    * Concurrency: `orphanAgeMs` must exceed the longest possible
    * write-to-commit window of any live writer — the `_temporary` grace
    * only covers an in-flight Spark write, NOT the gap between parquet
    * completion and manifest commit. `orphanAgeMs = 0` is only safe with
    * no concurrent writers (e.g. tests). As a backstop, the reap
    * re-resolves the manifest immediately before deleting and again
    * after: a commit that slips through the window fails the vacuum
    * LOUDLY instead of leaving a manifest that points at deleted data.
    */
  def vacuum(spark: SparkSession, path: String, keepLast: Int = 1,
             minAgeMs: Long = 0L,
             orphanAgeMs: Long = 3600000L): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the latest snapshot")
    val fs = fsFor(spark, path)
    val now = System.currentTimeMillis()
    val cs = commits(spark, path)
    val doomed = cs.dropRight(keepLast).filter(_.committedAt <= now - minAgeMs)
    doomed.foreach { c =>
      // manifest first: the version disappears from readers atomically,
      // then the unreachable data dir is reclaimed
      fs.delete(new Path(manifestDir(path), s"v${c.version}.json"), false)
      fs.delete(new Path(s"$path/${c.dir}"), true)
    }
    // crash orphans among attempt directories. Classification per dir
    // `v<N>-<nonce>`: no manifest for N at all → a crashed first
    // attempt, reap; manifest present and PARSEABLE but pointing at a
    // different dir → a crashed losing attempt, reap; manifest present
    // but CORRUPT → the dir may hold committed data, leave it for the
    // repair the read errors instruct. Cheap checks run first; the
    // per-dir _temporary probe (a Spark write still in flight gets a
    // day's grace) only fires for actual reap candidates.
    val AttemptRe = """v(\d+)-.+""".r
    val manifested = versionNames(fs, path).toSet
    val dataRoot = new Path(path, "data")
    if (fs.exists(dataRoot)) fs.listStatus(dataRoot)
      .filter(s => s.isDirectory && (now - s.getModificationTime) >= orphanAgeMs)
      .foreach { s =>
        val name = s.getPath.getName
        val versionOf: Option[Long] = name match {
          case AttemptRe(v) if v.length <= 18 => Some(v.toLong) // Long-safe
          case _ => None // unknown layout: never ours to delete
        }
        val candidate = versionOf.exists { vn =>
          !manifested.contains(vn) ||
            commitOf(fs, path, vn).exists(_.dir != s"data/$name") // loser
        }
        // the _temporary probe only fires for actual reap candidates
        def inFlightGrace: Boolean = (now - s.getModificationTime) <
          math.max(orphanAgeMs, 86400000L) &&
          fs.exists(new Path(s.getPath, "_temporary"))
        if (candidate && !inFlightGrace) {
          val vn = versionOf.get
          // the listing-time classification may be stale: re-resolve the
          // manifest immediately before deleting (narrows the race with a
          // racing writeVersioned that just committed this attempt)
          if (!commitOf(fs, path, vn).exists(_.dir == s"data/$name")) {
            fs.delete(s.getPath, true)
            // backstop re-verify: a commit that landed inside the
            // check-then-delete window now points at deleted data — fail
            // LOUDLY so the operator restores/recommits rather than
            // discovering a broken table at read time
            if (commitOf(fs, path, vn).exists(_.dir == s"data/$name"))
              throw new IllegalStateException(
                s"vacuum raced a concurrent commit: version $vn of $path " +
                  s"committed data/$name during orphan reaping and its data " +
                  "was deleted — restore or recommit the version; run vacuum " +
                  "with orphanAgeMs above the longest write-to-commit window")
          }
        }
      }
    val mDir = manifestDir(path)
    if (fs.exists(mDir)) fs.listStatus(mDir)
      .filter(s => s.getPath.getName.startsWith(".tmp-") &&
        s.getModificationTime <= now - orphanAgeMs)
      .foreach(s => fs.delete(s.getPath, false))
    doomed.map(_.version)
  }
}
