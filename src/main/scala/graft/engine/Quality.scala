package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations between pipeline stages — the checks the
  * reference performs ad hoc (row counts after ingest, `SHOW TABLES`
  * membership, launcher-level CSV assertions; SURVEY §5) promoted to
  * first-class, executor-side operators. Each check returns a violation
  * COUNT (0 = pass) so callers compose them into one audit row per table
  * instead of collecting violating rows to the driver.
  *
  * Scale posture: every check is a single aggregate (or aggregate over a
  * single-shuffle groupBy/anti-join) — no driver-side row materialization,
  * no per-row UDFs.
  */
object Quality {

  /** Rows where `c` is null. */
  def nullViolations(df: DataFrame, c: String): Long =
    df.filter(col(c).isNull).count()

  /** Rows in excess of one per `keys` group (0 ⇔ `keys` is a unique key —
    * the Silver invariant on `(id, last_updated)`).
    */
  def uniquenessViolations(df: DataFrame, keys: Seq[String]): Long = {
    val n = df.count()
    val distinct = df.select(keys.map(col): _*).distinct().count()
    n - distinct
  }

  /** Child rows whose `childKey` has no match in `parent.parentKey`
    * (orphans). Anti join: one shuffle, or none when the parent key set
    * broadcasts.
    */
  def referentialViolations(child: DataFrame, childKey: String,
                            parent: DataFrame, parentKey: String): Long =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti").count()

  /** Rows failing an arbitrary row-level predicate (range checks etc.). */
  def predicateViolations(df: DataFrame, expectation: Column): Long =
    df.filter(!coalesce(expectation, lit(false))).count()

  /** Run a named battery and return (check, violations) pairs — the audit
    * artifact a pipeline logs (and gates on) between stages.
    */
  def audit(checks: (String, () => Long)*): Seq[(String, Long)] =
    checks.map { case (name, f) => name -> f() }

  // ── Fused single-scan checks ──────────────────────────────────────────
  // Aggregate-expression builders for [[fusedAudit]]: N checks over the
  // same table cost ONE scan + ONE aggregate job instead of N jobs.

  /** Aggregate: rows where `c` is null (fusable [[nullViolations]]). */
  def nullCount(c: String): Column =
    coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))

  /** Aggregate: rows in excess of one per `keys` group (fusable
    * [[uniquenessViolations]]).
    */
  def duplicateCount(keys: Seq[String]): Column =
    count(lit(1)) - count_distinct(struct(keys.map(col): _*))

  /** Aggregate: rows failing `expectation` (fusable
    * [[predicateViolations]]).
    */
  def failCount(expectation: Column): Column =
    coalesce(sum(when(!coalesce(expectation, lit(false)), 1L).otherwise(0L)), lit(0L))

  /** Evaluate all `checks` over `df` in one aggregate pass — one scan
    * feeds every violation counter. Referential checks need the second
    * table and stay separate jobs; everything single-table belongs here.
    */
  def fusedAudit(df: DataFrame, checks: Seq[(String, Column)]): Seq[(String, Long)] = {
    require(checks.nonEmpty, "fusedAudit needs at least one check")
    val aggs = checks.zipWithIndex.map { case ((_, c), i) => c.as(s"_chk$i") }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    checks.zipWithIndex.map { case ((name, _), i) => name -> row.getLong(i) }
  }
}
