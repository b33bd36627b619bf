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
}
