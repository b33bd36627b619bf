package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over the query/oracle registries —
  * drift here silently weakens the correctness gate (an oracle without
  * a query is dead code; a query without an oracle quietly downgrades
  * to a rows-only check).
  */
class ContractSpec extends AnyFunSuite {

  test("every oracle references a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every registered query carries a DuckDB oracle (zero rows-only)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"queries without oracles: $rowsOnly")
    // the last two holdouts graduated in round 6: q33 via the md5-derived
    // token hash (DuckDB recomputes the whole simhash), q39 via
    // total-recall banding sharing q38's exact oracle (q32/q41 pattern;
    // scale-parametric band count since round 13)
  }

  test("query ids are unique and well-formed") {
    val ids = SparkEntry.queries.keySet
    assert(ids.forall(_.matches("q\\d{2,3}_[a-z0-9_]+")),
      ids.filterNot(_.matches("q\\d{2,3}_[a-z0-9_]+")))
    // uniqueness by the full numeric prefix (a take(3) would alias
    // q100 with q10)
    val nums = ids.map(_.takeWhile(_ != '_'))
    assert(nums.size === ids.size, "duplicate query numbers")
  }
}
