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

  test("rows-only queries are exactly the documented engine-specific two") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly === Set(
      "q33_simhash_pairs",      // xxhash64-based signature: no DuckDB analog
      "q39_embed_neardup_lsh")) // recall < 1 by design; subset law tested
    // (q43 graduated in round 3: real ImageIO decode made its dims
    // SQL-expressible, so it now carries a full hash oracle)
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
