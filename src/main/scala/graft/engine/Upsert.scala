package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-equivalent upsert without Delta (SURVEY §2.2 K3).
  *
  * The reference upserts Silver via Delta `MERGE` on `(id, last_updated)`
  * with whenMatchedUpdateAll / whenNotMatchedInsertAll
  * (`bronze_to_silver_crypto.py:96-107`). Semantic rewrite:
  * rows of `target` whose key does NOT appear in `source` survive
  * (left_anti), then all of `source` is inserted — matched rows are thereby
  * "updated" to the source version.
  *
  * Scale posture: the anti join shuffles both sides on the key — exactly
  * what Delta MERGE does internally. When `source` is a small batch
  * relative to `target` (the common incremental case) Catalyst broadcasts
  * it and the anti join is shuffle-free on the target side. Combine with
  * [[Layout.upsertPartitions]] to rewrite only the touched date partitions
  * rather than the whole table.
  */
object Upsert {

  /** whenMatchedUpdateAll + whenNotMatchedInsertAll on `keys`. */
  def merge(target: DataFrame, source: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge requires at least one key column")
    target.join(source.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(source)
  }

  /** Merge where the source may itself contain duplicate keys: the source
    * is first deduplicated keeping the row with max `versionCol`
    * (reference dedup W1 semantics, `bronze_to_silver_crypto.py:76-84`).
    */
  def mergeLatest(target: DataFrame, source: DataFrame, keys: Seq[String],
                  versionCol: String): DataFrame =
    merge(target, graft.ops.Clean.dedupLatest(source, keys, versionCol), keys)
}
