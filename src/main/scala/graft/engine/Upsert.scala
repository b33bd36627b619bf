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

  /** Change-data-capture diff between two table states: classify every
    * key as `insert` (only in `after`), `delete` (only in `before`) or
    * `update` (present in both with any non-key column differing), and
    * drop unchanged rows. The inverse of [[merge]]: `merge(before,
    * changes-applied)` reproduces `after`, and this recovers the change
    * feed Delta's CDF would emit between two versions of a table.
    *
    * Output carries the key columns, `change_type`, and the non-key
    * columns — from `after` for inserts/updates, from `before` for
    * deletes (the last observed values, as CDF's `delete` rows do).
    *
    * Scale posture: ONE shuffle — a full-outer sort-merge join on the
    * key. Non-key columns travel as a single struct per side and are
    * compared with null-safe struct equality (`<=>`), so the comparison
    * is codegen'd fieldwise — no hashing, hence no false "unchanged"
    * verdicts from hash collisions. AQE handles key skew as for any
    * shuffle join; no driver-side state at any size.
    */
  def changeCapture(before: DataFrame, after: DataFrame,
                    keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "changeCapture requires at least one key column")
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"schemas differ: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    val nonKey = before.columns.filterNot(keys.contains).toSeq
    def packed(df: DataFrame, as: String) =
      df.select(keys.map(col) :+ struct(nonKey.map(col): _*).as(as): _*)
    val joined = packed(before, "_b").join(packed(after, "_a"), keys, "full_outer")
    val changeType = when(col("_b").isNull, "insert")
      .when(col("_a").isNull, "delete")
      .when(!(col("_b") <=> col("_a")), "update")
    val current = coalesce(col("_a"), col("_b"))
    joined
      .withColumn("change_type", changeType)
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) ++ Seq(col("change_type")) ++
        nonKey.map(f => current.getField(f).as(f)): _*)
  }

  /** [[changeCapture]] with UPDATE PRE-IMAGES — Delta CDF's full
    * `table_changes` row vocabulary (`insert`, `delete`,
    * `update_preimage`, `update_postimage`). The pre-image is what
    * makes a feed ALGEBRAICALLY consumable: a downstream aggregate can
    * subtract the old contribution and add the new one
    * ([[Incremental.aggDelta]]) instead of rescanning the base table.
    *
    * Single-pass: the same one full-outer key join as [[changeCapture]],
    * then each joined row explodes into its 0-2 change images via an
    * array-filter-explode projection — never four filter branches that
    * would re-execute the join per change type.
    */
  def changeCaptureCdf(before: DataFrame, after: DataFrame,
                       keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "changeCaptureCdf requires at least one key column")
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"schemas differ: ${before.columns.mkString(",")} vs ${after.columns.mkString(",")}")
    val nonKey = before.columns.filterNot(keys.contains).toSeq
    def packed(df: DataFrame, as: String) =
      df.select(keys.map(col) :+ struct(nonKey.map(col): _*).as(as): _*)
    val joined = packed(before, "_b").join(packed(after, "_a"), keys, "full_outer")
    val isIns = col("_b").isNull
    val isDel = col("_a").isNull
    val isUpd = !isIns && !isDel && !(col("_b") <=> col("_a"))
    def img(ct: String, image: org.apache.spark.sql.Column) =
      struct(lit(ct).as("ct"), image.as("img"))
    val images = array(
      when(isIns, img("insert", col("_a"))),
      when(isDel, img("delete", col("_b"))),
      when(isUpd, img("update_preimage", col("_b"))),
      when(isUpd, img("update_postimage", col("_a"))))
    joined
      .select(keys.map(col) :+
        explode(filter(images, x => x.isNotNull)).as("_c"): _*)
      .select(keys.map(col) ++ Seq(col("_c.ct").as("change_type")) ++
        nonKey.map(f => col("_c.img").getField(f).as(f)): _*)
  }

  /** Apply a [[changeCapture]] OR [[changeCaptureCdf]] feed to a table
    * state: upsert the insert/update(-postimage) rows, anti-join away
    * the delete keys; CDF pre-image rows carry the RETRACTED value and
    * are dropped (upserting them alongside the postimage would leave
    * every updated key duplicated with old and new values). The CDC
    * inverse law — `applyChanges(before, feed(before, after, keys),
    * keys)` row-equals `after` — holds for BOTH feed vocabularies and
    * is what makes a feed safe to replay downstream; SnapshotSpec
    * proves it across a real [[Snapshots]] version commit. A feed row
    * with an unrecognized change_type fails the job via `raise_error`
    * — silently upserting it would corrupt the replay. Same scale shape
    * as [[merge]]: keyed shuffles only, with a small feed broadcasting
    * onto the target.
    */
  def applyChanges(before: DataFrame, feed: DataFrame,
                   keys: Seq[String]): DataFrame = {
    val known = Seq("insert", "update", "delete",
      "update_preimage", "update_postimage")
    val checked = feed.withColumn("_ct",
      when(col("change_type").isin(known: _*), col("change_type"))
        .otherwise(raise_error(concat(
          lit("applyChanges: unrecognized change_type "), col("change_type")))))
    val dels = checked.filter(col("_ct") === "delete")
      .select(keys.map(col): _*)
    val ups = checked
      .filter(col("_ct").isin("insert", "update", "update_postimage"))
      .drop("change_type", "_ct")
      // merge unions by name: restore the target's column order
      .select(before.columns.map(col).toSeq: _*)
    merge(before, ups, keys).join(dels, keys, "left_anti")
  }
}
