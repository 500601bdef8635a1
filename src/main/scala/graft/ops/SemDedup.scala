package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication over an embedding column — the SemDeDup recipe
  * (Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication", 2023): cluster the corpus, then inside each
  * cluster drop every vector that has a cosine-near duplicate with a
  * smaller id. Near-duplicate SEMANTICS (paraphrases, boilerplate
  * rewrites) that the token-level dedup family (exact/MinHash/SimHash/
  * n-gram) cannot see; the cluster partition is what makes it tractable —
  * the quadratic pair search runs per cell, never corpus-wide.
  *
  * Scale design (100 TB):
  *  - Cell assignment reuses [[Ivf.assignCells]]: centroids are literal
  *    arrays, the per-row argmax runs inside whole-stage codegen — zero
  *    exchanges to assign.
  *  - The pair search is an equality self-join on cid: each cluster's
  *    pairs stay inside that join group, so total work is Σ|cell|², the
  *    SemDeDup bound (k controls it: |cell| ≈ n/k). The join carries
  *    (id, vector) — at web scale, raise k so cells fit the joiner.
  *  - The keep rule is greedy lowest-id-wins: a vector is dropped iff a
  *    lower-id near-dup shares its cell. One-pass, no iteration — the
  *    deliberate approximation of the paper (vs. the exact
  *    connected-component survivors of [[Dedup.nearDupSurvivors]], which
  *    this module intentionally does not re-pay at embedding scale).
  */
object SemDedup {

  /** Surviving (idCol, cid) rows after within-cluster near-dup pruning
    * with explicit centroids (cid INT, centroid ARRAY<FLOAT>). */
  def survivors(emb: DataFrame, centroids: DataFrame, eps: Double,
      idCol: String, vecCol: String): DataFrame = {
    val assigned = Ivf.assignCells(emb, vecCol, centroids, n = 1)
      .select(col(idCol), col(vecCol), col("cid"))
    val left = assigned.select(col("cid"), col(idCol).as("__id1"),
      col(vecCol).as("__v1"))
    val right = assigned.select(col("cid"), col(idCol).as("__id2"),
      col(vecCol).as("__v2"))
    val losers = left.join(right, Seq("cid"))
      .filter(col("__id1") < col("__id2"))
      .filter(Similarity.cosine(col("__v1"), col("__v2")) >= eps)
      .select(col("__id2").as(idCol))
      .distinct()
    assigned.join(losers, Seq(idCol), "left_anti")
      .select(col(idCol), col("cid"))
  }

  /** Convenience form: deterministic seed centroids = the k lowest-id
    * vectors (ids must be 0-based dense for the cid cast; matches
    * [[Ivf.trainCentroids]] seeding). Centroid QUALITY only shifts which
    * cell a pair meets in — for production recall, pass Lloyd-refined
    * centroids from [[Ivf.trainCentroids]] instead.
    */
  def survivors(emb: DataFrame, k: Int = 8, eps: Double = 0.9,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = emb.filter(col(idCol) < k)
      .select(col(idCol).cast("int").as("cid"), col(vecCol).as("centroid"))
    survivors(emb, cents, eps, idCol, vecCol)
  }
}
