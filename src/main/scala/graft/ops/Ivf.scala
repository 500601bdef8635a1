package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest-neighbour search — the
  * centroid-partitioned alternative to sign-LSH ([[Similarity.topKLsh]]):
  * the corpus is split into Voronoi cells of k centroids; a query probes
  * only its `nProbe` nearest cells and exact-reranks inside them.
  *
  * Centroid training is deterministic k-seeding (lowest ids) plus Lloyd
  * iterations; centroid quality affects only RECALL — the exact rerank
  * inside probed cells means returned neighbours are always truly ranked.
  *
  * Scale: centroids are a broadcast-sized table (k×dim floats). Cell
  * assignment is one pass of k codegen'd dot products per row; the search
  * join is an equality join on cell id, so the scanned fraction is
  * ~nProbe/k of the corpus. The driver-side collect in training is k×dim
  * doubles — centroids, never data.
  */
object Ivf {

  /** Train k centroids: seed with the k lowest-id vectors, then `iters`
    * Lloyd steps (assign to nearest centroid, recompute cell means).
    * Returns a (cid INT, centroid ARRAY<FLOAT>) DataFrame.
    */
  def trainCentroids(corpus: DataFrame, k: Int, iters: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var centroids = corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol).as("centroid"))
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Float](0).toArray) }.toSeq
      .toDF("cid", "centroid")
    for (_ <- 1 to iters) {
      val assigned = assignCells(corpus, vecCol, centroids, n = 1)
      val means = assigned
        .select(col("cid"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(avg(col("v").cast("double")).as("m"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"),
          transform(col("pm"), x => x.getField("m").cast("float")).as("centroid"))
      centroids = means
        .collect().map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).toSeq
        .toDF("cid", "centroid")
    }
    centroids
  }

  /** Attach the `n` nearest cell ids to each row (n=1 for corpus
    * assignment, n=nProbe for queries). Broadcast centroid join + native
    * cosine + windowed rank.
    */
  def assignCells(df: DataFrame, vecCol: String, centroids: DataFrame,
      n: Int): DataFrame = {
    val scored = df.crossJoin(broadcast(centroids))
      .withColumn("__csim", Similarity.cosine(col(vecCol), col("centroid")))
    scored
      .withColumn("__crank", row_number().over(
        Window.partitionBy(df.columns.map(col): _*)
          .orderBy(desc("__csim"), col("cid"))))
      .filter(col("__crank") <= n)
      .drop("centroid", "__csim", "__crank")
  }

  /** ANN top-k: probe the query's nProbe nearest cells, exact-rerank the
    * union of those cells. Output matches [[Similarity.topKBruteForce]]
    * shape (query_id, rank, vec_id, sim).
    */
  def topK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int = 2,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val corpusCells = assignCells(corpus, corpusVec, centroids, n = 1)
    val queryCells = assignCells(queries, queryVec, centroids, n = nProbe)
    corpusCells.join(broadcast(queryCells), "cid")
      .withColumn("sim", Similarity.cosine(col(corpusVec), col(queryVec)))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(queryId)).orderBy(desc("sim"), col(corpusId))))
      .filter(col("rank") <= k)
      .select(col(queryId), col("rank"), col(corpusId),
        round(col("sim"), 6).as("sim"))
  }
}
