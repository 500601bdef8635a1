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
    *
    * Scale note: each Lloyd step shuffles (cid, dim, value) for the whole
    * training frame — at corpus scale, train on a deterministic subsample
    * first ([[Sampling.sample]] keeps it retry-stable), e.g.
    * `trainCentroids(Sampling.sample(corpus, "vec_id", 0.01), k)`;
    * centroid quality only affects recall, never ranking correctness.
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
    * assignment, n=nProbe for queries).
    *
    * Shuffle-free by construction: the centroids (k×dim floats — tiny) are
    * embedded as array LITERALS, so the per-row top-n over k candidate
    * similarities is a single projected expression —
    * `array_sort(array(struct(-sim, cid), …))` then take the first n —
    * evaluated entirely in-row inside whole-stage codegen. No join, no
    * window, no exchange. (An earlier version ranked candidates with a
    * window partitioned by every input column, which shuffled the whole
    * k-expanded corpus to compute an argmax that needs no data movement.)
    *
    * Ordering matches the previous form: similarity descending, cell id
    * ascending on ties (struct comparison on (-sim, cid)).
    */
  def assignCells(df: DataFrame, vecCol: String, centroids: DataFrame,
      n: Int): DataFrame = {
    val cents = centroids.select(col("cid"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
      .sortBy(_._1).toIndexedSeq
    val ranked = array_sort(array(cents.map { case (cid, cvec) =>
      val cLit = array(cvec.map(v => lit(v)): _*)
      struct((-Similarity.cosine(col(vecCol), cLit)).as("negSim"),
        lit(cid).as("cid"))
    }: _*))
    if (n == 1)
      df.withColumn("cid", ranked.getItem(0).getField("cid"))
    else
      df.withColumn("cid",
        explode(transform(slice(ranked, 1, n), s => s.getField("cid"))))
  }

  /** ANN top-k: probe the query's nProbe nearest cells, exact-rerank the
    * union of those cells. Output matches [[Similarity.topKBruteForce]]
    * shape (query_id, rank, vec_id, sim).
    */
  def topK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      k: Int, nProbe: Int = 2,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    // Probing every cell scans the whole corpus by construction — the cell
    // partition is exhaustive — so the result is exactly the brute-force
    // top-k. Delegate instead of exploding each query into nCells (query,
    // cell) rows and paying nCells× the broadcast-join work for an
    // identical answer (the exact-degenerate nProbe=k oracle config).
    val nCells = centroids.count()
    if (nProbe >= nCells)
      return Similarity.topKBruteForce(corpus, queries, k,
        corpusId, corpusVec, queryId, queryVec)
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
