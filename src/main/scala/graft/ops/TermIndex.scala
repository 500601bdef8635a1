package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Term weighting and indexing over a document corpus: TF-IDF keyword
  * extraction and an inverted-index builder — the retrieval-side
  * counterpart of the dedup/quality family (a curation pipeline that can
  * score and dedup documents also needs to FIND them: nearest-query
  * search over sparse terms is the BM25/TF-IDF path, over dense vectors
  * the [[Similarity]]/[[Ivf]] path).
  *
  * Scale design (100 TB):
  *  - Term frequencies aggregate on (doc, term) straight off the token
  *    explode — partial map-side combine collapses each document's token
  *    stream before the exchange. Document frequencies reuse THAT output
  *    (one row per distinct (doc, term)), so df costs a model-sized
  *    second exchange, not a token-sized one.
  *  - N (corpus size) is a 1-row broadcast; the df table joins the tf
  *    table by shuffle on term (broadcastable when the vocabulary is).
  *  - Per-doc top-k runs as a rank window partitioned by doc — AQE's
  *    partial top-k (rank limit pushdown) trims per partition before the
  *    final exchange.
  *  - Posting lists are CAPPED BEFORE collect_list: a row_number window
  *    over (term, doc) keeps the first `maxPostings` doc ids per term, so
  *    no aggregation buffer ever holds an unbounded stop-word posting
  *    list. The full df is computed in the same window pass (count over
  *    the term partition — same exchange, no extra shuffle).
  */
object TermIndex {

  /** Per-document term frequencies (idCol, term, tf) over normalized
    * whitespace tokens.
    */
  def termFrequencies(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), explode(Dedup.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Top-k terms per document by smoothed TF-IDF
    * (idCol, rank, term, tf, df, score):
    * score = tf · (ln((N+1)/(df+1)) + 1) — the sklearn smooth-idf form,
    * never negative, defined for every term. Ties rank by term ascending.
    */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String,
      k: Int = 3): DataFrame = {
    val tf = termFrequencies(df, textCol, idCol)
    val dfCounts = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).as("N"))
    tf.join(dfCounts, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf") * (log((col("N") + 1).cast("double") / (col("df") + 1)) + 1))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol)).orderBy(desc("score"), col("term"))))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"),
        round(col("score"), 6).as("score"))
  }

  /** BM25 retrieval (Robertson–Spärck Jones, the Okapi weighting): score
    * every document against a bag of query terms and return the global
    * top-k as (rank, idCol, n_hits, score).
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl)),
    * idf(t) = ln((N−df+0.5)/(df+0.5) + 1) — the non-negative variant.
    *
    * Scale: the token explode filters to the query terms BEFORE the
    * (doc, term) aggregation, so only hit postings aggregate; N, total
    * token count, and avgdl are 1-row broadcasts; df is a query-sized
    * broadcast. The global top-k is `orderBy().limit(k)` — planned as
    * TakeOrderedAndProject, a per-partition heap + k-row merge, never a
    * single-partition sort of the corpus (the rank column is attached
    * AFTER the limit, over k rows).
    */
  def bm25Search(df: DataFrame, textCol: String, idCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    require(queryTerms.nonEmpty, "empty query")
    val docs = df.select(col(idCol),
      size(Dedup.tokens(col(textCol))).as("__len"))
    val stats = docs.agg(count(lit(1)).as("__N"),
      (sum(col("__len")).cast("double") / count(lit(1))).as("__avgdl"))
    val hits = df.select(col(idCol),
        explode(Dedup.tokens(col(textCol))).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("__tf"))
    val dfCounts = hits.groupBy(col("term")).agg(count(lit(1)).as("__df"))
    val scored = hits
      .join(broadcast(dfCounts), Seq("term"))
      .join(docs, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("__idf",
        log((col("__N") - col("__df") + 0.5) / (col("__df") + 0.5) + 1))
      .withColumn("__w",
        col("__idf") * col("__tf") * (k1 + 1) /
          (col("__tf") +
            lit(k1) * (lit(1 - b) + lit(b) * col("__len") / col("__avgdl"))))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"), sum(col("__w")).as("__score"))
    val top = scored.orderBy(desc("__score"), col(idCol)).limit(topK)
    top.withColumn("rank", row_number().over(
        Window.orderBy(desc("__score"), col(idCol))))
      .select(col("rank"), col(idCol), col("n_hits"),
        round(col("__score"), 6).as("score"))
  }

  /** Inverted index (term, df, postings): per term, the total document
    * frequency and the first `maxPostings` doc ids ascending, joined into
    * a comma-separated string (a string, not an array, so the driver's
    * value hash and the DuckDB `string_agg` oracle see the same scalar).
    * `minDf` drops hapax terms — at corpus scale most of the vocabulary —
    * before any list is built.
    */
  def invertedIndex(df: DataFrame, textCol: String, idCol: String,
      minDf: Long = 2L, maxPostings: Int = 64): DataFrame = {
    val docTerms = df.select(col(idCol),
        explode(array_distinct(Dedup.tokens(col(textCol)))).as("term"))
    val termW = Window.partitionBy(col("term"))
    val rankW = termW.orderBy(col(idCol))
    docTerms
      .withColumn("df", count(lit(1)).over(termW))
      .withColumn("__rn", row_number().over(rankW))
      .filter(col("__rn") <= maxPostings && col("df") >= minDf)
      .groupBy(col("term"), col("df"))
      .agg(array_join(transform(sort_array(collect_list(col(idCol))),
        x => x.cast("string")), ",").as("postings"))
  }
}
