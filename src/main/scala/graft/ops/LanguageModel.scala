package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained statistical language-model scoring — the CCNet-style
  * quality signal (Wenzek et al., "CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data", LREC 2020): score every
  * document by its perplexity under a language model and gate on it.
  * CCNet uses a pretrained KenLM; this is the self-contained equivalent —
  * an add-one-smoothed bigram model TRAINED ON THE CORPUS ITSELF in the
  * same job, so the operator is closed over its inputs (no model artifact,
  * fully oracle-checkable). Documents whose transitions are rare corpus-
  * wide (lorem-ipsum noise, wrong-language text, mangled encodings) score
  * high bits-per-token and are dropped.
  *
  * Scale design (100 TB):
  *  - Training is two count aggregations over exploded tokens/bigrams —
  *    partial map-side combine collapses each map task's token stream to
  *    its distinct grams, so the exchanges carry model-sized rows, not
  *    token occurrences. Zipf guarantees that's a tiny fraction of input.
  *  - Per-document bigram multiplicities are pre-aggregated on
  *    (doc, u, w) BEFORE joining the model, so the model join processes
  *    distinct-bigrams-per-doc rows, and the hot-bigram join skew ("the
  *    the") is bounded by per-doc distinctness (AQE skew-split covers the
  *    rest).
  *  - The vocabulary size V is a 1-row broadcast; the model tables join
  *    by shuffle on token keys (broadcastable when the vocabulary is —
  *    Catalyst decides from stats).
  *  - No driver-side state: the "model" never materializes outside the
  *    plan. To PERSIST a reusable model, write `unigramCounts`/
  *    `bigramCounts` to a table and join it in a later job — same plan
  *    minus training.
  */
object LanguageModel {

  /** Unigram counts c(u) over the normalized corpus. */
  def unigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(Dedup.tokens(col(textCol))).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("cu"))

  /** Per-document bigram multiplicities (idCol, u, w, m). */
  def docBigrams(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = Dedup.tokens(col(textCol))
    val pairs = filter(
      arrays_zip(toks.as("u"), slice(toks, lit(2), size(toks)).as("w")),
      s => s.getField("w").isNotNull)
    df.select(col(idCol), explode(pairs).as("p"))
      .select(col(idCol), col("p.u").as("u"), col("p.w").as("w"))
      .groupBy(col(idCol), col("u"), col("w"))
      .agg(count(lit(1)).as("m"))
  }

  /** Per-document cross-entropy under the corpus bigram model:
    * (idCol, n_bigrams, bits_per_token, ppl, keep).
    *
    * P(w|u) = (c(u,w) + 1) / (c(u) + V) — add-one smoothing over the
    * corpus vocabulary; c(u) is u's total corpus occurrence count.
    * bits_per_token = avg over transitions of −log₂P (rounded to 6 dp),
    * ppl = 2^bits (rounded to 4 dp); `keep` gates on the rounded bits so
    * the decision is reproducible across engines. Documents with < 2
    * tokens have no transitions: bits 0, ppl 1, kept.
    */
  def bigramScore(df: DataFrame, textCol: String, idCol: String,
      maxBits: Double = 8.0): DataFrame = {
    val uni = unigramCounts(df, textCol)
    val vocab = uni.agg(count(lit(1)).as("V"))
    val db = docBigrams(df, textCol, idCol)
    val cuw = db.groupBy(col("u"), col("w")).agg(sum(col("m")).as("cuw"))
    val scored = db
      .join(cuw, Seq("u", "w"))
      .join(uni, Seq("u"))
      .crossJoin(broadcast(vocab))
      .withColumn("__nll",
        -log2((col("cuw") + 1).cast("double") / (col("cu") + col("V"))))
      .groupBy(col(idCol))
      .agg(sum(col("m") * col("__nll")).as("__tot"), sum(col("m")).as("__nb"))
    val bits = round(coalesce(col("__tot") / col("__nb"), lit(0.0)), 6)
    df.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__nb"), lit(0L)).as("n_bigrams"),
        bits.as("bits_per_token"),
        round(pow(lit(2.0), coalesce(col("__tot") / col("__nb"), lit(0.0))), 4)
          .as("ppl"))
      .withColumn("keep", col("bits_per_token") <= maxBits)
  }
}
