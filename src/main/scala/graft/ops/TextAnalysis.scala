package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: token counting, quality
  * scoring, language identification, and document fingerprinting — all
  * per-row `Column` expressions (no shuffles at all; these run inside the
  * scan's whole-stage-codegen pass, so they cost one pass over the text at
  * any scale).
  */
object TextAnalysis {

  /** Whitespace tokens of the trimmed text. */
  def wsTokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, 0).otherwise(size(wsTokens(text)))

  /** BPE-ish subword count: word pieces + standalone punctuation, the
    * usual `\w+|[^\w\s]` pre-tokenizer regex.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** Ratio of punctuation characters (explicit ASCII class, so every
    * engine agrees on membership).
    */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[.,;:!?'\"()\\[\\]-]", "")))
        .cast("double") / length(text))

  /** Ratio of digit characters. */
  def digitRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      (length(text) - length(regexp_replace(text, "[0-9]", "")))
        .cast("double") / length(text))

  /** Mean token length. */
  def meanTokenLen(text: Column): Column =
    when(tokenCount(text) === 0, 0.0).otherwise(
      aggregate(wsTokens(text), lit(0L), (acc, t) => acc + length(t))
        .cast("double") / tokenCount(text))

  /** Tiny per-language stopword profiles for the n-gram-free heuristic
    * language id. Order matters: ties resolve to the earlier entry.
    */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "for", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "los"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "pour", "que", "dans", "les"))

  /** Fraction of tokens that are stopwords of `lang`'s profile. */
  def stopwordRatio(text: Column, lang: String): Column = {
    val profile = stopwordProfiles.toMap.apply(lang)
    val toks = split(lower(trim(text)), "\\s+")
    when(tokenCount(text) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isin(profile: _*))).cast("double") / size(toks))
  }

  /** Heuristic language id: the profile with the highest stopword hit
    * count; "und" (undetermined) when nothing matches.
    */
  def langId(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val scores = stopwordProfiles.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words: _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, score), acc) =>
      when(score === best && best > 0, lang).otherwise(acc)
    }
  }

  /** Composite quality score in [0, 1]: rewards mid-length documents and
    * prose-like punctuation/digit/stopword profiles. Deterministic,
    * explicit weights; cheap enough to run inline with ingestion.
    *
    * Prefer [[withQualityScore]] for DataFrame pipelines: this single
    * Column form repeats the token/ratio subtrees inside one expression,
    * which codegen compiles slowly.
    */
  def qualityScore(text: Column): Column =
    combineQuality(tokenCount(text).cast("double"), punctRatio(text),
      digitRatio(text), meanTokenLen(text))

  private def combineQuality(nTok: Column, punct: Column, digit: Column,
      mtl: Column): Column = {
    val lengthScore = least(nTok / 64.0, lit(1.0)) * when(nTok > 4096, 0.5).otherwise(1.0)
    val punctOk = when(punct <= 0.2, 1.0).otherwise(0.5)
    val digitOk = when(digit <= 0.2, 1.0).otherwise(0.5)
    val wordOk = when(mtl.between(2.0, 12.0), 1.0).otherwise(0.5)
    round(lengthScore * 0.4 + punctOk * 0.2 + digitOk * 0.2 + wordOk * 0.2, 6)
  }

  /** Two-phase quality score: materialize the shared text features as
    * narrow columns in one projection, combine in a second — same values
    * as [[qualityScore]], far smaller generated code.
    */
  def withQualityScore(df: org.apache.spark.sql.DataFrame, textCol: String,
      outCol: String): org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    df.withColumn("__n_tok", tokenCount(t).cast("double"))
      .withColumn("__punct", punctRatio(t))
      .withColumn("__digit", digitRatio(t))
      .withColumn("__mtl", meanTokenLen(t))
      .withColumn(outCol, combineQuality(col("__n_tok"), col("__punct"),
        col("__digit"), col("__mtl")))
      .drop("__n_tok", "__punct", "__digit", "__mtl")
  }

  /** 64-bit document fingerprint: rolling hash over the normalized token
    * sequence (order-sensitive, unlike the dedup shingle sets):
    * `h = xxhash64(h, token)` — the chained-seed form avoids wrapping
    * multiplication, which ANSI mode (Spark 4 default) rejects on overflow.
    */
  def fingerprint(text: Column): Column =
    aggregate(split(lower(trim(text)), "\\s+"), lit(0L),
      (acc, t) => xxhash64(acc, t))

  /** Hex MD5 fingerprint of the whitespace-normalized text. Weaker than a
    * rolling hash for incremental use, but cross-engine checkable (DuckDB
    * `md5` emits the same lowercase hex), so it carries the DuckDB oracle
    * for the fingerprint family; [[fingerprint]] stays spec-verified. */
  def fingerprintMd5(text: Column): Column = md5(Dedup.normalize(text))

  /** PII redaction patterns: conservative ASCII-only regexes that parse
    * identically under Java regex and RE2-family engines (no lookaround,
    * no backreferences — both so the oracle agrees and so the scan stays
    * linear-time on adversarial text).
    */
  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val longDigitPattern = "[0-9]{7,}"

  /** Redact emails then long digit runs (phone/account/SSN-shaped). Email
    * first: an address can contain a 7+-digit local part that the digit
    * pass would otherwise split, leaving a half-redacted address.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      longDigitPattern, "<NUM>")

  /** Count of email / long-digit-run matches (pre-redaction). */
  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(emailPattern), lit(0)))
  def longDigitCount(text: Column): Column =
    size(regexp_extract_all(text, lit(longDigitPattern), lit(0)))

  /** Fraction of n-gram occurrences taken by the single most frequent
    * n-gram of the document — the Gopher repetition signal (Rae et al.,
    * "Scaling Language Models: ... Gopher", 2021, §A1.1: repetitious
    * documents are low-quality training data and slip past perplexity
    * filters). 0.0 when the document has fewer than `n` tokens.
    *
    * This single-Column form is for SMALL inline uses (a literal check, a
    * spec): interpreted higher-order functions re-evaluate the gram-array
    * subtree once per distinct gram per row, so it is O(tokens²) with
    * LARGE constants — measured ~0.3 s/1k docs of ~55 tokens, and the
    * whole expression runs outside whole-stage codegen. DataFrame
    * pipelines must use [[repetitionMetrics]] (explode + count
    * aggregation: one linear shuffle, codegen-friendly, the form that
    * scales to book-length rows and 100 TB corpora).
    */
  def topNgramFrac(text: Column, n: Int): Column = {
    require(n >= 1, "n-gram order must be >= 1")
    val toks = split(Dedup.normalize(text), " ")
    val grams =
      if (n == 1) toks
      else transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ",
          (0 until n).map(k => element_at(toks, i + k + 1)): _*))
    when(length(trim(text)) === 0 || size(toks) < n, 0.0).otherwise(
      array_max(transform(array_distinct(grams),
          g => size(filter(grams, x => x === g))))
        .cast("double") / size(grams))
  }

  /** Gopher-style repetition gate: keep a document only when no small
    * n-gram dominates it. Thresholds are the published rule-of-thumb
    * magnitudes (most-common word ≤ 0.20 of tokens, top 2-gram ≤ 0.18,
    * top 3-gram ≤ 0.16) — callers with tuned corpora pass their own.
    * Same inline-only caveat as [[topNgramFrac]] (it evaluates three of
    * them); pipelines use [[repetitionMetrics]]'s `keep` column.
    */
  def repetitionKeep(text: Column,
      maxTop1: Double = 0.20, maxTop2: Double = 0.18,
      maxTop3: Double = 0.16): Column =
    topNgramFrac(text, 1) <= maxTop1 &&
      topNgramFrac(text, 2) <= maxTop2 &&
      topNgramFrac(text, 3) <= maxTop3

  /** Per-document repetition metrics at pipeline scale: `(idCol,
    * top1_frac, top2_frac, top3_frac, keep)` — the same values as
    * [[topNgramFrac]]/[[repetitionKeep]] computed the distributed way:
    * explode each gram family, count occurrences per (doc, n, gram), and
    * take max/sum per (doc, n). One token-level hash exchange (partial
    * map-side aggregation applies), everything codegen-compiled — linear
    * in total token count regardless of per-document length, which the
    * per-row HOF form is not (see its caveat). Documents shorter than n
    * tokens (and empty/whitespace docs) produce no n-gram rows and
    * coalesce to fraction 0, passing that family's gate.
    */
  def repetitionMetrics(df: org.apache.spark.sql.DataFrame, textCol: String,
      idCol: String, maxTop1: Double = 0.20, maxTop2: Double = 0.18,
      maxTop3: Double = 0.16): org.apache.spark.sql.DataFrame = {
    val base = df.select(col(idCol),
      when(length(trim(col(textCol))) === 0, array())
        .otherwise(Dedup.tokens(col(textCol))).as("__t"))
    def grams(n: Int): Column =
      if (n == 1) col("__t")
      else when(size(col("__t")) < n, array()).otherwise(
        transform(sequence(lit(0), size(col("__t")) - n),
          i => concat_ws(" ",
            (0 until n).map(k => element_at(col("__t"), i + k + 1)): _*)))
    val exploded = (1 to 3).map(n =>
        base.select(col(idCol), lit(n).as("__n"), explode(grams(n)).as("__g")))
      .reduce(_ unionAll _)
    val fr = exploded
      .groupBy(col(idCol), col("__n"), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol), col("__n"))
      .agg((max(col("__c")).cast("double") / sum(col("__c"))).as("__f"))
    val wide = fr.groupBy(col(idCol)).agg(
      coalesce(max(when(col("__n") === 1, col("__f"))), lit(0.0)).as("top1_frac"),
      coalesce(max(when(col("__n") === 2, col("__f"))), lit(0.0)).as("top2_frac"),
      coalesce(max(when(col("__n") === 3, col("__f"))), lit(0.0)).as("top3_frac"))
    df.select(col(idCol)).join(wide, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("top1_frac"), lit(0.0)).as("top1_frac"),
        coalesce(col("top2_frac"), lit(0.0)).as("top2_frac"),
        coalesce(col("top3_frac"), lit(0.0)).as("top3_frac"))
      .withColumn("keep",
        col("top1_frac") <= maxTop1 && col("top2_frac") <= maxTop2 &&
          col("top3_frac") <= maxTop3)
  }

  /** Order-preserving token dedup (intra-document repetition removal):
    * keep each token's FIRST occurrence, preserve original order, rejoin
    * with single spaces. Runs on the normalized text so the split is
    * unambiguous (no empty tokens from whitespace runs). Pure per-row
    * expression — `array_position` returns the first index of the value,
    * so a token survives iff its position IS the first occurrence.
    * Quadratic in the per-document token count (array_position scans the
    * array per token): fine for web-document-sized rows; for book-length
    * texts prefer the explode + min(pos) aggregation form.
    */
  def dedupTokens(text: Column): Column = {
    val toks = split(Dedup.normalize(text), " ")
    // Spark's filter lambda index is 0-based, array_position 1-based
    array_join(filter(toks, (t, i) => array_position(toks, t) === i + 1), " ")
  }
}
