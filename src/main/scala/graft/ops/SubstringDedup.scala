package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring-level deduplication (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022): instead of
  * judging whole documents, find every k-token span that occurs more than
  * once anywhere in the corpus (across documents OR repeated inside one)
  * and measure, per document, how much of it is covered by duplicated
  * spans. Boilerplate headers, licence blocks, and templated pages show up
  * as high coverage even when the documents as wholes are unique — the gap
  * the whole-document dedup family (exact/MinHash/SimHash) cannot see.
  *
  * The reference pipeline has no corpus-level text operator (its unit is
  * the K-bar row); this is part of the training-data extension surface.
  *
  * Scale design (the 100 TB story):
  *  - Spans are keyed by `xxhash64` of the k token strings, not the text:
  *    the occurrence shuffle carries (id, pos, 8-byte hash) — never
  *    substrings. Collision odds for a FALSE duplicate are ~m²/2⁶⁴ over m
  *    corpus positions (the same accepted-risk argument as
  *    [[Dedup.hashedShingles]]); the DuckDB oracle re-derives everything
  *    from the literal substrings, so at test scale even one collision
  *    would hash-fail the round.
  *  - Duplicated-hash detection is a groupBy count on the hash — partial
  *    map-side aggregation absorbs hot spans (a boilerplate span occurring
  *    millions of times combines to one row per map task) — followed by a
  *    left-semi join back, so a skewed span never concentrates raw
  *    occurrence rows on one reducer the way a count-window over the hash
  *    partition would.
  *  - Per-document coverage is a classic merged-interval sweep expressed
  *    as ONE ordered window over (doc, pos): spans arrive start-sorted, so
  *    the union length accumulates as `max(0, end − max(start, maxPrevEnd))`
  *    with a running `max(end)` frame — no per-document collect, linear in
  *    duplicated positions.
  * Total: two hash exchanges (span hash, then doc id) regardless of
  * document length or corpus size.
  */
object SubstringDedup {

  /** Every k-token window of the normalized token sequence as
    * (idCol, pos, gh): pos is the 1-based start token index, gh the
    * xxhash64 of the k tokens. Built from k shifted slices zipped together
    * — O(n) array work per document, same shape as [[Dedup.shingles]] but
    * keeping positions and NOT deduplicating (every occurrence counts).
    */
  def spanOccurrences(df: DataFrame, textCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "span length must be >= 1")
    val toks = Dedup.tokens(col(textCol))
    val shifted = (0 until k).map(i => slice(toks, lit(i + 1), size(toks)).as(s"t$i"))
    val structs = filter(arrays_zip(shifted: _*),
      s => s.getField(s"t${k - 1}").isNotNull)
    val hashes = transform(structs,
      s => xxhash64((0 until k).map(i => s.getField(s"t$i")): _*))
    df.select(col(idCol), posexplode(hashes).as(Seq("pos0", "gh")))
      .select(col(idCol), (col("pos0") + 1).as("pos"), col("gh"))
  }

  /** Per-document duplicated-substring coverage:
    * (idCol, n_tokens, dup_positions, covered_tokens, dup_frac, keep).
    *
    *  - `dup_positions`: k-token windows of this document whose content
    *    occurs >1 times in the corpus (self-repeats included).
    *  - `covered_tokens`: union length of those [pos, pos+k) spans — the
    *    token count a span-level trimmer would cut.
    *  - `dup_frac` = covered_tokens / n_tokens (rounded to 6 dp);
    *    `keep` gates on `dup_frac <= maxDupFrac`.
    *
    * `k` trades precision for recall exactly as in the paper (50 tokens at
    * web scale); the default here suits the short synthetic documents.
    */
  def dupSpanCoverage(df: DataFrame, textCol: String, idCol: String,
      k: Int = 8, maxDupFrac: Double = 0.5): DataFrame = {
    val occ = spanOccurrences(df, textCol, idCol, k)
    val dupHashes = occ.groupBy(col("gh"))
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
      .select(col("gh"))
    val dupOcc = occ.join(dupHashes, Seq("gh"), "left_semi")
    // Merged-interval union: rows ordered by start, running max of end
    // over the strictly-preceding frame; a span's new coverage is the part
    // past both its own start and everything already covered.
    val prevFrame = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val contrib = dupOcc
      .withColumn("__prevEnd",
        coalesce(max(col("pos") + k).over(prevFrame), col("pos")))
      .withColumn("__c",
        greatest(lit(0), col("pos") + k - greatest(col("pos"), col("__prevEnd"))))
    val perDoc = contrib.groupBy(col(idCol)).agg(
      count(lit(1)).as("dup_positions"),
      sum(col("__c")).as("covered_tokens"))
    val frac = when(col("n_tokens") === 0, lit(0.0))
      .otherwise(round(col("covered_tokens").cast("double") / col("n_tokens"), 6))
    df.select(col(idCol), size(Dedup.tokens(col(textCol))).as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("dup_positions"), lit(0L)).as("dup_positions"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
      .withColumn("dup_frac", frac)
      .withColumn("keep", col("dup_frac") <= maxDupFrac)
  }
}
