package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE (byte-pair-encoding) tokenizer training over a document corpus —
  * the Sennrich et al. (ACL 2016) merge loop: count adjacent symbol
  * pairs, merge the most frequent pair corpus-wide, repeat.
  *
  * Scale design (100 TB): the classic collapse — all statistics run over
  * the DISTINCT word table weighted by word frequency, never over token
  * occurrences. The corpus is read exactly once (the word-count
  * aggregate, map-side combined); every merge iteration then touches
  * vocabulary-sized data only, and the only driver-side value per
  * iteration is the single winning pair (metadata-sized collect, the
  * loop's sequential dependency is inherent to BPE). Pair counting and
  * merge application are pure array expressions inside codegen.
  */
object Bpe {

  /** Distinct-word frequency table: (word, n, syms) with `syms` the
    * initial single-character symbol sequence. One corpus exchange.
    */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .withColumn("syms", split(col("word"), ""))

  /** Adjacent symbol-pair counts weighted by word frequency (pair key =
    * the two symbols space-joined). Words with one symbol contribute
    * nothing. Vocabulary-sized input, one pair-sized aggregate.
    */
  def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("n"), explode(
        transform(sequence(lit(1), size(col("syms")) - 1),
          i => concat(element_at(col("syms"), i), lit(" "),
            element_at(col("syms"), i + 1)))).as("pair"))
      .groupBy("pair").agg(sum(col("n")).as("cnt"))

  /** Apply one merge (a, b) → ab to a symbol sequence, greedy
    * left-to-right (the BPE scan order: after a merge the scan resumes
    * AFTER the merged token, which the fold reproduces — the merged
    * symbol `ab` never immediately re-merges with a following `b`
    * unless (ab, b) is itself the merge being applied).
    */
  def mergeSyms(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, s) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && s === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  /** Train `numMerges` BPE merges. Each iteration is one vocabulary-sized
    * distributed pass; ties on count break lexicographically so the
    * learned merge list is deterministic. Returns the ordered merges.
    */
  def trainMerges(df: DataFrame, textCol: String, numMerges: Int): Seq[(String, String)] = {
    var words = wordTable(df, textCol).cache()
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val top = pairCounts(words)
        .orderBy(desc("cnt"), asc("pair")).limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        merges += ((a, b))
        val next = words.withColumn("syms", mergeSyms(col("syms"), a, b)).cache()
        next.count()
        words.unpersist()
        words = next
      }
      i += 1
    }
    words.unpersist()
    merges.result()
  }
}
