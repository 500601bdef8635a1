package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact, integer-arithmetic ML evaluation primitives over a
  * (score, binary-label) relation — the metrics a data-curation pipeline
  * computes when a quality classifier gates what enters a training mix
  * (reference analog: the gate thresholds of main.py's completeness
  * checks; here generalized to ranking metrics).
  *
  * Scale design shared by both metrics: the input is first collapsed to a
  * per-distinct-score histogram with map-side combine (one exchange,
  * output bounded by the score domain, not the row count); every window
  * after that runs on the collapsed domain. The rank-sum identity
  * AUC = P(score⁺ > score⁻) + ½·P(tie) is evaluated from cumulative
  * negative counts — no global rank over raw rows, no n_pos × n_neg pair
  * join. All emitted statistics are exact integers (micro-units for the
  * ratios) so a DuckDB oracle reproduces them bit-for-bit; doubles appear
  * nowhere.
  *
  * At 100 TB the score domain is what you quantize (e.g. micro-unit
  * scores → at most 1e6·range buckets): the histogram stays bounded while
  * the scan stays a single pass, which is exactly how distributed AUC is
  * computed in production evaluation systems.
  */
object MlMetrics {

  /** Per-distinct-score (pos, neg) histogram; one exchange. */
  private def histogram(df: DataFrame, score: Column, positive: Column) =
    df.groupBy(score.as("score"))
      .agg(sum(when(positive, 1L).otherwise(0L)).as("pos"),
        sum(when(positive, 0L).otherwise(1L)).as("neg"))

  /** Mann-Whitney rank-sum ROC AUC, exact.
    *
    * Emits one row: `n_pos`, `n_neg`, `u2` = 2·U where
    * U = Σ_s pos(s)·negBelow(s) + ½·pos(s)·neg(s) (ties count half — the
    * standard mid-rank convention), and
    * `auc_micro` = ⌊u2·1e6 / (2·n_pos·n_neg)⌋.
    *
    * The cumulative-negatives window is a single-partition sort over the
    * DISTINCT SCORE domain only (the histogram), not the input rows.
    */
  def rankAuc(df: DataFrame, score: Column, positive: Column): DataFrame = {
    val hist = histogram(df, score, positive)
    val below = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("neg_below", coalesce(sum("neg").over(below), lit(0L)))
      .agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        (sum(col("pos") * col("neg_below")) * 2 +
          sum(col("pos") * col("neg"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        expr("u2 * 1000000 DIV (2 * n_pos * n_neg)").as("auc_micro"))
  }

  /** Best binary split (`score <= threshold`) by weighted Gini impurity,
    * exact. For each candidate threshold t (every distinct score except
    * the maximum, whose right side is empty) the comparable objective is
    *
    *   gini_micro(t) = ⌊L⁺·L⁻·1e6 / Lₙ⌋ + ⌊R⁺·R⁻·1e6 / Rₙ⌋
    *
    * — the weighted impurity with the constant 2/N factor dropped and the
    * two rational terms fixed to micro-units so argmin is integer-exact
    * and engine-independent. Ties break to the smallest threshold.
    * Emits one row: threshold, l_n, l_pos, r_n, r_pos, gini_micro.
    *
    * This is the split-finding step of distributed decision-tree training
    * (candidate stats from one histogram pass + a prefix sum on the
    * collapsed domain), usable directly as a curation rule miner: "which
    * length cut best separates wanted from unwanted documents".
    */
  def giniBestSplit(df: DataFrame, score: Column, positive: Column): DataFrame = {
    val hist = histogram(df, score, positive)
    val upto = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist.select(col("score").as("threshold"),
      sum("pos").over(upto).as("l_pos"), sum("neg").over(upto).as("l_neg"))
    val totals = hist.agg(sum(col("pos")).as("t_pos"), sum(col("neg")).as("t_neg"))
    cum.crossJoin(broadcast(totals))
      .filter(col("l_pos") + col("l_neg") < col("t_pos") + col("t_neg"))
      .select(col("threshold"),
        (col("l_pos") + col("l_neg")).as("l_n"), col("l_pos"),
        (col("t_pos") - col("l_pos") + col("t_neg") - col("l_neg")).as("r_n"),
        (col("t_pos") - col("l_pos")).as("r_pos"))
      .withColumn("gini_micro",
        expr("""l_pos * (l_n - l_pos) * 1000000 DIV l_n +
                r_pos * (r_n - r_pos) * 1000000 DIV r_n"""))
      .orderBy(col("gini_micro"), col("threshold"))
      .limit(1)
  }
}
