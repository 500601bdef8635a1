package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines: sub-sample a corpus, mix languages at chosen rates, carve
  * train/val/test — all as pure per-row expressions.
  *
  * Design rules (the properties that matter at 100 TB):
  *  - DETERMINISTIC, keyed by a stable id — no RNG state, so every
  *    executor, retry, and re-run selects the identical rows (`rand()`
  *    re-rolls under task retry and silently changes the sample), and a
  *    row's membership never depends on partitioning or visit order.
  *  - ZERO shuffle — membership is a projection + filter, fully inside
  *    whole-stage codegen; sampling 1% of 100 TB reads the id column and
  *    moves nothing.
  *  - The hash is Knuth's multiplicative scheme on the key, reduced to a
  *    millionth-scale bucket: exact integer arithmetic reproducible in any
  *    engine (the DuckDB oracles run the same three operations verbatim).
  */
object Sampling {

  /** Uniform bucket in [0, 1e6) from a non-negative integer key:
    * (key · 2654435761) mod 2³² mod 10⁶ — Knuth multiplicative hashing;
    * exact for keys below ~2⁴⁵ (product stays under 2⁶³).
    */
  def hashBucket(key: Column): Column =
    pmod(pmod(key.cast("long") * lit(2654435761L), lit(4294967296L)), lit(1000000L))

  /** Keep ~`fraction` of rows, deterministically by `keyCol`. */
  def sample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashBucket(col(keyCol)) < lit((fraction * 1e6).toLong))

  /** Stratified sampling: per-stratum keep-fractions (e.g. language →
    * rate), applied with the same keyed hash. Strata absent from the map
    * keep `defaultFraction`. The fractions enter the plan as a literal
    * CASE chain — no join, no shuffle; suitable for the usual handful of
    * strata (languages, sources, quality tiers).
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0): DataFrame = {
    val cutoff = fractions.toSeq.sortBy(_._1).foldLeft(
      lit((defaultFraction * 1e6).toLong)) { case (acc, (stratum, f)) =>
      when(col(strataCol) === stratum, lit((f * 1e6).toLong)).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < cutoff)
  }

  /** Weighted Bernoulli sampling: each row keeps with probability
    * min(1, weight · perMillionPerUnit / 10⁶) — importance sampling by a
    * per-row weight (document length, quality score tier, source
    * priority) under the same determinism/zero-shuffle contract as
    * [[sample]]. All-integer cutoff arithmetic (one multiply + least),
    * so any engine reproduces the exact kept set; rows with
    * weight ≥ 10⁶/perMillionPerUnit are always kept.
    */
  def weightedSample(df: DataFrame, keyCol: String, weight: Column,
      perMillionPerUnit: Long): DataFrame =
    df.filter(hashBucket(col(keyCol)) <
      least(lit(1000000L), weight.cast("long") * lit(perMillionPerUnit)))

  /** Exact-k uniform sample WITHOUT replacement per group (reservoir
    * semantics, deterministically): rank rows inside each group by the
    * keyed hash (ties by key) and keep the first k. Unlike the
    * fraction-based [[sample]], group sizes are exact; the rank runs as a
    * WindowGroupLimit, so per-partition heaps trim to k before the
    * group's rows ever sort fully — no group materializes in one task.
    */
  def exactKPerGroup(df: DataFrame, keyCol: String, groupCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashBucket(col(keyCol)), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Disjoint, exhaustive split assignment (train/val/test): weights are
    * normalized into cumulative bucket ranges, and each row's bucket picks
    * its split. Every row lands in exactly one split, stable across runs
    * and engines.
    */
  def splitByHash(df: DataFrame, keyCol: String,
      splits: Seq[(String, Double)], outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "positive weights")
    val total = splits.map(_._2).sum
    // cumulative upper bounds in buckets; the last is forced to 1e6 so
    // float rounding can never leave a row unassigned
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => (c / total * 1e6).toLong)
      .init :+ 1000000L
    val b = hashBucket(col(keyCol))
    val label = splits.map(_._1).zip(bounds).reverse
      .foldLeft(lit(null).cast("string")) { case (acc, (name, hi)) =>
        when(b < hi, lit(name)).otherwise(acc)
      }
    df.withColumn(outCol, label)
  }

  /** Temperature-flattened mixture resampling — the multi-source mixing
    * rule of multilingual/multi-domain LLM corpora (the α-sampling of
    * GPT-3 / mC4 / XLM-R): target share of group g ∝ n_g^α, with
    * α ∈ (0, 1] flattening head groups toward the tail. Down-sampling
    * only: with Tmax = min over g of n_g/t_g (the largest output size
    * needing no up-sampling), each group keeps min(1, t_g·Tmax/n_g) —
    * at least one group keeps everything, and α = 1 reproduces the input
    * (proportional mixing IS the input composition).
    *
    * Scale: one count aggregation (group-sized), two scalar broadcasts to
    * turn counts into integer cutoffs, one broadcast join of the cutoff
    * table, then the same keyed-hash membership filter as [[sample]] —
    * the corpus itself is never shuffled. The row decision compares the
    * integer [[hashBucket]] to `round(p_g·1e6)`, so given the group
    * cutoffs the selection is exact integer arithmetic in any engine.
    */
  def temperatureMix(df: DataFrame, keyCol: String, groupCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val sw = counts.agg(sum(pow(col("__n"), lit(alpha))).as("__sw"))
    val shares = counts.crossJoin(broadcast(sw))
      .withColumn("__share", pow(col("__n"), lit(alpha)) / col("__sw"))
    val tstar = shares.agg(min(col("__n") / col("__share")).as("__tstar"))
    val rates = shares.crossJoin(broadcast(tstar))
      .withColumn("__cutoff",
        round(least(lit(1.0), col("__share") * col("__tstar") / col("__n")) * 1e6)
          .cast("long"))
      .select(col(groupCol), col("__cutoff"))
    df.join(broadcast(rates), Seq(groupCol))
      .filter(hashBucket(col(keyCol)) < col("__cutoff"))
      .drop("__cutoff")
  }
}
