package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot keys at cluster scale.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles sort-merge join skew at runtime; these helpers cover
  * the two cases AQE does not: aggregation skew (one giant group) and
  * broadcast-ineligible joins against a replicable dimension.
  *
  * All salts are DETERMINISTIC — derived by hashing a secondary column —
  * never `rand()`: results must be reproducible and retry-stable (a retried
  * task re-deriving different salts would corrupt exactly-once sinks).
  */
object Skew {

  /** Deterministic salt in [0, n) from a discriminator column (a unique or
    * near-unique column of the row, e.g. the event id).
    */
  def salt(discriminator: Column, n: Int): Column =
    pmod(xxhash64(discriminator), lit(n))

  /** Two-phase skew-safe aggregation: partial-aggregate on
    * (keys + salt) — spreading a hot key over `n` reducers — then final
    * aggregate on the keys. Supported aggregates are the
    * partial-composable ones; each (inCol → outCol) pair is aggregated
    * with `fn` in both phases (valid for sum/min/max; count via a
    * pre-projected 1-column summed twice).
    */
  def twoPhaseAgg(df: DataFrame, keys: Seq[Column], discriminator: Column,
      n: Int, fn: String, cols: Seq[(String, String)]): DataFrame = {
    val phase1 = df
      .groupBy(keys :+ salt(discriminator, n).as("__salt"): _*)
      .agg(expr(s"$fn(${cols.head._1})").as(cols.head._2),
        cols.tail.map { case (in, out) => expr(s"$fn($in)").as(out) }: _*)
    phase1
      .groupBy(keys: _*)
      .agg(expr(s"$fn(${cols.head._2})").as(cols.head._2),
        cols.tail.map { case (_, out) => expr(s"$fn($out)").as(out) }: _*)
  }

  /** Salted replicate join for a skewed equality join against a SMALL (but
    * not broadcast-hinted) dimension: replicate each dim row `n` times with
    * an explicit salt, salt the fact side deterministically, and join on
    * (key, salt) — a hot key's rows spread over n tasks instead of one.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, key: String,
      discriminator: Column, n: Int, joinType: String = "inner"): DataFrame = {
    val saltedFacts = facts.withColumn("__salt", salt(discriminator, n))
    val replicatedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(n - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedFacts.join(replicatedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
