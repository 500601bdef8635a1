package graft

import org.apache.spark.sql.functions._
import graft.ops.MlMetrics

/** Pins MlMetrics to hand-computed values on tiny fixtures (the DuckDB
  * oracle re-checks the same identities at sf0.01/sf0.1; this spec is the
  * unit-level ground truth with every intermediate done by hand).
  */
class MlMetricsSpec extends SparkSpec {
  import spark.implicits._

  // scores with a tie straddling the classes:
  //   pos: 3, 5, 5   neg: 1, 5, 7
  // pairs (pos, neg): (3,1)+ (3,5)- (3,7)- (5,1)+ (5,5)t (5,7)- ×2 for the
  // two 5-positives → wins = 1 + 2·1 = 3, ties = 2, U = 3 + 2/2 = 4,
  // u2 = 8, AUC = 4/9 = 0.4444… → auc_micro = 444444.
  private lazy val tiny = Seq(
    (3L, true), (5L, true), (5L, true),
    (1L, false), (5L, false), (7L, false)
  ).toDF("score", "label")

  test("rankAuc matches the hand-computed tied example") {
    val r = MlMetrics.rankAuc(tiny, col("score"), col("label")).collect()(0)
    assert(r.getAs[Long]("n_pos") == 3L)
    assert(r.getAs[Long]("n_neg") == 3L)
    assert(r.getAs[Long]("u2") == 8L)
    assert(r.getAs[Long]("auc_micro") == 444444L)
  }

  test("rankAuc is 1e6 for perfect separation and 0 for inverted") {
    val perfect = Seq((10L, true), (11L, true), (1L, false), (2L, false))
      .toDF("score", "label")
    assert(MlMetrics.rankAuc(perfect, col("score"), col("label"))
      .collect()(0).getAs[Long]("auc_micro") == 1000000L)
    assert(MlMetrics.rankAuc(perfect, col("score"), !col("label"))
      .collect()(0).getAs[Long]("auc_micro") == 0L)
  }

  test("giniBestSplit finds the clean cut and reports exact side stats") {
    // pos at 1,2 and neg at 8,9: threshold 2 gives pure sides (gini 0).
    val clean = Seq((1L, true), (2L, true), (8L, false), (9L, false))
      .toDF("score", "label")
    val r = MlMetrics.giniBestSplit(clean, col("score"), col("label"))
      .collect()(0)
    assert(r.getAs[Long]("threshold") == 2L)
    assert(r.getAs[Long]("gini_micro") == 0L)
    assert(r.getAs[Long]("l_n") == 2L && r.getAs[Long]("l_pos") == 2L)
    assert(r.getAs[Long]("r_n") == 2L && r.getAs[Long]("r_pos") == 0L)
  }

  test("giniBestSplit tiebreaks to the smallest threshold") {
    // All one class: every split scores 0; the smallest candidate wins.
    val onecls = Seq((1L, true), (2L, true), (3L, true)).toDF("score", "label")
    val r = MlMetrics.giniBestSplit(onecls, col("score"), col("label"))
      .collect()(0)
    assert(r.getAs[Long]("threshold") == 1L)
    assert(r.getAs[Long]("gini_micro") == 0L)
  }

  test("giniBestSplit hand-computed mixed example") {
    // pos: 1, 3, 5   neg: 2, 4   candidates t ∈ {1,2,3,4}:
    // t=1: L(1p,0n) R(2p,2n) → 0 + ⌊2·2·1e6/4⌋ = 1_000_000
    // t=2: L(1p,1n) R(2p,1n) → ⌊1·1e6/2⌋ + ⌊2·1e6/3⌋ = 500000+666666
    // t=3: L(2p,1n) R(1p,1n) → 666666+500000  t=4: L(2p,2n) R(1p,0n) → 1e6
    // argmin is the t=1 / t=4 tie at 1_000_000 → threshold 1.
    val mixed = Seq((1L, true), (3L, true), (5L, true),
      (2L, false), (4L, false)).toDF("score", "label")
    val r = MlMetrics.giniBestSplit(mixed, col("score"), col("label"))
      .collect()(0)
    assert(r.getAs[Long]("threshold") == 1L)
    assert(r.getAs[Long]("gini_micro") == 1000000L)
  }
}
