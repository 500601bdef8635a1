package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{IntervalJoin, QualityGates}

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  private lazy val cfg = Seq(
    ("202401", Some(-10.0), Some(30.0), t("2023-12-20 13:30:00"), t("2024-01-17 13:25:00")),
    ("202402", Some(40.0), Some(20.0), t("2024-01-17 13:30:00"), t("2024-02-21 13:25:00"))
  ).toDF("contract_year_month", "next_contract_diff", "accumulated_contract_diff",
    "start_k", "settle_k")

  private lazy val bars = Seq(
    (t("2024-01-10 09:00:00"), 100.0, 101.0, 99.0, 100.5, 10L), // in 202401
    (t("2024-02-01 09:00:00"), 200.0, 201.0, 199.0, 200.5, 20L), // in 202402
    (t("2024-03-01 09:00:00"), 300.0, 301.0, 299.0, 300.5, 30L)  // no match
  ).toDF("ts", "open", "high", "low", "close", "volume")

  test("back-adjust: matched bars shift by accumulated diff; unmatched get 0/empty") {
    val out = IntervalJoin.backAdjust(bars, cfg).orderBy("ts").collect()
    assert(out(0).getAs[Double]("open") == 130.0)
    assert(out(0).getAs[String]("contract_year_month") == "202401")
    assert(out(1).getAs[Double]("close") == 220.5)
    assert(out(2).getAs[Double]("open") == 300.0)
    assert(out(2).getAs[String]("contract_year_month") == "")
    assert(out(2).getAs[Double]("accumulated_contract_diff") == 0.0)
  }

  test("back-adjustment preserves intra-contract price deltas") {
    val twoBars = Seq(
      (t("2024-01-10 09:00:00"), 100.0, 101.0, 99.0, 100.5, 1L),
      (t("2024-01-10 09:05:00"), 102.0, 103.0, 101.0, 102.5, 1L)
    ).toDF("ts", "open", "high", "low", "close", "volume")
    val out = IntervalJoin.backAdjust(twoBars, cfg).orderBy("ts")
      .select("open").as[Double].collect()
    assert(out(1) - out(0) == 2.0)
  }

  test("first-match tie-break on overlapping intervals") {
    val overlapping = Seq(
      ("A", 1.0, t("2024-01-01 00:00:00"), t("2024-01-31 00:00:00"), 1),
      ("B", 2.0, t("2024-01-05 00:00:00"), t("2024-02-28 00:00:00"), 2)
    ).toDF("id", "v", "s", "e", "ord")
    val facts = Seq(t("2024-01-10 00:00:00")).toDF("ts")
    val out = IntervalJoin.leftJoin(facts, overlapping, col("ts"), col("s"), col("e"),
      tieBreak = Some(col("ord"))).collect()
    assert(out.length == 1 && out(0).getAs[String]("id") == "A")
  }

  test("tie-break keeps one match PER FACT ROW, not per timestamp") {
    val overlapping = Seq(
      ("A", 1.0, t("2024-01-01 00:00:00"), t("2024-01-31 00:00:00"), 1),
      ("B", 2.0, t("2024-01-05 00:00:00"), t("2024-02-28 00:00:00"), 2)
    ).toDF("id", "v", "s", "e", "ord")
    // two DISTINCT fact rows sharing the same timestamp: each must keep
    // its own first match (a ts-partitioned window would collapse them)
    val facts = Seq(
      (10L, t("2024-01-10 00:00:00")),
      (11L, t("2024-01-10 00:00:00"))
    ).toDF("fact_id", "ts")
    val out = IntervalJoin.leftJoin(facts, overlapping, col("ts"), col("s"),
        col("e"), tieBreak = Some(col("ord")))
      .orderBy("fact_id").collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[String]("id") == "A"))
  }

  test("overlap gate throws on overlapping intervals, passes on tiling ones") {
    QualityGates.requireNonOverlapping(cfg, col("start_k"), col("settle_k"))
    val bad = Seq(
      (t("2024-01-01 00:00:00"), t("2024-01-31 00:00:00")),
      (t("2024-01-05 00:00:00"), t("2024-02-28 00:00:00"))
    ).toDF("s", "e")
    intercept[QualityGates.OverlappingIntervalsException] {
      QualityGates.requireNonOverlapping(bad, col("s"), col("e"))
    }
  }

  test("plan uses a broadcast join (no shuffle of the probe side)") {
    val plan = IntervalJoin.backAdjust(bars, cfg).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"))
  }
}
