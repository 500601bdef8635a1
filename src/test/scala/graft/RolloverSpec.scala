package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.time.RolloverCalendar

class RolloverSpec extends SparkSpec {
  import spark.implicits._

  test("third Wednesday across all 12 months of 2024 (leap year) + 2025") {
    // independently-derived expectations (first Wed + 14 days)
    val expected = Map(
      "2024-01" -> "2024-01-17", "2024-02" -> "2024-02-21", "2024-03" -> "2024-03-20",
      "2024-04" -> "2024-04-17", "2024-05" -> "2024-05-15", "2024-06" -> "2024-06-19",
      "2024-07" -> "2024-07-17", "2024-08" -> "2024-08-21", "2024-09" -> "2024-09-18",
      "2024-10" -> "2024-10-16", "2024-11" -> "2024-11-20", "2024-12" -> "2024-12-18",
      "2025-02" -> "2025-02-19", "2025-03" -> "2025-03-19")
    val got = expected.keys.toSeq.sorted.map(m => s"$m-01").toDF("d")
      .select(date_format(RolloverCalendar.thirdWednesday(to_date($"d")),
        "yyyy-MM-dd")).as[String].collect().toSeq
    assert(got == expected.keys.toSeq.sorted.map(expected))
    // every result is a Wednesday in day range [15, 21]
    val dows = expected.keys.toSeq.map(m => s"$m-01").toDF("d")
      .select(dayofweek(RolloverCalendar.thirdWednesday(to_date($"d"))).as("dow"),
        dayofmonth(RolloverCalendar.thirdWednesday(to_date($"d"))).as("dom"))
      .collect()
    dows.foreach { r => assert(r.getInt(0) == 4 && r.getInt(1) >= 15 && r.getInt(1) <= 21) }
  }

  test("next contract month handles year rollover") {
    val got = Seq("202412", "202501", "202511").toDF("ym")
      .select(RolloverCalendar.nextContractMonth($"ym")).as[String].collect().toSeq
    assert(got == Seq("202501", "202502", "202512"))
  }

  test("predictNext appends month+1 with rolled-forward diff and third-Wed settle") {
    val cfg = Seq(
      ("202511", Some(-49.0), Some(2955.0),
        Some(Timestamp.valueOf("2025-10-15 13:30:00")),
        Some(Timestamp.valueOf("2025-11-19 13:25:00")))
    ).toDF("contract_year_month", "next_contract_diff",
      "accumulated_contract_diff", "start_k", "settle_k")
    val out = RolloverCalendar.predictNext(cfg)
      .orderBy("contract_year_month").collect()
    assert(out.length == 2)
    val p = out(1)
    assert(p.getString(0) == "202512")
    assert(p.isNullAt(1)) // own diff unknown
    assert(p.getDouble(2) == 2955.0 - 49.0)
    assert(p.getTimestamp(3) == Timestamp.valueOf("2025-11-19 13:30:00")) // prev settle + 5min
    assert(p.getTimestamp(4) == Timestamp.valueOf("2025-12-17 13:25:00")) // 3rd Wed Dec 13:25
  }

  test("withAccumulatedDiff is the prefix sum of earlier contracts") {
    val cfg = Seq(
      ("202501", Some(10.0)), ("202502", Some(-5.0)), ("202503", Some(2.0))
    ).toDF("contract_year_month", "next_contract_diff")
    val got = RolloverCalendar.withAccumulatedDiff(cfg)
      .orderBy("contract_year_month")
      .select("accumulated_contract_diff").as[Double].collect().toSeq
    assert(got == Seq(0.0, 10.0, 5.0))
  }
}
