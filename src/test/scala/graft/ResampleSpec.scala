package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Resample

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  // 1-min bars 09:00..09:10 inclusive, deterministic values
  private lazy val bars = (0 to 10).map { i =>
    val ts = t(f"2024-01-02 09:$i%02d:00")
    (ts, 100.0 + i, 110.0 + i, 90.0 + i, 105.0 + i, 10L + i)
  }.toDF("ts", "open", "high", "low", "close", "volume")

  test("closed-right, left-labeled buckets: boundary bar joins the PRECEDING bucket") {
    val out = Resample.ohlcvBars(bars, "5 minutes").orderBy("ts").collect()
    // pandas resample('5min', closed='right', label='left'):
    // bucket (08:55,09:00] = {09:00}, (09:00,09:05] = {09:01..09:05},
    // (09:05,09:10] = {09:06..09:10}
    assert(out.map(_.getTimestamp(0).toString.substring(11, 16)).toSeq ==
      Seq("08:55", "09:00", "09:05"))
    val b1 = out(1) // bars 09:01..09:05 → open=101, close=105+5, high=110+5, low=90+1
    assert(b1.getDouble(1) == 101.0 && b1.getDouble(2) == 115.0 &&
      b1.getDouble(3) == 91.0 && b1.getDouble(4) == 110.0 && b1.getLong(5) == 65L)
  }

  test("volume is conserved across granularities") {
    val total = bars.agg(sum("volume")).as[Long].head()
    val resampled = Resample.ohlcvBars(bars, "5 minutes")
      .agg(sum("volume")).as[Long].head()
    assert(total == resampled)
  }

  test("45-minute phase offset tiles the day session") {
    val dayBars = Seq(
      (t("2024-01-02 08:45:00"), 1.0, 1.0, 1.0, 1.0, 1L),
      (t("2024-01-02 09:44:00"), 2.0, 2.0, 2.0, 2.0, 1L),
      (t("2024-01-02 09:45:00"), 3.0, 3.0, 3.0, 3.0, 1L), // boundary → preceding
      (t("2024-01-02 09:46:00"), 4.0, 4.0, 4.0, 4.0, 1L)
    ).toDF("ts", "open", "high", "low", "close", "volume")
    val out = Resample.ohlcvBars(dayBars, "60 minutes", phase = "45 minutes")
      .orderBy("ts").collect()
    assert(out.map(_.getTimestamp(0).toString.substring(11, 16)).toSeq ==
      Seq("07:45", "08:45", "09:45"))
    // 08:45 exactly on the offset boundary → preceding bucket 07:45
    assert(out(0).getLong(5) == 1L)
    // bucket 08:45 holds 09:44 and 09:45; close = value at 09:45
    assert(out(1).getLong(5) == 2L && out(1).getDouble(4) == 3.0)
  }

  test("OHLC invariant low <= min(open,close) <= max(open,close) <= high") {
    val out = Resample.ohlcvFromTicks(
      Tables.events(spark, sf0001), "value", "5 minutes")
    val bad = out.filter(!(col("low") <= least(col("open"), col("close")) &&
      greatest(col("open"), col("close")) <= col("high"))).count()
    assert(bad == 0)
  }

  test("fillForward synthesizes missing buckets and carries the last close") {
    val sparse = Seq(
      ("A", t("2024-01-02 09:00:00"), 1.0),
      ("A", t("2024-01-02 09:15:00"), 4.0), // 09:05, 09:10 missing
      ("B", t("2024-01-02 09:05:00"), 9.0)
    ).toDF("k", "bts", "close")
    val out = Resample.fillForward(sparse, Seq("k"), "bts", "5 MINUTES",
        Seq("close"))
      .orderBy("k", "bts")
      .select("k", "close", "is_filled")
      .as[(String, Double, Boolean)].collect().toSeq
    assert(out == Seq(
      ("A", 1.0, false), ("A", 1.0, true), ("A", 1.0, true), ("A", 4.0, false),
      ("B", 9.0, false)))
  }
}
