package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, Sessionize}
import graft.sources.SettleConfigSource

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String) = Timestamp.valueOf(s)

  test("backward as-of join: latest right row at-or-before, per key; no match -> NULL") {
    val trades = Seq(
      (1L, "A", t("2024-01-01 10:00:00"), 100.0),
      (2L, "A", t("2024-01-01 10:05:00"), 101.0),
      (3L, "B", t("2024-01-01 09:00:00"), 200.0)
    ).toDF("trade_id", "sym", "ts", "px")
    val quotes = Seq(
      ("A", t("2024-01-01 09:59:00"), 99.5),
      ("A", t("2024-01-01 10:05:00"), 100.5), // tie: matches trade 2
      ("B", t("2024-01-01 09:30:00"), 199.0)  // after B's trade -> no match
    ).toDF("sym", "ts", "bid")
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "ts", Seq("bid"))
      .orderBy("trade_id").select("trade_id", "bid").collect()
    assert(out(0).getDouble(1) == 99.5)
    assert(out(1).getDouble(1) == 100.5) // inclusive bound: equal-ts quote wins
    assert(out(2).isNullAt(1))
  }

  test("backward as-of join: duplicate (key, ts) quotes resolve to greatest tieCol") {
    val trades = Seq((1L, "A", t("2024-01-01 10:00:00"), 100.0))
      .toDF("trade_id", "sym", "ts", "px")
    val quotes = Seq(
      ("A", t("2024-01-01 09:59:00"), 99.5, 7L),
      ("A", t("2024-01-01 09:59:00"), 98.0, 9L) // same (key, ts): id 9 wins
    ).toDF("sym", "ts", "bid", "qid")
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "ts",
        Seq("bid", "qid"), tieCols = Seq("qid")).collect()
    assert(out(0).getAs[Double]("bid") == 98.0 && out(0).getAs[Long]("qid") == 9L)
  }

  test("forward as-of join: earliest right row strictly after; equal ts excluded; lowest tie wins") {
    val trades = Seq(
      (1L, "A", t("2024-01-01 10:00:00")),
      (2L, "A", t("2024-01-01 10:05:00")),
      (3L, "B", t("2024-01-01 12:00:00"))
    ).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", t("2024-01-01 10:00:00"), 10L), // equal ts: NOT a forward match for trade 1
      ("A", t("2024-01-01 10:03:00"), 20L),
      ("A", t("2024-01-01 10:03:00"), 21L), // tie: lowest quote id wins
      ("B", t("2024-01-01 11:00:00"), 30L)  // before B's trade -> no match
    ).toDF("sym", "ts", "qid")
    val out = AsOfJoin.forward(trades, quotes, Seq("sym"), "ts",
        Seq("qid"), tieCols = Seq("qid"))
      .orderBy("trade_id").select("trade_id", "qid").collect()
    assert(out(0).getLong(1) == 20L) // strictly-after: 10:03, not the 10:00 tie
    assert(out(1).isNullAt(1))       // no quote after 10:05
    assert(out(2).isNullAt(1))       // B's only quote precedes the trade
  }

  test("sessionize: gap splits sessions, boundary gap stays joined") {
    val ev = Seq(
      (7L, t("2024-01-01 10:00:00")),
      (7L, t("2024-01-01 10:29:00")),
      (7L, t("2024-01-01 10:59:00")),  // 30-min gap exactly -> same session
      (7L, t("2024-01-01 12:00:00")),  // > 30 min -> new session
      (9L, t("2024-01-01 10:00:00"))
    ).toDF("user_id", "ts")
    val s = Sessionize.sessions(ev, Seq("user_id"), "ts", gapSeconds = 1800)
      .orderBy("user_id", "session_idx")
      .select("user_id", "session_idx", "n_events")
      .as[(Long, Long, Long)].collect().toSeq
    assert(s == Seq((7L, 0L, 3L), (7L, 1L, 1L), (9L, 0L, 1L)))
  }

  test("settle-config coercion: bad numerics/datetimes null out, null keys drop") {
    val raw = Seq(
      ("202511", "-49", "2955", "2025-10-15 13:30:00", "2025-11-19 13:25:00"),
      ("202512", "oops", "3000", "not-a-date", "2025-12-17 13:25:00"),
      (null, "1", "2", "2025-10-15 13:30:00", "2025-11-19 13:25:00")
    ).toDF("contract_year_month", "next_contract_diff",
      "accumulated_contract_diff", "start_k", "settle_k")
    val out = SettleConfigSource.coerce(raw).orderBy("contract_year_month").collect()
    assert(out.length == 2) // null key dropped
    assert(out(0).getDouble(1) == -49.0)
    assert(out(1).isNullAt(1)) // "oops" -> NULL
    assert(out(1).isNullAt(3)) // "not-a-date" -> NULL
    assert(out(0).getTimestamp(3) == t("2025-10-15 13:30:00"))
  }
}
