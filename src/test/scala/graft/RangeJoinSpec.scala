package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val points = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100L), // exactly at interval start
    (1L, ts("2024-01-01 11:00:00"), 101L), // inside
    (1L, ts("2024-01-01 12:00:00"), 102L), // exactly at interval end
    (1L, ts("2024-01-01 12:00:01"), 103L), // one second past the end
    (2L, ts("2024-01-01 11:00:00"), 104L), // right key, other interval
    (3L, ts("2024-01-01 11:00:00"), 105L)  // key matches no interval
  ).toDF("k", "t", "pid")

  private lazy val intervals = Seq(
    (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 12:00:00"), 10L),
    (2L, ts("2024-01-01 00:30:00"), ts("2024-01-02 23:30:00"), 11L) // spans many buckets
  ).toDF("k", "st", "en", "iid")

  test("closed-interval BETWEEN semantics, including exact bucket boundaries") {
    // bucket width 3600 s puts 10:00/11:00/12:00 on exact bucket edges —
    // the floor-division exactness the bucketOf comment promises
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "t", "st", "en", bucketSeconds = 3600)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((100L, 10L), (101L, 10L), (102L, 10L), (104L, 11L)))
  }

  test("a multi-bucket interval matches each point exactly once (no dup, no distinct)") {
    val got = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "t", "st", "en", bucketSeconds = 60) // interval 11 covers ~2800 buckets
      .groupBy("pid", "iid").count().filter(col("count") > 1).count()
    assert(got == 0)
  }

  test("matches the naive theta join on random-ish data") {
    val p = spark.range(200).select(
      (col("id") % 5).as("k"),
      timestamp_seconds(lit(1704067200L) + col("id") * 977).as("t"),
      col("id").as("pid"))
    val i = spark.range(40).select(
      (col("id") % 5).as("k"),
      timestamp_seconds(lit(1704067200L) + col("id") * 4801).as("st"),
      timestamp_seconds(lit(1704067200L) + col("id") * 4801 + 3000).as("en"),
      col("id").as("iid"))
    val bucketed = RangeJoin.pointInInterval(p, i, Seq("k"), "t", "st", "en",
        bucketSeconds = 900)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = p.join(i, p("k") === i("k") &&
        p("t") >= i("st") && p("t") <= i("en"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(bucketed == naive && naive.nonEmpty)
  }

  test("plans as a hash join — no broadcast NLJ, no cartesian product") {
    val plan = SparkEntry.queries("range_join_error_attribution")(spark, sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"range join degenerated:\n$plan")
  }
}
