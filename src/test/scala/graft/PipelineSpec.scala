package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.QualityGates
import graft.pipeline.{ContinuousPipeline, Sink}
import graft.time.SessionCalendar

/** Golden end-to-end test of the continuous pipeline against the pandas
  * ground truth (values cross-checked against a real
  * `resample('5min', label='left', closed='right')` /
  * `resample('60min', offset='45min')` run) and the reference README's two
  * acceptance criteria (README.md:161-167): session continuity across the
  * year boundary and a uniform accumulated diff within a contract period.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  // Sessions: 2025-12-30 D+N, 2025-12-31 D+N (night wraps the year
  // boundary), 2026-01-02 D+N — all complete.
  private lazy val fullGrid =
    FixtureBars.daySession("2025-12-30") ++ FixtureBars.nightSession("2025-12-30") ++
    FixtureBars.daySession("2025-12-31") ++ FixtureBars.nightSession("2025-12-31") ++
    FixtureBars.daySession("2026-01-02") ++ FixtureBars.nightSession("2026-01-02")

  private lazy val raw = FixtureBars.bars(fullGrid).toDF()

  // Two tiling contracts; all fixture bars fall in 202601's window with
  // accumulated diff 2737 (the README's screenshot value).
  private lazy val cfg = Seq(
    ("202512", Some(-49.0), Some(2688.0),
      Some(Timestamp.valueOf("2025-11-19 13:30:00")), Some(Timestamp.valueOf("2025-12-17 13:25:00"))),
    ("202601", Some(12.0), Some(2737.0),
      Some(Timestamp.valueOf("2025-12-17 13:30:00")), Some(Timestamp.valueOf("2026-01-21 13:25:00")))
  ).toDF("contract_year_month", "next_contract_diff", "accumulated_contract_diff",
    "start_k", "settle_k")

  private lazy val five = ContinuousPipeline.fiveMinute(raw, cfg).cache()
  private lazy val sixty = ContinuousPipeline.sixtyMinute(raw, cfg).cache()

  test("complete sessions have exactly D=60/N=168 five-min and D=5/N=14 sixty-min bars") {
    val c5 = five.groupBy(SessionCalendar.sessionId($"ts").as("s"))
      .count().as[(String, Long)].collect().toMap
    assert(c5 == Map(
      "2025-12-30_D" -> 60L, "2025-12-30_N" -> 168L,
      "2025-12-31_D" -> 60L, "2025-12-31_N" -> 168L,
      "2026-01-02_D" -> 60L, "2026-01-02_N" -> 168L))
    val c60 = sixty.groupBy(SessionCalendar.sessionId($"ts").as("s"))
      .count().as[(String, Long)].collect().toMap
    assert(c60.values.toSeq.sorted == Seq(5L, 5L, 5L, 14L, 14L, 14L))
  }

  test("sixty-min day buckets are labeled 08:45..12:45 (45-min phase, closed-left)") {
    val labels = sixty
      .filter($"date_market_type".endsWith("D") && $"date_market_type".startsWith("251231"))
      .orderBy("ts").select(date_format($"ts", "HH:mm")).as[String].collect().toSeq
    assert(labels == Seq("08:45", "09:45", "10:45", "11:45", "12:45"))
  }

  test("first 5-min/60-min bars match the pandas ground truth (before adjustment)") {
    // fixture batch numbering restarts per generation; day 2025-12-30 is
    // bars 0..299 → first 5-min bucket: O=0 H=5 L=-1 C=4.5 V=5 (+2737 adj)
    val b5 = five.orderBy("ts").limit(1).collect()(0)
    assert(b5.getAs[Double]("open") == 0.0 + 2737)
    assert(b5.getAs[Double]("high") == 5.0 + 2737)
    assert(b5.getAs[Double]("low") == -1.0 + 2737)
    assert(b5.getAs[Double]("close") == 4.5 + 2737)
    assert(b5.getAs[Long]("volume") == 5L)
    val b60 = sixty.orderBy("ts").limit(1).collect()(0)
    assert(b60.getAs[Double]("open") == 0.0 + 2737)
    assert(b60.getAs[Double]("high") == 60.0 + 2737)
    assert(b60.getAs[Double]("low") == -1.0 + 2737)
    assert(b60.getAs[Double]("close") == 59.5 + 2737)
    assert(b60.getAs[Long]("volume") == 60L)
  }

  test("README acceptance: 251231N session runs across the year boundary into 260102D") {
    val seq = five.orderBy("ts").select($"date_market_type").as[String]
      .collect().distinct.toSeq
    val i = seq.indexOf("251231N")
    assert(i >= 0 && seq(i + 1) == "260102D")
    // pre-dawn Jan 1 bars carry the Dec 31 night label
    val newYear = five.filter(date_format($"ts", "yyyy-MM-dd") === "2026-01-01")
    assert(newYear.count() > 0)
    assert(newYear.filter($"date_market_type" =!= "251231N").count() == 0)
  }

  test("README acceptance: uniform accumulated_contract_diff inside the contract period") {
    val diffs = five.select($"accumulated_contract_diff").distinct().as[Double].collect()
    assert(diffs.toSeq == Seq(2737.0))
    assert(five.filter($"contract_year_month" =!= "202601").count() == 0)
  }

  test("volume is conserved raw → 5-min → 60-min") {
    val vRaw = raw.agg(sum("volume")).as[Long].head()
    assert(five.agg(sum("volume")).as[Long].head() == vRaw)
    assert(sixty.agg(sum("volume")).as[Long].head() == vRaw)
  }

  test("in-flight session drop + completeness gate") {
    // truncated trailing day session (in-flight at now=11:00)
    val partial = FixtureBars.bars(
      fullGrid ++ FixtureBars.daySession("2026-01-05").takeWhile(
        _.isBefore(java.time.LocalDateTime.parse("2026-01-05T11:00")))).toDF()
    val f = ContinuousPipeline.fiveMinute(partial, cfg)
    intercept[QualityGates.IncompleteSessionException] {
      QualityGates.checkCompleteness(f, 5)
    }
    val now = Timestamp.valueOf("2026-01-05 11:00:00")
    val dropped = QualityGates.dropIncompleteActiveSession(f, 5, now)
    QualityGates.checkCompleteness(dropped, 5) // no throw
    assert(dropped.filter(SessionCalendar.sessionId($"ts") === "2026-01-05_D").count() == 0)
  }

  test("incremental run appends only new rows (watermark idempotency)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val sink = Sink(s"$dir/five", graft.model.Schemas.outputBars)
    // first load: first two days
    val firstDays = FixtureBars.bars(
      FixtureBars.daySession("2025-12-30") ++ FixtureBars.nightSession("2025-12-30")).toDF()
    val f1 = ContinuousPipeline.fiveMinute(firstDays, cfg)
      .withColumn("mxf_code", lit("MXFR1"))
    sink.append(f1)
    val n1 = sink.existing(spark).count()
    assert(n1 == 228) // 60 + 168
    // second run re-reads overlap + new day
    val f2 = ContinuousPipeline.fiveMinute(raw, cfg).withColumn("mxf_code", lit("MXFR1"))
    val fresh = graft.ops.Watermark.incremental(f2, sink.existing(spark))
    sink.append(fresh)
    assert(sink.existing(spark).count() == f2.count()) // no dups, nothing lost
    // applying the watermark twice is idempotent
    assert(graft.ops.Watermark.incremental(fresh, sink.existing(spark)).count() == 0)
  }

  test("full run() with injected now") {
    val dir = java.nio.file.Files.createTempDirectory("graft-run").toString
    val s5 = Sink(s"$dir/5m", graft.model.Schemas.outputBars)
    val s60 = Sink(s"$dir/60m", graft.model.Schemas.outputBars)
    val (f, x) = ContinuousPipeline.run(raw, cfg, s5, s60,
      now = Timestamp.valueOf("2026-01-03 12:00:00"), mxfCode = "MXFR1")
    assert(s5.existing(spark).count() == 3 * 228)
    assert(s60.existing(spark).count() == 3 * 19)
    assert(s5.existing(spark).select("mxf_code").distinct().as[String].collect().toSeq
      == Seq("MXFR1"))
  }
}
