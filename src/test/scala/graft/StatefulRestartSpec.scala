package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.pipeline.IdempotentSink
import graft.streaming.StatefulOps

/** Restart recovery for the CUSTOM-STATE streaming ops (VERDICT r11 #4):
  * RestartRecoverySpec proves kill-and-resume for the windowed-aggregation
  * path; these are the `flatMapGroupsWithState` / `transformWithState`
  * paths, whose state lives in user-defined state variables rather than
  * window buffers — a different recovery code path in the state store.
  *
  * Each test kills a checkpointed query mid-stream, appends the rest of
  * the input, resumes from the same checkpoint, and asserts the resumed
  * output is bit-equal to an uninterrupted straight-through run:
  *
  *  - the bottom-k quantile sketch additionally deletes the last COMMIT
  *    marker before resuming (the crash-after-sink-write-before-commit
  *    window), so the redelivered epoch must overwrite itself idempotently
  *    AND the re-fed state must not double-count (n_seen is the witness:
  *    a sketch that folded the replayed batch twice reports n_seen >
  *    true row count);
  *  - the high-water tests compare against a straight run that processes
  *    ALL files in ONE batch — per-key prefix-maxima over time-ordered
  *    input are batching-invariant, so state resumed from the store must
  *    reproduce them exactly or the emitted set diverges.
  */
class StatefulRestartSpec extends SparkSpec {
  import spark.implicits._

  /** Delete epoch `commits/<last>` (+ its ChecksumFs .crc sibling) so the
    * resume replays that epoch against a sink that already holds its
    * output — RestartRecoverySpec's redelivery construction. */
  private def dropLastCommit(chk: String): Long = {
    val commits = new java.io.File(s"$chk/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.nonEmpty, "no committed epochs before the kill")
    val lastEpoch = commits.last.getName.toLong
    assert(commits.last.delete(), "could not delete last commit marker")
    new java.io.File(commits.last.getParentFile, s".$lastEpoch.crc").delete()
    lastEpoch
  }

  // ---- bottom-k quantile sketch (flatMapGroupsWithState) -----------------

  private val qsSchema = StructType(Seq(
    StructField("event_type", StringType), StructField("n_seen", LongType),
    StructField("k_size", IntegerType),
    StructField("hk_checksum", LongType), StructField("est_p50", LongType)))

  /** 800 deterministic events over 4 types; hk is a fixed odd-multiplier
    * mix (any injective-ish hash works — the sketch contract is about
    * merge identity, not hash quality). */
  private def qEvents: Seq[StatefulOps.QEvent] =
    (0 until 800).map { i =>
      StatefulOps.QEvent(s"t${i % 4}", i.toLong,
        ((i * 37) % 1000).toLong, (i * 2654435761L) & Long.MaxValue)
    }

  private def writeQuarter(inDir: String, q: Int): Unit =
    qEvents.filter(_.event_id % 4 == q).toDS()
      .coalesce(1).write.mode("append").parquet(inDir)

  private def runSketch(inDir: String, chk: String,
      sink: IdempotentSink): Unit = {
    val src = spark.readStream
      .schema("event_type STRING, event_id BIGINT, cents BIGINT, hk BIGINT")
      .option("maxFilesPerTrigger", 1).parquet(inDir)
      .as[StatefulOps.QEvent]
    val q = StatefulOps.bottomKSketchStream(src, k = 64).toDF()
      .writeStream.outputMode("append")
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink.writeBatch(batch, id)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "sketch query did not finish in 120s")
  }

  /** Final summary per key = the max-n_seen row (n_seen is strictly
    * monotone per key), the batching-invariant value the sketch exports. */
  private def finalRows(sink: IdempotentSink): Set[(String, Long, Int, Long, Long)] = {
    import org.apache.spark.sql.expressions.Window
    sink.existing(spark)
      .withColumn("rk", row_number().over(Window
        .partitionBy("event_type").orderBy(desc("n_seen"), desc("batch"))))
      .filter(col("rk") === 1)
      .select("event_type", "n_seen", "k_size", "hk_checksum", "est_p50")
      .as[(String, Long, Int, Long, Long)].collect().toSet
  }

  test("killed quantile-sketch query + redelivered epoch resumes to the straight-through final sketch") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-qsk-restart").toString

    // two quarters arrive, the job processes them and dies; the last
    // epoch's commit marker is lost (crash between sink write and commit)
    writeQuarter(s"$root/in", 0)
    writeQuarter(s"$root/in", 1)
    val sinkA = IdempotentSink(s"$root/outA", qsSchema)
    runSketch(s"$root/in", s"$root/chk", sinkA)
    assert(finalRows(sinkA).nonEmpty, "no summaries before the kill")
    val lastEpoch = dropLastCommit(s"$root/chk")

    // the rest of the stream arrives; resume from the same checkpoint
    writeQuarter(s"$root/in", 2)
    writeQuarter(s"$root/in", 3)
    runSketch(s"$root/in", s"$root/chk", sinkA)

    // uninterrupted reference run over the identical input
    val sinkB = IdempotentSink(s"$root/outB", qsSchema)
    runSketch(s"$root/in", s"$root/chk2", sinkB)

    val resumed = finalRows(sinkA)
    val straight = finalRows(sinkB)
    assert(resumed == straight,
      s"resumed final sketch != straight-through:\n resumed=$resumed\n straight=$straight")
    // double-fold detector: n_seen must equal the true per-key row count —
    // a resume that replayed the uncommitted epoch into ALREADY-UPDATED
    // state would overshoot exactly here
    val trueCounts = qEvents.groupBy(_.event_type).view.mapValues(_.size.toLong).toMap
    resumed.foreach { case (k, n, ksz, _, _) =>
      assert(n == trueCounts(k), s"$k: n_seen=$n, true=${trueCounts(k)}")
      assert(ksz == 64, s"$k: sketch size $ksz != k")
    }
    // the redelivered epoch really re-ran (its batch dir was rewritten)
    assert(new java.io.File(s"$root/outA/batch=$lastEpoch").exists)
  }

  // ---- high-water marks (flatMapGroupsWithState + transformWithState) ----

  private val hwSchema = StructType(Seq(
    StructField("user_id", LongType), StructField("ts", TimestampType),
    StructField("value", DoubleType)))

  /** 5 users × 80 ticks, strictly time-ordered ACROSS files (file f holds
    * ticks [f·100, f·100+100)), so per-key prefix-maxima — the emitted
    * set — are identical under any time-respecting batching. The value
    * walk mixes fresh highs with sub-high noise so both branches of the
    * state update run in every file. */
  private def hwTicks: Seq[StatefulOps.Tick] = {
    val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    (0 until 400).map { i =>
      val user = i % 5
      val v = (i / 5) match {
        case j if j % 7 == 3 => 100.0 + j + user // fresh high
        case j               => (j * 31 % 90).toDouble // noise, mostly below
      }
      StatefulOps.Tick(user.toLong, new Timestamp(base + i * 1000L), v)
    }
  }

  private def writeHwFile(inDir: String, f: Int): Unit =
    hwTicks.slice(f * 100, (f + 1) * 100).toDS()
      .coalesce(1).write.mode("append").parquet(inDir)

  private def runHw(inDir: String, chk: String, sink: IdempotentSink,
      tws: Boolean, onePerTrigger: Boolean): Unit = {
    val rdr = spark.readStream.schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE")
    val src = (if (onePerTrigger) rdr.option("maxFilesPerTrigger", 1) else rdr)
      .parquet(inDir).as[StatefulOps.Tick]
    val marks =
      if (tws) StatefulOps.highWaterMarksTws(src)
      else StatefulOps.highWaterMarks(src)
    val q = marks.toDF().writeStream.outputMode("append")
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink.writeBatch(batch, id)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "high-water query did not finish in 120s")
  }

  private def marksOf(sink: IdempotentSink): Set[(Long, Timestamp, Double)] =
    sink.existing(spark).drop("batch")
      .as[(Long, Timestamp, Double)].collect().toSet

  private def hwRestartScenario(root: String, tws: Boolean): Unit = {
    // two files, kill, two more files, resume from the same checkpoint
    writeHwFile(s"$root/in", 0)
    writeHwFile(s"$root/in", 1)
    val sinkA = IdempotentSink(s"$root/outA", hwSchema)
    runHw(s"$root/in", s"$root/chk", sinkA, tws, onePerTrigger = true)
    val beforeKill = marksOf(sinkA)
    assert(beforeKill.nonEmpty, "no marks emitted before the kill")
    writeHwFile(s"$root/in", 2)
    writeHwFile(s"$root/in", 3)
    runHw(s"$root/in", s"$root/chk", sinkA, tws, onePerTrigger = true)

    // straight-through reference: ALL files in ONE batch — the emitted
    // prefix-maxima are batching-invariant for time-ordered input, so
    // any divergence is a state-recovery defect, not a batching artifact
    val sinkB = IdempotentSink(s"$root/outB", hwSchema)
    runHw(s"$root/in", s"$root/chk2", sinkB, tws, onePerTrigger = false)

    assert(marksOf(sinkA) == marksOf(sinkB),
      s"resumed marks != straight-through: " +
        s"only-resumed=${marksOf(sinkA) -- marksOf(sinkB)} " +
        s"only-straight=${marksOf(sinkB) -- marksOf(sinkA)}")
    // marks emitted before the kill survived the restart untouched
    assert(beforeKill.subsetOf(marksOf(sinkA)))
    // state recovery is load-bearing: find post-kill ticks a FRESH-state
    // replay would emit (new prefix-max within the post-kill suffix) but
    // resumed state must suppress (below the pre-kill high). If that set
    // is empty the fixture can't distinguish resume from replay; if any
    // of them was emitted, the resume lost state.
    val preMax = hwTicks.take(200).groupBy(_.user_id)
      .view.mapValues(_.map(_.value).max).toMap
    var sufMax = Map.empty[Long, Double].withDefaultValue(Double.NegativeInfinity)
    val distinguishing = hwTicks.drop(200).filter { t =>
      val freshHigh = t.value > sufMax(t.user_id)
      if (freshHigh) sufMax += t.user_id -> t.value
      freshHigh && t.value <= preMax(t.user_id)
    }
    assert(distinguishing.nonEmpty,
      "fixture degenerate: no post-kill tick distinguishes resumed state from fresh state")
    val emitted = marksOf(sinkA)
    distinguishing.foreach(t => assert(
      !emitted.contains((t.user_id, t.ts, t.value)),
      s"resume forgot the pre-kill high for user ${t.user_id}: re-emitted $t"))
  }

  test("killed flatMapGroupsWithState high-water query resumes to the straight-through mark set") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-hw-restart").toString
    hwRestartScenario(root, tws = false)
  }

  test("killed transformWithState high-water query resumes to the straight-through mark set") {
    // transformWithState requires the RocksDB state store provider —
    // which also makes this the rocksdb-backed restart check
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val root = java.nio.file.Files
        .createTempDirectory("graft-tws-restart").toString
      hwRestartScenario(root, tws = true)
    } finally {
      old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
