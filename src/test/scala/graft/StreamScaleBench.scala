package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming-family scale evidence (VERDICT r12 #3): the stateful
  * streaming operators are proven watermark-bounded and restart-safe, but
  * no artifact showed per-batch cost or state size under INPUT GROWTH.
  * This bench drives the four stateful shapes — bottom-k sketch
  * (`flatMapGroupsWithState`), high-water marks on BOTH state APIs
  * (`flatMapGroupsWithState` and `transformWithState`/RocksDB), and
  * `dropDuplicatesWithinWatermark` — over the driver `events` fixture at
  * each given SF (sf0.01 → sf0.1 is a 10× input step: 10k → 100k events,
  * 150 → 1500 user keys, event-type domain fixed at 5), staged as 8
  * time-octile files so each run is 8 micro-batches of growing size with
  * a monotone watermark (residue-split files would mark everything after
  * batch 1 late and measure the drop path instead).
  *
  * Measured per (fixture, op) from `StreamingQueryProgress` — the
  * engine's own accounting, not wall-clock guesswork:
  *  - wall_sec / rows_per_sec   — end-to-end AvailableNow drain;
  *  - avg/max batch triggerExecution ms — the marginal per-batch cost
  *    that must stay ~linear in batch size;
  *  - state_rows_final (`StateOperatorProgress.numRowsTotal` of the last
  *    state-carrying batch) vs distinct_keys — the bounded-state claim:
  *    sketch state is O(|event_type|) = 5 and must be 10×-INVARIANT;
  *    high-water state is O(|users|) and must track the KEY domain (not
  *    event count); dedup state is O(in-horizon rows), evicted as the
  *    watermark passes.
  *
  * One fresh session per fixture (cold staging excluded from op timing —
  * staging is the deployment's ingest, not the operator). Prints one JSON
  * line per (fixture, op); tools/scale_stream.sh aggregates the growth
  * ratios into SCALE_STREAM_rN.json. The state-bound assertions
  * themselves are spec-pinned in StreamScaleSpec.
  *
  * Usage: Test/runMain graft.StreamScaleBench <sfDir1> <sfDir2> ...
  */
object StreamScaleBench extends QueryShared {

  private def s3(v: Double) =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** Drain `start` to completion, then report the engine's per-batch
    * accounting. Returns (wall, rowsIn, batches, avgMs, maxMs, stateRows). */
  private def drain(q: StreamingQuery): (Double, Long, Int, Double, Long, Long) = {
    val t0 = System.nanoTime()
    q.awaitTermination(600000)
    val wall = (System.nanoTime() - t0) / 1e9
    val ps = q.recentProgress.filter(_.numInputRows > 0)
    val rows = ps.map(_.numInputRows).sum
    val durs = ps.map(p =>
      Option(p.durationMs.get("triggerExecution")).map(_.toLong).getOrElse(0L))
    val stateRows = ps.reverse.collectFirst {
      case p if p.stateOperators.nonEmpty => p.stateOperators.map(_.numRowsTotal).sum
    }.getOrElse(-1L)
    val avg = if (durs.nonEmpty) durs.sum.toDouble / durs.length else 0.0
    (wall, rows, ps.length, avg, if (durs.nonEmpty) durs.max else 0L, stateRows)
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    dirs.foreach { d =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      spark.range(1000).selectExpr("sum(id)").collect()
      import spark.implicits._

      // Stage: 8 time-octile files (single-partition rank is fixture
      // staging only — the same documented exception as the streaming
      // queries' stagers; it runs once, outside the measured window).
      val tmp = stagedTmpDir("graft_stream_scale")
      val ev = spark.read.parquet(s"$d/events.parquet")
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
          col("value"), col("event_type"), col("event_id"))
      val n = ev.count()
      val nKeys = ev.select("user_id").distinct().count()
      val nTypes = ev.select("event_type").distinct().count()
      // Batch-count override (r16, VERDICT r15 #5): running the SAME row
      // count at two batch counts (8 vs 16 octile files) lets the
      // aggregator solve total = batches·fixed + rows·marginal exactly —
      // the fixed micro-batch overhead cancels out analytically instead
      // of being inferred from a cross-tier marginal ratio.
      val nb = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "8").toInt
      val ranked = ev.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("ts"), col("event_id"))))
      for (i <- 0 until nb)
        ranked.filter(col("rn") > i * n / nb && col("rn") <= (i + 1) * n / nb)
          .drop("rn").coalesce(1).write.parquet(s"$tmp/in/o$i")

      def src: DataFrame = spark.readStream
        .schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE, " +
          "event_type STRING, event_id BIGINT")
        .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in/*")

      // Optional op subset (r15: the x1000 per-row-floor tier drives ONE
      // shape over 10M events — running all four would add ~3 idle
      // minutes of fixture staging per op for evidence nobody reads).
      val opsFilter = sys.env.get("SPARK_GRAFT_STREAM_OPS")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      var runId = 0
      def run(op: String, keys: Long)(build: DataFrame => DataFrame): Unit = {
        if (!opsFilter.forall(_.contains(op))) return
        runId += 1
        val qn = s"stream_scale_${op}_$runId"
        val (wall, rows, batches, avgMs, maxMs, stateRows) =
          withStatePartitions(spark, 8) {
            drain(build(src).writeStream.format("memory").queryName(qn)
              .outputMode("append").trigger(Trigger.AvailableNow()).start())
          }
        spark.catalog.dropTempView(qn)
        println(s"""{"dir":"$d","op":"$op","rows":$rows,""" +
          s""""batches":$batches,"wall_sec":${s3(wall)},""" +
          s""""rows_per_sec":${s3(if (wall > 0) rows / wall else 0.0)},""" +
          s""""avg_batch_ms":${s3(avgMs)},"max_batch_ms":$maxMs,""" +
          s""""state_rows_final":$stateRows,"distinct_keys":$keys}""")
      }

      // 1. bottom-k sketch: state O(k) per event_type — 5 keys at EVERY
      //    SF, the flat-state claim.
      run("sketch_fmgws", nTypes) { s0 =>
        graft.streaming.StatefulOps.bottomKSketchStream(
          s0.select(col("event_type"), col("event_id"),
            floor(col("value") * 100).cast("long").as("cents"),
            graft.ops.Dedup.md5Hash64(concat(lit("qsk|"), col("event_id")))
              .bitwiseAND(lit(Long.MaxValue)).as("hk"))
            .as[graft.streaming.StatefulOps.QEvent], k = 256).toDF()
      }
      // 2. high-water, flatMapGroupsWithState: state O(|users|).
      run("highwater_fmgws", nKeys) { s0 =>
        graft.streaming.StatefulOps.highWaterMarks(
          s0.select("user_id", "ts", "value")
            .as[graft.streaming.StatefulOps.Tick]).toDF()
      }
      // 3. high-water, transformWithState on RocksDB (the provider it
      //    requires).
      val pkey = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(pkey)
      spark.conf.set(pkey, "org.apache.spark.sql.execution.streaming." +
        "state.RocksDBStateStoreProvider")
      try run("highwater_tws", nKeys) { s0 =>
        graft.streaming.StatefulOps.highWaterMarksTws(
          s0.select("user_id", "ts", "value")
            .as[graft.streaming.StatefulOps.Tick]).toDF()
      } finally prev match {
        case Some(v) => spark.conf.set(pkey, v)
        case None => spark.conf.unset(pkey)
      }
      // 4. dropDuplicatesWithinWatermark: state O(in-horizon rows) —
      //    evicted as the watermark passes, so the final count tracks the
      //    last octile's tail, not the stream. Synthetic unique text per
      //    event (the dedup keys the state on the text hash).
      run("dedup_within_watermark", n) { s0 =>
        graft.streaming.StreamingPipeline.dedupStream(
          s0.withColumn("text",
            concat_ws("|", col("event_type"), col("user_id"),
              col("event_id"))),
          lateness = "1 minute")
      }
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
