package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Spec-pins the streaming STATE BOUNDS at the 10× fixture (VERDICT r12
  * #3 — the artifact companion is SCALE_STREAM_r13.json from
  * tools/scale_stream.sh): after draining sf0.1's 100k events through the
  * stateful operators in 4 cross-batch files,
  *  - the bottom-k sketch's state store holds exactly |event_type| = 5
  *    rows — the SAME count as at sf0.001/sf0.01, i.e. state is
  *    scale-INVARIANT (O(k) per key, key domain fixed);
  *  - the high-water operator's state holds exactly |distinct users|
  *    rows — the KEY domain (1500 at sf0.1), never the event count
  *    (100k): state grows with keys, not stream length.
  * Both reads come from `StateOperatorProgress.numRowsTotal` — the state
  * store's own accounting, so a leak (state rows ≈ events) or a loss
  * (state rows < keys) fails the equality, not a heuristic.
  */
class StreamScaleSpec extends SparkSpec with QueryShared {
  private val sf01 = "/root/testdata/sf0.1"

  private def staged(): String = {
    val tmp = stagedTmpDir("graft_stream_scale_spec")
    val ev = spark.read.parquet(s"$sf01/events.parquet")
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
        col("value"), col("event_type"), col("event_id"))
    val n = ev.count()
    val ranked = ev.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("ts"), col("event_id"))))
    for (i <- 0 until 4)
      ranked.filter(col("rn") > i * n / 4 && col("rn") <= (i + 1) * n / 4)
        .drop("rn").coalesce(1).write.parquet(s"$tmp/in/q$i")
    tmp
  }
  private lazy val root = staged()

  private def drainStateRows(out: org.apache.spark.sql.DataFrame,
      name: String): Long = {
    val q = withStatePartitions(spark, 4) {
      out.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
    }
    q.awaitTermination(300000)
    val state = q.recentProgress.filter(_.numInputRows > 0).reverse
      .collectFirst { case p if p.stateOperators.nonEmpty =>
        p.stateOperators.map(_.numRowsTotal).sum }
      .getOrElse(-1L)
    spark.catalog.dropTempView(name)
    state
  }

  private def src = spark.readStream
    .schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE, " +
      "event_type STRING, event_id BIGINT")
    .option("maxFilesPerTrigger", "1").parquet(s"$root/in/*")

  test("bottom-k sketch state is scale-invariant: 5 rows at 100k events") {
    import spark.implicits._
    val state = drainStateRows(
      graft.streaming.StatefulOps.bottomKSketchStream(
        src.select(col("event_type"), col("event_id"),
          floor(col("value") * 100).cast("long").as("cents"),
          graft.ops.Dedup.md5Hash64(concat(lit("qsk|"), col("event_id")))
            .bitwiseAND(lit(Long.MaxValue)).as("hk"))
          .as[graft.streaming.StatefulOps.QEvent], k = 256).toDF(),
      "stream_scale_spec_sketch")
    assert(state === 5L)
  }

  test("high-water state tracks the key domain, not the event count") {
    import spark.implicits._
    val users = spark.read.parquet(s"$sf01/events.parquet")
      .select("user_id").distinct().count()
    val state = drainStateRows(
      graft.streaming.StatefulOps.highWaterMarks(
        src.select("user_id", "ts", "value")
          .as[graft.streaming.StatefulOps.Tick]).toDF(),
      "stream_scale_spec_hw")
    assert(state === users)
    assert(users === 1500L) // and the domain really is 10× sf0.01's 150
  }
}
