package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pipeline.Bucketing
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.Tick

class StatefulBucketingSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState high-water marks persist state across micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft-state").toString
    def write(name: String, rows: Seq[Tick]): Unit =
      rows.toDS().write.parquet(s"$dir/in/$name")
    // batch 1: user 1 rises to 30; user 2 to 10
    write("b1", Seq(
      Tick(1L, Timestamp.valueOf("2024-01-01 10:00:00"), 10.0),
      Tick(1L, Timestamp.valueOf("2024-01-01 10:01:00"), 30.0),
      Tick(1L, Timestamp.valueOf("2024-01-01 10:02:00"), 20.0),
      Tick(2L, Timestamp.valueOf("2024-01-01 10:00:00"), 10.0)))

    val stream = spark.readStream
      .schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE")
      .parquet(s"$dir/in/*")
      .as[Tick]
    val q = StatefulOps.highWaterMarks(stream).writeStream
      .format("memory").queryName("hwm_out")
      .outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.ProcessingTime("1 second"))
      .start()
    q.processAllAvailable()
    val afterB1 = spark.table("hwm_out").as[StatefulOps.HighWater]
      .collect().map(h => (h.user_id, h.value)).toSet
    assert(afterB1 == Set((1L, 10.0), (1L, 30.0), (2L, 10.0))) // 20.0 not a new max

    // batch 2: user 1 only beats the stored 30 with 31; user 2 stays below
    write("b2", Seq(
      Tick(1L, Timestamp.valueOf("2024-01-01 11:00:00"), 25.0),
      Tick(1L, Timestamp.valueOf("2024-01-01 11:01:00"), 31.0),
      Tick(2L, Timestamp.valueOf("2024-01-01 11:00:00"), 5.0)))
    q.processAllAvailable()
    q.stop()
    val afterB2 = spark.table("hwm_out").as[StatefulOps.HighWater]
      .collect().map(h => (h.user_id, h.value)).toSet
    assert(afterB2 == afterB1 + ((1L, 31.0))) // state crossed the batch boundary
  }

  test("transformWithState high-water marks match the flatMapGroupsWithState form") {
    // transformWithState requires the RocksDB state store provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft-tws").toString
      def write(name: String, rows: Seq[Tick]): Unit =
        rows.toDS().write.parquet(s"$dir/in/$name")
      write("b1", Seq(
        Tick(1L, Timestamp.valueOf("2024-01-01 10:00:00"), 10.0),
        Tick(1L, Timestamp.valueOf("2024-01-01 10:01:00"), 30.0),
        Tick(1L, Timestamp.valueOf("2024-01-01 10:02:00"), 20.0),
        Tick(2L, Timestamp.valueOf("2024-01-01 10:00:00"), 10.0)))
      val stream = spark.readStream
        .schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE")
        .parquet(s"$dir/in/*")
        .as[Tick]
      val q = StatefulOps.highWaterMarksTws(stream).writeStream
        .format("memory").queryName("tws_out")
        .outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.ProcessingTime("1 second"))
        .start()
      q.processAllAvailable()
      val afterB1 = spark.table("tws_out").as[StatefulOps.HighWater]
        .collect().map(h => (h.user_id, h.value)).toSet
      assert(afterB1 == Set((1L, 10.0), (1L, 30.0), (2L, 10.0)))
      // ValueState must persist across micro-batches, same as GroupState
      write("b2", Seq(
        Tick(1L, Timestamp.valueOf("2024-01-01 11:00:00"), 25.0),
        Tick(1L, Timestamp.valueOf("2024-01-01 11:01:00"), 31.0),
        Tick(2L, Timestamp.valueOf("2024-01-01 11:00:00"), 5.0)))
      q.processAllAvailable()
      q.stop()
      val afterB2 = spark.table("tws_out").as[StatefulOps.HighWater]
        .collect().map(h => (h.user_id, h.value)).toSet
      assert(afterB2 == afterB1 + ((1L, 31.0)))
    } finally {
      old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("bucketed fact-fact join runs with zero exchanges") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sf0001).select($"l_orderkey", $"l_quantity"),
        "b_lineitem", "l_orderkey", 8)
      Bucketing.writeBucketed(
        Tables.orders(spark, sf0001).select($"o_orderkey", $"o_totalprice"),
        "b_orders", "o_orderkey", 8)
      val j = spark.table("b_lineitem")
        .join(spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffled:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"unexpected join strategy:\n$plan")
      // same row count as the unbucketed join
      val expected = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001), $"l_orderkey" === $"o_orderkey").count()
      assert(j.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
