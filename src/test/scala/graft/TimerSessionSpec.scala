package graft

import java.sql.Timestamp

import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{SessEvent, SessionOut}

/** Timer-driven sessionization lifecycle the driver query can't isolate:
  * the query's fixture delivers every real event in ONE batch, so the
  * cross-batch paths (session EXTENSION re-arming the timer, and a timer
  * firing only after the watermark passes end+gap) are pinned here.
  */
class TimerSessionSpec extends SparkSpec {
  import spark.implicits._

  private def ev(user: Long, t: String): SessEvent = {
    val ts = Timestamp.valueOf(t)
    SessEvent(user, ts, ts.getTime * 1000L)
  }

  test("session extends across batches; timer fires only on watermark") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = java.nio.file.Files.createTempDirectory("graft-tsess").toString
      def write(name: String, rows: Seq[SessEvent]): Unit =
        rows.toDS().write.parquet(s"$dir/in/$name")
      // batch 1: user 1 opens a session
      write("b1", Seq(ev(1, "2024-01-01 10:00:00"),
        ev(1, "2024-01-01 10:05:00")))
      val stream = spark.readStream
        .schema("user_id BIGINT, ts TIMESTAMP, us BIGINT")
        .parquet(s"$dir/in/*").as[SessEvent]
      val q = StatefulOps.timerSessions(stream, gapSeconds = 600,
          delay = "1 second").toDF()
        .writeStream.format("memory").queryName("tsess_out")
        .outputMode("append")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.ProcessingTime("1 second"))
        .start()
      q.processAllAvailable()
      assert(spark.table("tsess_out").isEmpty,
        "open session must not emit before its timer")
      // batch 2: within gap -> EXTENDS the stored session (timer re-arms)
      write("b2", Seq(ev(1, "2024-01-01 10:12:00")))
      q.processAllAvailable()
      assert(spark.table("tsess_out").isEmpty,
        "extension must keep the session open")
      // batch 3: watermark advancer far past end+gap; its batch computes
      // the new watermark, the NEXT batch fires the timer
      write("b3", Seq(ev(99, "2024-01-01 12:00:00")))
      q.processAllAvailable()
      write("b4", Seq(ev(99, "2024-01-01 12:00:01")))
      q.processAllAvailable()
      q.stop()
      val out = spark.table("tsess_out").as[SessionOut].collect()
        .filter(_.user_id == 1L)
      assert(out.length == 1, s"exactly one session: ${out.toSeq}")
      assert(out.head.n_events == 3L, "all three events in one session")
      assert(out.head.start_us ==
        Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000L)
      assert(out.head.end_us ==
        Timestamp.valueOf("2024-01-01 10:12:00").getTime * 1000L)
    } finally {
      old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
