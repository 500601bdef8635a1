package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import scala.collection.mutable.ArrayBuffer

/** Streaming-cost decomposition (optimization r16): the streaming family
  * is the bench's largest solo block (~32 s over ~16 queries) and each
  * member's wall is dominated by fixed micro-batch machinery, not row
  * work. This probe runs each named streaming query solo (warm run
  * first, then the measured run) with a StreamingQueryListener attached
  * and prints every micro-batch's durationMs map (triggerExecution,
  * queryPlanning, addBatch, walCommit, commitOffsets, latestOffset,
  * getBatch) — so a member's cost splits into per-batch planning,
  * state-store commit, offset-log I/O, and actual addBatch work.
  *
  * Usage: Test/runMain graft.StreamCostProbe <sfDir> <q1,q2,...>
  */
object StreamCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queries = args.drop(1).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("streaming_5m_ohlcv"))
    for (q <- queries) {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val b = SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      // A/B knob: checkpoint-root override (e.g. a tmpfs path), to measure
      // how much of the per-batch cost is checkpoint/state-store file I/O.
      val b2 = sys.env.get("GRAFT_CKPT_DIR")
        .fold(b)(dir => b.config("spark.sql.streaming.checkpointLocation", dir))
      // A/B knob: state-store provider (e.g. RocksDB), to attribute the
      // run≫cpu wait inside stateful-operator tasks.
      val spark = sys.env.get("GRAFT_SS_PROVIDER")
        .fold(b2)(p => b2.config(
          "spark.sql.streaming.stateStore.providerClass", p))
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      spark.range(1000).selectExpr("sum(id)").collect()
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      val warm = (System.nanoTime() - t0) / 1e9
      val batches = ArrayBuffer.empty[String]
      val l = new StreamingQueryListener {
        override def onQueryStarted(
            e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          import scala.jdk.CollectionConverters._
          val dur = p.durationMs.asScala.map { case (k, v) => s"$k=$v" }
            .toSeq.sorted.mkString(",")
          batches += s"batch=${p.batchId} rows=${p.numInputRows} $dur"
        }
        override def onQueryTerminated(
            e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(l)
      // Stage-level decomposition of addBatch: per-stage wall (submit →
      // complete), task count, and summed executor CPU, so the gap
      // between addBatch and actual row work is attributable.
      val stages = ArrayBuffer.empty[String]
      val sl = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val wallMs = (for {
            c <- si.completionTime; s <- si.submissionTime
          } yield c - s).getOrElse(-1L)
          val tm = si.taskMetrics
          val cpuMs = tm.executorCpuTime / 1000000
          val runMs = tm.executorRunTime
          val gcMs = tm.jvmGCTime
          val fetchMs = tm.shuffleReadMetrics.fetchWaitTime
          val writeMs = tm.shuffleWriteMetrics.writeTime / 1000000
          stages += f"stage=${si.stageId} tasks=${si.numTasks} wall=${wallMs}ms run=${runMs}ms cpu=${cpuMs}ms gc=${gcMs}ms fetchWait=${fetchMs}ms shufWrite=${writeMs}ms ${si.name.take(60)}"
        }
      }
      spark.sparkContext.addSparkListener(sl)
      val t1 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      val wall = (System.nanoTime() - t1) / 1e9
      // progress events are async; poll until the batch list stops
      // growing (two consecutive quiet 200 ms windows) instead of a fixed
      // sleep, which on a loaded box silently dropped late QueryProgress
      // events and under-reported the per-batch durations this probe
      // exists to measure (ADVICE r16).
      var lastSize = -1; var quiet = 0
      while (quiet < 2) {
        Thread.sleep(200)
        if (batches.size == lastSize) quiet += 1
        else { quiet = 0; lastSize = batches.size }
      }
      spark.streams.removeListener(l)
      spark.sparkContext.removeSparkListener(sl)
      println(f"[streamcost] $q warm=$warm%.2f s measured=$wall%.2f s")
      batches.foreach(b => println(s"[streamcost]   $b"))
      stages.foreach(b => println(s"[streamcost]   $b"))
      spark.stop()
    }
  }
}
