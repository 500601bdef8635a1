package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted,
  SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Task-TIME vs task-WORK decomposition for the TPC-H scale tier
  * (VERDICT r14 #1): TPCH_SF10_r14 showed `tpch_q12_shaped` Σ-task-time
  * growing 27.6× on the 10× sf1→sf10 step (q11 24.4×, q5 22.4×) while
  * every plan marker stayed clean. Two mechanisms produce that signature
  * and "compute-saturated" cannot tell them apart:
  *
  *  - CONTENTION-INFLATED CLOCKS: 32 concurrent tasks on a 32-vCPU box
  *    share memory bandwidth, LLC and (on SMT cores) execution ports;
  *    `executorRunTime` is wall-clock per task, so a task stalled on
  *    memory reads "runs" longer without doing more work. The inflation
  *    only appears once the box saturates — i.e. exactly at the second
  *    decade, masquerading as super-linear work.
  *  - REAL PER-ROW WORK GROWTH: an operator whose cost per input row
  *    rises with data volume (hash tables spilling cache levels, sort
  *    runs deepening). This compounds at 100 TB even on a bigger
  *    cluster and would be a genuine scale hazard.
  *
  * The probe separates them with a CONCURRENCY SWEEP: each query runs in
  * a fresh session at 32 threads and at 8 threads (same tier, same
  * data). Real work is concurrency-invariant — Σ task time at 8 threads
  * ≈ Σ task time at 32 if clocks are honest; if Σ task time SHRINKS at
  * lower concurrency, the difference is contention inflation, not work.
  * Per-row work is then judged on the LOW-concurrency reading
  * (`task_us_per_row` at 8 threads), where clocks are least contended,
  * and the growth gate in tools/tpch_work.sh reads that column.
  *
  * Also recorded per run: input rows (the per-row denominator), GC time
  * (q11 carried 16% GC at sf10 — r14 watch item), and the top-5 stages
  * by Σ task time so a bend is attributable to a specific exchange.
  *
  * FORCED-SHUFFLE leg (r16, VERDICT r15 #3): a broadcast join that
  * graduates to a shuffle join between tiers makes per-row work grow for
  * a CORRECT reason (the big tier pays an exchange the small tier never
  * did) — but "post-graduation work is linear" was an assertion, not a
  * measurement, because the two tiers never ran the SAME plan. With
  * SPARK_GRAFT_WORK_FORCE_SHUFFLE=1 auto-broadcast is disabled (both the
  * static and the AQE threshold), so the small tier runs the shuffle
  * plan too and the per-row growth across the decade is a same-plan
  * comparison; the JSON rows carry "forced_shuffle":true.
  *
  * Usage: Test/runMain graft.TpchWorkProbe <queries> <dir:label>...
  *   env SPARK_GRAFT_WORK_CPUS: comma list of thread counts (default 32,8)
  *   env SPARK_GRAFT_WORK_FORCE_SHUFFLE=1: disable auto-broadcast
  * Prints one JSON line per (query, tier, cpus): {"probe":…}
  */
object TpchWorkProbe {

  private final class WorkListener extends SparkListener {
    val runMs = new java.util.concurrent.atomic.AtomicLong
    val gcMs = new java.util.concurrent.atomic.AtomicLong
    val rowsRead = new java.util.concurrent.atomic.AtomicLong
    val shuffleReadRows = new java.util.concurrent.atomic.AtomicLong
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    def reset(): Unit = {
      runMs.set(0); gcMs.set(0); rowsRead.set(0); shuffleReadRows.set(0)
      byStage.clear(); stageNames.clear()
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        runMs.addAndGet(m.executorRunTime)
        gcMs.addAndGet(m.jvmGCTime)
        rowsRead.addAndGet(m.inputMetrics.recordsRead)
        shuffleReadRows.addAndGet(m.shuffleReadMetrics.recordsRead)
        byStage.merge(e.stageId, m.executorRunTime,
          (a: Long, b: Long) => a + b)
      }
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      stageNames.put(e.stageInfo.stageId, e.stageInfo.name.takeWhile(_ != '\n'))
  }

  def main(args: Array[String]): Unit = {
    val queries = args.headOption.getOrElse("tpch_q12_shaped")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val tiers = args.drop(1).map { a =>
      val Array(dir, label) = a.split(":", 2); (dir, label)
    }.toSeq
    val cpusList = sys.env.getOrElse("SPARK_GRAFT_WORK_CPUS", "32,8")
      .split(",").map(_.trim.toInt).toSeq

    def s3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    // Shuffle partitions stay FIXED across the sweep (default: the max
    // thread count), otherwise the low-concurrency leg also quarters the
    // partition count and its per-partition hash-agg/sort state grows 4x
    // — measured on tpch_q11_shaped at sf10: 8 threads @ 8 partitions
    // read 1.402 us/row vs 0.695 at 32/32, i.e. the cache-residency of a
    // 250k-key vs 62k-key hash table swamped the contention signal the
    // sweep exists to isolate. With partitions pinned, the plan and
    // per-task state are identical and only task CONCURRENCY varies.
    val parts = sys.env.getOrElse("SPARK_GRAFT_WORK_PARTS",
      cpusList.max.toString).toInt
    val forceShuffle =
      sys.env.get("SPARK_GRAFT_WORK_FORCE_SHUFFLE").contains("1")
    for ((dir, label) <- tiers; cpus <- cpusList; q <- queries) {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val b = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
      if (forceShuffle) {
        b.config("spark.sql.autoBroadcastJoinThreshold", "-1")
        b.config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      }
      val spark = b.getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      spark.range(1000).selectExpr("sum(id)").collect()
      val wl = new WorkListener
      spark.sparkContext.addSparkListener(wl)
      case class Run(wall: Double, taskSec: Double, gcSec: Double,
          rows: Long, shufRows: Long, stages: Seq[(Int, String, Double)])
      // The two undiluted big-big probe joins live in TpchScaleBench,
      // not SparkEntry.queries — same definitions so its artifact rows
      // can carry a decomposition too.
      import org.apache.spark.sql.functions.{col, count, lit, sum}
      def buildQ = q match {
        case "probe_orders_x_customer" =>
          spark.read.parquet(s"$dir/orders.parquet")
            .join(spark.read.parquet(s"$dir/customer.parquet"),
              col("o_custkey") === col("c_custkey"))
            .groupBy("c_mktsegment")
            .agg(count(lit(1)).as("n"), sum("o_totalprice").as("rev"))
        case "probe_lineitem_x_supplier" =>
          spark.read.parquet(s"$dir/lineitem.parquet")
            .join(spark.read.parquet(s"$dir/supplier.parquet"),
              col("l_suppkey") === col("s_suppkey"))
            .groupBy("s_nationkey")
            .agg(count(lit(1)).as("n"), sum("l_extendedprice").as("rev"))
        case _ => SparkEntry.queries(q)(spark, dir)
      }
      def once(): Run = {
        spark.sharedState.cacheManager.clearCache()
        wl.reset()
        val t0 = System.nanoTime()
        buildQ.queryExecution.toRdd.count()
        val wall = (System.nanoTime() - t0) / 1e9
        SparkInternals.drainListenerBus(spark.sparkContext)
        import scala.jdk.CollectionConverters._
        val stages = wl.byStage.asScala.toSeq
          .sortBy(-_._2).take(5)
          .map { case (id, ms) =>
            (id, Option(wl.stageNames.get(id)).getOrElse("?"), ms / 1e3) }
        Run(wall, wl.runMs.get() / 1e3, wl.gcMs.get() / 1e3,
          wl.rowsRead.get(), wl.shuffleReadRows.get(), stages)
      }
      // min-of-2 on WALL selects the less-perturbed run; its resource
      // numbers travel together (mixing runs would pair one run's task
      // clock with another's row count).
      val r = Seq(once(), once()).minBy(_.wall)
      val stagesJson = r.stages.map { case (id, nm, sec) =>
        s"""{"stage":$id,"name":"${nm.replaceAll("[\"\\\\]", " ").take(60)}","task_sec":${s3(sec)}}"""
      }.mkString("[", ",", "]")
      val perRowUs = if (r.rows > 0) r.taskSec * 1e6 / r.rows else -1.0
      println(s"""{"probe":"$q","tier":"$label","cpus":$cpus,""" +
        s""""forced_shuffle":$forceShuffle,""" +
        s""""wall_sec":${s3(r.wall)},"task_sec":${s3(r.taskSec)},""" +
        s""""gc_sec":${s3(r.gcSec)},"rows_read":${r.rows},""" +
        s""""shuffle_rows":${r.shufRows},"task_us_per_row":${s3(perRowUs)},""" +
        s""""saturation":${s3(r.taskSec / (r.wall * cpus))},""" +
        s""""top_stages":$stagesJson}""")
      spark.stop()
    }
  }
}
