package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec,
  SortMergeJoinExec}

/** AQE skew-join evidence over the skewed TPC-H fixture (VERDICT r11 #5):
  * runs the skew-sensitive queries with AQE skew mitigation ON and OFF
  * and records, per query, the best-of-2 wall time in each mode plus the
  * number of skew-handled joins / skew-split shuffle reads AQE actually
  * planned — so the artifact shows mitigation ENGAGING (plan markers),
  * not just a time delta that could be noise.
  *
  * Broadcast joins are disabled for the run: at this toy scale supplier/
  * customer would broadcast and no shuffle would exist to skew; at the
  * real 100 TB these dims are 100M+ rows and the joins ARE big-big
  * shuffles — forcing SMJ emulates that shape (the standard skew-demo
  * setup). The AQE skew thresholds are scaled to the fixture
  * (~6-15 MB hot partitions vs the 256 MB cluster default) the same way
  * a cluster operator sizes them to executor memory.
  *
  * Usage: Test/runMain graft.TpchSkewBench <skewDir> [outJson]
  */
object TpchSkewBench {

  private val queries = Seq(
    "tpch_q3_shipping",     // customer⋈orders⋈lineitem, hot custkey
    "tpch_q10_returned_items",
    "tpch_q18_large_orders",
    "tpch_q9_shaped",       // lineitem⋈supplier(⋈part⋈orders), hot suppkey
    "tpch_q21_shaped")

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/tmp-tpch-skew")
    val out = args.lift(1).getOrElse("TPCH_SKEW_r12.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // big-big emulation: see scaladoc
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // fixture-scaled skew thresholds (cluster default 256MB assumes
      // executor-sized partitions; the hot partitions here are ~6-15MB)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2MB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def gather(p: SparkPlan): Seq[SparkPlan] = {
      val extra = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Nil
      }
      p +: (p.children ++ extra ++ p.subqueries).flatMap(gather)
    }

    /** (seconds, skew-marked joins, skew-split AQE reads) for one run. */
    def run(name: String): (Double, Int, Int) = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      df.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val nodes = gather(df.queryExecution.executedPlan)
      val skewJoins = nodes.count {
        case j: SortMergeJoinExec => j.isSkewJoin
        case j: ShuffledHashJoinExec => j.isSkewJoin
        case _ => false
      }
      val skewReads = nodes.count {
        case r: AQEShuffleReadExec => r.hasSkewedPartition
        case _ => false
      }
      (sec, skewJoins, skewReads)
    }

    def sec(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val rows = queries.map { q =>
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val off = Seq(run(q), run(q)).minBy(_._1)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val on = Seq(run(q), run(q)).minBy(_._1)
      println(s"[tpch-skew] $q: off=${sec(off._1)}s " +
        s"on=${sec(on._1)}s skew_joins=${on._2} skew_reads=${on._3}")
      s"""  "$q": {"skew_off_sec": ${sec(off._1)}, "skew_on_sec": ${sec(on._1)}, """ +
        s""""speedup": ${sec(off._1 / math.max(on._1, 1e-9))}, """ +
        s""""skew_joins_marked": ${on._2}, "skew_split_reads": ${on._3}, """ +
        s""""skew_joins_marked_off": ${off._2}}"""
    }
    val json = s"""{"fixture": "$dir",
      |"note": "broadcast disabled (big-big emulation); AQE skew thresholds scaled to fixture partition sizes (2MB/1MB/factor 2 vs 256MB cluster default)",
      |"queries": {
      |${rows.mkString(",\n")}
      |}}""".stripMargin
    val w = new java.io.PrintWriter(out)
    try w.println(json) finally w.close()
    println(s"[tpch-skew] -> $out")
    spark.stop()
  }
}
