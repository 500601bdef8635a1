package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec,
  SortMergeJoinExec}

/** AQE skew-join evidence over the skewed TPC-H fixture (VERDICT r11 #5):
  * runs skew-loaded joins with AQE skew mitigation ON and OFF and
  * records, per entry, the best-of-2 wall time in each mode plus the
  * skew-handled joins / skew-split shuffle reads AQE actually planned —
  * so the artifact shows mitigation ENGAGING (plan markers), not just a
  * time delta that could be noise.
  *
  * Two tiers, matching the two real mitigations:
  *  - `probe_*` entries are undiluted big-big joins on the hot keys with
  *    broadcast disabled — the 100 TB shape where both sides shuffle
  *    (customer/supplier at sf100k are 100M+ rows). These must show
  *    skew markers AND a speedup: that is AQE skew-join working.
  *  - the named tpch_* queries keep their production plans, which
  *    broadcast() the dim side explicitly — a broadcast join never
  *    shuffles the probe side, so a hot custkey/suppkey costs NOTHING
  *    there (zero markers is the CORRECT reading: mitigation tier 1 is
  *    "don't shuffle on the skewed key at all"; AQE skew-join is the
  *    tier-2 fallback once the dim outgrows broadcast). Their
  *    `bcast_joins` count is recorded so the immunity is visible.
  *
  * The AQE skew thresholds are scaled to the fixture (~1-15 MB hot
  * partitions vs the 256 MB cluster default) the same way a cluster
  * operator sizes them to executor memory.
  *
  * Usage: Test/runMain graft.TpchSkewBench <skewDir> [outJson]
  */
object TpchSkewBench {

  private val queries = Seq(
    "tpch_q3_shipping",     // customer⋈orders⋈lineitem, hot custkey
    "tpch_q13_custdist",    // customer LEFT JOIN orders — the custkey
                            // join with NO selective dim filter, so the
                            // hot key survives undiluted
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
      // big-big emulation for the probes (auto-broadcast off; the named
      // queries' EXPLICIT broadcast() hints still apply — see scaladoc)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      // fixture-scaled skew thresholds (cluster default 256MB assumes
      // executor-sized partitions; the hot partitions here are ~1-15MB)
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512KB")
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

    // Direct probe joins on the skewed keys, with no dim filtering —
    // the clean demonstration that mitigation ENGAGES (the named tpch
    // queries additionally filter suppliers/parts/dates, diluting the
    // hot key; their rows measure end-to-end deltas on real shapes).
    import org.apache.spark.sql.functions._
    def probes(s: SparkSession): Map[String, () => org.apache.spark.sql.DataFrame] = Map(
      "probe_orders_x_customer" -> (() =>
        s.read.parquet(s"$dir/orders.parquet")
          .join(s.read.parquet(s"$dir/customer.parquet"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), sum("o_totalprice").as("rev"))),
      "probe_lineitem_x_supplier" -> (() =>
        s.read.parquet(s"$dir/lineitem.parquet")
          .join(s.read.parquet(s"$dir/supplier.parquet"),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n"), sum("l_extendedprice").as("rev"))))

    /** (seconds, skew-marked joins, skew-split AQE reads, broadcast
      * joins) for one run. */
    def run(name: String): (Double, Int, Int, Int) = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val df = probes(spark).get(name).map(_.apply())
        .getOrElse(SparkEntry.queries(name)(spark, dir))
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
      val bcastJoins = nodes.count {
        case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => true
        case _ => false
      }
      (sec, skewJoins, skewReads, bcastJoins)
    }

    def sec(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

    val allNames = probes(spark).keys.toSeq.sorted ++ queries
    val rows = allNames.map { q =>
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val off = Seq(run(q), run(q)).minBy(_._1)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      val on = Seq(run(q), run(q)).minBy(_._1)
      println(s"[tpch-skew] $q: off=${sec(off._1)}s " +
        s"on=${sec(on._1)}s skew_joins=${on._2} skew_reads=${on._3} " +
        s"bcast_joins=${on._4}")
      s"""  "$q": {"skew_off_sec": ${sec(off._1)}, "skew_on_sec": ${sec(on._1)}, """ +
        s""""speedup": ${sec(off._1 / math.max(on._1, 1e-9))}, """ +
        s""""skew_joins_marked": ${on._2}, "skew_split_reads": ${on._3}, """ +
        s""""bcast_joins": ${on._4}}"""
    }
    val json = s"""{"fixture": "$dir",
      |"note": "probe_* = undiluted big-big joins on the hot keys (auto-broadcast off): skew markers + speedup show AQE skew-join engaging. tpch_* = production plans, where the hot key never reaches a splittable shuffle: q3/q9 broadcast() the dim explicitly (bcast_joins > 0 - skew-immune by broadcast, the tier-1 mitigation), q13 is a LEFT OUTER with the skew on the right side (AQE cannot split the non-preserved side), and q18/q21's selective semi/anti stages collapse the hot key before its join - their rows record end-to-end deltas on those real shapes. Skew thresholds scaled to fixture partition sizes (1MB/512KB/factor 2 vs 256MB cluster default).",
      |"queries": {
      |${rows.mkString(",\n")}
      |}}""".stripMargin
    val w = new java.io.PrintWriter(out)
    try w.println(json) finally w.close()
    println(s"[tpch-skew] -> $out")
    spark.stop()
  }
}
