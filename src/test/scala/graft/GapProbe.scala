package graft

import org.apache.spark.sql.SparkSession

/** Suite-context-gap probe (optimization r17): several stable queries run
  * ~0.7–1.1 s slower in-suite than solo with near-zero spread (the gap is
  * deterministic, not noise). This probe reproduces the pressure inside
  * one session — run a mixed pressure set once, then re-time the gap
  * queries — and A/Bs candidate mechanisms:
  *
  *   arm "dirty"  — time gap queries right after the pressure set (the
  *                  in-suite condition);
  *   arm "gc"     — same, but System.gc() + 200 ms cleaner drain before
  *                  each timing (tests the "ContextCleaner backlog /
  *                  heap churn from 400 neighbors" hypothesis);
  *
  * Persistent-RDD and block-manager stats are printed around each arm so
  * block accumulation is visible directly.
  *
  * Usage: Test/runMain graft.GapProbe <sfDir> <gapQ1,gapQ2,...>
  */
object GapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val gapQs = args.drop(1).headOption
      .map(_.split(",").toSeq).getOrElse(Seq("market_basket_lift"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    def timeOne(name: String): Double = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def stats(tag: String): Unit = {
      val sc = spark.sparkContext
      val rdds = sc.getPersistentRDDs
      val mem = sc.getExecutorMemoryStatus.values.headOption
        .map { case (max, free) => s"storage max=${max / 1048576}MB free=${free / 1048576}MB" }
        .getOrElse("?")
      val cg = org.apache.spark.metrics.source.CodegenMetrics
      println(s"[gap] $tag persistentRDDs=${rdds.size} $mem " +
        s"codegenClasses=${cg.METRIC_GENERATED_CLASS_BYTECODE_SIZE.getCount} " +
        s"compilations=${cg.METRIC_COMPILATION_TIME.getCount} " +
        f"meanCompileMs=${cg.METRIC_COMPILATION_TIME.getSnapshot.getMean}%.1f " +
        s"sourceGenCalls=${cg.METRIC_SOURCE_CODE_SIZE.getCount}")
    }
    // warm + solo-ish reference (fresh-session steady state)
    for (q <- gapQs) {
      val xs = (1 to 3).map(_ => timeOne(q))
      println(f"[gap] REF $q min=${xs.min}%.2f samples=${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    // pressure set: a broad mix of mid-weight queries, one run each
    val pressure = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(n => n.startsWith("streaming") || gapQs.contains(n))
      .take(sys.env.getOrElse("GRAFT_PRESSURE_N", "120").toInt)
    stats("before-pressure")
    val tp0 = System.nanoTime()
    pressure.foreach(q => try timeOne(q) catch { case _: Throwable => () })
    println(f"[gap] pressure set of ${pressure.size} ran in ${(System.nanoTime() - tp0) / 1e9}%.0f s")
    stats("after-pressure")
    for (q <- gapQs) {
      val xs = (1 to 2).map(_ => timeOne(q))
      println(f"[gap] DIRTY $q min=${xs.min}%.2f samples=${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    stats("after-dirty")
    for (q <- gapQs) {
      val xs = (1 to 2).map { _ =>
        System.gc(); Thread.sleep(200); timeOne(q)
      }
      println(f"[gap] GC    $q min=${xs.min}%.2f samples=${xs.map(x => f"$x%.2f").mkString(",")}")
    }
    stats("after-gc")
    spark.stop()
  }
}
