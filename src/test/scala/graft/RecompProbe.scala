package graft

import org.apache.spark.sql.SparkSession

/** Which queries generate DIFFERENT codegen sources on every run?
  * (Those can never hit the codegen cache — optimization r17.) Runs each
  * named query 3× in one session and prints the compilation-count delta
  * per run; a nonzero delta on run 2+ means run-varying generated code.
  */
object RecompProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qs = args.drop(1).headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("fingerprint_modp_candidates"))
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cg = org.apache.spark.metrics.source.CodegenMetrics
    for (q <- qs) {
      val deltas = (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        val c0 = cg.METRIC_COMPILATION_TIME.getCount
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        f"${cg.METRIC_COMPILATION_TIME.getCount - c0}%d compiles/${dt}%.2f s"
      }
      println(s"[recomp] $q: ${deltas.mkString(" | ")}")
    }
    spark.stop()
  }
}
