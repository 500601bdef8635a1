package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Diagnostic-tier cost decomposition (VERDICT r15 #4): the ~13-15 s
  * residual of the diagnostic tier is attributed to "the O(n²)-by-design
  * referee family plus full-suite context", but no per-member breakdown
  * proves that no single fixable stage remains. This probe runs each
  * diagnostic query solo (fresh-session steady state: warm run first,
  * then the measured run) and records EVERY stage's wall/cpu/task count
  * with its RDD scope chain — the scope names carry the operator
  * (Exchange, BroadcastHashJoin, WholeStageCodegen span members), so a
  * member's cost splits into scheduled-stage overhead vs a dominant
  * stage, and a dominant stage names its operator.
  *
  * Prints one JSON line per query: {"diag":name,"wall_sec":...,
  * "warm_wall_sec":...,"n_stages":N,"sum_stage_wall_sec":...,
  * "stages":[{name,wall_ms,cpu_ms,tasks},... top 8]}.
  *
  * Usage: Test/runMain graft.DiagTierProbe <sfDir> <query1,query2,...>
  */
object DiagTierProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val queries = args.drop(1).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("neardup_method_agreement"))
    def s3(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    for (q <- queries) {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val spark = SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
        .config("spark.sql.shuffle.partitions",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      spark.range(1000).selectExpr("sum(id)").collect()
      // Warm run: codegen compile + JIT leave the measured run with the
      // steady-state cost the tier target is judged on.
      val tw0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      val warmWall = (System.nanoTime() - tw0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      val stages = ArrayBuffer.empty[(String, Long, Long, Int)]
      val l = new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for { s <- si.submissionTime; c <- si.completionTime }
            yield c - s).getOrElse(-1L)
          val scope = si.rddInfos
            .map(r => r.scope.map(_.name).getOrElse(r.name))
            .distinct.mkString("|")
          stages += ((scope.take(120), wall,
            si.taskMetrics.executorRunTime, si.numTasks))
        }
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      SparkInternals.drainListenerBus(spark.sparkContext)
      spark.sparkContext.removeSparkListener(l)
      val top = stages.sortBy(-_._2).take(8).map { case (n, w, c, t) =>
        s"""{"name":"${n.replaceAll("[\"\\\\]", " ")}","wall_ms":$w,"cpu_ms":$c,"tasks":$t}"""
      }.mkString("[", ",", "]")
      println(s"""{"diag":"$q","wall_sec":${s3(wall)},""" +
        s""""warm_wall_sec":${s3(warmWall)},"n_stages":${stages.size},""" +
        s""""sum_stage_wall_sec":${s3(stages.map(_._2).sum / 1e3)},""" +
        s""""sum_stage_cpu_sec":${s3(stages.map(_._3).sum / 1e3)},""" +
        s""""stages":$top}""")
      spark.stop()
    }
  }
}
