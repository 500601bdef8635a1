package graft
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

object ProfileAqe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stages = ArrayBuffer.empty[(String, Long, Long, Int)]
    val l = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        val rdds = si.rddInfos.map(r => r.scope.map(_.name).getOrElse(r.name)).distinct.mkString(" | ")
        stages += ((rdds.take(160), wall, si.taskMetrics.executorRunTime, si.numTasks))
      }
    }
    val q = args.headOption.getOrElse("minhash_band_recall_curve")
    // warm first
    SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
    spark.sharedState.cacheManager.clearCache()
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    SparkEntry.queries(q)(spark, "/root/testdata/sf0.1").count()
    val wall = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(l)
    Thread.sleep(500)
    println(f"[stages] total $wall%.2f s, ${stages.size} stages, sum-stage-wall ${stages.map(_._2).sum / 1000.0}%.2f s")
    stages.sortBy(-_._2).take(20).foreach { case (n, w, rt, t) =>
      println(f"[stages] ${w}ms wall ${rt}ms cpu $t%d tasks  $n")
    }
    spark.stop()
  }
}
