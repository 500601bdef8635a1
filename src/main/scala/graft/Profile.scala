package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: time selected queries twice in one session to
  * separate plan/codegen overhead from steady-state execution.
  * `runMain graft.Profile <sfDir> <query1> <query2> ...`
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("GRAFT_LOG", "ERROR"))
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    if (args.tail.headOption.contains("showplans")) {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.execution.ExplainMode
      def show(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
        println(s"===== $label =====")
        println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      }
      show("resample", SparkEntry.queries("resample_5m_ohlcv")(spark, sfDir))
      show("resample_bars", graft.ops.Resample.ohlcvBars(
        Tables.events(spark, sfDir).select(col("ts"), col("value").as("open"),
          col("value").as("high"), col("value").as("low"), col("value").as("close"),
          lit(1L).as("volume")), "5 minutes"))
      show("dedup_exact", graft.ops.Dedup.exact(
        Tables.documents(spark, sfDir), "text", "doc_id"))
    } else if (args.tail.headOption.contains("stages")) {
      import graft.ops.Dedup
      val docs = Tables.documents(spark, sfDir)
      time("shingles")(docs.select(org.apache.spark.sql.functions.explode(
        Dedup.hashedShingles(org.apache.spark.sql.functions.col("text"), 3))).count())
      val sig = Dedup.minhashSignature(docs, "text", "doc_id", k = 32)
      time("signature")(sig.count())
      val cand = Dedup.minhashCandidates(sig, "doc_id", k = 32, bands = 16)
      time("candidates")(cand.count())
      time("verify")(Dedup.ngramJaccard(docs, cand, "text", "doc_id", 3).count())
    } else args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        spark.sharedState.cacheManager.clearCache()
        time(s"$name run$i")(fn(spark, sfDir).count())
      }
    }
    spark.stop()
  }
}
