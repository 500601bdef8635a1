package graft

import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Throwaway stage profiler for the canonical simhash banding — not a test. */
object ProfSimhash {
  def t[A](label: String)(f: => A): A = {
    val s = System.nanoTime(); val r = f
    println(f"[prof] $label%-28s ${(System.nanoTime() - s) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    for (pass <- 1 to 2) {
      println(s"== pass $pass")
      val docs = Tables.documents(spark, d)
      val fps = t("simhash64")(
        { val x = Dedup.simhash64(docs, "text", "doc_id", Dedup.md5Hash64).cache(); x.count(); x })
      val dfp = t("distinct fp")(
        { val x = fps.select(col("simhash").as("__f")).distinct().cache(); println("  n_distinct=" + x.count()); x })
      val full = t("full fingerprintHammingPairs")(
        Dedup.fingerprintHammingPairs(fps, "doc_id", "simhash", 8).count())
      println("  pairs=" + full)
      val fixed = t("fixed-q (no probe)")(
        Dedup.fingerprintHammingPairs(fps, "doc_id", "simhash", 8, Int.MaxValue).count())
      println("  pairs=" + fixed)
      fps.unpersist(); dfp.unpersist()
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
