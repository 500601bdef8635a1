package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skewed TPC-H fixture (VERDICT r11 #5 — the unfinished half of r10 #7):
  * the sf1 replica fixture keeps join fan-out per key IDENTICAL to sf0.1
  * by design, so it cannot show skew mitigation. This derives a skewed
  * twin from it by remapping a slice of foreign keys onto single hot
  * keys, at rates that imbalance shuffle partitions without changing
  * query SEMANTICS pathologically (every remap is many-to-ONE — no
  * self-join blow-up is planted):
  *
  *  - ~10% of orders move to customer 0 — skews customer⋈orders
  *    (q3, q10, q13, q18, q22);
  *  - ~10% of lineitems move to supplier 0 — skews lineitem⋈supplier
  *    (q9, q21), the heaviest joins of the suite.
  *
  * 10%, not 1%: AQE's OptimizeSkewedJoin fires when a partition exceeds
  * skewedPartitionFactor × the MEDIAN partition — at 32 shuffle
  * partitions the median already holds ~3% of the table, so a 1% hot
  * key disappears into it (measured: zero skew markers). One key with
  * 10% of the table is the power-law shape web corpora actually have
  * (one domain owning a tenth of the crawl).
  *
  * The hot keys are existing keys (0), so referential integrity holds
  * and every query still returns sensible rows. Results differ from the
  * uniform fixture by construction — this fixture exists for PLAN and
  * TIME evidence (TpchSkewBench), not oracle checks.
  *
  * Usage: Test/runMain graft.GenTpchSkew <srcDir> <outDir>
  */
object GenTpchSkew {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/repo/tmp-tpch-sf1")
    val outDir = args.lift(1).getOrElse("/root/repo/tmp-tpch-skew")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.read.parquet(s"$src/orders.parquet")
      .withColumn("o_custkey",
        when(pmod(col("o_orderkey"), lit(10)) === 0, lit(0L))
          .otherwise(col("o_custkey")))
      .repartition(16).write.mode("overwrite")
      .parquet(s"$outDir/orders.parquet")
    println("[tpch-skew] orders: ~10% of orders -> customer 0")

    spark.read.parquet(s"$src/lineitem.parquet")
      .withColumn("l_suppkey",
        when(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
          lit(10)) === 0, lit(0L)).otherwise(col("l_suppkey")))
      .repartition(32).write.mode("overwrite")
      .parquet(s"$outDir/lineitem.parquet")
    println("[tpch-skew] lineitem: ~10% of lineitems -> supplier 0")

    Seq("customer", "supplier", "part", "nation", "region").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite")
        .parquet(s"$outDir/$t.parquet")
      println(s"[tpch-skew] $t copied")
    }
    println(s"[tpch-skew] wrote skewed fixture to $outDir")
    spark.stop()
  }
}
