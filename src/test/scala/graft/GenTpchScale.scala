package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1-scale TPC-H fixture (VERDICT r9 #6): the 22 relational-core query
  * shapes are green at sf0.01/sf0.1; this generates a ~6M-lineitem corpus
  * to demonstrate headroom one decade up, with the SAME value
  * distributions as the driver's sf0.1 tables — by replication with key
  * shifting, not re-synthesis: each of the 10 replicas shifts every key
  * column by replica × (table's sf0.1 key range), so
  *  - every selective predicate in the 22 queries (date windows, brand/
  *    type/segment literals, quantity thresholds) keeps its exact sf0.1
  *    selectivity — the queries measure the same plan, 10× the data;
  *  - joins match only within a replica (keys shift consistently across
  *    fact and dim), so join fan-out per key is IDENTICAL to sf0.1 —
  *    no planted 10× key skew, no cross-replica blow-up;
  *  - derived name columns are recomputed from the shifted key, keeping
  *    the name ↔ key bijection queries could rely on.
  * nation/region stay fixed (25/5 rows — TPC-H's own constants).
  *
  * Usage: Test/runMain graft.GenTpchScale <outDir> [replicas]
  */
object GenTpchScale {

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/root/repo/tmp-tpch-sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(10)
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val r = spark.range(reps).select(col("id").as("__r"))
    // Output partition counts were sized for the 10-replica (sf1) tier;
    // scale them with the replica count so the sf10 tier (100 replicas,
    // r13) keeps ~2M-row lineitem partitions instead of 10×-fatter files.
    val partScale = math.max(1, reps / 10)
    def replicate(table: String, outBase: Int)(shift: DataFrame => DataFrame): Unit = {
      val out = math.min(256, outBase * partScale)
      val base = spark.read.parquet(s"$src/$table.parquet")
      shift(base.crossJoin(broadcast(r))).drop("__r")
        .repartition(out).write.mode("overwrite")
        .parquet(s"$outDir/$table.parquet")
      println(s"[tpch-scale] $table x$reps -> $out partitions")
    }

    // key ranges at sf0.1 (dense 0..n-1 keys, verified against the data)
    val (nOrd, nCust, nSupp, nPart) = (150000L, 15000L, 1000L, 20000L)

    replicate("orders", 16)(df => df
      .withColumn("o_orderkey", col("o_orderkey") + col("__r") * nOrd)
      .withColumn("o_custkey", col("o_custkey") + col("__r") * nCust))
    replicate("lineitem", 32)(df => df
      .withColumn("l_orderkey", col("l_orderkey") + col("__r") * nOrd)
      .withColumn("l_partkey", col("l_partkey") + col("__r") * nPart)
      .withColumn("l_suppkey", col("l_suppkey") + col("__r") * nSupp))
    replicate("customer", 4)(df => df
      .withColumn("c_custkey", col("c_custkey") + col("__r") * nCust)
      .withColumn("c_name", format_string("Customer#%09d", col("c_custkey"))))
    replicate("supplier", 1)(df => df
      .withColumn("s_suppkey", col("s_suppkey") + col("__r") * nSupp)
      .withColumn("s_name", format_string("Supplier#%09d", col("s_suppkey"))))
    replicate("part", 4)(df => df
      .withColumn("p_partkey", col("p_partkey") + col("__r") * nPart))
    Seq("nation", "region").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[tpch-scale] $t copied")
    }
    println(s"[tpch-scale] wrote ${reps}x sf0.1 to $outDir")
    spark.stop()
  }
}
