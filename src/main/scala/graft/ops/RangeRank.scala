package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row-numbering over a total sort order — the scale
  * replacement for `row_number().over(Window.orderBy(...))`, which plans an
  * `Exchange SinglePartition` and funnels the ENTIRE frame through one task
  * (VERDICT r10 #1: at 100× corpus scale that is a straight single-executor
  * bottleneck).
  *
  * Shape — the same TWO-LEVEL prefix sum as [[Multimodal.sizeBuckets]] and
  * the `pack_sequences` packer:
  *
  *  1. `repartitionByRange` on the sort key: ONE parallel range exchange;
  *     RangePartitioner assigns ascending key ranges to ascending partition
  *     ids, so partition order IS global order.
  *  2. per-partition `row_number` (a hash exchange on the partition id —
  *     still fully parallel, ~n/P rows per task);
  *  3. per-partition row counts — one row per PARTITION — collected to the
  *     driver, cumulated into exclusive offsets, and broadcast back:
  *     global position = partition offset + local row number.
  *
  * The input is cached while the counts and the ranked pass both read it
  * (range boundaries are SAMPLED, so an uncached recompute could assign
  * different partition ids between the two passes); the result is
  * localCheckpoint-materialized so the cache can be released before
  * returning — the [[Multimodal.sizeBuckets]] no-leaked-cache contract.
  * The driver-side state is one long per partition: bounded by cluster
  * parallelism, never by data volume.
  */
object RangeRank {

  /** `df` plus `posCol` = the 1-based global rank of each row under
    * `sortCols` (a total order — include a tiebreaker column). */
  def withGlobalPos(df: DataFrame, sortCols: Seq[Column],
      posCol: String): DataFrame = {
    val (ranked, ranged) = withGlobalPosPlan(df, sortCols, posCol)
    val out = ranked.localCheckpoint()
    ranged.unpersist()
    out
  }

  /** `df` plus `posCol` (1-based global rank) AND `prefixCol` = the
    * INCLUSIVE global running sum of long column `valCol` under the same
    * total order — the scale replacement for
    * `sum(v).over(Window.orderBy(...).rowsBetween(unboundedPreceding,
    * currentRow))`, which funnels the whole frame through one task
    * exactly like the global row_number (the r12 plan-audit classifier
    * caught pr_curve_points / calibration_reliability doing this at
    * corpus scale). Same two-level shape: per-partition local running
    * sums, plus a broadcast exclusive offset of per-partition totals —
    * driver state stays one (count, sum) pair per partition. */
  def withGlobalPrefix(df: DataFrame, sortCols: Seq[Column], valCol: String,
      posCol: String, prefixCol: String): DataFrame =
    withGlobalPrefixes(df, sortCols, Seq(valCol), posCol, Seq(prefixCol))

  /** [[withGlobalPrefix]] generalized to SEVERAL running sums sharing one
    * total order (the KS family needs two ECDF numerators; RFM carries a
    * histogram count per cutoff axis) — one range exchange and one
    * driver-bounded offsets broadcast amortized across all of them,
    * instead of one two-level pass per column. */
  def withGlobalPrefixes(df: DataFrame, sortCols: Seq[Column],
      valCols: Seq[String], posCol: String,
      prefixCols: Seq[String]): DataFrame = {
    val (ranked, ranged) = withGlobalPrefixesPlan(df, sortCols, valCols,
      posCol, prefixCols)
    val out = ranked.localCheckpoint()
    ranged.unpersist()
    out
  }

  /** Un-checkpointed plan hook for [[withGlobalPrefix]] — see
    * [[withGlobalPosPlan]]'s rationale. */
  private[graft] def withGlobalPrefixPlan(df: DataFrame, sortCols: Seq[Column],
      valCol: String, posCol: String,
      prefixCol: String): (DataFrame, DataFrame) =
    withGlobalPrefixesPlan(df, sortCols, Seq(valCol), posCol, Seq(prefixCol))

  private[graft] def withGlobalPrefixesPlan(df: DataFrame,
      sortCols: Seq[Column], valCols: Seq[String], posCol: String,
      prefixCols: Seq[String]): (DataFrame, DataFrame) = {
    require(valCols.size == prefixCols.size, "valCols/prefixCols arity")
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .cache()
    // coalesce: a non-empty range partition whose valCol is all-NULL
    // yields a NULL sum — getLong would NPE on the driver, and the
    // NULL-row semantics would silently diverge from the documented
    // "global running sum" contract (SQL sum skips NULLs; so does the
    // per-row local running sum below, so offset 0 is the consistent
    // per-partition total for an all-NULL range).
    val aggs = count(lit(1)).as("__n") +: valCols.zipWithIndex.map {
      case (v, i) => coalesce(sum(col(v)), lit(0L)).as(s"__s$i")
    }
    val stats = ranged.groupBy("__pid").agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        valCols.indices.map(i => r.getLong(2 + i))))
      .sortBy(_._1)
    val rOff = stats.map(_._2).scanLeft(0L)(_ + _)
    val sOff = valCols.indices.map(i => stats.map(_._3(i)).scanLeft(0L)(_ + _))
    val offRows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(stats.indices.map { j =>
        org.apache.spark.sql.Row.fromSeq(
          stats(j)._1 +: rOff(j) +: valCols.indices.map(i => sOff(i)(j)))
      }: _*)
    val schema = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("__pid",
        org.apache.spark.sql.types.IntegerType) +:
      (org.apache.spark.sql.types.StructField("__roff",
        org.apache.spark.sql.types.LongType) +:
        valCols.indices.map(i => org.apache.spark.sql.types.StructField(
          s"__soff$i", org.apache.spark.sql.types.LongType))))
    val offsets = spark.createDataFrame(offRows, schema)
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val withLocals = valCols.zipWithIndex.foldLeft(
      ranged.withColumn("__local", row_number().over(w).cast("long"))) {
      case (acc, (v, i)) => acc.withColumn(s"__lsum$i",
        coalesce(sum(col(v)).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
          lit(0L)))
    }
    val joined = withLocals.join(broadcast(offsets), "__pid")
      .withColumn(posCol, col("__local") + col("__roff"))
    val ranked = prefixCols.zipWithIndex.foldLeft(joined) {
      case (acc, (p, i)) =>
        acc.withColumn(p, col(s"__lsum$i") + col(s"__soff$i"))
    }.drop(Seq("__pid", "__local", "__roff") ++
      valCols.indices.flatMap(i => Seq(s"__lsum$i", s"__soff$i")): _*)
    (ranked, ranged)
  }

  /** Spark `ntile(k)` recomputed from a 1-based global rank — bit-equal
    * to `ntile(k).over(Window.orderBy(...))` without its SinglePartition
    * funnel: buckets `1..(n mod k)` hold ⌈n/k⌉ rows, the rest ⌊n/k⌋
    * (the ANSI equidepth convention). `rk` and `nCol` are column NAMES
    * (the expression references them by name). */
  def ntileFromRank(rk: String, nCol: String, k: Int): Column = expr(
    s"""CAST(CASE
       |  WHEN $rk <= ($nCol % $k) * ($nCol DIV $k + 1)
       |  THEN ($rk + $nCol DIV $k) DIV ($nCol DIV $k + 1)
       |  ELSE $nCol % $k
       |    + ($rk - ($nCol % $k) * ($nCol DIV $k + 1) + $nCol DIV $k - 1)
       |      DIV ($nCol DIV $k)
       |END AS INT)""".stripMargin)

  /** The un-checkpointed plan (cache left pinned — caller unpersists via
    * the returned frame): the test hook that lets the NO-SinglePartition
    * property be asserted on the actual plan, which `localCheckpoint`
    * would hide behind an RDD scan. */
  private[graft] def withGlobalPosPlan(df: DataFrame, sortCols: Seq[Column],
      posCol: String): (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val n = spark.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(n, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .cache()
    val counts = ranged.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _))
      .toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
    val ranked = ranged
      .withColumn("__local", row_number().over(w).cast("long"))
      .join(broadcast(offsets), "__pid")
      .withColumn(posCol, col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
    (ranked, ranged)
  }
}
