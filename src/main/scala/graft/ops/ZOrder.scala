package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout clustering: interleave the bits of
  * several normalized dimensions into one sort key, so range-partitioning
  * by that key co-locates rows that are close in EVERY dimension at once.
  * The payoff at 100 TB is multi-column file skipping: after writing in
  * z-order, each file's min/max spans a small range of BOTH columns, so a
  * predicate on either dimension prunes most files — a lexicographic sort
  * only prunes on its leading column.
  *
  * Pure bit arithmetic on longs (shift/and/or — whole-stage codegen, no
  * UDF), one range exchange + in-partition sort; no extra shuffle beyond
  * the layout write any clustering requires.
  */
object ZOrder {

  /** Morton interleave: bit i of dimension d lands at position
    * i·(#dims) + d. Inputs must be non-negative and < 2^bits
    * (pre-normalize with [[normalizeMod]] or a min/max scale);
    * dims·bits must fit a signed long.
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"${cols.size} dims x $bits bits exceeds a signed long")
    val k = cols.size
    val terms = for {
      (c, d) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(1L), i * k + d)
    terms.reduce(_ bitwiseOR _)
  }

  /** Cheap exact normalization into [0, 2^bits): positive modulus. For
    * already-bounded natural keys this is the identity; for unbounded
    * ones it trades global ordering for exactness (fine for clustering —
    * locality only needs EQUAL values to collide, near values usually
    * share high bits after the caller's scaling).
    */
  def normalizeMod(c: Column, bits: Int): Column =
    pmod(c.cast("long"), lit(1L << bits))

  /** Re-layout `df` in z-order of `dims` across `numPartitions` — the
    * write-side clustering step. Rows land range-partitioned and sorted
    * by the interleaved key, which is what gives every output file tight
    * min/max bounds on every dimension.
    */
  def zorderBy(df: DataFrame, dims: Seq[Column], bits: Int,
      numPartitions: Int): DataFrame = {
    val z = zValue(dims, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
