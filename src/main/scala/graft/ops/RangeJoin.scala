package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Big-big range join without a broadcast: both sides shuffle on
  * (key, coarse time bucket) and meet in an ordinary hash join.
  *
  * `IntervalJoin` (the reference's back-adjust join, main.py:259-323
  * analog) is a broadcast nested-loop join — the right call when one side
  * is a dimension of contract months. It stops being a plan at all when
  * BOTH sides are fact-sized (events × sessions at 100 TB): a broadcast
  * no longer fits and Catalyst degrades a pure range predicate to
  * BroadcastNestedLoopJoin or CartesianProduct. This operator restores an
  * equi-join shape: intervals replicate into every `bucketSeconds`-wide
  * bucket they cover (`sequence` + `explode`), points compute their single
  * bucket, and the join key is (keys…, bucket). A (point, interval) pair
  * can only meet in the point's bucket, so the join emits no duplicates
  * and needs no distinct.
  *
  * Cost model: replication factor = avg(interval length / bucketSeconds)
  * + 1. Pick `bucketSeconds` near the typical interval length — a bucket
  * much narrower than the intervals multiplies the interval side; much
  * wider, and each bucket pairs points with intervals they miss (the
  * refine filter discards them after the shuffle). Degenerate long
  * intervals (a session spanning months) are the skew to watch: cap them
  * upstream or split the tail into its own broadcast-NLJ pass.
  */
object RangeJoin {

  // Floor-division in exact long arithmetic: (m - pmod(m, b)) is an exact
  // multiple of b, so the double division is correctly rounded to the
  // integer quotient — a naive floor(m / b) can mis-bucket a timestamp
  // sitting exactly on a bucket boundary by one ULP. pmod keeps floor
  // semantics for pre-epoch timestamps too.
  private def bucketOf(ts: Column, bucketSeconds: Long): Column = {
    val m = unix_micros(ts.cast("timestamp_ltz"))
    val b = bucketSeconds * 1000000L
    ((m - pmod(m, lit(b))) / lit(b)).cast("long")
  }

  /** Join point rows (`tsCol`) to interval rows ([`startCol`, `endCol`],
    * both ends CLOSED — SQL BETWEEN semantics) that share `keyCols`.
    * Output: every (point × matching interval) row with both sides'
    * columns (interval columns suffixed only on name collisions — callers
    * should project distinct names).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keyCols: Seq[String], tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val p = points.withColumn("__bucket", bucketOf(col(tsCol), bucketSeconds))
    val i = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(col(startCol), bucketSeconds),
        bucketOf(col(endCol), bucketSeconds))))
    p.join(i, keyCols :+ "__bucket")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__bucket")
  }
}
