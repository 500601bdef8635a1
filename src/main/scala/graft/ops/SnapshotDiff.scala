package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff (change-data-capture between two materialized
  * states): full outer join on the key, classify each key as
  * added / removed / changed / unchanged by null-safe comparison of the
  * tracked columns. The batch analog of what an incremental pipeline's
  * merge step needs to know before writing — and, run between two
  * training-data snapshots, the audit that tells you what a refresh
  * actually changed.
  *
  * Scale shape: one shuffle per side on the key (or zero if both
  * snapshots are bucketed by key), then a 1:1 hash join — no windows, no
  * skew sensitivity beyond the key's own distribution. Comparison is
  * null-safe (`<=>`), so a value transitioning to/from NULL counts as
  * changed, not unchanged.
  */
object SnapshotDiff {

  /** Diff `newSnap` against `oldSnap`. Output: keyCols…, `status`
    * ('added' | 'removed' | 'changed' | 'unchanged'), then
    * `old_<c>` / `new_<c>` for every compare column.
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    val o = oldSnap.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__old", lit(1))
      .select(keyCols.map(col) ++ compareCols.map(c => col(c).as(s"old_$c"))
        :+ col("__old"): _*)
    val n = newSnap.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__new", lit(1))
      .select(keyCols.map(col) ++ compareCols.map(c => col(c).as(s"new_$c"))
        :+ col("__new"): _*)
    val same = compareCols.map(c => col(s"old_$c") <=> col(s"new_$c"))
      .reduce(_ && _)
    o.join(n, keyCols, "full_outer")
      .withColumn("status",
        when(col("__old").isNull, lit("added"))
          .when(col("__new").isNull, lit("removed"))
          .when(same, lit("unchanged"))
          .otherwise(lit("changed")))
      .drop("__old", "__new")
  }
}
