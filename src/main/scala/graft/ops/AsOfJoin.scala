package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the most recent right
  * row with `right.ts <= left.ts` within the same key group — the
  * trades/quotes operator, and the textbook formulation of the reference's
  * interval join (SURVEY.md §2.4: settle intervals tile the timeline, so
  * "the config row covering ts" == "the last config row starting at or
  * before ts").
  *
  * Implementation: union the two streams with a side tag, then one
  * `last(..., ignoreNulls)` window over (key, ts) and keep left rows — the
  * standard distributed as-of:
  *
  *  - ONE shuffle (hash by key) + per-partition sort; no range join, no
  *    per-row probe. At 100 TB both sides co-partition on the key and the
  *    window is a streaming pass — the same plan a dedicated
  *    AsOfJoinExec would produce, so no custom SparkPlan is needed
  *    (decision table SURVEY.md §7.3).
  *  - Skew: a hot key serializes its window; salt by coarse time bucket
  *    (carry the previous bucket's last quote forward) if a single key
  *    dominates.
  */
object AsOfJoin {

  /** @param left      probe side (keeps all its rows)
    * @param right     reference side; its `valueCols` are attached
    * @param keyCols   equality keys present on both sides
    * @param tsCol     ordering timestamp present on both sides
    * @param valueCols right-side columns to carry (must not clash with left)
    * @param tieCols   right-side columns (⊆ valueCols) appended to the sort
    *                  so that several right rows sharing (key, ts) resolve
    *                  deterministically: the GREATEST tieCols row wins.
    *                  Without it the attached values depend on shuffle-sort
    *                  order whenever (key, ts) is non-unique on the right —
    *                  fine only when uniqueness is guaranteed upstream.
    *
    * Ties (`left.ts == right.ts`) match the right row — the conventional
    * inclusive `right.ts <= left.ts` bound.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCols: Seq[String],
      tieCols: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag: right rows sort BEFORE left rows at equal ts -> inclusive bound
    val lTagged = valueCols.foldLeft(left.withColumn("__side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null))
    }
    val rTagged = right
      .select((keyCols :+ tsCol).map(col) ++ valueCols.map(col): _*)
      .withColumn("__side", lit(0))
    val unioned = lTagged.select((leftCols ++ valueCols :+ "__side").map(col): _*)
      .unionByName(rTagged, allowMissingColumns = true)

    // tieCols ascending + running last(): among right rows equal on
    // (ts, side), the greatest tie value is the one attached.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc +: col("__side").asc +:
        tieCols.map(col(_).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
  }

  /** Forward as-of join: attach the EARLIEST right row with
    * `right.ts > left.ts` (strictly after — "the next quote", the
    * look-ahead twin of [[backward]]). Same single-shuffle union-window
    * plan with the SAME tagging (right rows sort before left rows at
    * equal ts — which here puts an equal-ts right row OUTSIDE the left
    * row's following frame, making the bound strict), and a running
    * `first(..., ignoreNulls)` over the FOLLOWING frame instead of
    * `last` over the preceding one. Among right rows sharing (key, ts),
    * the LOWEST tieCols row wins (the first one the forward scan meets).
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCols: Seq[String],
      tieCols: Seq[String] = Nil): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag: right rows sort BEFORE left rows at equal ts -> strict bound
    // (an equal-ts right row precedes the left row, outside its frame)
    val lTagged = valueCols.foldLeft(left.withColumn("__side", lit(1))) {
      (df, c) => df.withColumn(c, lit(null))
    }
    val rTagged = right
      .select((keyCols :+ tsCol).map(col) ++ valueCols.map(col): _*)
      .withColumn("__side", lit(0))
    val unioned = lTagged.select((leftCols ++ valueCols :+ "__side").map(col): _*)
      .unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc +: col("__side").asc +:
        tieCols.map(col(_).asc_nulls_last): _*)
      .rowsBetween(0, Window.unboundedFollowing)
    val filled = valueCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
  }

  /** [[backward]] with a match-age bound (pandas `merge_asof tolerance`):
    * a right row older than `tolerance` before the left row is treated as
    * no match — its carried values null out, and `asof_matched_ts`
    * reports the matched right timestamp (null when unmatched or stale).
    * Same single-shuffle union-window plan; the tolerance is a per-row
    * projection after the fill, not a second join.
    */
  def backwardTolerance(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      valueCols: Seq[String],
      tolerance: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    val rts = "__asof_rts"
    val j = backward(left, right.withColumn(rts, col(tsCol)),
      keyCols, tsCol, valueCols :+ rts, tieCols)
    val stale = col(rts).isNull ||
      col(rts) < col(tsCol) - expr(s"INTERVAL $tolerance")
    valueCols.foldLeft(j) { (df, c) =>
        df.withColumn(c, when(stale, lit(null)).otherwise(col(c)))
      }
      .withColumn("asof_matched_ts",
        when(stale, lit(null)).otherwise(col(rts)))
      .drop(rts)
  }
}
