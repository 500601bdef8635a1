package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: split each key's event stream into sessions
  * separated by inactivity longer than `gapSeconds` — the general form of
  * the reference's fixed-calendar sessions (SURVEY.md §2.9 W6; the
  * reference needs only the deterministic calendar expression, this is the
  * generalization an events pipeline needs).
  *
  * Implementation: lag + running sum of session-start flags — one shuffle
  * by key, one per-partition sort, no state store. (Structured Streaming's
  * `session_window` is the streaming twin; this batch form is what a
  * DuckDB oracle can check.)
  */
object Sessionize {

  /** Assign a per-key session index (0-based, in time order). */
  def withSessionIndex(df: DataFrame, keyCols: Seq[String], tsCol: String,
      gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    df.withColumn("__prev", lag(col(tsCol), 1).over(w))
      // interval comparison, not timestampdiff: the diff truncates
      // sub-second parts and engines disagree on gaps in (g, g+1)
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("__prev") + expr(s"INTERVAL $gapSeconds SECONDS") < col(tsCol), 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
      .drop("__prev", "__new")
  }

  /** Session summaries: one row per (key, session) with bounds and size. */
  def sessions(df: DataFrame, keyCols: Seq[String], tsCol: String,
      gapSeconds: Long): DataFrame =
    withSessionIndex(df, keyCols, tsCol, gapSeconds)
      .groupBy((keyCols :+ "session_idx").map(col): _*)
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
}
