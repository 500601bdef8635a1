package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch MERGE — apply a keyed change batch (CDC feed) onto a base
  * snapshot: update when matched, insert when not, delete on tombstones.
  * The engine-level equivalent of a Delta/Iceberg `MERGE INTO target
  * USING changes` with UPDATE SET * / INSERT * / DELETE arms, runnable on
  * plain parquet snapshots (the sibling of [[SnapshotDiff]], which
  * *derives* a change set; this *applies* one).
  *
  * Scale design (100 TB):
  *  - The change batch is first collapsed to one winner per key (latest
  *    by `orderCols`) with a key-partitioned window — CDC feeds replay
  *    multiple updates per key per batch, and folding them before the
  *    join keeps the join's change side minimal. The window's exchange is
  *    the same hashpartitioning(keys) the join needs, so Spark reuses it.
  *  - The base snapshot is touched by ONE left-anti join on the key —
  *    never a full-outer: surviving base rows pass through unchanged, and
  *    the upsert rows are appended by union. With the base maintained
  *    bucketed by key ([[graft.pipeline.Bucketing]]), the anti join
  *    needs no base-side shuffle at all — the per-batch cost is sized by
  *    the CHANGE volume, not the snapshot.
  *  - Deletes of absent keys and updates equal to inserts fall out of the
  *    same two arms — no per-row conditional logic, no skew sensitivity
  *    beyond the key distribution itself.
  */
object Merge {

  /** Fold `changes` into `base`. `changes` carries every `base` column
    * (keys + payload) plus `opCol` — whose value `tombstone` marks a
    * delete — and whatever ordering columns `orderCols` reference; only
    * the target's columns are inserted, as in MERGE. The latest change
    * per key (by `orderCols`, descending) wins the batch.
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keys: Seq[String],
      orderCols: Seq[Column], opCol: String = "op",
      tombstone: String = "D"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(_.desc): _*)
    val latest = changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val changedKeys = latest.select(keys.map(col): _*)
    base.join(changedKeys, keys, "left_anti")
      .unionByName(latest.filter(col(opCol) =!= tombstone)
        .select(base.columns.map(col).toIndexedSeq: _*))
  }
}
