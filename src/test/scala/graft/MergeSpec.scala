package graft

import graft.ops.Merge
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = Seq(
    (1L, "a", 10),
    (2L, "b", 20),
    (3L, "c", 30)
  ).toDF("k", "state", "v")

  // seq orders within the batch; key 2 gets two updates (seq 2 wins),
  // key 3 a delete, key 4 an insert, key 9 a delete of an absent row
  private lazy val changes = Seq(
    (2L, "b1", 21, 1L, "U"),
    (2L, "b2", 22, 2L, "U"),
    (3L, "c", 30, 1L, "D"),
    (4L, "d", 40, 1L, "U"),
    (9L, "x", 0, 1L, "D")
  ).toDF("k", "state", "v", "seq", "op")

  private def applied =
    Merge.applyChanges(base, changes, Seq("k"), orderCols = Seq(col("seq")))

  test("update / insert / delete / absent-delete arms") {
    val out = applied.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out == Map(
      1L -> ("a", 10),    // untouched base row passes through
      2L -> ("b2", 22),   // latest update wins the batch
      4L -> ("d", 40)))   // insert; 3 deleted, 9's delete is a no-op
  }

  test("latest-wins collapse respects the batch order, incl. delete-then-update") {
    // key 5: delete at seq 1, re-insert at seq 2 -> the row survives
    val c2 = changes.unionByName(Seq(
      (5L, "e", 50, 1L, "D"), (5L, "e2", 51, 2L, "U")
    ).toDF("k", "state", "v", "seq", "op"))
    val out = Merge.applyChanges(base, c2, Seq("k"),
        orderCols = Seq(col("seq")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(5L) == "e2")
    // and the reverse (update then delete) removes it
    val c3 = changes.unionByName(Seq(
      (1L, "a9", 11, 1L, "U"), (1L, "a", 10, 2L, "D")
    ).toDF("k", "state", "v", "seq", "op"))
    val out3 = Merge.applyChanges(base, c3, Seq("k"),
        orderCols = Seq(col("seq")))
      .collect().map(_.getLong(0)).toSet
    assert(!out3.contains(1L))
  }

  test("empty change batch is the identity") {
    val out = Merge.applyChanges(base, changes.filter(lit(false)), Seq("k"),
        orderCols = Seq(col("seq")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(out == Set((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)))
  }
}
