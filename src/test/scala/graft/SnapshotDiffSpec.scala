package graft

import graft.ops.SnapshotDiff

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("classifies added / removed / changed / unchanged with null-safe compare") {
    val oldSnap = Seq(
      (1L, Some("a"), Some(1.0)),  // unchanged
      (2L, Some("b"), Some(2.0)),  // changed (value)
      (3L, Some("c"), None),       // unchanged with NULL value
      (4L, Some("d"), Some(4.0)),  // removed
      (5L, None, Some(5.0))        // changed (type NULL -> value)
    ).toDF("k", "t", "v")
    val newSnap = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, Some("b"), Some(2.5)),
      (3L, Some("c"), None),
      (5L, Some("e"), Some(5.0)),
      (6L, Some("f"), Some(6.0))   // added
    ).toDF("k", "t", "v")
    val got = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"), Seq("t", "v"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "removed", 5L -> "changed", 6L -> "added"))
  }

  test("old_/new_ value columns carry both sides") {
    val o = Seq((1L, "x")).toDF("k", "t")
    val n = Seq((1L, "y")).toDF("k", "t")
    val row = SnapshotDiff.diff(o, n, Seq("k"), Seq("t"))
      .select("old_t", "new_t").as[(String, String)].head()
    assert(row == ("x", "y"))
  }
}
