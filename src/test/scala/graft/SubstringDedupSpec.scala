package graft

import org.apache.spark.sql.functions._

import graft.ops.SubstringDedup

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // k=3 keeps the fixture arithmetic hand-checkable.
  //  - docs 1/2 share the 5-token run "alpha beta gamma delta epsilon"
  //    (3 duplicated trigram starts, merged coverage 5)
  //  - doc 3 self-repeats "x y z" twice with a separator
  //  - doc 4 is all-unique, doc 5 is shorter than k
  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon one two three"),
    (2L, "zero alpha beta gamma delta epsilon nine"),
    (3L, "x y z sep x y z"),
    (4L, "totally unique words only here"),
    (5L, "too short")
  ).toDF("doc_id", "text")

  private lazy val cov = SubstringDedup
    .dupSpanCoverage(docs, "text", "doc_id", k = 3, maxDupFrac = 0.5)
    .orderBy("doc_id")
    .collect()
    .map(r => r.getLong(0) -> r).toMap

  test("shared run across documents: merged-interval coverage, not k x positions") {
    // doc 1: trigram starts 1..3 duplicated -> union of [1,4),[2,5),[3,6)
    // covers tokens 1..5 (5 tokens), not 9.
    val r1 = cov(1L)
    assert(r1.getLong(2) == 3L, "dup_positions")
    assert(r1.getLong(3) == 5L, s"covered_tokens: $r1")
    assert(r1.getInt(1) == 8)
    assert(r1.getDouble(4) == 0.625 && !r1.getBoolean(5))
    // doc 2: same run at offset 2 -> starts 2..4, coverage 5 of 7 tokens
    val r2 = cov(2L)
    assert(r2.getLong(2) == 3L && r2.getLong(3) == 5L)
  }

  test("self-repetition inside one document counts as duplication") {
    // doc 3: "x y z" at starts 1 and 5 -> 2 dup positions, coverage 6 of 7
    val r3 = cov(3L)
    assert(r3.getLong(2) == 2L && r3.getLong(3) == 6L)
    assert(!r3.getBoolean(5)) // 6/7 > 0.5 -> trimmed
  }

  test("unique and shorter-than-k documents pass untouched") {
    val r4 = cov(4L)
    assert(r4.getLong(2) == 0L && r4.getLong(3) == 0L && r4.getBoolean(5))
    val r5 = cov(5L)
    assert(r5.getLong(2) == 0L && r5.getDouble(4) == 0.0 && r5.getBoolean(5))
  }

  test("adjacent-but-disjoint duplicated spans sum their coverage") {
    val d = Seq(
      (1L, "a b c QQ d e f"),
      (2L, "a b c WW d e f"),
      (3L, "p q r s t u v")
    ).toDF("doc_id", "text")
    val m = SubstringDedup.dupSpanCoverage(d, "text", "doc_id", k = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // "a b c" and "d e f" both duplicated, separated by one unique token:
    // 2 positions, coverage 3 + 3 = 6 of 7.
    assert(m(1L).getLong(2) == 2L && m(1L).getLong(3) == 6L)
    assert(m(3L).getLong(3) == 0L)
  }
}
