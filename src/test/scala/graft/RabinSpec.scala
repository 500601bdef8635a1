package graft

import org.apache.spark.sql.functions._

/** Contract tests for the native rolling-hash chunk-boundary expression
  * ([[graft.functions.RabinChunkStarts]]).
  *
  * The load-bearing assertion is cross-IMPLEMENTATION parity: the
  * rolling update h ← (h − b·32⁷)·32 + b′ must emit exactly the
  * positions of the independent non-rolling closed form
  * Σ ascii(char)·32^k evaluated per position with Spark HOFs — the same
  * closed form the DuckDB oracle runs. A drift in the subtraction
  * coefficient, the window-complete condition, or the emitted offset
  * shows up here on every document, not as a downstream hash mismatch.
  */
class RabinSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame

  /** Non-rolling reference: positions i+1 for window-ends i in 8..len
    * (1-based) whose Σ ascii·32^k fingerprint has 6 low zero bits.
    */
  private def reference(t: org.apache.spark.sql.Column) = {
    val terms = (7 to 0 by -1).map(j =>
      s"ascii(substr(t, i - $j, 1)) * ${BigInt(32).pow(j)}L")
      .mkString(" + ")
    // one SQL lambda so `i` binds to the transform variable; the
    // char_length guard matters: Spark's sequence(8, len) DESCENDS for
    // len < 8 and ascii('') = 0 would mark every phantom position
    expr(s"""CASE WHEN char_length(t) >= 8 THEN
      filter(transform(sequence(8, char_length(t)),
        i -> CASE WHEN (($terms) & 63) = 0 THEN i + 1 END),
        x -> x IS NOT NULL)
      ELSE array() END""")
  }

  private def both(df: DataFrame) = df
    .select(col("doc_id"),
      graft.functions.rabin.chunkStarts(col("t")).as("rolling"),
      reference(col("t")).cast("array<int>").as("closed"))

  test("rolling expression matches the closed form on every document") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), graft.ops.Dedup.normalize(col("text")).as("t"))
    val bad = both(docs)
      .filter(col("rolling") =!= col("closed"))
      .count()
    assert(bad == 0L)
    // and the boundaries are non-trivial on this corpus
    val total = both(docs).select(explode(col("rolling"))).count()
    assert(total > 100, s"suspiciously few boundaries: $total")
  }

  test("edge cases: empty, sub-window, and exact-window strings") {
    import spark.implicits._
    val fx = Seq((1L, ""), (2L, "abc"), (3L, "abcdefgh"),
      (4L, "x" * 500)).toDF("doc_id", "t")
    val rows = both(fx).orderBy("doc_id").collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"doc ${r.getLong(0)}: ${r.getSeq[Int](1)} vs ${r.getSeq[Int](2)}")
    }
    // strings shorter than the window can never emit a boundary
    assert(rows(0).getSeq[Int](1).isEmpty && rows(1).getSeq[Int](1).isEmpty)
  }

  test("interpreted eval agrees with codegen") {
    // force the interpreted path via a literal-fed eval
    val e = graft.functions.RabinChunkStarts(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("the quick brown fox " * 40)))
    val interp = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
    import spark.implicits._
    val viaPlan = Seq(("the quick brown fox " * 40)).toDF("t")
      .select(graft.functions.rabin.chunkStarts(col("t")))
      .collect()(0).getSeq[Int](0).toArray
    assert(interp.sameElements(viaPlan))
    assert(interp.nonEmpty)
  }
}
