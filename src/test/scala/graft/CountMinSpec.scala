package graft

import org.apache.spark.sql.functions._
import graft.ops.CountMin

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private def counts(keys: Seq[(String, Long)]) =
    keys.toDF("token", "n")

  test("estimates never under-count, even at forced-collision width") {
    val tc = counts((1 to 200).map(i => s"tok$i" -> i.toLong))
    val sk = CountMin.sketch(tc, "token", "n", w = 8, d = 2)
    val est = CountMin.estimate(tc, sk, "token", w = 8, d = 2)
      .select(col("token"), col("n"), col("est"))
      .collect()
    // 200 keys in 8 buckets: collisions are guaranteed, so some estimates
    // exceed truth — but none may ever fall below it
    assert(est.forall(r => r.getLong(2) >= r.getLong(1)))
    assert(est.exists(r => r.getLong(2) > r.getLong(1)), "no collision at w=8?")
  }

  test("wide sketch is exact for a small vocabulary") {
    val tc = counts(Seq("a" -> 10L, "b" -> 7L, "c" -> 3L))
    val sk = CountMin.sketch(tc, "token", "n", w = 1024, d = 4)
    val est = CountMin.estimate(tc, sk, "token", w = 1024, d = 4).collect()
    assert(est.forall(r => r.getAs[Long]("est") == r.getAs[Long]("n")))
  }

  test("sketches merge cell-wise: sketch(A ++ B) == sketch(A) + sketch(B)") {
    val a = counts(Seq("x" -> 5L, "y" -> 2L))
    val b = counts(Seq("x" -> 3L, "z" -> 9L))
    val whole = CountMin.sketch(a.union(b), "token", "n", w = 16, d = 3)
    val merged = CountMin.sketch(a, "token", "n", w = 16, d = 3)
      .union(CountMin.sketch(b, "token", "n", w = 16, d = 3))
      .groupBy("r", "bucket").agg(sum("cell").as("cell"))
    val lhs = whole.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rhs = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(lhs == rhs)
  }
}
