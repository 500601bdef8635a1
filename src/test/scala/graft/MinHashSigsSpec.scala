package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

class MinHashSigsSpec extends SparkSpec {
  import spark.implicits._

  test("native one-pass sigs are BIT-EQUAL to the explode+aggregate form (sf0.01)") {
    val k = 16
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val arrs = docs.select(col("doc_id"),
      Dedup.hashedShingles(col("text"), 3).as("__s"))
    val native = arrs
      .select(col("doc_id"),
        graft.functions.minhashSigs(col("__s"), k).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id") +:
        (0 until k).map(i => col("sig")(i).as(s"sig_$i")): _*)
    val agg = arrs.select(col("doc_id"), explode(col("__s")).as("__sh"))
      .groupBy("doc_id").agg(
        min(xxhash64(lit(0), col("__sh"))).as("sig_0"),
        (1 until k).map(i => min(xxhash64(lit(i), col("__sh"))).as(s"sig_$i")): _*)
    assert(native.count() == agg.count())
    assert(native.exceptAll(agg).isEmpty && agg.exceptAll(native).isEmpty,
      "native vs aggregate signature mismatch")
  }

  test("empty shingle array yields NULL (the aggregate form's absent-row contract)") {
    val df = Seq((1L, Seq(1L, 2L)), (2L, Seq.empty[Long])).toDF("id", "xs")
    val out = df.select(col("id"),
        graft.functions.minhashSigs(col("xs"), 4).as("sig"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!out(1L) && out(2L))
  }

  test("interpreted eval matches codegen (collect through both paths)") {
    val df = Seq((1L, Seq(11L, 22L, 33L))).toDF("id", "xs")
    val viaExpr = df.select(graft.functions.minhashSigs(col("xs"), 8))
      .as[Seq[Long]].head()
    // reference: fold the built-in scalar hash per element
    val ref = (0 until 8).map { i =>
      Seq(11L, 22L, 33L).map { e =>
        df.sparkSession.sql(s"SELECT xxhash64($i, ${e}L)").as[Long].head()
      }.min
    }
    assert(viaExpr == ref, s"$viaExpr vs $ref")
  }
}
