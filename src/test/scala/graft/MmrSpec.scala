package graft

import org.apache.spark.sql.functions._
import graft.ops.{Mmr, Similarity}

class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("MMR demotes the near-duplicate of an already-picked candidate") {
    // q = [1,0]; a and b nearly identical, c equally relevant but on the
    // other side of q. Pure relevance ranks (a, b, c names); MMR must
    // pick the diverse c second and push the a-duplicate b to rank 3.
    val q = Array(1.0f, 0.0f)
    val cand = Seq(
      (1L, Array(0.95f, 0.312f)),  // a
      (2L, Array(0.95f, 0.313f)),  // b ~ duplicate of a
      (3L, Array(0.95f, -0.312f))) // c diverse
      .toDF("vec_id", "embedding")
      .withColumn("query_id", lit(10L))
      .withColumn("rel", round(Similarity.cosine(col("embedding"),
        typedLit(q)), 6))
      .select("query_id", "vec_id", "rel", "embedding")
    val got = Mmr.rerank(cand, picks = 3, lambda = 0.5)
      .orderBy("mmr_rank")
      .select("vec_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 3L, 2L))
  }

  test("picks per query are distinct and rank densely from 1") {
    val vecs = (0 until 30).map(i =>
      (i.toLong, Array.tabulate(4)(j => ((i * 7 + j * 3) % 11 - 5).toFloat)))
    val emb = vecs.toDF("vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val cand = Similarity.topKBruteForce(emb, q, k = 6)
      .select(col("query_id"), col("vec_id"), col("sim").as("rel"))
      .join(emb, "vec_id")
      .select("query_id", "vec_id", "rel", "embedding")
    val out = Mmr.rerank(cand, picks = 4).cache()
    assert(out.count() == 12)
    assert(out.groupBy("query_id")
      .agg(countDistinct("vec_id").as("n"), countDistinct("mmr_rank").as("r"),
        min("mmr_rank").as("lo"), max("mmr_rank").as("hi"))
      .collect().forall(r => r.getLong(1) == 4 && r.getLong(2) == 4 &&
        r.getInt(3) == 1 && r.getInt(4) == 4))
    out.unpersist()
  }
}
