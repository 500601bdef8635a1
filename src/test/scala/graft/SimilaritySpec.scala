package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(1.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f)),
    (4L, Array(0.9f, 0.1f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine: orthogonal 0, identical 1, opposite -1") {
    val q = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("query_id", "query_vec")
    val sims = vecs.crossJoin(q)
      .select($"vec_id", Similarity.cosine($"embedding", $"query_vec").as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sims(0L) == 1.0 && sims(1L) == 0.0 && sims(3L) == -1.0)
    assert(math.abs(sims(2L) - math.sqrt(0.5)) < 1e-9)
  }

  test("brute-force top-k: correct ranking with id tie-break") {
    val q = Seq((7L, Array(1.0f, 0.0f, 0.0f))).toDF("query_id", "query_vec")
    val top = Similarity.topKBruteForce(vecs, q, 3)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(top == Seq(0L, 4L, 2L)) // sims: 1.0, ~0.994, ~0.707
  }

  test("LSH top-k on real embeddings: every returned neighbour shares the query bucket and ranks correctly") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val ann = Similarity.topKLsh(emb, q, k = 5, dim = 64, planes = 6)
    val got = ann.collect()
    assert(got.nonEmpty)
    // rank 1 of each query must be the query vector itself (sim 1.0)
    val self = ann.filter($"rank" === 1).select($"query_id", $"vec_id", $"sim").collect()
    self.foreach { r => assert(r.getLong(0) == r.getLong(1) && r.getDouble(2) == 1.0) }
  }

  test("LSH recall vs brute force is sane on real data") {
    val emb = Tables.embeddings(spark, sf0001).cache()
    val q = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val exact = Similarity.topKBruteForce(emb, q, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.topKLsh(emb, q, k = 5, dim = 64, planes = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall") // 4 planes, single probe: modest by design
  }
}
