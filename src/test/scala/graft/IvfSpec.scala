package graft

import org.apache.spark.sql.functions._

import graft.ops.{Ivf, Similarity}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf0001).cache()
  private lazy val centroids = Ivf.trainCentroids(emb, k = 8, iters = 2).cache()

  test("training yields k centroids of the right dimension") {
    val c = centroids.collect()
    assert(c.length == 8)
    assert(c.forall(_.getSeq[Float](1).length == 64))
  }

  test("every corpus vector lands in exactly one cell") {
    val assigned = Ivf.assignCells(emb, "embedding", centroids, n = 1)
    assert(assigned.count() == emb.count())
    assert(assigned.groupBy("vec_id").count().filter($"count" > 1).count() == 0)
  }

  test("IVF top-k: self-hit at rank 1, sane recall vs brute force") {
    val q = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val ivf = Ivf.topK(emb, q, centroids, k = 5, nProbe = 3)
    val self = ivf.filter($"rank" === 1).collect()
    self.foreach { r =>
      assert(r.getAs[Long]("query_id") == r.getAs[Long]("vec_id"))
      assert(r.getAs[Double]("sim") == 1.0)
    }
    val exact = Similarity.topKBruteForce(emb, q, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = ivf.select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall") // 3 of 8 cells probed
  }
}
