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

  // Planted fixture for the banded near-dup operator: `nClusters` tight
  // clusters of `perCluster` members (pairwise sim >= ~0.99) in a sea of
  // `nNoise` spread vectors. Deterministic: splitmix-style hash drives
  // every component, no RNG state.
  private def plantedClusters(nClusters: Int, perCluster: Int,
      nNoise: Int, dim: Int = 16) = {
    def h(a: Long, b: Long): Double = {
      var z = a * 0x9E3779B97F4A7C15L + b * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      (z ^ (z >>> 31)).toDouble / Long.MaxValue.toDouble
    }
    val rows = (for {
      c <- 0 until nClusters
      m <- 0 until perCluster
    } yield {
      val base = Array.tabulate(dim)(j => h(c.toLong + 1000, j.toLong))
      // tiny member-specific perturbation: cosine to the base stays ~0.999
      val v = base.zipWithIndex.map { case (x, j) =>
        (x + 0.01 * h(c.toLong * 100 + m, j.toLong)).toFloat }
      ((c * perCluster + m).toLong, v)
    }) ++ (0 until nNoise).map { i =>
      (1000000L + i,
        Array.tabulate(dim)(j => h(i.toLong + 5000000L, j.toLong).toFloat))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("banded LSH near-dup: planted clusters recovered, buckets stay bounded") {
    val df = plantedClusters(nClusters = 8, perCluster = 5, nNoise = 400).cache()
    val truePairs = Similarity.cosineNearDupPairs(df, dim = 16,
        threshold = 0.9, planes = 0)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // every within-cluster pair is a true near-dup: 8 * C(5,2) = 80
    assert(truePairs.size >= 80, s"fixture too loose: ${truePairs.size}")
    def recall(planes: Int, tables: Int): Double = {
      val got = Similarity.cosineNearDupPairs(df, dim = 16,
          threshold = 0.9, planes = planes, tables = tables)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(got.subsetOf(truePairs), "LSH must never emit a non-dup pair")
      (got & truePairs).size.toDouble / truePairs.size
    }
    val banded = recall(planes = 8, tables = 4)
    val single = recall(planes = 8, tables = 1)
    assert(banded >= 0.8, s"banded recall $banded")
    assert(banded >= single, s"banding must not lose recall: $banded vs $single")
    // occupancy: with 8 planes no table's largest bucket may degenerate
    // toward n — the quadratic within-bucket join must stay bounded. The
    // 440-vector fixture across 256 buckets per table keeps the max well
    // under n/4 unless the bucketing is broken.
    val occupancy = df.select(
        Similarity.signBucket($"embedding", 16, 8, 0).as("b"))
      .groupBy("b").count().agg(max("count")).as[Long].head()
    assert(occupancy < df.count() / 4, s"max bucket occupancy $occupancy")
  }

  test("banded degenerate config (planes=0) equals all-pairs regardless of tables") {
    val df = plantedClusters(nClusters = 2, perCluster = 4, nNoise = 50)
    val one = Similarity.cosineNearDupPairs(df, 16, 0.5, planes = 0, tables = 1)
      .collect().map(_.toSeq).toSet
    val four = Similarity.cosineNearDupPairs(df, 16, 0.5, planes = 0, tables = 4)
      .collect().map(_.toSeq).toSet
    assert(one == four && one.nonEmpty)
  }

  test("multi-table LSH top-k: banding dedups collisions and lifts recall") {
    val df = plantedClusters(nClusters = 6, perCluster = 4, nNoise = 300).cache()
    // queries = one member of each cluster; its true top-k are the other
    // members (sim ~0.999 — a pair this tight collides in EVERY table,
    // so the dedup aggregate is genuinely exercised)
    val q = df.filter($"vec_id" % 4 === 0 && $"vec_id" < 24)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val exact = Similarity.topKBruteForce(df, q, 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val banded = Similarity.topKLsh(df, q, k = 4, dim = 16,
      planes = 8, tables = 4)
    val got = banded.collect()
    // dedup: (query, candidate) appears exactly once despite multi-table
    // collisions, and ranks are a clean 1..n prefix per query
    val byQuery = got.groupBy(_.getLong(0))
    byQuery.values.foreach { rows =>
      val pairs = rows.map(r => (r.getLong(0), r.getLong(2)))
      assert(pairs.distinct.length == pairs.length, "duplicate candidate")
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length).toSeq)
    }
    val gotSet = got.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & gotSet).size.toDouble / exact.size
    assert(recall >= 0.9, s"banded cluster recall $recall")
    // degenerate config: tables stacking changes nothing when planes=0
    val one = Similarity.topKLsh(df, q, k = 4, dim = 16, planes = 0, tables = 1)
      .collect().map(_.toSeq).toSet
    val four = Similarity.topKLsh(df, q, k = 4, dim = 16, planes = 0, tables = 4)
      .collect().map(_.toSeq).toSet
    assert(one == four && one.nonEmpty)
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
