package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("hand graph: K4 minus one edge — exact per-vertex triangle counts") {
    // K4 on {1,2,3,4} minus edge (3,4): triangles {1,2,3} and {1,2,4}.
    // Vertices 1,2 sit in both; 3,4 in one each.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("src", "dst")
    val got = Graph.triangleCounts(Graph.undirected(edges))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("reversed/duplicate/self edges canonicalize away; triangle-free graph emits nothing") {
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 1L), (1L, 3L), (2L, 3L),
        (3L, 3L))
      .toDF("src", "dst")
    assert(Graph.undirected(messy).count() == 3)
    val got = Graph.triangleCounts(Graph.undirected(messy))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // a path closes no triangle
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.triangleCounts(Graph.undirected(path)).count() == 0)
  }

  test("orientation invariance: counts match under a random vertex relabeling") {
    // 60-vertex circulant graph with chords — triangle counts must not
    // depend on which endpoint happens to carry the lower id.
    val edges = spark.range(60).select(col("id").as("src"),
        ((col("id") + 1) % 60).as("dst"))
      .unionAll(spark.range(60).select(col("id").as("src"),
        ((col("id") + 2) % 60).as("dst")))
    val base = Graph.triangleCounts(Graph.undirected(edges))
      .agg(sum(col("n_triangles"))).head.getLong(0)
    // relabel v -> (v * 7 + 11) mod 60 (7 coprime to 60: a bijection)
    val relabeled = edges.select(((col("src") * 7 + 11) % 60).as("src"),
      ((col("dst") * 7 + 11) % 60).as("dst"))
    val got = Graph.triangleCounts(Graph.undirected(relabeled))
      .agg(sum(col("n_triangles"))).head.getLong(0)
    assert(base == got && base == 180L) // 60 triangles x 3 vertices
  }

  test("onion layers: hand graph peels in the right rounds, core survives") {
    // 6-clique {1..6} (degree >= 5 inside — survives k=4 peel, layer 0);
    // cascade of hangers-on: 8 touches {7, 1} (degree 2 — peels round
    // 1); 7 touches {1, 2, 8, 9} (degree 4 survives round 1, loses 8 →
    // degree 3, peels round 2); 9 touches {1, 2, 3, 7} (degree 4 through
    // round 2, loses 7 → peels round 3). Three genuine peel rounds.
    val clique = (1L to 6L).combinations(2).map(p => (p(0), p(1))).toSeq
    val edges = (clique ++ Seq((7L, 1L), (7L, 2L), (7L, 8L), (7L, 9L),
        (8L, 1L), (9L, 1L), (9L, 2L), (9L, 3L)))
      .toDF("src", "dst")
    val got = Graph.onionLayers(Graph.undirected(edges), k = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val want = (1L to 6L).map(_ -> 0).toMap ++
      Map(8L -> 1, 7L -> 2, 9L -> 3)
    assert(got == want)
  }

  test("onion layers: empty core — every vertex gets a positive layer") {
    // path 1-2-3-4-5: all degrees <= 2, k=3 peel empties the graph in
    // two rounds (endpoints first, then the middle as degrees drop)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val got = Graph.onionLayers(Graph.undirected(path), k = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.values.forall(_ >= 1) && got.size == 5)
    // k=3 peel removes everything in ONE round here (all degrees < 3)
    assert(got.values.toSet == Set(1))
  }

  test("weighted SSSP: the longer-hop path wins on total weight") {
    // 1 → 4 direct costs 10; 1 → 2 → 3 → 4 costs 3+3+3 = 9. Hop-count
    // BFS would answer 1; weighted relaxation must answer 9 via 3 hops.
    val uw = Seq((1L, 4L, 10L), (1L, 2L, 3L), (2L, 3L, 3L), (3L, 4L, 3L))
    val edges = (uw ++ uw.map { case (a, b, w) => (b, a, w) })
      .toDF("v", "u", "w")
    val seeds = Seq(Tuple1(1L)).toDF("v")
    val got = Graph.weightedSssp(edges, seeds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 3L, 3L -> 6L, 4L -> 9L))
  }
}
