package graft

import graft.ops.KnnGraph
import org.apache.spark.sql.functions._

class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  // dim-2 fixture around two seed centroids (ids 0/1); cosines are
  // hand-checkable: 2 and 3 are near-dups in cell 0, 4 sits in cell 1.
  private lazy val emb = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f)),
    (2L, Array(0.9f, 0.45f)),
    (3L, Array(0.89f, 0.46f)),
    (4L, Array(0.45f, 0.9f))
  ).toDF("vec_id", "embedding")

  private lazy val cents = Seq(
    (0, Array(1.0f, 0.0f)), (1, Array(0.0f, 1.0f))
  ).toDF("cid", "centroid")

  test("within-cell edges rank by cosine desc, dst asc; k truncates") {
    val out = KnnGraph.inCells(emb, cents, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // cell 0 = {0,2,3}, cell 1 = {1,4}
    assert(out(0L) == 2L)   // cos(0,2) > cos(0,3)
    assert(out(2L) == 3L)   // 2's nearest is its near-dup 3
    assert(out(3L) == 2L)
    assert(out(1L) == 4L && out(4L) == 1L)
  }

  test("edges never cross cells at nProbe=1 and never self-loop") {
    val out = KnnGraph.inCells(emb, cents, k = 4).collect()
    assert(out.forall(r => r.getLong(0) != r.getLong(2)))
    val cellOf = Map(0L -> 0, 2L -> 0, 3L -> 0, 1L -> 1, 4L -> 1)
    assert(out.forall(r => cellOf(r.getLong(0)) == cellOf(r.getLong(2))))
    // cell 0 has 2 possible neighbours per source, cell 1 has 1
    val deg = out.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(deg == Map(0L -> 2, 2L -> 2, 3L -> 2, 1L -> 1, 4L -> 1))
  }

  test("nProbe=2 recovers a cross-boundary near-dup edge nProbe=1 misses") {
    // 2 and 3 straddle the 45-degree Voronoi boundary: near-identical
    // vectors in different cells, invisible to within-cell ranking.
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 0.99f)), (3L, Array(0.99f, 1.0f))
    ).toDF("vec_id", "embedding")
    def edges(nProbe: Int) =
      KnnGraph.inCells(e, cents, k = 1, nProbe = nProbe)
        .select(col("src"), col("dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!edges(1).contains((2L, 3L)))
    assert(edges(2).contains((2L, 3L)) && edges(2).contains((3L, 2L)))
  }

  test("no duplicate (src, dst) edges when nProbe > 1") {
    val out = KnnGraph.inCells(emb, cents, k = 4, nProbe = 2)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == out.distinct.length)
  }
}
