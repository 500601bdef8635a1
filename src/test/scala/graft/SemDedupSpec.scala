package graft

import graft.ops.SemDedup

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // dim-2 fixture, k=2 seed centroids (ids 0/1); cosines hand-checkable:
  //  id2 (.9,.45): cell 0, cos to id0 = 0.894 (below eps)
  //  id3 (.89,.46): cell 0, cos(v2,v3) ≈ 0.99992 -> dropped by id2
  //  id4 (.45,.9): cell 1 by symmetry, no near-dup
  //  id5 (-1,-.01): negative sims, argmax picks cell 1 (-0.01 > -0.99)
  private lazy val emb = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f)),
    (2L, Array(0.9f, 0.45f)),
    (3L, Array(0.89f, 0.46f)),
    (4L, Array(0.45f, 0.9f)),
    (5L, Array(-1.0f, -0.01f))
  ).toDF("vec_id", "embedding")

  test("within-cell near-dups drop to the lowest id; cells assign by argmax cosine") {
    val out = SemDedup.survivors(emb, k = 2, eps = 0.95)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 4L, 5L), out)
    assert(out(0L) == 0 && out(2L) == 0)
    assert(out(1L) == 1 && out(4L) == 1)
    assert(out(5L) == 1) // all-negative sims still pick the max
  }

  test("eps widens or narrows the pruned set monotonically") {
    // at eps 0.89 the 0.894-sim pairs (0,2) and (1,4) also collapse
    val tight = SemDedup.survivors(emb, k = 2, eps = 0.89)
      .collect().map(_.getLong(0)).toSet
    assert(tight == Set(0L, 1L, 5L), tight)
    // at eps just above the id2/id3 sim nothing is pruned
    val loose = SemDedup.survivors(emb, k = 2, eps = 0.99999)
      .collect().map(_.getLong(0)).toSet
    assert(loose == Set(0L, 1L, 2L, 3L, 4L, 5L))
  }

  test("cross-cell near-dups are NOT pruned (the SemDeDup approximation)") {
    // id6 ≈ id4 but nudged toward cell 0's centroid enough to flip cells?
    // keep it simple: two near-identical vectors pinned to DIFFERENT
    // cells by construction sit on either side of the 45° boundary
    val e = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(1.0f, 0.99f)), (3L, Array(0.99f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = SemDedup.survivors(e, k = 2, eps = 0.9)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // cos(v2,v3) ≈ 0.9998 but cells differ (2->0, 3->1): both survive
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    assert(out(2L) == 0 && out(3L) == 1)
  }
}
