package graft

import org.apache.spark.sql.functions._

import graft.ops.{Components, Dedup}

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: chains merge transitively, singletons keep themselves") {
    // components: {1,2,3,9} (chain 1-2, 2-3, 3-9), {5,6}; vertex 8 unpaired
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 9L), (5L, 6L), (8L, 8L))
      .toDF("id1", "id2")
    val comp = Components.connectedComponents(edges)
      .orderBy("v").as[(Long, Long)].collect().toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L && comp(9L) == 1L)
    assert(comp(5L) == 5L && comp(6L) == 5L)
    assert(comp(8L) == 8L)
  }

  test("near-dup survivors: one per cluster (the min id), unpaired docs all survive") {
    val docs = Seq(
      (1L, "aa bb cc dd"), (2L, "aa bb cc dd"), (3L, "aa bb cc dd"), // cluster
      (10L, "totally different text here"),
      (11L, "another unrelated document")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    val out = Dedup.nearDupSurvivors(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 10L, 11L))
  }

  test("random graphs: distributed labels match a driver-side union-find") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgesGen = Gen.nonEmptyListOf(for {
      a <- Gen.choose(0L, 40L); b <- Gen.choose(0L, 40L)
    } yield (a, b))
    for (i <- 0 until 6) {
      val edges = edgesGen
        .apply(Gen.Parameters.default.withSize(30), Seed(7L + i)).get
      // reference: classic union-find over the same edges
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(v => v -> find(v)).toMap
      val got = Components.connectedComponents(edges.toDF("id1", "id2"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"seed ${7 + i}: $got vs $expected")
    }
  }

  test("small-graph fast path ≡ distributed rounds (localEdgeBound gate both ways)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgesGen = Gen.nonEmptyListOf(for {
      a <- Gen.choose(0L, 60L); b <- Gen.choose(0L, 60L)
    } yield (a, b))
    for (i <- 0 until 4) {
      val edges = edgesGen
        .apply(Gen.Parameters.default.withSize(40), Seed(101L + i)).get
        .toDF("id1", "id2")
      val local = Components.connectedComponents(edges, "id1", "id2",
        maxIters = 25, localEdgeBound = Int.MaxValue)
        .as[(Long, Long)].collect().toMap
      val dist = Components.connectedComponents(edges, "id1", "id2",
        maxIters = 25, localEdgeBound = 0) // force the iterative path
        .as[(Long, Long)].collect().toMap
      assert(local == dist, s"seed ${101 + i}")
    }
    // non-numeric vertex keys take the same fast path (Comparable ordering)
    val s = Seq(("b", "a"), ("c", "b"), ("x", "y")).toDF("id1", "id2")
    val got = Components.connectedComponents(s)
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("star contraction: 1000-vertex chain converges in O(log n) rounds, exact labels") {
    // shuffled so the chain isn't accidentally id-ordered on disk
    val rnd = new scala.util.Random(42)
    val edges = rnd.shuffle((0L until 999L).map(i => (i, i + 1)).toList)
      .toDF("id1", "id2")
    // maxIters = 12 doubles as the round-count assertion: the plain
    // propagation variant needs ~999 rounds here, star contraction O(log n)
    val comp = Components.connectedComponentsStar(edges, maxIters = 12)
      .as[(Long, Long)].collect()
    assert(comp.length == 1000)
    assert(comp.forall(_._2 == 0L))
  }

  test("star contraction matches a driver-side union-find on random graphs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val edgesGen = Gen.nonEmptyListOf(for {
      a <- Gen.choose(0L, 40L); b <- Gen.choose(0L, 40L)
    } yield (a, b))
    for (i <- 0 until 6) {
      val edges = edgesGen
        .apply(Gen.Parameters.default.withSize(30), Seed(70L + i)).get
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(v => v -> find(v)).toMap
      val got = Components.connectedComponentsStar(edges.toDF("id1", "id2"))
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"seed ${70 + i}: $got vs $expected")
    }
  }

  test("components of the real sf0.001 minhash pairs match brute-force grouping") {
    val docs = Tables.documents(spark, sf0001)
    val pairs = Dedup.minhashExactPairs(docs, "text", "doc_id", threshold = 0.8)
      .cache()
    val comp = Components.connectedComponents(pairs)
    // every pair's two endpoints carry the same component label
    val mismatched = pairs
      .join(comp.select(col("v").as("id1"), col("comp").as("c1")), "id1")
      .join(comp.select(col("v").as("id2"), col("comp").as("c2")), "id2")
      .filter(col("c1") =!= col("c2"))
    assert(mismatched.isEmpty)
    // and each component's label is its minimum member
    val badLabel = comp.groupBy("comp").agg(min("v").as("mn"))
      .filter(col("comp") =!= col("mn"))
    assert(badLabel.isEmpty)
  }

  /** The ivm_components_delta contraction identity: old labels collapse
    * each component to its min-id super-node, delta edges map through
    * the labels, components of the CONTRACTED graph relabel the touched
    * clusters — and the result must equal components recomputed from
    * scratch on the union. The fixture exercises every delta shape:
    * a cross-component merge, an intra-component edge (no-op), a
    * chain-of-merges (3 old components fused through 2 delta edges),
    * and brand-new vertices (singleton entering and singleton pair). */
  test("incremental delta relabel == from-scratch components on the union") {
    val e0 = Seq((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L), (10L, 11L))
      .toDF("a", "b")
    val delta = Seq(
      (2L, 3L),   // merges {1,2} with {3,4}
      (5L, 6L),   // intra-component, must change nothing
      (4L, 7L),   // chains the merged {1,2,3,4} with {7,8}
      (11L, 20L), // new vertex 20 joins {10,11}
      (30L, 31L)  // entirely new pair
    ).toDF("a", "b")
    val l0 = Components.connectedComponents(e0, "a", "b")
    val incr = Components.applyDelta(l0, delta)
      .select(col("v"), col("new_comp").as("comp"))
    val scratch = Components.connectedComponents(
      e0.unionByName(delta), "a", "b")
    assert(incr.count() == scratch.count())
    assert(incr.except(scratch).isEmpty && scratch.except(incr).isEmpty,
      "incremental relabel diverges from the from-scratch components")
    // spot-pin the merge chain and the untouched component
    val m = incr.as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L, 7L, 8L).forall(m(_) == 1L))
    assert(m(5L) == 5L && m(6L) == 5L && m(20L) == 10L && m(31L) == 30L)
  }

  /** Contraction composes across MANY delta batches — the streaming /
    * daily-maintenance claim: folding the update over b batches must
    * equal one from-scratch run over everything, for every prefix. A
    * deterministic hash-split of a random-ish graph into 6 batches
    * exercises merges, re-merges of previously merged clusters, and
    * vertices first seen mid-stream. */
  test("delta relabel folds over 6 batches, prefix-exact at every step") {
    def applyDelta(labels: org.apache.spark.sql.DataFrame,
        delta: org.apache.spark.sql.DataFrame) =
      Components.applyDelta(labels, delta)
        .select(col("v"), col("new_comp").as("comp"))
        .localCheckpoint() // state handoff, as a deployment would persist
    // 300 edges over 120 vertices: dense enough to force re-merges
    val edges = spark.range(300).select(
        pmod(Dedup.md5Hash64(concat(lit("ea|"), col("id")))
          .bitwiseAND(lit(Long.MaxValue)), lit(120L)).as("a"),
        pmod(Dedup.md5Hash64(concat(lit("eb|"), col("id")))
          .bitwiseAND(lit(Long.MaxValue)), lit(120L)).as("b"),
        pmod(col("id"), lit(6L)).as("batch"))
      .filter(col("a") =!= col("b")).cache()
    var labels = spark.emptyDataFrame
      .withColumn("v", lit(0L)).withColumn("comp", lit(0L)).limit(0)
    for (i <- 0L until 6L) {
      labels = applyDelta(labels,
        edges.filter(col("batch") === i).select("a", "b"))
      val scratch = Components.connectedComponents(
        edges.filter(col("batch") <= i).select("a", "b"), "a", "b")
      assert(labels.except(scratch).isEmpty &&
        scratch.except(labels).isEmpty,
        s"fold diverges from scratch after batch $i")
    }
  }
}
