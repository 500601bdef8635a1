package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list, by iterative
  * minimum-label propagation: every vertex starts labeled with itself;
  * each round it takes the minimum of its own label and its neighbours'
  * labels; a fixpoint labels every vertex with its component's minimum
  * vertex id.
  *
  * This is the survivor-selection step a near-dedup pipeline needs after
  * pair generation ([[Dedup.minhashExactPairs]], [[Dedup.simhashPairs]]):
  * duplicate PAIRS overlap transitively (A≈B, B≈C), so "keep one per
  * cluster" is a components problem, not a per-pair choice.
  *
  * Scale shape: each round is one equality join (edges ⋈ labels on the
  * neighbour id) + one min-aggregation — all hash-partitioned by vertex
  * id, no driver data. Rounds = component diameter; near-dup clusters are
  * small and dense (diameter ≲ 3), so the loop closes in 2–4 rounds. For
  * adversarial long-chain graphs the alternating small-star/large-star
  * algorithm (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", public) converges in O(log n) rounds with the same per-round
  * join shape — the swap would be local to this loop. Driver involvement
  * per round is one existence check (`isEmpty` on changed labels).
  */
object Components {

  /** Driver-side union-find with path compression over collected edge
    * rows (columns 0 and 1 = the two endpoints). Root choice = minimum
    * member under the keys' natural order, matching the distributed
    * min-label fixpoint exactly. Returns None when any key is null or
    * not `Comparable` (struct/array/binary vertex ids have no total
    * order here — comparing them as "equal" would pick ARBITRARY roots
    * and silently violate the min-label contract, ADVICE r9); such
    * graphs must take the iterative path, whose min() aggregate orders
    * every Spark type natively. Shared by both components entry points'
    * small-graph fast paths.
    */
  private def localUnionFind(
      collected: Array[org.apache.spark.sql.Row]): Option[Seq[(Any, Any)]] = {
    val locallyOrderable = collected.forall { r =>
      r.get(0).isInstanceOf[java.lang.Comparable[_]] &&
        r.get(1).isInstanceOf[java.lang.Comparable[_]]
    }
    if (!locallyOrderable) return None
    val parent = scala.collection.mutable.Map.empty[Any, Any]
    def find(x: Any): Any = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    val ord: Ordering[Any] = (a: Any, b: Any) =>
      a.asInstanceOf[java.lang.Comparable[Any]].compareTo(b)
    collected.foreach { r =>
      val (a, b) = (find(r.get(0)), find(r.get(1)))
      if (a != b) { if (ord.lt(a, b)) parent(b) = a else parent(a) = b }
    }
    val vertices = collected.iterator
      .flatMap(r => Iterator(r.get(0), r.get(1))).toSet
    Some(vertices.toSeq.map(v => (v, find(v))))
  }

  /** @return (v, comp) — every vertex appearing in `edges`, labeled with
    *         the minimum vertex id reachable from it.
    *
    * Runtime-adaptive small-graph fast path (round 9): a pair graph whose
    * EDGE COUNT is at most `localEdgeBound` is finished with a driver-side
    * union-find instead of distributed label rounds — the same
    * runtime-size decision AQE makes when it broadcasts a small join
    * side. Near-dup pair graphs are routinely tiny relative to their
    * corpus (124 edges from a 2.6k-doc funnel stage at sf0.1) while each
    * distributed round costs join+agg+checkpoint+emptiness jobs; at the
    * default bound the collect moves ≤ 4096 edges (~64 KB) — within the
    * library's established bounded-collect budget (k-means centroids,
    * watermark scalars). Graphs above the bound take the unchanged
    * iterative path, so kNN-graph-scale inputs never touch the driver.
    */
  def connectedComponents(edges: DataFrame, src: String = "id1",
      dst: String = "id2", maxIters: Int = 25,
      localEdgeBound: Int = 4096): DataFrame = {
    val pairEdges = edges.select(col(src).as("v"), col(dst).as("w")).cache()
    val nEdges = pairEdges.count()
    if (nEdges <= localEdgeBound) {
      val vType = pairEdges.schema("v").dataType
      // Union-find over opaque vertex keys (the label type follows the
      // input column type); falls through to the iterative path when the
      // keys carry no local total order (see localUnionFind).
      localUnionFind(pairEdges.collect()) match {
        case Some(labeled) =>
          pairEdges.unpersist()
          val rows = labeled.map { case (v, c) =>
            org.apache.spark.sql.Row(v, c) }
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("v", vType),
            org.apache.spark.sql.types.StructField("comp", vType)))
          return edges.sparkSession.createDataFrame(
            edges.sparkSession.sparkContext.parallelize(rows, 1), schema)
        case None => ()
      }
    }
    val sym = pairEdges
      .union(pairEdges.select(col("w").as("v"), col("v").as("w")))
      .cache()
    // localCheckpoint (eager) truncates lineage each round — the standard
    // move for iterative dataflow (GraphX/MLlib do the same): without it,
    // round N's logical plan nests all previous rounds plus the upstream
    // pair-generation pipeline, and planning cost grows per round. Blocks
    // are freed by the context cleaner once a round's frame is dropped.
    var labels = sym.select(col("v")).distinct()
      .withColumn("comp", col("v")).localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // One join + one aggregation per round. The previous label rides
      // along as a second aggregate (each v has exactly one labels row, so
      // max over its single non-null value IS the old label) — the
      // convergence test is then a filter over the just-materialized round
      // result instead of a second join job per round.
      val viaNeighbour = sym
        .join(labels.select(col("v").as("w"), col("comp")), "w")
        .select(col("v"), col("comp"),
          lit(null).cast(labels.schema("comp").dataType).as("__old"))
      val next = viaNeighbour
        .union(labels.select(col("v"), col("comp"), col("comp").as("__old")))
        .groupBy("v")
        .agg(min(col("comp")).as("comp"), max(col("__old")).as("__old"))
        .localCheckpoint()
      converged = next.filter(col("comp") =!= col("__old")).isEmpty
      labels = next.drop("__old")
      i += 1
    }
    sym.unpersist()
    pairEdges.unpersist()
    // Partially-propagated labels are silently WRONG (a caller would keep
    // duplicates that share a component) — fail loudly instead. Long-chain
    // graphs that legitimately need more rounds should use
    // [[connectedComponentsStar]] (O(log n) rounds).
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIters rounds; " +
        "use connectedComponentsStar for long-chain graphs or raise maxIters")
    labels
  }

  /** Connected components by the ALTERNATING small-star/large-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14): converges in O(log n) rounds on ANY graph — the
    * long-chain case where plain min-label propagation needs
    * O(diameter) rounds — with the same per-round shape (one
    * aggregation + one join, all hash-partitioned by vertex).
    *
    *  - large-star: every vertex connects its LARGER neighbours to the
    *    minimum of its closed neighbourhood.
    *  - small-star: with edges directed larger→smaller, every vertex
    *    re-points its (smaller) neighbours and itself at the minimum.
    *
    * Both preserve connectivity exactly (lemmas 1–2 of the paper); the
    * fixpoint is a union of stars whose roots are the component minima.
    * Same contract as [[connectedComponents]]: every vertex appearing in
    * `edges` is returned labeled with its component's minimum id.
    */
  def connectedComponentsStar(edges: DataFrame, src: String = "id1",
      dst: String = "id2", maxIters: Int = 30,
      localEdgeBound: Int = 4096): DataFrame = {
    // every input vertex, including self-loop-only ones the star rounds
    // drop — re-attached as their own component at the end (consumed once,
    // in the final labels join — no cache)
    val vertices = edges.select(col(src).as("v"))
      .union(edges.select(col(dst).as("v"))).distinct()
    var e = edges
      .select(greatest(col(src), col(dst)).as("u"), least(col(src), col(dst)).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    // Track |e| across rounds: the convergence test needs this round's
    // count AND last round's, and last round's was already computed as
    // that round's small.count() — re-counting `e` cost one extra job
    // per round (driver job overhead dominates these vertex-count-sized
    // rounds at the bench SFs; r16 measured ~half the wall of the
    // components queries BETWEEN stages).
    var eCount = e.count()
    // Runtime-adaptive small-graph fast path (optimization r17), the same
    // move (same default bound, same driver-collect budget: ≤4096 edge
    // rows ≈ 64 KB) connectedComponents has carried since r9: the star
    // rounds cost ~6 driver jobs each (sym/agg/join/distinct/checkpoint/
    // count) and the bench's kNN pair graphs are a few thousand edges
    // (3 953 undirected at sf0.1 — measured r17), so the distributed
    // loop is pure scheduling floor there (~3 s for ~60 ms of row work).
    // Union-find over the collected canonical edges, root = min member —
    // bit-identical labels to the star fixpoint (oracle-checked). Graphs
    // over the bound (every production-scale corpus; 100× scale harness
    // runs ~450 k edges) take the unchanged star rounds, exactly like
    // AQE's runtime broadcast decision.
    if (eCount <= localEdgeBound) {
      localUnionFind(e.collect()) match {
        case Some(labeled) =>
          val vType = e.schema("u").dataType
          val rows = labeled.map { case (v, c) =>
            org.apache.spark.sql.Row(v, c) }
          val schema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("v", vType),
            org.apache.spark.sql.types.StructField("comp", vType)))
          val locLabels = edges.sparkSession.createDataFrame(
            edges.sparkSession.sparkContext.parallelize(rows, 1), schema)
          // same final shape as the distributed exit: every input vertex,
          // isolated ones labeling themselves
          return vertices.join(locLabels, Seq("v"), "left")
            .select(col("v"), coalesce(col("comp"), col("v")).as("comp"))
        case None => ()
      }
    }
    var converged = eCount == 0L
    var i = 0
    while (!converged && i < maxIters) {
      // large-star over the symmetrized edges
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val lmins = sym.groupBy("u").agg(least(min(col("v")), col("u")).as("m"))
      val large = sym.join(lmins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct() // (larger, closed-neighbourhood min): u > v invariant holds
      // small-star: edges already directed larger->smaller
      val smins = large.groupBy("u").agg(min(col("v")).as("m"))
      val small = large.join(smins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(smins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint() // truncate per-round lineage (see above)
      // && short-circuits: the set-difference job only runs in rounds
      // whose edge COUNT already matches (in practice the final round or
      // two) — earlier rounds pay one count, not a full except
      val smallCount = small.count()
      converged = smallCount == eCount && small.except(e).isEmpty
      e = small
      eCount = smallCount
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge within $maxIters rounds " +
        "(bound is O(log n) — raise maxIters)")
    // fixpoint = stars (u -> root); roots and isolated vertices label themselves
    val labels = e.select(col("u").as("v"), col("v").as("comp"))
    vertices.join(labels, Seq("v"), "left")
      .select(col("v"), coalesce(col("comp"), col("v")).as("comp"))
  }

  /** Incremental maintenance: fold a delta edge batch into existing
    * component labels WITHOUT recomputing over the full graph.
    *
    * Contraction argument: every label is the min id of its component,
    * so collapsing each old component to its label-node and running
    * components over the delta edges MAPPED THROUGH the labels (at most
    * |delta| edges) yields, per touched old label, the min over the
    * merged labels — which IS the merged component's min id. Composing
    * over any batch sequence therefore equals one from-scratch run
    * (ComponentsSpec pins the identity per delta shape and as a 6-batch
    * fold; PropertySpec randomizes graph and batch split). Vertices
    * first seen in the delta enter as singleton labels.
    *
    * `labels` is (v, comp) — yesterday's materialized state, e.g. the
    * staged parquet the `ivm_components_delta` query serves; `delta` is
    * an undirected edge batch with columns (a, b). Cost ∝ |delta| +
    * |touched components|; the contracted run takes
    * [[connectedComponents]]' small-graph fast path in practice.
    */
  def applyDelta(labels: DataFrame, delta: DataFrame): DataFrame = {
    // Inline misuse guard (ADVICE r11): the contraction algebra is only
    // sound when `labels` satisfies the min-id invariant (comp == min
    // vertex id of its component). comp ≤ v is a necessary condition
    // every row can check locally, so a labeling from any other scheme
    // fails loudly on first use instead of silently corrupting every
    // subsequent fold. The guard rides inside the consumed `comp` value
    // (no extra job, no prunable side-channel column).
    val checked = labels.select(col("v"),
      when(col("comp") <= col("v"), col("comp"))
        .otherwise(raise_error(concat(
          lit("Components.applyDelta: labels violate the min-id " +
            "invariant (comp > v at v="),
          col("v").cast("string"), lit(")")))).as("comp"))
    val dverts = delta.select(col("a").as("v"))
      .unionByName(delta.select(col("b").as("v"))).distinct()
    val stale = checked.unionByName(
      dverts.join(labels, Seq("v"), "left_anti")
        .select(col("v"), col("v").as("comp")))
    val contracted = delta
      .join(stale.select(col("v").as("a"), col("comp").as("ca")), "a")
      .join(stale.select(col("v").as("b"), col("comp").as("cb")), "b")
      .select(col("ca").as("a"), col("cb").as("b"))
      .filter(col("a") =!= col("b"))
    val cc2 = connectedComponents(contracted, "a", "b")
    stale.join(cc2.select(col("v").as("comp"), col("comp").as("newc")),
        Seq("comp"), "left")
      .select(col("v"), col("comp").as("old_comp"),
        coalesce(col("newc"), col("comp")).as("new_comp"))
  }
}
