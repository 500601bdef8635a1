package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge table — the graph-centrality pass that turns a
  * similarity/link graph (e.g. [[KnnGraph]]) into per-node importance
  * for diversity-aware corpus curation, seed selection, and spam/quality
  * propagation.
  *
  * Determinism: ranks live in integer MICRO-UNITS (1.0 ≡ 1 000 000) and
  * the damped update is the exact integer rule
  * {{{ r' = 150000 + (85 · Σ_in floor(r_src / outdeg_src)) div 100 }}}
  * (damping 0.85, teleport 0.15) — all-integer arithmetic, so every
  * engine, executor, and retry computes bit-identical ranks; there is no
  * float summation order to drift. Dangling-node mass is dropped (the
  * standard sparse simplification; totals are not conserved, rankings
  * are).
  *
  * Scale (100 TB graph): one iteration = one equality join of ranks onto
  * edges by src + one map-side-combined dst aggregate — both shuffle on
  * graph keys and AQE handles hub skew; nothing ever materializes on the
  * driver. Iterations unroll into the lazy plan (caller picks the count;
  * production graphs converge in tens of iterations — checkpoint the
  * lineage every few rounds at that depth).
  */
object PageRank {

  /** `iters` damped iterations over `nodes` (column `id`) and `edges`
    * (columns `src`, `dst`). Returns (id, rank) in micro-units.
    */
  def iterate(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // NOT cached: the edge subtree repeats across iterations, but Spark's
    // ReuseExchange already dedupes the identical exchanges inside one
    // action, and an eager cache here measured SLOWER (3.15 s vs 2.46 s
    // at sf0.1) by blocking that fusion. At real iteration depths the
    // caller should checkpoint ranks (lineage growth), not cache edges.
    val e = edges.select("src", "dst").join(deg, "src")
    var ranks = nodes.select(col("id"), lit(1000000L).as("rank"))
    for (_ <- 1 to iters) {
      val in = e.join(ranks, e("src") === ranks("id"))
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("in_units"))
      ranks = nodes.join(in, nodes("id") === in("dst"), "left")
        .select(nodes("id"),
          (lit(150000L) + expr("(85 * coalesce(in_units, 0L)) div 100"))
            .as("rank"))
    }
    ranks
  }
}
