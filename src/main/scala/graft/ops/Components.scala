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

  /** @return (v, comp) — every vertex appearing in `edges`, labeled with
    *         the minimum vertex id reachable from it.
    */
  def connectedComponents(edges: DataFrame, src: String = "id1",
      dst: String = "id2", maxIters: Int = 25): DataFrame = {
    val sym = edges.select(col(src).as("v"), col(dst).as("w"))
      .union(edges.select(col(dst).as("v"), col(src).as("w")))
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
    // Partially-propagated labels are silently WRONG (a caller would keep
    // duplicates that share a component) — fail loudly instead. Long-chain
    // graphs that legitimately need more rounds should use
    // [[connectedComponentsStar]] (O(log n) rounds).
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIters rounds; " +
        "use connectedComponentsStar for long-chain graphs or raise maxIters")
    labels
  }
}
