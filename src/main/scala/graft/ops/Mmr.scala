package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein, SIGIR
  * 1998) — the diversity pass between ANN retrieval and a RAG context
  * window: greedily pick the candidate maximizing
  * {{{ λ·rel(q, c) − (1−λ)·max_{p ∈ picked} sim(c, p) }}}
  * so near-duplicate passages don't crowd out coverage.
  *
  * Scale shape: MMR is inherently sequential in the PICK dimension but
  * embarrassingly parallel in the QUERY dimension — each unrolled
  * iteration is one anti-join (drop picked), one equality join against
  * the picked set (≤ picks rows per query), one (query, candidate)
  * aggregate, and one per-query top-1 window. Candidate sets are small
  * by construction (the ANN stage's top-k), so every stage is
  * candidate-sized; the corpus is never touched.
  *
  * Determinism: relevance and pairwise similarities enter the score
  * ROUNDED to 6 decimals, so the score arithmetic and every comparison
  * are identical in any engine; ties break on candidate id.
  */
object Mmr {

  /** Re-rank `cand` (columns: query, id, relevance, vector) down to
    * `picks` rows per query, MMR-ordered (`mmr_rank` 1..picks).
    *
    * Each pick's frame is eagerly `localCheckpoint`ed: pick i references
    * the selected set TWICE (anti-join + pairwise-sim join) and the
    * selected set is itself a union over all previous picks, so the lazy
    * logical tree grows EXPONENTIALLY in `picks` (picks=3 planned as
    * 1 005 physical operators / 156 exchanges, and executed ~850 CPU-s of
    * duplicated subtree work at sf0.1 — measured r16). Checkpointing
    * truncates the lineage to the candidate-sized pick result (≤ one row
    * per query per pick), the same iterative-dataflow move as
    * [[Components.connectedComponents]]; the per-pick frames are tiny by
    * construction, so the materialization cost is a handful of
    * candidate-sized jobs.
    *
    * Two caveats of the eager checkpoint (ADVICE r16): rerank() runs
    * Spark jobs at DataFrame-CONSTRUCTION time — callers get
    * materialization side effects even if they never execute an action —
    * and `localCheckpoint` stores blocks on executors without lineage,
    * so under executor loss or dynamic allocation a checkpointed block
    * can vanish unrecoverably; a cluster deployment that needs
    * fault-tolerant intermediates should gate on a reliable
    * `checkpoint()` dir when one is configured. Both trade-offs are
    * accepted here for the same reason as the Components/Graph
    * precedent: the frames are tiny and the plan blow-up they prevent is
    * catastrophic.
    */
  def rerank(cand: DataFrame, picks: Int, lambda: Double = 0.5,
      queryCol: String = "query_id", idCol: String = "vec_id",
      relCol: String = "rel", vecCol: String = "embedding"): DataFrame = {
    require(picks >= 1, "picks >= 1")
    val w = Window.partitionBy(col(queryCol))
    var selected = cand
      .withColumn("__rn",
        row_number().over(w.orderBy(desc(relCol), col(idCol))))
      .filter(col("__rn") === 1).drop("__rn")
      .withColumn("mmr_rank", lit(1))
      .localCheckpoint()
    for (i <- 2 to picks) {
      val sel = selected.select(col(queryCol), col(vecCol).as("__sv"))
      val remaining = cand.join(
        selected.select(col(queryCol), col(idCol)),
        Seq(queryCol, idCol), "left_anti")
      val maxps = remaining.join(sel, Seq(queryCol))
        .withColumn("__ps",
          round(Similarity.cosine(col(vecCol), col("__sv")), 6))
        .groupBy(col(queryCol), col(idCol))
        .agg(max(col("__ps")).as("__mps"))
      val pick = remaining.join(maxps, Seq(queryCol, idCol))
        .withColumn("__score",
          lit(lambda) * col(relCol) - lit(1 - lambda) * col("__mps"))
        .withColumn("__rn",
          row_number().over(w.orderBy(desc("__score"), col(idCol))))
        .filter(col("__rn") === 1)
        .drop("__rn", "__mps", "__score")
        .withColumn("mmr_rank", lit(i))
      selected = selected.unionByName(pick).localCheckpoint()
    }
    selected
  }
}
