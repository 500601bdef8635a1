package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Whole-surface physical-plan audit: build every `SparkEntry.queries`
  * plan at a small SF and grep it for the shapes that decide 100 TB
  * viability — the automated version of the per-operator `.explain`
  * review the build discipline requires.
  *
  * Counted per query (simple-mode plan, one line per operator):
  *  - `exchanges`      — shuffle count (the scale currency);
  *  - `sort_merge`     — SortMergeJoins (fine big-big, suspicious when a
  *                       side is dimension-sized);
  *  - `bcast_nlj`      — BroadcastNestedLoopJoins (the interval-join /
  *                       scalar-fanout family: bounded by design);
  *  - `cartesian`      — CartesianProduct: NEVER acceptable; the audit
  *                       exits non-zero if any query plans one;
  *  - `codegen_spans`  — WholeStageCodegen regions (more is better,
  *                       fewer means interpreted seams);
  *  - `single_partition` — Exchange SinglePartition occurrences (fine
  *                       below an aggregate's single row or a final
  *                       top-k; a corpus-scale funnel otherwise — the
  *                       r10 dedup_sorted_neighborhood hazard class).
  *
  * Queries whose BUILDER executes work (streaming lifecycles, adaptive
  * probes) still yield a final batch plan; failures are recorded, never
  * swallowed. Output: one JSON line per query + a summary line, and the
  * full map to PLAN_AUDIT file (SPARK_GRAFT_AUDIT_OUT).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = new StringBuilder("{\n")
    var cartesianOffenders = List.empty[String]
    var failed = List.empty[String]
    val names = SparkEntry.queries.keys.toSeq.sorted
    val rows = names.flatMap { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution
          .explainString(ExplainMode.fromString("simple"))
        def c(p: String) = p.r.findAllIn(plan).length
        // Shuffles specifically: "Exchange hashpartitioning(...)" etc.
        // A bare "Exchange" pattern also hits BroadcastExchange (its
        // mode text starts with "HashedRelation…", but the operator name
        // itself contains the substring) and ReusedExchange, inflating
        // the metric this audit documents as the scale currency.
        val ex = c(
          "Exchange (hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)")
        val smj = c("SortMergeJoin")
        val nlj = c("BroadcastNestedLoopJoin")
        val cart = c("CartesianProduct")
        val wsc = c("WholeStageCodegen")
        // The r10-#1 hazard class, tracked per query: a SinglePartition
        // exchange funnels every row through one task. Legitimate when
        // the input is an aggregate's single row or a final top-k;
        // corpus-scale rows above one are the dedup_sorted_neighborhood
        // failure mode — the artifact makes each occurrence reviewable.
        val single = c("Exchange SinglePartition")
        if (cart > 0) cartesianOffenders ::= name
        Some((name, ex, smj, nlj, cart, wsc, single))
      } catch {
        case e: Throwable =>
          failed ::= s"$name: ${Option(e.getMessage).getOrElse(e.toString).take(120)}"
          None
      }
    }
    rows.foreach { case (n, ex, smj, nlj, cart, wsc, single) =>
      out.append(s"""  "$n": {"exchanges": $ex, "sort_merge": $smj, """ +
        s""""bcast_nlj": $nlj, "cartesian": $cart, "codegen_spans": $wsc, """ +
        s""""single_partition": $single},\n""")
    }
    val summary =
      s"""  "__summary": {"n_queries": ${rows.size}, "failed": ${failed.size}, """ +
        s""""cartesian_offenders": [${cartesianOffenders.map("\"" + _ + "\"").mkString(",")}], """ +
        s""""total_exchanges": ${rows.map(_._2).sum}, """ +
        s""""queries_with_smj": ${rows.count(_._3 > 0)}, """ +
        s""""queries_with_single_partition": ${rows.count(_._7 > 0)}, """ +
        s""""max_exchanges": ${if (rows.isEmpty) 0 else rows.map(_._2).max}}\n}"""
    out.append(summary)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_AUDIT_OUT", "plan_audit.json")
    val w = new java.io.PrintWriter(outPath)
    try w.println(out.toString) finally w.close()
    println(s"[plan-audit] ${rows.size} plans, ${failed.size} failed, " +
      s"cartesian=${cartesianOffenders.size} -> $outPath")
    failed.foreach(f => println(s"[plan-audit] FAILED $f"))
    val top = rows.sortBy(-_._2).take(10)
      .map(r => s"${r._1}=${r._2}").mkString(", ")
    println(s"[plan-audit] top exchange counts: $top")
    spark.stop()
    // Close-gate contract (VERDICT r9 #3): the audit is only evidence if
    // it covers the WHOLE frozen surface — a run from a stale build (or
    // one that predates late-added queries) must fail loudly, not ship a
    // silently-partial artifact.
    val expected = SparkEntry.queries.size
    if (rows.size + failed.size != expected) {
      println(s"[plan-audit] GATE FAIL: audited ${rows.size + failed.size} " +
        s"of $expected queries")
      sys.exit(3)
    }
    if (failed.nonEmpty) sys.exit(1)
    if (cartesianOffenders.nonEmpty) sys.exit(2)
  }
}
