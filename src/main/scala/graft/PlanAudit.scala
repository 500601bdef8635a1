package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{ExplainMode, FilterExec, GlobalLimitExec,
  InputAdapter, LocalLimitExec, ProjectExec, SortExec, SparkPlan,
  WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec,
  AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition

/** Whole-surface physical-plan audit: build every `SparkEntry.queries`
  * plan, execute it, and grep the FINAL adaptive plan for the shapes that
  * decide 100 TB viability — the automated version of the per-operator
  * `.explain` review the build discipline requires.
  *
  * Counted per query:
  *  - `exchanges`      — shuffle count from the static plan (the scale
  *                       currency);
  *  - `sort_merge`     — SortMergeJoins (fine big-big, suspicious when a
  *                       side is dimension-sized);
  *  - `bcast_nlj`      — BroadcastNestedLoopJoins (the interval-join /
  *                       scalar-fanout family: bounded by design);
  *  - `cartesian`      — CartesianProduct: NEVER acceptable; the audit
  *                       exits non-zero if any query plans one;
  *  - `codegen_spans`  — WholeStageCodegen regions in the executed final
  *                       plan (more is better, fewer means interpreted
  *                       seams);
  *  - `single_partition_static` — `Exchange SinglePartition` occurrences
  *                       in the un-executed simple-mode plan (kept for
  *                       round-over-round comparability with r12);
  *  - `single_partition` — SinglePartition shuffles in the EXECUTED final
  *                       adaptive plan, identity-deduplicated — the number
  *                       the detail list and the gate are derived from
  *                       (ADVICE r12: the static count can disagree with
  *                       the executed plan under AQE, and structural
  *                       `.distinct` collapsed identical-subtree twins).
  *
  * Round-13 (VERDICT r12 #1): the single-partition classifier is now a
  * GROWTH check, not a point reading. r12 classified an occurrence
  * `bounded_rows` when its measured rows-in was ≤4096 at one SF — but a
  * corpus-proportional funnel that happens to read ≤4096 at sf0.01 (the
  * `abc_inventory_classes` hazard) would pass while being a
  * single-executor bottleneck at 100×. Now every query is executed at TWO
  * scale factors (default sf0.01 and sf0.1 — a 10× corpus step), each
  * SinglePartition exchange's measured rows-in (`shuffleRecordsWritten`)
  * is recorded at both, occurrences are paired across SFs (by the first
  * significant child operator class, ties resolved by ascending rows),
  * and the CLASS is decided by growth:
  *  - `below_limit`  — child is a limit: bounded by construction;
  *  - `flat`         — rows-in grew ≤ `SPARK_GRAFT_SP_GROWTH` (default
  *                     3.0) across the 10× corpus step: domain-bounded,
  *                     not corpus-proportional;
  *  - `tiny`         — rows-in ≤ `SPARK_GRAFT_SP_TINY` (default 64) at
  *                     the BIG SF: growth ratios on single-digit counts
  *                     are noise (2 error classes → 7 is ratio 3.5 and
  *                     still nothing), and a funnel this small is a
  *                     collapsed domain;
  *  - `allowlisted`  — explicit per-query justification below;
  *  - anything else is `UNREVIEWED_*` and the audit exits 4 — a
  *    corpus-proportional single-partition funnel can no longer ship
  *    because it was measured under an absolute threshold at one SF.
  *
  * Single-dir mode (one argument) is kept for targeted runs (e.g. the
  * TPC-H sf10 carrier check) and falls back to the r12 point
  * classification with its documented caveat.
  *
  * Queries whose BUILDER executes work (streaming lifecycles, adaptive
  * probes) still yield a final batch plan; failures are recorded, never
  * swallowed. Output: one JSON line per query + a summary line, written
  * to SPARK_GRAFT_AUDIT_OUT. `SPARK_GRAFT_AUDIT_ONLY=a,b,c` restricts the
  * surface (the whole-surface coverage gate is skipped in that case).
  */
object PlanAudit {

  /** Explicit, justified exemptions from the growth bound. Keep this
    * SHORT — every entry is a reviewed claim that the funnel's row count
    * is bounded by something the measured-growth check cannot see (and
    * the justification is emitted into the artifact verbatim). */
  val singlePartitionAllow: Map[String, String] = Map.empty

  private case class SfSide(staticExchanges: Int, smj: Int, nlj: Int,
      cartesian: Int, spStatic: Int, codegen: Int,
      singles: Seq[(String, Long, Boolean)]) // (childClass, rowsIn, isLimit)

  def main(args: Array[String]): Unit = {
    val sfSmall = args.headOption.getOrElse("/root/testdata/sf0.01")
    val sfBigOpt = args.lift(1) // growth mode when present
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val rowBound = sys.env.getOrElse("SPARK_GRAFT_SP_ROWBOUND", "4096").toLong
    val growthBound =
      sys.env.getOrElse("SPARK_GRAFT_SP_GROWTH", "3.0").toDouble
    val tinyBound = sys.env.getOrElse("SPARK_GRAFT_SP_TINY", "64").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    /** Expand the executed tree INCLUDING adaptive containers (query
      * stages and the final adaptive plan are not `children`) and
      * subquery plans, so no exchange hides from the walk. */
    def gather(p: SparkPlan): Seq[SparkPlan] = {
      val extra = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => Nil
      }
      p +: (p.children ++ extra ++ p.subqueries).flatMap(gather)
    }

    /** First child operator that decides the funnel's row count — skip
      * the row-preserving / row-reducing wrappers a shuffle input is
      * usually dressed in. */
    @annotation.tailrec
    def significant(p: SparkPlan): SparkPlan = p match {
      case w: WholeStageCodegenExec => significant(w.child)
      case i: InputAdapter => significant(i.child)
      case q: QueryStageExec => significant(q.plan)
      case r: AQEShuffleReadExec => significant(r.child)
      case pr: ProjectExec => significant(pr.child)
      case f: FilterExec => significant(f.child)
      case s: SortExec => significant(s.child)
      case _ => p
    }

    /** Execute one query at one SF and collect the per-side evidence.
      * Cache cleared first: two SFs of 422 queries through one session
      * would otherwise pin every internally-cached frame twice over. */
    def runSide(name: String, dir: String): SfSide = {
      spark.sharedState.cacheManager.clearCache()
      val qe = SparkEntry.queries(name)(spark, dir).queryExecution
      val plan = qe.explainString(ExplainMode.fromString("simple"))
      def c(p: String) = p.r.findAllIn(plan).length
      // Shuffles specifically: a bare "Exchange" pattern also hits
      // BroadcastExchange and ReusedExchange, inflating the metric this
      // audit documents as the scale currency.
      val ex = c(
        "Exchange (hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)")
      val smj = c("SortMergeJoin")
      val nlj = c("BroadcastNestedLoopJoin")
      val cart = c("CartesianProduct")
      val spStatic = c("Exchange SinglePartition")
      // Execute so AQE finalizes and every shuffle's write metrics carry
      // real row counts (toRdd avoids materializing the result on the
      // driver — only the row count crosses).
      qe.toRdd.count()
      val finalNodes = gather(qe.executedPlan)
      val wsc = finalNodes.count {
        case _: WholeStageCodegenExec => true
        case _ => false
      }
      // Identity dedup (ADVICE r12): gather can reach one node through
      // two container paths, but structural `.distinct` ALSO collapses
      // two genuinely distinct exchanges with identical subtrees (e.g.
      // self-join arms before reuse kicks in), undercounting occurrences.
      val seen = java.util.Collections.newSetFromMap(
        new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
      val singles = finalNodes.collect {
        case s: ShuffleExchangeLike
            if s.outputPartitioning == SinglePartition && seen.add(s) => s
      }
      val detail = singles.map { s =>
        val sig = significant(s.children.head)
        val recs = s.metrics.collectFirst {
          case (k, m) if k.equalsIgnoreCase("shuffleRecordsWritten") =>
            m.value
        }.getOrElse(-1L)
        val isLimit = sig match {
          case _: LocalLimitExec | _: GlobalLimitExec => true
          case _ => false
        }
        (sig.nodeName, recs, isLimit)
      }
      SfSide(ex, smj, nlj, cart, spStatic, wsc, detail)
    }

    val out = new StringBuilder("{\n")
    var cartesianOffenders = List.empty[String]
    var failed = List.empty[String]
    var unreviewed = List.empty[String]
    val only = sys.env.get("SPARK_GRAFT_AUDIT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // One detail record per single-partition occurrence, already classed.
    // JSON fields kept flat so the artifact greps cleanly.
    case class Occ(child: String, rowsSmall: Long, rowsBig: Long,
        growth: Double, cls: String) {
      def json: String = {
        val g = if (growth.isNaN) "null"
        else String.format(java.util.Locale.ROOT, "%.2f", Double.box(growth))
        s"""{"child": "$child", "rows_in_small": $rowsSmall, """ +
          s""""rows_in_big": $rowsBig, "growth": $g, "class": "$cls"}"""
      }
    }

    def classify(name: String,
        small: Option[SfSide], big: SfSide): Seq[Occ] = small match {
      case Some(sm) =>
        // Pair occurrences across SFs by significant-child class; within
        // a class, ascending rows-in pairs i-th smallest with i-th
        // smallest (growth of the k-th largest funnel is what matters,
        // and plans are structurally identical across SFs except where
        // AQE collapsed a side — the unpaired branch below).
        val bigByChild = big.singles.groupBy(_._1)
        val smallByChild = sm.singles.groupBy(_._1)
        val childs = (bigByChild.keySet ++ smallByChild.keySet).toSeq.sorted
        childs.flatMap { ch =>
          val bs = bigByChild.getOrElse(ch, Nil).sortBy(_._2)
          val ss = smallByChild.getOrElse(ch, Nil).sortBy(_._2)
          val paired = bs.zip(ss).map { case ((_, rb, limB), (_, rs, _)) =>
            val growth =
              if (rs > 0) rb.toDouble / rs
              else if (rb == 0) 1.0
              else Double.NaN
            val cls =
              if (limB) "below_limit"
              else if (rb >= 0 && rb <= tinyBound) "tiny"
              else if (!growth.isNaN && growth <= growthBound) "flat"
              else if (singlePartitionAllow.contains(name)) "allowlisted"
              else if (growth.isNaN) "UNREVIEWED_unmeasured"
              else "UNREVIEWED_growth"
            Occ(ch, rs, rb, growth, cls)
          }
          // AQE can finalize different shapes at the two SFs (empty
          // relation propagation, stage coalescing): an occurrence with
          // no cross-SF twin still gets the absolute checks, but growth
          // is unprovable — UNREVIEWED unless bounded by construction.
          val extraBig = bs.drop(ss.size).map { case (_, rb, limB) =>
            val cls =
              if (limB) "below_limit"
              else if (rb >= 0 && rb <= tinyBound) "tiny"
              else if (singlePartitionAllow.contains(name)) "allowlisted"
              else "UNREVIEWED_unpaired"
            Occ(ch, -1L, rb, Double.NaN, cls)
          }
          val extraSmall = ss.drop(bs.size).map { case (_, rs, _) =>
            // Present at the small SF only: it VANISHED at scale (AQE
            // empty-side or reuse) — not a big-SF funnel; record for
            // completeness, never a gate failure.
            Occ(ch, rs, -1L, Double.NaN, "small_sf_only")
          }
          paired ++ extraBig ++ extraSmall
        }
      case None => // single-dir fallback: the r12 point classification
        big.singles.map { case (ch, rb, limB) =>
          val cls =
            if (limB) "below_limit"
            else if (rb >= 0 && rb <= rowBound) "bounded_rows"
            else if (singlePartitionAllow.contains(name)) "allowlisted"
            else "UNREVIEWED"
          Occ(ch, -1L, rb, Double.NaN, cls)
        }
    }

    val rows = names.flatMap { name =>
      try {
        val smallSide = sfBigOpt.map(_ => runSide(name, sfSmall))
        val bigSide = runSide(name, sfBigOpt.getOrElse(sfSmall))
        if (bigSide.cartesian > 0) cartesianOffenders ::= name
        val occs = classify(name, smallSide, bigSide)
        occs.filter(_.cls.startsWith("UNREVIEWED")).foreach { o =>
          unreviewed ::= s"$name: ${o.child} rows=${o.rowsSmall}->" +
            s"${o.rowsBig} growth=${o.growth} ${o.cls}"
        }
        Some((name, bigSide, occs))
      } catch {
        case e: Throwable =>
          failed ::= s"$name: ${Option(e.getMessage).getOrElse(e.toString).take(120)}"
          None
      }
    }
    rows.foreach { case (n, b, occs) =>
      val det = occs.map(_.json).mkString("[", ",", "]")
      out.append(s"""  "$n": {"exchanges": ${b.staticExchanges}, """ +
        s""""sort_merge": ${b.smj}, "bcast_nlj": ${b.nlj}, """ +
        s""""cartesian": ${b.cartesian}, "codegen_spans": ${b.codegen}, """ +
        s""""single_partition_static": ${b.spStatic}, """ +
        s""""single_partition": ${occs.count(_.rowsBig >= 0)}, """ +
        s""""single_partition_detail": $det},\n""")
    }
    val allowJson = singlePartitionAllow.map { case (k, v) =>
      s""""$k": "$v""""
    }.mkString("{", ",", "}")
    val nOcc = rows.map(_._3.count(_.rowsBig >= 0)).sum
    val summary =
      s"""  "__summary": {"n_queries": ${rows.size}, "failed": ${failed.size}, """ +
        s""""mode": "${if (sfBigOpt.isDefined) "growth" else "point"}", """ +
        s""""sf_small": "$sfSmall", "sf_big": "${sfBigOpt.getOrElse(sfSmall)}", """ +
        s""""cartesian_offenders": [${cartesianOffenders.map("\"" + _ + "\"").mkString(",")}], """ +
        s""""total_exchanges": ${rows.map(_._2.staticExchanges).sum}, """ +
        s""""queries_with_smj": ${rows.count(_._2.smj > 0)}, """ +
        s""""queries_with_single_partition": ${rows.count(_._3.exists(_.rowsBig >= 0))}, """ +
        s""""single_partition_occurrences": $nOcc, """ +
        s""""single_partition_reviewed": ${unreviewed.isEmpty}, """ +
        s""""single_partition_growth_bound": $growthBound, """ +
        s""""single_partition_tiny_bound": $tinyBound, """ +
        s""""single_partition_point_rowbound": $rowBound, """ +
        s""""single_partition_unreviewed": [${unreviewed.map("\"" + _ + "\"").mkString(",")}], """ +
        s""""single_partition_allowlist": $allowJson, """ +
        s""""max_exchanges": ${if (rows.isEmpty) 0 else rows.map(_._2.staticExchanges).max}}\n}"""
    out.append(summary)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_AUDIT_OUT", "plan_audit.json")
    val w = new java.io.PrintWriter(outPath)
    try w.println(out.toString) finally w.close()
    println(s"[plan-audit] ${rows.size} plans, ${failed.size} failed, " +
      s"cartesian=${cartesianOffenders.size}, " +
      s"single-partition occurrences=$nOcc, " +
      s"unreviewed=${unreviewed.size} -> $outPath")
    failed.foreach(f => println(s"[plan-audit] FAILED $f"))
    unreviewed.foreach(u => println(s"[plan-audit] UNREVIEWED single-partition $u"))
    val top = rows.sortBy(-_._2.staticExchanges).take(10)
      .map(r => s"${r._1}=${r._2.staticExchanges}").mkString(", ")
    println(s"[plan-audit] top exchange counts: $top")
    spark.stop()
    // Close-gate contract (VERDICT r9 #3): the audit is only evidence if
    // it covers the WHOLE frozen surface — a run from a stale build (or
    // one that predates late-added queries) must fail loudly, not ship a
    // silently-partial artifact. (Skipped under AUDIT_ONLY: a targeted
    // run is not the close-gate artifact.)
    val expected = SparkEntry.queries.size
    if (only.isEmpty && rows.size + failed.size != expected) {
      println(s"[plan-audit] GATE FAIL: audited ${rows.size + failed.size} " +
        s"of $expected queries")
      sys.exit(3)
    }
    if (failed.nonEmpty) sys.exit(1)
    if (cartesianOffenders.nonEmpty) sys.exit(2)
    if (unreviewed.nonEmpty) sys.exit(4)
  }
}
