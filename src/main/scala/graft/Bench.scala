package graft
import org.apache.spark.sql.SparkSession

/** Driver-facing benchmark: times every `SparkEntry.queries` entry at the
  * scale factor in `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Stability design (round-3): queries run in FIXED (sorted) order, and the
  * whole suite runs twice — the first pass absorbs the one-time costs that
  * made sub-2 s entries flap between rounds (JIT warm-up, whole-stage
  * codegen compilation, parquet footer caches, shuffle-service spin-up);
  * the reported figure is the per-query minimum across passes. The cache
  * manager is cleared before every run, so a pass never reads a previous
  * pass's cached frames — Spark's CacheManager matches by logical plan and
  * would otherwise silently serve query N's `.cache()`d intermediates back
  * to its second run, timing a lookup instead of the computation.
  *
  * Noise design (round-8): min-of-2 is not enough on a loaded machine — a
  * co-tenant burst spanning both passes contaminated round 7's heavy-dedup
  * numbers by 2.6× (quiet re-run confirmed no regression). Two additions:
  *  - queries whose spread exceeds 30% get up to two EXTRA targeted runs,
  *    so a burst must span four separated windows to survive into the
  *    reported min;
  *  - the JSON carries a per-query `"spread"` map, so a grader can tell
  *    "regressed" (stable samples, higher floor) from "noisy" (wide
  *    samples) without re-running the suite.
  * Spread is (2nd best − best)/best over successful samples — "was the
  * reported min reproduced by an independent run?" — NOT max-vs-min: the
  * cold first pass pays per-query codegen/JIT and is routinely 2× the warm
  * pass, so a max-based spread would flag half the suite as noisy every
  * run (observed) and bury real contamination in cold-start artifacts. A
  * cold outlier still triggers one confirming warm pass via the same
  * metric (with one warm sample the two best ARE cold+warm); once two warm
  * samples agree the reported spread collapses to genuine run-to-run
  * jitter.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt)
    def newSession(): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      // Warm the session (scheduler, codegen compiler, parquet footer
      // reads) so the first measured query isn't charged ~3s of one-time
      // setup.
      s.range(1000).selectExpr("sum(id)").collect()
      s
    }
    var spark = newSession()
    // Optional comma-separated subset for local iteration (e.g. diagnosing
    // a single query's regression without paying the full-suite wall time).
    // The driver never sets this, so driver runs always time the full map.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // Locale-independent formatting: f"" interpolators use the JVM default
    // locale, which under a comma-decimal locale would print "1,234" and
    // corrupt the JSON.
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // a failed run records -1, and the min below only folds SUCCESSFUL
    // times — a query that succeeds slowly in one pass and fails fast in
    // another must report the real measurement, not the time-to-failure;
    // -1 survives only if every pass failed (visible in the JSON).
    def timeOne(name: String): Double = {
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    // ---- Pre-flight (VERDICT r14 #5) -----------------------------------
    // Two rounds lost measurement fidelity to conditions detectable at RUN
    // time: r13 shipped numbers contaminated by a stale DuckDB oracle
    // burning ~3 cores for hours, and r14's absolutes moved +36% on an
    // undetected box shift — both were caught at DIFF time, after the
    // round's wall-clock was spent. Detect both up front:
    //  (a) competing-process scan: any live process whose command line
    //      names graft / sbt / duckdb and that is NOT this JVM's ancestor
    //      or descendant is sharing the box with the measurement;
    //  (b) 5-query canary: stable sub-1.5s production queries re-measured
    //      min-of-2 and compared to the committed reference reading
    //      (tools/canary_ref.json, same sfDir+cpus) — a >10% median
    //      departure on code-stable queries is the box moving, not the
    //      code.
    // Findings are stamped into bench_full (the grader's artifact) and
    // printed as a "metric":"preflight" line. SPARK_GRAFT_PREFLIGHT=
    // strict refuses (exit 7) — for interactive/controlled runs; the
    // default only flags, because the driver's own bench run must record
    // SOMETHING even on a busy box (a flagged artifact beats none).
    // SPARK_GRAFT_PREFLIGHT=off skips entirely (scale harnesses time
    // subsets on scratch corpora where the ref is meaningless).
    val preflightMode = sys.env.getOrElse("SPARK_GRAFT_PREFLIGHT", "flag")
    def jstr(s: String) = "\"" + s.replaceAll("[\"\\\\]", " ") + "\""
    val competing: Seq[String] =
      if (preflightMode == "off") Nil
      else {
        import scala.jdk.CollectionConverters._
        import scala.jdk.OptionConverters._
        val self = ProcessHandle.current()
        val kin = scala.collection.mutable.Set(self.pid)
        var p = self.parent()
        while (p.isPresent) { kin += p.get.pid; p = p.get.parent() }
        self.descendants().iterator().asScala.foreach(kin += _.pid)
        // Match actual compute competitors only: the DuckDB oracle
        // (python, `duckdb` / tools/compare_oracle.py in argv), another
        // sbt/scala build JVM, or another graft main (`graft.Bench` etc.).
        // A bare `graft` would false-positive on this session's own
        // harness processes (log tees under ~/.graft, prompt files named
        // graft_*), which are siblings, not ancestors — the trailing dot
        // keeps the match to fully-qualified graft.* class names.
        val rx = "(?i)(duckdb|compare_oracle|sbt-launch|xsbt|graft\\.)".r
        ProcessHandle.allProcesses().iterator().asScala
          .filterNot(h => kin.contains(h.pid))
          .flatMap(h => h.info().commandLine().toScala.map(h.pid -> _))
          .filter { case (_, cmd) => rx.findFirstIn(cmd).isDefined }
          .map { case (pid, cmd) => s"pid $pid: ${cmd.take(120)}" }
          .toList
      }
    // Canary only on full-suite runs (BENCH_ONLY subsets are iteration /
    // scale-harness runs on arbitrary corpora) unless explicitly forced.
    val canaryNames = Seq("dedup_exact_survivors", "interarrival_stats",
      "krippendorff_alpha_components", "tpch_q17_small_qty", "twap_daily")
    val canaryWanted = preflightMode != "off" &&
      (only.isEmpty || sys.env.contains("SPARK_GRAFT_CANARY")) &&
      canaryNames.forall(SparkEntry.queries.contains)
    val canaryRefPath = sys.env.getOrElse("SPARK_GRAFT_CANARY_REF",
      "tools/canary_ref.json")
    var canaryJson = "null"
    var canaryDeparture = 0.0
    if (canaryWanted) {
      // min-of-3 CONSECUTIVE runs: single canary readings proved
      // page-cache-sensitive (dedup_exact_survivors read 1.18s with
      // documents.parquet evicted by a just-written 60M-row corpus vs
      // 0.68s warm). Three back-to-back attempts share one cache state,
      // so the min picks the warmest of three readings under the SAME
      // conditions — it does not bracket a box shift; that is what the
      // cooldown retry below is for.
      def measureCanary(): Seq[(String, Double)] = canaryNames.map { n =>
        val ok = Seq(timeOne(n), timeOne(n), timeOne(n)).filter(_ >= 0)
        n -> (if (ok.isEmpty) -1.0 else ok.min)
      }.filter(_._2 >= 0)
      val meas = measureCanary()
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val refFile = new java.io.File(canaryRefPath)
      if (sys.env.contains("SPARK_GRAFT_CANARY_RECORD")) {
        val commit = try {
          val pr = new ProcessBuilder("git", "rev-parse", "--short", "HEAD")
            .start()
          val out = new String(pr.getInputStream.readAllBytes()).trim
          pr.waitFor(); out
        } catch { case _: Throwable => "unknown" }
        val qjson = meas.map { case (n, v) => jstr(n) + ":" + sec(v) }
          .mkString("{", ",", "}")
        val w = new java.io.PrintWriter(canaryRefPath)
        try w.println(s"""{"sf":${jstr(sfDir)},"cpus":$cpus,"commit":${jstr(commit)},"queries":$qjson}""")
        finally w.close()
        canaryJson = s"""{"recorded":true,"queries":${
          meas.map { case (n, v) => jstr(n) + ":" + sec(v) }
            .mkString("{", ",", "}")}}"""
      } else if (!refFile.exists()) {
        canaryJson = s"""{"skipped":"no reference at $canaryRefPath"}"""
      } else {
        val ref = om.readTree(refFile)
        if (ref.get("sf").asText() != sfDir ||
            ref.get("cpus").asInt() != cpus.toInt) {
          canaryJson = s"""{"skipped":"reference is for ${
            ref.get("sf").asText()}@${ref.get("cpus").asInt()} cores, run is $sfDir@$cpus"}"""
        } else {
          def compare(m: Seq[(String, Double)]): (String, Double) = {
            val ratios = m.flatMap { case (n, v) =>
              Option(ref.get("queries").get(n))
                .map(r => n -> (v / r.asDouble())).filter(_._2 > 0)
            }
            if (ratios.isEmpty)
              ("""{"skipped":"no successful canary readings"}""", 0.0)
            else {
              val med = ratios.map(_._2).sorted.apply(ratios.size / 2)
              (s"""{"median_ratio":${sec(med)},"ref_commit":${
                jstr(ref.get("commit").asText())},"queries":${
                ratios.map { case (n, r) => jstr(n) + ":" + sec(r) }
                  .mkString("{", ",", "}")}}""", math.abs(med - 1.0))
            }
          }
          val (j1, d1) = compare(meas)
          // Hot-box auto-retry (VERDICT r15 #2): r15's driver close run
          // stamped a 1.347 canary and shipped the hot numbers anyway —
          // flag mode detected the condition but did nothing with it.
          // When the first attempt departs >15%, sleep a cooldown and
          // re-measure once: a transient co-tenant burst clears and the
          // second attempt governs; a genuinely shifted box reads hot
          // twice and the artifact shows BOTH attempts, so a grader can
          // tell "recovered" from "hot throughout" without re-running.
          if (d1 > 0.15 && preflightMode != "off") {
            System.err.println(f"[bench-preflight] canary departure ${
              d1 * 100}%.1f%% on attempt 1 — cooling down 90s and retrying")
            Thread.sleep(90000)
            val (j2, d2) = compare(measureCanary())
            canaryDeparture = d2
            canaryJson = s"""{"attempts":[$j1,$j2],"governing":"attempt2"}"""
          } else {
            canaryDeparture = d1
            canaryJson = j1
          }
        }
      }
    }
    if (preflightMode != "off") {
      val compJson = competing.map(jstr).mkString("[", ",", "]")
      println(s"""{"metric":"preflight","competing":$compJson,"canary":$canaryJson}""")
      // 0.15, not 0.10: the median-of-5 still carries ±10% of page-cache
      // and codegen jitter on a QUIET box (observed same-day medians
      // 0.85–1.07 across clean runs); 15% is outside that envelope.
      val bad = competing.nonEmpty || canaryDeparture > 0.15
      if (bad) System.err.println(
        s"[bench-preflight] WARNING: ${competing.size} competing process(es); " +
        f"canary departure ${canaryDeparture * 100}%.1f%% — numbers may not be comparable round-over-round")
      if (bad && preflightMode == "strict") {
        System.err.println("[bench-preflight] strict mode: refusing to bench")
        spark.stop()
        sys.exit(7)
      }
    }
    // `mode` distinguishes "scan ran and found nothing" from "checks were
    // skipped" — with PREFLIGHT=off the empty competing list would
    // otherwise read as a clean scan that never happened (ADVICE r15).
    val preflightJson =
      s"""{"mode":${jstr(preflightMode)},"competing":${
        competing.map(jstr).mkString("[", ",", "]")},"canary":$canaryJson}"""
    // --------------------------------------------------------------------
    val samples = scala.collection.mutable.Map(
      names.map(_ -> List.empty[Double]): _*)
    for (_ <- 1 to passes; name <- names)
      samples(name) ::= timeOne(name)
    // Adaptive passes: a query whose successful samples disagree by >30%
    // was contaminated in at least one window. Re-time JUST those queries
    // (cheap — the noisy set is small on a quiet machine, and re-running
    // the stable majority would add wall time without information). Two
    // rounds max: if the machine is so loaded that four separated windows
    // all collide, more retries only delay the inevitable and the spread
    // field already tells the grader not to trust the number.
    def spreadOf(xs: List[Double]): Double = {
      val ok = xs.filter(_ >= 0).sorted
      if (ok.size < 2 || ok.head <= 0) 0.0 else (ok(1) - ok.head) / ok.head
    }
    val spreadThreshold = 0.30
    for (_ <- 1 to 2) {
      val noisy = names.filter(n => spreadOf(samples(n)) > spreadThreshold)
      noisy.foreach(n => samples(n) ::= timeOne(n))
    }
    // Convergence retries (r16): min-of-N only estimates the steady-state
    // floor if the floor was actually REACHED. The r15 "regressions" on
    // attribution_linear_multitouch / audience_overlap_matrix (0.46→0.72
    // and 0.66→1.00 in-suite, fresh-session remeasure-"confirmed")
    // dissolved under a 10-pass probe: their samples descend 0.79→0.40
    // over ~9 warm runs — a long JIT warm-up tail, so the reported min
    // was a function of how many samples the spread-retry dice granted
    // that round (r14: 4 samples → 0.461; r15: 2 → 0.719;
    // bench_mover_probe_r16.json). Rule: a reported min must be
    // CONFIRMED — keep re-timing a query until `stopAfter` consecutive
    // runs fail to improve its best by >3% (the descent is noisy, so a
    // single non-improver is a weak stop signal), capped at `maxSamples`
    // so a floor that drifts with cache state can't spin. Full-suite
    // runs use stopAfter=1 (one confirming run — bounded cost over 426
    // queries); BENCH_ONLY subset runs are the attribution-remeasure /
    // iteration path where the whole point is the true floor, so they
    // dig deeper (stopAfter=2, cap 10) — a fixed fresh-JVM min-of-2
    // there would "confirm" any slow in-suite reading by construction.
    val (maxSamples, stopAfter) = if (only.nonEmpty) (10, 2) else (8, 1)
    def failStreak(xs: List[Double]): Int = {
      var mn = Double.MaxValue; var streak = 0
      for (v <- xs.reverse.filter(_ >= 0)) { // chronological
        if (v < mn * 0.97) streak = 0 else streak += 1
        mn = math.min(mn, v)
      }
      streak
    }
    def unconverged(n: String): Boolean = {
      val ok = samples(n).count(_ >= 0)
      ok > 0 && ok < maxSamples && failStreak(samples(n)) < stopAfter
    }
    var conv = names.filter(unconverged)
    while (conv.nonEmpty) {
      conv.foreach(n => samples(n) ::= timeOne(n))
      conv = conv.filter(unconverged)
    }
    val best = names.map { n =>
      val ok = samples(n).filter(_ >= 0)
      n -> (if (ok.isEmpty) -1.0 else ok.min)
    }.toMap
    val spread = names.map(n => n -> spreadOf(samples(n))).toMap
    // Solo column (VERDICT r11 #1): in-suite numbers on the heavy tail
    // disagreed with solo measurement by up to ~4× (krippendorff 2.92 s
    // in-suite vs 1.41 s solo on byte-identical code) — block-manager and
    // codegen-cache pressure from 420 neighbors, not the query's own
    // cost. Every query whose in-suite best exceeds the threshold is
    // re-measured in a FRESH SparkSession (stop + rebuild: new block
    // manager, empty caches; JIT stays warm, which is what "solo
    // steady-state" means — same protocol as the r11 graft.Profile
    // re-measures). Run 1 in the fresh session pays staging + codegen;
    // subsequent runs descend the JIT warm-up curve, which for some
    // queries is LONG (~9 runs to floor — the r15 mover artifact, see
    // the convergence comment above), so a fixed min-of-2 here would
    // "confirm" any in-suite slow reading by construction. Same
    // convergence rule as in-suite: keep timing while the latest run is
    // still the best by >3%, cap 6 runs. Round-over-round grading reads
    // the solo column where present; `best` keeps meaning "in-suite".
    val soloThreshold =
      sys.env.getOrElse("SPARK_GRAFT_SOLO_THRESHOLD", "1.5").toDouble
    val soloNames = names.filter(n => best(n) > soloThreshold)
    val solo = soloNames.map { n =>
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      spark = newSession()
      var xs = List.empty[Double] // most-recent-first, like `samples`
      xs ::= timeOne(n)
      xs ::= timeOne(n)
      while (xs.count(_ >= 0) < 8 && failStreak(xs) < 2)
        xs ::= timeOne(n)
      val ok = xs.filter(_ >= 0)
      n -> (if (ok.isEmpty) -1.0 else ok.min)
    }.toMap
    val qs = names.map(k => s"\"" + k + "\":" + sec(best(k)))
      .mkString("{", ",", "}")
    val total = best.values.filter(_ >= 0).sum
    // Failures must be visible in BOTH lines: a query with best < 0 failed
    // every pass — it is excluded from `total` and would otherwise vanish
    // from the compact top-10, making a broken run read as a faster one.
    val failed = names.filter(best(_) < 0)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Spread is only interesting where it exceeds the retry threshold —
    // emitting 81 near-zero entries would double the line for no signal.
    val noisyJson = names.filter(n => spread(n) > spreadThreshold)
      .map(k => s"\"" + k + "\":" + sec(spread(k))).mkString("{", ",", "}")
    // Full-fidelity artifact (VERDICT r8 #5): the driver keeps only a
    // bounded stdout tail, so round-over-round per-query comparison from
    // logs alone recovered just 53/363 entries. Persist the COMPLETE
    // record — every query's best time, every raw sample (so spread can be
    // recomputed under any definition), pass count — to a file the next
    // round can diff without log archaeology. Path override via env so the
    // scale harness can keep its runs out of the committed artifact.
    val fullOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    // Tier tag (VERDICT r9 #8): referee/diagnostic queries exist to
    // measure OTHER operators (exact-degenerate twins, recall curves,
    // cross-family agreement matrices) — they deliberately run the
    // expensive exact form and are cache-pressure-sensitive in-suite, so
    // round-over-round comparisons should weight production paths.
    // Tagging in the artifact lets a grader split the two without
    // guessing from names.
    def tierOf(n: String): String =
      if (n.endsWith("_exact") || Set("minhash_band_recall_curve",
        "neardup_method_agreement", "agm_triangle_blowup",
        "split_contamination_matrix", "source_similarity_tvd_matrix",
        // embed_neardup_lsh runs an exact all-pairs referee INSIDE the
        // query (the oracle checks the LSH arm against it), so its cost
        // is O(n²) by construction — 35.8× at 10× data (SCALE_r10) is
        // the referee, not the LSH path. The production-scale LSH arm is
        // measured alone via Similarity.cosineNearDupPairs consumers;
        // this query is the recall-audit twin (VERDICT r10 #3).
        "embed_neardup_lsh",
        // pq_neardup_eval computes its ground truth by an exact
        // all-pairs cosine join (the point of the query IS measuring PQ
        // candidate precision/recall against exact truth), so its cost
        // is O(n²) by construction — same grounds as embed_neardup_lsh.
        // The production PQ path is the linear embed_pq_assign.
        "pq_neardup_eval")(n))
        "diagnostic"
      else "production"
    // Grading total: solo where measured (and successful — a failed solo
    // falls back to the in-suite best rather than zeroing the entry),
    // in-suite best elsewhere — the suite-context-proof number rounds
    // should be compared on.
    val totalSolo = names.map { n =>
      val b = solo.get(n).filter(_ >= 0).getOrElse(best(n))
      if (b >= 0) b else 0.0
    }.sum
    val fullJson = {
      val entries = names.map { n =>
        val raw = samples(n).reverse.map(sec).mkString("[", ",", "]")
        val soloField =
          solo.get(n).map(v => s""""solo": ${sec(v)}, """).getOrElse("")
        s"""  "$n": {"best": ${sec(best(n))}, $soloField"spread": ${sec(spread(n))}, "tier": "${tierOf(n)}", "samples": $raw}"""
      }.mkString(",\n")
      s"""{"sf":"$sfDir","passes":$passes,"total_sec":${sec(total)},"total_solo_adjusted":${sec(totalSolo)},"solo_threshold":${sec(soloThreshold)},"failed":$failedJson,"preflight":$preflightJson,"queries":{\n$entries\n}}"""
    }
    try {
      val w = new java.io.PrintWriter(fullOut)
      try w.println(fullJson) finally w.close()
    } catch { case _: Throwable => () } // bench output must never die on I/O
    // Full per-query line first (for humans and full-capture harnesses)…
    println(s"""{"metric":"total","value":${sec(total)},"unit":"sec","total_solo_adjusted":${sec(totalSolo)},"queries":$qs,"spread":$noisyJson,"failed":$failedJson,"sf":"$sfDir","passes":$passes}""")
    // …then a compact summary LAST. The driver keeps only a bounded tail of
    // stdout; the full line above outgrows it as the query count rises, so
    // the final line must be a self-contained JSON record that always fits:
    // headline metric plus the slowest queries (the ones a grader compares).
    // "truncated":true marks it as the partial-queries record so a consumer
    // matching on "metric":"total" can't mistake the top-10 map for the
    // full set or double-count the two lines.
    val slowest = names.filter(best(_) >= 0).sortBy(n => -best(n)).take(10)
      .map(k => s"\"" + k + "\":" + sec(best(k))).mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${sec(total)},"unit":"sec","total_solo_adjusted":${sec(totalSolo)},"queries":$slowest,"truncated":true,"nqueries":${names.size},"spread":$noisyJson,"failed":$failedJson,"sf":"$sfDir","passes":$passes}""")
    spark.stop()
  }
}
