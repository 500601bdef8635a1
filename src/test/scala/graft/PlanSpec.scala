package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape guarantees: the properties that make these operators viable
  * at 100 TB, asserted against the actual physical plans so a regression
  * (lost pushdown, accidental cross join, missing broadcast) fails CI.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("watermark predicate is pushed down to the parquet scan") {
    val plan = planOf(SparkEntry.queries("watermark_incremental")(spark, sf0001))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate"),
      s"missing pushdown:\n$plan")
  }

  test("column pruning reaches the scan (2-column projection reads 2 columns)") {
    val df = Tables.lineitem(spark, sf0001).select(col("l_orderkey"), col("l_quantity"))
    val plan = planOf(df)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"over-read:\n$plan")
  }

  test("interval join plans as BroadcastNestedLoopJoin, equi joins as broadcast hash joins") {
    val ij = planOf(SparkEntry.queries("interval_join_backadjust")(spark, sf0001))
    assert(ij.contains("BroadcastNestedLoopJoin"), s"no broadcast NLJ:\n$ij")
    val ej = planOf(SparkEntry.queries("equi_join_stars")(spark, sf0001))
    assert(ej.contains("BroadcastHashJoin"), s"no broadcast hash join:\n$ej")
    assert(!ej.contains("CartesianProduct"))
  }

  test("AQE splits a skewed sort-merge join partition (OptimizeSkewedJoin)") {
    // The AUTOMATIC twin of skew_salted_join's manual remedy: with one
    // key carrying ~all rows and broadcast disabled, AQE must mark the
    // skewed partition (skew=true / skew join markers in the final
    // adaptive plan) and split it by the advisory size. Aggressive
    // thresholds keep the fixture small; confs restored after.
    import spark.implicits._
    val prev = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = spark.range(60000)
        .select(when($"id" % 100 =!= 0, lit(7L)).otherwise($"id").as("k"),
          $"id".as("v"))
      val right = spark.range(3000)
        .select(($"id" % 50).as("k"), $"id".as("w"))
      // global aggregate downstream: a same-key groupBy would REQUIRE the
      // join's hash partitioning and veto the skew split (measured — AQE
      // only coalesced); a partition-agnostic consumer lets it fire
      val joined = left.join(right, "k").agg(sum($"v").as("s"))
      joined.collect() // AQE finalizes only on execution
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("OptimizeSkewedJoin")
        || plan.contains("isSkew=true"),
        s"no skew-join optimization in final plan:\n${plan.take(4000)}")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("dpp_runtime_prune: fact scan carries a dynamicpruning partition filter") {
    val df = SparkEntry.queries("dpp_runtime_prune")(spark, sf0001)
    val plan = planOf(df)
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic partition pruning in the fact scan:\n$plan")
  }

  test("fused 5m pipeline: the 5-min aggregate is planned once, one broadcast NLJ") {
    // simple mode prints the operator tree once (formatted repeats each
    // node in the detail section, which would double every count)
    val plan = SparkEntry.queries("continuous_5m_pipeline")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // one interval join, broadcast — the dim never shuffles the fact side
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length == 1,
      s"expected exactly one broadcast NLJ:\n$plan")
    // single-pass session labeling: the events scan feeds ONE resample
    // chain (2 agg stages × partial+final = 4 HashAggregates + the dim's
    // 2) — the old filter×2+union shape would double the fact-side aggs
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 2, s"expected 2 scans (events + orders dim), got $scans:\n$plan")
    assert("HashAggregate".r.findAllIn(plan).length == 6,
      s"5-min aggregate duplicated under a union:\n$plan")
    assert(!plan.contains("Union"), s"union double-compute shape:\n$plan")
    // the session filter is pushed below both aggregates to the scan stage
    // (filter on a grouping key): off-session ticks never enter a shuffle
    assert(plan.indexOf("Filter") > plan.indexOf("HashAggregate"),
      s"session filter not pushed below the aggregates:\n$plan")
  }

  test("resample is a single partial+final hash aggregation (map-side combine)") {
    val plan = planOf(SparkEntry.queries("resample_5m_ohlcv")(spark, sf0001))
    assert(plan.contains("partial_min_by"), s"no partial agg:\n$plan")
    // the aggregation shuffles once on (keys, bucket); window() lowers to
    // arithmetic bucketing, no explode
    assert(plan.contains("hashpartitioning"), s"unexpected exchange shape:\n$plan")
    assert(!plan.contains("Generate"), s"window exploded:\n$plan")
  }

  test("resample keeps whole-stage codegen (no interpreted hot path)") {
    val df = graft.ops.Resample.ohlcvBars(
      Tables.events(spark, sf0001).select(col("ts"), col("value").as("open"),
        col("value").as("high"), col("value").as("low"), col("value").as("close"),
        lit(1L).as("volume")), "5 minutes")
    // AQE finalizes codegen only at execution time — run THIS plan
    // (count() would build a different one), then inspect
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // codegen stages print as "*(n) Operator" in the finalized plan
    assert(plan.contains("*("), s"no codegen:\n$plan")
  }

  test("session filters stay as scan-level filters, no shuffle") {
    val plan = planOf(Tables.events(spark, sf0001)
      .filter(graft.time.SessionCalendar.isDay(col("ts"))))
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("equi_join_stars: three broadcast dim arms + one shuffled-hash fact join") {
    // The r6 bench regression (+42%, body unchanged) was the fact-fact arm
    // flapping between AQE broadcast and sort-merge; the SHUFFLE_HASH hint
    // pins it. Shape: customer/nation/region broadcast, lineitem⋈orders a
    // ShuffledHashJoin (no sort), never a cartesian product.
    // simple mode prints each operator once (formatted repeats nodes in
    // the detail section, doubling every count)
    val plan = SparkEntry.queries("equi_join_stars")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert("BroadcastHashJoin".r.findAllIn(plan).size == 3,
      s"expected exactly 3 broadcast dim arms:\n$plan")
    assert(plan.contains("ShuffledHashJoin"),
      s"fact join not a shuffled hash join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact join sort-merged:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }

  test("bucketed_join_zero_shuffle driver query: only exchange is the final order-by") {
    // The write-time shuffle is the whole point: after it, the fact-fact
    // join AND the per-order aggregate must run on the scan's bucket
    // partitioning. Executed (AQE-final) plan, driver-query path.
    val df = SparkEntry.queries("bucketed_join_zero_shuffle")(spark, sf0001)
    df.collect()
    // keep only the AQE final-plan section (the trailing "== Initial
    // Plan ==" dump would double-count every node)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1, s"extra exchange:\n$plan")
    assert(plan.contains("rangepartitioning"),
      s"the single exchange should be the order-by range exchange:\n$plan")
  }

  test("Q5 star: all four dimension arms broadcast, no cartesian product") {
    val plan = planOf(SparkEntry.queries("tpch_q5_region_revenue")(spark, sf0001))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4,
      s"dimension arm not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }

  test("CUBE is one shuffle: grouping-set Expand sits below the partial aggregate") {
    val plan = planOf(SparkEntry.queries("cube_orders")(spark, sf0001))
    assert(plan.contains("Expand"), s"no grouping-set expansion:\n$plan")
    assert(plan.contains("partial_count"), s"no partial agg:\n$plan")
    // exactly one hash exchange for the aggregation (plus the final sort's
    // range exchange) — the expansion must not add its own shuffle
    assert("hashpartitioning".r.findAllIn(plan).size <= 2,
      s"extra exchange:\n$plan")
  }

  test("IVF cell assignment is shuffle-free: in-row argmax over literal centroids") {
    val emb = Tables.embeddings(spark, sf0001)
    val cents = graft.ops.Ivf.trainCentroids(emb, k = 8, iters = 1)
    val plan = planOf(graft.ops.Ivf.assignCells(emb, "embedding", cents, n = 1))
    assert(!plan.contains("Exchange"), s"cell assignment shuffles:\n$plan")
    assert(!plan.contains("Window"), s"cell assignment windows:\n$plan")
  }

  test("sampling and splits are shuffle-free scan-level expressions") {
    val docs = Tables.documents(spark, sf0001)
    val sampled = planOf(graft.ops.Sampling.stratifiedSample(
      docs, "doc_id", "lang", Map("en" -> 0.5), defaultFraction = 0.1))
    assert(!sampled.contains("Exchange"), s"stratified sample shuffles:\n$sampled")
    val split = planOf(graft.ops.Sampling.splitByHash(
      docs, "doc_id", Seq("train" -> 0.8, "val" -> 0.2)))
    assert(!split.contains("Exchange"), s"split shuffles:\n$split")
    assert(!split.contains("Window"), s"split windows:\n$split")
  }

  test("decontamination and edit-distance blocking plan without cartesian products") {
    val docs = Tables.documents(spark, sf0001)
    val dec = planOf(graft.ops.Dedup.decontaminate(
      docs.filter(col("source") =!= "src0"),
      docs.filter(col("source") === "src0"), "text", "doc_id", n = 5))
    assert(!dec.contains("CartesianProduct"), s"decontaminate cartesian:\n$dec")
    // the gram join key is the 64-bit hash — document text must never be
    // part of the shuffled gram relation
    assert(dec.contains("xxhash64"), s"no hashed grams:\n$dec")
    val ed = planOf(graft.ops.Dedup.editDistancePairs(docs, "text", "doc_id"))
    assert(!ed.contains("CartesianProduct"), s"editdist cartesian:\n$ed")
  }

  test("top-k rank windows run partial per-partition top-k before the shuffle") {
    // Spark's InsertWindowGroupLimit rewrites row_number()<=k into a
    // partial top-k below the exchange: the shuffle carries at most
    // k rows per (query, input partition) instead of every scored
    // candidate — the property VERDICT r3 asked for in the ANN paths.
    // Pin it so a window-spec change (e.g. a non-rank function or a
    // filter moved off the rank column) can't silently reintroduce the
    // full-candidate shuffle.
    for (q <- Seq("embed_topk_bruteforce", "embed_topk_lsh", "embed_topk_ivf")) {
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      // "Partial" must be pinned to the WindowGroupLimit operator line
      // itself — as an independent substring it would match any partial
      // aggregate elsewhere in the plan and a Final-only group limit
      // would pass vacuously.
      assert("WindowGroupLimit.*Partial".r.findFirstIn(plan).isDefined,
        s"$q lost partial (map-side) top-k:\n$plan")
    }
  }

  test("banded LSH near-dup candidates join bare ids, never vectors") {
    // the (table, bucket) candidate self-join must not carry the
    // embedding column through the quadratic join; vectors re-attach by
    // id afterwards (candidate-proportional equi joins)
    val df = SparkEntry.queries("embed_neardup_lsh")(spark, sf0001)
    val bucketJoins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.condition.exists(_.references.exists(_.name == "__bkt")) => j
    }
    assert(bucketJoins.nonEmpty, "candidate bucket join missing from plan")
    bucketJoins.foreach { j =>
      val carried = (j.left.output ++ j.right.output).map(_.name)
      assert(!carried.exists(n => n.contains("embedding") || n == "v1" || n == "v2"),
        s"vector column flows through the candidate join: $carried")
    }
  }

  test("z-order relayout is one range exchange + in-partition sort") {
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"),
        graft.ops.ZOrder.normalizeMod(col("user_id"), 8).as("u"),
        graft.ops.ZOrder.normalizeMod(col("event_id"), 8).as("v"))
    val plan = planOf(graft.ops.ZOrder.zorderBy(ev, Seq(col("u"), col("v")), 8, 8))
    assert("rangepartitioning".r.findAllIn(plan).size >= 1, s"no range exchange:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"), s"extra hash exchange:\n$plan")
    // the sort must stay inside partitions (no global sort boundary)
    assert(plan.contains("Sort") && !plan.contains("SinglePartition"), plan)
  }

  test("exact dedup shuffles the 64-bit hash, not the text") {
    val plan = planOf(graft.ops.Dedup.exact(
      Tables.documents(spark, sf0001), "text", "doc_id"))
    // the aggregation exchange must partition on the hash column, and text
    // must not be part of the shuffled aggregate schema
    // grouping key is the xxhash64 expression; the exchange carries only
    // (hash, min-id) — the text column never crosses the wire
    assert(plan.contains("xxhash64"), s"no hash grouping:\n$plan")
    val exchIn = plan.linesIterator.dropWhile(!_.contains("(6) Exchange"))
      .slice(1, 3).mkString
    assert(!exchIn.contains("text#"), s"text shuffled:\n$plan")
  }

  test("repetition metrics: token exchange carries partial counts, no cartesian") {
    val plan = planOf(SparkEntry.queries("text_repetition")(spark, sf0001))
    // the gram-count aggregation must partially aggregate BEFORE its
    // exchange — the shuffle carries (doc, n, gram, partial-count) rows,
    // not raw gram occurrences (map-side combine is what bounds the
    // exchange by distinct grams instead of total tokens)
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      s"no partial aggregation below the token exchange:\n$plan")
    // per-document metrics must come back together without a cartesian
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"pair blow-up:\n$plan")
  }

  test("substring dedup: semi-join on span hashes, map-side combine, no cartesian") {
    val plan = planOf(SparkEntry.queries("dedup_substring_spans")(spark, sf0001))
    // duplicated-hash detection must reach occurrences as a LEFT SEMI join
    // (not an inner join that could duplicate rows, nor a count-window
    // that concentrates a hot span's occurrences on one reducer)
    assert(plan.contains("LeftSemi"), s"no semi join:\n$plan")
    // the dup-hash groupBy must partially aggregate before its exchange —
    // that combine is what absorbs boilerplate spans at corpus scale
    assert(plan.contains("partial_count"), s"no map-side combine:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }

  test("lm scoring / tfidf: the only cross join is the 1-row scalar broadcast") {
    for (q <- Seq("lm_perplexity", "tfidf_top_terms")) {
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length == 1,
        s"$q: expected exactly the V/N scalar broadcast NLJ:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q cartesian:\n$plan")
    }
  }

  test("temperature mix: corpus joins the cutoff table by broadcast hash") {
    // simple mode: formatted repeats each node in its detail section,
    // which would inflate the operator counts below
    val plan = SparkEntry.queries("mix_temperature_sample")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the rate table derives from two 1-row scalar broadcasts (share sum,
    // Tmax) — those are the only nested-loop joins; the corpus itself must
    // meet the group cutoffs through a broadcast hash join, unshuffled
    assert(plan.contains("BroadcastHashJoin"), s"corpus shuffled to join rates:\n$plan")
    // 3 scalar BNLJs: counts×sumw (planned twice — the shares subtree
    // feeds both Tmax and the rate table) + rates×Tmax; all group-sized
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length <= 3,
      s"unexpected nested-loop joins:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }

  test("bm25: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val plan = SparkEntry.queries("bm25_search")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // orderBy+limit must become per-partition heaps + a k-row merge; a
    // Sort of the scored corpus would mean the limit failed to push down
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not pushed:\n$plan")
  }

  test("semdedup: pair search is an equality join on cid, never a cartesian") {
    val plan = planOf(SparkEntry.queries("semdedup_survivors")(spark, sf0001))
    // the quadratic search must stay inside cells: an equi-join keyed on
    // cid (hash or broadcast), with the anti-join returning survivors
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs blow-up:\n$plan")
    assert(plan.contains("LeftAnti"), s"no anti join:\n$plan")
  }

  test("curation funnel: gates compose without cartesian products") {
    // the driver query materializes each stage (cache+count), so its
    // returned frame is five local rows; pin the heavy stage-4 LINEAGE
    // it executes — the same gate composition, unmaterialized
    val docs = graft.Tables.documents(spark, sf0001)
    val s2 = graft.ops.TextAnalysis.withQualityScore(
        docs.filter(col("source") =!= "src0"), "text", "quality")
      .filter(col("n_chars").between(100, 20000))
      .filter(round(col("quality"), 6) >= 0.9)
    val s3 = graft.ops.Dedup.decontaminate(
      s2, docs.filter(col("source") === "src0"), "text", "doc_id", n = 5)
    val s4 = graft.ops.Dedup.nearDupSurvivors(s3,
      graft.ops.Dedup.minhashExactPairs(s3, "text", "doc_id",
        k = 16, bands = 8, shingleN = 3, threshold = 0.8), "doc_id")
    val plan = planOf(s4)
    // decontamination joins gram hashes, near-dup joins banded minhash
    // buckets: the whole chained funnel must stay equality-join-only
    assert(!plan.contains("CartesianProduct"), s"all-pairs stage:\n$plan")
    // both dedup arms drop losers via anti joins
    assert("LeftAnti".r.findAllIn(plan).length >= 2, s"missing anti join:\n$plan")
  }

  test("kmeans step: assignment is shuffle-free, one aggregate exchange") {
    val plan = SparkEntry.queries("kmeans_update_centroids")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the in-row argmax assignment adds no exchange and no join; the
    // only hash exchange is the (cid, pos) partial->final aggregate
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"extra shuffle:\n$plan")
    assert(!plan.contains("Join"), s"assignment joined instead of argmax:\n$plan")
  }

  test("next-event examples: context frame, step, and lead share one key exchange") {
    val plan = SparkEntry.queries("next_event_examples")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // all three window expressions ride the same hashpartitioning(user_id)
    // exchange; the only other exchange is the final order-by range
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"extra shuffle:\n$plan")
  }

  test("merge upsert: snapshot pays one anti join, never a full-outer") {
    val plan = planOf(SparkEntry.queries("merge_upsert")(spark, sf0001))
    assert(plan.contains("LeftAnti"), s"no anti join:\n$plan")
    assert(!plan.contains("FullOuter"), s"full-outer merge:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"non-equi merge join:\n$plan")
  }

  test("knn graph: equality join on cid, top-k runs as a window group limit") {
    val df = SparkEntry.queries("embed_knn_graph")(spark, sf0001)
    val plan = planOf(df)
    // candidates must stay within cells (equi-join on cid, no all-pairs)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs blow-up:\n$plan")
    // the rank<=k filter trims per-partition before the window's full
    // sort materializes every candidate pair
    assert(plan.contains("WindowGroupLimit"), s"top-k not pushed down:\n$plan")
  }

  test("inverted index: one term exchange feeds window, cap, and collect") {
    val plan = SparkEntry.queries("inverted_index")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // df-count window, row_number cap, and the posting-list aggregation
    // all reuse the single hashpartitioning(term) exchange; the only other
    // exchange is the final order-by's range partitioning
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1,
      s"extra shuffle:\n$plan")
    // the 64-id cap must push below the full sort as a group limit so no
    // task ever buffers a stop-word's complete posting set
    assert(plan.contains("WindowGroupLimit"), s"cap not pushed down:\n$plan")
  }

  test("cooccurrence: lead-window pair expansion, broadcast marginals") {
    val plan = SparkEntry.queries("cooccurrence_window")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // pair generation is posexplode + lead windows (no position
    // self-join); the only joins are the two broadcast marginal lookups
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"pair generation shuffled a join:\n$plan")
    assert("BroadcastHashJoin".r.findAllIn(plan).length == 2, s"marginals:\n$plan")
    assert(plan.contains("partial_count"), s"no map-side combine:\n$plan")
  }

  test("exact-k per group runs as a WindowGroupLimit") {
    val plan = SparkEntry.queries("sample_k_per_group")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("WindowGroupLimit"), s"k-cap not pushed down:\n$plan")
  }

  test("table profile: all per-column stats come from ONE scan") {
    val plan = SparkEntry.queries("table_profile")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // five exact count-distincts share a single Expand aggregate over a
    // single file scan; the per-column rows are a stack() unpivot of the
    // 1-row result — never five passes over the table
    assert("FileScan".r.findAllIn(plan).length == 1, s"multiple scans:\n$plan")
    assert(plan.contains("Expand"), s"no multi-distinct expand:\n$plan")
  }

  test("orc scan pushes the filter; partitioned read prunes at planning time") {
    val orc = SparkEntry.queries("orc_ingest")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(orc.contains("PushedFilters: [IsNotNull(n_chars), GreaterThanOrEqual(n_chars,100)]"),
      s"ORC filter not pushed:\n$orc")
    val part = SparkEntry.queries("partitioned_pruned_read")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the event_type predicate must land in PartitionFilters (directory
    // pruning), not in the data filter of a full scan
    assert(part.contains("PartitionFilters: [event_type"),
      s"no partition pruning:\n$part")
  }

  test("pagerank: equality joins only, map-side-combined contribution sums") {
    val plan = SparkEntry.queries("pagerank_knn")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the centroid argmax assignment keeps the knn edge build cartesian-
    // free, and both damped iterations join ranks to edges by key
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    assert(plan.contains("partial_sum"), s"no map-side combine:\n$plan")
  }

  test("bpe pair stats: distinct-word collapse, heap top-k, no join") {
    val plan = SparkEntry.queries("bpe_merge_step")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // corpus pays one word exchange (partial counts combine map-side);
    // the pair aggregate runs over vocabulary-sized data; top-20 is a
    // per-partition heap, never a global sort
    assert(plan.contains("partial_count"), s"no map-side combine:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"full sort for top-k:\n$plan")
    assert(!plan.contains("Join"), s"join crept in:\n$plan")
  }

  test("event transitions: user lead + pair aggregate + prev window, no join") {
    val plan = SparkEntry.queries("event_transitions")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // exchanges: hashpartitioning(user_id) for the lead, the pair
    // aggregate's tiny exchange (partial combine collapses to |types|^2
    // rows first), and hashpartitioning(prev_type) for the probability
    // window — never a join
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 3,
      s"unexpected exchange count:\n$plan")
    assert(plan.contains("partial_count"), s"no map-side combine:\n$plan")
    assert(!plan.contains("Join"), s"join crept in:\n$plan")
  }

  test("leak-free group split and decay features: assignment/weights add no exchange") {
    val split = SparkEntry.queries("group_split_leakfree")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // split label is a scan-level expression; the distinct-count rewrite
    // (expand) pays the aggregate's own exchanges only — no join anywhere
    assert(!split.contains("Join"), s"split joined a lookup:\n$split")
    val decay = SparkEntry.queries("time_decay_features")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the decay weight is in-row arithmetic: one user aggregate exchange
    assert("Exchange hashpartitioning".r.findAllIn(decay).length == 1,
      s"extra shuffle:\n$decay")
    assert(decay.contains("partial_count"), s"no map-side combine:\n$decay")
    assert(!decay.contains("Join"), s"decay joined:\n$decay")
  }

  test("multitouch attribution: touches meet purchases by equi-join, not a range probe") {
    val plan = SparkEntry.queries("attribution_linear_multitouch")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the 24 h bound must ride an equality join on user_id as extra
    // predicates — a nested-loop/cartesian here is the all-pairs blow-up
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"range probe:\n$plan")
  }

  test("zone map prune: candidate chunks broadcast to the row scan") {
    val plan = SparkEntry.queries("zone_map_prune")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the pruned scan must meet the candidate list as a broadcast hash
    // join (the stats table is file-count-sized metadata); the only
    // nested-loop joins are the three 1-row summary combiners
    assert(plan.contains("BroadcastHashJoin"), s"candidates shuffled:\n$plan")
    assert("BroadcastNestedLoopJoin|CartesianProduct".r.findAllIn(plan).length <= 3,
      s"unexpected join shape:\n$plan")
  }

  test("join size estimate: the cardinality comes from counts, never a join") {
    val plan = SparkEntry.queries("join_size_estimate")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the whole point: |A ⋈ B| = Σ cntA·cntB from one linear aggregate —
    // any Join node means the estimator materialized what it estimates
    assert(!plan.contains("Join"), s"estimator joined:\n$plan")
  }

  test("rank AUC / Gini split: one histogram exchange, windows on the collapsed domain") {
    for (q <- Seq("roc_auc_ranksum", "gini_best_split")) {
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      // raw rows cross the wire once (the per-distinct-score histogram);
      // everything after runs on the domain: the only further exchanges
      // are the SinglePartition window/total steps over histogram rows
      assert(!plan.contains("CartesianProduct"), s"$q all-pairs:\n$plan")
      // raw rows feed exactly one hash exchange (the histogram groupBy);
      // every other exchange (SinglePartition window + totals branch +
      // broadcast) moves domain-sized histogram rows only
      val rawExchanges = "Exchange hashpartitioning\\(n_chars".r
        .findAllIn(plan).length
      assert(rawExchanges <= 2, s"$q re-shuffles raw rows:\n$plan")
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges <= 5, s"$q too many exchanges ($exchanges):\n$plan")
    }
  }

  test("hard negatives: cell-equality candidate join + per-anchor window group limit") {
    val plan = SparkEntry.queries("hard_negative_mining")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs scoring:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"top-k sorts full candidates:\n$plan")
  }

  test("quantile normalize: the global permille map joins as a broadcast dimension") {
    val plan = SparkEntry.queries("quantile_normalize_scores")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // the (lo, hi] interval map is domain-sized metadata — it must reach
    // rows as a broadcast nested loop (range condition), never a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin"), s"map shuffled:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"unconstrained product:\n$plan")
  }

  test("skyline: front re-attaches by broadcast; no all-pairs dominance join") {
    val plan = SparkEntry.queries("skyline_price_size")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("BroadcastHashJoin"), s"front shuffled:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"pairwise dominance test materialized:\n$plan")
  }

  test("RFM: cutoff frames broadcast, no ntile window over raw customers") {
    val df = SparkEntry.queries("rfm_segmentation")(spark, sf0001)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    // r14 shape: ONE combined 12-column cutoff row (all three axes ride a
    // single RangeRank pass) broadcast onto the checkpointed rfm frame,
    // plus the 1-row n frame broadcast inside the cutoff subtree — both
    // BroadcastNestedLoopJoins by construction (1-row, no join key)
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length >= 2,
      s"1-row cutoff/n frames not broadcast:\n$plan")
    assert(!plan.contains("ntile"), s"global ntile over raw rows:\n$plan")
  }

  test("TPC-H Q8: all five dims broadcast onto the lineitem spine") {
    val plan = SparkEntry.queries("tpch_q8_market_share")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // part, supplier⋈nation, customer-nation⋈region, and the year-total
    // re-join all ride broadcasts; only orders/customer may shuffle
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 4,
      s"dimension shuffled:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("null-safe join runs on pre-collapsed key domains, not raw rows") {
    val df = SparkEntry.queries("null_safe_join_props")(spark, sf0001)
    val plan = df.queryExecution.explainString(ExplainMode.fromString("simple"))
    // both sides aggregate BEFORE the full-outer <=> join: the join's
    // inputs are HashAggregate results (domain-sized), so the null
    // bucket meets as one row per side
    val joinIdx = plan.indexOf("SortMergeJoin")
      .max(plan.indexOf("BroadcastHashJoin")).max(plan.indexOf("ShuffledHashJoin"))
    assert(joinIdx >= 0, s"no equi join planned:\n$plan")
    assert("HashAggregate".r.findAllIn(plan.substring(joinIdx)).nonEmpty,
      s"join not fed by aggregates:\n$plan")
  }

  test("feature hashing: partial aggregation before the bucket shuffle, no join") {
    val plan = SparkEntry.queries("feature_hash_vectors")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // two groupBys (doc×bucket, then doc) × partial+final = 4 aggregates;
    // the hashing-trick's whole point is a pure aggregate pipeline —
    // no join and no vocabulary broadcast anywhere in the plan
    assert("HashAggregate".r.findAllIn(plan).length == 4,
      s"aggregate pipeline shape changed:\n$plan")
    assert(!plan.contains("Join"), s"feature hashing must not join:\n$plan")
  }

  test("containment dedup: equality joins only, counts attach on the id key") {
    val plan = SparkEntry.queries("dedup_containment_pairs")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"containment must never plan all-pairs:\n$plan")
  }

  test("WL refinement and SNM window: no cartesian, sort-based window for SNM") {
    val wl = SparkEntry.queries("wl_refinement_knn")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!wl.contains("CartesianProduct"), s"WL must stay equi-join:\n$wl")
    val snm = SparkEntry.queries("dedup_sorted_neighborhood")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    // successor probe is an EQUI join on the exploded offset rank —
    // the naive BETWEEN formulation plans a nested-loop join
    assert(!snm.contains("CartesianProduct") &&
      !snm.contains("BroadcastNestedLoopJoin"),
      s"SNM successor probe regressed to non-equi:\n$snm")
  }

  test("gap ranges: boundaries via two anti-joins; ordering windows see boundaries only") {
    // r13: the boundary ORDINALS moved onto RangeRank.withGlobalPos
    // (boundary density is corpus-proportional on this fixture — the
    // growth audit measured 10× rows-in), whose localCheckpoint hides
    // the upstream anti-joins behind an RDD scan in the final plan. The
    // pin therefore splits: (a) the boundary derivation itself still
    // plans two LeftAnti joins (asserted on the pre-rank subframes, the
    // same construction the query builds); (b) the full query's final
    // plan carries no cartesian and no SinglePartition exchange.
    val keys = Tables.orders(spark, sf0001)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey").as("k"))
    val succ = keys.select((col("k") + 1).as("k1"))
    val boundary = succ.join(keys, succ("k1") === keys("k"), "left_anti")
    val bPlan = boundary.queryExecution
      .explainString(ExplainMode.fromString("simple"))
    assert("LeftAnti".r.findAllIn(bPlan).length == 1,
      s"boundary derivation must be an anti-join:\n$bPlan")
    val plan = SparkEntry.queries("sequence_gap_ranges")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"gap ordinals must not funnel through one task:\n$plan")
  }

  test("FIFO match: part-keyed equi-join with overlap residual, never nested-loop") {
    val plan = SparkEntry.queries("fifo_match_returns")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"interval intersection must ride the pk equi-join:\n$plan")
  }

  test("M4 / Haar / Hilbert: the only non-equi join is the 1-row span broadcast") {
    for (q <- Seq("m4_downsample", "hilbert_layout_events")) {
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length == 1,
        s"$q: expected exactly the broadcast span join:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q cartesian:\n$plan")
    }
    // haar adds the literal 64-bucket grid and 6-level tables — three
    // more broadcast-literal cross joins, every one BuildRight with a
    // constant-size side; the pin is that ALL of them broadcast (no
    // CartesianProduct, which would shuffle the data side)
    val haar = SparkEntry.queries("haar_wavelet_energy")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(!haar.contains("CartesianProduct"), s"haar cartesian:\n$haar")
  }

  test("bitmap intersect and wasserstein pair joins stay equi-keyed") {
    for (q <- Seq("bitmap_index_intersect", "wasserstein_histogram_exact")) {
      val plan = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.explainString(ExplainMode.fromString("simple"))
      assert(!plan.contains("CartesianProduct"),
        s"$q: pair stage must join on word/bucket keys:\n$plan")
    }
  }

  test("range-rank: no single-partition exchange, matches the global window") {
    // VERDICT r10 #1: dedup_sorted_neighborhood's positions must come
    // from the two-level prefix-sum rank, never a global row_number
    // window (one task sorting the whole corpus). Asserted on the
    // un-checkpointed plan (the test hook — localCheckpoint would hide
    // the ranking stage behind an RDD scan), then value-checked against
    // the global-window oracle form.
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"),
        substring(graft.ops.Dedup.normalize(col("text")), 1, 300).as("t"))
    val (ranked, cached) = graft.ops.RangeRank.withGlobalPosPlan(
      docs, Seq(col("t"), col("doc_id")), "pos")
    try {
      val plan = planOf(ranked)
      assert(!plan.contains("SinglePartition"),
        s"single-partition exchange in range-rank:\n$plan")
      assert(plan.contains("rangepartitioning"),
        s"no range exchange in range-rank:\n$plan")
      import org.apache.spark.sql.expressions.Window
      val oracle = docs.select(col("doc_id"), row_number()
        .over(Window.orderBy("t", "doc_id")).cast("long").as("pos"))
      assert(ranked.select("doc_id", "pos").except(oracle).count() == 0L,
        "two-level rank diverges from the global window")
    } finally { cached.unpersist(); () }
    // and the full query plan (checkpoint downstream) stays parallel too
    val q = planOf(SparkEntry.queries("dedup_sorted_neighborhood")(
      spark, sf0001))
    assert(!q.contains("SinglePartition"),
      s"dedup_sorted_neighborhood plans a single-partition exchange:\n$q")
  }

  test("range-prefix: no single-partition exchange, matches the global running sum") {
    // VERDICT r11 #3 follow-through: the plan-audit classifier caught
    // pr_curve_points / calibration_reliability cumulating via a global
    // Window.orderBy (whole corpus through one task). Their replacement,
    // RangeRank.withGlobalPrefix, must (a) plan a range exchange and no
    // SinglePartition, (b) reproduce the global window's rank AND
    // inclusive running sum bit-exactly, ties and all.
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"),
        floor(col("value") * 100).cast("long").as("cents"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
    val (ranked, cached) = graft.ops.RangeRank.withGlobalPrefixPlan(
      ev, Seq(desc("cents"), col("event_id")), "y", "pos", "runsum")
    try {
      val plan = planOf(ranked)
      assert(!plan.contains("SinglePartition"),
        s"single-partition exchange in range-prefix:\n$plan")
      assert(plan.contains("rangepartitioning"),
        s"no range exchange in range-prefix:\n$plan")
      import org.apache.spark.sql.expressions.Window
      val wo = Window.orderBy(desc("cents"), col("event_id"))
      val oracle = ev.select(col("event_id"),
        row_number().over(wo).cast("long").as("pos"),
        sum(col("y")).over(
          wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("runsum"))
      assert(ranked.select("event_id", "pos", "runsum")
          .except(oracle).count() == 0L,
        "two-level prefix sum diverges from the global window")
    } finally { cached.unpersist(); () }
    // the rewritten consumers must not rank/cumulate through a global
    // window anymore (their remaining SinglePartition exchanges are
    // 1-row scalar-count aggregates — PlanAudit's runtime classifier
    // checks those by measured rows-in, which a static grep can't)
    for (q <- Seq("pr_curve_points", "calibration_reliability",
        "joint_decile_grid")) {
      val plan = planOf(SparkEntry.queries(q)(spark, sf0001))
      assert(!plan.contains("Window"),
        s"$q still ranks via a window:\n$plan")
    }
  }

  test("quantile sketch: bottom-k selections run as WindowGroupLimit") {
    // The sketch's scalability claim: every rank<=k selection prunes to
    // k rows per key on the MAP side before its exchange — the shuffle
    // carries <= k*partitions rows per key, never the stream.
    val plan = planOf(SparkEntry.queries("quantile_sketch_mergeable")(
      spark, sf0001))
    assert("WindowGroupLimit".r.findAllIn(plan).length >= 3,
      s"bottom-k selections not group-limited:\n$plan")
  }

  test("fingerprint family never hints a corpus-proportional broadcast") {
    // VERDICT r10 #2: the r10 forms broadcast the distinct token-trigram
    // domain — linear in the corpus, a guaranteed driver OOM at scale.
    // The rewritten queries hash per occurrence; pin = no broadcast hint
    // survives anywhere in either logical plan (bounded auto-broadcasts
    // chosen by Catalyst from size estimates remain legitimate).
    for (q <- Seq("fingerprint_modp_candidates", "winnowing_fingerprints",
      // r11 session 2: vocab / per-user tables unhinted (same hazard
      // class); these two queries now carry NO hint at all
      "cooccurrence_window", "pit_join_leak_audit")) {
      val analyzed = SparkEntry.queries(q)(spark, sf0001)
        .queryExecution.analyzed.toString
      assert(!analyzed.contains("ResolvedHint"),
        s"$q still carries a broadcast hint")
    }
  }

  test("KMV source sketch: rank<=k prunes per partition before the exchange") {
    // source_overlap_kmv's sketch subplan materializes behind a
    // localCheckpoint, so pin the operator shape directly: bottomK over
    // the per-source shingle-hash stream must plan a Partial
    // WindowGroupLimit — each map task keeps its own 64 smallest hashes
    // and the exchange carries ≤ k·P rows per source, never the corpus.
    val sh = Tables.documents(spark, sf0001)
      .select(col("source"),
        explode(graft.ops.Dedup.shingles(col("text"), 3)).as("g"))
      .select(col("source"), graft.ops.Dedup.md5Hash64(col("g"))
        .bitwiseAND(lit(Long.MaxValue)).as("h"))
      .distinct()
    val plan = graft.ops.QuantileSketch
      .bottomK(sh, Seq(col("source")), col("h"), col("h"), 64)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"sketch selection lost its partial top-k:\n$plan")
  }

  test("ivm_components_delta serves yesterday's labels from the staged state") {
    // The maintenance query must READ the materialized label state, not
    // rebuild components over the full graph per run: the executed plan
    // scans the graft_cc_state parquet staging (the contraction CC over
    // the tiny delta resolves to a local fast path, so the only
    // iterative-components cost is inside the one-time staging build).
    val plan = SparkEntry.queries("ivm_components_delta")(spark, sf0001)
      .queryExecution.explainString(ExplainMode.fromString("simple"))
    assert(plan.contains("graft_cc_state"),
      s"label state not served from the staged layout:\n$plan")
  }
}
