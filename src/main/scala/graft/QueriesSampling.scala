package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, Dedup, IntervalJoin, QualityGates, Resample,
  Sessionize, Similarity, TextAnalysis, Watermark}
import graft.pipeline.Bucketing
import graft.time.{RolloverCalendar, SessionCalendar}

/** Sampling family queries + DuckDB oracles (split from the
  * monolithic SparkEntry in round 12; entry bodies unchanged). */
private[graft] trait QueriesSampling extends QueryShared {

  protected def samplingQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact-k per-stratum sampling (reservoir semantics, deterministic):
    // exactly 3 documents per language by keyed-hash rank — the
    // fixed-budget variant fraction sampling can't give you. The rank
    // executes as a WindowGroupLimit (per-partition heaps), so no
    // language's documents ever gather into one task for a full sort.
    "sample_k_per_group" -> { (s, d) =>
      graft.ops.Sampling.exactKPerGroup(
          Tables.documents(s, d), "doc_id", "lang", k = 3)
        .select(col("lang"), col("doc_id"), col("n_chars"))
        .orderBy("lang", "doc_id")
    },


    // Leakage-free dataset split: the split key is the GROUP (user), not
    // the row — every event of a user lands in the same split, the rule
    // that keeps one user's history out of both train and test.
    // Assignment is the same zero-shuffle keyed hash as sample_split,
    // applied to user_id; the only exchange is the per-split summary
    // aggregate (the id checksum makes membership, not just sizes,
    // oracle-checked).
    "group_split_leakfree" -> { (s, d) =>
      graft.ops.Sampling.splitByHash(Tables.events(s, d), "user_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          sum(col("event_id")).as("sum_event_id"))
        .orderBy("split")
    },


    // Deterministic stratified sampling: per-language keep-rates via keyed
    // multiplicative hashing — no RNG, no shuffle, retry-stable; the
    // oracle reruns the identical integer arithmetic.
    "sample_stratified" -> { (s, d) =>
      graft.ops.Sampling.stratifiedSample(Tables.documents(s, d), "doc_id",
          "lang", Map("en" -> 0.5, "de" -> 0.2), defaultFraction = 0.1)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")
    },


    // Length-weighted importance sampling: keep probability
    // min(1, n_chars·2000/10⁶) — long documents always survive, short
    // ones proportionally. Same keyed hash, all-integer cutoff, zero
    // shuffle; the scheme any per-row weight (quality tier, source
    // priority) plugs into.
    "sample_weighted" -> { (s, d) =>
      graft.ops.Sampling.weightedSample(Tables.documents(s, d), "doc_id",
          col("n_chars"), perMillionPerUnit = 2000L)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy("doc_id")
    },


    // Temperature mixing (α=0.5): per-language keep-rates derived from
    // the exact language counts (share ∝ n^0.5, scaled so no group
    // up-samples — languages are the skewed axis here: en is 3.4× fr, so
    // en keeps ~54% while fr keeps all), then the deterministic keyed-hash
    // filter. The oracle rebuilds the cutoffs from the same counts and
    // reruns the integer hash verbatim.
    "mix_temperature_sample" -> { (s, d) =>
      graft.ops.Sampling.temperatureMix(Tables.documents(s, d),
          "doc_id", "lang", alpha = 0.5)
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy("doc_id")
    },


    // Train/val/test split: disjoint + exhaustive by hash-bucket ranges.
    "sample_split" -> { (s, d) =>
      graft.ops.Sampling.splitByHash(Tables.documents(s, d), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
        .orderBy("doc_id")
    },


    // Cross-split contamination MATRIX — the pairwise companion to the
    // train-side decontaminate gate: for each split pair, how many
    // distinct 8-gram TYPES they share (the leakage the split hash
    // cannot prevent when near-identical docs land in different
    // splits). Grams collapse to distinct (split, gram) rows first —
    // gram-type-sized, never corpus-sized — then one self-join on the
    // gram key counts each unordered pair. String grams keep the DuckDB
    // oracle byte-exact; per-split totals ride along so shared counts
    // read as rates.
    // 1024-doc audit-sample cap (VERDICT r12 #6): the matrix is a
    // method-comparison diagnostic (does the split hash leak gram
    // types?), answered identically on a fixed audit slice; no-op at
    // sf0.01 (500 docs). The production gate (decontaminate_train) stays
    // uncapped.
    "split_contamination_matrix" -> { (s, d) =>
      val g = graft.ops.Sampling.splitByHash(
          Tables.documents(s, d).filter(col("doc_id") < 1024),
          "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .repartition(shuffleWidth(s), col("doc_id"))
        .select(col("split"),
          explode(Dedup.shingles(col("text"), 8)).as("g"))
        .distinct()
      val tot = g.groupBy("split").agg(count(lit(1)).as("n_grams"))
      g.as("a").join(g.as("b"),
          col("a.g") === col("b.g") && col("a.split") < col("b.split"))
        .groupBy(col("a.split").as("split_a"), col("b.split").as("split_b"))
        .agg(count(lit(1)).as("n_shared_grams"))
        .join(tot.select(col("split").as("split_a"),
          col("n_grams").as("n_grams_a")), "split_a")
        .join(tot.select(col("split").as("split_b"),
          col("n_grams").as("n_grams_b")), "split_b")
        .select(col("split_a"), col("split_b"), col("n_shared_grams"),
          col("n_grams_a"), col("n_grams_b"))
        .orderBy("split_a", "split_b")
    },


    // LLM sequence packing: documents accumulate in id order into packs of
    // ~2048 tokens (pack-then-chunk preprocessing); two-level prefix sum,
    // no global window. Oracle = the same cumulative sum as a SQL window.
    "pack_sequences" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))
      graft.ops.Packing.packSequences(docs, "n_tokens", "doc_id",
          maxTokens = 2048L)
        .select(col("doc_id"), col("n_tokens"), col("pack_id"))
        .orderBy("doc_id")
    },


    // Deterministic shard manifest — the write-side contract of a training
    // corpus release: every document routes to shard md5(id) mod 16 (the
    // oracle-portable hash; mod a power of two, where signed pmod ≡
    // unsigned %), and the manifest rows carry counts, byte totals and id
    // checksums a downstream loader re-verifies per shard. One map-side-
    // combined aggregate; at 100 TB the same expression feeds
    // repartition(shard) so each shard writes from its own task group.
    "shard_manifest" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("shard",
          pmod(Dedup.md5Hash64(col("doc_id").cast("string")), lit(16L))
            .cast("int"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("id_checksum"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy("shard")
    },


    // Distributed decision-tree split finding: the n_chars threshold that
    // best separates lang='en' by weighted Gini impurity, argmin over the
    // same collapsed histogram + prefix sums, exact micro-unit integers
    // with a smallest-threshold tiebreak.
    "gini_best_split" -> { (s, d) =>
      graft.ops.MlMetrics.giniBestSplit(Tables.documents(s, d),
        col("n_chars"), col("lang") === "en")
    },


    // Curriculum phases — split the corpus into 4 training phases of
    // ~equal CHARACTER mass in length order (curriculum learning's
    // easy-to-hard schedule with balanced compute per phase). Phase
    // boundaries come from the exclusive prefix mass over the collapsed
    // length histogram: one exchange, domain-sized windows, exact
    // integer floor arithmetic.
    "curriculum_phases" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val hist = Tables.documents(s, d)
        .groupBy("n_chars").agg(count(lit(1)).as("c"))
        .withColumn("mass", col("n_chars") * col("c"))
      val w = Window.orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, -1)
      val tot = hist.agg(sum("mass").as("total_mass"))
      hist.withColumn("cum_excl", coalesce(sum("mass").over(w), lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("phase", expr("cum_excl * 4 DIV total_mass"))
        .groupBy("phase")
        .agg(sum("c").as("n_docs"), sum("mass").as("sum_chars"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
        .orderBy("phase")
    },


    // Temporal train/val split with an EMBARGO gap — time-series
    // leakage prevention (purged splits, López de Prado's embargo): the
    // 7 days after the train cutoff are EXCLUDED so near-boundary
    // look-ahead (labels computed from future windows) can't leak into
    // validation. Cutoff day from the day-collapsed histogram at the
    // integer-ceil 70% rank ((7n+9) DIV 10); the split report carries
    // the leakage invariant (val_gap_days ≥ 8) as an oracle-checked
    // boolean. Day domain is tiny — every exchange after the per-day
    // count is domain-sized.
    "temporal_split_embargo" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val hist = ev.groupBy("day").agg(count(lit(1)).as("c"))
      val w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
      val cut = hist.withColumn("cum", sum("c").over(w))
        .crossJoin(broadcast(ev.agg(count(lit(1)).as("n"))))
        .agg(min(when(col("cum") >= expr("(n * 7 + 9) DIV 10"),
          col("day"))).as("train_end"))
      val tagged = ev.crossJoin(broadcast(cut))
        .withColumn("split",
          when(col("day") <= col("train_end"), "train")
            .when(col("day") <= date_add(col("train_end"), 7), "embargo")
            .otherwise("val"))
      tagged.groupBy("split")
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          date_format(min(col("day")), "yyyy-MM-dd").as("first_day"),
          date_format(max(col("day")), "yyyy-MM-dd").as("last_day"))
        .crossJoin(broadcast(tagged.agg(
          (datediff(min(when(col("split") === "val", col("day"))),
            max(when(col("split") === "train", col("day")))) >= 8)
            .as("embargo_ok"))))
        .orderBy("split")
    },


    // Mix-shift decomposition — why did revenue change between two
    // periods: per type, the volume delta splits into a MIX effect
    // (share change at old total) and a GROWTH effect (total change at
    // old share), all in exact integer permille/cents arithmetic
    // (mix_cents = (share_p2 − share_p1)·total_p1, growth_cents =
    // share_p1·(total_p2 − total_p1), both DIV 1000 with shares in
    // permille — the FP&A bridge report without a float in sight).
    "mix_shift_decomposition" -> { (s, d) =>
      // mid-corpus cutoff (events span Jan 1-30; a Feb cutoff leaves
      // period 2 empty and the share division undefined)
      val cutoff = lit("2024-01-16 00:00:00").cast("timestamp_ntz")
      val ev = Tables.events(s, d).select(col("event_type"),
        (col("ts") < cutoff).as("p1"),
        round(col("value") * 100).cast("long").as("cents"))
      val byType = ev.groupBy("event_type")
        .agg(sum(when(col("p1"), col("cents")).otherwise(0L)).as("rev_p1"),
          sum(when(!col("p1"), col("cents")).otherwise(0L)).as("rev_p2"))
      val tot = byType.agg(sum("rev_p1").as("t1"), sum("rev_p2").as("t2"))
      byType.crossJoin(broadcast(tot))
        .select(col("event_type"), col("rev_p1"), col("rev_p2"),
          expr("rev_p1 * 1000 DIV t1").as("share_p1_permille"),
          expr("rev_p2 * 1000 DIV t2").as("share_p2_permille"),
          expr("(rev_p2 * 1000 DIV t2 - rev_p1 * 1000 DIV t1) * t1" +
            " DIV 1000").as("mix_effect_cents"),
          expr("(rev_p1 * 1000 DIV t1) * (t2 - t1) DIV 1000")
            .as("growth_effect_cents"))
        .orderBy("event_type")
    },


    // Deterministic minority-class oversampling: every language class is
    // replicated up to the majority class's count, the per-doc factor
    // assigned by doc_id rank so the balanced corpus is bit-reproducible
    // (no RNG, no sampling variance) and totals are EXACT — each class
    // lands on precisely `target` rows (base = target DIV n for all,
    // the target % n remainder goes to the lowest-ranked docs). The
    // per-class row_number is the one non-scalable piece (a class is one
    // window partition); at 100 TB rank within (class, shard) and stripe
    // the remainder across shards — the exact-total guarantee survives
    // because shard sizes are known from the same collapsed aggregate.
    "oversample_minority" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d).select("doc_id", "lang")
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val target = counts.agg(max("n").as("target"))
      docs.withColumn("rk",
          row_number().over(Window.partitionBy("lang").orderBy("doc_id")))
        .join(broadcast(counts), "lang").crossJoin(broadcast(target))
        .withColumn("rep",
          expr("target DIV n + IF(rk <= target % n, 1L, 0L)"))
        .select(col("doc_id"), col("lang"),
          explode(expr("sequence(1L, rep)")).as("copy_id"))
        .orderBy("lang", "doc_id", "copy_id")
    },


    // Deterministic bootstrap CI for total purchase revenue (Efron 1979,
    // with hash-indexed resampling instead of RNG so the 200 resamples
    // are bit-reproducible and engine-portable): each resample draws 30
    // day indices via masked-md5 mod n_days, sums EXACT cents, and the
    // empirical 2.5%/97.5% resample ranks bracket the observed total.
    // The mask-BEFORE-modulus rule matters: unsigned-md5 % n and
    // signed-md5 % n disagree, masked agrees. Day domain is collapsed
    // (30 rows broadcast); 6 000 draws total.
    "bootstrap_ci_daily_revenue" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val md5h: Column => Column = graft.ops.Dedup.md5Hash64
      val daily = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val idx = daily.select(col("cents"),
        (row_number().over(Window.orderBy("day")) - 1).cast("long").as("i"))
      val nd = daily.agg(count(lit(1)).as("n_days"))
      val draws = s.range(200).select(col("id").as("b"))
        .crossJoin(s.range(30).select(col("id").as("j")))
        .crossJoin(broadcast(nd))
        .select(col("b"),
          (md5h(concat(lit("bs|"), col("b"), lit("|"), col("j")))
            .bitwiseAND(lit(Long.MaxValue)) % col("n_days")).as("pick"))
      val sums = draws.join(broadcast(idx), col("i") === col("pick"))
        .groupBy("b").agg(sum("cents").as("resample_cents"))
      val ranked = sums.withColumn("rk",
        row_number().over(Window.orderBy(col("resample_cents"), col("b"))))
      nd.crossJoin(broadcast(ranked.filter(col("rk") === 5)
          .select(col("resample_cents").as("ci_lo_cents"))))
        .crossJoin(broadcast(ranked.filter(col("rk") === 195)
          .select(col("resample_cents").as("ci_hi_cents"))))
        .crossJoin(broadcast(daily.agg(sum("cents").as("observed_cents"))))
        .select(col("n_days"), lit(200L).as("n_resamples"),
          col("ci_lo_cents"), col("ci_hi_cents"), col("observed_cents"))
    },


    // SRE error-budget burn: daily error share vs a 1% SLO in exact
    // hundred-permille units (burn 1000 = exactly at budget), plus the
    // cumulative month-to-date burn — prefix sums over the collapsed
    // day domain. The error-budget arithmetic every on-call dashboard
    // does, engine-exact.
    "slo_error_budget_burn" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("n_err"))
        .withColumn("cum_err", sum("n_err").over(Window.orderBy("day")))
        .withColumn("cum_total", sum("n_total").over(Window.orderBy("day")))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_total"), col("n_err"),
          expr("n_err * 100000 DIV n_total").as("burn_permille"),
          expr("cum_err * 100000 DIV cum_total").as("cum_burn_permille"))
        .orderBy("day")
    },


    // Deterministic 1:1 matched pairs for causal comparison: users split
    // into hash-assigned treat/control, stratified by spend quintile,
    // and paired RANK-TO-RANK within (stratum, arm) — reproducible
    // matching with zero RNG, the no-model baseline for
    // propensity-style analyses. Unmatched tail ranks drop by the inner
    // join (n_pairs = min(arm sizes) per stratum). The ntile runs on
    // the collapsed user domain, and per-stratum outcome-diff sums are
    // exact cents.
    "matched_pairs_stratified" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val md5h: Column => Column = graft.ops.Dedup.md5Hash64
      val u = Tables.events(s, d).groupBy("user_id")
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      // ntile(5) SEMANTICS kept bit-exactly, computed from a RangeRank
      // global position via the closed form (joint_decile_grid
      // precedent) — users grow with the corpus, and the r13 growth
      // audit measured the old global ntile window at 10× rows-in.
      val v = graft.ops.RangeRank.withGlobalPos(
          u.withColumn("treat",
            md5h(concat(lit("m|"), col("user_id")))
              .bitwiseAND(lit(Long.MaxValue)) % 2),
          Seq(col("cents"), col("user_id")), "__grk")
        .crossJoin(broadcast(u.agg(count(lit(1)).as("n"))))
        .withColumn("stratum",
          graft.ops.RangeRank.ntileFromRank("__grk", "n", 5))
        .drop("__grk", "n")
        .withColumn("rk", row_number().over(
          Window.partitionBy("stratum", "treat").orderBy("user_id")))
      val t = v.filter(col("treat") === 1)
        .select(col("stratum"), col("rk"), col("user_id").as("tu"),
          col("cents").as("tc"))
      val c = v.filter(col("treat") === 0)
        .select(col("stratum"), col("rk"), col("user_id").as("cu"),
          col("cents").as("cc"))
      t.join(c, Seq("stratum", "rk"))
        .groupBy("stratum")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("tc") - col("cc")).as("sum_outcome_diff"),
          sum(col("tu") + col("cu")).as("pair_checksum"))
        .orderBy("stratum")
    },


    // M4 downsampling (Jugel et al. VLDB'14): per (event_type, 1-of-64
    // time bucket), the four extreme points — first, last, min-value,
    // max-value rows — which are exactly the rows a pixel-perfect
    // line rendering needs; everything else in the bucket cannot change
    // a 64-pixel-wide chart. All four arg-rows are deterministic via
    // lexicographic (key, ts, event_id) struct min/max — never a bare
    // arg_min that ties arbitrarily. Bucket ids are integer arithmetic
    // over epoch-micros against the broadcast global [lo, hi] span;
    // one partial-aggregated groupBy, no window, no sort of raw rows.
    "m4_downsample" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("eus"),
          floor(col("value") * 100).as("cents"), col("event_id"))
      val span = ev.agg(min("eus").as("lo"), max("eus").as("hi"))
      ev.crossJoin(broadcast(span))
        .withColumn("bucket",
          expr("((eus - lo) * 64) DIV (hi - lo + 1)"))
        .groupBy("event_type", "bucket")
        .agg(count(lit(1)).as("n"),
          min("cents").as("min_v"), max("cents").as("max_v"),
          min(struct(col("eus"), col("event_id"), col("cents")))("cents")
            .as("first_v"),
          max(struct(col("eus"), col("event_id"), col("cents")))("cents")
            .as("last_v"),
          min(struct(col("cents"), col("eus"), col("event_id")))("eus")
            .as("ts_of_min_us"),
          max(struct(col("cents"), col("eus"), col("event_id")))("eus")
            .as("ts_of_max_us"))
        .orderBy("event_type", "bucket")
    },


    // Bin-packing bounds audit for corpus sharding at cap=1024 chars:
    // the straddling packer achieves exactly L1 = ⌈S/cap⌉ (its
    // optimality certificate), the Martello-Toth L2 bound prices the
    // NO-SPLIT constraint (big items >cap/2 monopolize bins; small
    // mass beyond their free space forces more), and per-source
    // packing pays up to one extra partial pack per source — the
    // fragmentation cost of shard-local packing quantified exactly.
    // All ceilings via (a + cap − 1) DIV cap; one row.
    "binpack_fragmentation_audit" -> { (s, d) =>
      val cap = 1024L
      val docs = Tables.documents(s, d)
        .select(col("source"), col("n_chars"))
      val bySrc = docs.groupBy("source")
        .agg(sum("n_chars").as("sc"))
        .agg(count(lit(1)).as("n_sources"),
          sum(expr(s"(sc + $cap - 1) DIV $cap")).as("per_source_packs"))
      val glob = docs.agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          sum(when(col("n_chars") > cap / 2, 1L).otherwise(0L))
            .as("big_items"),
          sum(when(col("n_chars") > cap / 2, lit(cap) - col("n_chars"))
            .otherwise(0L)).as("big_free"),
          sum(when(col("n_chars") <= cap / 2, col("n_chars"))
            .otherwise(0L)).as("small_mass"))
        .withColumn("l1", expr(s"(total_chars + $cap - 1) DIV $cap"))
        .withColumn("l2", col("big_items") +
          expr(s"(greatest(0L, small_mass - big_free) + $cap - 1) DIV $cap"))
      glob.crossJoin(broadcast(bySrc))
        .select(col("n_docs"), col("total_chars"), col("l1"),
          col("big_items"), col("l2"), col("n_sources"),
          col("per_source_packs"),
          (col("per_source_packs") - col("l1"))
            .as("fragmentation_extra_packs"))
    },


    // Madow systematic PPS sampling: exactly k=100 draws, inclusion
    // proportional to n_chars, via equally-spaced thresholds
    // t_j = (2j+1)·W/2k walked through the cumulative-weight line —
    // multiplicity of doc i is c(W_i) − c(W_{i−1}) with
    // c(x) = clamp((2k·x + W − 1) DIV 2W, 0, k), pure integer floors
    // (Σ multiplicities = k by construction — the exact-size guarantee
    // Bernoulli weighted sampling can't give). The cumulative window
    // runs over doc METADATA (id, chars); oversized docs (w > W/k)
    // surface as multiplicity > 1 rather than silently capping.
    "pps_systematic_sample" -> { (s, d) =>
      val k = 100L
      // cumulative-weight line via RangeRank (doc metadata is corpus-
      // sized — the r13 growth audit measured the old global window at
      // 10× rows-in for 10× data)
      val docs = graft.ops.RangeRank.withGlobalPrefix(
          Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
          Seq(col("doc_id")), "n_chars", "__pos", "wcum")
        .drop("__pos")
      val tot = docs.agg(max("wcum").as("w"))
      docs.crossJoin(broadcast(tot))
        .withColumn("c_hi", expr(
          s"least($k, greatest(0L, (2 * $k * wcum + w - 1) DIV (2 * w)))"))
        .withColumn("c_lo", expr(s"least($k, greatest(0L, " +
          s"(2 * $k * (wcum - n_chars) + w - 1) DIV (2 * w)))"))
        .withColumn("multiplicity", col("c_hi") - col("c_lo"))
        .filter(col("multiplicity") >= 1)
        .select(col("doc_id"), col("n_chars"), col("multiplicity"))
        .orderBy("doc_id")
    },


    // Train/test contamination under two split designs on the SAME
    // near-dup pair graph: a 90/10 hash split vs a 90/10 id-order
    // (temporal proxy) split — crossing pairs are test examples whose
    // near-duplicate sits in train, i.e. silent eval inflation. The
    // point of the comparison: random splitting scatters duplicate
    // clusters across the boundary while an order-correlated split
    // keeps them together (near-dups have nearby ids in this corpus).
    "split_leakage_comparison" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val pairs = Dedup.minhashExactPairs(docs, "text", "doc_id",
        k = 16, bands = 8, shingleN = 3, threshold = 0.8)
      val mx = docs.agg(max("doc_id").as("mx"))
      def randTrain(c: Column): Column =
        (c * 2654435761L % 4294967296L % 1000000L) < 900000L
      pairs.crossJoin(broadcast(mx))
        .select(
          (randTrain(col("id1")) =!= randTrain(col("id2")))
            .as("cross_random"),
          ((col("id1") * 10 < (col("mx") + 1) * 9) =!=
            (col("id2") * 10 < (col("mx") + 1) * 9)).as("cross_temporal"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("cross_random"), 1L).otherwise(0L))
            .as("random_crossing"),
          sum(when(col("cross_temporal"), 1L).otherwise(0L))
            .as("temporal_crossing"))
        .withColumn("random_leak_permille",
          expr("(1000 * random_crossing) DIV n_pairs"))
        .withColumn("temporal_leak_permille",
          expr("(1000 * temporal_crossing) DIV n_pairs"))
    },


    // Budget-constrained curation as FRACTIONAL knapsack (greedy by
    // value density is provably optimal for the LP relaxation — the
    // optimality certificate ships with the answer): maximize distinct-
    // token value under a 10%-of-corpus character budget. Density
    // ordering uses one IEEE quotient per doc (deterministic); sums and
    // the fractional tail stay integer (milli for the split item). The
    // cumulative window runs over doc metadata, and the LP bound =
    // greedy value means any integer packer can be audited against
    // this exact ceiling.
    "budget_curation_knapsack" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars"),
          size(array_distinct(Dedup.tokens(col("text")))).cast("long")
            .as("v"))
      val budget = docs.agg((sum("n_chars")).as("tc"),
          count(lit(1)).as("n_docs"))
        .select(col("n_docs"), expr("tc DIV 10").as("budget_chars"))
      // cumulative chars down the density order via RangeRank (doc
      // metadata is corpus-sized — r13 growth audit: 10× rows-in at 10×
      // data through the old global window); the density sort key is
      // one deterministic IEEE quotient, materialized so the range
      // exchange and the local window order on the identical value
      val ordered = graft.ops.RangeRank.withGlobalPrefix(
          docs.withColumn("__dens",
            col("v").cast("double") / col("n_chars")),
          Seq(desc("__dens"), col("doc_id")), "n_chars", "__pos", "cum")
        .drop("__pos", "__dens")
        .crossJoin(broadcast(budget))
      val full = ordered.filter(col("cum") <= col("budget_chars"))
        .agg(count(lit(1)).as("n_selected_full"),
          sum("v").as("full_value"), sum("n_chars").as("full_chars"))
      // aggregate form so a budget landing exactly on an item boundary
      // (no fractional row) still yields one output row, not zero
      val frac = ordered
        .filter(col("cum") - col("n_chars") < col("budget_chars") &&
          col("cum") > col("budget_chars"))
        .agg(coalesce(min("doc_id"), lit(-1L)).as("frac_doc_id"),
          coalesce(min(expr("""(1000 * v * (budget_chars - (cum - n_chars)))
            DIV n_chars""")), lit(0L)).as("frac_value_milli"))
      budget.crossJoin(broadcast(full))
        .crossJoin(broadcast(frac))
        .select(col("n_docs"), col("budget_chars"),
          col("n_selected_full"), col("full_value"), col("full_chars"),
          col("frac_doc_id"), col("frac_value_milli"),
          (col("full_value") * 1000 + col("frac_value_milli"))
            .as("lp_bound_milli"))
    },


    // Approximate-query-processing error audit: a deterministic 10%
    // hash sample, scaled ×10, against exact per-type counts — the
    // per-group permille error is what a sample-based dashboard
    // silently carries, and it varies BY GROUP (small groups err
    // more), which the per-type rows make visible.
    "sample_scale_error_audit" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          (expr("(event_id * 2654435761) % 4294967296 % 10") === 0)
            .as("in_sample"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("exact_n"),
          sum(when(col("in_sample"), 1L).otherwise(0L)).as("sample_n"))
        .withColumn("scaled_n", col("sample_n") * 10)
        .withColumn("err_permille",
          expr("(1000 * abs(scaled_n - exact_n)) DIV exact_n"))
        .orderBy("event_type")
    },


    // Deterministic stratified sampling with exact largest-remainder
    // quotas: a 200-doc budget allocated per language proportionally
    // (floor + the remainder ranking for the leftover units — the
    // apportionment rule, no float weights), members chosen by keyed
    // md5 order so the sample is reproducible and engine-independent.
    // The quota table is strata-sized and broadcast; the per-stratum
    // rank is one window over each stratum — the training-data
    // subsampling primitive at any corpus scale.
    "stratified_sample_quota" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_l"))
      val q = counts
        .crossJoin(broadcast(counts.agg(sum("n_l").as("n"))))
        .withColumn("base", expr("(200 * n_l) DIV n"))
        .withColumn("rem", expr("(200 * n_l) % n"))
      val quotas = q
        .crossJoin(broadcast(q.agg((lit(200L) - sum("base")).as("extra"))))
        .withColumn("rk", row_number().over(
          Window.orderBy(desc("rem"), col("lang"))).cast("long"))
        .withColumn("quota",
          col("base") + when(col("rk") <= col("extra"), 1L).otherwise(0L))
        .select("lang", "quota")
      docs.join(broadcast(quotas), "lang")
        .withColumn("hk", graft.ops.Dedup.md5Hash64(
          concat(lit("smp|"), col("doc_id")))
          .bitwiseAND(lit(Long.MaxValue)))
        .withColumn("sample_rank", row_number().over(
          Window.partitionBy("lang").orderBy("hk", "doc_id")).cast("long"))
        .filter(col("sample_rank") <= col("quota"))
        .select("lang", "sample_rank", "doc_id")
        .orderBy("lang", "sample_rank")
    }
  )

  protected def samplingOracles: Map[String, String] = Map(

    // Same keyed-hash rank, first 3 per language.
    "sample_k_per_group" ->
      """SELECT lang, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY (doc_id * 2654435761) % 4294967296 % 1000000,
        |               doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 3 ORDER BY lang, doc_id""".stripMargin,


    // The sample_split hash on user_id instead of the row id.
    "group_split_leakfree" ->
      """WITH s AS (
        |  SELECT user_id, event_id,
        |    CASE WHEN b < 800000 THEN 'train'
        |         WHEN b < 900000 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT user_id, event_id,
        |          (user_id * 2654435761) % 4294967296 % 1000000 AS b
        |        FROM events))
        |SELECT split, count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events,
        |  CAST(sum(event_id) AS BIGINT) AS sum_event_id
        |FROM s GROUP BY split ORDER BY split""".stripMargin,


    // Knuth multiplicative hash, reduced mod 1e6 — exact BIGINT arithmetic
    // in both engines (doc_id * 2654435761 stays far below 2^63).
    "sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE (doc_id * 2654435761) % 4294967296 % 1000000 <
        |  CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 200000
        |       ELSE 100000 END
        |ORDER BY doc_id""".stripMargin,


    // The same Knuth hash against the integer weight cutoff.
    "sample_weighted" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE (doc_id * 2654435761) % 4294967296 % 1000000 <
        |  least(1000000, n_chars * 2000)
        |ORDER BY doc_id""".stripMargin,


    // Cutoffs from exact counts: sqrt/sum/min over a handful of source
    // rows agree across engines far inside the 1e-6 cutoff granularity;
    // the per-row decision is the same exact integer hash as
    // sample_stratified.
    "mix_temperature_sample" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents
        |           GROUP BY lang),
        |t AS (SELECT lang, n, pow(n, 0.5) AS w FROM c),
        |s AS (SELECT sum(w) AS sw FROM t),
        |r AS (SELECT lang, n, w / sw AS share FROM t CROSS JOIN s),
        |ts AS (SELECT min(n / share) AS tstar FROM r),
        |p AS (SELECT lang,
        |        CAST(round(least(1.0, share * tstar / n) * 1000000) AS BIGINT)
        |          AS cutoff
        |      FROM r CROSS JOIN ts)
        |SELECT d.doc_id, d.source, d.lang
        |FROM documents d JOIN p USING (lang)
        |WHERE (doc_id * 2654435761) % 4294967296 % 1000000 < cutoff
        |ORDER BY doc_id""".stripMargin,


    "sample_split" ->
      """SELECT doc_id,
        |  CASE WHEN b < 800000 THEN 'train'
        |       WHEN b < 900000 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |        (doc_id * 2654435761) % 4294967296 % 1000000 AS b
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,


    // Same split hash; distinct (split, 8-gram string) rows then one
    // self-join per unordered split pair.
    "split_contamination_matrix" ->
      """WITH sp AS (
        |  SELECT doc_id, text,
        |    CASE WHEN b < 800000 THEN 'train'
        |         WHEN b < 900000 THEN 'val' ELSE 'test' END AS split
        |  FROM (SELECT doc_id, text,
        |          (doc_id * 2654435761) % 4294967296 % 1000000 AS b
        |        FROM documents WHERE doc_id < 1024)),
        |g AS (
        |  SELECT DISTINCT split, g FROM (
        |    SELECT split,
        |      unnest(list_distinct([array_to_string(s[i:i+7], ' ')
        |                            for i in range(1, len(s) - 6)])) AS g
        |    FROM (SELECT split, regexp_split_to_array(
        |            trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ')
        |            AS s
        |          FROM sp))),
        |tot AS (SELECT split, count(*) AS n FROM g GROUP BY 1)
        |SELECT a.split AS split_a, b.split AS split_b,
        |  count(*) AS n_shared_grams,
        |  CAST(max(ta.n) AS BIGINT) AS n_grams_a,
        |  CAST(max(tb.n) AS BIGINT) AS n_grams_b
        |FROM g a JOIN g b ON a.g = b.g AND a.split < b.split
        |JOIN tot ta ON ta.split = a.split
        |JOIN tot tb ON tb.split = b.split
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // The token count mirrors text_stats; pack id is an exclusive running
    // sum over id order — integer arithmetic end to end.
    "pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CASE WHEN len(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        |  FROM t)
        |SELECT doc_id, n_tokens, CAST(off // 2048 AS INT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin,


    // md5_number_upper is the established twin of md5Hash64; mod 16 is a
    // power of two, so the unsigned % equals the signed pmod.
    "shard_manifest" ->
      """SELECT CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) % 16 AS INT)
        |    AS shard,
        |  count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(doc_id) AS BIGINT) AS id_checksum,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM documents GROUP BY 1 ORDER BY shard""".stripMargin,


    // Same histogram + prefix sums; the micro-unit floor-division argmin
    // with the smallest-threshold tiebreak is engine-independent.
    "gini_best_split" ->
      """WITH hist AS (
        |  SELECT n_chars,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS neg
        |  FROM documents GROUP BY 1),
        |cum AS (
        |  SELECT n_chars AS threshold,
        |    CAST(sum(pos) OVER (ORDER BY n_chars) AS BIGINT) AS l_pos,
        |    CAST(sum(neg) OVER (ORDER BY n_chars) AS BIGINT) AS l_neg
        |  FROM hist),
        |tot AS (
        |  SELECT CAST(sum(pos) AS BIGINT) AS t_pos,
        |    CAST(sum(neg) AS BIGINT) AS t_neg
        |  FROM hist),
        |c AS (
        |  SELECT threshold, l_pos + l_neg AS l_n, l_pos,
        |    (t_pos - l_pos) + (t_neg - l_neg) AS r_n,
        |    t_pos - l_pos AS r_pos
        |  FROM cum CROSS JOIN tot
        |  WHERE l_pos + l_neg < t_pos + t_neg)
        |SELECT threshold, l_n, l_pos, r_n, r_pos,
        |  l_pos * (l_n - l_pos) * 1000000 // l_n +
        |  r_pos * (r_n - r_pos) * 1000000 // r_n AS gini_micro
        |FROM c ORDER BY gini_micro, threshold LIMIT 1""".stripMargin,


    // Exclusive prefix mass over the length histogram; floor quartiles.
    "curriculum_phases" ->
      """WITH hist AS (
        |  SELECT n_chars, count(*) AS c, n_chars * count(*) AS mass
        |  FROM documents GROUP BY 1),
        |cum AS (
        |  SELECT n_chars, c, mass,
        |    CAST(coalesce(sum(mass) OVER (ORDER BY n_chars
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS cum_excl
        |  FROM hist),
        |tot AS (SELECT CAST(sum(mass) AS BIGINT) AS total_mass FROM hist)
        |SELECT cum_excl * 4 // total_mass AS phase,
        |  CAST(sum(c) AS BIGINT) AS n_docs,
        |  CAST(sum(mass) AS BIGINT) AS sum_chars,
        |  min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM cum CROSS JOIN tot
        |GROUP BY 1 ORDER BY phase""".stripMargin,


    // Same day-histogram cutoff, embargo window, and gap invariant.
    "temporal_split_embargo" ->
      """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        |h AS (SELECT day, count(*) AS c FROM ev GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM ev),
        |cut AS (
        |  SELECT min(CASE WHEN cum >= (n*7+9)//10 THEN day END)
        |    AS train_end
        |  FROM (SELECT day, sum(c) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |    FROM h) CROSS JOIN nn),
        |tagged AS (
        |  SELECT user_id, day,
        |    CASE WHEN day <= train_end THEN 'train'
        |         WHEN day <= train_end + 7 THEN 'embargo'
        |         ELSE 'val' END AS split
        |  FROM ev CROSS JOIN cut),
        |ok AS (
        |  SELECT date_diff('day',
        |      max(CASE WHEN split = 'train' THEN day END),
        |      min(CASE WHEN split = 'val' THEN day END)) >= 8
        |    AS embargo_ok
        |  FROM tagged)
        |SELECT split, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users,
        |  strftime(min(day), '%Y-%m-%d') AS first_day,
        |  strftime(max(day), '%Y-%m-%d') AS last_day, embargo_ok
        |FROM tagged CROSS JOIN ok
        |GROUP BY 1, 6 ORDER BY split""".stripMargin,


    // Same integer permille shares and effect formulas.
    "mix_shift_decomposition" ->
      """WITH ev AS (
        |  SELECT event_type, ts < TIMESTAMP '2024-01-16' AS p1,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |bt AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN p1 THEN cents ELSE 0 END) AS BIGINT)
        |      AS rev_p1,
        |    CAST(sum(CASE WHEN NOT p1 THEN cents ELSE 0 END) AS BIGINT)
        |      AS rev_p2
        |  FROM ev GROUP BY 1),
        |tot AS (SELECT CAST(sum(rev_p1) AS BIGINT) AS t1,
        |          CAST(sum(rev_p2) AS BIGINT) AS t2 FROM bt)
        |SELECT event_type, rev_p1, rev_p2,
        |  rev_p1 * 1000 // t1 AS share_p1_permille,
        |  rev_p2 * 1000 // t2 AS share_p2_permille,
        |  (rev_p2 * 1000 // t2 - rev_p1 * 1000 // t1) * t1 // 1000
        |    AS mix_effect_cents,
        |  (rev_p1 * 1000 // t1) * (t2 - t1) // 1000
        |    AS growth_effect_cents
        |FROM bt CROSS JOIN tot ORDER BY event_type""".stripMargin,


    // Same rank-assigned replication factors; exact class totals.
    "oversample_minority" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
        |t AS (SELECT max(n) AS target FROM c),
        |r AS (SELECT doc_id, lang,
        |        row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rk
        |      FROM documents)
        |SELECT r.doc_id, r.lang,
        |  unnest(generate_series(1, t.target // c.n +
        |    CASE WHEN r.rk <= t.target % c.n THEN 1 ELSE 0 END)) AS copy_id
        |FROM r JOIN c USING (lang) CROSS JOIN t
        |ORDER BY lang, doc_id, copy_id""".stripMargin,


    // Same masked-md5 index draws; ranks 5/195 of 200 resample sums.
    "bootstrap_ci_daily_revenue" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |idx AS (SELECT cents, row_number() OVER (ORDER BY day) - 1 AS i
        |        FROM daily),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
        |draws AS (
        |  SELECT b.b, CAST((md5_number_upper('bs|' || b.b || '|' || j.j)
        |    & 9223372036854775807) % nd.n_days AS BIGINT) AS pick
        |  FROM range(200) b(b), range(30) j(j), nd),
        |sums AS (SELECT d.b, CAST(sum(i.cents) AS BIGINT) AS resample_cents
        |  FROM draws d JOIN idx i ON i.i = d.pick GROUP BY 1),
        |r AS (SELECT resample_cents,
        |      row_number() OVER (ORDER BY resample_cents, b) AS rk FROM sums)
        |SELECT nd.n_days, CAST(200 AS BIGINT) AS n_resamples,
        |  (SELECT resample_cents FROM r WHERE rk = 5) AS ci_lo_cents,
        |  (SELECT resample_cents FROM r WHERE rk = 195) AS ci_hi_cents,
        |  (SELECT CAST(sum(cents) AS BIGINT) FROM daily) AS observed_cents
        |FROM nd""".stripMargin,


    // Same exact burn units and prefix sums.
    "slo_error_budget_burn" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_total,
        |    count(*) FILTER (event_type = 'error') AS n_err
        |  FROM events GROUP BY 1),
        |c AS (SELECT day, n_total, n_err,
        |  CAST(sum(n_err) OVER (ORDER BY day) AS BIGINT) AS cum_err,
        |  CAST(sum(n_total) OVER (ORDER BY day) AS BIGINT) AS cum_total
        |  FROM d)
        |SELECT strftime(day, '%Y-%m-%d') AS day,
        |  CAST(n_total AS BIGINT) AS n_total, CAST(n_err AS BIGINT) AS n_err,
        |  CAST(n_err * 100000 // n_total AS BIGINT) AS burn_permille,
        |  CAST(cum_err * 100000 // cum_total AS BIGINT)
        |    AS cum_burn_permille
        |FROM c ORDER BY day""".stripMargin,


    // Same hash arms, quintile strata, rank-to-rank pairing.
    "matched_pairs_stratified" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events GROUP BY 1),
        |v AS (SELECT user_id, cents,
        |  CAST((md5_number_upper('m|' || user_id) & 9223372036854775807) % 2
        |       AS BIGINT) AS treat,
        |  ntile(5) OVER (ORDER BY cents, user_id) AS stratum FROM u),
        |r AS (SELECT *, row_number() OVER (PARTITION BY stratum, treat
        |        ORDER BY user_id) AS rk FROM v)
        |SELECT t.stratum, count(*) AS n_pairs,
        |  CAST(sum(t.cents - c.cents) AS BIGINT) AS sum_outcome_diff,
        |  CAST(sum(t.user_id + c.user_id) AS BIGINT) AS pair_checksum
        |FROM r t JOIN r c ON t.stratum = c.stratum AND t.rk = c.rk
        |  AND t.treat = 1 AND c.treat = 0
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // INDEPENDENT formulation: QUALIFY row_number picks per extreme
    // (the engine side uses lexicographic struct min/max aggregates).
    "m4_downsample" ->
      """WITH e AS (
        |  SELECT event_type,
        |    ((epoch_us(ts) - min(epoch_us(ts)) OVER ()) * 64)
        |      // (max(epoch_us(ts)) OVER () - min(epoch_us(ts)) OVER ()
        |         + 1) AS bucket,
        |    epoch_us(ts) AS eus,
        |    CAST(floor(value * 100) AS BIGINT) AS cents, event_id
        |  FROM events),
        |g AS (SELECT event_type, bucket, count(*) AS n,
        |    min(cents) AS min_v, max(cents) AS max_v
        |  FROM e GROUP BY 1, 2),
        |fv AS (SELECT event_type, bucket, cents AS first_v FROM e
        |  QUALIFY row_number() OVER (PARTITION BY event_type, bucket
        |    ORDER BY eus, event_id) = 1),
        |lv AS (SELECT event_type, bucket, cents AS last_v FROM e
        |  QUALIFY row_number() OVER (PARTITION BY event_type, bucket
        |    ORDER BY eus DESC, event_id DESC) = 1),
        |tmin AS (SELECT event_type, bucket, eus AS ts_of_min_us FROM e
        |  QUALIFY row_number() OVER (PARTITION BY event_type, bucket
        |    ORDER BY cents, eus, event_id) = 1),
        |tmax AS (SELECT event_type, bucket, eus AS ts_of_max_us FROM e
        |  QUALIFY row_number() OVER (PARTITION BY event_type, bucket
        |    ORDER BY cents DESC, eus DESC, event_id DESC) = 1)
        |SELECT g.event_type, g.bucket, n, min_v, max_v, first_v, last_v,
        |  ts_of_min_us, ts_of_max_us
        |FROM g
        |JOIN fv USING (event_type, bucket)
        |JOIN lv USING (event_type, bucket)
        |JOIN tmin USING (event_type, bucket)
        |JOIN tmax USING (event_type, bucket)
        |ORDER BY 1, 2""".stripMargin,


    // Same closed-form bounds.
    "binpack_fragmentation_audit" ->
      """WITH g AS (
        |  SELECT count(*) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |    CAST(sum(CASE WHEN n_chars > 512 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS big_items,
        |    CAST(sum(CASE WHEN n_chars > 512 THEN 1024 - n_chars
        |      ELSE 0 END) AS BIGINT) AS big_free,
        |    CAST(sum(CASE WHEN n_chars <= 512 THEN n_chars ELSE 0 END)
        |      AS BIGINT) AS small_mass
        |  FROM documents),
        |ps AS (
        |  SELECT count(*) AS n_sources,
        |    CAST(sum((sc + 1023) // 1024) AS BIGINT) AS per_source_packs
        |  FROM (SELECT source, CAST(sum(n_chars) AS BIGINT) AS sc
        |        FROM documents GROUP BY 1))
        |SELECT n_docs, total_chars, (total_chars + 1023) // 1024 AS l1,
        |  big_items,
        |  big_items + (greatest(0, small_mass - big_free) + 1023) // 1024
        |    AS l2,
        |  n_sources, per_source_packs,
        |  per_source_packs - (total_chars + 1023) // 1024
        |    AS fragmentation_extra_packs
        |FROM g CROSS JOIN ps""".stripMargin,


    // Same integer threshold-walk multiplicities.
    "pps_systematic_sample" ->
      """WITH dcs AS (
        |  SELECT doc_id, n_chars,
        |    CAST(sum(n_chars) OVER (ORDER BY doc_id) AS BIGINT) AS wcum
        |  FROM documents),
        |w AS (SELECT max(wcum) AS w FROM dcs),
        |sel AS (
        |  SELECT doc_id, n_chars,
        |    least(100, greatest(0, (200 * wcum + w.w - 1) // (2 * w.w)))
        |    - least(100, greatest(0,
        |        (200 * (wcum - n_chars) + w.w - 1) // (2 * w.w)))
        |      AS multiplicity
        |  FROM dcs CROSS JOIN w)
        |SELECT doc_id, n_chars, multiplicity FROM sel
        |WHERE multiplicity >= 1 ORDER BY doc_id""".stripMargin,


    // Gold pairs from the all-pairs closure; same split formulas.
    "split_leakage_comparison" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
        |                   for i in range(1, len(s) - 1)]) AS sh
        |  FROM (SELECT doc_id, regexp_split_to_array(
        |          trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS s
        |        FROM documents)),
        |p AS (
        |  SELECT a.doc_id AS id1, b.doc_id AS id2,
        |    len(list_intersect(a.sh, b.sh))::DOUBLE /
        |      len(list_distinct(list_concat(a.sh, b.sh))) AS j
        |  FROM t a JOIN t b ON a.doc_id < b.doc_id),
        |e2 AS (SELECT id1, id2 FROM p WHERE j >= 0.8),
        |mx AS (SELECT max(doc_id) AS mx FROM documents),
        |cl AS (SELECT
        |    ((id1 * 2654435761 % 4294967296 % 1000000) < 900000)
        |      <> ((id2 * 2654435761 % 4294967296 % 1000000) < 900000)
        |      AS cross_random,
        |    (id1 * 10 < (mx + 1) * 9) <> (id2 * 10 < (mx + 1) * 9)
        |      AS cross_temporal
        |  FROM e2 CROSS JOIN mx)
        |SELECT count(*) AS n_pairs,
        |  CAST(sum(CASE WHEN cross_random THEN 1 ELSE 0 END) AS BIGINT)
        |    AS random_crossing,
        |  CAST(sum(CASE WHEN cross_temporal THEN 1 ELSE 0 END) AS BIGINT)
        |    AS temporal_crossing,
        |  (1000 * CAST(sum(CASE WHEN cross_random THEN 1 ELSE 0 END)
        |    AS BIGINT)) // count(*) AS random_leak_permille,
        |  (1000 * CAST(sum(CASE WHEN cross_temporal THEN 1 ELSE 0 END)
        |    AS BIGINT)) // count(*) AS temporal_leak_permille
        |FROM cl""".stripMargin,


    // Same density order, boundary-robust aggregate fractional tail.
    "budget_curation_knapsack" ->
      """WITH dv AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(list_distinct(string_split(trim(regexp_replace(
        |      lower(text), '\s+', ' ', 'g')), ' '))) AS BIGINT) AS v
        |  FROM documents),
        |b AS (SELECT count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) // 10 AS budget_chars FROM dv),
        |o AS (SELECT doc_id, n_chars, v,
        |    CAST(sum(n_chars) OVER (ORDER BY CAST(v AS DOUBLE) / n_chars
        |      DESC, doc_id) AS BIGINT) AS cum
        |  FROM dv),
        |f AS (SELECT count(*) AS n_selected_full,
        |    CAST(sum(v) AS BIGINT) AS full_value,
        |    CAST(sum(n_chars) AS BIGINT) AS full_chars
        |  FROM o CROSS JOIN b WHERE cum <= budget_chars),
        |fr AS (SELECT coalesce(min(doc_id), -1) AS frac_doc_id,
        |    coalesce(min((1000 * v * (budget_chars - (cum - n_chars)))
        |      // n_chars), 0) AS frac_value_milli
        |  FROM o CROSS JOIN b
        |  WHERE cum - n_chars < budget_chars AND cum > budget_chars)
        |SELECT b.n_docs, b.budget_chars, f.n_selected_full, f.full_value,
        |  f.full_chars, fr.frac_doc_id, fr.frac_value_milli,
        |  CAST(f.full_value * 1000 + fr.frac_value_milli AS BIGINT)
        |    AS lp_bound_milli
        |FROM b CROSS JOIN f CROSS JOIN fr""".stripMargin,


    // Same hash sample and scaling.
    "sample_scale_error_audit" ->
      """SELECT event_type, count(*) AS exact_n,
        |  CAST(sum(CASE WHEN (event_id * 2654435761) % 4294967296 % 10
        |    = 0 THEN 1 ELSE 0 END) AS BIGINT) AS sample_n,
        |  CAST(sum(CASE WHEN (event_id * 2654435761) % 4294967296 % 10
        |    = 0 THEN 1 ELSE 0 END) AS BIGINT) * 10 AS scaled_n,
        |  (1000 * abs(CAST(sum(CASE WHEN (event_id * 2654435761)
        |    % 4294967296 % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) * 10
        |    - count(*))) // count(*) AS err_permille
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,


    // Same largest-remainder quotas and keyed-md5 member order.
    "stratified_sample_quota" ->
      """WITH c AS (SELECT lang, count(*) AS n_l FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_l) AS BIGINT) AS n FROM c),
        |q AS (SELECT lang, (200 * n_l) // n AS base, (200 * n_l) % n
        |        AS rem FROM c, t),
        |e AS (SELECT CAST(200 - sum(base) AS BIGINT) AS extra FROM q),
        |qq AS (SELECT lang,
        |  base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
        |    <= extra THEN 1 ELSE 0 END AS quota FROM q, e),
        |h AS (SELECT d.lang, d.doc_id, qq.quota,
        |    CAST(md5_number_upper('smp|' || d.doc_id)
        |      & 9223372036854775807 AS BIGINT) AS hk
        |  FROM documents d JOIN qq USING (lang)),
        |r AS (SELECT lang, doc_id, quota,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY hk, doc_id)
        |      AS BIGINT) AS sample_rank
        |  FROM h)
        |SELECT lang, sample_rank, doc_id FROM r WHERE sample_rank <= quota
        |ORDER BY lang, sample_rank""".stripMargin
  )
}
