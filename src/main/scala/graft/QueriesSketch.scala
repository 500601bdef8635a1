package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, Dedup, IntervalJoin, QualityGates, Resample,
  Sessionize, Similarity, TextAnalysis, Watermark}
import graft.pipeline.Bucketing
import graft.time.{RolloverCalendar, SessionCalendar}

/** Sketch family queries + DuckDB oracles (split from the
  * monolithic SparkEntry in round 12; entry bodies unchanged). */
private[graft] trait QueriesSketch extends QueryShared {

  protected def sketchQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Data profiling (the ANALYZE pass a catalog runs before planning):
    // per-column null counts, exact distinct cardinalities, and min/max
    // rendered as strings — in ONE scan of the table. The five exact
    // distincts share a single Expand-based aggregate (row multiplication
    // ×|columns|, still one pass over 100 TB, and each is map-side
    // partially aggregated); the per-column rows come from a stack()
    // unpivot of the 1-row aggregate, not five scans.
    "table_profile" -> { (s, d) =>
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val statCols = cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"),
        countDistinct(col(c)).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c")))
      val one = Tables.documents(s, d)
        .agg(count(lit(1)).as("n_rows"), statCols: _*)
      val stackArgs = cols
        .map(c => s"'$c', n_rows, nulls_$c, nd_$c, min_$c, max_$c")
        .mkString(", ")
      one.selectExpr(s"stack(${cols.length}, $stackArgs) AS " +
          "(col_name, n_rows, n_nulls, n_distinct, min_str, max_str)")
        .orderBy("col_name")
    },


    // Equi-width histogram (the profiling/optimizer statistic): 10 bins
    // per event type over a global [floor(min), ceil(max)] range — the
    // 1-row range broadcast makes binning a per-row expression, and the
    // bin arithmetic runs on identical doubles in any engine (floor of
    // the same quotient), so the integer counts match exactly.
    "value_histogram" -> { (s, d) =>
      val ev = Tables.events(s, d).select(col("event_type"), col("value"))
      val rng = ev.agg(floor(min(col("value"))).cast("double").as("lo"),
        ceil(max(col("value"))).cast("double").as("hi"))
      ev.crossJoin(broadcast(rng))
        .withColumn("bin", least(
          floor((col("value") - col("lo")) / ((col("hi") - col("lo")) / 10)),
          lit(9L)))
        .groupBy("event_type", "bin").agg(count(lit(1)).as("n"))
        .orderBy("event_type", "bin")
    },


    // Count-min sketch heavy hitters: token frequencies summarized into a
    // 4×512 integer sketch, the top-10 exact heavy hitters point-queried
    // against it. The sketch never under-counts (over_ok) and the excess
    // stays inside 2N/w (bound_ok) — both re-asserted by the oracle,
    // which rebuilds the identical sketch from the md5 bucket hash. One
    // corpus token exchange; everything downstream is vocabulary- or
    // sketch-sized; at 100 TB the sketch is the shippable summary
    // (mergeable cell-wise across partitions and days).
    "countmin_heavy_hitters" -> { (s, d) =>
      val (w, dRows) = (512, 4)
      val toks = Tables.documents(s, d)
        .select(explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
        .filter(col("token") =!= "")
        .groupBy("token").agg(count(lit(1)).as("n"))
      val tot = toks.agg(sum(col("n")).as("big_n"))
      val sk = graft.ops.CountMin.sketch(toks, "token", "n", w, dRows)
      val top = toks.orderBy(desc("n"), asc("token")).limit(10)
      graft.ops.CountMin.estimate(top, sk, "token", w, dRows)
        .crossJoin(broadcast(tot))
        .select(col("token"), col("n"), col("est"),
          (col("est") >= col("n")).as("over_ok"),
          ((col("est") - col("n")) * w <= col("big_n") * 2).as("bound_ok"))
        .orderBy("token")
    },


    // Matryoshka-prefix retrieval audit (Kusupati et al. 2022): how much
    // of the exact full-dimension top-10 survives when ranking by only
    // the FIRST 16 of 64 dimensions — the truncation a matryoshka-
    // trained index exploits for cheap first-stage retrieval. Both arms
    // are exact brute force over the same broadcast query set (one
    // corpus scan computes both cosines); the emitted overlap@10 per
    // query is the measured truncation cost.
    "matryoshka_prefix_overlap" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val qs = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val scored = emb.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          Similarity.cosine(col("embedding"), col("qv")).as("cf"),
          Similarity.cosine(slice(col("embedding"), 1, 16),
            slice(col("qv"), 1, 16)).as("cp"))
        .cache() // both rankings read the same scored frame
      def top10(c: Column) = scored
        .withColumn("rank", row_number().over(
          Window.partitionBy("query_id").orderBy(c.desc, col("vec_id"))))
        .filter(col("rank") <= 10)
        .select("query_id", "vec_id")
      top10(col("cf")).join(top10(col("cp")), Seq("query_id", "vec_id"),
          "left_semi")
        .groupBy("query_id")
        .agg(count(lit(1)).as("overlap_at_10"))
        .orderBy("query_id")
    },


    // Approximate percentile sketch, made oracle-checkable via its error
    // bound: approx_percentile(accuracy=1000) guarantees the returned
    // element's RANK is within the Greenwald-Khanna error of the target
    // rank q·n. The sketch works in INTEGER ranks, so the usable bound is
    // ⌈eps·n⌉ (+1 for the target's own ceil-rounding), not the real-valued
    // eps·n — measured: deviation exactly 2 at n=1982 where eps·n=1.982.
    // The query verifies the guarantee against the data itself — the
    // returned value's feasible rank interval [count(<v)+1, count(<=v)]
    // must intersect [q·n − slack, q·n + slack] — and emits the boolean;
    // the oracle computes the same exact counts and asserts TRUE, so a
    // sketch drifting out of spec hash-mismatches. (The approx VALUES stay
    // engine-specific and are not emitted.)
    "approx_quantiles" -> { (s, d) =>
      val eps = 1.0 / 1000
      val ap = Tables.events(s, d).groupBy(col("event_type"))
        .agg(approx_percentile(col("value"), lit(0.5), lit(1000)).as("ap50"),
          approx_percentile(col("value"), lit(0.9), lit(1000)).as("ap90"))
      def okAt(q: Double, v: Column) = {
        // count(value), not count(*): approx_percentile ignores NULLs, so
        // the rank target q·n must be computed over the non-null
        // population (the lt/le sums already are — a NULL comparison falls
        // to the otherwise-0 branch). With count(*) a null-bearing column
        // would shift the target and falsely flip the bound booleans.
        val n = count(col("value"))
        val slack = ceil(n * eps) + 1
        val lt = sum(when(col("value") < v, 1L).otherwise(0L))
        val le = sum(when(col("value") <= v, 1L).otherwise(0L))
        (lt + 1 <= lit(q) * n + slack) && (le >= lit(q) * n - slack)
      }
      Tables.events(s, d).join(broadcast(ap), "event_type")
        .groupBy(col("event_type"))
        .agg(count(col("value")).as("n"),
          okAt(0.5, col("ap50")).as("ok_p50"),
          okAt(0.9, col("ap90")).as("ok_p90"))
        .orderBy("event_type")
    },


    // Bloom-pruned semi join: identical result to the plain EXISTS (the
    // bloom admits only false positives; the exact join removes them) —
    // the probe side is filtered by might_contain BEFORE its shuffle.
    "bloom_semi_join" -> { (s, d) =>
      graft.ops.BloomJoin.semiJoin(
          Tables.lineitem(s, d),
          Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          "l_orderkey", "o_orderkey",
          expectedItems = 65536L, numBits = 1L << 20)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double")
            .as("sum_qty"))
        .orderBy("l_returnflag")
    },


    // HLL++ approximate distinct, made oracle-checkable via its error
    // bound: approx_count_distinct runs at rsd = 0.05 (the default), so
    // the estimate sits within 3·rsd = 15% of the exact count with
    // overwhelming probability — and deterministically for a fixed
    // dataset, which is what the driver re-checks. The exact count (a
    // second aggregation the oracle reproduces) and the bound boolean are
    // emitted; the HLL estimate itself stays engine-specific.
    "events_hll_users" -> { (s, d) =>
      Tables.events(s, d).groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          approx_count_distinct(col("user_id"), 0.05).as("__approx"))
        .select(col("event_type"), col("n_users"),
          (abs(col("__approx") - col("n_users")) <=
            lit(0.15) * col("n_users")).as("within_3rsd"))
        .orderBy("event_type")
    },


    // Anti-entropy table diff — per-day-partition order-insensitive
    // checksums (Merkle-style leaf level) between `events` and a replica
    // with planted divergence (rows dropped at event_id%997=3, value
    // corrupted at %997=5). Row hash = md5Hash64 mod 2⁴⁴ over the typed
    // payload (power-of-two modulus: signed pmod ≡ DuckDB's unsigned —
    // the kfold_assign identity), so a day's checksum is a plain BIGINT
    // sum: each side is one scan + one day-sized aggregate, and only
    // mismatching partitions would need re-sync. Payload hashes
    // cents = floor(100·value) — never a double rendered to string.
    "table_checksum_diff" -> { (s, d) =>
      val ev = Tables.events(s, d).select(col("event_id"),
        to_date(col("ts")).as("day"), floor(col("value") * 100).as("cents"))
      def side(df: DataFrame) = df.groupBy("day")
        .agg(count(lit(1)).as("n"),
          sum(pmod(Dedup.md5Hash64(concat_ws("|",
            col("event_id"), col("cents"))), lit(17592186044416L))).as("chk"))
      val src = side(ev)
      val dst = side(ev.filter(col("event_id") % 997 =!= 3)
        .withColumn("cents", when(col("event_id") % 997 === 5,
          col("cents") + 1).otherwise(col("cents"))))
      src.join(dst.withColumnRenamed("n", "n_dst")
          .withColumnRenamed("chk", "chk_dst"), Seq("day"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n").as("n_src"), col("n_dst"),
          (col("chk") === col("chk_dst")).as("chk_match"))
        .orderBy("day")
    },


    // Cross-source overlap triage via per-source KMV sketches over the
    // 3-shingle domain: before paying for a cross-corpus near-dup join
    // at 100 TB, estimate every source pair's shingle-set union size and
    // Jaccard from CONSTANT per-source state — the k smallest md5
    // values of each source's distinct shingle set (one linear scan;
    // row_number() <= k plans a WindowGroupLimit, so every map task
    // prunes to its own k before the exchange, and the sketches are
    // exactly mergeable across shards/days per QuantileSketchSpec).
    // Pair math then runs on 20 sketches of 64 hashes: the merged
    // bottom-k's k-th value θ gives |A∪B| ≈ (k−1)·2⁶³/θ (switching to
    // the exact count when the union sketch is exhaustive), and the
    // fraction of merged-sketch elements present in BOTH sketches
    // estimates Jaccard (Beyer et al., SIGMOD'07). This is the number
    // dataset cards quote ("crawl B is x% of crawl A") and the gate that
    // decides which corpus pairs are worth a full cross-dedup. Integer
    // outputs only: DECIMAL(38,0) intermediates, integral DIV.
    "source_overlap_kmv" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val k = 64
      val sh = Tables.documents(s, d)
        .repartition(shuffleWidth(s), col("doc_id"))
        .select(col("source"),
          explode(Dedup.shingles(col("text"), 3)).as("g"))
        .select(col("source"), Dedup.md5Hash64(col("g"))
          .bitwiseAND(lit(Long.MaxValue)).as("h"))
        .distinct()
      // h is distinct within source, so it is its own tiebreak.
      val sk = graft.ops.QuantileSketch.bottomK(
        sh, Seq(col("source")), col("h"), col("h"), k)
        .localCheckpoint() // 20×64 rows; pair math never re-scans text
      val srcs = sk.select("source").distinct()
      val pr = srcs.select(col("source").as("src_a"))
        .crossJoin(broadcast(srcs.select(col("source").as("src_b"))))
        .filter(col("src_a") < col("src_b"))
      val ea = pr.join(sk.withColumnRenamed("source", "src_a"), Seq("src_a"))
        .select(col("src_a"), col("src_b"), col("h"),
          lit(1L).as("in_a"), lit(0L).as("in_b"))
      val eb = pr.join(sk.withColumnRenamed("source", "src_b"), Seq("src_b"))
        .select(col("src_a"), col("src_b"), col("h"),
          lit(0L).as("in_a"), lit(1L).as("in_b"))
      val merged = ea.unionByName(eb)
        .groupBy("src_a", "src_b", "h")
        .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("src_a", "src_b").orderBy("h")))
        .filter(col("rk") <= k)
      merged.groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n_sk"), max("h").as("theta"),
          sum(col("in_a") * col("in_b")).as("n_both"))
        .withColumn("est_union", expr(
          s"CASE WHEN n_sk < $k THEN n_sk ELSE " +
            "CAST((CAST(n_sk AS DECIMAL(38,0)) - 1) * 9223372036854775807" +
            " DIV theta AS BIGINT) END"))
        .withColumn("est_jaccard_permille",
          expr("(1000 * n_both) DIV n_sk"))
        .withColumn("est_common", expr(
          "CAST(CAST(n_both AS DECIMAL(38,0)) * est_union DIV n_sk" +
            " AS BIGINT)"))
        .select("src_a", "src_b", "n_sk", "theta", "n_both",
          "est_union", "est_jaccard_permille", "est_common")
        .orderBy("src_a", "src_b")
    },


    // Cross-table referential-integrity audit — the DQ gate every
    // warehouse load runs: orphaned fact keys per FK edge via LEFT ANTI
    // joins (which Spark plans as broadcast/shuffled hash anti —
    // never a full materialized join), one report row per edge. At
    // 100 TB each check is one key-partitioned anti join; the report
    // is edge-count-sized.
    "dq_referential_integrity" -> { (s, d) =>
      def chk(name: String, orphans: DataFrame) = orphans
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("fk_edge"), col("n_orphans"),
          (col("n_orphans") === 0L).as("ok"))
      chk("lineitem.l_orderkey->orders",
          Tables.lineitem(s, d).select("l_orderkey")
            .join(Tables.orders(s, d).select("o_orderkey"),
              col("l_orderkey") === col("o_orderkey"), "left_anti"))
        .unionByName(chk("orders.o_custkey->customer",
          Tables.orders(s, d).select("o_custkey")
            .join(Tables.customer(s, d).select("c_custkey"),
              col("o_custkey") === col("c_custkey"), "left_anti")))
        .unionByName(chk("supplier.s_nationkey->nation",
          Tables.supplier(s, d).select("s_nationkey")
            .join(Tables.nation(s, d).select("n_nationkey"),
              col("s_nationkey") === col("n_nationkey"), "left_anti")))
        .unionByName(chk("customer.c_nationkey->nation",
          Tables.customer(s, d).select("c_nationkey")
            .join(Tables.nation(s, d).select("n_nationkey"),
              col("c_nationkey") === col("n_nationkey"), "left_anti")))
        .orderBy("fk_edge")
    },


    // Bloom-filter false-positive audit with PORTABLE hashing: members
    // (nationkey < 5 customers) set k=3 md5-derived bits in an m=4096
    // space; every non-member probes the same 3 positions and a probe
    // matching all three is a FALSE POSITIVE — counted exactly, so the
    // measured FPR is driver-checkable (unlike an opaque library sketch;
    // the bloom_semi_join query covers Spark's native filter). Bits and
    // probes are equality joins on the bit position — the sketch itself
    // is |bits| rows, broadcast-sized, the 100 TB probe side streams.
    "bloom_fpr_audit" -> { (s, d) =>
      val md5h: Column => Column = graft.ops.Dedup.md5Hash64
      val cust = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_nationkey"))
      val members = cust.filter(col("c_nationkey") < 5).select("k")
      val probes = cust.filter(col("c_nationkey") >= 5).select("k")
      def bitsOf(df: DataFrame) = df
        .withColumn("h", explode(expr("sequence(0, 2)")))
        .withColumn("bit",
          md5h(concat(col("h"), lit("|"), col("k"))).bitwiseAND(lit(4095L)))
      val bits = bitsOf(members).select("bit").distinct()
      val hits = bitsOf(probes).join(bits, "bit")
        .groupBy("k").agg(count(lit(1)).as("nhit"))
      members.agg(count(lit(1)).as("n_members"))
        .crossJoin(bits.agg(count(lit(1)).as("n_bits_set")))
        .crossJoin(probes.agg(count(lit(1)).as("n_probes")))
        .crossJoin(hits.agg(sum(when(col("nhit") === 3, 1L).otherwise(0L))
          .as("n_false_positives")))
    },


    // Audience overlap matrix: distinct shared users for every ordered
    // event-type pair (the diagonal is each audience's size) — the ads
    // / segmentation overlap report, from ONE distinct (type, user)
    // projection self-joined on the user key. |types|² cells.
    "audience_overlap_matrix" -> { (s, d) =>
      val tu = Tables.events(s, d)
        .select(col("event_type"), col("user_id")).distinct().cache()
      tu.select(col("event_type").as("type_a"), col("user_id"))
        .join(tu.select(col("event_type").as("type_b"), col("user_id")),
          "user_id")
        .groupBy("type_a", "type_b")
        .agg(count(lit(1)).as("n_shared_users"))
        .orderBy("type_a", "type_b")
    },


    // Two-sided-geometric (discrete Laplace) noise mechanism, harness
    // form: noise = tz(h₁) − tz(h₂) where tz counts trailing zero bits
    // of keyed md5 draws — tz is geometric(1/2) exactly, and the
    // difference of two geometrics IS the discrete Laplace (Ghosh et
    // al., STOC 2009). Deterministic per key so the MECHANISM is
    // hash-checkable (production DP would swap in fresh randomness;
    // the transform, sensitivity bookkeeping, and post-processing
    // pipeline are what this pins). tz via h & −h (lowest set bit)
    // then binary-string length − 1 — no loops, no floats.
    "dp_geometric_noise_histogram" -> { (s, d) =>
      val md5h: Column => Column = graft.ops.Dedup.md5Hash64
      def tz(seed: String): Column = {
        val h = md5h(concat(lit(seed), col("n_name")))
          .bitwiseAND(lit(Long.MaxValue))
        (length(conv(h.bitwiseAND(-h), 10, 2)) - 1).cast("long")
      }
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("true_count"))
        .withColumn("noise", tz("dp1|") - tz("dp2|"))
        .select(col("n_name"), col("true_count"), col("noise"),
          (col("true_count") + col("noise")).as("noisy_count"))
        .orderBy("n_name")
    },


    // Exact 1-Wasserstein (earth mover's) distance between every pair
    // of event-type value distributions over a shared 64-bucket
    // histogram, cross-multiplied to integers: EMD·N_a·N_b =
    // Σ_buckets |CDF_a·N_b − CDF_b·N_a| (bucket-width units). The
    // dense per-type grid is mandatory — a missing bucket row would
    // silently skip its |ΔCDF| term. The distributional-drift metric
    // that KS's max-gap understates; 10 pair rows, integer permille.
    "wasserstein_histogram_exact" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .select(col("event_type"), floor(col("value") * 100).as("cents"))
      val span = ev.agg(min("cents").as("lo"), max("cents").as("hi"))
      val hist = ev.crossJoin(broadcast(span))
        .withColumn("bucket",
          expr("((cents - lo) * 64) DIV (hi - lo + 1)"))
        .groupBy("event_type", "bucket").agg(count(lit(1)).as("cnt"))
      val grid = hist.select("event_type").distinct()
        .crossJoin(broadcast(s.range(64).select(col("id").as("bucket"))))
        .join(hist, Seq("event_type", "bucket"), "left")
        .select(col("event_type"), col("bucket"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
        .withColumn("cdf", sum("cnt").over(Window
          .partitionBy("event_type").orderBy("bucket")))
      val tot = grid.groupBy("event_type").agg(sum("cnt").as("ntot"))
      val g = grid.join(tot, "event_type")
      g.select(col("event_type").as("type_a"), col("bucket"),
          col("cdf").as("ca"), col("ntot").as("na"))
        .join(g.select(col("event_type").as("type_b"), col("bucket"),
          col("cdf").as("cb"), col("ntot").as("nb")), Seq("bucket"))
        .filter(col("type_a") < col("type_b"))
        .filter(col("bucket") < 63)
        .groupBy("type_a", "type_b")
        .agg(first("na").as("n_a"), first("nb").as("n_b"),
          sum(abs(col("ca") * col("nb") - col("cb") * col("na")))
            .as("emd_num"))
        .withColumn("emd_den", col("n_a") * col("n_b"))
        .withColumn("emd_milli_buckets",
          expr("(1000 * emd_num) DIV emd_den"))
        .orderBy("type_a", "type_b")
    },


    // Freedman-Diaconis bin width per event type, fully integer: IQR
    // from nearest-rank quartiles, ∛n as the LARGEST k with k³ ≤ n
    // (argmax over a literal k-range — no floating pow, whose rounding
    // differs across engines), width = max(1, 2·IQR DIV ∛n), bin count
    // from the exact value range. The histogram-sizing rule every
    // auto-binning chart needs, emitted as auditable components.
    "fd_histogram_binwidth" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 100).as("cents"))
      val stats = ev.groupBy("event_type").agg(count(lit(1)).as("n"),
        min("cents").as("lo"), max("cents").as("hi"))
      val ranked = ev.withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("cents", "event_id")))
      def at(pct: Int, out: String) = ranked
        .join(broadcast(stats.select(col("event_type"),
          expr(s"($pct * n + 99) DIV 100").as("k"))), "event_type")
        .filter(col("rn") === col("k"))
        .select(col("event_type"), col("cents").as(out))
      val icbrt = stats.crossJoin(broadcast(
          s.range(1, 100).select(col("id").as("k"))))
        .filter(col("k") * col("k") * col("k") <= col("n"))
        .groupBy("event_type").agg(max("k").as("icbrt"))
      stats.join(at(25, "q25"), "event_type")
        .join(at(75, "q75"), "event_type")
        .join(icbrt, "event_type")
        .withColumn("iqr", col("q75") - col("q25"))
        .withColumn("fd_width_cents",
          expr("greatest(1L, (2 * iqr) DIV icbrt)"))
        .withColumn("n_bins",
          expr("(hi - lo) DIV fd_width_cents + 1"))
        .select("event_type", "n", "q25", "q75", "iqr", "icbrt",
          "fd_width_cents", "n_bins")
        .orderBy("event_type")
    },


    // Histogram-based self-join cardinality estimate vs ground truth:
    // the optimizer technique (per-bucket count products under a
    // within-bucket uniformity assumption, est_b = c_b² DIV ndv_b)
    // scored against the exact Σc(k)² — the gap IS the skew the
    // uniformity assumption hides. Everything from ONE key-domain
    // aggregate; the "join size" never runs a join.
    "histogram_selfjoin_estimate" -> { (s, d) =>
      val keys = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("k")).agg(count(lit(1)).as("c"))
      val span = keys.agg(min("k").as("lo"), max("k").as("hi"))
      val exact = keys.agg(sum(col("c") * col("c")).as("actual_pairs"),
        count(lit(1)).as("n_keys"))
      val est = keys.crossJoin(broadcast(span))
        .withColumn("bucket", expr("((k - lo) * 64) DIV (hi - lo + 1)"))
        .groupBy("bucket")
        .agg(sum("c").as("cb"), count(lit(1)).as("ndv"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(expr("(cb * cb) DIV ndv")).as("est_pairs"))
      exact.crossJoin(broadcast(est))
        .select(col("n_keys"), col("n_buckets"), col("actual_pairs"),
          col("est_pairs"),
          expr("(1000 * abs(est_pairs - actual_pairs)) DIV actual_pairs")
            .as("err_permille"))
    },


    // Lincoln-Petersen capture-recapture: estimate the user population
    // from two day "captures" (first and last day) and their overlap —
    // N̂ = n₁·n₂/m — against the true distinct count the estimator
    // never sees. The mark-recapture arithmetic behind dark-pool /
    // coverage estimation, exact integers end to end.
    "capture_recapture_users" -> { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val span = ud.agg(min("day").as("d1"), max("day").as("d2"))
      val tagged = ud.crossJoin(broadcast(span))
      val s1 = tagged.filter(col("day") === col("d1"))
        .select("user_id").distinct()
      val s2 = tagged.filter(col("day") === col("d2"))
        .select("user_id").distinct()
      val m = s1.join(s2, "user_id").agg(count(lit(1)).as("m"))
      s1.agg(count(lit(1)).as("n1"))
        .crossJoin(broadcast(s2.agg(count(lit(1)).as("n2"))))
        .crossJoin(broadcast(m))
        .crossJoin(broadcast(ud.select("user_id").distinct()
          .agg(count(lit(1)).as("true_n"))))
        .withColumn("estimated_n", expr("(n1 * n2) DIV m"))
        .withColumn("err_permille",
          expr("(1000 * abs(estimated_n - true_n)) DIV true_n"))
    }
  )

  protected def sketchOracles: Map[String, String] = Map(

    // One UNION arm per column, same native-type min/max rendered as
    // text; every statistic is integer- or string-exact.
    "table_profile" ->
      """SELECT * FROM (
        |  SELECT 'doc_id' AS col_name, count(*) AS n_rows,
        |    CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_nulls,
        |    count(DISTINCT doc_id) AS n_distinct,
        |    CAST(min(doc_id) AS VARCHAR) AS min_str,
        |    CAST(max(doc_id) AS VARCHAR) AS max_str FROM documents
        |  UNION ALL
        |  SELECT 'text', count(*),
        |    CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT text), min(text), max(text) FROM documents
        |  UNION ALL
        |  SELECT 'lang', count(*),
        |    CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT lang), min(lang), max(lang) FROM documents
        |  UNION ALL
        |  SELECT 'source', count(*),
        |    CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT source), min(source), max(source) FROM documents
        |  UNION ALL
        |  SELECT 'n_chars', count(*),
        |    CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT n_chars),
        |    CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
        |  FROM documents)
        |ORDER BY col_name""".stripMargin,


    // Identical global range and bin quotient (floor of the same double).
    "value_histogram" ->
      """WITH rng AS (
        |  SELECT CAST(floor(min(value)) AS DOUBLE) AS lo,
        |         CAST(ceil(max(value)) AS DOUBLE) AS hi FROM events)
        |SELECT event_type,
        |  CAST(least(floor((value - lo) / ((hi - lo) / 10)), 9) AS BIGINT)
        |    AS bin,
        |  count(*) AS n
        |FROM events, rng GROUP BY event_type, bin
        |ORDER BY event_type, bin""".stripMargin,


    // Identical sketch rebuild: md5_number_upper % 512 is the same
    // low-9-bit reduction as the signed pmod (512 divides 2^64), so every
    // cell, estimate, and bound boolean matches bit-for-bit.
    "countmin_heavy_hitters" ->
      """WITH tok AS (
        |  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
        |    AS token FROM documents),
        |tc AS (SELECT token, count(*) AS n FROM tok
        |       WHERE token <> '' GROUP BY token),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS big_n FROM tc),
        |coords AS (
        |  SELECT token, n, t.r,
        |    CAST(md5_number_upper(CAST(t.r AS VARCHAR) || '|' || token)
        |         % 512 AS BIGINT) AS bucket
        |  FROM tc, range(0, 4) t(r)),
        |sk AS (SELECT r, bucket, CAST(sum(n) AS BIGINT) AS cell
        |       FROM coords GROUP BY r, bucket),
        |top AS (SELECT token FROM tc ORDER BY n DESC, token LIMIT 10),
        |est AS (
        |  SELECT c.token, c.n, min(s.cell) AS est
        |  FROM coords c JOIN sk s ON c.r = s.r AND c.bucket = s.bucket
        |  WHERE c.token IN (SELECT token FROM top)
        |  GROUP BY c.token, c.n)
        |SELECT token, n, est, est >= n AS over_ok,
        |  (est - n) * 512 <= 2 * big_n AS bound_ok
        |FROM est, tot ORDER BY token""".stripMargin,


    // Both exact rankings from one scored set; overlap of the two
    // top-10 membership sets per query.
    "matryoshka_prefix_overlap" ->
      """WITH q AS (
        |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        |  WHERE vec_id < 10),
        |s AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_sum([e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE
        |              for i in range(1, len(e.embedding) + 1)]) /
        |    (sqrt(list_sum([e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE
        |                    for i in range(1, len(e.embedding) + 1)])) *
        |     sqrt(list_sum([q.qv[i]::DOUBLE * q.qv[i]::DOUBLE
        |                    for i in range(1, len(q.qv) + 1)]))) AS cf,
        |    list_sum([e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE
        |              for i in range(1, 17)]) /
        |    (sqrt(list_sum([e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE
        |                    for i in range(1, 17)])) *
        |     sqrt(list_sum([q.qv[i]::DOUBLE * q.qv[i]::DOUBLE
        |                    for i in range(1, 17)]))) AS cp
        |  FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
        |rf AS (SELECT query_id, vec_id, row_number() OVER (
        |         PARTITION BY query_id ORDER BY cf DESC, vec_id) AS r
        |       FROM s),
        |rp AS (SELECT query_id, vec_id, row_number() OVER (
        |         PARTITION BY query_id ORDER BY cp DESC, vec_id) AS r
        |       FROM s)
        |SELECT rf.query_id AS query_id, count(*) AS overlap_at_10
        |FROM rf JOIN rp ON rf.query_id = rp.query_id
        |  AND rf.vec_id = rp.vec_id
        |WHERE rf.r <= 10 AND rp.r <= 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // The sketch queries oracle their ERROR BOUND, not the estimate: the
    // Spark side verifies the guarantee against exact counts it computes
    // itself and emits a boolean; the oracle recomputes the exact side and
    // asserts the boolean is TRUE. A sketch drifting out of its spec'd
    // bound therefore hash-mismatches, while the engine-specific estimate
    // values never cross engines.
    "approx_quantiles" ->
      """SELECT event_type, count(value) AS n, true AS ok_p50, true AS ok_p90
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,


    // The bloom prune is invisible in the result: plain EXISTS oracle.
    "bloom_semi_join" ->
      """SELECT l_returnflag, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_orderkey = lineitem.l_orderkey
        |                AND o.o_orderpriority = '1-URGENT')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,


    "events_hll_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  true AS within_3rsd
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,


    // md5_number_upper IS the Spark side's md5Hash64 (simhash-twin
    // identity); % 2^44 matches signed pmod at a power-of-two modulus.
    "table_checksum_diff" ->
      """WITH base AS (
        |  SELECT event_id, CAST(ts AS DATE) AS day,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |hs AS (
        |  SELECT day, count(*) AS n_src,
        |    CAST(sum(md5_number_upper(CAST(event_id AS VARCHAR) || '|' ||
        |      CAST(cents AS VARCHAR)) % 17592186044416) AS BIGINT) AS chk
        |  FROM base GROUP BY 1),
        |repl AS (
        |  SELECT event_id, day,
        |    CASE WHEN event_id % 997 = 5 THEN cents + 1 ELSE cents END
        |      AS cents
        |  FROM base WHERE event_id % 997 <> 3),
        |hd AS (
        |  SELECT day, count(*) AS n_dst,
        |    CAST(sum(md5_number_upper(CAST(event_id AS VARCHAR) || '|' ||
        |      CAST(cents AS VARCHAR)) % 17592186044416) AS BIGINT)
        |      AS chk_dst
        |  FROM repl GROUP BY 1)
        |SELECT strftime(hs.day, '%Y-%m-%d') AS day, hs.n_src, hd.n_dst,
        |  hs.chk = hd.chk_dst AS chk_match
        |FROM hs JOIN hd USING (day) ORDER BY day""".stripMargin,


    // Same per-source bottom-64 sketches and pair estimators, re-derived
    // from scratch (md5_number_upper masked = md5Hash64; HUGEINT
    // intermediates // = the Spark DECIMAL(38,0) DIV).
    "source_overlap_kmv" ->
      """WITH sh AS (
        |  SELECT DISTINCT source,
        |    CAST(md5_number_upper(g) & 9223372036854775807 AS BIGINT) AS h
        |  FROM (
        |    SELECT source, unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
        |                           for i in range(1, len(s) - 1)]) AS g
        |    FROM (SELECT source, regexp_split_to_array(
        |            trim(lower(regexp_replace(text, '\s+', ' ', 'g'))),
        |            ' ') AS s
        |          FROM documents))),
        |sk AS (
        |  SELECT source, h FROM (
        |    SELECT source, h,
        |      row_number() OVER (PARTITION BY source ORDER BY h) AS rk
        |    FROM sh) WHERE rk <= 64),
        |srcs AS (SELECT DISTINCT source FROM sk),
        |pr AS (SELECT a.source AS src_a, b.source AS src_b
        |       FROM srcs a, srcs b WHERE a.source < b.source),
        |u AS (
        |  SELECT src_a, src_b, h, max(in_a) AS in_a, max(in_b) AS in_b
        |  FROM (
        |    SELECT pr.src_a, pr.src_b, sk.h, 1 AS in_a, 0 AS in_b
        |    FROM pr JOIN sk ON sk.source = pr.src_a
        |    UNION ALL
        |    SELECT pr.src_a, pr.src_b, sk.h, 0 AS in_a, 1 AS in_b
        |    FROM pr JOIN sk ON sk.source = pr.src_b)
        |  GROUP BY 1, 2, 3),
        |m AS (
        |  SELECT src_a, src_b, h, in_a, in_b,
        |    row_number() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rk
        |  FROM u)
        |SELECT src_a, src_b,
        |  CAST(count(*) AS BIGINT) AS n_sk,
        |  CAST(max(h) AS BIGINT) AS theta,
        |  CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
        |  CAST(CASE WHEN count(*) < 64 THEN count(*)
        |       ELSE (CAST(count(*) AS HUGEINT) - 1)
        |            * 9223372036854775807 // max(h)
        |       END AS BIGINT) AS est_union,
        |  CAST((1000 * sum(in_a * in_b)) // count(*) AS BIGINT)
        |    AS est_jaccard_permille,
        |  CAST(CAST(sum(in_a * in_b) AS HUGEINT) *
        |       (CASE WHEN count(*) < 64 THEN count(*)
        |        ELSE (CAST(count(*) AS HUGEINT) - 1)
        |             * 9223372036854775807 // max(h)
        |        END) // count(*) AS BIGINT) AS est_common
        |FROM m WHERE rk <= 64 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // Anti-join orphan counts per FK edge.
    "dq_referential_integrity" ->
      """SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
        |  count(*) AS n_orphans, count(*) = 0 AS ok
        |FROM lineitem l WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'orders.o_custkey->customer', count(*), count(*) = 0
        |FROM orders o WHERE NOT EXISTS (
        |  SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'supplier.s_nationkey->nation', count(*), count(*) = 0
        |FROM supplier s WHERE NOT EXISTS (
        |  SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)
        |UNION ALL
        |SELECT 'customer.c_nationkey->nation', count(*), count(*) = 0
        |FROM customer c WHERE NOT EXISTS (
        |  SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
        |ORDER BY fk_edge""".stripMargin,


    // Same md5-derived k=3 / m=4096 positions; FP = all three bits set.
    "bloom_fpr_audit" ->
      """WITH members AS (SELECT c_custkey AS k FROM customer
        |                 WHERE c_nationkey < 5),
        |probes AS (SELECT c_custkey AS k FROM customer
        |           WHERE c_nationkey >= 5),
        |bits AS (SELECT DISTINCT
        |    CAST(md5_number_upper(h.h || '|' || m.k) & 4095 AS BIGINT) AS bit
        |  FROM members m, range(3) h(h)),
        |hits AS (
        |  SELECT p.k, count(*) AS nhit
        |  FROM probes p, range(3) h(h)
        |  JOIN bits ON CAST(md5_number_upper(h.h || '|' || p.k) & 4095
        |               AS BIGINT) = bits.bit
        |  GROUP BY p.k)
        |SELECT (SELECT count(*) FROM members) AS n_members,
        |  (SELECT count(*) FROM bits) AS n_bits_set,
        |  (SELECT count(*) FROM probes) AS n_probes,
        |  CAST(count(*) FILTER (nhit = 3) AS BIGINT) AS n_false_positives
        |FROM hits""".stripMargin,


    // One distinct projection, self-joined on the user key.
    "audience_overlap_matrix" ->
      """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  count(*) AS n_shared_users
        |FROM tu a JOIN tu b ON a.user_id = b.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // Same keyed draws; tz via lowest-set-bit binary length.
    "dp_geometric_noise_histogram" ->
      """WITH c AS (SELECT n_name, count(*) AS true_count
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1),
        |h AS (SELECT n_name, true_count,
        |  CAST(md5_number_upper('dp1|' || n_name) & 9223372036854775807
        |       AS BIGINT) AS h1,
        |  CAST(md5_number_upper('dp2|' || n_name) & 9223372036854775807
        |       AS BIGINT) AS h2
        |  FROM c),
        |tz AS (SELECT n_name, true_count,
        |  CAST(length(printf('%b', h1 & (-h1))) - 1 AS BIGINT) AS t1,
        |  CAST(length(printf('%b', h2 & (-h2))) - 1 AS BIGINT) AS t2
        |  FROM h)
        |SELECT n_name, CAST(true_count AS BIGINT) AS true_count,
        |  t1 - t2 AS noise,
        |  CAST(true_count + t1 - t2 AS BIGINT) AS noisy_count
        |FROM tz ORDER BY n_name""".stripMargin,


    // Same dense-grid CDF cross-multiplication.
    "wasserstein_histogram_exact" ->
      """WITH e AS (
        |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |sp AS (SELECT min(cents) AS lo, max(cents) AS hi FROM e),
        |h AS (
        |  SELECT event_type, ((cents - lo) * 64) // (hi - lo + 1)
        |      AS bucket, count(*) AS cnt
        |  FROM e CROSS JOIN sp GROUP BY 1, 2),
        |grid AS (
        |  SELECT t.event_type, g.bucket, coalesce(h.cnt, 0) AS cnt
        |  FROM (SELECT DISTINCT event_type FROM e) t
        |  CROSS JOIN (SELECT unnest(range(0, 64)) AS bucket) g
        |  LEFT JOIN h ON h.event_type = t.event_type
        |    AND h.bucket = g.bucket),
        |cd AS (SELECT event_type, bucket,
        |  CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket)
        |    AS BIGINT) AS cdf FROM grid),
        |tt AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS ntot
        |  FROM grid GROUP BY 1),
        |g2 AS (SELECT cd.event_type, cd.bucket, cd.cdf, tt.ntot
        |  FROM cd JOIN tt USING (event_type))
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  min(a.ntot) AS n_a, min(b.ntot) AS n_b,
        |  CAST(sum(abs(a.cdf * b.ntot - b.cdf * a.ntot)) AS BIGINT)
        |    AS emd_num,
        |  min(a.ntot) * min(b.ntot) AS emd_den,
        |  (1000 * CAST(sum(abs(a.cdf * b.ntot - b.cdf * a.ntot))
        |    AS BIGINT)) // (min(a.ntot) * min(b.ntot))
        |    AS emd_milli_buckets
        |FROM g2 a JOIN g2 b
        |  ON a.bucket = b.bucket AND a.event_type < b.event_type
        |WHERE a.bucket < 63
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // Same nearest-rank quartiles and literal-range cube root.
    "fd_histogram_binwidth" ->
      """WITH ev AS (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |st AS (SELECT event_type, count(*) AS n, min(cents) AS lo,
        |  max(cents) AS hi FROM ev GROUP BY 1),
        |rk AS (SELECT event_type, cents,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY cents, event_id) AS rn FROM ev),
        |q25 AS (SELECT rk.event_type, rk.cents AS q25
        |  FROM rk JOIN st USING (event_type)
        |  WHERE rk.rn = (25 * st.n + 99) // 100),
        |q75 AS (SELECT rk.event_type, rk.cents AS q75
        |  FROM rk JOIN st USING (event_type)
        |  WHERE rk.rn = (75 * st.n + 99) // 100),
        |ic AS (
        |  SELECT event_type, max(k.k) AS icbrt
        |  FROM st CROSS JOIN (SELECT unnest(range(1, 100)) AS k) k
        |  WHERE k.k * k.k * k.k <= st.n GROUP BY 1),
        |j AS (
        |  SELECT st.event_type, st.n, q25.q25, q75.q75,
        |    q75.q75 - q25.q25 AS iqr, ic.icbrt, st.lo, st.hi
        |  FROM st JOIN q25 USING (event_type)
        |  JOIN q75 USING (event_type) JOIN ic USING (event_type))
        |SELECT event_type, n, q25, q75, iqr, icbrt,
        |  greatest(1, (2 * iqr) // icbrt) AS fd_width_cents,
        |  (hi - lo) // greatest(1, (2 * iqr) // icbrt) + 1 AS n_bins
        |FROM j ORDER BY event_type""".stripMargin,


    // Same bucketed estimate against the exact count-product sum.
    "histogram_selfjoin_estimate" ->
      """WITH keys AS (
        |  SELECT l_partkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
        |sp AS (SELECT min(k) AS lo, max(k) AS hi FROM keys),
        |ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS actual_pairs,
        |  count(*) AS n_keys FROM keys),
        |bk AS (
        |  SELECT ((k - lo) * 64) // (hi - lo + 1) AS bucket,
        |    CAST(sum(c) AS BIGINT) AS cb, count(*) AS ndv
        |  FROM keys CROSS JOIN sp GROUP BY 1),
        |es AS (SELECT count(*) AS n_buckets,
        |  CAST(sum((cb * cb) // ndv) AS BIGINT) AS est_pairs FROM bk)
        |SELECT ex.n_keys, es.n_buckets, ex.actual_pairs, es.est_pairs,
        |  (1000 * abs(es.est_pairs - ex.actual_pairs)) // ex.actual_pairs
        |    AS err_permille
        |FROM ex CROSS JOIN es""".stripMargin,


    // Same two captures and estimator.
    "capture_recapture_users" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |sp AS (SELECT min(day) AS da, max(day) AS db FROM ud),
        |s1 AS (SELECT DISTINCT user_id FROM ud CROSS JOIN sp
        |  WHERE day = da),
        |s2 AS (SELECT DISTINCT user_id FROM ud CROSS JOIN sp
        |  WHERE day = db),
        |mm AS (SELECT count(*) AS m FROM s1 JOIN s2 USING (user_id)),
        |a AS (SELECT count(*) AS n1 FROM s1),
        |b AS (SELECT count(*) AS n2 FROM s2),
        |tt AS (SELECT count(DISTINCT user_id) AS true_n FROM ud)
        |SELECT a.n1, b.n2, mm.m, tt.true_n,
        |  (a.n1 * b.n2) // mm.m AS estimated_n,
        |  (1000 * abs((a.n1 * b.n2) // mm.m - tt.true_n)) // tt.true_n
        |    AS err_permille
        |FROM a CROSS JOIN b CROSS JOIN mm CROSS JOIN tt""".stripMargin
  )
}
