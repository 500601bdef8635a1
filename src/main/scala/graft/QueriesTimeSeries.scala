package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, Dedup, IntervalJoin, QualityGates, Resample,
  Sessionize, Similarity, TextAnalysis, Watermark}
import graft.pipeline.Bucketing
import graft.time.{RolloverCalendar, SessionCalendar}

/** TimeSeries family queries + DuckDB oracles (split from the
  * monolithic SparkEntry in round 12; entry bodies unchanged). */
private[graft] trait QueriesTimeSeries extends QueryShared {

  protected def timeSeriesQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1: 5-min OHLCV resample (closed-right, left-labeled), per event_type.
    "resample_5m_ohlcv" -> { (s, d) =>
      Resample.ohlcvFromTicks(Tables.events(s, d), "value", "5 minutes",
          keys = Seq(col("event_type")))
        .select(col("event_type"), tsStr(col("ts")).as("ts"),
          col("open"), col("high"), col("low"), col("close"), col("volume"))
        .orderBy("event_type", "ts")
    },


    // A2: 60-min resample with the day session's 45-minute phase offset.
    "resample_60m_offset45" -> { (s, d) =>
      Resample.ohlcvFromTicks(Tables.events(s, d), "value", "60 minutes",
          phase = "45 minutes", keys = Seq(col("event_type")))
        .select(col("event_type"), tsStr(col("ts")).as("ts"),
          col("open"), col("high"), col("low"), col("close"), col("volume"))
        .orderBy("event_type", "ts")
    },


    // A3: plain 60-min resample (no phase offset).
    "resample_60m" -> { (s, d) =>
      Resample.ohlcvFromTicks(Tables.events(s, d), "value", "60 minutes",
          keys = Seq(col("event_type")))
        .select(col("event_type"), tsStr(col("ts")).as("ts"),
          col("open"), col("high"), col("low"), col("close"), col("volume"))
        .orderBy("event_type", "ts")
    },


    // Dynamic partition pruning — the RUNTIME twin of
    // partitioned_pruned_read's planning-time prune: the qualifying
    // event types come from a SCAN-derived dimension (above-average
    // frequency — not a literal list, so no static filter exists to push
    // at planning time); DPP snapshots the broadcast dim's key set at
    // runtime and skips every non-matching partition DIRECTORY of the
    // fact table before reading it. At 100 TB this is the difference
    // between scanning two partitions and scanning all of them whenever
    // the filter arrives through a join instead of a WHERE literal.
    // PlanSpec pins the `dynamicpruning` subquery in the fact scan.
    "dpp_runtime_prune" -> { (s, d) =>
      val root = stagedDpp.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_dpp")
          Tables.events(s, d).write.partitionBy("event_type")
            .parquet(s"$tmp/t")
          // the dim is a real table (written once at staging, like any
          // warehouse dimension): per-type totals plus a frequency
          // rank — so the query-side predicate is `rk <= 2`, a
          // literal comparison over the dim SCAN. Both shape details
          // are load-bearing for DPP (measured — the rule declined
          // both alternatives): the filter must sit directly above a
          // scan (not above an aggregation subplan), and
          // isLikelySelective rejects a bare boolean attribute, so a
          // stored `qualifies` flag never triggers pruning while the
          // rank comparison does.
          import org.apache.spark.sql.expressions.Window
          Tables.events(s, d)
            .groupBy(col("event_type")).agg(count(lit(1)).as("type_total"))
            .withColumn("rk", row_number().over(
              Window.orderBy(desc("type_total"), col("event_type"))))
            .coalesce(1).write.parquet(s"$tmp/dim")
          tmp
        })
      val dim = s.read.parquet(s"$root/dim")
        .filter(col("rk") <= 2)
        .select(col("event_type"), col("type_total"))
      s.read.parquet(s"$root/t")
        .join(broadcast(dim), Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100).cast("long")).as("value_cents"),
          max(col("type_total")).as("type_total"))
        .orderBy("event_type")
    },


    // SCD2 validity intervals from an event log: each user's state
    // changes become [valid_from, valid_to) rows via lead(ts) over the
    // per-user order; the current state stays open (null valid_to). The
    // warehouse-standard "point-in-time reconstructable" layout — one
    // window pass, exchange keyed by user.
    "scd2_intervals" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("value"),
          col("ts"), col("event_id"))
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .select(col("user_id"), col("event_type"),
          round(col("value"), 6).as("value"),
          tsStr(col("ts")).as("valid_from"),
          tsStr(col("valid_to")).as("valid_to"),
          col("valid_to").isNull.as("is_current"))
        .orderBy("user_id", "valid_from", "event_type")
    },


    // Ordered conversion funnel: signup → first view strictly after the
    // signup → first purchase strictly after that view, per user. Each
    // step joins the previous step's first-event time on the same
    // user_id key and takes a conditional min — step frames shrink
    // monotonically, and every join is an equality join on the key.
    "funnel_conversion" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val t1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val t2 = ev.filter(col("event_type") === "view")
        .join(t1, "user_id").filter(col("ts") > col("t1"))
        .groupBy("user_id").agg(min(col("ts")).as("t2"))
      val t3 = ev.filter(col("event_type") === "purchase")
        .join(t2, "user_id").filter(col("ts") > col("t2"))
        .groupBy("user_id").agg(min(col("ts")).as("t3"))
      def step(name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(name).as("step"), col("n_users"))
      step("1_signup", t1)
        .unionByName(step("2_view_after_signup", t2))
        .unionByName(step("3_purchase_after_view", t3))
        .orderBy("step")
    },


    // Recency-weighted user features (time-decay aggregation — the
    // engagement-score shape): each event contributes value·2^-age_days,
    // decay floored at 10 days. The aggregate is EXACT integer
    // arithmetic end to end — cents × the power-of-two weight 2^(10-d) —
    // emitted in those integer units (score = units/102400.0 is a
    // client-side constant rescale; u/102400 has 12 fractional decimal
    // digits, so a rounded-double column would sit on round-tie
    // boundaries). Single map-side-combined user aggregate.
    "time_decay_features" -> { (s, d) =>
      val ref = lit("2024-01-31").cast("date")
      val ageD = least(greatest(
        datediff(ref, col("ts").cast("date")), lit(0)), lit(10))
      Tables.events(s, d)
        .withColumn("units",
          round(col("value") * 100).cast("long") *
            pow(lit(2), lit(10) - ageD).cast("long"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("units")).as("decay_units"))
        .orderBy("user_id")
    },


    // Unpivot/melt — the pivot inverse: OHLC bars reshaped to long form
    // (ts, metric, value), Spark's native unpivot operator.
    "unpivot_bars" -> { (s, d) =>
      Resample.ohlcvFromTicks(Tables.events(s, d), "value", "60 minutes",
          keys = Seq(col("event_type")))
        .select(col("event_type"), tsStr(col("ts")).as("ts"),
          col("open"), col("high"), col("low"), col("close"))
        .unpivot(Array(col("event_type"), col("ts")),
          Array(col("open"), col("high"), col("low"), col("close")),
          "metric", "value")
        .orderBy("event_type", "ts", "metric")
    },


    // U2 + C2: append the PREDICTED next contract row to a settle-config
    // dimension derived from orders months (rollover prediction: month+1,
    // third-Wednesday settle, start = prev settle + 5 min, accumulated
    // diff rolled forward; its own next_contract_diff unknown -> NULL).
    "union_predicted_contract" -> { (s, d) =>
      val cfg = Tables.orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyyMM").as("contract_year_month"))
        .agg(count(lit(1)).cast("double").as("next_contract_diff"),
          min(col("o_orderdate")).as("start_k"),
          max(col("o_orderdate")).as("settle_k"))
        .withColumn("accumulated_contract_diff", lit(100.0))
      RolloverCalendar.predictNext(cfg)
        .select(col("contract_year_month"), col("next_contract_diff"),
          col("accumulated_contract_diff"),
          tsStr(col("start_k")).as("start_k"), tsStr(col("settle_k")).as("settle_k"))
        .orderBy("contract_year_month")
    },


    // F-1: day-session time-of-day filter (08:45 <= tod <= 13:45, inclusive).
    "session_filter_day" -> { (s, d) =>
      Tables.events(s, d)
        .filter(SessionCalendar.isDay(col("ts")))
        .select(col("event_id"), tsStr(col("ts")).as("ts"),
          col("event_type"), col("value"))
        .orderBy("event_id")
    },


    // F-2: night-session filter, wraps midnight (tod >= 15:00 OR <= 05:00).
    "session_filter_night" -> { (s, d) =>
      Tables.events(s, d)
        .filter(SessionCalendar.isNight(col("ts")))
        .select(col("event_id"), tsStr(col("ts")).as("ts"),
          col("event_type"), col("value"))
        .orderBy("event_id")
    },


    // F1/F2: session id + yyMMdd-D/N labeling incl. pre-dawn attribution
    // to the previous day and the 14:xx UNKNOWN gap.
    "session_labels" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"), tsStr(col("ts")).as("ts"),
          SessionCalendar.sessionId(col("ts")).as("session_id"),
          SessionCalendar.marketType(col("ts")).as("market_type"))
        .orderBy("event_id")
    },


    // J1: broadcast interval join + back-adjustment (left outer, no-match
    // → diff 0 / empty contract id), lineitem probe vs monthly dimension.
    "interval_join_backadjust" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_shipdate").as("ts"), col("l_extendedprice").as("close"))
      IntervalJoin.leftJoin(li, monthDim(s, d),
          col("ts"), col("start_k"), col("settle_k"))
        .select(col("l_orderkey"), col("l_linenumber"), tsStr(col("ts")).as("ts"),
          coalesce(col("contract_year_month"), lit("")).as("contract_year_month"),
          round(col("close") +
            coalesce(col("accumulated_contract_diff"), lit(0.0)), 2).as("adj_close"))
        .orderBy("l_orderkey", "l_linenumber", "ts")
    },


    // S3+F-5 (Gate 2): watermark probe on a "sink" (orders) + strictly-newer
    // incremental filter on the fact table.
    "watermark_incremental" -> { (s, d) =>
      val wm = Watermark.maxTs(Tables.orders(s, d), "o_orderdate")
      Watermark.newerThan(Tables.lineitem(s, d), wm, "l_shipdate")
        .select(col("l_orderkey"), col("l_linenumber"),
          tsStr(col("l_shipdate")).as("ts"), col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber", "ts")
    },


    // U1: union of labeled day + night session frames, time-ordered.
    "union_sessions" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val day = ev.filter(SessionCalendar.isDay(col("ts")))
        .withColumn("market_type", lit("D"))
      val night = ev.filter(SessionCalendar.isNight(col("ts")))
        .withColumn("market_type", lit("N"))
      day.unionByName(night)
        .select(col("event_id"), tsStr(col("ts")).as("ts"),
          col("market_type"), col("value"))
        .orderBy("ts", "event_id")
    },


    // A6: running rollover total — prefix sum over the ordered dimension
    // (decimal-typed so the window accumulation is exact in both engines).
    "rollover_prefix_sum" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val monthly = Tables.orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyyMM").as("contract_year_month"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("month_diff"))
      val w = Window.orderBy("contract_year_month")
        .rowsBetween(Window.unboundedPreceding, -1)
      monthly
        .withColumn("accumulated_diff",
          coalesce(sum(col("month_diff")).over(w), lit(0).cast("decimal(18,2)")))
        .select(col("contract_year_month"),
          col("month_diff").cast("double").as("month_diff"),
          col("accumulated_diff").cast("double").as("accumulated_diff"))
        .orderBy("contract_year_month")
    },


    // Backward as-of join: each non-click event gets the user's most
    // recent click at-or-before it (trades/quotes shape; union +
    // last-ignoreNulls window — ONE shuffle by key, no range probe).
    "asof_join_clicks" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val trades = ev.filter(col("event_type") =!= "click")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val quotes = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"),
          col("value").as("quote_value"), col("event_id").as("quote_id"))
      // tieCols: if two quotes share (user_id, ts), the greater quote_id
      // wins deterministically (mirrored in the oracle's QUALIFY dedup).
      AsOfJoin.backward(trades, quotes, Seq("user_id"), "ts",
          Seq("quote_value", "quote_id"), tieCols = Seq("quote_id"))
        .select(col("event_id"), col("user_id"), tsStr(col("ts")).as("ts"),
          col("value"), col("quote_value"), col("quote_id"))
        .orderBy("event_id")
    },


    // Gap-based sessionization (30-min inactivity) per user.
    "sessionize_gap" -> { (s, d) =>
      Sessionize.sessions(Tables.events(s, d), Seq("user_id"), "ts",
          gapSeconds = 1800)
        .select(col("user_id"), col("session_idx"),
          tsStr(col("session_start")).as("session_start"),
          tsStr(col("session_end")).as("session_end"), col("n_events"))
        .orderBy("user_id", "session_idx")
    },


    // Gap filling: per event_type, the dense 5-minute close series between
    // first and last observation — missing buckets synthesized via
    // sequence+explode and forward-filled with the running last non-null.
    "resample_fill_forward" -> { (s, d) =>
      val base = Tables.events(s, d)
        .groupBy(col("event_type"),
          graft.ops.Resample.bucket(col("ts"), "5 minutes",
            closedRight = false).as("bts"))
        .agg(max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"))
      graft.ops.Resample.fillForward(base, Seq("event_type"), "bts",
          "5 MINUTES", Seq("close"))
        .select(col("event_type"), tsStr(col("bts")).as("ts"),
          col("close"), col("is_filled"))
        .orderBy("event_type", "ts")
    },


    // l-diversity audit — the companion governance gate to
    // k_anonymity_audit: a quasi-identifier bucket is risky not only
    // when it is SMALL but when all its rows trace to few distinct
    // sensitive values (here: distinct users behind an (event_type,
    // day, hour, value-decile) cell — the value decile keeps cells
    // sparse as row volume grows, so the audit stays meaningful at any
    // sf). Flags buckets with fewer than 3 distinct users. Single
    // aggregate; distinct-count partials combine map-side.
    "l_diversity_audit" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"),
          hour(col("ts")).as("hr"),
          floor(col("value") / 10).cast("long").as("value_bucket"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"))
        .filter(col("n_users") < 3)
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("hr"), col("value_bucket"), col("n"), col("n_users"))
        .orderBy("event_type", "day", "hr", "value_bucket")
    },


    // Signup→purchase conversion-delay quantiles per weekly cohort — the
    // time-to-convert funnel readout. Delays are exact epoch-millis
    // integers (the window_range_frame convention), quantiles are the
    // exact interpolated percentile over those integers (the
    // anomaly_mad convention: Spark percentile ≡ DuckDB quantile_cont,
    // bit-identical on integer inputs). Non-converters are counted but
    // excluded from the delay distribution.
    "convert_time_quantiles" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("signup_ts"))
      val firstP = su.join(
          ev.filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts").as("p_ts")), "user_id")
        .filter(col("p_ts") >= col("signup_ts"))
        .groupBy("user_id").agg(min("p_ts").as("first_p"))
      su.join(firstP, Seq("user_id"), "left")
        .select(
          floor(datediff(to_date(col("signup_ts")), lit("2024-01-01")) / 7)
            .cast("int").as("cohort_week"),
          (unix_millis(col("first_p").cast("timestamp_ltz")) -
            unix_millis(col("signup_ts").cast("timestamp_ltz")))
            .as("delay_ms"))
        .groupBy("cohort_week")
        .agg(count(lit(1)).as("n_signups"),
          count(col("delay_ms")).as("n_converted"),
          round(expr("percentile(delay_ms, 0.5)"), 6).as("med_delay_ms"),
          round(expr("percentile(delay_ms, 0.9)"), 6).as("p90_delay_ms"))
        .orderBy("cohort_week")
    },


    // FORWARD as-of join — "the next touch after each purchase" (did the
    // user come back?), the look-ahead twin of asof_join_clicks, driving
    // AsOfJoin.forward: the same one-shuffle union-window plan with the
    // frame reversed; equal timestamps do NOT match (strict bound). The
    // oracle recomputes with DuckDB's native ASOF on `p.ts < c.ts` — an
    // independent implementation — after the same (user, ts) tie dedup
    // (lowest id, the forward scan's first-met row).
    "asof_forward_next_touch" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("next_click_id"))
      AsOfJoin.forward(purchases, clicks, Seq("user_id"), "ts",
          Seq("next_click_id"), tieCols = Seq("next_click_id"))
        .select(col("event_id"), col("user_id"), tsStr(col("ts")).as("ts"),
          col("next_click_id"))
        .orderBy("event_id")
    },


    // Session-relative ordinal features — "the 3rd event of the visit,
    // 42 s in": the feature-engineering staple over gap sessions,
    // composed from the SAME Sessionize.withSessionIndex used by
    // sessionize_gap. Both windows share the one user-keyed exchange
    // (the second adds session_idx to the sort, not a new shuffle). The
    // Σ ordinal·event_id checksum pins every event's position, not just
    // session sizes; duration stays in exact epoch millis.
    "session_ordinal_features" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val sess = Sessionize.withSessionIndex(
        Tables.events(s, d), Seq("user_id"), "ts", gapSeconds = 1800)
      val w = Window.partitionBy("user_id", "session_idx")
        .orderBy(col("ts"), col("event_id"))
      sess.withColumn("ordinal", row_number().over(w))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"),
          sum(col("ordinal") * col("event_id")).as("ord_checksum"),
          (max(unix_millis(col("ts").cast("timestamp_ltz"))) -
            min(unix_millis(col("ts").cast("timestamp_ltz"))))
            .as("duration_ms"))
        .orderBy("user_id", "session_idx")
    },


    // Per-type linear TREND of the daily count series — grouped least
    // squares over the dense day grid (absent days are real zeros, as in
    // type_correlation_matrix). Slope arrives as an exact integer
    // (numerator, denominator) pair — the target_encoding_loo convention
    // — plus the rounded quotient; x is the day index from the shared
    // epoch, so the slope unit is events/day.
    "daily_trend_slope" -> { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val grid = daily.select("day").distinct()
        .crossJoin(daily.select("event_type").distinct())
        .join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"),
          datediff(col("day"), lit("2024-01-01")).cast("long").as("x"),
          coalesce(col("n"), lit(0L)).as("y"))
      grid.groupBy("event_type")
        .agg(count(lit(1)).as("nd"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("event_type"), col("nd"),
          (col("nd") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
          (col("nd") * col("sxx") - col("sx") * col("sx")).as("slope_den"),
          round((col("nd") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (col("nd") * col("sxx") - col("sx") * col("sx")), 6)
            .as("slope"))
        .orderBy("event_type")
    },


    // NEAREST as-of — each purchase matched to its closest click/view in
    // EITHER direction (pandas merge_asof direction='nearest'),
    // completing the as-of family: backward (inclusive, r2), forward
    // (strict, r8s7), nearest = both passes composed and the smaller
    // |Δt| chosen (backward wins exact ties, including Δt = 0). Two
    // union-window passes on the same user key — the only exchanges; the
    // deltas are exact epoch-micros longs (the fixture carries no
    // sub-microsecond components, checked), and the rollup pins channel ×
    // direction counts, id checksums, and total delta.
    "asof_nearest_touch" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"), col("ts"))
      def side(p: String) = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("ts"), col("ts").as(s"${p}_ts"),
          col("event_type").as(s"${p}_type"), col("event_id").as(s"${p}_id"))
      val back = AsOfJoin.backward(purchases, side("b"), Seq("user_id"),
        "ts", Seq("b_ts", "b_type", "b_id"), tieCols = Seq("b_id"))
      val both = AsOfJoin.forward(back, side("f"), Seq("user_id"),
        "ts", Seq("f_ts", "f_type", "f_id"), tieCols = Seq("f_id"))
      def us(c: Column) = unix_micros(c.cast("timestamp_ltz"))
      both
        .withColumn("db", us(col("ts")) - us(col("b_ts")))
        .withColumn("df", us(col("f_ts")) - us(col("ts")))
        .withColumn("dir",
          when(col("b_id").isNull && col("f_id").isNull, "none")
            .when(col("f_id").isNull ||
              (col("b_id").isNotNull && col("db") <= col("df")), "backward")
            .otherwise("forward"))
        .withColumn("near_type", when(col("dir") === "backward", col("b_type"))
          .when(col("dir") === "forward", col("f_type")))
        .withColumn("near_id", when(col("dir") === "backward", col("b_id"))
          .when(col("dir") === "forward", col("f_id")))
        .withColumn("delta_us", when(col("dir") === "backward", col("db"))
          .when(col("dir") === "forward", col("df")).otherwise(lit(0L)))
        .groupBy(coalesce(col("near_type"), lit("none")).as("channel"),
          col("dir"))
        .agg(count(lit(1)).as("n_purchases"),
          coalesce(sum(col("near_id")), lit(0L)).as("id_checksum"),
          sum(col("delta_us")).as("delta_us_sum"))
        .orderBy("channel", "dir")
    },


    // CUSUM change-point detection per event_type over the daily count
    // series: the day k maximizing |Σ_{d≤k}(c_d·D − total)| — the exact
    // integer scaling of the classic cumulative-deviation-from-mean
    // statistic (multiplied through by D so no rational mean appears).
    // All windows run on the day-collapsed series (≤ types × days rows);
    // earliest-day tiebreak makes the argmax deterministic.
    "cusum_changepoint" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val wt = Window.partitionBy("event_type")
      val wo = Window.partitionBy("event_type").orderBy("day")
      val cus = daily
        .withColumn("total", sum("c").over(wt))
        .withColumn("n_days", count(lit(1)).over(wt))
        .withColumn("cum", sum("c").over(
          wo.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("k", row_number().over(wo).cast("long"))
        .withColumn("s_abs",
          abs(col("n_days") * col("cum") - col("k") * col("total")))
      cus.withColumn("m", max("s_abs").over(wt))
        .filter(col("s_abs") === col("m"))
        .groupBy("event_type")
        .agg(min("day").as("day"), max("m").as("s_abs"),
          max("n_days").as("n_days"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("change_day"),
          col("s_abs"), col("n_days"))
        .orderBy("event_type")
    },


    // Maximum non-overlapping interval selection (activity selection,
    // the earliest-deadline-first greedy): each user's purchases open a
    // value-minutes-long interval; the fold walks the END-sorted
    // intervals keeping one whenever it starts at/after the last kept
    // end — provably optimal, inherently sequential, and therefore the
    // same per-key `aggregate` fold shape as holt_linear_exact: state
    // rides inside each key's array, keys parallelize, no driver loop.
    // Epoch-micros integers end to end.
    "interval_scheduling_max_sessions" -> { (s, d) =>
      val iv = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("st"),
          (floor(col("value")).cast("long") * 60L * 1000000L).as("dur"))
        .select(col("user_id"), col("st"), (col("st") + col("dur")).as("en"))
      iv.groupBy("user_id")
        .agg(count(lit(1)).as("n_intervals"),
          sort_array(collect_list(struct(col("en"), col("st")))).as("xs"))
        .withColumn("max_nonoverlap", expr("""
          aggregate(xs,
            named_struct('cnt', CAST(0 AS BIGINT), 'last_end', CAST(-1 AS BIGINT)),
            (a, x) -> CASE WHEN x.st >= a.last_end
              THEN named_struct('cnt', a.cnt + 1, 'last_end', x.en)
              ELSE a END).cnt"""))
        .select(col("user_id"), col("n_intervals"), col("max_nonoverlap"))
        .orderBy("user_id")
    },


    // NATIVE recursive CTE (new in Spark 4.x — the last classic SQL
    // construct the engine's surface lacked): minimum-hop reachability
    // over the behavioral transition graph (distinct consecutive
    // event-type pairs per user, self-loops dropped — a ≤ 5-vertex
    // graph, so the recursion is bounded by hops < 5 and the working set
    // stays dimension-sized). The SAME SQL text runs in DuckDB as the
    // oracle, which is the point: recursion is now portable surface, not
    // an iterate-in-Scala special case (the Components loops remain the
    // scale path for vertex-count-sized graphs).
    "recursive_cte_reachability" -> { (s, d) =>
      Tables.events(s, d).createOrReplaceTempView("rc_events")
      // Materialize the (≤ 5·4-row) edge set BEFORE the recursion: as an
      // inline CTE it is re-planned and re-executed inside EVERY
      // recursion step, so each of the ~5 loop iterations re-ran the
      // 100k-row lag window (r16 probe: repeated Exchange|Window stages,
      // ~140 ms each, 44 stages total). The checkpoint runs the window
      // once; the recursive part — the point of the query — is unchanged
      // and joins against the materialized dimension-sized edge list.
      s.sql("""
        SELECT DISTINCT prev_type AS src, event_type AS dst FROM (
          SELECT event_type,
            lag(event_type) OVER (PARTITION BY user_id
              ORDER BY ts, event_id) AS prev_type
          FROM rc_events)
        WHERE prev_type IS NOT NULL AND prev_type <> event_type""")
        .localCheckpoint()
        .createOrReplaceTempView("rc_edges")
      s.sql("""
        WITH RECURSIVE reach(src, dst, hops) AS (
          SELECT src, dst, 1 FROM rc_edges
          UNION ALL
          SELECT r.src, e.dst, r.hops + 1
          FROM reach r JOIN rc_edges e ON r.dst = e.src
          WHERE r.hops < 5 AND r.src <> e.dst),
        m AS (SELECT src, dst, min(hops) AS min_hops
              FROM reach GROUP BY src, dst)
        SELECT src, dst, CAST(min_hops AS INT) AS min_hops
        FROM m ORDER BY src, dst""")
    },


    // Calendar densification — the structural gap-filler reporting needs
    // before any day-over-day window runs: the full (type × day) grid
    // from one broadcast bounds row + sequence(), left-joined to the
    // sparse daily aggregate, absent days zero-filled and flagged. The
    // grid is dimension-sized (types × days), never fact-sized, so the
    // only fact-scale work is the one daily aggregation.
    "calendar_densify_zero_fill" -> { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val bounds = Tables.events(s, d)
        .agg(min(to_date(col("ts"))).as("d0"), max(to_date(col("ts"))).as("d1"))
      val grid = daily.select("event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("event_type"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      grid.join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          col("n").isNull.as("is_gap"))
        .orderBy("event_type", "day")
    },


    "ewma_daily_counts" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val wo = Window.partitionBy("event_type").orderBy("day")
      val terms = (0 to 7).map { j =>
        val w = 1L << (7 - j)
        (when(lag(col("c"), j).over(wo).isNotNull,
            lag(col("c"), j).over(wo) * w).otherwise(0L),
          when(lag(col("c"), j).over(wo).isNotNull, lit(w)).otherwise(0L))
      }
      daily
        .withColumn("num", terms.map(_._1).reduce(_ + _))
        .withColumn("den", terms.map(_._2).reduce(_ + _))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"), col("c"),
          expr("num * 1000 DIV den").as("ewma_milli"))
        .orderBy("event_type", "day")
    },


    // Tolerance-bounded backward as-of join (pandas merge_asof
    // tolerance) — each purchase takes the user's last click, but only
    // if it happened within the 10-minute attribution window; older
    // matches null out. Completes the as-of family
    // (backward/forward/nearest/tolerance); same one-shuffle union-window
    // plan, the tolerance is a post-fill projection.
    "asof_tolerance_join" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      AsOfJoin.backwardTolerance(purchases, clicks, Seq("user_id"), "ts",
          valueCols = Seq("click_id"), tolerance = "10 MINUTES",
          tieCols = Seq("click_id"))
        .select(col("user_id"), tsStr(col("ts")).as("ts"), col("event_id"),
          col("click_id"), tsStr(col("asof_matched_ts")).as("click_ts"))
        .orderBy("event_id")
    },


    // Day-over-day trending — per day, the event type with the largest
    // relative count growth (permille vs previous day), the "what's
    // spiking" feed. All windows on the day×type collapsed series;
    // deterministic (delta desc, type) tiebreak; day 1 has no baseline
    // and is skipped.
    "trending_types_daily" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val wt = Window.partitionBy("event_type").orderBy("day")
      val wd = Window.partitionBy("day")
        .orderBy(desc("delta_permille"), col("event_type"))
      daily
        .withColumn("prev", lag(col("c"), 1).over(wt))
        .filter(col("prev").isNotNull)
        .withColumn("delta_permille",
          expr("(c - prev) * 1000 DIV prev"))
        .withColumn("rn", row_number().over(wd))
        .filter(col("rn") === 1)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("event_type").as("top_type"), col("c"), col("prev"),
          col("delta_permille"))
        .orderBy("day")
    },


    // Peak concurrency by sweep line — max simultaneously-open gap
    // sessions per day (capacity planning's load question). Sessions
    // split into per-day segments (midnight carry-in becomes the
    // segment's 00:00 start), boundaries collapse to one row per
    // (day, ts) with net delta and +1 count, and the peak reads off a
    // day-partitioned running sum over that collapsed domain: candidate
    // concurrency at ts = cum_before + ups (all starts at an instant
    // count before any end — closed intervals, so a session ending at
    // the exact ts another starts overlaps it). No global window, no
    // per-boundary-row state: the window partitions by day on the
    // deduped boundary domain, which is also the 100 TB plan.
    "max_concurrent_sessions" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val seg = Sessionize.sessions(Tables.events(s, d), Seq("user_id"),
          "ts", gapSeconds = 1800)
        .select(col("session_start"), col("session_end"),
          explode(expr(
            "sequence(to_date(session_start), to_date(session_end))"))
            .as("day"))
        .select(col("day"),
          greatest(col("session_start"), col("day").cast("timestamp_ntz"))
            .as("seg_start"),
          least(col("session_end"),
            expr("cast(date_add(day, 1) as timestamp_ntz)" +
              " - INTERVAL 1 MICROSECOND")).as("seg_end"))
      val bounds = seg
        .select(col("day"), col("seg_start").as("ts"), lit(1L).as("delta"))
        .union(seg.select(col("day"), col("seg_end").as("ts"),
          lit(-1L).as("delta")))
        .groupBy("day", "ts")
        .agg(sum(col("delta")).as("net"),
          sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("ups"))
      val w = Window.partitionBy("day").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cand = bounds.withColumn("cum", sum(col("net")).over(w))
        .withColumn("cand", col("cum") - col("net") + col("ups"))
      cand.groupBy("day").agg(max(col("cand")).as("peak"))
        .join(cand.select(col("day"), col("ts"), col("cand")),
          Seq("day"))
        .filter(col("cand") === col("peak"))
        .groupBy(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("peak"))
        .agg(tsStr(min(col("ts"))).as("first_peak"))
        .orderBy("day")
    },


    // Interval-intersection aggregate: per user, how many of their
    // click-sessions overlap their view-sessions and for how long —
    // closed-interval pair overlap with exact epoch-micros lengths.
    // 12-hour gap (the range_join_error_attribution sessionization):
    // events are sparse enough per (user, type) that 30-min sessions
    // never overlap cross-type.
    // The pair join is user-keyed EQUI join + overlap predicate (both
    // session sets are per-user small — gap sessionization bounds them
    // — so the within-user pair count never explodes); at 100 TB the
    // shuffle key is user_id and no global structure exists.
    "session_overlap_seconds" -> { (s, d) =>
      val ev = Tables.events(s, d)
      def sess(t: String, p: String) = Sessionize.sessions(
          ev.filter(col("event_type") === t), Seq("user_id"), "ts",
          gapSeconds = 43200)
        .select(col("user_id"), col("session_start").as(s"${p}_s"),
          col("session_end").as(s"${p}_e"))
      def us(c: Column) = unix_micros(c.cast("timestamp_ltz"))
      sess("click", "c").join(sess("view", "v"), Seq("user_id"))
        .filter(col("c_s") <= col("v_e") && col("v_s") <= col("c_e"))
        .withColumn("ov_us",
          us(least(col("c_e"), col("v_e"))) -
            us(greatest(col("c_s"), col("v_s"))))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(ov_us) DIV 1000000").as("overlap_seconds"))
        .orderBy("user_id")
    },


    // Behavioral diversity per user — Gini-Simpson index 1 − Σp² as the
    // EXACT rational (n² − Σc²)·10⁶ DIV n² (entropy would be a float
    // fold; Simpson stays in integers), plus the dominant event type
    // with a deterministic (count desc, type asc) tiebreak. One
    // user×type exchange; everything after is user-sized.
    "behavior_diversity_simpson" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ut = Tables.events(s, d).groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("user_id")
        .orderBy(desc("c"), asc("event_type"))
      val dom = ut.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("event_type").as("dominant_type"))
      ut.groupBy("user_id")
        .agg(sum(col("c")).as("n_events"),
          count(lit(1)).as("n_types"),
          sum(col("c") * col("c")).as("ss"))
        .withColumn("simpson_micro",
          expr("(n_events * n_events - ss) * 1000000" +
            " DIV (n_events * n_events)"))
        .drop("ss")
        .join(dom, "user_id")
        .orderBy("user_id")
    },


    // Lag-1 autocorrelation of the daily series, EXACT: center by
    // scaling — with S = Σv and n days, (n·v_t − S) is the mean
    // deviation times n, an integer; numerator Σ(n·v_t − S)(n·v_{t+1}−S)
    // and denominator Σ(n·v_t − S)² are then exact BIGINTs (values in
    // whole dollars to keep n·v·deviation products under 2⁶³ — the
    // scaling rule is documented, not silent). The float ratio is the
    // caller's one division; both exact components ship. No ratio
    // column: negative-numerator integer division is a classic
    // cross-engine hazard (MEASURED equal here — both Spark DIV and
    // DuckDB // truncate toward zero — but the components are the
    // robust contract and carry strictly more information).
    "autocorr_lag1_daily" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(expr("sum(CAST(round(value * 100) AS BIGINT)) DIV 100")
          .as("v"))
      val tot = daily.groupBy("event_type")
        .agg(sum(col("v")).as("s_sum"), count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("day")
      daily.withColumn("v_next", lead(col("v"), 1).over(w))
        .join(broadcast(tot), "event_type")
        .withColumn("dev", col("n") * col("v") - col("s_sum"))
        .withColumn("dev_next",
          when(col("v_next").isNotNull,
            col("n") * col("v_next") - col("s_sum")))
        .groupBy("event_type", "n")
        .agg(sum(col("dev") * col("dev_next")).as("num_scaled"),
          sum(col("dev") * col("dev")).as("den_scaled"))
        .orderBy("event_type")
    },


    // Theil-Sen robust trend over daily event counts: the MEDIAN of all
    // pairwise slopes (Sen 1968) — outlier days move OLS (the
    // daily_trend_slope query) but barely move this. All pair work runs
    // on the COLLAPSED day domain (30 rows → 435 pairs), so the
    // quadratic blowup is in the domain size, never the corpus; the
    // median pick is deterministic: order by the double slope (identical
    // IEEE division both engines) with (dy, dx) breaking exact ties, and
    // the emitted slope is the exact integer micro-ratio of the chosen
    // pair — floats order, integers answer.
    "theil_sen_daily_trend" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .select(expr("datediff(CAST(ts AS DATE), DATE '2024-01-01')")
          .cast("long").as("x"))
        .groupBy("x").agg(count(lit(1)).as("y"))
      val pairs = daily.as("a").join(daily.as("b"), col("a.x") < col("b.x"))
        .select((col("b.y") - col("a.y")).as("dy"),
          (col("b.x") - col("a.x")).as("dx"))
      val nd = daily.agg(count(lit(1)).as("n_days"))
      val np = pairs.agg(count(lit(1)).as("n_pairs"))
      pairs
        .withColumn("rk", row_number().over(Window.orderBy(
          (col("dy").cast("double") / col("dx")).asc, col("dy"), col("dx"))))
        .crossJoin(broadcast(np)).crossJoin(broadcast(nd))
        .filter(expr("rk = (n_pairs + 1) DIV 2"))
        .select(col("n_days"), col("n_pairs"), col("dy").as("med_dy"),
          col("dx").as("med_dx"),
          expr("dy * 1000000 DIV dx").as("slope_micro"))
    },


    // Linear interpolation over masked gaps in the hourly event series —
    // the imputation op AND its quality audit in one: hours with
    // hidx % 11 ∈ {3,4,5} are masked (deterministic 3-hour "outage"
    // runs, so interpolation weights genuinely vary across the gap),
    // each masked hour interpolates between its nearest UNMASKED
    // neighbors via IGNORE-NULLS window frames, and because the true
    // value is known the exact micro-unit absolute error ships with the
    // estimate. All integer arithmetic (truncating DIV measured
    // identical in both engines); the series lives on the collapsed
    // hour domain (720 rows).
    "linear_interpolate_gaps" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("hidx")
      val before = w.rowsBetween(Window.unboundedPreceding, -1)
      val after = w.rowsBetween(1, Window.unboundedFollowing)
      val h = Tables.events(s, d)
        .select(expr("""(unix_micros(CAST(ts AS TIMESTAMP)) -
                 unix_micros(TIMESTAMP '2024-01-01 00:00:00'))
                DIV 3600000000""").as("hidx"))
        .groupBy("hidx").agg(count(lit(1)).as("v"))
        .withColumn("masked", expr("hidx % 11 IN (3, 4, 5)"))
      h.withColumn("pt", last(when(!col("masked"), col("hidx")), ignoreNulls = true).over(before))
        .withColumn("pv", last(when(!col("masked"), col("v")), ignoreNulls = true).over(before))
        .withColumn("nt", first(when(!col("masked"), col("hidx")), ignoreNulls = true).over(after))
        .withColumn("nv", first(when(!col("masked"), col("v")), ignoreNulls = true).over(after))
        .filter(col("masked") && col("pt").isNotNull && col("nt").isNotNull)
        .select(col("hidx"), col("v").as("v_true"),
          expr("""pv * 1000000 + (((nv - pv) * (hidx - pt) * 1000000)
                  DIV (nt - pt))""").as("interp_micro"),
          expr("""abs(pv * 1000000 + (((nv - pv) * (hidx - pt) * 1000000)
                  DIV (nt - pt)) - v * 1000000)""").as("abs_err_micro"))
        .orderBy("hidx")
    },


    // Day-of-week seasonality index for purchase revenue: per ISO
    // weekday, the mean-vs-overall-mean index as an exact permille by
    // cross-multiplication (cents·total_days·1000 DIV
    // (n_days·total_cents)) — the retail seasonal profile without one
    // float division. Collapsed to 7 rows before any join.
    "seasonal_weekday_index" -> { (s, d) =>
      val daily = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
      val byDow = daily
        .groupBy(expr("weekday(day) + 1").as("isodow"))
        .agg(count(lit(1)).as("n_days"), sum("cents").as("cents"))
      val tot = byDow.agg(sum("n_days").as("total_days"),
        sum("cents").as("total_cents"))
      byDow.crossJoin(broadcast(tot))
        .select(col("isodow"), col("n_days"), col("cents"),
          expr("cents * total_days * 1000 DIV (n_days * total_cents)")
            .as("index_permille"))
        .orderBy("isodow")
    },


    // Business-day shipping lag: calendar days decompose into full
    // weeks ×5 plus a remainder filtered through the ISO-weekday wheel
    // ((start − 1 + x) % 7 + 1 ∉ {6,7}) — exact integer calendar
    // arithmetic, no holiday table needed for the weekend rule. The
    // Spark side guards cd % 7 = 0 explicitly: sequence(1, 0) is
    // DESCENDING in Spark (the [1,0] trap) where DuckDB's range is
    // empty. Histogram over lags ≤ 60 days with order-key checksums.
    "business_days_lag" -> { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >= col("o_orderdate"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(min("l_shipdate").as("ship"))
        .withColumn("cd",
          datediff(to_date(col("ship")), to_date(col("o_orderdate")))
            .cast("long"))
        .filter(col("cd") <= 60)
        .withColumn("sd", expr("weekday(o_orderdate) + 1"))
        .withColumn("bus_days", expr(
          """(cd DIV 7) * 5 + CASE WHEN cd % 7 = 0 THEN 0L
             ELSE CAST(size(filter(sequence(1L, cd % 7),
               x -> ((sd - 1 + x) % 7) + 1 NOT IN (6, 7))) AS LONG) END"""))
        .groupBy("bus_days")
        .agg(count(lit(1)).as("n_orders"),
          sum("l_orderkey").as("key_checksum"))
        .orderBy("bus_days")
    },


    // Robust STL-lite decomposition with EXACT integer medians: trend =
    // centered 7-day window median (odd window → the 4th sorted
    // element, no averaging), seasonal = per-ISO-weekday LOWER median
    // of the detrended series, remainder = the rest. Robust seasonal
    // decomposition without one float — median windows are sorted
    // 7-element arrays, the seasonal median indexes the sorted list at
    // (n+1) DIV 2. Edge days without a full window are excluded by
    // contract (wn = 7), not padded.
    "stl_lite_decomposition" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w7 = Window.orderBy("day").rowsBetween(-3, 3)
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("v"))
      val tr = daily
        .withColumn("wl", array_sort(collect_list("v").over(w7)))
        .withColumn("wn", count(lit(1)).over(w7))
        .filter(col("wn") === 7)
        .withColumn("trend", element_at(col("wl"), 4))
        .withColumn("detr", col("v") - col("trend"))
        .withColumn("dow", expr("weekday(day) + 1"))
      val seas = tr.groupBy("dow")
        .agg(expr("element_at(array_sort(collect_list(detr)), " +
          "CAST((count(1) + 1) DIV 2 AS INT))").as("seasonal"))
      tr.join(broadcast(seas), "dow")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("v"),
          col("trend"), col("seasonal"),
          (col("v") - col("trend") - col("seasonal")).as("remainder"))
        .orderBy("day")
    },


    // Interval-union coverage by sweep line: each click opens a 5-minute
    // interval; +1/−1 boundary events sorted (time, starts-first) and a
    // running active count price exactly the UNION length per day —
    // overlap counted once (max_concurrent_sessions takes the max of
    // this same sweep; the integral is the other classic). Exact
    // epoch-micros, per-day partitions.
    "interval_union_coverage" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val iv = Tables.events(s, d).filter(col("event_type") === "click")
        .select(to_date(col("ts")).as("day"),
          expr("unix_micros(CAST(ts AS TIMESTAMP))").as("st"))
        .withColumn("en", col("st") + 300000000L)
      val pts = iv.select(col("day"), col("st").as("t"), lit(1L).as("dd"))
        .union(iv.select(col("day"), col("en"), lit(-1L)))
      val w = Window.partitionBy("day").orderBy(col("t"), desc("dd"))
      val cov = pts
        .withColumn("active",
          sum("dd").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("nxt", lead(col("t"), 1).over(w))
        .filter(col("nxt").isNotNull)
        .groupBy("day")
        .agg(expr("sum(IF(active > 0, nxt - t, 0L)) DIV 1000000")
          .as("covered_seconds"))
      iv.groupBy("day").agg(count(lit(1)).as("n_intervals"))
        .join(cov, "day")
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_intervals"), col("covered_seconds"))
        .orderBy("day")
    },


    // The federation fallacy, quantified: lower median of per-day-shard
    // lower medians vs the true global median — the gap (210 000 micro
    // here) is what a naive "median of shard medians" rollup silently
    // reports wrong. All exact ranks; the machinery every federated
    // metrics layer needs to justify shipping histograms instead of
    // medians.
    "median_federation_gap" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val t = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"),
          round(col("value") * 1000000).cast("long").as("vm"))
      // Global lower-median WITHOUT a global Window.orderBy (whose
      // SinglePartition exchange the r12 plan-audit classifier flagged
      // at full-corpus rows-in): rank in parallel via
      // RangeRank.withGlobalPos — equal vm keys co-locate under the
      // range exchange, so ANY tie order yields the same rank-k VALUE —
      // and pick rank (n+1) DIV 2 against the broadcast count. The
      // per-day arm keeps the plain partitioned window (each partition
      // is one shard's rows, never the corpus); `bounded = true` keeps
      // the plain global window for the FED arm, whose input is one
      // median per shard — ≤ n_days rows by construction, a collapsed
      // domain the classifier itself files under bounded_rows (the
      // two-level machinery would spend its cache+offsets+checkpoint
      // overhead to parallelize ~150 rows).
      def lowerMedian(df: DataFrame, part: Seq[String], out: String,
          bounded: Boolean = false) =
        if (part.isEmpty && !bounded) {
          graft.ops.RangeRank.withGlobalPos(df, Seq(col("vm")), "rk")
            .crossJoin(broadcast(df.agg(count(lit(1)).as("nn"))))
            .filter(expr("rk = (nn + 1) DIV 2"))
            .select(col("vm").as(out))
        } else {
          val w = if (part.isEmpty) Window.orderBy("vm")
            else Window.partitionBy(part.map(col): _*).orderBy("vm")
          val wc = if (part.isEmpty) Window.partitionBy()
            else Window.partitionBy(part.map(col): _*)
          df.withColumn("rk", row_number().over(w))
            .withColumn("nn", count(lit(1)).over(wc))
            .filter(expr("rk = (nn + 1) DIV 2"))
            .select((part.map(col) :+ col("vm").as(out)): _*)
        }
      val sm = lowerMedian(t, Seq("day"), "shard_median")
      val fed = lowerMedian(sm.select(col("shard_median").as("vm")),
        Seq.empty, "fed_median", bounded = true)
      val gm = lowerMedian(t.select("vm"), Seq.empty, "global_median")
      sm.agg(count(lit(1)).as("n_shards"))
        .crossJoin(broadcast(fed)).crossJoin(broadcast(gm))
        .select(col("n_shards"), col("fed_median"), col("global_median"),
          (col("fed_median") - col("global_median")).as("gap_micro"))
    },


    // Missing-id gap ranges in the completed ('F') orderkey sequence —
    // the data-quality "which ids never arrived/finished" report. NOT
    // the single-partition lead() formulation: gap boundaries come from
    // two shuffle-partitioned anti-joins (k+1 ∉ S starts a gap,
    // m−1 ∉ S ends one), and only the ~boundary-count survivors meet
    // the ordering window, so the global sort touches gaps, not keys.
    // Pairing i-th start with i-th end is exact because starts and
    // ends strictly alternate between consecutive present keys. The
    // oracle is the INDEPENDENT lead()-over-sorted-keys formulation.
    "sequence_gap_ranges" -> { (s, d) =>
      val keys = Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("k"))
      val mm = keys.agg(min("k").as("lo"), max("k").as("hi"))
      val succ = keys.select((col("k") + 1).as("k1"))
      val pred = keys.select((col("k") - 1).as("k0"))
      // boundary ordinals via RangeRank: "the global sort touches gaps,
      // not keys" — but gap DENSITY is a data property, and on this
      // corpus boundaries are ~45% of keys (r13 growth audit: 10×
      // rows-in at 10× data through the old global row_number), so the
      // pairing ordinal gets the two-level rank too
      val starts = graft.ops.RangeRank.withGlobalPos(
        succ.join(keys, succ("k1") === keys("k"), "left_anti")
          .crossJoin(broadcast(mm)).filter(col("k1") < col("hi"))
          .select(col("k1").as("gap_start")),
        Seq(col("gap_start")), "rn")
      val ends = graft.ops.RangeRank.withGlobalPos(
        pred.join(keys, pred("k0") === keys("k"), "left_anti")
          .crossJoin(broadcast(mm)).filter(col("k0") > col("lo"))
          .select(col("k0").as("gap_end")),
        Seq(col("gap_end")), "rn")
      starts.join(ends, "rn")
        .select(col("gap_start"), col("gap_end"),
          (col("gap_end") - col("gap_start") + 1).as("gap_len"))
        .orderBy("gap_start")
    },


    // Split conformal prediction interval per event type (Vovk;
    // Lei et al. JASA'18): calibration = days 0–14, point predictor =
    // lower-median of calibration cents, score = |x − med|, radius =
    // the ⌈0.9(n+1)⌉-th smallest score (the finite-sample-valid rank,
    // clamped to n), then EMPIRICAL COVERAGE measured on the held-out
    // days 15+ in permille. Every step is an exact integer rank
    // selection — no quantile interpolation, no floats anywhere — so
    // the distribution-free ≥90% guarantee is checkable: covered
    // permille lands near 900 for every type. Per-type windows over
    // the calibration split only.
    "conformal_interval_per_type" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .crossJoin(broadcast(Tables.events(s, d)
          .agg(min(to_date(col("ts"))).as("d0"))))
        .select(col("event_type"), col("event_id"),
          datediff(to_date(col("ts")), col("d0")).as("day"),
          floor(col("value") * 100).as("cents"))
      val cal = ev.filter(col("day") < 15)
      val nCal = cal.groupBy("event_type").agg(count(lit(1)).as("n_cal"))
      val wMed = Window.partitionBy("event_type")
        .orderBy("cents", "event_id")
      val med = cal.withColumn("rn", row_number().over(wMed))
        .join(broadcast(nCal), "event_type")
        .filter(col("rn") === expr("(n_cal + 1) DIV 2"))
        .select(col("event_type"), col("n_cal"),
          col("cents").as("median_cents"))
      val resid = cal.join(broadcast(med), "event_type")
        .withColumn("r", abs(col("cents") - col("median_cents")))
      val wQ = Window.partitionBy("event_type").orderBy("r", "event_id")
      val q = resid.withColumn("qs", row_number().over(wQ))
        .filter(col("qs") ===
          expr("least(n_cal, (9 * n_cal + 18) DIV 10)"))
        .select(col("event_type"), col("r").as("q_resid"))
      val bounds = med.join(q, "event_type")
      ev.filter(col("day") >= 15)
        .join(broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(first("n_cal").as("n_cal"),
          first("median_cents").as("median_cents"),
          first("q_resid").as("q_resid"),
          count(lit(1)).as("n_test"),
          sum(when(abs(col("cents") - col("median_cents")) <=
            col("q_resid"), 1L).otherwise(0L)).as("n_covered"))
        .withColumn("coverage_permille",
          expr("(1000 * n_covered) DIV n_test"))
        .orderBy("event_type")
    },


    // DAU/MAU stickiness: daily actives over 28-day rolling actives,
    // integer permille — the product-analytics engagement headline.
    // Exact rolling DISTINCT via presence scatter (each (user, day)
    // contributes to the 28 windows ending day..day+27, then distinct
    // collapses multi-day users), the same shuffle-shape as the 7-day
    // variant: no per-window re-scan, no approximate sketch.
    "dau_mau_stickiness" -> { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val dau = ud.groupBy("day").agg(count(lit(1)).as("dau"))
      val mau = ud.select(col("user_id"),
          explode(expr("sequence(day, date_add(day, 27))")).as("wday"))
        .distinct()
        .join(broadcast(ud.select(col("day").as("wday")).distinct()),
          "wday")
        .groupBy("wday").agg(count(lit(1)).as("mau_28d"))
      dau.join(mau, col("day") === col("wday"))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("mau_28d"),
          expr("(1000 * dau) DIV mau_28d").as("stickiness_permille"))
        .orderBy("day")
    },


    // The inspection paradox, quantified on gap sessions: the session
    // covering a RANDOM instant is length-biased — its expected
    // duration is Σd²/Σd, not Σd/n — and the permille bias
    // (n·Σd² − (Σd)²)/(Σd)² is exactly how much longer the "typical
    // observed" session looks than the typical session. Durations in
    // whole minutes keep n·Σd² inside BIGINT at sf0.1 (seconds² would
    // overflow); zero-length singleton sessions stay in, documented —
    // they're real sessions the paradox under-samples.
    "inspection_paradox_sessions" -> { (s, d) =>
      val sess = graft.ops.Sessionize.withSessionIndex(
          Tables.events(s, d).select(col("user_id"), col("ts")),
          Seq("user_id"), "ts", gapSeconds = 1800L)
        .groupBy("user_id", "session_idx")
        // integer DIV, not double `/`+cast: a float quotient landing on
        // an exact integer boundary can round up where floor would not
        .agg(expr("""(unix_micros(CAST(max(ts) AS TIMESTAMP)) -
          unix_micros(CAST(min(ts) AS TIMESTAMP))) DIV 60000000""")
          .as("dmin"))
      sess.agg(count(lit(1)).as("n_sessions"),
          sum("dmin").as("sum_min"),
          sum(col("dmin") * col("dmin")).as("sum_min_sq"))
        .select(col("n_sessions"), col("sum_min"), col("sum_min_sq"),
          expr("(1000 * sum_min) DIV n_sessions").as("mean_milli_min"),
          expr("(1000 * sum_min_sq) DIV sum_min")
            .as("length_biased_mean_milli_min"),
          expr("""(1000 * (n_sessions * sum_min_sq - sum_min * sum_min))
            DIV (sum_min * sum_min)""").as("bias_permille"))
    },


    // Percentile subadditivity gap — why capacity planning by
    // per-component p95s over-provisions: over the dense (day, hour)
    // load grid, p95 of the TOTAL vs the sum of per-type p95s, both
    // nearest-rank-exact. The gap is the diversification benefit that
    // "sum the p95s" silently discards.
    "percentile_subadditivity_gap" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          hour(col("ts")).as("hr"))
      val cells = ev.groupBy("day", "hr", "event_type")
        .agg(count(lit(1)).as("c"))
      val grid = ev.select("day").distinct()
        .crossJoin(broadcast(s.range(24).select(
          col("id").cast("int").as("hr"))))
        .crossJoin(broadcast(ev.select("event_type").distinct()))
        .join(cells, Seq("day", "hr", "event_type"), "left")
        .select(col("day"), col("hr"), col("event_type"),
          coalesce(col("c"), lit(0L)).as("c"))
      val nb = grid.select("day", "hr").distinct()
        .agg(count(lit(1)).as("n_buckets"))
      val totP95 = grid.groupBy("day", "hr").agg(sum("c").as("tot"))
        .withColumn("rn", row_number().over(
          Window.orderBy("tot", "day", "hr")))
        .crossJoin(broadcast(nb))
        .filter(col("rn") === expr("(95 * n_buckets + 99) DIV 100"))
        .select(col("n_buckets"), col("tot").as("p95_of_total"))
      val perType = grid.withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("c", "day", "hr")))
        .crossJoin(broadcast(nb))
        .filter(col("rn") === expr("(95 * n_buckets + 99) DIV 100"))
        .agg(sum("c").as("sum_of_type_p95s"))
      totP95.crossJoin(broadcast(perType))
        .select(col("n_buckets"), col("p95_of_total"),
          col("sum_of_type_p95s"),
          (col("sum_of_type_p95s") - col("p95_of_total")).as("gap"),
          expr("""(1000 * (sum_of_type_p95s - p95_of_total))
            DIV p95_of_total""").as("gap_permille"))
    },


    // Allen's interval algebra (Allen 1983): classify every (click
    // session, error session) pair of the same user into the 13
    // qualitative temporal relations — the vocabulary for "did the
    // errors happen DURING a click session, or between them?". The
    // CASE ladder tests equalities first so each pair lands in exactly
    // one relation (degenerate single-event sessions included). Pairs
    // are generated per user after sessionizing each stream, so the
    // join is user-partitioned with per-user fan-out bounded by
    // session counts — no global quadratic term at any scale.
    "allen_interval_relations" -> { (s, d) =>
      val ev = Tables.events(s, d)
      def sess(t: String, p: String) = graft.ops.Sessionize.sessions(
          ev.filter(col("event_type") === t), Seq("user_id"), "ts",
          gapSeconds = 3600)
        .select(col("user_id"), col("session_start").as(s"${p}1"),
          col("session_end").as(s"${p}2"))
      val a1 = col("a1"); val a2 = col("a2")
      val b1 = col("b1"); val b2 = col("b2")
      val rel = when(a1 === b1 && a2 === b2, "equals")
        .when(a1 === b1 && a2 < b2, "starts")
        .when(a1 === b1, "started_by")
        .when(a2 === b2 && a1 > b1, "finishes")
        .when(a2 === b2, "finished_by")
        .when(a2 < b1, "precedes")
        .when(a2 === b1, "meets")
        .when(b2 < a1, "preceded_by")
        .when(b2 === a1, "met_by")
        .when(a1 < b1 && a2 > b2, "contains")
        .when(a1 > b1 && a2 < b2, "during")
        .when(a1 < b1, "overlaps")
        .otherwise("overlapped_by")
      sess("click", "a").join(sess("error", "b"), "user_id")
        .select(col("user_id"), rel.as("relation"))
        .groupBy("relation")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("user_id")).as("user_checksum"))
        .orderBy("relation")
    },


    // Bollinger-band position of daily revenue per type: 20-day rolling
    // mean ± 2σ, breach tests cross-multiplied so no mean/stddev float
    // ever exists — (20x − S)² vs 4·(20·Σx² − S²) compares (x−μ)² to
    // (2σ)² exactly. Emits every complete-window day with its band
    // verdict; the windowed pass runs over days×types rows whatever the
    // event count underneath.
    "bollinger_breaches" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(floor(col("value") * 100)).as("x"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-19, 0)
      // Squares in DECIMAL(38,0) (ADVICE r10): x·x and ssum·ssum as
      // BIGINT products wrap silently past |x| ~ 3e9 cents/day in
      // non-ANSI Spark while the oracle errors — 38 digits keep the
      // verdict exact to |x| ~ 1e18. The shipped square columns are
      // micro-scaled (DIV 10⁶, truncation identical in both engines) so
      // they stay exact BIGINTs to |x| ~ 2e13 cents/day per type.
      daily.withColumn("cnt", count(lit(1)).over(w))
        .withColumn("ssum", sum("x").over(w))
        .withColumn("q",
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).over(w))
        .filter(col("cnt") === 20)
        .withColumn("dev", lit(20L) * col("x") - col("ssum"))
        .withColumn("dev_sq", expr("CAST(dev AS DECIMAL(38,0)) * dev"))
        .withColumn("band_sq", expr(
          "4 * (20 * q - CAST(ssum AS DECIMAL(38,0)) * ssum)"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("x").as("cents"),
          expr("CAST(dev_sq DIV 1000000 AS BIGINT)").as("dev_sq_micro"),
          expr("CAST(band_sq DIV 1000000 AS BIGINT)").as("band_sq_micro"),
          when(col("dev_sq") <= col("band_sq"), "in")
            .when(col("dev") > 0, "upper").otherwise("lower").as("band"))
        .orderBy("event_type", "day")
    },


    // Candlestick pattern census on 5-minute K-bars (the reference's bar
    // domain): doji, bullish/bearish engulfing, hammer — every test a
    // pure integer comparison on cents OHLC (body·20 ≤ range is the 5%
    // doji rule cross-multiplied). Bars are resampled once (the A1
    // recipe on cents), the lag pass runs over bars — bounded by the
    // time axis, not the tick count. Thin bars (volume < 3) are
    // excluded from single-bar patterns so a 1-tick bar doesn't count
    // as a doji.
    "candlestick_patterns" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val bars = graft.ops.Resample.ohlcvFromTicks(
        Tables.events(s, d).withColumn("cents",
          floor(col("value") * 100)),
        "cents", "5 minutes", keys = Seq(col("event_type")))
      val w = Window.partitionBy("event_type").orderBy("ts")
      bars
        .withColumn("po", lag("open", 1).over(w))
        .withColumn("pc", lag("close", 1).over(w))
        .withColumn("body", abs(col("close") - col("open")))
        .groupBy("event_type").agg(
          count(lit(1)).as("n_bars"),
          sum(when(col("volume") >= 3 && col("high") > col("low") &&
            col("body") * 20 <= col("high") - col("low"), 1L)
            .otherwise(0L)).as("n_doji"),
          sum(when(col("pc") < col("po") && col("close") > col("open") &&
            col("open") <= col("pc") && col("close") >= col("po"), 1L)
            .otherwise(0L)).as("n_bullish_engulfing"),
          sum(when(col("pc") > col("po") && col("close") < col("open") &&
            col("open") >= col("pc") && col("close") <= col("po"), 1L)
            .otherwise(0L)).as("n_bearish_engulfing"),
          sum(when(col("volume") >= 3 && col("high") > col("low") &&
            least(col("open"), col("close")) - col("low") >=
              lit(2L) * col("body") &&
            col("high") - greatest(col("open"), col("close")) <=
              col("body"), 1L).otherwise(0L)).as("n_hammer"))
        .orderBy("event_type")
    }
  )

  protected def timeSeriesOracles: Map[String, String] = Map(

    "resample_5m_ohlcv" -> ohlcvOracle
      .replace("%BUCKET%", "INTERVAL '5 minutes'").replace("%OFF%", ""),


    "resample_60m_offset45" -> ohlcvOracle
      .replace("%BUCKET%", "INTERVAL '60 minutes'")
      .replace("%OFF%", ", INTERVAL '45 minutes'"),


    "resample_60m" -> ohlcvOracle
      .replace("%BUCKET%", "INTERVAL '60 minutes'").replace("%OFF%", ""),


    // Top-2 types by frequency (type-name tiebreak), joined back.
    "dpp_runtime_prune" ->
      """WITH freq AS (
        |  SELECT event_type, count(*) AS type_total FROM events GROUP BY 1),
        |dim AS (SELECT event_type, type_total,
        |          row_number() OVER (ORDER BY type_total DESC, event_type)
        |            AS rk
        |        FROM freq)
        |SELECT e.event_type, count(*) AS n,
        |  CAST(sum(CAST(floor(e.value * 100) AS BIGINT)) AS BIGINT)
        |    AS value_cents,
        |  CAST(max(dim.type_total) AS BIGINT) AS type_total
        |FROM events e JOIN dim ON e.event_type = dim.event_type
        |WHERE dim.rk <= 2
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // lead() over the identical (ts, event_id) order; DuckDB strftime
    // matches the Spark date_format for these wall-clock values.
    "scd2_intervals" ->
      """SELECT user_id, event_type, round(value, 6) AS value,
        |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
        |  strftime(lead(ts, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id), '%Y-%m-%d %H:%M:%S') AS valid_to,
        |  (lead(ts, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id)) IS NULL AS is_current
        |FROM events
        |ORDER BY user_id, valid_from, event_type""".stripMargin,


    // The same chained conditional-min steps; counts are integers.
    "funnel_conversion" ->
      """WITH t1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |t2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
        |  WHERE e.event_type = 'view' GROUP BY e.user_id),
        |t3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t2
        |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT '1_signup' AS step, count(*) AS n_users FROM t1
        |UNION ALL SELECT '2_view_after_signup', count(*) FROM t2
        |UNION ALL SELECT '3_purchase_after_view', count(*) FROM t3
        |ORDER BY step""".stripMargin,


    // Identical integer units (cents × 2^(10-d)); power(2, int) is exact
    // in double, so the unit column is the same integer in both engines.
    "time_decay_features" ->
      """WITH e AS (
        |  SELECT user_id,
        |    CAST(round(value * 100) AS BIGINT) *
        |      CAST(power(2, 10 - least(greatest(
        |        date_diff('day', CAST(ts AS DATE), DATE '2024-01-31'),
        |        0), 10)) AS BIGINT) AS units
        |  FROM events)
        |SELECT user_id, count(*) AS n_events,
        |  CAST(sum(units) AS BIGINT) AS decay_units
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,


    // Long-form reshape of the 60-min bars: metric value pairs via UNION
    // ALL (plain ANSI mirror of Spark's native unpivot).
    "unpivot_bars" -> {
      val base = ohlcvOracle
        .replace("%BUCKET%", "INTERVAL '60 minutes'").replace("%OFF%", "")
        .replace("ORDER BY event_type, ts", "")
      s"""WITH b AS ($base)
         |SELECT event_type, ts, 'open' AS metric, open AS value FROM b
         |UNION ALL
         |SELECT event_type, ts, 'high', high FROM b
         |UNION ALL
         |SELECT event_type, ts, 'low', low FROM b
         |UNION ALL
         |SELECT event_type, ts, 'close', close FROM b
         |ORDER BY event_type, ts, metric""".stripMargin
    },


    "union_predicted_contract" ->
      """WITH cfg AS (
        |  SELECT strftime(o_orderdate, '%Y%m') AS contract_year_month,
        |    CAST(count(*) AS DOUBLE) AS next_contract_diff,
        |    min(o_orderdate) AS start_k, max(o_orderdate) AS settle_k,
        |    100.0 AS accumulated_contract_diff
        |  FROM orders GROUP BY 1),
        |last AS (
        |  SELECT * FROM cfg ORDER BY contract_year_month DESC LIMIT 1),
        |nextm AS (
        |  SELECT CAST(strptime(contract_year_month, '%Y%m') AS DATE)
        |    + INTERVAL 1 MONTH AS m1, * FROM last),
        |predicted AS (
        |  SELECT strftime(m1, '%Y%m') AS contract_year_month,
        |    CAST(NULL AS DOUBLE) AS next_contract_diff,
        |    settle_k + INTERVAL 5 MINUTES AS start_k,
        |    CAST(CAST(date_trunc('month', m1) AS DATE)
        |      + CAST((3 - dayofweek(CAST(date_trunc('month', m1) AS DATE)) + 7) % 7 + 14 AS INTEGER)
        |      AS TIMESTAMP) + INTERVAL 13 HOURS + INTERVAL 25 MINUTES AS settle_k,
        |    accumulated_contract_diff + next_contract_diff AS accumulated_contract_diff
        |  FROM nextm)
        |SELECT contract_year_month, next_contract_diff, accumulated_contract_diff,
        |  strftime(start_k, '%Y-%m-%d %H:%M:%S') AS start_k,
        |  strftime(settle_k, '%Y-%m-%d %H:%M:%S') AS settle_k
        |FROM (SELECT * FROM cfg UNION ALL SELECT contract_year_month,
        |      next_contract_diff, start_k, settle_k, accumulated_contract_diff
        |      FROM predicted)
        |ORDER BY contract_year_month""".stripMargin,


    "session_filter_day" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_type, value
        |FROM events
        |WHERE strftime(ts, '%H:%M') >= '08:45' AND strftime(ts, '%H:%M') <= '13:45'
        |ORDER BY event_id""".stripMargin,


    "session_filter_night" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_type, value
        |FROM events
        |WHERE strftime(ts, '%H:%M') >= '15:00' OR strftime(ts, '%H:%M') <= '05:00'
        |ORDER BY event_id""".stripMargin,


    "session_labels" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  CASE WHEN hour(ts) BETWEEN 8 AND 13 THEN strftime(ts, '%Y-%m-%d') || '_D'
        |       WHEN hour(ts) >= 15 THEN strftime(ts, '%Y-%m-%d') || '_N'
        |       WHEN hour(ts) < 5 THEN strftime(ts - INTERVAL 1 DAY, '%Y-%m-%d') || '_N'
        |       ELSE 'UNKNOWN' END AS session_id,
        |  CASE WHEN hour(ts) BETWEEN 8 AND 13 THEN 'D'
        |       WHEN hour(ts) >= 15 OR hour(ts) < 5 THEN 'N'
        |       ELSE 'UNKNOWN' END AS market_type
        |FROM events ORDER BY event_id""".stripMargin,


    "interval_join_backadjust" ->
      s"""WITH dim AS ($monthDimSql)
         |SELECT l.l_orderkey, l.l_linenumber,
         |  strftime(l.l_shipdate, '%Y-%m-%d %H:%M:%S') AS ts,
         |  coalesce(dim.contract_year_month, '') AS contract_year_month,
         |  round(l.l_extendedprice + coalesce(dim.accumulated_contract_diff, 0), 2)
         |    AS adj_close
         |FROM lineitem l LEFT JOIN dim
         |  ON l.l_shipdate >= dim.start_k AND l.l_shipdate <= dim.settle_k
         |ORDER BY l_orderkey, l_linenumber, ts""".stripMargin,


    "watermark_incremental" ->
      """SELECT l_orderkey, l_linenumber,
        |  strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS ts, l_quantity
        |FROM lineitem
        |WHERE l_shipdate > (SELECT max(o_orderdate) FROM orders)
        |ORDER BY l_orderkey, l_linenumber, ts""".stripMargin,


    "union_sessions" ->
      """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, market_type, value
        |FROM (
        |  SELECT event_id, ts, 'D' AS market_type, value FROM events
        |  WHERE strftime(ts, '%H:%M') >= '08:45' AND strftime(ts, '%H:%M') <= '13:45'
        |  UNION ALL
        |  SELECT event_id, ts, 'N' AS market_type, value FROM events
        |  WHERE strftime(ts, '%H:%M') >= '15:00' OR strftime(ts, '%H:%M') <= '05:00')
        |ORDER BY ts, event_id""".stripMargin,


    "rollover_prefix_sum" ->
      """WITH monthly AS (
        |  SELECT strftime(o_orderdate, '%Y%m') AS contract_year_month,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS month_diff
        |  FROM orders GROUP BY 1)
        |SELECT contract_year_month,
        |  CAST(month_diff AS DOUBLE) AS month_diff,
        |  CAST(coalesce(sum(month_diff) OVER (ORDER BY contract_year_month
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
        |    AS accumulated_diff
        |FROM monthly ORDER BY contract_year_month""".stripMargin,


    "asof_join_clicks" ->
      """WITH trades AS (
        |  SELECT event_id, user_id, ts, value FROM events WHERE event_type <> 'click'),
        |quotes AS (
        |  -- keep the greatest quote_id per (user_id, ts): mirrors the
        |  -- Spark side's deterministic tie-break on duplicate timestamps
        |  SELECT user_id, ts, value AS quote_value, event_id AS quote_id
        |  FROM events WHERE event_type = 'click'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                             ORDER BY event_id DESC) = 1)
        |SELECT t.event_id, t.user_id, strftime(t.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  t.value, q.quote_value, q.quote_id
        |FROM trades t ASOF LEFT JOIN quotes q
        |  ON t.user_id = q.user_id AND t.ts >= q.ts
        |ORDER BY event_id""".stripMargin,


    "sessionize_gap" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR lag(ts) OVER w + INTERVAL 1800 SECONDS < ts THEN 1
        |         ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |idx AS (
        |  SELECT user_id, ts,
        |    -- CAST: DuckDB widens windowed sum(INTEGER) to HUGEINT; Spark emits BIGINT
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1 AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, session_idx,
        |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
        |  count(*) AS n_events
        |FROM idx GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin,


    // row_number dedup ≡ Spark's max_by(value, struct(ts, event_id));
    // IGNORE-NULLS running last_value ≡ Spark's last(..., ignoreNulls).
    "resample_fill_forward" ->
      """WITH ranked AS (
        |  SELECT event_type, time_bucket(INTERVAL 5 MINUTE, ts) AS bts, value,
        |    row_number() OVER (PARTITION BY event_type,
        |                         time_bucket(INTERVAL 5 MINUTE, ts)
        |                       ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events),
        |base AS (SELECT event_type, bts, value AS close FROM ranked WHERE rn = 1),
        |bounds AS (SELECT event_type, min(bts) AS lo, max(bts) AS hi
        |           FROM base GROUP BY 1),
        |grid AS (
        |  SELECT event_type,
        |    unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP,
        |                           INTERVAL 5 MINUTE)) AS bts
        |  FROM bounds),
        |j AS (
        |  SELECT g.event_type, g.bts, b.close FROM grid g
        |  LEFT JOIN base b ON g.event_type = b.event_type AND g.bts = b.bts)
        |SELECT event_type, strftime(bts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  last_value(close IGNORE NULLS) OVER (PARTITION BY event_type
        |    ORDER BY bts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS close,
        |  close IS NULL AS is_filled
        |FROM j ORDER BY event_type, ts""".stripMargin,


    // Same QI buckets; floor(value/10) — NOT CAST(value AS INT), which
    // rounds in DuckDB but truncates in Spark — keeps the bucket rule
    // bit-identical in both engines.
    "l_diversity_audit" ->
      """SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |  hour(ts) AS hr, CAST(floor(value / 10) AS BIGINT) AS value_bucket,
        |  count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events
        |GROUP BY 1, 2, 3, 4 HAVING count(DISTINCT user_id) < 3
        |ORDER BY event_type, day, hr, value_bucket""".stripMargin,


    // First signup per user, first purchase at-or-after it; delays in
    // exact epoch millis; quantile_cont ≡ Spark percentile on integers.
    "convert_time_quantiles" ->
      """WITH su AS (
        |  SELECT user_id, min(ts) AS signup_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |fp AS (
        |  SELECT e.user_id, min(e.ts) AS first_p
        |  FROM events e JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= su.signup_ts
        |  GROUP BY 1)
        |SELECT
        |  CAST(floor(date_diff('day', DATE '2024-01-01',
        |    CAST(su.signup_ts AS DATE)) / 7) AS INT) AS cohort_week,
        |  count(*) AS n_signups,
        |  count(fp.first_p) AS n_converted,
        |  round(quantile_cont(epoch_ms(fp.first_p) - epoch_ms(su.signup_ts),
        |    0.5), 6) AS med_delay_ms,
        |  round(quantile_cont(epoch_ms(fp.first_p) - epoch_ms(su.signup_ts),
        |    0.9), 6) AS p90_delay_ms
        |FROM su LEFT JOIN fp ON su.user_id = fp.user_id
        |GROUP BY 1 ORDER BY cohort_week""".stripMargin,


    // Native ASOF on the strict forward bound after the same tie dedup
    // (lowest click id per (user, ts) — the forward scan's first row).
    "asof_forward_next_touch" ->
      """WITH purchases AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |clicks AS (
        |  SELECT user_id, ts, event_id AS next_click_id
        |  FROM events WHERE event_type = 'click'
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                             ORDER BY event_id) = 1)
        |SELECT p.event_id, p.user_id,
        |  strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts, c.next_click_id
        |FROM purchases p ASOF LEFT JOIN clicks c
        |  ON p.user_id = c.user_id AND p.ts < c.ts
        |ORDER BY event_id""".stripMargin,


    // Session construction copied verbatim from the sessionize_gap
    // oracle, then the ordinal window and the same aggregate.
    "session_ordinal_features" ->
      """WITH flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR lag(ts) OVER w + INTERVAL 1800 SECONDS < ts THEN 1
        |         ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |idx AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
        |      AS BIGINT) AS session_idx
        |  FROM flagged),
        |o AS (
        |  SELECT user_id, session_idx, ts, event_id,
        |    row_number() OVER (PARTITION BY user_id, session_idx
        |                       ORDER BY ts, event_id) AS ordinal
        |  FROM idx)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  CAST(sum(ordinal * event_id) AS BIGINT) AS ord_checksum,
        |  max(epoch_ms(ts)) - min(epoch_ms(ts)) AS duration_ms
        |FROM o GROUP BY 1, 2 ORDER BY user_id, session_idx""".stripMargin,


    // Dense grid, integer moment sums, integer slope rational + the
    // identical final quotient.
    "daily_trend_slope" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |grid AS (
        |  SELECT t.event_type,
        |    date_diff('day', DATE '2024-01-01', d.day) AS x,
        |    coalesce(daily.n, 0) AS y
        |  FROM (SELECT DISTINCT day FROM daily) d
        |  CROSS JOIN (SELECT DISTINCT event_type FROM daily) t
        |  LEFT JOIN daily ON daily.event_type = t.event_type
        |                 AND daily.day = d.day),
        |m AS (
        |  SELECT event_type, count(*) AS nd,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM grid GROUP BY 1)
        |SELECT event_type, nd,
        |  nd * sxy - sx * sy AS slope_num,
        |  nd * sxx - sx * sx AS slope_den,
        |  round((nd * sxy - sx * sy)::DOUBLE / (nd * sxx - sx * sx), 6)
        |    AS slope
        |FROM m ORDER BY event_type""".stripMargin,


    // Both native ASOF directions with the operators' tie rules
    // (backward: greatest id at equal ts; forward: lowest), then the
    // identical nearest CASE; deltas in exact epoch-micros.
    "asof_nearest_touch" ->
      """WITH p AS (
        |  SELECT event_id AS p_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |tb AS (
        |  SELECT user_id, ts, event_type AS b_type, event_id AS b_id
        |  FROM events WHERE event_type IN ('click', 'view')
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                             ORDER BY event_id DESC) = 1),
        |tf AS (
        |  SELECT user_id, ts, event_type AS f_type, event_id AS f_id
        |  FROM events WHERE event_type IN ('click', 'view')
        |  QUALIFY row_number() OVER (PARTITION BY user_id, ts
        |                             ORDER BY event_id) = 1),
        |b AS (
        |  SELECT p.p_id, p.user_id, p.ts, t.ts AS b_ts, t.b_type, t.b_id
        |  FROM p ASOF LEFT JOIN tb t
        |    ON p.user_id = t.user_id AND p.ts >= t.ts),
        |f AS (
        |  SELECT p.p_id, t.ts AS f_ts, t.f_type, t.f_id
        |  FROM p ASOF LEFT JOIN tf t
        |    ON p.user_id = t.user_id AND p.ts < t.ts),
        |j AS (
        |  SELECT b.*, f.f_ts, f.f_type, f.f_id,
        |    epoch_us(b.ts) - epoch_us(b.b_ts) AS db,
        |    epoch_us(f.f_ts) - epoch_us(b.ts) AS df
        |  FROM b JOIN f USING (p_id)),
        |c AS (
        |  SELECT *,
        |    CASE WHEN b_id IS NULL AND f_id IS NULL THEN 'none'
        |         WHEN f_id IS NULL OR (b_id IS NOT NULL AND db <= df)
        |           THEN 'backward'
        |         ELSE 'forward' END AS dir
        |  FROM j)
        |SELECT coalesce(CASE WHEN dir = 'backward' THEN b_type
        |                     WHEN dir = 'forward' THEN f_type END, 'none')
        |    AS channel,
        |  dir, count(*) AS n_purchases,
        |  CAST(coalesce(sum(CASE WHEN dir = 'backward' THEN b_id
        |                         WHEN dir = 'forward' THEN f_id END), 0)
        |    AS BIGINT) AS id_checksum,
        |  CAST(sum(CASE WHEN dir = 'backward' THEN db
        |                WHEN dir = 'forward' THEN df ELSE 0 END) AS BIGINT)
        |    AS delta_us_sum
        |FROM c GROUP BY 1, 2 ORDER BY channel, dir""".stripMargin,


    // Integer-scaled CUSUM: S_k = D·cum_k − k·total, argmax |S|,
    // earliest-day tiebreak.
    "cusum_changepoint" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |cus AS (
        |  SELECT event_type, day,
        |    CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS total,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS n_days,
        |    CAST(sum(c) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS cum,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS k
        |  FROM daily),
        |s AS (
        |  SELECT event_type, day, n_days,
        |    abs(n_days * cum - k * total) AS s_abs,
        |    max(abs(n_days * cum - k * total))
        |      OVER (PARTITION BY event_type) AS m
        |  FROM cus)
        |SELECT event_type, strftime(min(day), '%Y-%m-%d') AS change_day,
        |  CAST(max(m) AS BIGINT) AS s_abs,
        |  CAST(max(n_days) AS BIGINT) AS n_days
        |FROM s WHERE s_abs = m
        |GROUP BY event_type ORDER BY event_type""".stripMargin,


    // END-sorted greedy via a recursive CTE over per-user interval
    // ranks, carrying (cnt, last_end).
    "interval_scheduling_max_sessions" ->
      """WITH RECURSIVE iv AS (
        |  SELECT user_id, epoch_us(ts) AS st,
        |    epoch_us(ts) + CAST(floor(value) AS BIGINT) * 60 * 1000000
        |      AS en
        |  FROM events WHERE event_type = 'purchase'),
        |idx AS (
        |  SELECT user_id, st, en,
        |    row_number() OVER (PARTITION BY user_id ORDER BY en, st) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM iv),
        |rec AS (
        |  SELECT user_id, rn AS t, n,
        |    CASE WHEN st >= -1 THEN CAST(1 AS BIGINT) ELSE 0 END AS cnt,
        |    en AS last_end
        |  FROM idx WHERE rn = 1
        |  UNION ALL
        |  SELECT i.user_id, i.rn, r.n,
        |    CASE WHEN i.st >= r.last_end THEN r.cnt + 1 ELSE r.cnt END,
        |    CASE WHEN i.st >= r.last_end THEN i.en ELSE r.last_end END
        |  FROM rec r JOIN idx i
        |    ON i.user_id = r.user_id AND i.rn = r.t + 1)
        |SELECT user_id, CAST(n AS BIGINT) AS n_intervals,
        |  cnt AS max_nonoverlap
        |FROM rec WHERE t = n ORDER BY user_id""".stripMargin,


    // The IDENTICAL recursive SQL, modulo the view name.
    "recursive_cte_reachability" ->
      """WITH RECURSIVE edges AS (
        |  SELECT DISTINCT prev_type AS src, event_type AS dst FROM (
        |    SELECT event_type,
        |      lag(event_type) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS prev_type
        |    FROM events)
        |  WHERE prev_type IS NOT NULL AND prev_type <> event_type),
        |reach(src, dst, hops) AS (
        |  SELECT src, dst, 1 FROM edges
        |  UNION ALL
        |  SELECT r.src, e.dst, r.hops + 1
        |  FROM reach r JOIN edges e ON r.dst = e.src
        |  WHERE r.hops < 5 AND r.src <> e.dst),
        |m AS (SELECT src, dst, min(hops) AS min_hops
        |      FROM reach GROUP BY src, dst)
        |SELECT src, dst, CAST(min_hops AS INT) AS min_hops
        |FROM m ORDER BY src, dst""".stripMargin,


    // Dimension-sized calendar grid left-joined to the sparse aggregate.
    "calendar_densify_zero_fill" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
        |      FROM events),
        |grid AS (
        |  SELECT t.event_type, CAST(g.day AS DATE) AS day
        |  FROM (SELECT DISTINCT event_type FROM daily) t, b,
        |    LATERAL (SELECT unnest(generate_series(b.d0, b.d1,
        |      INTERVAL 1 DAY)) AS day) g)
        |SELECT grid.event_type AS event_type,
        |  strftime(grid.day, '%Y-%m-%d') AS day,
        |  CAST(coalesce(daily.n, 0) AS BIGINT) AS n,
        |  daily.n IS NULL AS is_gap
        |FROM grid LEFT JOIN daily
        |  ON grid.event_type = daily.event_type AND grid.day = daily.day
        |ORDER BY 1, 2""".stripMargin,


    // The same 8-term lag chain, weights 2^7..2^0, edge-renormalized.
    "ewma_daily_counts" -> {
      val num = (0 to 7).map { j =>
        val w = 1L << (7 - j)
        s"CASE WHEN lag(c, $j) OVER wo IS NULL THEN 0 " +
          s"ELSE lag(c, $j) OVER wo * $w END"
      }.mkString(" + ")
      val den = (0 to 7).map { j =>
        val w = 1L << (7 - j)
        s"CASE WHEN lag(c, $j) OVER wo IS NULL THEN 0 ELSE $w END"
      }.mkString(" + ")
      s"""WITH daily AS (
         |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
         |  FROM events GROUP BY 1, 2),
         |t AS (
         |  SELECT event_type, day, c,
         |    CAST($num AS BIGINT) AS num, CAST($den AS BIGINT) AS den
         |  FROM daily
         |  WINDOW wo AS (PARTITION BY event_type ORDER BY day))
         |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, c,
         |  num * 1000 // den AS ewma_milli
         |FROM t ORDER BY event_type, day""".stripMargin
    },


    // DuckDB ASOF LEFT JOIN + the same 10-minute staleness CASE.
    "asof_tolerance_join" ->
      """WITH p AS (
        |  SELECT user_id, ts, event_id FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts AS cts, event_id AS click_id FROM events
        |  WHERE event_type = 'click')
        |SELECT p.user_id, strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts,
        |  p.event_id,
        |  CASE WHEN c.cts >= p.ts - INTERVAL 10 MINUTES
        |       THEN c.click_id END AS click_id,
        |  CASE WHEN c.cts >= p.ts - INTERVAL 10 MINUTES
        |       THEN strftime(c.cts, '%Y-%m-%d %H:%M:%S') END AS click_ts
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.cts <= p.ts
        |ORDER BY p.event_id""".stripMargin,


    // Same lag + permille delta + per-day (delta desc, type) top-1.
    "trending_types_daily" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, day, c,
        |    lag(c) OVER (PARTITION BY event_type ORDER BY day) AS prev
        |  FROM daily),
        |g AS (
        |  SELECT event_type, day, c, prev,
        |    (c - prev) * 1000 // prev AS delta_permille
        |  FROM l WHERE prev IS NOT NULL)
        |SELECT strftime(day, '%Y-%m-%d') AS day, event_type AS top_type,
        |  c, prev, delta_permille
        |FROM g
        |QUALIFY row_number() OVER (PARTITION BY day
        |  ORDER BY delta_permille DESC, event_type) = 1
        |ORDER BY day""".stripMargin,


    // Same segment split + collapsed boundary domain + closed-interval
    // candidate rule (cum_before + ups).
    "max_concurrent_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR lag(ts) OVER w + INTERVAL 1800 SECONDS < ts THEN 1
        |         ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |idx AS (
        |  SELECT user_id, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM flagged),
        |sess AS (
        |  SELECT user_id, session_idx, min(ts) AS session_start,
        |    max(ts) AS session_end
        |  FROM idx GROUP BY 1, 2),
        |seg0 AS (
        |  SELECT session_start, session_end,
        |    CAST(unnest(generate_series(CAST(session_start AS DATE),
        |      CAST(session_end AS DATE), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM sess),
        |seg AS (
        |  SELECT day,
        |    greatest(session_start, CAST(day AS TIMESTAMP)) AS seg_start,
        |    least(session_end,
        |      CAST(day + 1 AS TIMESTAMP) - INTERVAL 1 MICROSECOND)
        |      AS seg_end
        |  FROM seg0),
        |b AS (
        |  SELECT day, ts, CAST(sum(delta) AS BIGINT) AS net,
        |    CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ups
        |  FROM (
        |    SELECT day, seg_start AS ts, 1 AS delta FROM seg
        |    UNION ALL
        |    SELECT day, seg_end AS ts, -1 AS delta FROM seg)
        |  GROUP BY 1, 2),
        |cnd AS (
        |  SELECT day, ts,
        |    CAST(sum(net) OVER (PARTITION BY day ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - net + ups AS BIGINT) AS cand
        |  FROM b),
        |pk AS (SELECT day, max(cand) AS peak FROM cnd GROUP BY 1)
        |SELECT strftime(pk.day, '%Y-%m-%d') AS day, pk.peak,
        |  strftime(min(cnd.ts), '%Y-%m-%d %H:%M:%S') AS first_peak
        |FROM pk JOIN cnd ON cnd.day = pk.day AND cnd.cand = pk.peak
        |GROUP BY 1, 2 ORDER BY day""".stripMargin,


    // Same gap sessionization per type, closed-interval overlap pairs,
    // exact epoch-micros lengths.
    "session_overlap_seconds" ->
      """WITH flagged AS (
        |  SELECT user_id, event_type, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR lag(ts) OVER w + INTERVAL 43200 SECONDS < ts THEN 1
        |         ELSE 0 END AS is_new
        |  FROM events WHERE event_type IN ('click', 'view')
        |  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts)),
        |idx AS (
        |  SELECT user_id, event_type, ts,
        |    sum(is_new) OVER (PARTITION BY user_id, event_type ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_idx
        |  FROM flagged),
        |sess AS (
        |  SELECT user_id, event_type, session_idx,
        |    min(ts) AS s, max(ts) AS e
        |  FROM idx GROUP BY 1, 2, 3),
        |pairs AS (
        |  SELECT c.user_id,
        |    epoch_us(least(c.e, v.e)) - epoch_us(greatest(c.s, v.s))
        |      AS ov_us
        |  FROM sess c JOIN sess v ON c.user_id = v.user_id
        |  WHERE c.event_type = 'click' AND v.event_type = 'view'
        |    AND c.s <= v.e AND v.s <= c.e)
        |SELECT user_id, count(*) AS n_pairs,
        |  CAST(sum(ov_us) AS BIGINT) // 1000000 AS overlap_seconds
        |FROM pairs GROUP BY 1 ORDER BY user_id""".stripMargin,


    // Same exact-rational Simpson index and dominant-type tiebreak.
    "behavior_diversity_simpson" ->
      """WITH ut AS (
        |  SELECT user_id, event_type, count(*) AS c FROM events
        |  GROUP BY 1, 2),
        |dom AS (
        |  SELECT user_id, event_type AS dominant_type FROM (
        |    SELECT user_id, event_type,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY c DESC, event_type) AS rk
        |    FROM ut) WHERE rk = 1),
        |agg AS (
        |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
        |    count(*) AS n_types, CAST(sum(c * c) AS BIGINT) AS ss
        |  FROM ut GROUP BY 1)
        |SELECT a.user_id, a.n_events, a.n_types,
        |  (a.n_events * a.n_events - a.ss) * 1000000
        |    // (a.n_events * a.n_events) AS simpson_micro,
        |  d.dominant_type
        |FROM agg a JOIN dom d USING (user_id)
        |ORDER BY a.user_id""".stripMargin,


    // Same scaled centering; NULL lead drops the last pair from the
    // numerator in both engines.
    "autocorr_lag1_daily" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |      // 100 AS v
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(sum(v) AS BIGINT) AS s_sum,
        |    count(*) AS n
        |  FROM daily GROUP BY 1),
        |led AS (
        |  SELECT d.event_type, t.n, t.s_sum, d.v,
        |    lead(d.v) OVER (PARTITION BY d.event_type ORDER BY d.day)
        |      AS v_next
        |  FROM daily d JOIN tot t USING (event_type))
        |SELECT event_type, n,
        |  CAST(sum((n * v - s_sum) *
        |    CASE WHEN v_next IS NOT NULL THEN n * v_next - s_sum END)
        |    AS BIGINT) AS num_scaled,
        |  CAST(sum((n * v - s_sum) * (n * v - s_sum)) AS BIGINT)
        |    AS den_scaled
        |FROM led GROUP BY 1, 2 ORDER BY event_type""".stripMargin,


    // Median pairwise slope over the collapsed day domain; double slope
    // orders, (dy, dx) breaks ties, integers answer.
    "theil_sen_daily_trend" ->
      """WITH daily AS (
        |  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
        |         count(*) AS y
        |  FROM events GROUP BY 1),
        |pairs AS (
        |  SELECT CAST(b.y - a.y AS BIGINT) AS dy,
        |         CAST(b.x - a.x AS BIGINT) AS dx
        |  FROM daily a JOIN daily b ON a.x < b.x),
        |stats AS (SELECT count(*) AS n_pairs FROM pairs),
        |r AS (SELECT dy, dx, row_number() OVER (
        |        ORDER BY dy::DOUBLE / dx, dy, dx) AS rk FROM pairs)
        |SELECT (SELECT count(*) FROM daily) AS n_days, s.n_pairs,
        |  r.dy AS med_dy, r.dx AS med_dx,
        |  CAST(r.dy * 1000000 // r.dx AS BIGINT) AS slope_micro
        |FROM r CROSS JOIN stats s WHERE r.rk = (s.n_pairs + 1) // 2"""
        .stripMargin,


    // Same mask rule and IGNORE-NULLS neighbor frames; integer
    // interpolation with explicit parens (DIV binds multiplicatively).
    "linear_interpolate_gaps" ->
      """WITH h AS (
        |  SELECT date_diff('hour', TIMESTAMP '2024-01-01', ts) AS hidx,
        |         count(*) AS v
        |  FROM events GROUP BY 1),
        |m AS (SELECT hidx, v, hidx % 11 IN (3, 4, 5) AS masked FROM h),
        |ctx AS (SELECT hidx, v, masked,
        |  last_value(CASE WHEN NOT masked THEN hidx END IGNORE NULLS)
        |    OVER (ORDER BY hidx
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pt,
        |  last_value(CASE WHEN NOT masked THEN v END IGNORE NULLS)
        |    OVER (ORDER BY hidx
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
        |  first_value(CASE WHEN NOT masked THEN hidx END IGNORE NULLS)
        |    OVER (ORDER BY hidx
        |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nt,
        |  first_value(CASE WHEN NOT masked THEN v END IGNORE NULLS)
        |    OVER (ORDER BY hidx
        |          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
        |  FROM m)
        |SELECT hidx, CAST(v AS BIGINT) AS v_true,
        |  CAST(pv * 1000000 + (((nv - pv) * (hidx - pt) * 1000000)
        |       // (nt - pt)) AS BIGINT) AS interp_micro,
        |  CAST(abs(pv * 1000000 + (((nv - pv) * (hidx - pt) * 1000000)
        |       // (nt - pt)) - v * 1000000) AS BIGINT) AS abs_err_micro
        |FROM ctx WHERE masked AND pt IS NOT NULL AND nt IS NOT NULL
        |ORDER BY hidx""".stripMargin,


    // ISO weekday, exact cross-multiplied index.
    "seasonal_weekday_index" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |byDow AS (
        |  SELECT CAST(isodow(day) AS INT) AS isodow, count(*) AS n_days,
        |    CAST(sum(cents) AS BIGINT) AS cents
        |  FROM daily GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_days) AS BIGINT) AS total_days,
        |        CAST(sum(cents) AS BIGINT) AS total_cents FROM byDow)
        |SELECT isodow, n_days, cents,
        |  cents * total_days * 1000 // (n_days * total_cents)
        |    AS index_permille
        |FROM byDow CROSS JOIN tot ORDER BY isodow""".stripMargin,


    // Same weekday-wheel decomposition.
    "business_days_lag" ->
      """WITH f AS (
        |  SELECT l_orderkey, o_orderdate, min(l_shipdate) AS ship
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_shipdate >= o_orderdate GROUP BY 1, 2),
        |g AS (SELECT l_orderkey,
        |    date_diff('day', o_orderdate, ship) AS cd,
        |    isodow(o_orderdate) AS sd
        |  FROM f WHERE date_diff('day', o_orderdate, ship) <= 60),
        |h AS (SELECT l_orderkey,
        |  (cd // 7) * 5 + len([x for x in range(1, (cd % 7) + 1)
        |    if ((sd - 1 + x) % 7) + 1 NOT IN (6, 7)]) AS bus_days
        |  FROM g)
        |SELECT CAST(bus_days AS BIGINT) AS bus_days, count(*) AS n_orders,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum
        |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,


    // Same 7-day window median, per-weekday lower median of detrended.
    "stl_lite_decomposition" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS v
        |  FROM events GROUP BY 1),
        |tr AS (SELECT day, v,
        |  list_sort(list(v) OVER (ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS wl,
        |  count(*) OVER (ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wn
        |  FROM daily),
        |t2 AS (SELECT day, v, wl[4] AS trend, v - wl[4] AS detr
        |       FROM tr WHERE wn = 7),
        |seas AS (SELECT isodow(day) AS dow,
        |  list_sort(list(detr))[(count(*) + 1) // 2] AS seasonal
        |  FROM t2 GROUP BY 1)
        |SELECT strftime(t2.day, '%Y-%m-%d') AS day, v, trend, s.seasonal,
        |  v - trend - s.seasonal AS remainder
        |FROM t2 JOIN seas s ON s.dow = isodow(t2.day)
        |ORDER BY day""".stripMargin,


    // Same sweep (starts before ends at equal times), same 5-min spans.
    "interval_union_coverage" ->
      """WITH iv AS (
        |  SELECT CAST(ts AS DATE) AS day, epoch_us(ts) AS st,
        |    epoch_us(ts) + 300000000 AS en
        |  FROM events WHERE event_type = 'click'),
        |pts AS (
        |  SELECT day, st AS t, 1 AS dd FROM iv
        |  UNION ALL SELECT day, en, -1 FROM iv),
        |sw AS (
        |  SELECT day, t,
        |    sum(dd) OVER (PARTITION BY day ORDER BY t, dd DESC
        |                  ROWS UNBOUNDED PRECEDING) AS active,
        |    lead(t) OVER (PARTITION BY day ORDER BY t, dd DESC) AS nxt
        |  FROM pts),
        |cov AS (
        |  SELECT day,
        |    CAST(sum(CASE WHEN active > 0 THEN nxt - t ELSE 0 END)
        |         // 1000000 AS BIGINT) AS covered_seconds
        |  FROM sw WHERE nxt IS NOT NULL GROUP BY day),
        |ni AS (SELECT day, count(*) AS n_intervals FROM iv GROUP BY day)
        |SELECT strftime(ni.day, '%Y-%m-%d') AS day, ni.n_intervals,
        |  cov.covered_seconds
        |FROM ni JOIN cov USING (day) ORDER BY day""".stripMargin,


    // Same exact lower-median ranks at the three levels.
    "median_federation_gap" ->
      """WITH t AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(round(value * 1000000) AS BIGINT) AS vm FROM events),
        |shard AS (SELECT day, vm,
        |    row_number() OVER (PARTITION BY day ORDER BY vm) AS rk,
        |    count(*) OVER (PARTITION BY day) AS n FROM t),
        |sm AS (SELECT day, vm AS shard_median FROM shard
        |       WHERE rk = (n + 1) // 2),
        |fed AS (SELECT vm2 AS fed_median FROM (
        |  SELECT shard_median AS vm2,
        |    row_number() OVER (ORDER BY shard_median) AS rk,
        |    count(*) OVER () AS n FROM sm) WHERE rk = (n + 1) // 2),
        |gm AS (SELECT vm AS global_median FROM (
        |  SELECT vm, row_number() OVER (ORDER BY vm) AS rk,
        |    count(*) OVER () AS n FROM t) WHERE rk = (n + 1) // 2)
        |SELECT (SELECT count(*) FROM sm) AS n_shards, fed.fed_median,
        |  gm.global_median,
        |  fed.fed_median - gm.global_median AS gap_micro
        |FROM fed CROSS JOIN gm""".stripMargin,


    // INDEPENDENT formulation: lead() over the sorted present keys
    // (the engine side derives the same ranges from two anti-joins).
    "sequence_gap_ranges" ->
      """WITH s AS (
        |  SELECT o_orderkey AS k FROM orders WHERE o_orderstatus = 'F'),
        |l AS (SELECT k, lead(k) OVER (ORDER BY k) AS nk FROM s)
        |SELECT k + 1 AS gap_start, nk - 1 AS gap_end, nk - k - 1 AS gap_len
        |FROM l WHERE nk > k + 1 ORDER BY 1""".stripMargin,


    // Same exact rank selections via QUALIFY.
    "conformal_interval_per_type" ->
      """WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        |e AS (
        |  SELECT event_type, event_id,
        |    date_diff('day', d0.d0, CAST(ts AS DATE)) AS day,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events CROSS JOIN d0),
        |cal AS (SELECT * FROM e WHERE day < 15),
        |nc AS (SELECT event_type, count(*) AS n_cal FROM cal GROUP BY 1),
        |med AS (
        |  SELECT cal.event_type, nc.n_cal, cal.cents AS median_cents
        |  FROM cal JOIN nc USING (event_type)
        |  QUALIFY row_number() OVER (PARTITION BY cal.event_type
        |    ORDER BY cents, event_id) = (n_cal + 1) // 2),
        |res AS (
        |  SELECT cal.event_type, cal.event_id, med.n_cal,
        |    abs(cal.cents - med.median_cents) AS r
        |  FROM cal JOIN med USING (event_type)),
        |q AS (SELECT event_type, r AS q_resid FROM res
        |  QUALIFY row_number() OVER (PARTITION BY event_type
        |      ORDER BY r, event_id)
        |    = least(n_cal, (9 * n_cal + 18) // 10)),
        |t AS (
        |  SELECT e.event_type, med.n_cal, med.median_cents, q.q_resid,
        |    count(*) AS n_test,
        |    CAST(sum(CASE WHEN abs(e.cents - med.median_cents)
        |      <= q.q_resid THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
        |  FROM e JOIN med USING (event_type) JOIN q USING (event_type)
        |  WHERE e.day >= 15 GROUP BY 1, 2, 3, 4)
        |SELECT event_type, n_cal, median_cents, q_resid, n_test,
        |  n_covered, (1000 * n_covered) // n_test AS coverage_permille
        |FROM t ORDER BY event_type""".stripMargin,


    // Same presence scatter over 28 windows.
    "dau_mau_stickiness" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY 1),
        |sc AS (
        |  SELECT DISTINCT user_id, day + CAST(o.o AS INTEGER) AS wday
        |  FROM ud CROSS JOIN (SELECT unnest(range(0, 28)) AS o) o),
        |grid AS (SELECT DISTINCT day AS wday FROM ud),
        |mau AS (
        |  SELECT sc.wday, count(*) AS mau_28d
        |  FROM sc JOIN grid ON grid.wday = sc.wday GROUP BY 1)
        |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau,
        |  mau.mau_28d, (1000 * dau.dau) // mau.mau_28d
        |    AS stickiness_permille
        |FROM dau JOIN mau ON mau.wday = dau.day
        |ORDER BY day""".stripMargin,


    // Same gap sessions and minute durations.
    "inspection_paradox_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR lag(ts) OVER w + INTERVAL 1800 SECONDS < ts THEN 1
        |         ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |idx AS (
        |  SELECT user_id, ts,
        |    CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
        |      AS BIGINT) AS sidx
        |  FROM flagged),
        |ss AS (
        |  SELECT user_id, sidx,
        |    (epoch_us(max(ts)) - epoch_us(min(ts))) // 60000000 AS dmin
        |  FROM idx GROUP BY 1, 2),
        |a AS (SELECT count(*) AS n_sessions,
        |  CAST(sum(dmin) AS BIGINT) AS sum_min,
        |  CAST(sum(dmin * dmin) AS BIGINT) AS sum_min_sq FROM ss)
        |SELECT n_sessions, sum_min, sum_min_sq,
        |  (1000 * sum_min) // n_sessions AS mean_milli_min,
        |  (1000 * sum_min_sq) // sum_min
        |    AS length_biased_mean_milli_min,
        |  (1000 * (n_sessions * sum_min_sq - sum_min * sum_min))
        |    // (sum_min * sum_min) AS bias_permille
        |FROM a""".stripMargin,


    // Same dense load grid and nearest-rank selections.
    "percentile_subadditivity_gap" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(extract(hour FROM ts) AS INTEGER) AS hr FROM events),
        |cells AS (SELECT day, hr, event_type, count(*) AS c FROM ev
        |  GROUP BY 1, 2, 3),
        |grid AS (
        |  SELECT d.day, h.hr, t.event_type, coalesce(cells.c, 0) AS c
        |  FROM (SELECT DISTINCT day FROM ev) d
        |  CROSS JOIN (SELECT unnest(range(0, 24)) AS hr) h
        |  CROSS JOIN (SELECT DISTINCT event_type FROM ev) t
        |  LEFT JOIN cells ON cells.day = d.day AND cells.hr = h.hr
        |    AND cells.event_type = t.event_type),
        |nb AS (SELECT count(*) AS n_buckets
        |  FROM (SELECT DISTINCT day, hr FROM grid)),
        |tt AS (
        |  SELECT day, hr, CAST(sum(c) AS BIGINT) AS tot FROM grid
        |  GROUP BY 1, 2),
        |tp AS (SELECT nb.n_buckets, tt.tot AS p95_of_total
        |  FROM tt CROSS JOIN nb
        |  QUALIFY row_number() OVER (ORDER BY tot, day, hr)
        |    = (95 * n_buckets + 99) // 100),
        |pt AS (
        |  SELECT CAST(sum(c) AS BIGINT) AS sum_of_type_p95s FROM (
        |    SELECT event_type, c FROM grid CROSS JOIN nb
        |    QUALIFY row_number() OVER (PARTITION BY event_type
        |      ORDER BY c, day, hr) = (95 * n_buckets + 99) // 100))
        |SELECT tp.n_buckets, tp.p95_of_total, pt.sum_of_type_p95s,
        |  pt.sum_of_type_p95s - tp.p95_of_total AS gap,
        |  (1000 * (pt.sum_of_type_p95s - tp.p95_of_total))
        |    // tp.p95_of_total AS gap_permille
        |FROM tp CROSS JOIN pt""".stripMargin,


    // Two sessionize CTEs (the sessionize_gap recipe at 3600 s, one per
    // stream), user-joined, and the identical equality-first CASE ladder.
    "allen_interval_relations" ->
      """WITH cf AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR lag(ts) OVER w + INTERVAL 3600 SECONDS < ts THEN 1
        |         ELSE 0 END AS is_new
        |  FROM events WHERE event_type = 'click'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |cs AS (
        |  SELECT user_id, min(ts) AS a1, max(ts) AS a2
        |  FROM (SELECT user_id, ts, sum(is_new) OVER (PARTITION BY user_id
        |          ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND
        |          CURRENT ROW) AS sid FROM cf)
        |  GROUP BY user_id, sid),
        |ef AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |         OR lag(ts) OVER w + INTERVAL 3600 SECONDS < ts THEN 1
        |         ELSE 0 END AS is_new
        |  FROM events WHERE event_type = 'error'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |es AS (
        |  SELECT user_id, min(ts) AS b1, max(ts) AS b2
        |  FROM (SELECT user_id, ts, sum(is_new) OVER (PARTITION BY user_id
        |          ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND
        |          CURRENT ROW) AS sid FROM ef)
        |  GROUP BY user_id, sid),
        |p AS (
        |  SELECT cs.user_id,
        |    CASE WHEN a1 = b1 AND a2 = b2 THEN 'equals'
        |         WHEN a1 = b1 AND a2 < b2 THEN 'starts'
        |         WHEN a1 = b1 THEN 'started_by'
        |         WHEN a2 = b2 AND a1 > b1 THEN 'finishes'
        |         WHEN a2 = b2 THEN 'finished_by'
        |         WHEN a2 < b1 THEN 'precedes'
        |         WHEN a2 = b1 THEN 'meets'
        |         WHEN b2 < a1 THEN 'preceded_by'
        |         WHEN b2 = a1 THEN 'met_by'
        |         WHEN a1 < b1 AND a2 > b2 THEN 'contains'
        |         WHEN a1 > b1 AND a2 < b2 THEN 'during'
        |         WHEN a1 < b1 THEN 'overlaps'
        |         ELSE 'overlapped_by' END AS relation
        |  FROM cs JOIN es ON cs.user_id = es.user_id)
        |SELECT relation, count(*) AS n_pairs,
        |  CAST(sum(user_id) AS BIGINT) AS user_checksum
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,


    // Same cross-multiplied (x−μ)² vs (2σ)² verdict per complete window.
    "bollinger_breaches" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, day, x,
        |    count(*) OVER w AS cnt,
        |    CAST(sum(x) OVER w AS BIGINT) AS ssum,
        |    sum(CAST(x AS HUGEINT) * x) OVER w AS q
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |b AS (
        |  SELECT event_type, day, x, 20 * x - ssum AS dev,
        |    CAST(20 * x - ssum AS HUGEINT)
        |      * (20 * x - ssum) AS dev_sq,
        |    4 * (20 * q - CAST(ssum AS HUGEINT) * ssum) AS band_sq
        |  FROM r WHERE cnt = 20)
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day, x AS cents,
        |  CAST(dev_sq // 1000000 AS BIGINT) AS dev_sq_micro,
        |  CAST(band_sq // 1000000 AS BIGINT) AS band_sq_micro,
        |  CASE WHEN dev_sq <= band_sq THEN 'in'
        |       WHEN dev > 0 THEN 'upper' ELSE 'lower' END AS band
        |FROM b ORDER BY event_type, day""".stripMargin,


    // The A1 closed-right 5-minute bars on cents, then the identical
    // integer pattern tests over lagged bars.
    "candlestick_patterns" ->
      """WITH bars AS (
        |  SELECT event_type,
        |    time_bucket(INTERVAL 5 MINUTE, ts - INTERVAL 1 MICROSECOND)
        |      AS bts,
        |    arg_min(CAST(floor(value * 100) AS BIGINT), ts) AS open,
        |    max(CAST(floor(value * 100) AS BIGINT)) AS high,
        |    min(CAST(floor(value * 100) AS BIGINT)) AS low,
        |    arg_max(CAST(floor(value * 100) AS BIGINT), ts) AS close,
        |    count(*) AS volume
        |  FROM events GROUP BY 1, 2),
        |l AS (
        |  SELECT event_type, volume, open, high, low, close,
        |    lag(open) OVER w AS po, lag(close) OVER w AS pc,
        |    abs(close - open) AS body
        |  FROM bars WINDOW w AS (PARTITION BY event_type ORDER BY bts))
        |SELECT event_type, count(*) AS n_bars,
        |  CAST(sum(CASE WHEN volume >= 3 AND high > low
        |    AND body * 20 <= high - low THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_doji,
        |  CAST(sum(CASE WHEN pc < po AND close > open AND open <= pc
        |    AND close >= po THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bullish_engulfing,
        |  CAST(sum(CASE WHEN pc > po AND close < open AND open >= pc
        |    AND close <= po THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bearish_engulfing,
        |  CAST(sum(CASE WHEN volume >= 3 AND high > low
        |    AND least(open, close) - low >= 2 * body
        |    AND high - greatest(open, close) <= body THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_hammer
        |FROM l GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
