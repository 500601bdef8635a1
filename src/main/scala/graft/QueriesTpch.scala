package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, Dedup, IntervalJoin, QualityGates, Resample,
  Sessionize, Similarity, TextAnalysis, Watermark}
import graft.pipeline.Bucketing
import graft.time.{RolloverCalendar, SessionCalendar}

/** Tpch family queries + DuckDB oracles (split from the
  * monolithic SparkEntry in round 12; entry bodies unchanged). */
private[graft] trait QueriesTpch extends QueryShared {

  protected def tpchQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Rollup aggregation (subtotals + grand total; NULL levels coalesced
    // to 'ALL' so both engines agree on representation and ordering).
    "rollup_orders" -> { (s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("total"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
          col("n"), col("total"))
        .orderBy("o_orderstatus", "o_orderpriority")
    },


    // A-family: grouped aggregation with partial+final hash agg (TPC-H Q1
    // shape). The 4/6-decimal product sums use EXACT decimal arithmetic in
    // both engines (double sums at ~1e9 magnitude can't even represent 6
    // decimals, so double+round flips last-ULP between engines — observed
    // at sf0.1); the final cast-to-double of equal decimals is identical.
    "tpch_q1_agg" -> { (s, d) =>
      val price = col("l_extendedprice").cast("decimal(12,2)")
      val disc = lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")
      val tax = lit(1).cast("decimal(4,2)") + col("l_tax").cast("decimal(4,2)")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(12,2)")).cast("double").as("sum_qty"),
          sum(price).cast("double").as("sum_base_price"),
          sum(price * disc).cast("double").as("sum_disc_price"),
          sum(price * disc * tax).cast("double").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },


    // Correlated scalar subqueries — exercises Catalyst's decorrelation
    // (rewrite to aggregate + join). The above-nation-average predicate is
    // kept exact by comparing acctbal·count > sum instead of dividing:
    // decimal multiply/compare is order-insensitive where a double average
    // is not, so both engines agree at the boundary.
    "subquery_above_avg_balance" -> { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT c_custkey, c_name FROM customer_v c
        WHERE CAST(c_acctbal AS DECIMAL(12,2)) *
              (SELECT COUNT(*) FROM customer_v x
               WHERE x.c_nationkey = c.c_nationkey)
            > (SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) FROM customer_v x
               WHERE x.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey""")
    },


    // TPC-H Q5 shape: 6-table star-within-star — the fact joins orders
    // (fact-fact shuffle) while customer/supplier/nation/region broadcast;
    // the same-nation predicate makes supplier a second dim arm, not a
    // second fact. Decimal revenue for exact cross-engine parity.
    "tpch_q5_region_revenue" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
      val c = Tables.customer(s, d)
      val sup = Tables.supplier(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(c,
          o("o_custkey") === c("c_custkey") &&
            c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
            .cast("double").as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    },


    // CUBE over orders: all 2^2 grouping sets in one pass (the grouping-
    // sets expansion happens below the partial aggregate, so it's still a
    // single shuffle); grouping_id disambiguates NULL-as-rollup from
    // NULL-as-data.
    "cube_orders" -> { (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total"),
          grouping_id().as("gid"))
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    },


    // TPC-H Q3 shape: selective join + grouped revenue + top-10.
    "tpch_q3_shipping" -> { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("2000-03-15 00:00:00").cast("timestamp"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("2000-03-15 00:00:00").cast("timestamp"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
            .cast("double").as("revenue"))
        .select(col("l_orderkey"), tsStr(col("o_orderdate")).as("o_orderdate"),
          col("o_orderpriority"), col("revenue"))
        .orderBy(desc("revenue"), col("l_orderkey"))
        .limit(10)
    },


    // TPC-H Q7 shape — bidirectional nation-pair shipping volume by year:
    // two broadcast nation dims aliased onto opposite legs of the
    // supplier/customer chain, the OR'd pair predicate, exact decimal
    // revenue. The date slice prunes at the lineitem scan.
    "tpch_q7_nation_volume" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") <= lit("1999-12-31 00:00:00").cast("timestamp"))
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
      li.join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
        .filter((col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19") ||
          (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },


    // TPC-H Q10 shape — top returned-revenue customers in a quarter:
    // lineitem(R) ⋈ orders(quarter) ⋈ customer ⋈ broadcast nation,
    // exact decimal revenue, top-20 with an explicit custkey tiebreak so
    // the cut is deterministic in both engines. The orderBy+limit plans
    // as TakeOrderedAndProject (per-partition heaps), never a full sort
    // of the customer aggregate.
    "tpch_q10_returned_items" -> { (s, d) =>
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(desc("revenue"), col("c_custkey"))
        .limit(20)
    },


    // TPC-H Q6 shape — forecast revenue change: a pure scan-filter-agg
    // whose whole plan should collapse into one WholeStageCodegen span
    // over the pushed-down parquet scan. Exact decimal product sum.
    "tpch_q6_forecast_revenue" -> { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
            col("l_discount").cast("decimal(4,2)"))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    },


    // TPC-H Q14 shape — promo revenue share in a year: broadcast part
    // dim, conditional decimal aggregation, and the share emitted as an
    // exact integer ratio of micro-cent sums (DECIMAL×10⁴ → BIGINT) so
    // no double division crosses the oracle boundary.
    "tpch_q14_promo_share" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
      li.join(Tables.part(s, d),
          col("l_partkey") === col("p_partkey"))
        .withColumn("rev", col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
        .agg(
          sum(when(col("p_type").startsWith("PROMO"), col("rev"))
            .otherwise(lit(0).cast("decimal(16,4)"))).as("promo"),
          sum(col("rev")).as("total"))
        .select(
          (col("promo") * 10000).cast("long").as("promo_u"),
          (col("total") * 10000).cast("long").as("total_u"))
        // DECIMAL(38,0) intermediate (pmi_collocations precedent; found
        // by the r13 TPC-H x100 tier): promo_u·10⁶ as a BIGINT product
        // passes 2⁶³ once yearly promo revenue tops ~$9.2e8 — i.e. at
        // sf1 — so ANSI Spark errored under full materialization. The
        // 38-digit product is exact to ~1e25; DIV is IntegralDivide and
        // lands back in BIGINT, value-identical at every SF below the
        // old overflow frontier.
        .withColumn("promo_share_micro",
          expr("CAST((CAST(promo_u AS DECIMAL(38,0)) * 1000000)" +
            " DIV total_u AS BIGINT)"))
    },


    // TPC-H Q18 shape — large-quantity orders: the group-by-HAVING
    // derived semi join (aggregate once, join back), customer enrichment,
    // deterministic top-100. Quantities are integer-valued doubles, so
    // their sums are exact and cast cleanly to BIGINT in both engines.
    "tpch_q18_large_orders" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val big = li.groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 150)
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"), col("sum_qty").cast("long").as("sum_qty"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
        .limit(100)
    },


    // TPC-H Q15 shape — top supplier(s) by quarter revenue, ALL ties kept
    // via the max-revenue self-comparison (the view+subquery formulation,
    // here an exact DECIMAL equality join against the 1-row broadcast
    // max — double revenue would make tie detection engine-dependent).
    "tpch_q15_top_supplier" -> { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01 00:00:00").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")))
          .as("total_rev"))
      val mx = rev.agg(max(col("total_rev")).as("mx"))
      rev.join(broadcast(mx), col("total_rev") === col("mx"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    },


    // TPC-H Q8 shape (national market share), generalized to ALL
    // supplier nations per year — same 8-table join DAG: lineitem is
    // the fact spine; part (PROMO filter), supplier, both nation roles,
    // and region are broadcast dims; orders carries the date window and
    // customer→nation→region restricts the MARKET (EUROPE) while the
    // supplier's nation is the share dimension. Volume in exact integer
    // cent-percent units (price_cents × (100−disc_pct)) so the
    // per-year share is an exact permille — no decimal division.
    "tpch_q8_market_share" -> { (s, d) =>
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        col("l_suppkey"), col("l_orderkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("vol"))
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year"))
      val euroNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key"))
      val suppNation = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val vols = li
        .join(Tables.part(s, d)
          .filter(col("p_type") === "PROMO").select("p_partkey"),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(euroNations), col("c_nationkey") === col("cn_key"))
        .groupBy("o_year", "supp_nation")
        .agg(sum(col("vol")).as("volume_units"))
      vols.join(broadcast(vols.groupBy("o_year")
          .agg(sum(col("volume_units")).as("year_total"))), "o_year")
        .select(col("o_year"), col("supp_nation"), col("volume_units"),
          expr("volume_units * 1000 DIV year_total").as("share_permille"))
        .orderBy("o_year", "supp_nation")
    },


    // TPC-H Q13 shape (customer order-count distribution): LEFT join so
    // zero-order customers land in the 0 bucket, priority filter as the
    // stand-in for the comment anti-pattern (o_comment isn't in this
    // schema), then the distribution-of-counts second aggregate. Two
    // exchanges total: custkey for the count, count-value (tiny domain)
    // for the histogram.
    "tpch_q13_custdist" -> { (s, d) =>
      Tables.customer(s, d).select("c_custkey")
        .join(Tables.orders(s, d)
          .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
          .select("o_orderkey", "o_custkey"),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count").agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    },


    // TPC-H Q17 shape (small-quantity revenue): per-part average
    // quantity threshold as the exact integer cross-multiplication
    // 5·qty·n < sum_qty (qty < 0.2·avg ⟺ no floats), brand dim
    // auto-broadcast at small SF (unhinted r14 — both the filtered part
    // list and its per-part stats grow with the corpus).
    "tpch_q17_small_qty" -> { (s, d) =>
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        round(col("l_quantity")).cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("pc"))
      val j = li.join(Tables.part(s, d)
          .filter(col("p_brand") === "Brand#4").select("p_partkey"),
        col("l_partkey") === col("p_partkey"))
      val stats = j.groupBy("l_partkey")
        .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n"))
        .select(col("l_partkey").as("sp_key"), col("sum_qty"), col("n"))
      j.join(stats, col("l_partkey") === col("sp_key"))
        .filter(col("qty") * col("n") * 5 < col("sum_qty"))
        .agg(count(lit(1)).as("n_small"),
          coalesce(sum(col("pc")), lit(0L)).as("total_cents"))
    },


    // TPC-H Q19 shape — the OR-of-ANDs join filter (disjunctive
    // predicates over BOTH sides): three brand/size/quantity bands,
    // each a conjunction mixing part and lineitem columns. Catalyst
    // extracts the common-side residuals (p_brand IN ..., quantity
    // range hull) as pushable prefilters while the full disjunction
    // evaluates post-join — the plan shape that separates engines with
    // disjunction handling from those that scan everything. Exact
    // integer cent-percent revenue.
    "tpch_q19_disjunctive" -> { (s, d) =>
      val li = Tables.lineitem(s, d).select(col("l_partkey"),
        round(col("l_quantity")).cast("long").as("qty"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("vol"))
      val p = Tables.part(s, d).select("p_partkey", "p_brand", "p_size")
      li.join(p, col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("qty").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 20) &&
            col("qty").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 30) &&
            col("qty").between(20, 30)))
        .agg(count(lit(1)).as("n_items"),
          coalesce(sum(col("vol")), lit(0L)).as("revenue_units"))
    },


    // TPC-H Q22 shape on the generated schema: "positive-balance
    // customers with above-average balance and no recent activity" —
    // scalar aggregate subquery + date-filtered ANTI join + rollup by
    // the country code (n_nationkey stands in for the absent c_phone
    // prefix). The pure no-orders anti-join is VACUOUS here (every
    // generated customer has ≥1 order — checked before landing), so the
    // recency cutoff 1999-01-01 carries the anti-join semantics (2/14/148
    // qualifying customers at sf0.001/0.01/0.1 — the cutoff must sit deep
    // enough that even the 150-customer smoke corpus keeps inactive
    // above-average customers). Above-average is
    // the exact cross-multiplication cents·cnt > sum_cents (the Q17
    // rule: never compare against a float average); the filtered orders
    // side is pruned BEFORE the anti-join shuffle.
    "tpch_q22_shaped" -> { (s, d) =>
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          round(col("c_acctbal") * 100).cast("long").as("cents"))
      val stats = cust.filter(col("cents") > 0)
        .agg(sum("cents").as("sum_cents"), count(lit(1)).as("cnt"))
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
      cust.join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .crossJoin(broadcast(stats))
        .filter(col("cents") * col("cnt") > col("sum_cents"))
        .select(col("c_nationkey").as("cntrycode"), col("cents"))
        .groupBy("cntrycode")
        .agg(count(lit(1)).as("numcust"), sum("cents").as("totacctbal_cents"))
        .orderBy("cntrycode")
    },


    // TPC-H Q2 shape on the generated schema (no partsupp table): the
    // part-supplier catalog derives from lineitem — cost(p, s) = the
    // minimum extended price that supplier ever charged for that part,
    // in exact decimal cents. For LARGE parts, find every EUROPE-region
    // supplier achieving the REGIONAL minimum cost (the correlated-min
    // subquery Q2 is famous for, as a groupBy + equality join back —
    // the decorrelation Catalyst would apply anyway, written directly).
    // Region suppliers prune BEFORE the min, so the per-part aggregate
    // only sees the correlated scope.
    "tpch_q2_shaped" -> { (s, d) =>
      val eurSupp = Tables.supplier(s, d)
        .join(Tables.nation(s, d).filter(col("n_regionkey") === 3),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"), col("n_name"),
          round(col("s_acctbal") * 100).cast("long").as("acctbal_cents"))
      val cost = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min((col("l_extendedprice").cast("decimal(12,2)") * 100)
          .cast("long")).as("cost_cents"))
      val regional = cost.join(broadcast(eurSupp),
        col("l_suppkey") === col("s_suppkey"))
      val minCost = regional.groupBy(col("l_partkey"))
        .agg(min(col("cost_cents")).as("min_cents"))
      regional
        .join(minCost, Seq("l_partkey"))
        .filter(col("cost_cents") === col("min_cents"))
        .join(Tables.part(s, d).filter(col("p_type") === "LARGE")
          .select(col("p_partkey"), col("p_name")),
          col("l_partkey") === col("p_partkey"))
        .select(col("acctbal_cents"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"), col("cost_cents"))
        .orderBy(col("cost_cents"), col("p_partkey"), col("s_name"))
        .limit(100)
    },


    // TPC-H Q9 shape: profit by (nation, year) for parts whose name
    // carries a color token — revenue side only (no ps_supplycost in
    // this schema), in the Q1-proven DECIMAL arithmetic so both engines
    // sum identical exact values. The part filter reaches the fact rows
    // as an auto-broadcast at small SF (unhinted r14 — the side grows
    // with the corpus) and prunes before the supplier/nation joins.
    "tpch_q9_shaped" -> { (s, d) =>
      val price = col("l_extendedprice").cast("decimal(12,2)")
      val disc = lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")
      Tables.lineitem(s, d)
        .join(Tables.part(s, d)
          .filter(col("p_name").like("%red%")).select("p_partkey"),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("l_shipdate")).as("o_year"))
        .agg(sum(price * disc).cast("double").as("sum_profit"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("nation"), desc("o_year"))
    },


    // TPC-H Q11 shape: per-part inventory value from ASIA-region
    // suppliers, kept only when it exceeds 0.01% of the total — the
    // HAVING-against-a-scalar-subquery pattern as exact cross-
    // multiplication in cents (part_cents · 10000 > total_cents; never a
    // float fraction). The scalar total rides a broadcast cross join.
    "tpch_q11_shaped" -> { (s, d) =>
      val asiaSupp = Tables.supplier(s, d)
        .join(Tables.nation(s, d).filter(col("n_regionkey") === 2),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val v = Tables.lineitem(s, d)
        .join(broadcast(asiaSupp), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_partkey"),
          (col("l_extendedprice").cast("decimal(12,2)") * 100)
            .cast("long").as("cents"))
      // ROLLUP computes the per-part sums AND the grand total in ONE
      // pass (r15, VERDICT r14 #1): the previous shape derived the
      // scalar total from `perPart` without materializing it, so the
      // whole lineitem join + aggregation executed TWICE — at the sf10
      // tier that was ~2x the task time and the largest share of the
      // query's 16% GC. The grouping-sets expansion happens below the
      // partial aggregate (map-side combine still collapses both sets),
      // so shuffle volume is per-part partials + one total partial per
      // partition; grouping_id()=1 marks the total row exactly (not
      // NULL-as-data).
      // Deliberately UNCACHED: `rolled` feeds both the scalar total and
      // the probe side, so the join+rollup executes once per branch (2x
      // scan). All three variants were measured at the sf1 tier on 32
      // threads: the r14 groupBy shape (Spark reuses the aggregation
      // exchange — single scan — but pays a 20.5 task-sec mega-stage:
      // wall 2.77s, Σtask 22.5s), a cache() on rolled (the two branches
      // race to materialize it CONCURRENTLY, so both still compute the
      // upstream AND pay cache-format conversion: wall 2.85s, Σtask
      // 40.7s), and this shape (wall 1.76s, Σtask 15.5s) — the double
      // scan is the cheapest physical plan by both wall and total work,
      // and each branch stays a clean codegen'd scan→join→partial-agg
      // pipeline that scales out on a cluster.
      val rolled = v.rollup(col("l_partkey"))
        .agg(sum(col("cents")).as("value_cents"),
          grouping_id().as("gid"))
      val total = rolled.filter(col("gid") === 1)
        .select(col("value_cents").as("total_cents"))
      rolled.filter(col("gid") === 0)
        .crossJoin(broadcast(total))
        .filter(col("value_cents") * 10000 > col("total_cents"))
        .select(col("l_partkey"), col("value_cents"))
        .orderBy(desc("value_cents"), col("l_partkey"))
    },


    // TPC-H Q12 shape: l_returnflag stands in for the absent l_shipmode;
    // a line is LATE when it ships more than 90 days after its order
    // date. Per flag, count urgent-priority vs other-priority late
    // lines — the two conditional sums Q12 uses to weigh shipping modes
    // against order priority. The date predicate rides the equi-join.
    "tpch_q12_shaped" -> { (s, d) =>
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate",
          "o_orderpriority"), col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")
    },


    // TPC-H Q16 shape: how many distinct suppliers serve each
    // (brand, type, size) combination — excluding one brand, one type,
    // and every "complaint" supplier (negative account balance stands in
    // for the comment LIKE filter), the exclusion as an anti-join rather
    // than NOT IN (the not_in_null_semantics lesson). count_distinct
    // partial-aggregates per node before the final exchange.
    //
    // r14: the part join is UNHINTED (as are the other ten part/customer
    // joins in this family). A forced broadcast(part) is corpus-
    // proportional — at the sf10 tier it built a ~2M-row hash relation
    // per run (TPCH_SF10 solo read 35 s vs 7.7 in-tier, pure broadcast-
    // build + GC variance), and at 100 TB it is a driver OOM. The
    // optimizer auto-broadcasts the same side at every small SF (file
    // estimate under the 10 MB threshold) and graduates it to a shuffle
    // join exactly when it grows — the behavior the scale tier gates on.
    "tpch_q16_shaped" -> { (s, d) =>
      val badSupp = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
      Tables.lineitem(s, d)
        .select("l_partkey", "l_suppkey")
        .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"),
          "left_anti")
        .join(Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO")
          .select("p_partkey", "p_brand", "p_type", "p_size"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
          col("p_size"))
        .limit(50)
    },


    // TPC-H Q20 shape: AFRICA-region suppliers who concentrated more
    // than half of their all-time shipped quantity of some small-named
    // part into 1998 — the nested "available > ½·shipped" correlated
    // aggregate as one (part, supplier) rollup with conditional sums
    // (2·qty_1998 > qty_total in exact integers; l_quantity is integral
    // by construction), then a semi-join up to supplier names.
    "tpch_q20_shaped" -> { (s, d) =>
      val afrSupp = Tables.supplier(s, d)
        .join(Tables.nation(s, d).filter(col("n_regionkey") === 0),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      val smallParts = Tables.part(s, d)
        .filter(col("p_name").like("small%")).select(col("p_partkey"))
      val qual = Tables.lineitem(s, d)
        .join(smallParts, col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(when(year(col("l_shipdate")) === 1998,
            col("l_quantity").cast("long")).otherwise(0L)).as("qty_1998"),
          sum(col("l_quantity").cast("long")).as("qty_total"))
        .filter(col("qty_1998") * 2 > col("qty_total"))
        .select(col("l_suppkey")).distinct()
      afrSupp.join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_name")
    },


    // TPC-H Q4 shape on the generated schema: orders in one quarter with
    // at least one LATE-shipped lineitem (> 60 days after order date —
    // stands in for the absent l_commitdate < l_receiptdate), counted by
    // priority. The EXISTS is a left-semi join whose date predicate
    // prunes the orders side BEFORE the shuffle; the join condition's
    // cross-side inequality rides on the equi-key join, not a range
    // join.
    "tpch_q4_shaped" -> { (s, d) =>
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      o.join(Tables.lineitem(s, d),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > expr("o_orderdate + INTERVAL 60 DAY"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },


    // TPC-H Q21 shape (suppliers who kept orders waiting): for finished
    // orders, late lineitems (> 60 days past order date, the schema's
    // commit/receipt stand-in) where the order HAS other suppliers
    // (EXISTS) and NONE of them was late (NOT EXISTS) — the classic
    // double-correlated-subquery DAG. Plan shape: the late/other flags
    // collapse to ONE per-order aggregate (n_suppliers, n_late_suppliers)
    // joined back — the decorrelated form of both subqueries, one
    // order-keyed shuffle instead of two correlated re-scans.
    "tpch_q21_shaped" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val l = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          when(col("l_shipdate") > expr("o_orderdate + INTERVAL 60 DAY"), 1L)
            .otherwise(0L).as("late"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max("late").as("late"))
      val perOrder = l.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"), sum("late").as("n_late"))
      l.filter(col("late") === 1)
        .join(perOrder, "l_orderkey")
        .filter(col("n_supp") > 1 && col("n_late") === 1)
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(countDistinct(col("l_orderkey")).as("numwait"))
        .withColumn("rk", row_number().over(
          Window.orderBy(desc("numwait"), col("s_name"))))
        .filter(col("rk") <= 25).drop("rk")
        .orderBy(desc("numwait"), col("s_name"))
    }
  )

  protected def tpchOracles: Map[String, String] = Map(

    "rollup_orders" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,


    "tpch_q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |    AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) *
        |    (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
        |    AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,


    "subquery_above_avg_balance" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE CAST(c_acctbal AS DECIMAL(12,2)) *
        |      (SELECT COUNT(*) FROM customer x
        |       WHERE x.c_nationkey = c.c_nationkey)
        |    > (SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) FROM customer x
        |       WHERE x.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,


    "tpch_q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,


    "cube_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin,


    "tpch_q3_shipping" ->
      """SELECT l_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
        |  o_orderpriority,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '2000-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '2000-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,


    "tpch_q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS INT) AS l_year,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |WHERE l.l_shipdate BETWEEN TIMESTAMP '1998-01-01 00:00:00'
        |  AND TIMESTAMP '1999-12-31 00:00:00'
        |  AND ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        |    OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,


    // Exact decimal revenue; custkey tiebreak makes the top-20 cut
    // deterministic.
    "tpch_q10_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,


    "tpch_q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,


    // Micro-cent integers before the ratio; no double division.
    "tpch_q14_promo_share" ->
      """WITH j AS (
        |  SELECT CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |      AS rev,
        |    p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'),
        |a AS (
        |  SELECT
        |    CAST(sum(CASE WHEN p_type LIKE 'PROMO%' THEN rev
        |             ELSE CAST(0 AS DECIMAL(16,4)) END) * 10000 AS BIGINT)
        |      AS promo_u,
        |    CAST(sum(rev) * 10000 AS BIGINT) AS total_u
        |  FROM j)
        |SELECT promo_u, total_u,
        |  -- HUGEINT intermediate mirrors the Spark side's DECIMAL(38,0)
        |  -- (the BIGINT product overflows at sf1)
        |  CAST(CAST(promo_u AS HUGEINT) * 1000000 // total_u AS BIGINT)
        |    AS promo_share_micro
        |FROM a""".stripMargin,


    // Integer-valued double sums cast exactly; top-100 with orderkey
    // tiebreak.
    "tpch_q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, sum(l_quantity) AS sum_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150)
        |SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        |  o_totalprice, CAST(sum_qty AS BIGINT) AS sum_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,


    // Exact DECIMAL revenue; ties kept by construction.
    "tpch_q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |      AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1),
        |mx AS (SELECT max(total_rev) AS mx FROM rev)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM rev JOIN mx ON total_rev = mx
        |JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY s_suppkey""".stripMargin,


    // Same 8-table DAG, integer cent-percent volumes, exact permille.
    "tpch_q8_market_share" ->
      """WITH vols AS (
        |  SELECT year(o.o_orderdate) AS o_year, n2.n_name AS supp_nation,
        |    CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |      (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
        |      AS BIGINT) AS volume_units
        |  FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'PROMO'
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
        |  JOIN region r ON r.r_regionkey = n1.n_regionkey
        |    AND r.r_name = 'EUROPE'
        |  GROUP BY 1, 2),
        |tot AS (SELECT o_year, CAST(sum(volume_units) AS BIGINT)
        |          AS year_total FROM vols GROUP BY 1)
        |SELECT v.o_year, v.supp_nation, v.volume_units,
        |  v.volume_units * 1000 // t.year_total AS share_permille
        |FROM vols v JOIN tot t ON v.o_year = t.o_year
        |ORDER BY v.o_year, v.supp_nation""".stripMargin,


    // LEFT join keeps 0-order customers; count-of-counts histogram.
    "tpch_q13_custdist" ->
      """WITH cc AS (
        |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |    AND o.o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY 1)
        |SELECT c_count, count(*) AS custdist
        |FROM cc GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,


    // 5·qty·n < sum_qty is qty < 0.2·avg without floats.
    "tpch_q17_small_qty" ->
      """WITH j AS (
        |  SELECT l.l_partkey, CAST(round(l.l_quantity) AS BIGINT) AS qty,
        |    CAST(round(l.l_extendedprice * 100) AS BIGINT) AS pc
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE p.p_brand = 'Brand#4'),
        |st AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS sum_qty,
        |         count(*) AS n FROM j GROUP BY 1)
        |SELECT count(*) AS n_small,
        |  coalesce(CAST(sum(j.pc) AS BIGINT), 0) AS total_cents
        |FROM j JOIN st ON j.l_partkey = st.l_partkey
        |WHERE j.qty * st.n * 5 < st.sum_qty""".stripMargin,


    // Same three disjunctive bands, integer cent-percent revenue.
    "tpch_q19_disjunctive" ->
      """SELECT count(*) AS n_items,
        |  coalesce(CAST(sum(
        |    CAST(round(l.l_extendedprice * 100) AS BIGINT) *
        |    (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
        |    AS BIGINT), 0) AS revenue_units
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE
        |  (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
        |    AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 1 AND 11)
        |  OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20
        |    AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 10 AND 20)
        |  OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30
        |    AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN 20 AND 30)
        |""".stripMargin,


    // NOT EXISTS over the date-filtered orders; exact cents
    // cross-multiplication for the above-average test.
    "tpch_q22_shaped" ->
      """WITH cust AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
        |  FROM customer),
        |a AS (SELECT CAST(sum(cents) AS BIGINT) AS sum_cents,
        |        count(*) AS cnt
        |      FROM cust WHERE cents > 0)
        |SELECT c_nationkey AS cntrycode, count(*) AS numcust,
        |  CAST(sum(cents) AS BIGINT) AS totacctbal_cents
        |FROM cust, a
        |WHERE cents * cnt > sum_cents
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // Correlated-min over the lineitem-derived catalog; exact decimal
    // cents on both sides.
    "tpch_q2_shaped" ->
      """WITH eur AS (
        |  SELECT s_suppkey, s_name, n_name,
        |    CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_regionkey = 3),
        |cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(min(CAST(l_extendedprice AS DECIMAL(12,2)) * 100) AS BIGINT)
        |      AS cost_cents
        |  FROM lineitem GROUP BY 1, 2),
        |reg AS (
        |  SELECT c.l_partkey, c.cost_cents, e.s_name, e.n_name, e.acctbal_cents
        |  FROM cost c JOIN eur e ON c.l_suppkey = e.s_suppkey),
        |mn AS (SELECT l_partkey, min(cost_cents) AS min_cents
        |       FROM reg GROUP BY 1)
        |SELECT r.acctbal_cents, r.s_name, r.n_name, p.p_partkey, p.p_name,
        |  r.cost_cents
        |FROM reg r JOIN mn ON r.l_partkey = mn.l_partkey
        |  AND r.cost_cents = mn.min_cents
        |JOIN part p ON r.l_partkey = p.p_partkey
        |WHERE p.p_type = 'LARGE'
        |ORDER BY r.cost_cents, p.p_partkey, r.s_name
        |LIMIT 100""".stripMargin,


    "tpch_q9_shaped" ->
      """SELECT n_name AS nation, year(l_shipdate) AS o_year,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
        |    AS DOUBLE) AS sum_profit,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,


    "tpch_q11_shaped" ->
      """WITH v AS (
        |  SELECT l_partkey,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS cents
        |  FROM lineitem
        |  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
        |    JOIN nation ON s_nationkey = n_nationkey WHERE n_regionkey = 2)),
        |pp AS (SELECT l_partkey, CAST(sum(cents) AS BIGINT) AS value_cents
        |       FROM v GROUP BY 1),
        |t AS (SELECT CAST(sum(value_cents) AS BIGINT) AS total_cents FROM pp)
        |SELECT l_partkey, value_cents FROM pp, t
        |WHERE value_cents * 10000 > total_cents
        |ORDER BY value_cents DESC, l_partkey""".stripMargin,


    "tpch_q12_shaped" ->
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    "tpch_q16_shaped" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 50""".stripMargin,


    "tpch_q20_shaped" ->
      """WITH q AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CASE WHEN year(l_shipdate) = 1998
        |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT)
        |      AS qty_1998,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_total
        |  FROM lineitem
        |  WHERE l_partkey IN (SELECT p_partkey FROM part
        |                      WHERE p_name LIKE 'small%')
        |  GROUP BY 1, 2)
        |SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_regionkey = 0
        |  AND s_suppkey IN (SELECT l_suppkey FROM q
        |                    WHERE qty_1998 * 2 > qty_total)
        |ORDER BY s_name""".stripMargin,


    // EXISTS over the late-shipment predicate.
    "tpch_q4_shaped" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // The correlated EXISTS / NOT EXISTS formulation — independent of the
    // Spark side's decorrelated per-order aggregate.
    "tpch_q21_shaped" ->
      """WITH l AS MATERIALIZED (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |        THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY 1, 2)
        |SELECT s_name, count(DISTINCT l1.l_orderkey) AS numwait
        |FROM l l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        |WHERE l1.late = 1
        |  AND EXISTS (SELECT 1 FROM l l2 WHERE l2.l_orderkey = l1.l_orderkey
        |              AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM l l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                  AND l3.l_suppkey <> l1.l_suppkey AND l3.late = 1)
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 25""".stripMargin
  )
}
