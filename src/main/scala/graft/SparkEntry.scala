package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, Dedup, IntervalJoin, QualityGates, Resample,
  Sessionize, Similarity, TextAnalysis, Watermark}
import graft.pipeline.Bucketing
import graft.time.{RolloverCalendar, SessionCalendar}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with an equivalent DuckDB oracle in [[oracleSql]]
  * (hash-compared at sf0.01 by the driver's Verify harness).
  *
  * Conventions shared by every query/oracle pair (they make the
  * hash-compare well-defined):
  *  - timestamps are emitted as "yyyy-MM-dd HH:mm:ss" STRINGS (avoids
  *    parquet timestamp-zone representation drift between engines);
  *  - money/quantity aggregates run in EXACT decimal arithmetic (cast to
  *    double only at the end) — double sums at 1e9 magnitude flip last-ULP
  *    between engines; small-magnitude derived doubles are `round`ed to
  *    the decimal precision of their true value;
  *  - every result is deterministically ordered by its key columns;
  *  - column names are identical on both sides.
  */
object SparkEntry extends QueryShared
    with QueriesAnalytics1
    with QueriesAnalytics2
    with QueriesDedup
    with QueriesEmbedding
    with QueriesGraph
    with QueriesIngest
    with QueriesMultimodal
    with QueriesSampling
    with QueriesSketch
    with QueriesStats
    with QueriesStreaming
    with QueriesText
    with QueriesTimeSeries
    with QueriesTpch {

  /** Flagship query (driver smoke-checks rows>0 at sf0.001): the
    * reference's core dataflow shape (resample → session filter → label →
    * union → broadcast interval join, SURVEY.md §3.2) over the `events`
    * table — 5-minute OHLCV of `value` per event_type, session-labeled,
    * enriched by an interval join against a monthly calendar dimension.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables.events(spark, dir)
    val bars = Resample.ohlcvFromTicks(ev, "value", "5 minutes",
      keys = Seq(col("event_type")))
    // weekly calendar dimension derived from the same stream, so the
    // interval join actually enriches (events span one month of 2024)
    val dim = ev
      .groupBy(weekofyear(col("ts")).as("week"))
      .agg(min(col("ts")).as("start_k"), max(col("ts")).as("settle_k"),
        count(lit(1)).as("week_events"))
    IntervalJoin.leftJoin(
        bars.withColumn("session_id", SessionCalendar.sessionId(col("ts"))),
        dim, col("ts"), col("start_k"), col("settle_k"))
      .drop("start_k", "settle_k")
  }

  /** One entry per implemented operator (SURVEY.md §2) — merged from
    * the family traits; names are globally unique (asserted below). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    analytics1Queries ++ analytics2Queries ++ dedupQueries ++ embeddingQueries ++ graphQueries ++ ingestQueries ++ multimodalQueries ++ samplingQueries ++ sketchQueries ++ statsQueries ++ streamingQueries ++ textQueries ++ timeSeriesQueries ++ tpchQueries

  def oracleSql: Map[String, String] =
    analytics1Oracles ++ analytics2Oracles ++ dedupOracles ++ embeddingOracles ++ graphOracles ++ ingestOracles ++ multimodalOracles ++ samplingOracles ++ sketchOracles ++ statsOracles ++ streamingOracles ++ textOracles ++ timeSeriesOracles ++ tpchOracles

  // A duplicate name across family traits would silently drop a query
  // (Map ++ keeps the right operand) — fail fast at first access instead.
  require(
    analytics1Queries.size + analytics2Queries.size + dedupQueries.size + embeddingQueries.size + graphQueries.size + ingestQueries.size + multimodalQueries.size + samplingQueries.size + sketchQueries.size + statsQueries.size + streamingQueries.size + textQueries.size + timeSeriesQueries.size + tpchQueries.size == queries.size,
    "duplicate query name across family traits")
}
