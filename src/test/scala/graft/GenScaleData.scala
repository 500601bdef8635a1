package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf1-scale generator for the quadratic-tail bench
  * (VERDICT r6 #6): documents and embeddings at 10× sf0.1 (50 000 docs /
  * 20 000 vectors), mirroring the driver tables' shape — word-soup text
  * over a small vocabulary, a few percent planted near-duplicate and
  * exact-duplicate structure, lang/source splits — WITHOUT replicating
  * rows (a naive 10× copy of sf0.1 would plant 10-cliques of exact dups
  * and measure the clique blow-up, not the operator's scaling).
  *
  * Everything derives from xxhash64(seed, id): no RNG state, so the
  * output is identical across runs and partitionings.
  *
  * Usage: Test/runMain graft.GenScaleData <outDir> [docs] [vecs]
  */
object GenScaleData {

  private val vocab = Seq("key", "agg", "row", "scan", "slow", "fast",
    "table", "value", "part", "hash", "merge", "batch", "spark", "line",
    "sort", "window", "the", "a", "stream", "query", "big", "small",
    "join", "filter", "group", "order", "data", "column", "customer",
    "shuffle", "broadcast", "bucket", "codegen", "parquet", "exchange",
    "plan")

  private def h(seed: Int, c: Column): Column = xxhash64(lit(seed), c)

  /** The word stream of document `idExpr`: 20..90 vocab words (avg ~55,
    * matching the driver tables' ~300-char word-soup documents — doc
    * LENGTH shapes n-gram similarity quadratically, so the scale corpus
    * must match it, not just the row count), fully determined by the id —
    * so a doc built from another doc's id is an exact copy of its text.
    */
  private def wordStream(idExpr: Column): Column = {
    val len = (pmod(h(1, idExpr), lit(70)) + 20).cast("int")
    concat_ws(" ", transform(sequence(lit(0), len - 1),
      k => element_at(lit(vocab.toArray),
        (pmod(h(2, idExpr * 131 + k.cast("long")), lit(vocab.size)) + 1)
          .cast("int"))))
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/root/repo/tmp-sf1")
    val nDocs = args.lift(1).map(_.toLong).getOrElse(50000L)
    val nVecs = args.lift(2).map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val langs = Seq("en", "en", "en", "en", "de", "fr", "es", "zh")
    val id = col("doc_id")
    // Planted structure at scale-invariant RATES (the driver tables'
    // magnitudes): ~1% near-dup of the predecessor (same stream + one
    // extra token -> high Jaccard, small edit distance), ~0.5% exact dup.
    val docs = spark.range(nDocs).select(col("id").as("doc_id"))
      .withColumn("text",
        when(pmod(id, lit(100)) === 1,
          concat_ws(" ", wordStream(id - 1), lit("extra")))
          .when(pmod(id, lit(200)) === 3, wordStream(id - 3))
          .otherwise(wordStream(id)))
      .withColumn("lang", element_at(lit(langs.toArray),
        (pmod(h(3, id), lit(langs.size)) + 1).cast("int")))
      .withColumn("source", concat(lit("src"), pmod(h(4, id), lit(10))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
    docs.repartition(8).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")

    // embeddings: 64-dim floats in [-1, 1), ~2% planted near-dups (the
    // predecessor's vector uniformly scaled -> cosine 1 against it)
    val vid = col("vec_id")
    val base = when(pmod(vid, lit(50)) === 1, vid - 1).otherwise(vid)
    val vecs = spark.range(nVecs).select(col("id").as("vec_id"))
      .withColumn("embedding", transform(sequence(lit(0), lit(63)),
        // cast the FINAL value: float arithmetic promotes to double in
        // Spark SQL, and a double-typed array breaks float vectorized reads
        j => (pmod(h(5, base * 67 + j.cast("long")), lit(2000)) / lit(1000.0)
          - lit(1.0)).cast("float")))
      .withColumn("embedding",
        when(pmod(vid, lit(50)) === 1,
          transform(col("embedding"), x => (x * lit(0.95)).cast("float")))
          .otherwise(col("embedding")))
      .withColumn("label", pmod(h(6, vid), lit(16)).cast("int"))
      .select("vec_id", "embedding", "label")
    vecs.repartition(4).write.mode("overwrite")
      .parquet(s"$outDir/embeddings.parquet")

    // events: the reference-parity time-series family's input (VERDICT r9
    // #2 — asof/sessionize/windows/debounce/5m-pipeline had no measured
    // growth story). Same shape as the driver table: one month span,
    // event_id ordered by ts, 5 uniform event types, ~67 events/user.
    // 10× the fixture means 10× events AND 10× users — per-user rate
    // (and so per-user session/debounce structure) stays scale-invariant,
    // so growth ratios measure the OPERATOR, not a densifying fixture.
    // ts is a monotone ramp over the month plus a sub-step hash jitter;
    // ~2% of events copy the predecessor's (user, type) — with
    // consecutive timestamps a step apart, that plants debounce-able
    // rapid-repeat bursts at a scale-invariant rate.
    val nEvents = args.lift(3).map(_.toLong).getOrElse(nDocs * 2)
    val nUsers = args.lift(4).map(_.toLong).getOrElse(math.max(nEvents / 67, 1L))
    val types = Seq("click", "view", "purchase", "signup", "error")
    val eid = col("event_id")
    val stepMicros = 30L * 86400 * 1000000 / math.max(nEvents, 1L)
    val evBase = when(pmod(eid, lit(50)) === 1, eid - 1).otherwise(eid)
    val events = spark.range(nEvents).select(col("id").as("event_id"))
      .withColumn("ts", timestamp_micros(
        lit(java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
          .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L) +
          eid * stepMicros + pmod(h(11, eid), lit(stepMicros))))
      .withColumn("user_id", pmod(h(7, evBase), lit(nUsers)))
      .withColumn("event_type", element_at(lit(types.toArray),
        (pmod(h(8, evBase), lit(types.size)) + 1).cast("int")))
      .withColumn("value",
        round(pmod(h(9, eid), lit(15000)) / lit(100.0), 2))
      .withColumn("props",
        concat(lit("{\"k\": "), pmod(h(10, eid), lit(100)), lit("}")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    events.repartition(8).write.mode("overwrite")
      .parquet(s"$outDir/events.parquet")

    // orders: the DIMENSION side of continuous_5m_pipeline's monthDim
    // (interval join's broadcast table). Fixed at 1000 rows regardless of
    // fixture scale — dims don't grow with the fact table; the pipeline's
    // growth story is the events side.
    val oid = col("o_orderkey")
    val orders = spark.range(1000).select(col("id").as("o_orderkey"))
      .withColumn("o_custkey", pmod(h(12, oid), lit(200)))
      .withColumn("o_orderstatus",
        element_at(lit(Array("O", "F", "P")),
          (pmod(h(13, oid), lit(3)) + 1).cast("int")))
      .withColumn("o_totalprice",
        round(pmod(h(14, oid), lit(5000000)) / lit(100.0), 2))
      .withColumn("o_orderdate", timestamp_micros(
        lit(java.time.LocalDateTime.of(2023, 10, 1, 0, 0)
          .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L) +
          pmod(h(15, oid), lit(120L * 86400 * 1000000))))
      .withColumn("o_orderpriority",
        concat(pmod(h(16, oid), lit(5)) + 1, lit("-PRIO")))
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    orders.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/orders.parquet")

    println(s"wrote $nDocs docs + $nVecs vecs + $nEvents events " +
      s"($nUsers users) to $outDir")
    spark.stop()
  }
}
