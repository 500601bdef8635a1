package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, Dedup, IntervalJoin, QualityGates, Resample,
  Sessionize, Similarity, TextAnalysis, Watermark}
import graft.pipeline.Bucketing
import graft.time.{RolloverCalendar, SessionCalendar}

/** Shared fragments used across the query-family traits: staging
  * helpers, calendar dims, and parameterized oracle-SQL builders.
  * Split from the monolithic SparkEntry in round 12 (bodies unchanged,
  * `private` widened to `protected` so family traits can inherit). */
private[graft] trait QueryShared {
  // ---- shared fragments -------------------------------------------------

  protected def tsStr(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Session shuffle width for PINNED pre-explode repartitions (r16
    * optimization): `repartition(col)` with no explicit count lets AQE
    * coalesce the exchange by its INPUT bytes, but a downstream
    * `explode` multiplies rows ~30–1000× — a multiplier byte-based
    * coalescing cannot see — so small corpora collapsed to ONE
    * post-shuffle partition and whole shingle/tokenize stages ran on a
    * single core (measured: curation_funnel 2×~3 s single-task Generate
    * stages, fingerprint_modp_candidates 1.9 s, source_overlap_kmv
    * 2.0 s). An explicit count disables AQE coalescing for exactly that
    * exchange while still scaling with deployment config (it reads
    * `spark.sql.shuffle.partitions`, never a constant). */
  protected def shuffleWidth(s: SparkSession): Int =
    s.sessionState.conf.numShufflePartitions

  /** Per-invocation counter for the streaming query's memory-sink name. */
  protected val streamRun = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Order-8 Hilbert key (256×256 grid): the canonical xy2d bit loop
    * unrolled into 8 deterministic column stages — quadrant CASE on
    * (rx,ry), then the conditional reflect(N−1)+swap rotation. Expects
    * integer columns `x`,`y` in [0,256); adds `hd` and consumes x/y.
    * Shared by hilbert_layout_events and layout_prune_comparison.
    */
  protected def withHilbertKey(in: DataFrame): DataFrame = {
    var df = in.withColumn("hd", lit(0L))
    for (sz <- Seq(128, 64, 32, 16, 8, 4, 2, 1)) {
      df = df
        .withColumn("rx", when((col("x").bitwiseAND(lit(sz))) > 0, 1)
          .otherwise(0))
        .withColumn("ry", when((col("y").bitwiseAND(lit(sz))) > 0, 1)
          .otherwise(0))
        .withColumn("hd", col("hd") + lit(sz.toLong * sz) *
          when(col("rx") === 1 && col("ry") === 0, 3)
            .when(col("rx") === 1, 2).otherwise(col("ry")))
        // reflect with N−1 (=255, the FULL grid), not s−1: the
        // coordinate can exceed s at this stage, and the canonical
        // rot() reflects within the whole grid (checked by hand
        // against the order-2 curve: (3,1)→12, (1,2)→7).
        .withColumn("nx",
          when(col("ry") === 0,
            when(col("rx") === 1, lit(255) - col("y"))
              .otherwise(col("y"))).otherwise(col("x")))
        .withColumn("ny",
          when(col("ry") === 0,
            when(col("rx") === 1, lit(255) - col("x"))
              .otherwise(col("x"))).otherwise(col("y")))
        .withColumn("x", col("nx")).withColumn("y", col("ny"))
        .drop("rx", "ry", "nx", "ny")
    }
    df
  }

  /** Write-once staging dirs for the streaming query, keyed per
    * (session, sfDir): the staged fixture never changes within a session,
    * and re-writing it every bench pass would time fixture prep, not the
    * streaming path (the bucketed-join query's write-once rationale).
    */
  protected val stagedEvents =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Unique per-session staging key (ADVICE r10): the previous
    * `System.identityHashCode(session)` key could — after a session is
    * GC'd — collide with a NEW session's hash and serve it a stale layout
    * built from a different session's view of the same dir. A WeakHashMap
    * of random UUIDs is collision-free and still lets dead sessions (and
    * their map entries) be collected.
    */
  protected val sessionTags = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  protected def sessionTag(s: SparkSession): String =
    sessionTags.computeIfAbsent(s,
      _ => java.util.UUID.randomUUID().toString)

  /** Staged-fixture temp dir with JVM-exit cleanup (ADVICE r10): every
    * staged layout used to leak its parquet tree past process death;
    * registering one recursive-delete hook per root bounds the leak to
    * the process lifetime (in-process reuse is already handled by the
    * staging maps).
    */
  protected def stagedTmpDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(p.toFile)
    }))
    p.toString
  }

  /** Same write-once staging for the streaming-dedup documents fixture. */
  protected val stagedDocs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the stream-stream join fixture (events with ids/keys). */
  protected val stagedEventsFull =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the JSONL ingestion fixture (documents as JSON lines
    * plus three planted malformed lines). */
  protected val stagedJsonl =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the CSV ingestion fixture (documents as CSV plus three
    * planted malformed lines: under-length, bad type, over-length). */
  protected val stagedCsv =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging root for the idempotent-sink fixture (events split into 4
    * source files; `in/` is the stream source, `out/` the sink). */
  protected val stagedIdem =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the ORC ingestion fixture (documents round-tripped
    * through the third interchange format). */
  protected val stagedOrc =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the Avro ingestion fixture (row-oriented interchange —
    * the Kafka-adjacent format of the family). */
  protected val stagedAvro =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the XML ingestion fixture (Spark 4's built-in XML
    * source; documents as <doc> row elements). */
  protected val stagedXml =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the schema-evolution fixture (two parquet batches with
    * different schemas under one root). */
  protected val stagedEvo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the streaming session-window fixture (events keyed by
    * user plus a far-future sentinel that flushes the final sessions). */
  protected val stagedSess =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the hive-partitioned events layout (directory per
    * event_type, the partition-pruning read path). */
  protected val stagedPart =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the dynamic-partition-pruning fixture: the partitioned
    * fact PLUS a real dim table carrying the above-average qualifier. */
  protected val stagedDpp =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the persisted IVF index: embeddings partitioned by cell
    * id plus the trained centroid table — the index IS the layout. */
  protected val stagedIvf =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the incremental-IVF state: "yesterday's" persisted
    * cell assignment of the base (vec_id % 10 != 0) corpus — the
    * artifact an ANN deployment holds between index-maintenance runs;
    * the ivm_ivf_append query then measures the append path alone
    * (assign ONLY the delta, merge with the stored layout). */
  protected val stagedIvmIvf =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the persisted kNN-graph substrate (VERDICT r9 #1): the
    * within-cell top-5 edge list, built ONCE per (session, sfDir) and
    * written partitioned by source cell. The ~12 graph-family queries
    * all analyze this SAME graph; serving rank≤k slices from the layout
    * replaces a per-query corpus-wide similarity join (the whole top of
    * the r9 bench profile) with a graph-sized pruned parquet scan. */
  protected val stagedKnn =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The graph family's shared kNN edge frame (src, rank, dst, sim) at
    * k ≤ 5, served from the build-once layout. Centroids are the
    * lowest-id vectors (the family's fixed deterministic seeding), kMax=5
    * because rank≤k on the (sim desc, dst)-ranked edge list is EXACTLY
    * the k-graph for every k ≤ kMax — one layout serves all consumers.
    *
    * Cell count scales with the corpus (KnnGraph's documented contract:
    * "cells of constant size for linear total work"): within-cell
    * candidate generation is Σ|cell|², so a FIXED cell count makes the
    * one-time build quadratic — the r11 16→50 s staging growth was
    * exactly this, and at 100× it would be ~10000× the base build.
    * max(8, ⌈n/2000⌉) keeps ~2000-vector cells at every decade while
    * staying the historical 8 cells at all driver SFs (n ≤ 5000), so
    * every oracle-checked result is bit-unchanged. */
  protected def knnEdges(s: SparkSession, d: String, k: Int): DataFrame = {
    require(k <= 5, s"persisted kNN layout is built at kMax=5; got k=$k")
    val root = stagedKnn.computeIfAbsent(
      s"${sessionTag(s)}:$d", _ => {
        val tmp = stagedTmpDir("graft_knn")
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"))
        val nCells = math.max(8L, (emb.count() + 1999L) / 2000L)
        val cents = emb.filter(col("vec_id") < nCells)
          .select(col("vec_id").cast("int").as("cid"),
            col("embedding").as("centroid"))
        graft.ops.KnnGraph.persistInCells(emb, cents, kMax = 5,
          path = s"$tmp/edges")
        tmp
      })
    graft.ops.KnnGraph.readEdges(s, s"$root/edges", k)
  }

  /** Staging for the incremental-components state: "yesterday's"
    * materialized (v, comp) labels over the 90% edge split — the
    * artifact a production deployment holds between maintenance runs,
    * built once per (session, sfDir) like the kNN layout itself so the
    * measured query is the DELTA path, not a from-scratch rebuild. */
  protected val stagedCcLabels =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the transformWithState fixture (per-(user, ts) collapsed
    * events in four sequential time-quartile files, so running state is
    * genuinely cross-micro-batch and arrival order is event-time order). */
  protected val stagedTws =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the streaming quantile-sketch fixture: events split into
    * four files by event_id residue — deliberately NOT time-ordered,
    * because the sketch's merge identity makes the final state
    * batching-invariant under ANY arrival order (that invariance is the
    * thing the oracle checks). */
  protected val stagedQSketch =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the left-outer stream-stream join fixture: events plus
    * one sentinel per SIDE (purchase and view) past end + horizon +
    * lateness, so both input watermarks advance far enough to flush every
    * real unmatched left row (outer emission waits for window close). */
  protected val stagedEventsOuter =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the dedup state-eviction fixture: the documents stream
    * in one file, then a second file of duplicates TWO DAYS later — far
    * past the watermark delay, so their key state has been evicted and
    * the duplicates re-emit (the bounded-state contract made visible). */
  protected val stagedDedupEvict =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the timer-session fixture: clicks in one file, then two
    * watermark advancers (max+13h, max+2d) — the first pushes the
    * watermark past every real session's end + gap, the second's BATCH
    * fires the timers against it (timer expiry is checked during a
    * batch, with the watermark computed at the end of the previous one). */
  protected val stagedTimerSess =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Staging for the streaming-MERGE fixture: the pre-cutoff per-user
    * snapshot (`state/v0`) plus the post-cutoff change feed in four
    * sequential time-quartile files (`in/q0..q3`) — time-ordered arrival
    * is what makes sequential latest-wins equal the one-shot MERGE. */
  protected val stagedMergeCdc =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Run a streaming query with `spark.sql.shuffle.partitions` pinned to
    * a state-sized value, restoring the session setting afterwards. The
    * conf at stream START fixes the STATE STORE partition count for the
    * query's whole life — a real streaming deployment sizes it to arrival
    * rate and state volume, not to the session's batch shuffle width
    * (here 32, which costs 32 state-store instances per stateful operator
    * per micro-batch; these fixtures carry kilobytes of state each).
    *
    * Also pins `spark.sql.streaming.checkpoint.fileChecksum.enabled=false`
    * for the stream's life (optimization r17): Spark 4.1's checkpoint
    * checksum layer writes a companion checksum file for EVERY state-store
    * delta/offset/commit file through an async pool whose completion the
    * task-side `close()` AWAITS — thread dumps during the stateful stages
    * showed every join task parked in
    * `ChecksumCheckpointFileManager.awaitResult` under
    * `HDFSBackedStateStoreProvider.finalizeDeltaFile`, ~0.5–0.75 s of
    * run-vs-cpu gap per task (streaming_interval_join batch-1 stage: 8
    * tasks, 4 446 ms summed run, 327 ms cpu), and disabling it measured
    * that stage 4 446 → ~3 000 ms run. These fixtures' checkpoints are
    * per-run temp dirs deleted at JVM exit — corruption detection buys
    * nothing on files that live for seconds, and any corruption would
    * fail the oracle hash anyway. Production deployments with durable
    * checkpoints keep Spark's default: this pin scopes to the fixture
    * wrapper, not the session builder or the library operators.
    */
  protected def withStatePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val ckKey = "spark.sql.streaming.checkpoint.fileChecksum.enabled"
    val prev = s.conf.get(key)
    val prevCk = s.conf.getOption(ckKey)
    s.conf.set(key, n.toString)
    s.conf.set(ckKey, "false")
    try body finally {
      s.conf.set(key, prev)
      prevCk match {
        case Some(v) => s.conf.set(ckKey, v)
        case None => s.conf.unset(ckKey)
      }
    }
  }

  /** Monthly calendar dimension derived from `orders` — the settle-config
    * analog on driver testdata: non-overlapping [start_k, settle_k]
    * intervals (min/max order date within each month) + a numeric payload.
    */
  protected def monthDim(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyyMM").as("contract_year_month"))
      .agg(min(col("o_orderdate")).as("start_k"),
        max(col("o_orderdate")).as("settle_k"),
        count(lit(1)).cast("double").as("accumulated_contract_diff"))

  protected val monthDimSql =
    """SELECT strftime(o_orderdate, '%Y%m') AS contract_year_month,
      |       min(o_orderdate) AS start_k, max(o_orderdate) AS settle_k,
      |       CAST(count(*) AS DOUBLE) AS accumulated_contract_diff
      |FROM orders GROUP BY 1""".stripMargin

  // ---- queries ----------------------------------------------------------

  // ---- oracles ----------------------------------------------------------

  /** Unrolled xy2d Hilbert oracle for hilbert_layout_events: the same 8
    * rotation stages as the engine side, generated as chained CTEs (each
    * stage reads the previous stage's (x, y, hd) — the sequential bit
    * loop made relational).
    */
  protected def hilbertOracleSql: String = {
    val stages = Seq(128, 64, 32, 16, 8, 4, 2, 1).zipWithIndex.map {
      case (sz, i) =>
        s"""h${i + 1} AS (
           |  SELECT event_id,
           |    hd + ${sz * sz} * (CASE
           |      WHEN (x & $sz) > 0 AND (y & $sz) = 0 THEN 3
           |      WHEN (x & $sz) > 0 THEN 2
           |      WHEN (y & $sz) > 0 THEN 1 ELSE 0 END) AS hd,
           |    CASE WHEN (y & $sz) = 0 THEN
           |      CASE WHEN (x & $sz) > 0 THEN 255 - y ELSE y END
           |    ELSE x END AS x,
           |    CASE WHEN (y & $sz) = 0 THEN
           |      CASE WHEN (x & $sz) > 0 THEN 255 - x ELSE x END
           |    ELSE y END AS y
           |  FROM h$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS (
       |  SELECT event_id, epoch_us(ts) AS eus,
       |    CAST(floor(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |sp AS (SELECT min(eus) AS tlo, max(eus) AS thi,
       |  min(cents) AS vlo, max(cents) AS vhi FROM e),
       |h0 AS (
       |  SELECT event_id,
       |    CAST(((cents - vlo) * 256) // (vhi - vlo + 1) AS INT) AS x,
       |    CAST(((eus - tlo) * 256) // (thi - tlo + 1) AS INT) AS y,
       |    CAST(0 AS BIGINT) AS hd
       |  FROM e CROSS JOIN sp),
       |$stages
       |SELECT hd // 256 AS key_bucket, count(*) AS n,
       |  min(hd) AS min_key, max(hd) AS max_key,
       |  CAST(sum(hd) AS BIGINT) AS key_sum
       |FROM h8 GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Same Hilbert CTE ladder as [[hilbertOracleSql]] but carrying the
    * natural chunk and the frozen (x0, y0) coordinates through, plus the
    * Morton interleave, for layout_prune_comparison.
    */
  protected def layoutPruneOracleSql: String = {
    val stages = Seq(128, 64, 32, 16, 8, 4, 2, 1).zipWithIndex.map {
      case (sz, i) =>
        s"""h${i + 1} AS (
           |  SELECT chunk_nat, x0, y0,
           |    hd + ${sz * sz} * (CASE
           |      WHEN (x & $sz) > 0 AND (y & $sz) = 0 THEN 3
           |      WHEN (x & $sz) > 0 THEN 2
           |      WHEN (y & $sz) > 0 THEN 1 ELSE 0 END) AS hd,
           |    CASE WHEN (y & $sz) = 0 THEN
           |      CASE WHEN (x & $sz) > 0 THEN 255 - y ELSE y END
           |    ELSE x END AS x,
           |    CASE WHEN (y & $sz) = 0 THEN
           |      CASE WHEN (x & $sz) > 0 THEN 255 - x ELSE x END
           |    ELSE y END AS y
           |  FROM h$i)""".stripMargin
    }.mkString(",\n")
    val zterms = (for {
      (dim, dd) <- Seq("x0", "y0").zipWithIndex
      i <- 0 until 8
    } yield s"((($dim >> $i) & 1) << ${i * 2 + dd})").mkString(" | ")
    def lay(name: String, chunk: String) =
      s"""SELECT '$name' AS layout,
         |  CAST(sum(CASE WHEN matched THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_rows_matched,
         |  count(DISTINCT CASE WHEN matched THEN $chunk END)
         |    AS chunks_touched,
         |  count(DISTINCT $chunk) AS chunks_total,
         |  (1000 * (count(DISTINCT $chunk)
         |    - count(DISTINCT CASE WHEN matched THEN $chunk END)))
         |    // count(DISTINCT $chunk) AS prune_permille
         |FROM k""".stripMargin
    s"""WITH e AS (
       |  SELECT event_id, epoch_us(ts) AS eus,
       |    CAST(floor(value * 100) AS BIGINT) AS cents
       |  FROM events),
       |sp AS (SELECT min(eus) AS tlo, max(eus) AS thi,
       |  min(cents) AS vlo, max(cents) AS vhi,
       |  min(event_id) AS ilo, max(event_id) AS ihi FROM e),
       |h0 AS (
       |  SELECT
       |    ((event_id - ilo) * 256) // (ihi - ilo + 1) AS chunk_nat,
       |    CAST(((cents - vlo) * 256) // (vhi - vlo + 1) AS INT) AS x0,
       |    CAST(((eus - tlo) * 256) // (thi - tlo + 1) AS INT) AS y0,
       |    CAST(((cents - vlo) * 256) // (vhi - vlo + 1) AS INT) AS x,
       |    CAST(((eus - tlo) * 256) // (thi - tlo + 1) AS INT) AS y,
       |    CAST(0 AS BIGINT) AS hd
       |  FROM e CROSS JOIN sp),
       |$stages,
       |k AS (
       |  SELECT chunk_nat, zd // 256 AS chunk_z, hd // 256 AS chunk_h,
       |    (x0 BETWEEN 100 AND 140 AND y0 BETWEEN 64 AND 128) AS matched
       |  FROM (SELECT h8.*, CAST($zterms AS BIGINT) AS zd FROM h8))
       |${lay("1_natural", "chunk_nat")}
       |UNION ALL
       |${lay("2_zorder", "chunk_z")}
       |UNION ALL
       |${lay("3_hilbert", "chunk_h")}
       |ORDER BY layout""".stripMargin
  }

  /** Oracle for cdc_chunk_dedup_rabin: the rolling polynomial re-derived
    * per position as a closed form — 8 ord() terms with literal 32^k
    * coefficients (no modulus needed, see RabinChunkStarts) — then the
    * same sentinel/lead/md5-chunk accounting as the md5 CDC oracle.
    */
  protected def rabinCdcOracleSql: String = {
    val terms = (7 to 0 by -1).map(j =>
      s"CAST(ord(substr(t, i - $j, 1)) AS BIGINT) * ${BigInt(32).pow(j)}")
      .mkString("\n             + ")
    s"""WITH n AS (SELECT doc_id,
       |    trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
       |  FROM documents),
       |b AS (
       |  SELECT doc_id, t, unnest(
       |    list_concat([CAST(1 AS BIGINT)],
       |      list_concat(
       |        [CAST(i + 1 AS BIGINT) for i in range(8, len(t) + 1)
       |         if (($terms) & 63) = 0],
       |        [CAST(len(t) + 1 AS BIGINT)]))) AS pos
       |  FROM n),
       |bd AS (SELECT DISTINCT doc_id, t, pos FROM b),
       |ch AS (
       |  SELECT doc_id, pos AS st,
       |    lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS en, t
       |  FROM bd),
       |chunks AS (
       |  SELECT md5(substr(t, CAST(st AS INT), CAST(en - st AS INT)))
       |    AS ch
       |  FROM ch WHERE en IS NOT NULL AND en > st)
       |SELECT count(*) AS n_chunk_slots,
       |  count(DISTINCT ch) AS n_distinct_chunks,
       |  count(*) - count(DISTINCT ch) AS dup_slots
       |FROM chunks""".stripMargin
  }

  /** Generated oracle for minhash_band_recall_curve: 16 md5 signature
    * mins (sign-masked to match the Spark side bit-for-bit), three band
    * configurations as OR-of-conjunction pair joins, gold from the
    * all-pairs Jaccard closure.
    */
  protected def minhashBandOracleSql: String = {
    val sigDefs = (0 until 16).map(i =>
      s"""min(CAST(md5_number_upper('mh$i|' || g)
         |      & 9223372036854775807 AS BIGINT)) AS s$i""".stripMargin)
      .mkString(",\n    ")
    def disj(b: Int, r: Int) = (0 until b).map(j =>
      "(" + (0 until r).map(x => s"a.s${j * r + x} = b.s${j * r + x}")
        .mkString(" AND ") + ")").mkString("\n     OR ")
    def cand(name: String, b: Int, r: Int) =
      s"""$name AS (
         |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
         |  FROM sg a JOIN sg b ON a.doc_id < b.doc_id
         |  WHERE ${disj(b, r)})""".stripMargin
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
       |                   for i in range(1, len(s) - 1)]) AS sh
       |  FROM (SELECT doc_id, regexp_split_to_array(
       |          trim(lower(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS s
       |        FROM documents WHERE doc_id < 1024)),
       |u2 AS (SELECT doc_id, unnest(sh) AS g FROM t),
       |sg AS (SELECT doc_id,
       |    $sigDefs
       |  FROM u2 GROUP BY 1),
       |p AS (
       |  SELECT a.doc_id AS id1, b.doc_id AS id2,
       |    len(list_intersect(a.sh, b.sh))::DOUBLE /
       |      len(list_distinct(list_concat(a.sh, b.sh))) AS j
       |  FROM t a JOIN t b ON a.doc_id < b.doc_id),
       |gold AS (SELECT id1, id2 FROM p WHERE j >= 0.8),
       |ng AS (SELECT count(*) AS n_gold FROM gold),
       |${cand("c0", 1, 16)},
       |${cand("c1", 2, 8)},
       |${cand("c2", 4, 4)},
       |${cand("c3", 8, 2)},
       |cand AS (
       |  SELECT 'b1_r16' AS config, id1, id2 FROM c0
       |  UNION ALL SELECT 'b2_r8', id1, id2 FROM c1
       |  UNION ALL SELECT 'b4_r4', id1, id2 FROM c2
       |  UNION ALL SELECT 'b8_r2', id1, id2 FROM c3),
       |j AS (
       |  SELECT cand.config, gold.id1 AS gid
       |  FROM cand LEFT JOIN gold
       |    ON gold.id1 = cand.id1 AND gold.id2 = cand.id2)
       |SELECT j.config, count(*) AS n_candidates, ng.n_gold,
       |  CAST(sum(CASE WHEN gid IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_hit,
       |  (1000 * CAST(sum(CASE WHEN gid IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT)) // ng.n_gold AS recall_permille,
       |  (1000 * CAST(sum(CASE WHEN gid IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT)) // count(*) AS precision_permille
       |FROM j CROSS JOIN ng GROUP BY 1, ng.n_gold
       |ORDER BY 1""".stripMargin
  }

  /** Unrolled Bellman-Ford oracle for weighted_sssp_knn: the kNN chain,
    * rounded-sim edge weights floor((1 − sim₆)·10⁶), seeds 0–3, and 12
    * explicit relax rounds (measured fixpoint: 5 at sf0.01, 8 at sf0.1).
    * A deeper-than-12 fixpoint shows up as a distance mismatch, never a
    * silent truncation.
    */
  protected def ssspOracleSql: String = {
    val rounds = (1 to 12).map { r =>
      s"""d$r AS MATERIALIZED (
         |  SELECT v, min(d) AS d FROM (
         |    SELECT v, d FROM d${r - 1}
         |    UNION ALL
         |    SELECT ed.u AS v, d${r - 1}.d + ed.w AS d
         |    FROM d${r - 1} JOIN ed ON ed.v = d${r - 1}.v
         |  ) GROUP BY v)""".stripMargin
    }.mkString(",\n")
    s"""WITH c AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS cv
       |  FROM embeddings WHERE vec_id < 8),
       |s AS (
       |  SELECT a.vec_id, c.cid,
       |    list_sum([a.embedding[i]::DOUBLE * c.cv[i]::DOUBLE
       |              for i in range(1, len(a.embedding) + 1)]) /
       |    (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
       |                    for i in range(1, len(a.embedding) + 1)])) *
       |     sqrt(list_sum([c.cv[i]::DOUBLE * c.cv[i]::DOUBLE
       |                    for i in range(1, len(c.cv) + 1)]))) AS sim
       |  FROM embeddings a CROSS JOIN c),
       |asg AS (SELECT vec_id, cid FROM s
       |  QUALIFY row_number() OVER (PARTITION BY vec_id
       |                             ORDER BY sim DESC, cid) = 1),
       |p AS (
       |  SELECT x.vec_id AS src, y.vec_id AS dst,
       |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
       |              for i in range(1, len(ax.embedding) + 1)]) /
       |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
       |                    for i in range(1, len(ax.embedding) + 1)])) *
       |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
       |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
       |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
       |  JOIN embeddings ax ON ax.vec_id = x.vec_id
       |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
       |e AS (SELECT src, dst, round(sim, 6) AS sm FROM (
       |    SELECT src, dst, sim, row_number() OVER (PARTITION BY src
       |      ORDER BY sim DESC, dst) AS rank FROM p) WHERE rank <= 3),
       |uw AS MATERIALIZED (
       |  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
       |    CAST(floor((1 - max(sm)) * 1000000) AS BIGINT) AS w
       |  FROM e GROUP BY 1, 2),
       |ed AS MATERIALIZED (SELECT a AS v, b AS u, w FROM uw
       |  UNION ALL SELECT b, a, w FROM uw),
       |d0 AS MATERIALIZED (SELECT DISTINCT v, CAST(0 AS BIGINT) AS d
       |  FROM ed WHERE v < 4),
       |$rounds
       |SELECT v, d FROM d12 ORDER BY v""".stripMargin
  }

  /** Unrolled peel oracle for graph_onion_layers_knn: the same kNN chain
    * as degree_distribution_knn's oracle up to the undirected edge set
    * `u`, then 8 explicit k=4 peel rounds (measured fixpoint: 4 rounds at
    * both oracle SFs; if regenerated data ever peels deeper than 8, s8 is
    * not the fixpoint and the compare FAILS rather than silently
    * mislabeling unpeeled vertices as core).
    */
  protected def onionOracleSql: String = {
    val rounds = (1 to 8).map { r =>
      s"""e$r AS MATERIALIZED (SELECT a, b FROM u
         |  WHERE a IN (SELECT v FROM s${r - 1})
         |    AND b IN (SELECT v FROM s${r - 1})),
         |d$r AS MATERIALIZED (SELECT v, count(*) AS deg FROM (
         |  SELECT a AS v FROM e$r UNION ALL SELECT b FROM e$r) GROUP BY 1),
         |s$r AS MATERIALIZED (SELECT s.v FROM s${r - 1} s JOIN d$r d ON d.v = s.v
         |  WHERE d.deg >= 4)""".stripMargin
    }.mkString(",\n")
    val layerArms = (1 to 8).map { r =>
      s"SELECT v, $r AS layer FROM s${r - 1} " +
        s"WHERE v NOT IN (SELECT v FROM s$r)"
    }.mkString("\n  UNION ALL ")
    s"""WITH c AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS cv
       |  FROM embeddings WHERE vec_id < 8),
       |s AS (
       |  SELECT a.vec_id, c.cid,
       |    list_sum([a.embedding[i]::DOUBLE * c.cv[i]::DOUBLE
       |              for i in range(1, len(a.embedding) + 1)]) /
       |    (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
       |                    for i in range(1, len(a.embedding) + 1)])) *
       |     sqrt(list_sum([c.cv[i]::DOUBLE * c.cv[i]::DOUBLE
       |                    for i in range(1, len(c.cv) + 1)]))) AS sim
       |  FROM embeddings a CROSS JOIN c),
       |asg AS (SELECT vec_id, cid FROM s
       |  QUALIFY row_number() OVER (PARTITION BY vec_id
       |                             ORDER BY sim DESC, cid) = 1),
       |p AS (
       |  SELECT x.vec_id AS src, y.vec_id AS dst,
       |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
       |              for i in range(1, len(ax.embedding) + 1)]) /
       |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
       |                    for i in range(1, len(ax.embedding) + 1)])) *
       |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
       |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
       |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
       |  JOIN embeddings ax ON ax.vec_id = x.vec_id
       |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
       |e AS (SELECT src, dst FROM (
       |    SELECT src, dst, row_number() OVER (PARTITION BY src
       |      ORDER BY sim DESC, dst) AS rank FROM p) WHERE rank <= 3),
       |u AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
       |  greatest(src, dst) AS b FROM e WHERE src <> dst),
       |s0 AS MATERIALIZED (SELECT DISTINCT a AS v FROM u
       |  UNION SELECT DISTINCT b FROM u),
       |$rounds,
       |layers AS (
       |  $layerArms
       |  UNION ALL SELECT v, 0 AS layer FROM s8)
       |SELECT layer, count(*) AS n_vertices,
       |  CAST(sum(v) AS BIGINT) AS id_checksum
       |FROM layers GROUP BY 1 ORDER BY layer""".stripMargin
  }

  protected val ohlcvOracle = """
    |SELECT event_type,
    |  strftime(time_bucket(%BUCKET%, ts - INTERVAL 1 MICROSECOND%OFF%),
    |           '%Y-%m-%d %H:%M:%S') AS ts,
    |  arg_min(value, ts) AS open, max(value) AS high, min(value) AS low,
    |  arg_max(value, ts) AS close, count(*) AS volume
    |FROM events GROUP BY 1, 2 ORDER BY event_type, ts""".stripMargin

  /** Deterministic near-dup perturbation for the ANN recall oracles: each
    * coordinate scaled by 1 + {-3..3}·0.08, the factor keyed on (id,
    * coordinate) by integer arithmetic both engines evaluate identically;
    * the result is cast back to FLOAT so both sides compute cosine in
    * double over bit-identical float inputs. Cosine to the source vector
    * lands ≈ 0.985 — close enough to be a genuine near-duplicate, far
    * enough that retrieval must cross hyperplane/cell boundaries (an
    * EXACT copy would reduce the recall check to the trivial self-hit).
    * SQL mirror: [[perturbSqlFor]].
    */
  protected def perturb(idCol: Column, vec: Column): Column =
    transform(vec, (x, j) =>
      (x.cast("double") * (lit(1.0) +
        (pmod(idCol * 31 + j.cast("long") * 17, lit(7)) - 3).cast("double") *
          lit(0.08))).cast("float"))

  /** DuckDB mirror of [[perturb]] over column `vecExpr` of row alias with
    * id `idExpr` (DuckDB lists are 1-based, hence `i-1`).
    */
  protected def perturbSqlFor(idExpr: String, vecExpr: String): String =
    s"""[($vecExpr[i]::DOUBLE * (1.0 +
       |  (($idExpr*31 + (i-1)*17) % 7 - 3)::DOUBLE * 0.08))::FLOAT
       | for i in range(1, len($vecExpr) + 1)]""".stripMargin

  /** The 10 perturbed near-dup queries shared by the ANN driver entries. */
  protected def perturbedQueries(emb: DataFrame): DataFrame =
    emb.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"),
      perturb(col("vec_id"), col("embedding")).as("query_vec"))

  /** Emit the EXACT top-5 rows plus one global recall@1 bound measured on
    * the ANN result: the true nearest neighbour (exact rank 1) must appear
    * anywhere in the ANN top-5 for ≥ 80% of queries. All frames here are
    * queries×k-sized — the 1-row bound is a broadcast, not a barrier.
    */
  protected def withRecallOk(exact: DataFrame, ann: DataFrame): DataFrame = {
    val top1 = exact.filter(col("rank") === 1)
      .select(col("query_id"), col("vec_id").as("nn_id"))
    val found = top1.join(
      ann.select(col("query_id"), col("vec_id").as("nn_id")),
      Seq("query_id", "nn_id"))
    val ok = broadcast(top1.agg(count(lit(1)).as("nq"))
      .crossJoin(found.agg(count(lit(1)).as("nh")))
      .select((col("nh").cast("double") >= col("nq").cast("double") * 0.8)
        .as("recall_ok")))
    exact.crossJoin(ok)
      .select(col("query_id"), col("rank"), col("vec_id"), col("sim"),
        col("recall_ok"))
      .orderBy("query_id", "rank")
  }

  /** Exact cosine top-5 oracle, shared by `embed_topk_bruteforce` and the
    * exact-degenerate ANN configs (which provably return the same rows).
    */
  protected val topk5OracleSql: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
      |s AS (
      |  SELECT q.query_id, e.vec_id,
      |    list_sum([e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE
      |              for i in range(1, len(e.embedding) + 1)]) /
      |    (sqrt(list_sum([e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE
      |                    for i in range(1, len(e.embedding) + 1)])) *
      |     sqrt(list_sum([q.qv[i]::DOUBLE * q.qv[i]::DOUBLE
      |                    for i in range(1, len(q.qv) + 1)]))) AS sim
      |  FROM embeddings e CROSS JOIN q),
      |r AS (
      |  SELECT query_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      |  FROM s)
      |SELECT query_id, rank, vec_id, round(sim, 6) AS sim FROM r
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** The k=3 within-cell kNN edge list — shared by embed_knn_graph
    * (fresh build) and knn_graph_persisted (layout-served slice): cell
    * assignment over the 8 lowest-id centroids, exact within-cell top-3
    * by (sim desc, dst); both engines compute the cosine as a double dot
    * product in index order, so rounded sims and ranking are
    * bit-identical. */
  protected val knnGraphK3OracleSql: String =
    """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS cv
      |      FROM embeddings WHERE vec_id < 8),
      |s AS (
      |  SELECT a.vec_id, c.cid,
      |    list_sum([a.embedding[i]::DOUBLE * c.cv[i]::DOUBLE
      |              for i in range(1, len(a.embedding) + 1)]) /
      |    (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
      |                    for i in range(1, len(a.embedding) + 1)])) *
      |     sqrt(list_sum([c.cv[i]::DOUBLE * c.cv[i]::DOUBLE
      |                    for i in range(1, len(c.cv) + 1)]))) AS sim
      |  FROM embeddings a CROSS JOIN c),
      |asg AS (
      |  SELECT vec_id, cid FROM s
      |  QUALIFY row_number() OVER (PARTITION BY vec_id
      |                             ORDER BY sim DESC, cid) = 1),
      |p AS (
      |  SELECT x.vec_id AS src, y.vec_id AS dst,
      |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
      |              for i in range(1, len(ax.embedding) + 1)]) /
      |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
      |                    for i in range(1, len(ax.embedding) + 1)])) *
      |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
      |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
      |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
      |  JOIN embeddings ax ON ax.vec_id = x.vec_id
      |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
      |r AS (
      |  SELECT src, dst, sim,
      |    row_number() OVER (PARTITION BY src
      |                       ORDER BY sim DESC, dst) AS rank
      |  FROM p)
      |SELECT src, rank, dst, round(sim, 6) AS sim FROM r
      |WHERE rank <= 3 ORDER BY src, rank""".stripMargin

  /** Exact top-5 of the PERTURBED near-dup queries + the asserted recall
    * bound — oracle for the approximate ANN driver entries (see
    * `embed_topk_lsh`). The oracle recomputes the exact side in full; the
    * recall boolean is the Spark-side measurement it pins to TRUE.
    */
  protected val topk5PerturbedOracleSql: String =
    s"""WITH q AS (
      |  SELECT vec_id AS query_id,
      |    ${perturbSqlFor("vec_id", "embedding")} AS qv
      |  FROM embeddings WHERE vec_id < 10),
      |s AS (
      |  SELECT q.query_id, e.vec_id,
      |    list_sum([e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE
      |              for i in range(1, len(e.embedding) + 1)]) /
      |    (sqrt(list_sum([e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE
      |                    for i in range(1, len(e.embedding) + 1)])) *
      |     sqrt(list_sum([q.qv[i]::DOUBLE * q.qv[i]::DOUBLE
      |                    for i in range(1, len(q.qv) + 1)]))) AS sim
      |  FROM embeddings e CROSS JOIN q),
      |r AS (
      |  SELECT query_id, vec_id, sim,
      |    row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
      |  FROM s)
      |SELECT query_id, rank, vec_id, round(sim, 6) AS sim, true AS recall_ok
      |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

}
