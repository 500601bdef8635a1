package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{Resample, Watermark}

/** Property-based invariants (SURVEY.md §5): randomized 1-min bar batches
  * must preserve OHLC ordering, volume, and resample composition. Uses raw
  * ScalaCheck generators with fixed seeds (deterministic, offline-friendly
  * — no scalatestplus bridge in the dependency set).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val base = Timestamp.valueOf("2024-01-02 08:00:00").getTime

  private val barsGen: Gen[List[(Timestamp, Double, Double, Double, Double, Long)]] =
    Gen.nonEmptyListOf(for {
      minute <- Gen.choose(0, 600)
      mid <- Gen.choose(50.0, 150.0)
      spread <- Gen.choose(0.0, 5.0)
      o <- Gen.choose(mid - spread, mid + spread)
      c <- Gen.choose(mid - spread, mid + spread)
      v <- Gen.choose(1L, 100L)
    } yield (new Timestamp(base + minute * 60000L),
      o, math.max(o, c) + spread, math.min(o, c) - spread, c, v))
      .map(_.distinctBy(_._1)) // unique timestamps (the 1-min-grid invariant)

  private def samples(n: Int): Seq[List[(Timestamp, Double, Double, Double, Double, Long)]] =
    (0 until n).flatMap { i =>
      barsGen.apply(Gen.Parameters.default.withSize(60), Seed(42L + i))
    }

  test("resampling preserves the OHLC ordering invariant and total volume") {
    for (rows <- samples(5)) {
      val df = rows.toDF("ts", "open", "high", "low", "close", "volume")
      val out = Resample.ohlcvBars(df, "5 minutes").cache()
      val bad = out.filter(!(col("low") <= least(col("open"), col("close")) &&
        greatest(col("open"), col("close")) <= col("high"))).count()
      assert(bad == 0)
      assert(out.agg(sum("volume")).as[Long].head() == rows.map(_._6).sum)
    }
  }

  test("resample composition: (1m -> 5m closed-right) -> 60m closed-left == 1m -> 60m closed-right") {
    for (rows <- samples(5)) {
      val df = rows.toDF("ts", "open", "high", "low", "close", "volume")
      val via5 = Resample.ohlcvBars(
        Resample.ohlcvBars(df, "5 minutes"), "60 minutes", closedRight = false)
      val direct = Resample.ohlcvBars(df, "60 minutes")
      assert(via5.orderBy("ts").collect().toSeq == direct.orderBy("ts").collect().toSeq)
    }
  }

  test("watermark filter is idempotent and partitions the batch") {
    for (rows <- samples(5)) {
      val df = rows.toDF("ts", "open", "high", "low", "close", "volume")
      val wmRow = rows(rows.length / 2)._1
      val fresh = Watermark.newerThan(df, Some(wmRow))
      assert(Watermark.newerThan(fresh, Some(wmRow)).count() == fresh.count())
      val stale = df.filter(col("ts") <= lit(wmRow))
      assert(fresh.count() + stale.count() == rows.length)
    }
  }

  test("hash sampling is MONOTONE in the fraction: sample(f1) subset of sample(f2), f1 <= f2") {
    // threshold sampling's growth property: raising the keep-rate only ever
    // ADDS rows — a rerun at a higher rate reuses every previously selected
    // key (rand()-based sampling has no such property). Checked across a
    // ladder of fractions.
    import graft.ops.Sampling
    val df = spark.range(20000).toDF("id")
    val ladders = Seq(0.01, 0.05, 0.2, 0.5, 0.9)
      .map(f => f -> Sampling.sample(df, "id", f).as[Long].collect().toSet)
    ladders.sliding(2).foreach {
      case Seq((f1, s1), (f2, s2)) =>
        assert(s1.subsetOf(s2), s"sample($f1) not within sample($f2)")
      case _ =>
    }
  }

  test("sequence packing is input-layout invariant") {
    // the two-level prefix sum must depend only on (id, tokens), never on
    // how the input happens to be partitioned or ordered
    import graft.ops.Packing
    val rows = (1L to 3000L).map(i => (i, 1 + (i * 131 % 500).toInt))
    def packs(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      Packing.packSequences(df, "n_tokens", "doc_id", maxTokens = 1024L)
        .select("doc_id", "pack_id").as[(Long, Int)].collect().toMap
    val a = packs(rows.toDF("doc_id", "n_tokens").repartition(3))
    val b = packs(scala.util.Random.shuffle(rows).toDF("doc_id", "n_tokens")
      .repartition(17))
    assert(a == b)
  }

  test("incremental components fold == scratch on random graphs and splits") {
    // arbitrary edge lists, arbitrary batch assignment: folding
    // Components.applyDelta over the batches must equal one
    // from-scratch run at the final step (prefix exactness is pinned
    // structurally in ComponentsSpec; here graph and split randomize)
    import graft.ops.Components
    // (a, off) with off >= 1 instead of filtered (a, b): a `if a != b`
    // guard desugars to suchThat, whose Option can come back None and
    // make the .get below throw — generate structurally-valid pairs.
    val graphGen = Gen.nonEmptyListOf(for {
      a <- Gen.choose(0L, 50L)
      off <- Gen.choose(1L, 50L)
      batch <- Gen.choose(0, 3)
      b = (a + off) % 51L
    } yield (math.min(a, b), math.max(a, b), batch))
    for (i <- 0 until 3) {
      val edges = graphGen
        .apply(Gen.Parameters.default.withSize(120), Seed(7L + i))
        .get.distinct
      val df = edges.toDF("a", "b", "batch").cache()
      var labels = Seq.empty[(Long, Long)].toDF("v", "comp")
      for (k <- 0 to 3)
        labels = Components.applyDelta(labels,
            df.filter(col("batch") === k).select("a", "b"))
          .select(col("v"), col("new_comp").as("comp"))
          .localCheckpoint()
      val scratch = Components.connectedComponents(
        df.select("a", "b"), "a", "b")
      assert(labels.except(scratch).isEmpty &&
        scratch.except(labels).isEmpty,
        s"sample $i: fold diverges from scratch over ${edges.size} edges")
    }
  }

  test("bottom-k sketches merge exactly under any random sharding") {
    import graft.ops.QuantileSketch.bottomK
    for (i <- 0 until 3) {
      val nShards = 2 + i * 3 // 2, 5, 8 shards
      val df = spark.range(4000).select(
          col("id"),
          (col("id") % 2).as("grp"),
          graft.ops.Dedup.md5Hash64(concat(lit(s"ps$i|"), col("id")))
            .bitwiseAND(lit(Long.MaxValue)).as("hk"),
          pmod(graft.ops.Dedup.md5Hash64(concat(lit(s"sh$i|"), col("id"))),
            lit(nShards.toLong)).as("shard"))
        .cache()
      val direct = bottomK(df, Seq(col("grp")), col("hk"), col("id"), 32)
        .select("grp", "id")
      val merged = bottomK(
        bottomK(df, Seq(col("grp"), col("shard")), col("hk"), col("id"), 32),
        Seq(col("grp")), col("hk"), col("id"), 32)
        .select("grp", "id")
      assert(merged.except(direct).isEmpty && direct.except(merged).isEmpty,
        s"$nShards-way shard merge diverges from the direct sketch")
    }
  }

  test("two-level global prefix sum == global window on random valued rows") {
    // RangeRank.withGlobalPrefix backs the r12 single-partition rewrites
    // (pr_curve_points, calibration_reliability): rank AND inclusive
    // running sum must match the single-partition window bit-exactly on
    // arbitrary key distributions — including heavy duplicate keys, the
    // case where range-partition boundaries land inside a tie run.
    import org.apache.spark.sql.expressions.Window
    val rowsGen = Gen.nonEmptyListOf(for {
      key <- Gen.choose(0L, 30L) // few keys => many cross-partition ties
      id <- Gen.choose(0L, 100000L)
      v <- Gen.choose(0L, 9L)
    } yield (key, id, v)).map(_.distinctBy(_._2))
    for (i <- 0 until 3) {
      val rows = rowsGen
        .apply(Gen.Parameters.default.withSize(400), Seed(99L + i))
        .getOrElse(List((1L, 1L, 1L)))
      val df = rows.toDF("key", "id", "v")
      val got = graft.ops.RangeRank.withGlobalPrefix(df,
        Seq(desc("key"), col("id")), "v", "pos", "runsum")
      val wo = Window.orderBy(desc("key"), col("id"))
      val want = df.select(col("id"),
        row_number().over(wo).cast("long").as("pos"),
        sum(col("v")).over(
          wo.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("runsum"))
      assert(got.select("id", "pos", "runsum").except(want).count() == 0L,
        s"sample $i: prefix sum diverges from the global window " +
          s"over ${rows.size} rows")
    }
  }

  test("rank-closed-form ntile == ntile() for awkward n") {
    // joint_decile_grid and matched_pairs_stratified compute ntile(k)
    // from RangeRank positions via RangeRank.ntileFromRank (first n%k
    // buckets hold ceil(n/k) rows). Pin the SHARED helper against
    // Spark's ntile across sizes that exercise every branch: n < k,
    // n = k, n % k = 0, and ragged remainders.
    import org.apache.spark.sql.expressions.Window
    for (n <- Seq(1, 7, 10, 23, 100, 101, 109); k <- Seq(4, 5, 10)) {
      val df = spark.range(n.toLong).select(col("id"))
        .withColumn("rk", row_number().over(Window.orderBy("id")).cast("long"))
        .withColumn("n", lit(n.toLong))
        .withColumn("want", ntile(k).over(Window.orderBy("id")))
        .withColumn("got", graft.ops.RangeRank.ntileFromRank("rk", "n", k))
      val bad = df.filter(col("want") =!= col("got")).count()
      assert(bad == 0L, s"n=$n k=$k: closed-form ntile diverges on $bad rows")
    }
  }

  test("multi-column global prefixes == per-column global windows") {
    // RangeRank.withGlobalPrefixes backs the r13 KS rewrites (two ECDF
    // numerators over one range exchange): every prefix column must
    // match its own single-partition window bit-exactly, including
    // all-NULL ranges (the ADVICE r12 coalesce contract: NULLs are
    // skipped, an all-NULL prefix reads 0).
    import org.apache.spark.sql.expressions.Window
    val rows = (0 until 300).map { i =>
      (i.toLong, if (i % 7 == 0) None else Some((i % 13).toLong),
        (i % 5).toLong)
    }
    val df = rows.toDF("id", "a", "b")
    val got = graft.ops.RangeRank.withGlobalPrefixes(df,
      Seq(col("id")), Seq("a", "b"), "pos", Seq("ca", "cb"))
    val wo = Window.orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.select(col("id"),
      row_number().over(Window.orderBy("id")).cast("long").as("pos"),
      coalesce(sum(col("a")).over(wo), lit(0L)).as("ca"),
      coalesce(sum(col("b")).over(wo), lit(0L)).as("cb"))
    assert(got.select("id", "pos", "ca", "cb").except(want).count() == 0L,
      "multi-prefix diverges from the per-column global windows")
  }

  test("applyDelta rejects labels that violate the min-id invariant") {
    // ADVICE r11: the contraction algebra silently corrupts folds when
    // fed labels from any non-min-id scheme; the inline guard must make
    // that a loud failure instead.
    import graft.ops.Components
    val badLabels = Seq((1L, 5L), (5L, 5L)).toDF("v", "comp") // comp > v
    val delta = Seq((1L, 5L)).toDF("a", "b")
    val ex = intercept[Exception] {
      Components.applyDelta(badLabels, delta).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("min-id")),
      s"guard did not fire with the min-id message: $ex")
    // and valid min-id labels still pass through the guard untouched
    val ok = Components.applyDelta(
      Seq((1L, 1L), (5L, 1L)).toDF("v", "comp"), delta)
    assert(ok.count() == 2L)
  }
}
