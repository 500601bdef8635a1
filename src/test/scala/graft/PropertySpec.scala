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
}
