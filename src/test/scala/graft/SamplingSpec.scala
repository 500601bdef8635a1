package graft

import org.apache.spark.sql.functions._

import graft.ops.{Packing, Sampling}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("deterministic sample: stable across runs, fraction within tolerance") {
    val df = spark.range(100000).toDF("id")
    val a = Sampling.sample(df, "id", 0.15).as[Long].collect().toSet
    val b = Sampling.sample(df, "id", 0.15).as[Long].collect().toSet
    assert(a == b) // no RNG state anywhere
    // multiplicative hashing is uniform enough for a 2% absolute band
    assert(math.abs(a.size / 100000.0 - 0.15) < 0.02, s"got ${a.size}")
  }

  test("stratified sample respects per-stratum rates") {
    val df = spark.range(60000)
      .select(col("id"), (col("id") % 3).cast("string").as("s"))
    val kept = Sampling.stratifiedSample(df, "id", "s",
        Map("0" -> 0.5, "1" -> 0.1), defaultFraction = 0.0)
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(math.abs(kept("0") / 20000.0 - 0.5) < 0.05)
    assert(math.abs(kept("1") / 20000.0 - 0.1) < 0.05)
    assert(!kept.contains("2")) // default 0 drops the unlisted stratum
  }

  test("weightedSample: zero weight never keeps, saturating weight always keeps, rate tracks weight") {
    val df = spark.range(50000).toDF("id")
      .withColumn("w", col("id") % 4) // weights 0..3
    // perMillionPerUnit 500000: w=0 -> never, w>=2 -> always, w=1 -> ~50%
    val kept = Sampling.weightedSample(df, "id", col("w"), 500000L)
      .groupBy("w").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!kept.contains(0L))
    assert(kept(2L) == 12500L && kept(3L) == 12500L)
    assert(math.abs(kept(1L) / 12500.0 - 0.5) < 0.05, kept)
    // deterministic: identical kept set across runs
    val a = Sampling.weightedSample(df, "id", col("w"), 500000L)
      .agg(sum("id")).head.getLong(0)
    val b = Sampling.weightedSample(df, "id", col("w"), 500000L)
      .agg(sum("id")).head.getLong(0)
    assert(a == b)
  }

  test("exactKPerGroup: exactly k per group, deterministic, uniform-ish") {
    val df = spark.range(10000).toDF("id")
      .withColumn("g", (col("id") % 7).cast("string"))
    val out = Sampling.exactKPerGroup(df, "id", "g", k = 5).cache()
    val sizes = out.groupBy("g").count().collect()
    assert(sizes.length == 7 && sizes.forall(_.getLong(1) == 5L))
    val a = out.agg(sum("id")).head.getLong(0)
    out.unpersist()
    val b = Sampling.exactKPerGroup(df.repartition(13), "id", "g", 5)
      .agg(sum("id")).head.getLong(0)
    assert(a == b) // partitioning-independent membership
  }

  test("splitByHash: disjoint, exhaustive, weight-proportional") {
    val df = spark.range(50000).toDF("id")
    val out = Sampling.splitByHash(df, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 50000) // every row assigned exactly once
    assert(counts.keySet == Set("train", "val", "test"))
    assert(math.abs(counts("train") / 50000.0 - 0.8) < 0.02)
    // same hash, same key -> membership is consistent with sample()
    val trainIds = out.filter($"split" === "train").select("id").as[Long].collect().toSet
    val sampled = Sampling.sample(df, "id", 0.8).as[Long].collect().toSet
    assert(trainIds == sampled)
  }

  test("int8 quantization: known lanes, zero-vector safe, bounded dequant error") {
    import graft.ops.Quantize
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = df.select($"vec_id", Quantize.int8Lanes($"embedding").as("q"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(out(1L) == Seq(127, -64, 32)) // round(-63.5) away from zero
    assert(out(2L) == Seq(0, 0, 0))
    // dequantization error bound: |x - q*s/127| <= s/254 on real data
    val emb = Tables.embeddings(spark, sf0001)
    val err = emb.select(
      Quantize.maxAbs($"embedding").as("s"),
      zip_with($"embedding", Quantize.int8Lanes($"embedding"),
        (x, q) => abs(x.cast("double") - q * Quantize.maxAbs($"embedding") / 127d))
        .as("errs"))
      .select(max(array_max($"errs") / ($"s" / 254d + 1e-12))).as[Double].head()
    assert(err <= 1.0 + 1e-6, s"dequant error beyond half-step bound: $err")
  }

  test("packSequences matches a driver-side running-sum reference; bounded overflow") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 2000L).map(i => (i, 1 + rnd.nextInt(600)))
    val df = rows.toDF("doc_id", "n_tokens").repartition(7)
    val got = Packing.packSequences(df, "n_tokens", "doc_id", maxTokens = 2048L)
      .select("doc_id", "pack_id").as[(Long, Int)].collect().toMap
    var off = 0L
    rows.foreach { case (id, n) =>
      assert(got(id) == (off / 2048L).toInt, s"doc $id")
      off += n
    }
    // per-pack budget: target + at most one straddling document
    val perPack = rows.groupBy { case (id, _) => got(id) }
      .map { case (_, rs) => rs.map(_._2.toLong).sum }
    assert(perPack.forall(_ <= 2048L + 600L))
  }

  test("temperatureMix: α=0.5 flattens the head, smallest group keeps all") {
    // groups 900/400/100 -> weights 30/20/10, shares 1/2,1/3,1/6,
    // Tmax = 600 -> keep-rates 1/3, 1/2, 1
    val df = ((1L to 900L).map((_, "a")) ++ (1001L to 1400L).map((_, "b")) ++
        (2001L to 2100L).map((_, "c")))
      .toDF("doc_id", "grp")
    val out = Sampling.temperatureMix(df, "doc_id", "grp", alpha = 0.5)
      .select("grp", "doc_id").as[(String, Long)].collect()
    val byGrp = out.groupBy(_._1).view.mapValues(_.length).toMap
    // the feasibility-binding group is untouched — exact, not approximate
    assert(byGrp("c") == 100, byGrp)
    // hashed membership approximates the target rates (±20%)
    assert(byGrp("a") > 240 && byGrp("a") < 360, byGrp)
    assert(byGrp("b") > 160 && byGrp("b") < 240, byGrp)
    // keyed hash -> re-running selects the identical rows
    val again = Sampling.temperatureMix(df, "doc_id", "grp", alpha = 0.5)
      .select("grp", "doc_id").as[(String, Long)].collect()
    assert(out.toSet == again.toSet)
  }

  test("temperatureMix: α=1 is the identity (proportional mixing = input)") {
    val df = ((1L to 50L).map((_, "a")) ++ (101L to 110L).map((_, "b")))
      .toDF("doc_id", "grp")
    assert(Sampling.temperatureMix(df, "doc_id", "grp", alpha = 1.0)
      .count() == 60L)
  }
}
