package graft

import org.apache.spark.sql.functions._

/** ops/QuantileSketch: the bottom-k hash sample's algebra — exact
  * mergeability over ANY sharding (the property the
  * quantile_sketch_mergeable oracle proves on the 2-shard split is
  * checked here for 3 shards), and the small-group edge where the sketch
  * IS the group. */
class QuantileSketchSpec extends SparkSpec {
  import graft.ops.QuantileSketch.bottomK

  private def base = spark.range(3000)
    .select(col("id"),
      (col("id") % 3).as("grp"),
      graft.ops.Dedup.md5Hash64(concat(lit("t|"), col("id")))
        .bitwiseAND(lit(Long.MaxValue)).as("hk"))

  test("bottomK(union) == bottomK over 3-way shard sketches, exactly") {
    val df = base.withColumn("shard", col("id") % 7)
    val direct = bottomK(df, Seq(col("grp")), col("hk"), col("id"), 64)
      .select("grp", "id")
    val shards = bottomK(df, Seq(col("grp"), col("shard")),
      col("hk"), col("id"), 64)
    val merged = bottomK(shards, Seq(col("grp")), col("hk"), col("id"), 64)
      .select("grp", "id")
    assert(merged.count() == direct.count())
    assert(merged.except(direct).count() == 0L &&
      direct.except(merged).count() == 0L,
      "merged shard sketches diverge from the direct sketch")
  }

  test("a group smaller than k yields the whole group") {
    val tiny = base.filter(col("id") < 40) // grp sizes ~13-14
    val sk = bottomK(tiny, Seq(col("grp")), col("hk"), col("id"), 64)
    assert(sk.count() == 40L)
  }

  /** The source_overlap_kmv pair estimators on engineered sets: the
    * exhaustive branch (union < k) is EXACT; the sampling branch's
    * union and Jaccard estimates land within their rank bounds
    * (sd ≈ 1/√(k−2) relative for the union, binomial √(J(1−J)/k) for
    * the Jaccard fraction — bounds below are ~4σ, and the md5 hash is
    * deterministic so this is a fixed-value check, not a flake). */
  test("KMV pair estimators: exhaustive branch exact, sampling in bounds") {
    val k = 64
    def hashed(tag: String, n0: Long, n1: Long) = spark.range(n0, n1)
      .select(lit(tag).as("src"),
        graft.ops.Dedup.md5Hash64(concat(lit("kmv|"), col("id")))
          .bitwiseAND(lit(Long.MaxValue)).as("h"))
    def sketchSets(df: org.apache.spark.sql.DataFrame) = {
      val rows = bottomK(df, Seq(col("src")), col("h"), col("h"), k)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      (rows.filter(_._1 == "a").map(_._2).toSet,
        rows.filter(_._1 == "b").map(_._2).toSet)
    }
    // sampling branch: |A|=12000, |B|=12000, shared ids 8000..11999 →
    // union 20000, Jaccard 0.2
    val (sa, sb) = sketchSets(
      hashed("a", 0, 12000).unionByName(hashed("b", 8000, 20000)))
    val mergedK = (sa ++ sb).toSeq.sorted.take(k)
    val est = (BigInt(k - 1) * BigInt(Long.MaxValue) /
      BigInt(mergedK.max)).toLong
    assert(math.abs(est - 20000L) <= 10000L,
      s"union estimate $est too far from 20000")
    val nBoth = mergedK.count(h => sa(h) && sb(h))
    assert(math.abs(nBoth / 64.0 - 0.2) <= 0.2,
      s"jaccard estimate ${nBoth / 64.0} too far from 0.2")
    // exhaustive branch: 30+30 ids sharing 20..29 → union 50 < k, so
    // the sketches carry the whole sets and every readout is exact
    val (ua, ub) = sketchSets(
      hashed("a", 0, 30).unionByName(hashed("b", 20, 50)))
    assert((ua ++ ub).size == 50 && ua.intersect(ub).size == 10,
      "exhaustive sketches must reproduce the sets exactly")
  }
}
