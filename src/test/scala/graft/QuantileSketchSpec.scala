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
}
