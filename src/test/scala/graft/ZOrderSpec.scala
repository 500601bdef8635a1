package graft

import org.apache.spark.sql.functions._

import graft.ops.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton interleave: known bit patterns") {
    val df = Seq((1L, 2L)).toDF("x", "y")
    // x=0b01 contributes bit0->pos0; y=0b10 contributes bit1->pos3 => 0b1001
    val z = df.select(ZOrder.zValue(Seq($"x", $"y"), 2)).as[Long].head()
    assert(z == 9L)
    // single dimension degenerates to the identity
    val id = df.select(ZOrder.zValue(Seq($"x"), 8)).as[Long].head()
    assert(id == 1L)
  }

  test("z-order clustering tightens per-partition bounds on BOTH dimensions") {
    // spread both dims across the full 8-bit range (sf0.001's raw user_id
    // span is ~15, which no layout could tighten further)
    val ev = Tables.events(spark, sf0001)
      .select(col("event_id"),
        ZOrder.normalizeMod(col("user_id") * 37, 8).as("u"),
        ZOrder.normalizeMod(floor(col("value") * 100).cast("long"), 8).as("v"))
    def spans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val rows = df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("u") - min("u")).as("su"), (max("v") - min("v")).as("sv"))
        .collect()
      (rows.map(_.getLong(1)).sum.toDouble / rows.length,
        rows.map(_.getLong(2)).sum.toDouble / rows.length)
    }
    val (zu, zv) = spans(ZOrder.zorderBy(ev, Seq(col("u"), col("v")), 8, 16))
    // natural layout (sorted by an unrelated key) leaves both dims wide
    val (nu, nv) = spans(ev.repartitionByRange(16, col("event_id")))
    // z-order must tighten BOTH dimensions markedly vs the natural layout
    assert(zu < nu / 2, s"u span $zu vs natural $nu")
    assert(zv < nv / 2, s"v span $zv vs natural $nv")
  }
}
