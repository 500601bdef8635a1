package graft

import org.apache.spark.sql.functions._
import graft.ops.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  test("two iterations match hand-computed integer ranks; dangling node keeps teleport mass") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = PageRank.iterate(nodes, edges, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // iter1: in = {1:1000000, 2:500000, 3:1500000}
    //   r1 = {1:1000000, 2:575000, 3:1425000, 4:150000}
    // iter2: in = {1:1425000, 2:500000, 3:1075000}
    assert(got == Map(1L -> 1361250L, 2L -> 575000L, 3L -> 1063750L,
      4L -> 150000L))
  }

  test("determinism: identical ranks across repartitioned re-runs") {
    val nodes = spark.range(200).toDF("id")
    val edges = spark.range(600).select(
      (col("id") % 200).as("src"), ((col("id") * 7 + 3) % 200).as("dst"))
      .filter(col("src") =!= col("dst"))
    val a = PageRank.iterate(nodes, edges, 3)
      .agg(sum(col("rank") * col("id"))).head.getLong(0)
    val b = PageRank.iterate(nodes.repartition(13), edges.repartition(7), 3)
      .agg(sum(col("rank") * col("id"))).head.getLong(0)
    assert(a == b)
  }
}
