package graft

import org.apache.spark.sql.SparkSession

/** One-off sizing probe (optimization r17): how many undirected edges do
  * the kNN-graph consumers feed Components at the driver SFs? Decides
  * whether the small-graph fast path's edge bound covers them.
  */
object EdgeCountProbe extends QueryShared {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (d <- args) {
      val emb = Tables.embeddings(spark, d)
      println(s"[edgecount] $d embeddings=${emb.count()}")
      val und = graft.ops.Graph.undirected(knnEdges(spark, d, 3))
      println(s"[edgecount] $d undirected_knn_edges=${und.count()}")
    }
    spark.stop()
  }
}
