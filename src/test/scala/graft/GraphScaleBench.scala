package graft

import org.apache.spark.sql.SparkSession

/** kNN/IVF layout build-cost curve (VERDICT r11 #2): times the ONE-TIME
  * staging of the persisted kNN-graph layout (cold `knnEdges` = build +
  * first scan) against the steady-state pruned scan (warm `knnEdges`)
  * at each fixture decade, so the build cost — which the per-query bench
  * amortizes away after pass 1 — gets its own measured growth curve.
  *
  * With the cells-∝-n policy (QueryShared.knnEdges: ~2000-vector cells)
  * the within-cell candidate work is Σ|cell|² ≈ n·2000 — linear per
  * decade; the previous FIXED 8 cells made it quadratic (16→50 s for
  * 10× in r11, and a projected ~10000× at 100×).
  *
  * Also times the IVF index staging twin (train + assign + partitioned
  * write — linear by construction, no pair join) via the
  * ann_persisted_ivf_index query's cold/warm delta.
  *
  * Usage: Test/runMain graft.GraphScaleBench <dir1> <dir2> ...
  * Prints one JSON line per dir:
  *   {"dir":…,"vecs":N,"knn_cold_sec":…,"knn_warm_sec":…,
  *    "knn_build_sec":…,"n_cells":…,"edges":N}
  */
object GraphScaleBench extends QueryShared {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq else Seq("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    dirs.foreach { d =>
      // fresh session per dir: staging maps key on (session, dir), so a
      // new session guarantees the first knnEdges call really builds
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      spark.range(1000).selectExpr("sum(id)").collect()
      val nVecs = Tables.embeddings(spark, d).count()
      def time(body: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = body
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (cold, edges) = time(knnEdges(spark, d, 5).count())
      val (warm, _) = time(knnEdges(spark, d, 5).count())
      val nCells = math.max(8L, (nVecs + 1999L) / 2000L)
      def s3(v: Double) =
        String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
      println(s"""{"dir":"$d","vecs":$nVecs,"n_cells":$nCells,""" +
        s""""knn_cold_sec":${s3(cold)},"knn_warm_sec":${s3(warm)},""" +
        s""""knn_build_sec":${s3(cold - warm)},"edges":$edges}""")
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
