package graft
import org.apache.spark.sql.SparkSession

/** Driver-facing benchmark: times every `SparkEntry.queries` entry at the
  * scale factor in `SPARK_GRAFT_SF_DIR` and prints ONE JSON line.
  *
  * Stability design (round-3): queries run in FIXED (sorted) order, and the
  * whole suite runs twice — the first pass absorbs the one-time costs that
  * made sub-2 s entries flap between rounds (JIT warm-up, whole-stage
  * codegen compilation, parquet footer caches, shuffle-service spin-up);
  * the reported figure is the per-query minimum across passes. The cache
  * manager is cleared before every run, so a pass never reads a previous
  * pass's cached frames — Spark's CacheManager matches by logical plan and
  * would otherwise silently serve query N's `.cache()`d intermediates back
  * to its second run, timing a lookup instead of the computation.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val passes = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "2").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (scheduler, codegen compiler, parquet footer reads)
    // so the first measured query isn't charged ~3s of one-time JVM setup.
    spark.range(1000).selectExpr("sum(id)").collect()
    // Optional comma-separated subset for local iteration (e.g. diagnosing
    // a single query's regression without paying the full-suite wall time).
    // The driver never sets this, so driver runs always time the full map.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // a failed run records -1, and the min below only folds SUCCESSFUL
    // times — a query that succeeds slowly in one pass and fails fast in
    // another must report the real measurement, not the time-to-failure;
    // -1 survives only if every pass failed (visible in the JSON).
    def onePass(): Map[String, Double] = names.map { name =>
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }.toMap
    val best = (1 to passes).map(_ => onePass())
      .reduce((a, b) => a.map { case (k, v) =>
        k -> ((v, b(k)) match {
          case (x, y) if x < 0 => y
          case (x, y) if y < 0 => x
          case (x, y) => math.min(x, y)
        })
      })
    // Locale-independent formatting: f"" interpolators use the JVM default
    // locale, which under a comma-decimal locale would print "1,234" and
    // corrupt the JSON.
    def sec(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = names.map(k => s"\"" + k + "\":" + sec(best(k)))
      .mkString("{", ",", "}")
    val total = best.values.filter(_ >= 0).sum
    // Failures must be visible in BOTH lines: a query with best < 0 failed
    // every pass — it is excluded from `total` and would otherwise vanish
    // from the compact top-10, making a broken run read as a faster one.
    val failed = names.filter(best(_) < 0)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Full per-query line first (for humans and full-capture harnesses)…
    println(s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir","passes":$passes}""")
    // …then a compact summary LAST. The driver keeps only a bounded tail of
    // stdout; the full line above outgrows it as the query count rises, so
    // the final line must be a self-contained JSON record that always fits:
    // headline metric plus the slowest queries (the ones a grader compares).
    // "truncated":true marks it as the partial-queries record so a consumer
    // matching on "metric":"total" can't mistake the top-10 map for the
    // full set or double-count the two lines.
    val slowest = names.filter(best(_) >= 0).sortBy(n => -best(n)).take(10)
      .map(k => s"\"" + k + "\":" + sec(best(k))).mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${sec(total)},"unit":"sec","queries":$slowest,"truncated":true,"nqueries":${names.size},"failed":$failedJson,"sf":"$sfDir","passes":$passes}""")
    spark.stop()
  }
}
