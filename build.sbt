ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "txfcontinuousdatapipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Codegen-cache sizing (optimization r17): the default
  // spark.sql.codegen.cache.maxEntries=100 thrashes under this repo's
  // 426-query driver surface (~21 codegen units per query ⇒ ~9 000
  // distinct sources per suite pass; LRU over a sequential scan evicts
  // everything before reuse). Measured: 120 queries produced 2 541
  // Janino compilations at ~20 ms mean ≈ 50 s of serial driver compile
  // in 150 s of wall, with sourceGenCalls == compilations (a 0% hit
  // rate). A cache that holds the whole surface turns every re-run
  // (bench pass 2, convergence retries, repeated production queries)
  // into a compile-free — and JIT-warm, same Class instance — run.
  // Driver-side only; identical plans and results at any scale. Env
  // override for memory-constrained drivers (entries are compiled-class
  // references; the classes live on the heap either way while in use).
  s"-Dspark.sql.codegen.cache.maxEntries=${
    sys.env.getOrElse("SPARK_CODEGEN_CACHE_ENTRIES", "20000")}",
)
