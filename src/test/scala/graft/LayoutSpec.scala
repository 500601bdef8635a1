package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.Layout

class LayoutSpec extends SparkSpec {

  test("sized write: one directory per partition value, files capped by record count") {
    val dir = Files.createTempDirectory("layout").toString + "/out"
    // 3 partition values, skewed: value 0 holds 800 of 1000 rows
    val df = spark.range(1000).select(
      when(col("id") < 800, 0).otherwise(col("id") % 2 + 1).as("day"),
      col("id").as("v"))
    // avgRowBytes × target chosen so a file holds at most 100 records
    Layout.writeSized(df, dir, Seq("day"), avgRowBytes = 100,
      targetFileBytes = 100 * 100)
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("day=")).sortBy(_.getName)
    assert(dirs.map(_.getName).toSeq == Seq("day=0", "day=1", "day=2"))
    // the hot partition must split into ceil(800/100) files, not one giant
    val hotFiles = new java.io.File(dir + "/day=0").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(hotFiles == 8, s"hot partition files: $hotFiles")
    // and the readback must round-trip
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.groupBy("day").count().filter(col("day") === 0)
      .head().getLong(1) == 800)
  }

  test("sized write with maxPartitionRows hint: hot partition written by parallel tasks") {
    val dir = Files.createTempDirectory("layout").toString + "/out"
    val df = spark.range(1000).select(
      when(col("id") < 800, 0).otherwise(col("id") % 2 + 1).as("day"),
      col("id").as("v"))
    // rowsPerFile = 100, hint 800 -> 8 chunk salts: the hot day is
    // written by multiple tasks IN PARALLEL (the unsalted path funnels
    // all 800 rows through one task — the 100 TB straggler).
    Layout.writeSized(df, dir, Seq("day"), avgRowBytes = 100,
      targetFileBytes = 100 * 100, maxPartitionRows = 800)
    val hot = new java.io.File(dir + "/day=0").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    // Writer-task identity is encoded in the file name (part-NNNNN-<jobUUID>):
    // distinct NNNNN prefixes == distinct tasks that wrote this directory.
    val tasks = hot.map(_.getName.split("-")(1)).distinct.length
    assert(tasks > 1, s"hot partition still written by one task (files: ${hot.map(_.getName).toSeq})")
    // file count stays bounded: ~one file per chunk (hash salt imbalance
    // can split a chunk across two tasks, so allow a small factor, never
    // the thousands-of-slivers failure mode)
    assert(hot.length >= 2 && hot.length <= 16,
      s"hot partition file count unbounded: ${hot.length}")
    // every file respects the record cap
    val counts = hot.map(f => spark.read.parquet(f.getPath).count())
    assert(counts.forall(_ <= 100), s"file over record cap: ${counts.toSeq}")
    // and the readback round-trips exactly
    val back = spark.read.parquet(dir)
    assert(back.count() == 1000)
    assert(back.select(sum(col("v"))).head().getLong(0) == (0L until 1000L).sum)
  }

  test("hotFilter restricts the chunk salt: cold partitions stay one file each") {
    val dir = Files.createTempDirectory("layout").toString + "/out"
    val df = spark.range(1000).select(
      when(col("id") < 800, 0).otherwise(col("id") % 20 + 1).as("day"),
      col("id").as("v"))
    // 20 cold days of 10 rows each: an unconditional salt would scatter
    // every one of them across up to 8 chunk tasks (the ADVICE r7
    // small-files fan-out); the hot predicate keeps them at salt 0.
    Layout.writeSized(df, dir, Seq("day"), avgRowBytes = 100,
      targetFileBytes = 100 * 100, maxPartitionRows = 800,
      hotFilter = Some(col("day") === 0))
    val hot = new java.io.File(dir + "/day=0").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(hot >= 2, s"hot partition not chunked: $hot files")
    for (d <- 1 to 20) {
      val cold = new java.io.File(dir + s"/day=$d").listFiles()
        .count(_.getName.endsWith(".parquet"))
      assert(cold == 1, s"cold day=$d fanned out into $cold files")
    }
    assert(spark.read.parquet(dir).count() == 1000)
  }

  test("salted write survives map-typed columns (excluded from the salt hash)") {
    val dir = Files.createTempDirectory("layout").toString + "/out"
    val df = spark.range(400).select(
      (col("id") % 2).as("day"), col("id").as("v"),
      map(lit("k"), col("id")).as("props"))
    // xxhash64 over a MapType column throws AnalysisException; the salt
    // must skip it and still chunk the write.
    Layout.writeSized(df, dir, Seq("day"), avgRowBytes = 100,
      targetFileBytes = 100 * 100, maxPartitionRows = 200)
    val back = spark.read.parquet(dir)
    assert(back.count() == 400)
    assert(back.select(sum(col("v"))).head().getLong(0) == (0L until 400L).sum)
  }
}
