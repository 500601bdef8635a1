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
}
