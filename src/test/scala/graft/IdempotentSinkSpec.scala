package graft

import java.sql.Timestamp

import org.apache.spark.sql.types._

import graft.pipeline.IdempotentSink

class IdempotentSinkSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("v", DoubleType)))

  test("redelivered batch overwrites itself — contents identical, never doubled") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idem").toString
    val sink = IdempotentSink(s"$dir/out", schema)
    val batch = Seq((Timestamp.valueOf("2024-01-01 10:00:00"), 1.0),
      (Timestamp.valueOf("2024-01-01 10:01:00"), 2.0)).toDF("ts", "v")
    sink.writeBatch(batch, batchId = 7L)
    sink.writeBatch(batch, batchId = 7L) // at-least-once redelivery
    val out = sink.existing(spark)
    assert(out.count() == 2L)
    // a different batch id appends alongside, untouched by the redelivery
    sink.writeBatch(batch.limit(1), batchId = 8L)
    assert(sink.existing(spark).count() == 3L)
  }

  test("streaming attach lands each micro-batch in its own partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft-idem2").toString
    Seq((Timestamp.valueOf("2024-01-01 10:00:00"), 5.0))
      .toDF("ts", "v").write.parquet(s"$dir/in")
    val sink = IdempotentSink(s"$dir/out", schema)
    val q = sink.attach(spark.readStream
      .schema("ts TIMESTAMP, v DOUBLE").parquet(s"$dir/in"))
    q.awaitTermination(60000)
    val out = sink.existing(spark)
    assert(out.count() == 1L)
    assert(out.columns.contains("batch"))
  }
}
