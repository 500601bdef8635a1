package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.ops.Multimodal.MediaFile

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    MediaFile(1L, "image", Multimodal.fakeHeader(1920, 1080, 3) ++ Array.fill(100)(7.toByte),
      Map("src" -> "a")),
    MediaFile(2L, "image", Multimodal.fakeHeader(640, 480, 1), Map.empty),
    MediaFile(3L, "image", Array[Byte](1, 2, 3), Map.empty), // corrupt
    MediaFile(4L, "video", Multimodal.fakeHeader(320, 200, 3),
      Map("n_frames" -> "10"))
  ).toDS()

  test("decode stub parses the fake header and flags corrupt rows") {
    val out = Multimodal.decodeStub(media).collect().map(m => m.media_id -> m).toMap
    assert(out(1L).width == 1920 && out(1L).height == 1080 && out(1L).channels == 3)
    assert(out(1L).n_bytes == 116 && out(1L).valid)
    assert(out(2L).width == 640 && out(2L).valid)
    assert(!out(3L).valid && out(3L).format == "unknown")
  }

  test("resize math: aspect-preserving fit, no upscale") {
    val resized = Multimodal.resizeMeta(Multimodal.decodeStub(media), maxSide = 960)
      .filter($"valid")
      .select($"media_id", $"out_width", $"out_height")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(resized(1L) == ((960, 540)))
    assert(resized(2L) == ((640, 480))) // already fits -> unchanged
  }

  test("frame sampling explodes every Nth frame from metadata") {
    val frames = Multimodal.frameSample(media.toDF().filter($"kind" === "video"), 3)
      .orderBy("frame_idx").select("frame_idx").as[Int].collect().toSeq
    assert(frames == Seq(0, 3, 6, 9))
  }

  test("size-aware repartition yields bounded partitions") {
    val sized = Multimodal.decodeStub(media).toDF()
    val out = Multimodal.repartitionBySize(sized, "n_bytes", targetBytes = 64L)
    assert(out.rdd.getNumPartitions >= 2)
    assert(out.count() == 4)
  }

  test("size-aware repartition packs skewed rows, not clusters them") {
    // 10 big rows (1000 B) interleaved with 90 small (10 B): range-
    // partitioning by the size VALUE would gang the big rows together;
    // offset packing must bound every partition near targetBytes.
    val df = (1L to 100L)
      .map(i => (i, if (i % 10 == 0) 1000L else 10L))
      .toDF("media_id", "n_bytes")
      .repartition(4)
    val out = Multimodal.repartitionBySize(df, "n_bytes", targetBytes = 1100L)
    assert(out.count() == 100)
    val perPart = out
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg(sum("n_bytes").as("bytes"))
      .collect().map(_.getLong(1))
    // a non-splitting packer can overshoot by at most one max-sized row
    assert(perPart.forall(_ <= 1100L + 1000L),
      s"oversized partition: ${perPart.mkString(",")}")
    assert(perPart.length >= 5, "bytes did not spread across partitions")
  }

  test("size-aware repartition is a no-op on an empty frame (no NPE)") {
    val empty = Seq.empty[(Long, Long)].toDF("media_id", "n_bytes")
    assert(Multimodal.repartitionBySize(empty, "n_bytes", 100L).count() == 0)
  }
}
