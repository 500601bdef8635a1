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

  test("audio metadata stub + fixed segments with clamped tail") {
    val audio = Seq(
      MediaFile(1L, "audio", Multimodal.fakeAudioHeader(8000, 200000L, 2), Map.empty),
      MediaFile(2L, "audio", Array[Byte](1), Map.empty), // corrupt
      MediaFile(3L, "audio", Multimodal.fakeAudioHeader(16000, 160000L, 1), Map.empty)
    ).toDS()
    val meta = Multimodal.audioMetaStub(audio).collect().map(m => m.media_id -> m).toMap
    assert(meta(1L).sample_rate == 8000 && meta(1L).n_samples == 200000L && meta(1L).valid)
    assert(meta(1L).channels == 2 && meta(1L).format == "grfa")
    assert(!meta(2L).valid && meta(2L).format == "unknown")
    val segs = Multimodal.audioSegments(Multimodal.audioMetaStub(audio).toDF(), 10)
      .orderBy("media_id", "seg_idx")
      .as[(Long, Int, Long, Long)].collect().toSeq
    // 25 s @ 8 kHz -> three 10 s segments, last clamped; exactly 10 s -> one
    assert(segs == Seq((1L, 0, 0L, 80000L), (1L, 1, 80000L, 160000L),
      (1L, 2, 160000L, 200000L), (3L, 0, 0L, 160000L)))
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

  test("two-level packer: no single-partition exchange; id runs stay contiguous") {
    val df = (1L to 500L)
      .map(i => (i, if (i % 17 == 0) 900L else 12L))
      .toDF("media_id", "n_bytes")
      .repartition(8)
    // the old implementation's global-order window planned an
    // `Exchange SinglePartition` — the serial pass the two-level form
    // removes; assert on the PRE-checkpoint plan (the public sizeBuckets
    // materializes, which would hide the shape behind an RDD scan)
    val (bucketPlan, cached, parts) =
      Multimodal.sizeBucketsPlan(df, "n_bytes", 1000L, "media_id")
    val plan = bucketPlan.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"serial exchange in plan:\n$plan")
    cached.foreach(_.unpersist())
    assert(parts == 32) // ceil((29*900 + 471*12) / 1000) = ceil(31.752)
    val out = Multimodal.repartitionBySize(df, "n_bytes", targetBytes = 1000L)
    assert(out.rdd.getNumPartitions == parts) // one bucket per partition, exactly
    // equal-byte packing in id order => partitions hold non-interleaved id runs
    val ranges = out.withColumn("p", spark_partition_id())
      .groupBy("p").agg(min("media_id").as("lo"), max("media_id").as("hi"),
        sum("n_bytes").as("bytes"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) => assert(hi1 < lo2,
        s"interleaved id runs: ${ranges.mkString(",")}")
      case _ =>
    }
    assert(ranges.forall(_._3 <= 1000L + 900L),
      s"oversized partition: ${ranges.mkString(",")}")
  }

  test("size-aware repartition is a no-op on an empty frame (no NPE)") {
    val empty = Seq.empty[(Long, Long)].toDF("media_id", "n_bytes")
    assert(Multimodal.repartitionBySize(empty, "n_bytes", 100L).count() == 0)
  }
}
