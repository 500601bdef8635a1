package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, Dedup, IntervalJoin, QualityGates, Resample,
  Sessionize, Similarity, TextAnalysis, Watermark}
import graft.pipeline.Bucketing
import graft.time.{RolloverCalendar, SessionCalendar}

/** Multimodal family queries + DuckDB oracles (split from the
  * monolithic SparkEntry in round 12; entry bodies unchanged). */
private[graft] trait QueriesMultimodal extends QueryShared {

  protected def multimodalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Time-RANGE window frame (not rows): trailing 10-minute count and
    // exact-decimal sum per event type, frame keyed on epoch millis so
    // both engines share integer frame semantics.
    "window_range_frame" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // ts is TIMESTAMP_NTZ (nanos rebuild); under the UTC session the
      // LTZ cast is the identity instant, which unix_millis requires
      val w = Window.partitionBy(col("event_type"))
        .orderBy(unix_millis(col("ts").cast("timestamp_ltz")))
        .rangeBetween(-600000L, 0L)
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"),
          count(lit(1)).over(w).as("n_10m"),
          sum(col("value").cast("decimal(18,6)")).over(w)
            .cast("double").as("sum_10m"))
        .orderBy("event_id")
    },


    // Multimodal plumbing, driver-checkable: a deterministic 1000-row media
    // fixture (id-derived dimensions, every 13th row corrupt) flows through
    // the REAL binary-column pipeline — Dataset[MediaFile] → per-partition
    // decode (stubbed codec, real batching) → resize metadata math. The
    // oracle reproduces the arithmetic from range(1000) in DuckDB; only
    // integral outputs are kept (the float scale stays internal).
    "multimodal_decode_resize" -> { (s, d) =>
      import s.implicits._
      val media = (0L until 1000L).map { id =>
        val corrupt = id % 13 == 0
        val w = 16 + (id * 37 % 4096).toInt
        val h = 16 + (id * 53 % 2160).toInt
        val c = 1 + (id % 4).toInt
        val content =
          if (corrupt) Array[Byte](1, 2, 3)
          else graft.ops.Multimodal.fakeHeader(w, h, c) ++
            Array.fill((id % 97).toInt)(0x5A.toByte)
        graft.ops.Multimodal.MediaFile(id, "image", content, Map.empty)
      }.toDS().repartition(8)
      graft.ops.Multimodal.resizeMeta(
          graft.ops.Multimodal.decodeStub(media), maxSide = 512)
        .select(col("media_id"), col("format"), col("width"), col("height"),
          col("channels"), col("n_bytes"), col("valid"),
          col("out_width"), col("out_height"))
        .orderBy("media_id")
    },


    // Video frame sampling: metadata-driven explode, every 5th frame.
    "multimodal_frame_sample" -> { (s, d) =>
      import s.implicits._
      val videos = (0L until 500L).map { id =>
        graft.ops.Multimodal.MediaFile(id, "video", Array.emptyByteArray,
          Map("n_frames" -> ((id * 7) % 240).toString))
      }.toDS().repartition(8)
      graft.ops.Multimodal.frameSample(videos.toDF(), everyN = 5)
        .orderBy("media_id", "frame_idx")
    },


    // Audio segmentation: a deterministic 400-row audio fixture (id-derived
    // sample rate / duration, every 11th row corrupt) through the real
    // binary pipeline — fake-header parse per partition, then fixed
    // 10-second segment explode in exact sample arithmetic.
    "multimodal_audio_segments" -> { (s, d) =>
      import s.implicits._
      val media = (0L until 400L).map { id =>
        val corrupt = id % 11 == 0
        val rate = Seq(8000, 16000, 44100, 48000)((id % 4).toInt)
        val nSamples = id * 31 % 700000
        val content =
          if (corrupt) Array[Byte](9, 9)
          else graft.ops.Multimodal.fakeAudioHeader(rate, nSamples, 2)
        graft.ops.Multimodal.MediaFile(id, "audio", content, Map.empty)
      }.toDS().repartition(8)
      graft.ops.Multimodal.audioSegments(
          graft.ops.Multimodal.audioMetaStub(media).toDF(), segmentSeconds = 10)
        .orderBy("media_id", "seg_idx")
    },


    // Shot-boundary detection over synthetic video luminance tracks (300
    // videos × 40 frames; per-shot base level + bounded jitter, the same
    // deterministic-fake convention as the other multimodal stubs): a
    // boundary is |Δlum| > 32 between consecutive frames, segments
    // materialize as cut-flag prefix sums — the lag + running-sum
    // temporal-segmentation shape (sessionize's cousin) on frame
    // sequences. All-integer pixels (hash low bytes), so detection is
    // engine-exact; the lag/sum windows partition per video and a video's
    // frames are the natural per-key unit at 100 TB (no global sort).
    "video_shot_boundaries" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val md5h: Column => Column = graft.ops.Dedup.md5Hash64
      val w = Window.partitionBy("vid").orderBy("f")
      val fr = s.range(300).select(col("id").as("vid"))
        .withColumn("f", explode(expr("sequence(0, 39)")))
      val lum = fr
        .withColumn("cut_true", when(col("f") > 0 &&
          md5h(concat(lit("cut|"), col("vid"), lit("|"), col("f")))
            .bitwiseAND(lit(7L)) === 0, 1L).otherwise(0L))
        .withColumn("shot_true", sum("cut_true").over(w))
        .withColumn("lum",
          md5h(concat(lit("b|"), col("vid"), lit("|"), col("shot_true")))
            .bitwiseAND(lit(255L)) +
          md5h(concat(lit("j|"), col("vid"), lit("|"), col("f")))
            .bitwiseAND(lit(15L)))
      lum
        .withColumn("is_cut", when(col("f") > 0 &&
          abs(col("lum") - lag(col("lum"), 1).over(w)) > 32, 1L)
          .otherwise(0L))
        .withColumn("shot", sum("is_cut").over(w))
        .groupBy("vid", "shot")
        .agg(min("f").as("start_frame"), max("f").as("end_frame"),
          count(lit(1)).as("n_frames"))
        .orderBy("vid", "shot")
    }
  )

  protected def multimodalOracles: Map[String, String] = Map(

    // epoch_ms truncation matches Spark's unix_millis; the decimal window
    // sum is order-independent, cast to double only at the end.
    "window_range_frame" ->
      """SELECT event_id, event_type,
        |  count(*) OVER w AS n_10m,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_10m
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY epoch_ms(ts)
        |             RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,


    // Mirrors the deterministic fixture arithmetic in the query: dimensions
    // are id-derived, every 13th row corrupt, resize scale = 512/max(w,h)
    // with no upscale; floor(double) is IEEE-identical across engines.
    "multimodal_decode_resize" ->
      """WITH m AS (
        |  SELECT range AS media_id,
        |    range % 13 = 0 AS corrupt,
        |    CAST(16 + (range * 37 % 4096) AS INT) AS w,
        |    CAST(16 + (range * 53 % 2160) AS INT) AS h,
        |    CAST(1 + range % 4 AS INT) AS c
        |  FROM range(1000)),
        |d AS (
        |  SELECT media_id,
        |    CASE WHEN corrupt THEN 'unknown' ELSE 'grft' END AS format,
        |    CASE WHEN corrupt THEN 0 ELSE w END AS width,
        |    CASE WHEN corrupt THEN 0 ELSE h END AS height,
        |    CASE WHEN corrupt THEN 0 ELSE c END AS channels,
        |    CASE WHEN corrupt THEN 3 ELSE 16 + media_id % 97 END AS n_bytes,
        |    NOT corrupt AS valid
        |  FROM m),
        |r AS (
        |  SELECT *,
        |    CASE WHEN greatest(width, height) <= 512 THEN 1.0
        |         ELSE 512 / CAST(greatest(width, height) AS DOUBLE) END AS scale
        |  FROM d)
        |SELECT media_id, format, width, height, channels, n_bytes, valid,
        |  CAST(floor(width * scale) AS INT) AS out_width,
        |  CAST(floor(height * scale) AS INT) AS out_height
        |FROM r ORDER BY media_id""".stripMargin,


    "multimodal_frame_sample" ->
      """SELECT range AS media_id,
        |  CAST(unnest(range(0, CAST(range * 7 % 240 AS INT), 5)) AS INT) AS frame_idx
        |FROM range(500)
        |WHERE range * 7 % 240 > 0
        |ORDER BY media_id, frame_idx""".stripMargin,


    // Mirrors the fixture arithmetic in the query; bounds are integer
    // sample counts, so the compare is exact. `//` is DuckDB int division.
    "multimodal_audio_segments" ->
      """WITH m AS (
        |  SELECT range AS media_id,
        |    range % 11 = 0 AS corrupt,
        |    CAST(CASE range % 4 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |         WHEN 2 THEN 44100 ELSE 48000 END AS BIGINT) AS sample_rate,
        |    CAST(range * 31 % 700000 AS BIGINT) AS n_samples
        |  FROM range(400)),
        |s AS (
        |  SELECT media_id, n_samples, sample_rate * 10 AS sps
        |  FROM m WHERE NOT corrupt AND n_samples > 0),
        |g AS (
        |  SELECT media_id, n_samples, sps,
        |    CAST(unnest(range(0, ((n_samples - 1) // sps) + 1)) AS INT) AS seg_idx
        |  FROM s)
        |SELECT media_id, seg_idx,
        |  seg_idx * sps AS start_sample,
        |  least((seg_idx + 1) * sps, n_samples) AS end_sample
        |FROM g ORDER BY media_id, seg_idx""".stripMargin,


    // Identical integer luminance synthesis and |Δlum| > 32 rule.
    "video_shot_boundaries" ->
      """WITH vids AS (SELECT unnest(range(300)) AS vid),
        |fr AS (SELECT vid, f.f AS f FROM vids, range(40) f(f)),
        |cuts AS (SELECT vid, f,
        |  CAST(sum(CASE WHEN f > 0 AND
        |      (md5_number_upper('cut|' || vid || '|' || f) & 7) = 0
        |      THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY vid ORDER BY f) AS BIGINT) AS shot_true
        |  FROM fr),
        |lum AS (SELECT vid, f,
        |  CAST((md5_number_upper('b|' || vid || '|' || shot_true) & 255) +
        |       (md5_number_upper('j|' || vid || '|' || f) & 15) AS BIGINT)
        |    AS lum
        |  FROM cuts),
        |det AS (SELECT vid, f, lum,
        |  CASE WHEN f > 0 AND abs(lum - lag(lum)
        |      OVER (PARTITION BY vid ORDER BY f)) > 32
        |       THEN 1 ELSE 0 END AS is_cut FROM lum),
        |seg AS (SELECT vid, f,
        |  CAST(sum(is_cut) OVER (PARTITION BY vid ORDER BY f) AS BIGINT)
        |    AS shot FROM det)
        |SELECT vid, shot, CAST(min(f) AS BIGINT) AS start_frame,
        |  CAST(max(f) AS BIGINT) AS end_frame, count(*) AS n_frames
        |FROM seg GROUP BY 1, 2 ORDER BY vid, shot""".stripMargin
  )
}
