package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for a training-data pipeline:
  * media as opaque `binary` columns + typed metadata, with
  * decode/feature-extract/resize/frame-sample stages.
  *
  * The Spark-side plumbing — schemas, partition sizing, per-partition batch
  * iteration, output shapes — is real and tested. The actual codec work is
  * STUBBED (this container has no image/audio libraries): `decodeStub`
  * parses a deterministic fake header instead of calling a codec. A
  * production deployment replaces ONLY the marked stub with a real decoder
  * (JNI/javacv on the JVM, or a vectorized Python UDF when running
  * PySpark); every schema and operator signature stays the same.
  *
  * Scale notes: media rows are large and skewed — [[repartitionBySize]]
  * packs rows into roughly equal-byte partitions (not equal-row), which is
  * what keeps executor memory bounded at 100 TB; decode runs per-partition
  * (one codec init per partition, not per row), the `mapPartitions`
  * pattern that a Pandas-UDF `mapInPandas` batch loop expresses in PySpark.
  */
object Multimodal {

  /** A media file row: id, kind ("image" | "audio" | "video"), raw bytes,
    * free-form string metadata.
    */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  case class MediaFile(media_id: Long, kind: String, content: Array[Byte],
      meta: Map[String, String])

  case class ImageMeta(media_id: Long, format: String, width: Int, height: Int,
      channels: Int, n_bytes: Long, valid: Boolean)

  /** Deterministic fake header: magic "GRFT" + 3 big-endian ints
    * (width, height, channels). Fixture generators write it; the decode
    * stub parses it.
    */
  def fakeHeader(width: Int, height: Int, channels: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16)
    bb.put("GRFT".getBytes("US-ASCII")).putInt(width).putInt(height).putInt(channels)
    bb.array()
  }

  /** Decode stage — STUB. Parses the fake header per partition; a real
    * deployment swaps the body marked below for an actual image codec.
    * Runs as `mapPartitions` so codec initialization happens once per
    * partition and rows stream through in batches.
    */
  def decodeStub(media: Dataset[MediaFile]): Dataset[ImageMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // >>> STUB: real codec init would go here (once per partition) <<<
      rows.map { m =>
        val bytes = Option(m.content).getOrElse(Array.emptyByteArray)
        if (bytes.length >= 16 && new String(bytes.take(4), "US-ASCII") == "GRFT") {
          val bb = java.nio.ByteBuffer.wrap(bytes, 4, 12)
          ImageMeta(m.media_id, "grft", bb.getInt, bb.getInt, bb.getInt,
            bytes.length.toLong, valid = true)
        } else ImageMeta(m.media_id, "unknown", 0, 0, 0, bytes.length.toLong,
          valid = false)
      }
    }
  }

  case class AudioMeta(media_id: Long, format: String, sample_rate: Int,
      n_samples: Long, channels: Int, n_bytes: Long, valid: Boolean)

  /** Deterministic fake AUDIO header: magic "GRFA" + sample rate (int) +
    * sample count (long) + channels (int), 20 bytes. Fixture generators
    * write it; the audio metadata stub parses it.
    */
  def fakeAudioHeader(sampleRate: Int, nSamples: Long, channels: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(20)
    bb.put("GRFA".getBytes("US-ASCII")).putInt(sampleRate).putLong(nSamples)
      .putInt(channels)
    bb.array()
  }

  /** Audio metadata extract — STUB, mirroring [[decodeStub]]: parses the
    * fake header per partition; a real deployment swaps only the marked
    * body for an audio demuxer (sample rate / duration / channel probe).
    */
  def audioMetaStub(media: Dataset[MediaFile]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // >>> STUB: real demuxer init would go here (once per partition) <<<
      rows.map { m =>
        val bytes = Option(m.content).getOrElse(Array.emptyByteArray)
        if (bytes.length >= 20 && new String(bytes.take(4), "US-ASCII") == "GRFA") {
          val bb = java.nio.ByteBuffer.wrap(bytes, 4, 16)
          AudioMeta(m.media_id, "grfa", bb.getInt, bb.getLong, bb.getInt,
            bytes.length.toLong, valid = true)
        } else AudioMeta(m.media_id, "unknown", 0, 0L, 0, bytes.length.toLong,
          valid = false)
      }
    }
  }

  /** Fixed-length segmentation of decoded audio rows: one row per
    * `segmentSeconds` window, bounds expressed in SAMPLES (exact integer
    * arithmetic — float seconds would drift between engines). The segment
    * count is ⌈n_samples / (rate·seg)⌉ via the `(n−1) div s` identity; the
    * last segment clamps to the sample count. Declarative
    * `sequence`+`explode`, no UDF — the generator never materializes more
    * than the output rows.
    */
  def audioSegments(audio: DataFrame, segmentSeconds: Int): DataFrame =
    audio
      .filter(col("valid") && col("n_samples") > 0 && col("sample_rate") > 0)
      .withColumn("__sps", col("sample_rate").cast("long") * segmentSeconds)
      .withColumn("seg_idx",
        explode(sequence(lit(0L), expr("(n_samples - 1) div __sps"))))
      .select(col("media_id"),
        col("seg_idx").cast("int").as("seg_idx"),
        (col("seg_idx") * col("__sps")).as("start_sample"),
        least((col("seg_idx") + 1) * col("__sps"), col("n_samples"))
          .as("end_sample"))

  /** Resize stage — metadata math is real; pixel resampling is the stub
    * (content passes through unchanged). Aspect-preserving fit into
    * maxSide.
    */
  def resizeMeta(decoded: Dataset[ImageMeta], maxSide: Int): DataFrame =
    decoded.toDF()
      .withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxSide, 1.0)
          .otherwise(lit(maxSide) / greatest(col("width"), col("height"))
            .cast("double")))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))

  /** Frame-sample stage for video rows: emit every `everyN`-th frame index
    * up to `n_frames` (from metadata) as one row per sampled frame —
    * a generator (`explode`) over a sequence expression, no UDF.
    */
  def frameSample(video: DataFrame, everyN: Int): DataFrame =
    video
      .withColumn("n_frames",
        coalesce(element_at(col("meta"), "n_frames").cast("int"), lit(0)))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)),
          lit(everyN))))
      .filter(col("n_frames") > 0)
      .select(col("media_id"), col("frame_idx"))

  /** Pack rows into roughly equal-BYTE partitions: bucket = floor(running
    * byte offset / targetBytes), range-partitioned on the bucket id, so
    * each output partition holds ~targetBytes of media regardless of
    * row-size skew — the property that keeps executor memory bounded when
    * a corpus mixes 10 KB thumbnails with 10 GB videos. (Range-partitioning
    * by the SIZE VALUE would do the opposite: cluster all the largest rows
    * together.)
    *
    * Scale shape — TWO-LEVEL prefix sum, no global-order window: the
    * (id, n_bytes) projection is range-partitioned by id (contiguous id
    * runs per partition), each partition computes its LOCAL exclusive
    * prefix in parallel, and the per-partition byte totals — one row per
    * partition — come to the driver to form broadcast cumulative offsets.
    * global offset = partition offset + local prefix. Every pass is
    * parallel; the serial step is a cumulative sum over ~hundreds of
    * partition totals on the driver. (The previous form used a single
    * global-order window — one task streamed every row's metadata.)
    * Media bytes cross the wire only in the final bucket exchange.
    *
    * `idCol` must be UNIQUE and NON-NULL: the computed bucket joins back
    * to the full frame on it, so a duplicate id would multiply rows and a
    * null id would drop them (same contract as AsOfJoin's tieCols).
    */
  def repartitionBySize(df: DataFrame, byteCol: String, targetBytes: Long,
      idCol: String = "media_id"): DataFrame = {
    val spark = df.sparkSession
    val (buckets, parts) = sizeBuckets(df, byteCol, targetBytes, idCol)
    if (parts == 0) return df
    // EXACT routing: bucket ids are dense 0..parts-1, so an identity
    // Partitioner sends each bucket to its own partition deterministically.
    // A SQL-level repartitionByRange(__bucket) would sample by ROW COUNT
    // and merge adjacent low-row-count buckets (exactly the big-media
    // buckets the packer exists to isolate). The RDD hop is a fair trade
    // here: this operator's consumers are per-partition codec loops
    // (mapPartitions), so the codegen pipeline breaks at this boundary
    // anyway, and rows cross the wire exactly once either way.
    val withBucket = df.join(buckets, idCol)
    val bucketIdx = withBucket.columns.length - 1
    val routed = withBucket.rdd
      .map(r => (r.getInt(bucketIdx), r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = parts
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .map { case (_, r) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq.dropRight(1))
      }
    spark.createDataFrame(routed, org.apache.spark.sql.types.StructType(
        withBucket.schema.dropRight(1)))
      .select(df.columns.map(col).toSeq: _*)
  }

  /** The (id, bucket) assignment behind [[repartitionBySize]] and the
    * number of buckets. The assignment is localCheckpoint-materialized
    * (~12 B/row of metadata) so the internal range-partitioned cache can
    * be released before returning — callers never leak a pinned cache per
    * invocation. Returns (empty, 0) for a zero-byte frame.
    */
  def sizeBuckets(df: DataFrame, byteCol: String, targetBytes: Long,
      idCol: String): (DataFrame, Int) = {
    val (buckets, ranged, parts) = sizeBucketsPlan(df, byteCol, targetBytes, idCol)
    if (parts == 0) return (buckets, 0)
    val materialized = buckets.localCheckpoint()
    ranged.foreach(_.unpersist())
    (materialized, parts)
  }

  /** The un-checkpointed bucket plan plus the cached metadata frame it
    * reads — the diagnostic/test hook that lets the NO-serial-exchange
    * property be asserted on the actual plan (checkpointing would hide it
    * behind an RDD scan). Callers other than [[sizeBuckets]] must
    * unpersist the returned frame themselves.
    */
  private[graft] def sizeBucketsPlan(df: DataFrame, byteCol: String,
      targetBytes: Long, idCol: String): (DataFrame, Option[DataFrame], Int) = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    // level 1: contiguous id ranges, local exclusive prefix per partition
    val nMeta = spark.sessionState.conf.numShufflePartitions
    val ranged = df.select(col(idCol), col(byteCol))
      .repartitionByRange(nMeta, col(idCol))
      .withColumn("__pid", spark_partition_id())
      .cache() // metadata-only (~16 B/row); feeds totals + prefix passes
    // level 2: per-partition totals -> driver -> exclusive cumulative
    // offsets (RangePartitioner assigns ascending ranges to ascending
    // partition ids, so cumulating in pid order IS id order)
    val totals = ranged.groupBy("__pid")
      .agg(coalesce(sum(col(byteCol)), lit(0L)).as("__bytes"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val total = totals.map(_._2).sum
    if (total == 0L) {
      ranged.unpersist()
      return (df.sparkSession.emptyDataFrame, None, 0)
    }
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _))
      .toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val buckets = ranged
      .withColumn("__local", coalesce(sum(col(byteCol)).over(w), lit(0L)))
      .join(broadcast(offsets), "__pid")
      .select(col(idCol),
        ((col("__local") + col("__off")) / targetBytes).cast("int").as("__bucket"))
    (buckets, Some(ranged), parts)
  }
}
