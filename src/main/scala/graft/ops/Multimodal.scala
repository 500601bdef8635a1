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
    * Scale shape: the running offset is computed over a projection of
    * (id, n_bytes) ONLY — the global-order window moves ~16 bytes/row of
    * metadata, never media bytes; media crosses the wire in the join and
    * final exchange. Rows land in id order, so each bucket is a contiguous
    * id run of ~targetBytes (one oversized row spills its bucket by at
    * most that row — unavoidable for any non-splitting packer).
    */
  def repartitionBySize(df: DataFrame, byteCol: String, targetBytes: Long,
      idCol: String = "media_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // sum() is NULL on an empty frame — guard instead of getLong-NPE
    val total = df.agg(coalesce(sum(col(byteCol)), lit(0L)))
      .collect()(0).getLong(0)
    if (total == 0L) return df
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    // exclusive prefix sum: a row starts at the bytes of all rows before it
    val w = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val buckets = df.select(col(idCol), col(byteCol))
      .withColumn("__bucket",
        (coalesce(sum(col(byteCol)).over(w), lit(0L)) / targetBytes).cast("int"))
      .select(col(idCol), col("__bucket"))
    df.join(buckets, idCol)
      .repartitionByRange(parts, col("__bucket"))
      .drop("__bucket")
  }
}
