package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining pipelines: concatenate documents,
  * in stable id order, into packs of ~`maxTokens` tokens — the standard
  * "pack then chunk" preprocessing that turns a ragged corpus into
  * fixed-length training sequences with minimal padding.
  *
  * pack_id = ⌊exclusive running token sum / maxTokens⌋, computed with the
  * same TWO-LEVEL prefix sum as [[Multimodal.sizeBuckets]] (range
  * partition by id → parallel local prefixes → driver-cumulated broadcast
  * offsets): no global-order window, no serial pass, only (id, n_tokens)
  * metadata ever shuffles. A document whose start offset falls near a
  * pack boundary straddles it (budget overflow bounded by one document) —
  * downstream chunking truncates at the boundary, as usual for this
  * preprocessing step.
  *
  * `idCol` must be unique and non-null (inherited from the bucket join's
  * contract).
  */
object Packing {

  /** Attach `pack_id` to every row of `df`. `tokenCol` is the per-row
    * token count; rows accumulate into packs in ascending `idCol` order.
    */
  def packSequences(df: DataFrame, tokenCol: String, idCol: String,
      maxTokens: Long): DataFrame = {
    val (buckets, parts) =
      Multimodal.sizeBuckets(df, tokenCol, maxTokens, idCol)
    if (parts == 0) return df.withColumn("pack_id", lit(0))
    df.join(buckets.withColumnRenamed("__bucket", "pack_id"), idCol)
  }
}
