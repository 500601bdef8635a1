package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding quantization for large-scale vector storage: symmetric
  * per-vector int8 (max-abs scaling), the standard 4× shrink before
  * writing an ANN corpus. Pure array expressions — per-row, zero shuffle,
  * codegen-friendly; quantizing 100 TB of vectors is a map-only pass.
  *
  * Arithmetic is chosen for cross-engine exactness: the scale is a single
  * max (no accumulation-order concerns) and each lane quantizes
  * independently as `round(x / scale * 127)` in IEEE doubles, so the
  * DuckDB oracle reproduces every value bit-for-bit.
  */
object Quantize {

  /** Per-vector max-abs: the symmetric quantization scale (0 for the
    * all-zero vector).
    */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** Symmetric int8 lanes: round(x / maxabs · 127), all zeros when the
    * vector is all-zero.
    */
  def int8Lanes(vec: Column): Column = {
    val s = maxAbs(vec)
    transform(vec, x =>
      when(s === 0d, 0)
        .otherwise(round(x.cast("double") / s * 127, 0))
        .cast("int"))
  }
}
