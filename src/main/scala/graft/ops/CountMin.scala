package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over token (or any key) frequencies — the
  * fixed-size frequency summary (Cormode & Muthukrishnan, J.Alg 2005)
  * that answers "how often does X occur in 100 TB" from d·w counters:
  * estimate = min over d hash rows of the row's bucket counter;
  * one-sided error (never under-counts), excess ≤ ε·N with
  * ε = e/w at probability 1 − e^−d.
  *
  * Scale design: counts collapse to the DISTINCT key table first (one
  * corpus exchange with map-side combine); the d-row explosion and the
  * (row, bucket) aggregate then touch vocabulary-sized data, and the
  * sketch itself is d·w rows — broadcastable state, mergeable across
  * partitions/days by cell-wise addition (counters are sums).
  *
  * Determinism: buckets come from the oracle-portable [[Dedup.md5Hash64]]
  * salted with the row index, reduced mod a POWER-OF-TWO width — signed
  * pmod and DuckDB's unsigned % agree exactly when the modulus divides
  * 2⁶⁴, so any engine rebuilds the identical sketch (xxhash64 is the
  * cheaper production default, as in the SimHash family).
  */
object CountMin {

  /** Bucket of `key` in hash row `r` (width `w` must be a power of two). */
  def bucket(key: Column, r: Column, w: Int): Column = {
    require((w & (w - 1)) == 0 && w > 0, "width must be a power of two")
    pmod(Dedup.md5Hash64(concat(r.cast("string"), lit("|"), key)),
      lit(w.toLong))
  }

  /** Build the sketch from a (key, n) count table: (r, bucket, cell). */
  def sketch(counts: DataFrame, keyCol: String, nCol: String,
      w: Int, d: Int): DataFrame =
    counts
      .select(col(keyCol), col(nCol),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("bucket", bucket(col(keyCol), col("r"), w))
      .groupBy(col("r"), col("bucket"))
      .agg(sum(col(nCol)).as("cell"))

  /** Point-estimate the keys of `queries` (column `keyCol`) against a
    * sketch: min over rows of the key's bucket cell. The query side is
    * expected to be small (heavy-hitter candidates); the join is
    * (|queries|·d) × (d·w) — metadata-sized on both sides.
    */
  def estimate(queries: DataFrame, sk: DataFrame, keyCol: String,
      w: Int, d: Int): DataFrame = {
    val qc = queries
      .withColumn("r", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("bucket", bucket(col(keyCol), col("r"), w))
    val others = queries.columns.filter(_ != keyCol).map(col)
    qc.join(broadcast(sk), Seq("r", "bucket"))
      .groupBy(col(keyCol) +: others: _*)
      .agg(min(col("cell")).as("est"))
  }
}
