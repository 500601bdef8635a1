package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JSONL (JSON-lines) document ingestion with corrupt-record quarantine —
  * the interchange format LLM corpora actually ship in (one JSON object
  * per line; a web-scale dump always carries some malformed lines, and a
  * pipeline must COUNT and QUARANTINE them, never silently drop or die).
  *
  * Spark mapping: schema-on-read `json` scan in PERMISSIVE mode with an
  * explicit `_corrupt_record` column — malformed lines surface as rows
  * whose data fields are NULL and whose corrupt column holds the raw
  * line, so quarantining is an ordinary filter and the scan never throws.
  * The declared schema keeps the scan single-pass (no inference job) and
  * column-prunable at 100 TB; `badRecordsPath`-style side-channels are
  * deliberately avoided (a second output path breaks exactly-once
  * accounting — here the quarantine IS part of the result).
  *
  * Caveat (Spark's QUERY_ONLY_CORRUPT_RECORD_COLUMN rule): after column
  * pruning, a query whose required schema is just `_corrupt_record` —
  * e.g. `good(df).count()`, which prunes everything but the filter
  * column — is refused on the RAW scan, because honoring it would force
  * a silent full re-parse. The idiomatic shape (and what the error
  * message itself prescribes) is parse once, materialize, then split:
  * aggregate in one pass over the scan (the `jsonl_ingest` driver query
  * groups corrupt and good rows together), or `.cache()` the parsed
  * frame before calling [[good]]/[[quarantined]] separately.
  */
object JsonlSource {

  /** Documents-table schema plus the corrupt-record column. */
  val documentsSchema: String =
    "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG, " +
      "_corrupt_record STRING"

  /** PERMISSIVE schema-on-read scan of a JSONL directory/file. */
  def readDocuments(s: SparkSession, path: String): DataFrame =
    s.read
      .schema(documentsSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Well-formed rows, typed exactly like the documents table. */
  def good(df: DataFrame): DataFrame =
    df.filter(col("_corrupt_record").isNull).drop("_corrupt_record")

  /** Malformed lines: the raw line plus nothing else (doc_id kept in the
    * projection to satisfy the corrupt-column-only restriction; it is
    * NULL for every quarantined row).
    */
  def quarantined(df: DataFrame): DataFrame =
    df.filter(col("_corrupt_record").isNotNull)
      .select(col("doc_id"), col("_corrupt_record").as("raw_line"))
}
