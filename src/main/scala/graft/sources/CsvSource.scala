package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CSV ingestion with corrupt-record quarantine — the second interchange
  * format next to [[JsonlSource]] (tabular exports, evaluation sets and
  * metadata sheets ship as CSV; the same robustness contract applies:
  * malformed lines are COUNTED and QUARANTINED, never dropped or fatal).
  *
  * Spark mapping: declared-schema `csv` scan in PERMISSIVE mode with an
  * explicit `_corrupt_record` column. A row whose token count disagrees
  * with the schema or whose tokens fail type coercion surfaces with NULL
  * data fields and the raw line in the corrupt column. The declared
  * schema avoids the inference pre-pass, keeps the scan one job, and at
  * 100 TB lets the reader split files by byte range (no multiLine mode:
  * quoted embedded newlines would force whole-file parsing — corpora
  * that need them should ship JSONL instead; see the JsonlSource notes
  * on the corrupt-column-only pruning restriction, which applies here
  * identically).
  *
  * CSV-specific quarantine caveat: the CSV parser prunes to the query's
  * required columns (`spark.sql.csv.parser.columnPruning.enabled`, on by
  * default), and a pruned parse CANNOT see a malformed field it never
  * parses — an over-length row counts as well-formed in a query that
  * only touches its leading columns. Quarantine accounting must therefore
  * read every data column (as the `csv_ingest` driver query does by
  * aggregating over all five fields); a count that prunes is a count
  * that undercounts corruption.
  */
object CsvSource {

  /** Documents-table schema plus the corrupt-record column. */
  val documentsSchema: String = JsonlSource.documentsSchema

  /** PERMISSIVE declared-schema scan of a CSV directory/file (no header:
    * corpus shards carry schema out-of-band, headers per shard would be
    * data rows at merge time).
    */
  def readDocuments(s: SparkSession, path: String): DataFrame =
    s.read
      .schema(documentsSchema)
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)

  /** Well-formed rows, typed exactly like the documents table. */
  def good(df: DataFrame): DataFrame = JsonlSource.good(df)

  /** Malformed lines: raw line, doc_id NULL (see JsonlSource notes). */
  def quarantined(df: DataFrame): DataFrame = JsonlSource.quarantined(df)
}
