package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.sources.CsvSource
import org.apache.spark.sql.functions._

class CsvSourceSpec extends SparkSpec {

  private lazy val dir: String = {
    val tmp = Files.createTempDirectory("graft_csv_spec")
    Files.write(tmp.resolve("a.csv"),
      ("1,hello world,en,s1,11\n" +
        "2,bonjour,fr,s1,7\n" +
        "xx\n" +                        // under-length
        "abc,some text,en,s1,9\n" +     // doc_id type failure
        "3,text,en,s1,4,extra\n")       // over-length
        .getBytes(StandardCharsets.UTF_8))
    tmp.toString
  }

  test("PERMISSIVE scan: good rows typed, malformed lines quarantined, never a throw") {
    val df = CsvSource.readDocuments(spark, dir).cache()
    assert(df.count() == 5)
    val good = CsvSource.good(df)
    assert(good.count() == 2)
    assert(good.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    val q = CsvSource.quarantined(df).collect()
    assert(q.length == 3)
    // raw malformed lines preserved verbatim for triage
    assert(q.map(_.getString(1)).toSet ==
      Set("xx", "abc,some text,en,s1,9", "3,text,en,s1,4,extra"))
  }

  test("partial parses may fill fields of a malformed row; corrupt column stays authoritative") {
    val df = CsvSource.readDocuments(spark, dir).cache()
    val typeFail = df.filter(col("_corrupt_record") === "abc,some text,en,s1,9")
      .collect().head
    assert(typeFail.isNullAt(0))                 // the failed field is null
    assert(typeFail.getString(2) == "en")        // but lang DID parse
  }

  test("column pruning hides over-length corruption: full projection is required") {
    // a query that only reads leading columns never parses the extra
    // token, so the over-length row silently counts as well-formed —
    // the documented reason csv_ingest aggregates over all five fields.
    // (Drop the earlier tests' cached full scan first: plan-matching
    // cache reuse would serve fully-parsed rows and mask the pruning.)
    spark.catalog.clearCache()
    val pruned = CsvSource.readDocuments(spark, dir)
      .groupBy(col("_corrupt_record").isNotNull.as("bad"))
      .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("si"))
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(pruned(true) == 2, "pruned parse should miss the over-length row")
    val full = CsvSource.readDocuments(spark, dir)
      .groupBy(col("_corrupt_record").isNotNull.as("bad"))
      .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("tl"),
        sum(col("doc_id")).as("si"), sum(col("n_chars")).as("sc"),
        count_distinct(col("lang")).as("nl"),
        count_distinct(col("source")).as("ns"))
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(full(true) == 3, "full projection must flag all three")
  }
}
