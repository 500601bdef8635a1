package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.sources.JsonlSource

class JsonlSourceSpec extends SparkSpec {

  private lazy val dir: String = {
    val tmp = Files.createTempDirectory("graft_jsonl_spec")
    Files.write(tmp.resolve("a.json"),
      ("""{"doc_id": 1, "text": "hello world", "lang": "en", "source": "s1", "n_chars": 11}""" +
        "\n" +
        """{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "s1", "n_chars": 7}""" +
        "\nnot json\n" +
        """{"doc_id":}""" + "\n")
        .getBytes(StandardCharsets.UTF_8))
    tmp.toString
  }

  test("PERMISSIVE scan: good rows typed, malformed lines quarantined, never a throw") {
    // parse-once-materialize: corrupt-only-pruned queries (good().count())
    // are refused on the raw scan by design — see the JsonlSource caveat
    val df = JsonlSource.readDocuments(spark, dir).cache()
    assert(df.count() == 4)
    val good = JsonlSource.good(df)
    assert(good.count() == 2)
    assert(good.columns.toSeq ==
      Seq("doc_id", "text", "lang", "source", "n_chars"))
    val q = JsonlSource.quarantined(df).collect()
    assert(q.length == 2)
    // the raw malformed line is preserved verbatim for triage
    assert(q.map(_.getString(1)).toSet == Set("not json", """{"doc_id":}"""))
    assert(q.forall(_.isNullAt(0))) // no data fields leak into quarantine
  }

  test("schema-on-read never runs an inference job (declared schema is used)") {
    val df = JsonlSource.readDocuments(spark, dir)
    assert(df.schema.fieldNames.contains("_corrupt_record"))
    assert(df.schema("doc_id").dataType.typeName == "long")
  }
}
