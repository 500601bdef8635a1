package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and BPE-ish") {
    val df = Seq(
      "hello world",
      "  spaced   out  ",
      "punct, heavy! (tokens)",
      "").toDF("text")
    val got = df.select(
      TextAnalysis.tokenCount($"text").as("ws"),
      TextAnalysis.bpeishTokenCount($"text").as("bpe"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(got(0) == ((2, 2)))
    assert(got(1) == ((2, 2)))
    assert(got(2) == ((3, 7))) // punct + heavy + tokens -> "punct , heavy ! ( tokens )"
    assert(got(3)._1 == 0)
  }

  test("ratios: punctuation and digits") {
    val df = Seq(("a,b.c!", "abc123")).toDF("t1", "t2")
    val r = df.select(TextAnalysis.punctRatio($"t1"), TextAnalysis.digitRatio($"t2")).head()
    assert(r.getDouble(0) == 0.5) // 3 punct / 6 chars
    assert(r.getDouble(1) == 0.5)
  }

  test("langId picks the profile with the most stopword hits") {
    val df = Seq(
      "the cat and the dog sat on a mat in the sun",
      "der hund und die katze ist nicht ein freund",
      "el perro y la casa es un lugar en que los gatos",
      "xyzzy qwerty asdf").toDF("text")
    val got = df.select(TextAnalysis.langId($"text")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "es", "und"))
  }

  test("quality score is in [0,1] and penalizes junk") {
    val df = Seq(
      "a clean readable document with enough words to look like prose and sentences",
      "!!! ??? ,,, ... ;;; :::").toDF("text")
    val s = df.select(TextAnalysis.qualityScore($"text")).as[Double].collect()
    assert(s.forall(v => v >= 0.0 && v <= 1.0))
    assert(s(0) > s(1))
  }

  test("fingerprint is deterministic, order-sensitive, whitespace-normalized") {
    val df = Seq(
      ("one two three", "one two three", "three two one"),
      ("a  b", "a b", "b a")).toDF("t1", "t2", "t3")
    val rows = df.select(
      TextAnalysis.fingerprint($"t1"), TextAnalysis.fingerprint($"t2"),
      TextAnalysis.fingerprint($"t3")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) == r.getLong(1))
      assert(r.getLong(0) != r.getLong(2))
    }
  }

  test("md5 fingerprint matches the known digest of the normalized text") {
    // md5("foo bar") — fixed reference digest, pins normalize + hex casing.
    val df = Seq("Foo  BAR", "\tfoo bar\n").toDF("text")
    val fps = df.select(TextAnalysis.fingerprintMd5($"text")).as[String].collect()
    assert(fps.forall(_ == "327b6f07435811239bc47e1544353273"), fps.mkString("|"))
  }

  test("dedupTokens keeps first occurrences in order") {
    val df = Seq("the cat and  THE dog and the bird", "a a a", "").toDF("text")
    val got = df.select(TextAnalysis.dedupTokens($"text")).as[String].collect()
    assert(got(0) == "the cat and dog bird") // normalize lowercases: THE == the
    assert(got(1) == "a")
    assert(got(2) == "")
  }

  test("redactPii: emails before digit runs, both patterns counted") {
    // the email's 7+-digit local part must be swallowed by the email pass,
    // not split by the digit pass
    val df = Seq("mail 12345678@ex.com and card 98765432109 end").toDF("text")
    val r = df.select(
      TextAnalysis.redactPii($"text").as("red"),
      TextAnalysis.emailCount($"text").as("e"),
      TextAnalysis.longDigitCount($"text").as("d")).head()
    assert(r.getString(0) == "mail <EMAIL> and card <NUM> end")
    assert(r.getInt(1) == 1 && r.getInt(2) == 2) // digit count is pre-redaction
  }

  test("runs over the real documents table") {
    val docs = Tables.documents(spark, sf0001)
    val out = docs.select($"doc_id",
      TextAnalysis.tokenCount($"text").as("n_tokens"),
      TextAnalysis.langId($"text").as("lang_pred"),
      TextAnalysis.qualityScore($"text").as("quality"))
    assert(out.count() == 500)
    assert(out.filter($"n_tokens" <= 0).count() == 0)
  }

  test("repetition: top n-gram fractions and the Gopher keep gate") {
    val df = Seq(
      "a a a b",        // top1 = 3/4; bigrams (a a),(a a),(a b) -> 2/3;
                        // trigrams (a a a),(a a b) -> 1/2
      "w x y z",        // all distinct: 1/4, 1/3, 1/2
      "one",            // single token: no 2-/3-grams -> 0.0
      "  A  a\ta ",     // normalization: 3 tokens 'a' -> top1 = 1.0
      "").toDF("text")
    val got = df.select(
      TextAnalysis.topNgramFrac($"text", 1).as("f1"),
      TextAnalysis.topNgramFrac($"text", 2).as("f2"),
      TextAnalysis.topNgramFrac($"text", 3).as("f3"),
      TextAnalysis.repetitionKeep($"text").as("keep"))
      .collect()
    def row(i: Int) = (got(i).getDouble(0), got(i).getDouble(1),
      got(i).getDouble(2), got(i).getBoolean(3))
    assert(row(0) == ((0.75, 2.0 / 3, 0.5, false)))
    assert(row(1) == ((0.25, 1.0 / 3, 0.5, false))) // trigram 1/2 > 0.16
    assert(row(2) == ((1.0, 0.0, 0.0, false)))      // top1 1.0 > 0.20
    assert(row(3) == ((1.0, 1.0, 1.0, false)))
    assert(row(4) == ((0.0, 0.0, 0.0, true)))       // empty: nothing dominates
    // a long diverse document passes the gate
    val diverse = Seq((0 until 100).map(i => s"tok$i").mkString(" "))
      .toDF("text")
    assert(diverse.select(TextAnalysis.repetitionKeep($"text"))
      .head.getBoolean(0))
  }

  test("repetitionMetrics (pipeline aggregation form) == per-row form") {
    val df = Seq((1L, "a a a b"), (2L, "w x y z"), (3L, "one"),
      (4L, "  A  a\ta "), (5L, ""), (6L, "p q p q p q"))
      .toDF("doc_id", "text")
    val agg = TextAnalysis.repetitionMetrics(df, "text", "doc_id")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    val perRow = df.orderBy("doc_id").select($"doc_id",
        TextAnalysis.topNgramFrac($"text", 1),
        TextAnalysis.topNgramFrac($"text", 2),
        TextAnalysis.topNgramFrac($"text", 3),
        TextAnalysis.repetitionKeep($"text"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(agg == perRow)
  }
}
