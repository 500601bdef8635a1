package graft

import org.apache.spark.sql.functions._

import graft.functions.strings

class StringNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("composed and decomposed forms collapse to one key; case folds") {
    val composed = "caf\u00e9"          // e-acute as one code point
    val decomposed = "cafe\u0301"       // e + combining acute
    val upper = "CAF\u00c9"
    val df = Seq(composed, decomposed, upper, "cafe").toDF("t")
      .select(strings.nfcCasefold($"t").as("k"))
    val keys = df.as[String].collect()
    assert(keys(0) == keys(1), "NFC must unify composed/decomposed")
    assert(keys(0) == keys(2), "casefold must unify case variants")
    assert(keys(0) != keys(3), "distinct text stays distinct")
    assert(keys(0) == "caf\u00e9")
  }

  test("NFC is canonical-only: compatibility forms stay distinct") {
    val rows = Seq("\ufb01sh", "fish")  // fi ligature U+FB01 vs f+i
      .toDF("t").select(strings.nfcCasefold($"t").as("k"))
      .as[String].collect()
    assert(rows(0) != rows(1))
  }

  test("ASCII passthrough, null, empty, and non-BMP code points") {
    val emoji = new String(Character.toChars(0x1F600))
    val rows = Seq(Some("Hello World"), None, Some(""), Some(emoji + "x"))
      .toDF("t").select(strings.nfcCasefold($"t").as("k")).collect()
    assert(rows(0).getString(0) == "hello world")
    assert(rows(1).isNullAt(0))
    assert(rows(2).getString(0) == "")
    assert(rows(3).getString(0) == emoji + "x") // surrogate pair intact
  }

  test("interpreted eval matches codegen path") {
    val e = graft.functions.NfcCasefold(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("CAF\u00c9 X")))
    assert(e.eval(null).toString == "caf\u00e9 x")
  }

  test("participates in whole-stage codegen over real documents") {
    val df = Tables.documents(spark, sf0001)
      .select(strings.nfcCasefold($"text").as("k"))
    df.collect() // forces codegen compilation (fallback would re-plan)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"codegen fell back:\n$plan")
  }
}
