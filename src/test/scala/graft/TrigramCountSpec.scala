package graft

import org.apache.spark.sql.functions._

import graft.functions.trigrams

class TrigramCountSpec extends SparkSpec {
  import spark.implicits._

  /** The declarative reference form the kernel replaced (code-point
    * substrings → distinct → size), evaluated in Spark itself so the
    * pin is engine-semantics-exact, not a re-implementation.
    */
  private def referenceCounts(values: Seq[Option[String]]): Seq[Option[Int]] =
    values.toDF("t")
      .select(expr(
        """size(array_distinct(CASE WHEN char_length(t) < 3
           THEN CAST(array() AS ARRAY<STRING>)
           ELSE transform(sequence(1, char_length(t) - 2),
                          i -> substring(t, i, 3)) END))""").as("n"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))

  private def kernelCounts(values: Seq[Option[String]]): Seq[Option[Int]] =
    values.toDF("t")
      .select(trigrams.distinctTrigramCount($"t").as("n"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))

  test("matches the array form on hand-picked edges") {
    val cases = Seq(
      Some(""), Some("a"), Some("ab"), Some("abc"), Some("aaaa"),
      Some("abcabcabc"),                       // repeated trigrams collapse
      Some("the quick brown fox"), None,
      Some("café crème café"),  // non-ASCII BMP
      Some(new String(Character.toChars(0x1F600)) * 4 + "ab"), // non-BMP runs
      Some("ab" + new String(Character.toChars(0x1F600)) + "cd"))
    assert(kernelCounts(cases) == referenceCounts(cases))
  }

  test("property: matches the array form on 300 random unicode strings") {
    val rnd = new scala.util.Random(20260816L)
    val alphabet: IndexedSeq[String] =
      ("abcxyz 01".map(_.toString) ++
        Seq("é", "中", new String(Character.toChars(0x1F600)))).toIndexedSeq
    val cases: Seq[Option[String]] = (0 until 300).map { i =>
      if (i % 37 == 5) None
      else Some(Seq.fill(rnd.nextInt(40))(
        alphabet(rnd.nextInt(alphabet.size))).mkString)
    }
    assert(kernelCounts(cases) == referenceCounts(cases))
  }

  test("interpreted eval matches codegen path") {
    val e = graft.functions.DistinctTrigramCount(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("abcabc")))
    assert(e.eval(null) == 3) // abc, bca, cab; the repeat collapses
  }

  test("participates in whole-stage codegen over real documents") {
    val df = Tables.documents(spark, sf0001)
      .select(trigrams.distinctTrigramCount($"text").as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"codegen fell back:\n$plan")
  }
}
