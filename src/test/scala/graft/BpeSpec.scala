package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("pairCounts: frequency-weighted adjacent pairs over distinct words") {
    val df = Seq("ab ab abc", "ab x").toDF("text")
    // words: ab:3, abc:1, x:1 (x has 1 symbol -> no pairs)
    val got = Bpe.pairCounts(Bpe.wordTable(df, "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a b" -> 4L, "b c" -> 1L))
  }

  test("mergeSyms: greedy left-to-right, merged token does not chain-merge") {
    val df = Seq(("aaa")).toDF("w").withColumn("syms", split(col("w"), ""))
    val out = df.select(Bpe.mergeSyms(col("syms"), "a", "a")).head.getSeq[String](0)
    assert(out == Seq("aa", "a")) // leftmost merge wins, scan resumes after
  }

  test("trainMerges learns the dominant pairs in order") {
    val df = Seq.fill(5)("low lower lowest").toDF("text")
    val merges = Bpe.trainMerges(df, "text", 3)
    // 'l o' and 'lo w' dominate (present in every word, weight 15 each);
    // ties break lexicographically so the order is deterministic
    assert(merges.take(2) == Seq(("l", "o"), ("lo", "w")))
    assert(merges.length == 3)
  }
}
