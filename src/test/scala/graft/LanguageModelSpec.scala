package graft

import graft.ops.LanguageModel

class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("bigram scores match hand arithmetic (add-one smoothing over corpus vocab)") {
    // corpus: a×3 b×2 c×1 -> V=3; c(a)=3; c(a,b)=2, c(a,c)=1
    val docs = Seq((1L, "a b"), (2L, "a  B"), (3L, "a c")).toDF("doc_id", "text")
    val out = LanguageModel.bigramScore(docs, "text", "doc_id", maxBits = 1.2)
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc1: P(b|a) = (2+1)/(3+3) = 1/2 -> 1.0 bits, ppl 2.0
    assert(out(1L).getLong(1) == 1L)
    assert(out(1L).getDouble(2) == 1.0 && out(1L).getDouble(3) == 2.0)
    assert(out(1L).getBoolean(4))
    // normalization: doc2 ("a  B") scores identically to doc1
    assert(out(2L).getDouble(2) == 1.0)
    // doc3: P(c|a) = (1+1)/6 -> log2(3) bits, ppl 3.0, above the 1.2 gate
    assert(out(3L).getDouble(2) == BigDecimal(math.log(3) / math.log(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(3L).getDouble(3) == 3.0 && !out(3L).getBoolean(4))
  }

  test("documents without transitions score 0 bits / ppl 1 and are kept") {
    val docs = Seq((1L, "a a a"), (2L, "b"), (3L, "")).toDF("doc_id", "text")
    val out = LanguageModel.bigramScore(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(2L).getLong(1) == 0L && out(2L).getDouble(2) == 0.0)
    assert(out(2L).getDouble(3) == 1.0 && out(2L).getBoolean(4))
    assert(out(3L).getLong(1) == 0L && out(3L).getBoolean(4))
    // doc1 has 2 (a,a) transitions; the empty doc's '' token joins the
    // vocab (V=3, same in the oracle): P(a|a) = (2+1)/(3+3) -> 1.0 bits
    assert(out(1L).getLong(1) == 2L)
    assert(out(1L).getDouble(2) == 1.0)
  }
}
