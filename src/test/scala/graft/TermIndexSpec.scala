package graft

import graft.ops.TermIndex

class TermIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry durian cherry cherry")
  ).toDF("doc_id", "text")

  test("tfidf scores and ranks match hand arithmetic; ties break by term") {
    val rows = TermIndex.tfidfTopTerms(docs, "text", "doc_id", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r).toMap
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val idf1 = math.log(4.0 / 2) + 1 // df=1
    val idf2 = math.log(4.0 / 3) + 1 // df=2
    // doc1: apple tf=2 df=1 beats banana tf=1 df=2
    assert(rows((1L, 1)).getString(2) == "apple")
    assert(rows((1L, 1)).getDouble(5) == round6(2 * idf1))
    assert(rows((1L, 2)).getString(2) == "banana")
    // doc2: banana/cherry identical (tf=1, df=2) -> term ascending
    assert(rows((2L, 1)).getString(2) == "banana")
    assert(rows((2L, 2)).getString(2) == "cherry")
    assert(rows((2L, 1)).getDouble(5) == round6(idf2))
    // doc3: cherry tf=3 dominates
    assert(rows((3L, 1)).getString(2) == "cherry")
    assert(rows((3L, 1)).getLong(3) == 3L && rows((3L, 1)).getLong(4) == 2L)
  }

  test("inverted index: minDf filter, sorted comma postings") {
    val out = TermIndex.invertedIndex(docs, "text", "doc_id", minDf = 2L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.keySet == Set("banana", "cherry"))
    assert(out("banana") == (2L, "1,2"))
    assert(out("cherry") == (2L, "2,3"))
  }

  test("bm25 matches hand arithmetic; unmatched docs are absent") {
    // N=3, dl = 2/3/4, avgdl = 3; query (hash, dup):
    //   df(hash)=2 -> idf ln(1.6); df(dup)=1 -> idf ln(8/3)
    val docs = Seq(
      (1L, "dup hash"),
      (2L, "hash join hash"),
      (3L, "join join join join")
    ).toDF("doc_id", "text")
    val out = TermIndex.bm25Search(docs, "text", "doc_id",
        Seq("hash", "dup"), k1 = 1.2, b = 0.75, topK = 10)
      .collect().map(r => r.getInt(0) -> r).toMap
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc1 (dl=2): denom = 1 + 1.2*(0.25 + 0.75*2/3.0) = 1.9 for tf=1
    val s1 = (math.log(1.6) + math.log(8.0 / 3)) * 2.2 / 1.9
    // doc2 (dl=3): tf=2, denom = 2 + 1.2*(0.25 + 0.75) = 3.2
    val s2 = math.log(1.6) * 2 * 2.2 / 3.2
    assert(out.keySet == Set(1, 2)) // doc3 never matches -> absent
    assert(out(1).getLong(1) == 1L && out(1).getLong(2) == 2L)
    assert(out(1).getDouble(3) == round6(s1))
    assert(out(2).getLong(1) == 2L && out(2).getLong(2) == 1L)
    assert(out(2).getDouble(3) == round6(s2))
  }

  test("posting cap truncates the list but df stays the full count") {
    val out = TermIndex.invertedIndex(docs, "text", "doc_id",
        minDf = 1L, maxPostings = 1)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out("banana") == (2L, "1"))
    assert(out("cherry") == (2L, "2"))
    assert(out("durian") == (1L, "3"))
  }
}
