package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "The  quick Brown fox jumps over the lazy dog"), // exact dup after normalize
    (3L, "the quick brown fox jumps over the lazy cat"),  // near dup (1 token)
    (4L, "completely different content about spark engines and shuffles"),
    (5L, "another unrelated document mentioning catalyst optimizer rules")
  ).toDF("doc_id", "text")

  test("normalize collapses case and whitespace") {
    val out = docs.select(Dedup.normalize($"text")).as[String].collect()
    assert(out(0) == out(1))
  }

  test("exact dedup keeps the smallest id per duplicate group") {
    val ids = Dedup.exact(docs, "text", "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 3L, 4L, 5L))
  }

  test("shingles: n-gram count and short-document edge") {
    val sh = docs.limit(1).select(Dedup.shingles($"text", 3)).as[Seq[String]].head()
    assert(sh.length == 7) // 9 tokens -> 7 trigrams
    assert(sh.head == "the quick brown")
    val tiny = Seq((1L, "one two")).toDF("doc_id", "text")
    assert(tiny.select(Dedup.shingles($"text", 3)).as[Seq[String]].head().isEmpty)
  }

  test("minhash pairs find the near-dup and the exact dup, not the unrelated docs") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id", k = 64, bands = 16,
        shingleN = 2, threshold = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical docs distance 0; near-dup within 16; unrelated far") {
    val fp = Dedup.simhash64(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) <= 16)
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(4L)) > 16)
  }

  test("ngram jaccard: exact value on known overlap") {
    val pairs = Seq((1L, 3L)).toDF("id1", "id2")
    val j = Dedup.ngramJaccard(docs, pairs, "text", "doc_id", n = 2)
      .select("jaccard").as[Double].head()
    // 8 bigrams each, 7 shared (only "lazy dog" vs "lazy cat" differ) -> 7/9
    assert(j == BigDecimal(7.0 / 9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("real documents: the known sf0.01 near-dup pairs surface through minhash LSH") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((285L, 301L)), s"expected (285,301) in $pairs")
    assert(pairs.contains((98L, 290L)))
    assert(pairs.contains((70L, 447L)))
  }
}
