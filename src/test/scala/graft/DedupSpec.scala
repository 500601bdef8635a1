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

  test("normalize strips leading/trailing tabs and newlines (collapse before trim)") {
    // Spark's trim strips only 0x20 spaces; collapse must run first or a
    // leading tab survives as a leading space (r3 ADVICE parity gap).
    val weird = Seq("\tfoo  bar\n", "\n\n foo\tbar \t", "foo bar").toDF("text")
    val out = weird.select(Dedup.normalize($"text")).as[String].collect()
    assert(out.forall(_ == "foo bar"), out.mkString("|"))
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

  test("simhash banding is COMPLETE: pairs == brute-force hamming all-pairs (sf0.01)") {
    // The soundness contract of the combination banding: no pair within
    // maxDistance may be missed. Brute force is the oracle DuckDB can't be
    // (no xxhash64): all 500×499/2 fingerprint pairs, exact bit_count.
    val real = Tables.documents(spark, "/root/testdata/sf0.01")
    for (d <- Seq(3, 8)) {
      val banded = Dedup.simhashPairs(real, "text", "doc_id", maxDistance = d)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val fp = Dedup.simhash64(real, "text", "doc_id")
      val l = fp.select($"doc_id".as("id1"), $"simhash".as("h1"))
      val r = fp.select($"doc_id".as("id2"), $"simhash".as("h2"))
      val brute = l.crossJoin(r).filter($"id1" < $"id2")
        .filter(Dedup.hamming($"h1", $"h2") <= d)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(banded == brute,
        s"d=$d missed=${brute -- banded} spurious=${banded -- brute}")
    }
  }

  test("adaptive depth gate: forced-deepest banding == fixed-depth == brute force") {
    // candidatesPerDoc = 0 forces every upgrade step (q -> qMax), the
    // configuration a 100x corpus would select; the verified output must
    // be IDENTICAL at every depth — the gate may only change cost.
    val real = Tables.documents(spark, "/root/testdata/sf0.01")
    for (d <- Seq(3, 8)) {
      val fp = Dedup.simhash64(real, "text", "doc_id")
      val deepest = Dedup.fingerprintHammingPairs(fp, "doc_id", "simhash",
          maxDistance = d, candidatesPerDoc = 0)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val fixed = Dedup.fingerprintHammingPairs(fp, "doc_id", "simhash",
          maxDistance = d, candidatesPerDoc = Int.MaxValue)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(deepest == fixed,
        s"d=$d missed=${fixed -- deepest} spurious=${deepest -- fixed}")
    }
  }

  test("md5Hash64 equals DuckDB md5_number_upper (little-endian u64 of first 8 digest bytes)") {
    // Constants verified directly against DuckDB 1.0:
    //   md5_number_upper('abc') = 12704604231530709392 (= -5742139842178842224)
    //   md5_number_upper('')    = 6579904.. — recomputed below from the hex
    // form instead of hardcoding: LE-reverse the first 8 md5 hex pairs.
    def expected(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.nio.ByteBuffer.wrap(d, 0, 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    }
    val in = Seq("abc", "", "the", "naïve-ütf8", "a b").toDF("s")
    val got = in.select(Dedup.md5Hash64($"s")).as[Long].collect()
    val want = Seq("abc", "", "the", "naïve-ütf8", "a b").map(expected)
    assert(got.toSeq == want, s"got ${got.toSeq} want $want")
    assert(expected("abc") == -5742139842178842224L) // == 12704604231530709392 as u64
  }

  test("simhash banding stays complete under the oracle-portable md5 token hash") {
    val real = Tables.documents(spark, "/root/testdata/sf0.001")
    val banded = Dedup.simhashPairs(real, "text", "doc_id", maxDistance = 8,
        tokenHash = Dedup.md5Hash64)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val fp = Dedup.simhash64(real, "text", "doc_id", Dedup.md5Hash64)
    val l = fp.select($"doc_id".as("id1"), $"simhash".as("h1"))
    val r = fp.select($"doc_id".as("id2"), $"simhash".as("h2"))
    val brute = l.crossJoin(r).filter($"id1" < $"id2")
      .filter(Dedup.hamming($"h1", $"h2") <= 8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(banded == brute,
      s"missed=${brute -- banded} spurious=${banded -- brute}")
  }

  test("simhash64 packed lanes: 66k-token doc is fine; >=2^21 occurrences fail loudly") {
    // 66k occurrences was the old 4x16-bit packing's silent-corruption
    // zone; the 3x21-bit packing handles it exactly.
    val big = Seq((1L, "alpha beta " * 33000)).toDF("doc_id", "text")
    val fpBig = Dedup.simhash64(big, "text", "doc_id").collect()(0).getLong(1)
    val small = Seq((1L, "alpha beta " * 10)).toDF("doc_id", "text")
    val fpSmall = Dedup.simhash64(small, "text", "doc_id").collect()(0).getLong(1)
    assert(fpBig == fpSmall) // same token distribution -> same majority bits
    // beyond the packing bound the job must fail (assert_true guard or
    // ANSI sum overflow), never return a corrupt fingerprint
    val over = Seq((1L, "tok " * 2200000)).toDF("doc_id", "text")
    intercept[Exception] {
      Dedup.simhash64(over, "text", "doc_id").collect()
    }
  }

  test("prefix-filtered block jaccard is LOSSLESS vs the naive block all-pairs (sf0.01)") {
    val real = Tables.documents(spark, "/root/testdata/sf0.01")
    val blockCols = Seq("lang" -> col("lang"),
      "len_bucket" -> (col("n_chars") / 64).cast("long"))
    val fast = Dedup.ngramJaccardPairs(real, "text", "doc_id", blockCols,
        n = 2, threshold = 0.5)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect().toSet
    val sh = real.select(col("doc_id"), col("lang"),
      (col("n_chars") / 64).cast("long").as("lb"),
      Dedup.hashedShingles(col("text"), 2).as("s"))
    val l = sh.toDF("id1", "lang", "lb", "s1")
    val r = sh.toDF("id2", "lang", "lb", "s2")
    val naive = l.join(r, Seq("lang", "lb")).filter($"id1" < $"id2")
      .withColumn("jaccard", size(array_intersect($"s1", $"s2")).cast("double") /
        size(array_union($"s1", $"s2")))
      .filter($"jaccard" >= 0.5)
      .select($"id1", $"id2", round($"jaccard", 6).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(fast == naive, s"missed=${naive -- fast} spurious=${fast -- naive}")
  }

  test("density-gate fallback (minhash candidates) ≡ direct prefix path (sf0.01)") {
    // VERDICT r8 #2: forcing the per-doc candidate budget to 0 routes the
    // SAME corpus through the MinHash-banded fallback; the emitted pair
    // set must equal the lossless prefix path's (this corpus's real pairs
    // sit far above the J=0.5 threshold, where banding recall is ~1).
    val real = Tables.documents(spark, "/root/testdata/sf0.01")
    val blockCols = Seq("lang" -> col("lang"),
      "len_bucket" -> (col("n_chars") / 64).cast("long"))
    def run(budget: Int) =
      Dedup.ngramJaccardPairs(real, "text", "doc_id", blockCols,
          n = 2, threshold = 0.5, fallbackCandidatesPerDoc = budget)
        .select("id1", "id2", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
    val direct = run(Int.MaxValue)
    val fallback = run(0)
    assert(direct.nonEmpty, "vacuous fixture: no pairs at all")
    assert(fallback == direct,
      s"missed=${direct -- fallback} spurious=${fallback -- direct}")
  }

  test("containmentPairs (prefix-filtered) ≡ naive all-pairs containment (sf0.01)") {
    // VERDICT r8 #1: the rarest-(m+1)-shingles prefix filter is lossless
    // for the asymmetric threshold — verified against the literal
    // all-pairs definition on the real corpus.
    val real = Tables.documents(spark, "/root/testdata/sf0.01")
    val fast = Dedup.containmentPairs(real, "text", "doc_id",
        n = 3, thresholdPermille = 900)
      .select("contained_id", "container_id", "inter", "n_contained")
      .as[(Long, Long, Long, Long)].collect().toSet
    val sh = real.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("s"))
    val naive = sh.toDF("ida", "sa").join(sh.toDF("idb", "sb"),
        col("ida") =!= col("idb"))
      .select(col("ida"), col("idb"),
        size(array_intersect(col("sa"), col("sb"))).cast("long").as("inter"),
        size(col("sa")).cast("long").as("na"))
      .filter($"inter" * 10 >= $"na" * 9 && $"na" > 0)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(fast == naive, s"missed=${naive -- fast} spurious=${fast -- naive}")
  }

  test("containment density-gate fallback ≡ exact prefix path (sf0.01)") {
    val real = Tables.documents(spark, "/root/testdata/sf0.01")
    def run(budget: Int) =
      Dedup.containmentPairs(real, "text", "doc_id",
          n = 3, thresholdPermille = 900, fallbackCandidatesPerDoc = budget)
        .select("contained_id", "container_id", "inter", "n_contained")
        .as[(Long, Long, Long, Long)].collect().toSet
    val exact = run(Int.MaxValue)
    val fallback = run(0)
    assert(exact.nonEmpty, "vacuous fixture: no containment pairs")
    assert(fallback == exact,
      s"missed=${exact -- fallback} spurious=${fallback -- exact}")
  }

  test("containment fallback finds small-doc-inside-large-doc pairs (low Jaccard)") {
    // ADVICE r9: the old symmetric-Jaccard banding fallback missed exactly
    // these — a 12-word doc embedded verbatim in a 600-word doc has
    // containment 1.0 but Jaccard ~0.02, far below any banding S-curve.
    // The min-wise probe's recall is (1-C)^16-bounded regardless of the
    // size ratio, so with budget=0 (fallback forced) the pair MUST appear.
    val small = (0 until 12).map(j => s"needle$j").mkString(" ")
    val bigTail = (0 until 600).map(j => s"hay$j").mkString(" ")
    val docs = Seq(
      (1L, small),
      (2L, s"$small $bigTail"),
      (3L, bigTail)).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "text", "doc_id",
        n = 3, thresholdPermille = 900, fallbackCandidatesPerDoc = 0)
      .select("contained_id", "container_id")
      .as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)), s"small-in-large pair missed: $got")
    assert(!got.contains((2L, 1L)), "containment direction inverted")
  }

  test("adversarial single block: disjoint-content docs yield ZERO prefix candidates") {
    // 300 docs forced into one (lang, bucket) block but sharing no shingle:
    // the old full self-join paid 300*299/2 = 44850 verify pairs here; the
    // prefix filter's candidate join finds nothing to verify.
    val docs = (1 to 300).map(i =>
      (i.toLong, (0 until 12).map(j => s"w${i}x$j").mkString(" ")))
      .toDF("doc_id", "text")
    val sh = docs.select(col("doc_id"), lit("xx").as("lang"),
      sort_array(Dedup.hashedShingles(col("text"), 2)).as("__s"))
    assert(Dedup.ngramPrefixCandidates(sh, "doc_id", Seq("lang"), 0.5).count() == 0)
  }

  test("editDistancePairs length-bucket split is lossless vs the naive same-prefix join") {
    // Same 40-char prefix, tails spanning many length buckets: the bucketed
    // candidate join must reproduce the naive prefix-block result exactly
    // (pairs crossing more than one bucket can't pass maxDist anyway).
    val prefix = "shared license header padding to forty!!"
    assert(prefix.length == 40)
    val varied = (1 to 50).map(i =>
      (i.toLong, prefix + " " + ("body " * (i % 17)) + s"tail$i"))
      .toDF("doc_id", "text")
    val hardened = Dedup.editDistancePairs(varied, "text", "doc_id")
      .select("id1", "id2", "dist").as[(Long, Long, Int)].collect().toSet
    val n = varied.select($"doc_id",
      substring(Dedup.normalize($"text"), 1, 40).as("blk"),
      substring(Dedup.normalize($"text"), 1, 300).as("t"))
    val naive = n.as("a").join(n.as("b"),
        $"a.blk" === $"b.blk" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("id1"), $"b.doc_id".as("id2"),
        levenshtein($"a.t", $"b.t").as("dist"))
      .filter($"dist" <= 60)
      .as[(Long, Long, Int)].collect().toSet
    assert(hardened == naive,
      s"missing=${naive -- hardened} extra=${hardened -- naive}")
  }

  test("editDistancePairs boilerplate block: cap bounds the quadratic term and reports drops") {
    // 1000 docs sharing one 40-char license header and one length bucket —
    // the adversarial input that made pure prefix blocking quadratic
    // (999·1000/2 ≈ 500k DPs). With blockCap=64 the join may score at most
    // 64·63/2 pairs, and the observed metric must account for every
    // dropped doc.
    val license = "copyright (c) 2026 example corp rights."
    val docs = (1 to 1000).map(i =>
      (i.toLong, license + f" body body body doc$i%04d")).toDF("doc_id", "text")
    val pairs = Dedup.editDistancePairs(docs, "text", "doc_id", blockCap = 64)
    val out = pairs.collect()
    assert(out.length <= 64 * 63 / 2, s"quadratic blowup: ${out.length} pairs")
    assert(out.nonEmpty) // the kept block members really are near-dups
    val metrics = pairs.queryExecution.observedMetrics
    val dropped = metrics("editdist_block_cap").getAs[Long]("dropped_docs")
    assert(dropped == 1000L - 64L, s"dropped_docs=$dropped")
  }

  test("real documents: the known sf0.01 near-dup pairs surface through minhash LSH") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.8)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((285L, 301L)), s"expected (285,301) in $pairs")
    assert(pairs.contains((98L, 290L)))
    assert(pairs.contains((70L, 447L)))
  }

  test("nearDupSurvivorsBy keeps the priority argmax per cluster, id on ties") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, 5L), (2L, 9L), (3L, 7L), // cluster {1,2,3}: 2 wins on priority
      (4L, 4L), (5L, 4L),           // cluster {4,5}: tie -> lower id 4
      (6L, 1L)                      // unpaired: always survives
    ).toDF("doc_id", "pr")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val kept = Dedup.nearDupSurvivorsBy(docs, pairs, "doc_id", col("pr"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 6L), kept)
    // degenerate: no pairs -> identity
    val none = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Dedup.nearDupSurvivorsBy(docs, none, "doc_id", col("pr"))
      .count() == 6L)
  }

  test("contaminationScore: graded overlap, consistent with the boolean gate") {
    val train = Seq(
      (1L, "a b c d e f"),          // grams {abcde, bcdef}: 1 hit -> 0.5
      (2L, "x y z w v u"),          // no hits -> 0.0
      (3L, "a b c d e x y z w v"),  // 6 grams, 1 hit -> 1/6
      (4L, "tiny")                  // shorter than n -> 0.0
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "a b c d e")).toDF("doc_id", "text")
    val scored = Dedup.contaminationScore(train, eval, "text", "doc_id", n = 5)
      .select("doc_id", "contamination").as[(Long, Double)].collect().toMap
    assert(scored == Map(1L -> 0.5, 2L -> 0.0, 3L -> 1.0 / 6, 4L -> 0.0))
    // zero score must coincide exactly with surviving the boolean gate
    val survivors = Dedup.decontaminate(train, eval, "text", "doc_id", n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(scored.filter(_._2 == 0.0).keySet == survivors)
  }

  test("incremental verdicts: batch checked against corpus only, never against itself") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "totally different corpus text about distributed shuffles")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // near-dup of corpus doc 1 (one trailing token differs)
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      // exact dup of corpus doc 1
      (11L, "alpha beta  GAMMA delta epsilon zeta eta theta iota kappa"),
      // duplicates doc 12 WITHIN the batch but nothing in the corpus:
      // must NOT be flagged (intra-batch dup is the indexer's later pass)
      (12L, "fresh unseen content shared by two batch members only"),
      (13L, "fresh unseen content shared by two batch members only")
    ).toDF("doc_id", "text")
    val v = Dedup.incrementalVerdicts(corpus, batch, "text", "doc_id",
        k = 64, bands = 16, shingleN = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]))).toList.sortBy(_._1)
    assert(v == List((10L, true, Some(1L)), (11L, true, Some(1L)),
      (12L, false, None), (13L, false, None)))
  }

  test("star edges bound an m-clique to m-1 edges where pairwise banding emits m(m-1)/2") {
    // The hot-bucket guard: 200 exact copies of one text + 50 distinct
    // docs. Pairwise band candidates blow up quadratically in the clique
    // (19 900 pairs); star edges stay linear AND keep the clique
    // connected through its anchor — same connected components.
    import spark.implicits._
    val m = 200
    val clique = (0 until m).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again and again"))
    val rest = (0 until 50).map(i =>
      (1000L + i, s"unique document body number $i with words nothing shares ${i * 7}"))
    val df = (clique ++ rest).toDF("doc_id", "text")
    val sig = Dedup.minhashSignature(df, "text", "doc_id", k = 16, shingleN = 3)
    val star = Dedup.minhashStarEdges(sig, "doc_id", k = 16, bands = 8)
    val pairwise = Dedup.minhashCandidates(sig, "doc_id", k = 16, bands = 8)
    val starN = star.count()
    val pairN = pairwise.count()
    assert(pairN >= m.toLong * (m - 1) / 2,
      s"expected the quadratic clique blow-up, got $pairN")
    assert(starN <= 8L * (m + 50),
      s"star edges must be <= bands*n, got $starN")
    // the clique stays one component: every member reaches the anchor
    val comp = graft.ops.Components.connectedComponents(
      star.select(col("id1"), col("id2")), "id1", "id2")
    assert(comp.filter(col("comp") === 0L).count() == m.toLong,
      "clique not connected through its anchor")
  }
}
