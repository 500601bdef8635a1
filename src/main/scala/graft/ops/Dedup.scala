package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines: exact,
  * MinHash+LSH, SimHash, and n-gram-Jaccard variants, all as declarative
  * DataFrame transforms (no UDFs — every hash is `xxhash64`, every set op a
  * higher-order array function, so the whole family stays in codegen).
  *
  * Scale design (the point of each variant at 100 TB):
  *  - exact: one hash-partitioned groupBy on a 64-bit text hash — the
  *    shuffle carries (hash, id), never the text.
  *  - MinHash/LSH: signatures shrink each doc to k longs (one shuffle of
  *    k×8 bytes/doc); banding turns the O(n²) pair search into equality
  *    joins on (band, bucket-hash) — only docs sharing a band bucket meet.
  *  - SimHash: one 64-bit fingerprint per doc; near-dup = small Hamming
  *    distance; banding the 64 bits into 16-bit chunks gives the same
  *    equality-join candidate generation.
  *  - n-gram Jaccard: the exact verifier run AFTER candidate generation,
  *    never as the generator.
  */
object Dedup {

  /** Session shuffle width, for PINNED pre-explode repartitions. The
    * keyed `repartition(col)` form (no explicit count) lets AQE size the
    * exchange by its INPUT bytes — but every consumer here explodes each
    * document into ~30–1000 shingle/token rows right after, a multiplier
    * byte-based coalescing cannot see, so small corpora collapsed to ONE
    * post-shuffle partition and the whole shingle stage ran on one core
    * (measured r16: curation_funnel carried two ~3 s single-task Generate
    * stages). An explicit count disables AQE coalescing for exactly this
    * exchange and still scales with deployment config (it reads
    * `spark.sql.shuffle.partitions`, never a constant). Ops-side twin of
    * `QueryShared.shuffleWidth` (which query files use) — kept separate
    * only because `ops` must not depend on the query-trait layer; update
    * BOTH doc comments together (ADVICE r16 #1). */
  private def shuffleWidth(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Canonical text form: lower-cased, whitespace collapsed, then trimmed.
    * Collapse MUST run before trim: Spark's `trim` strips only 0x20 spaces,
    * so trim-then-collapse leaves a leading/trailing space when the raw text
    * starts or ends with a tab/newline (collapse turns it into ' ' after
    * trim already ran). Collapse-first reduces every whitespace run to a
    * plain space that trim can then remove — and matches the DuckDB oracles,
    * which all spell `trim(regexp_replace(lower(text), '\s+', ' ', 'g'))`. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalize(text), " ")

  /** Token n-tuples as an array of structs: n shifted copies of the token
    * array zipped together — O(n) array slices total instead of one slice
    * per shingle position (the naive per-index form is quadratic in
    * document length and dominated the dedup benchmarks). Entries whose
    * last field is null (the ragged tail) are dropped, leaving exactly
    * size-n+1 shingle positions.
    */
  private def shingleStructs(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val shifted = (0 until n).map(i => slice(toks, lit(i + 1), size(toks)).as(s"t$i"))
    filter(arrays_zip(shifted: _*), s => s.getField(s"t${n - 1}").isNotNull)
  }

  /** Word n-gram shingles as an array of strings (distinct). */
  def shingles(text: Column, n: Int): Column =
    array_distinct(transform(shingleStructs(text, n),
      s => concat_ws(" ", (0 until n).map(i => s.getField(s"t$i")): _*)))

  /** Shingles pre-hashed to 64-bit longs: set operations (intersect/union,
    * min-hash) on longs are several times cheaper than on strings, and
    * Jaccard only depends on element counts, so an injective-in-practice
    * hash changes nothing (collision odds ~ n²/2⁶⁴ per document).
    */
  def hashedShingles(text: Column, n: Int): Column =
    array_distinct(transform(shingleStructs(text, n),
      s => xxhash64((0 until n).map(i => s.getField(s"t$i")): _*)))

  // ---- exact ------------------------------------------------------------

  /** Exact dedup: group by the normalized-text hash, keep the smallest id
    * per group. Returns the surviving rows. The shuffle key is the 64-bit
    * hash, so text bytes never cross the wire twice.
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val keep = df
      .groupBy(xxhash64(normalize(col(textCol))).as("__th"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__th")
    df.join(keep, Seq(idCol), "left_semi")
  }

  // ---- MinHash + LSH ----------------------------------------------------

  /** k-permutation MinHash signature: `sig[i] = min over shingles of
    * xxhash64(i, shingle)` — k independent hash families via the seed
    * column, one aggregation, no explode materialized beyond the shuffle.
    * Output: idCol + sig_0..sig_{k-1}.
    */
  def minhashSignature(df: DataFrame, textCol: String, idCol: String,
      k: Int = 64, shingleN: Int = 3): DataFrame = {
    // hash each shingle to a long ONCE, then derive the k families in a
    // single array traversal via the native codegen
    // [[graft.functions.MinHashSigs]] expression (round 9) — bit-equal to
    // the original explode + k-aggregate form (MinHashSigsSpec pins it)
    // but with NO shuffle at all: the per-document minima never needed to
    // leave their row. The repartition stays for scan-split parallelism
    // only (a single small parquet file is one split; without it the
    // whole corpus shingles on one core).
    df.select(col(idCol), col(textCol))
      .repartition(shuffleWidth(df), col(idCol))
      .select(col(idCol),
        graft.functions.minhashSigs(
          hashedShingles(col(textCol), shingleN), k).as("__sig"))
      .filter(col("__sig").isNotNull) // shingle-less docs: absent, as before
      .select(col(idCol) +:
        (0 until k).map(i => col("__sig").getItem(i).as(s"sig_$i")): _*)
  }

  /** LSH banding: hash each band of r consecutive signature components to a
    * bucket; docs sharing any (band, bucket) become candidate pairs
    * (id1 < id2). Equality join per band — never a cross join. The bucket
    * frame is cached: it feeds both sides of the self-join, and without
    * the cache the whole signature aggregation would run twice.
    */
  def minhashCandidates(sig: DataFrame, idCol: String,
      k: Int = 64, bands: Int = 16): DataFrame = {
    val r = k / bands
    val bandHashes = (0 until bands).map { b =>
      xxhash64((b * r until (b + 1) * r).map(i => col(s"sig_$i")): _*)
    }
    val buckets = sig.select(col(idCol),
      posexplode(array(bandHashes: _*)).as(Seq("band", "bucket")))
      .cache()
    val left = buckets.select(col(idCol).as("id1"), col("band"), col("bucket"))
    val right = buckets.select(col(idCol).as("id2"), col("band"), col("bucket"))
    left.join(right, Seq("band", "bucket"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** STAR candidate edges — the bounded-candidate-mass variant of
    * [[minhashCandidates]] for hot buckets. The pairwise band join emits
    * m(m−1)/2 candidates from a bucket holding m docs: a viral document
    * duplicated 10M times at corpus scale turns ONE bucket into 10¹⁴
    * pairs. Here every bucket instead contributes edges from its
    * MINIMUM-id member (the anchor) to each other member — ≤ bands·n
    * edges TOTAL regardless of clique sizes, while an m-clique stays
    * connected through its anchor (the RefinedWeb/SlimPajama-style
    * union-find edge set: cluster structure is what dedup needs, not the
    * full pair list). The anchor window is a plain per-bucket min — one
    * exchange on (band, bucket), no sort.
    */
  def minhashStarEdges(sig: DataFrame, idCol: String,
      k: Int = 16, bands: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val r = k / bands
    val bandHashes = (0 until bands).map { b =>
      xxhash64((b * r until (b + 1) * r).map(i => col(s"sig_$i")): _*)
    }
    val buckets = sig.select(col(idCol),
      posexplode(array(bandHashes: _*)).as(Seq("band", "bucket")))
    buckets
      .withColumn("__anchor",
        min(col(idCol)).over(Window.partitionBy("band", "bucket")))
      .filter(col(idCol) =!= col("__anchor"))
      .select(col("__anchor").as("id1"), col(idCol).as("id2"))
      .distinct()
  }

  /** Star edges verified by EXACT n-gram Jaccard — the one-shingling-pass
    * composition of [[minhashStarEdges]], mirroring [[minhashExactPairs]].
    */
  def minhashStarExactEdges(df: DataFrame, textCol: String, idCol: String,
      k: Int = 16, bands: Int = 8, shingleN: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val sh = df.select(col(idCol), col(textCol))
      .repartition(shuffleWidth(df), col(idCol))
      .select(col(idCol), hashedShingles(col(textCol), shingleN).as("__s"))
      .cache()
    val sig = sh
      .select(col(idCol),
        graft.functions.minhashSigs(col("__s"), k).as("__sig"))
      .filter(col("__sig").isNotNull)
      .select(col(idCol) +:
        (0 until k).map(i => col("__sig").getItem(i).as(s"sig_$i")): _*)
    val cand = minhashStarEdges(sig, idCol, k, bands)
    val l = sh.select(col(idCol).as("id1"), col("__s").as("s1"))
    val r = sh.select(col(idCol).as("id2"), col("__s").as("s2"))
    cand.join(l, "id1").join(r, "id2")
      .withColumn("jaccard",
        size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Estimated Jaccard from two signatures: fraction of equal components. */
  private def sigSimilarity(k: Int): Column = {
    val eq = (0 until k).map(i =>
      when(col(s"l_sig_$i") === col(s"r_sig_$i"), 1).otherwise(0))
    eq.reduce(_ + _).cast("double") / k
  }

  /** Full MinHash dedup: signature → banded candidates → signature-verified
    * pairs with estimated Jaccard >= threshold.
    */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 64, bands: Int = 16, shingleN: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val sig = minhashSignature(df, textCol, idCol, k, shingleN).cache()
    val cand = minhashCandidates(sig, idCol, k, bands)
    val l = sig.toDF(sig.columns.toIndexedSeq.map(c => if (c == idCol) "id1" else s"l_$c"): _*)
    val r = sig.toDF(sig.columns.toIndexedSeq.map(c => if (c == idCol) "id2" else s"r_$c"): _*)
    cand.join(l, "id1").join(r, "id2")
      .withColumn("est_jaccard", sigSimilarity(k))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("est_jaccard"), 6).as("est_jaccard"))
  }

  /** MinHash candidates verified by EXACT n-gram Jaccard, computing the
    * hashed shingle sets exactly once: the cached (id, shingles) frame
    * feeds the signature aggregation (via explode) AND both sides of the
    * pair verification — one text scan and one shingling pass total,
    * where composing [[minhashSignature]] + [[ngramJaccard]] would shingle
    * the corpus twice from raw text. Output: (id1, id2, jaccard ≥ t).
    */
  def minhashExactPairs(df: DataFrame, textCol: String, idCol: String,
      k: Int = 16, bands: Int = 8, shingleN: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val sh = df.select(col(idCol), col(textCol))
      .repartition(shuffleWidth(df), col(idCol)) // scan-split parallelism (see minhashSignature)
      .select(col(idCol), hashedShingles(col(textCol), shingleN).as("__s"))
      .cache()
    // one-pass native signatures off the cached arrays — zero shuffle
    // (round 9; bit-equal to the explode+agg form, MinHashSigsSpec)
    val sig = sh
      .select(col(idCol),
        graft.functions.minhashSigs(col("__s"), k).as("__sig"))
      .filter(col("__sig").isNotNull)
      .select(col(idCol) +:
        (0 until k).map(i => col("__sig").getItem(i).as(s"sig_$i")): _*)
    val cand = minhashCandidates(sig, idCol, k, bands)
    val l = sh.select(col(idCol).as("id1"), col("__s").as("s1"))
    val r = sh.select(col(idCol).as("id2"), col("__s").as("s2"))
    cand.join(l, "id1").join(r, "id2")
      .withColumn("jaccard",
        size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Near-duplicate SURVIVOR selection: duplicates overlap transitively
    * (A≈B, B≈C ⇒ one cluster), so keep exactly the minimum id of every
    * connected component of the pair graph; unpaired documents all
    * survive. The anti-join drops only component non-minima.
    */
  def nearDupSurvivors(df: DataFrame, pairs: DataFrame,
      idCol: String): DataFrame = {
    val comp = Components.connectedComponents(pairs, "id1", "id2")
    val losers = comp.filter(col("comp") =!= col("v"))
      .select(col("v").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Near-dup survivor selection by PRIORITY: within each connected
    * component of the pair graph keep the member maximizing
    * (priority, then lowest id on ties) — "keep the best copy", the
    * production refinement of [[nearDupSurvivors]]'s keep-the-first: when
    * a page is crawled five times, the longest / highest-quality capture
    * should represent the cluster, not the one with the smallest id.
    * Unpaired documents all survive, as before.
    *
    * Cost over the id-min rule: one extra broadcast-sized join to attach
    * priorities to component members and one component-keyed argmax
    * (`max_by` — partial aggregation applies); the component labels are
    * the same min-label propagation, so the asymptotics don't move.
    */
  def nearDupSurvivorsBy(df: DataFrame, pairs: DataFrame, idCol: String,
      priority: Column): DataFrame = {
    val comp = Components.connectedComponents(pairs, "id1", "id2")
    val members = comp.join(
      df.select(col(idCol).as("v"), priority.as("__p")), "v")
    val keep = members.groupBy(col("comp"))
      .agg(max_by(col("v"), struct(col("__p"), -col("v"))).as(idCol))
      .select(col(idCol))
    val losers = members.select(col("v").as(idCol))
      .join(keep, Seq(idCol), "left_anti")
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** INCREMENTAL dedup — the steady-state shape of a production corpus
    * pipeline: the indexed corpus is already deduplicated, and each new
    * crawl batch must be checked against it (and only it) before
    * ingestion. Asymmetric MinHash: both sides shingle and sign once, the
    * band join is batch-buckets × corpus-buckets (batch-sized build side —
    * broadcast-able when a day's crawl is small relative to the index),
    * candidates are exact-Jaccard verified, and every NEW document gets a
    * verdict row: `dup` + its best corpus match by (jaccard desc, id).
    *
    * At 100 TB the corpus side's signatures/buckets are computed once and
    * PERSISTED (they are insertion-stable), so the per-batch cost is
    * shingling the batch + one bucket join + |candidates| verifications —
    * never a corpus rescan; this method recomputes them only because it
    * takes bare DataFrames. Verification joins text back by id, so only
    * candidate ids cross the shuffle.
    */
  def incrementalVerdicts(corpus: DataFrame, batch: DataFrame,
      textCol: String, idCol: String, k: Int = 16, bands: Int = 8,
      shingleN: Int = 3, threshold: Double = 0.8): DataFrame = {
    def shingled(df: DataFrame) = df.select(col(idCol), col(textCol))
      .repartition(shuffleWidth(df), col(idCol)) // see minhashSignature: replaces the agg shuffle
      .select(col(idCol), hashedShingles(col(textCol), shingleN).as("__s"))
      .cache()
    def sigOf(sh: DataFrame) = {
      val exploded = sh.select(col(idCol), explode(col("__s")).as("__sh"))
      exploded.groupBy(col(idCol)).agg(
        min(xxhash64(lit(0), col("__sh"))).as("sig_0"),
        (1 until k).map(i =>
          min(xxhash64(lit(i), col("__sh"))).as(s"sig_$i")): _*)
    }
    def bucketsOf(sig: DataFrame, outId: String) = {
      val r = k / bands
      val bandHashes = (0 until bands).map { b =>
        xxhash64((b * r until (b + 1) * r).map(i => col(s"sig_$i")): _*)
      }
      sig.select(col(idCol).as(outId),
        posexplode(array(bandHashes: _*)).as(Seq("band", "bucket")))
    }
    val cSh = shingled(corpus)
    val bSh = shingled(batch)
    val cand = bucketsOf(sigOf(bSh), "__new_id")
      .join(bucketsOf(sigOf(cSh), "__corpus_id"), Seq("band", "bucket"))
      .select("__new_id", "__corpus_id").distinct()
    val verified = cand
      .join(bSh.select(col(idCol).as("__new_id"), col("__s").as("s1")),
        "__new_id")
      .join(cSh.select(col(idCol).as("__corpus_id"), col("__s").as("s2")),
        "__corpus_id")
      .withColumn("__j",
        size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2"))))
      .filter(col("__j") >= threshold)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__new_id"))
      .orderBy(desc("__j"), col("__corpus_id"))
    val best = verified
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .select(col("__new_id").as(idCol), col("__corpus_id").as("match_id"),
        round(col("__j"), 6).as("jaccard"))
    batch.select(col(idCol)).join(best, Seq(idCol), "left")
      .select(col(idCol), col("match_id").isNotNull.as("dup"),
        col("match_id"), col("jaccard"))
  }

  /** Benchmark DECONTAMINATION — the n-gram overlap rule the GPT-3 /
    * Llama corpus pipelines apply before training: drop every training
    * document that shares ANY word n-gram with the evaluation corpus.
    * One shuffle join on the 64-bit gram hash (never gram text), one
    * distinct, one anti-join; eval-set grams are typically a
    * broadcast-sized side at real scale (eval corpora are small), in
    * which case Catalyst broadcasts them and the scan is map-side.
    */
  def decontaminate(train: DataFrame, evalSet: DataFrame, textCol: String,
      idCol: String, n: Int = 8): DataFrame = {
    val evalGrams = evalSet
      .select(explode(hashedShingles(col(textCol), n)).as("__g"))
      .distinct()
    val contaminated = train
      .select(col(idCol), col(textCol))
      .repartition(shuffleWidth(train), col(idCol)) // parallelize shingling (see minhashSignature)
      .select(col(idCol), explode(hashedShingles(col(textCol), n)).as("__g"))
      // eval sets are benchmarks — small by construction (the
      // contaminationScore scaladoc's argument) — so the gram probe is a
      // map-side broadcast join: the training-side gram explode never
      // shuffles, only the matching doc ids do.
      .join(broadcast(evalGrams), "__g")
      .select(idCol).distinct()
    train.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Per-document contamination SCORE — the graded companion to
    * [[decontaminate]]'s boolean gate: the fraction of the document's
    * DISTINCT n-grams that appear anywhere in the eval set (the GPT-3
    * appendix-C overlap metric; Brown et al. 2020 report per-benchmark
    * "dirtiness" this way before deciding what to drop). 0.0 for
    * documents too short to have an n-gram. Same machinery as the gate:
    * grams are 64-bit hashes (never strings) and the eval gram set —
    * benchmark-sized, thousands of grams — broadcasts to the probe side,
    * so the cost is one scan of the training corpus plus a doc-id
    * aggregation; collision odds are the same negligible
    * (docGrams·evalGrams)/2⁶⁴ the gate already accepts.
    */
  def contaminationScore(train: DataFrame, evalSet: DataFrame,
      textCol: String, idCol: String, n: Int = 8,
      outCol: String = "contamination"): DataFrame = {
    val evalGrams = evalSet
      .select(explode(hashedShingles(col(textCol), n)).as("__g"))
      .distinct()
    val scored = train
      .select(col(idCol), col(textCol))
      .repartition(shuffleWidth(train), col(idCol)) // parallelize shingling (see minhashSignature)
      .select(col(idCol), explode(hashedShingles(col(textCol), n)).as("__g"))
      .join(broadcast(evalGrams.withColumn("__hit", lit(1))),
        Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg((sum(coalesce(col("__hit"), lit(0))).cast("double") /
        count(lit(1))).as(outCol))
    train.join(scored, Seq(idCol), "left")
      .withColumn(outCol, coalesce(col(outCol), lit(0.0)))
  }

  /** Fuzzy (edit-distance) near-dup pairs with prefix blocking: documents
    * sharing the same normalized `prefixLen`-char prefix are candidates;
    * each pair is scored by Levenshtein distance over the first `maxLen`
    * normalized chars and kept under `maxDist`. Edit distance is the
    * verifier fuzzy dedup pipelines reach for when token-set Jaccard is
    * too coarse (small in-place edits).
    *
    * Scale hardening (real corpora are full of shared boilerplate —
    * licenses, templates, scraped headers — so "same prefix" alone is a
    * skew bomb):
    *  - the block key is `xxhash64(prefix)`: an 8-byte shuffle key instead
    *    of a `prefixLen`-char string.
    *  - blocks are split by truncated-text LENGTH bucket (width ≥
    *    `maxDist`), matching same-or-adjacent buckets. This is LOSSLESS:
    *    `levenshtein(a,b) ≥ |len(a)−len(b)|`, so a pair further than one
    *    bucket apart can never pass the `maxDist` filter anyway — the
    *    bucket split only removes pairs the distance filter would drop.
    *  - each (prefix, length-bucket) block is capped at `blockCap` docs
    *    (deterministically by id order); a boilerplate block of B docs
    *    costs at most `blockCap²` DPs instead of B². Dropped-doc counts
    *    surface through the `editdist_block_cap` observed metric
    *    (`dropped_docs` in `QueryExecution.observedMetrics`) so a capped
    *    run is visible, never silent.
    *  - the DP itself uses the thresholded `levenshtein(l, r, max)` form,
    *    which abandons a pair as soon as the distance provably exceeds
    *    `maxDist` — O(maxDist·maxLen) per pair, not O(maxLen²) — and a
    *    free `|Δlen| ≤ maxDist` pre-filter runs before any DP.
    *
    * Exact integer output — oracle-identical in any engine with a
    * Levenshtein builtin (the bucket split and the threshold change no
    * surviving pair; the cap is inert below `blockCap` docs per block).
    * One caveat on the hashed block key: a 64-bit collision between two
    * DIFFERENT prefixes merges their blocks, which can only ADD candidate
    * pairs relative to string-prefix blocking (never drop any — the added
    * pairs still face the distance filter, and survive it only if they are
    * genuine near-duplicates that prefix blocking would have missed). So
    * "oracle-identical vs a string-blocked oracle" holds modulo a
    * ~n²/2⁶⁴ collision probability; the driver oracle passes at both test
    * SFs, and an exactness-critical caller can block on the prefix string
    * itself at the cost of a wider shuffle key.
    */
  def editDistancePairs(df: DataFrame, textCol: String, idCol: String,
      prefixLen: Int = 40, maxLen: Int = 300, maxDist: Int = 60,
      blockCap: Int = 256): DataFrame = {
    val bucketW = math.max(maxDist, 1)
    val norm = df.select(col(idCol),
      xxhash64(substring(normalize(col(textCol)), 1, prefixLen)).as("__blk"),
      substring(normalize(col(textCol)), 1, maxLen).as("__t"))
      .withColumn("__len", length(col("__t")))
      .withColumn("__lb", floor(col("__len") / bucketW))
    val capped = norm.withColumn("__rn",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("__blk", "__lb").orderBy(idCol)))
    // observe on the LEFT branch only — a metric node reused under both
    // sides of the self-join would register the same name twice.
    val leftKept = capped
      .observe("editdist_block_cap",
        sum(when(col("__rn") > blockCap, 1L).otherwise(0L)).as("dropped_docs"))
      .filter(col("__rn") <= blockCap)
    val l = leftKept.select(col(idCol).as("id1"), col("__blk"),
      col("__lb"), col("__len").as("len1"), col("__t").as("t1"))
    // Replicate the right side into its own and both neighbor buckets:
    // a pair lands in the join exactly once (each left row has ONE __lb),
    // and every pair within one bucket-width of length difference meets.
    val r = capped.filter(col("__rn") <= blockCap)
      .select(col(idCol).as("id2"), col("__blk"),
        explode(array(col("__lb") - 1, col("__lb"), col("__lb") + 1)).as("__lb"),
        col("__len").as("len2"), col("__t").as("t2"))
    // The distance filter must be ONE levenshtein conjunct, ordered last.
    // Catalyst pushes every post-join predicate into the hash-join
    // CONDITION, where there is no subexpression elimination: the previous
    // `dist >= 0 && dist <= maxDist` form compiled to TWO levenshtein
    // calls per hash-matched pair, evaluated before the `id1 < id2` prune
    // — measured 7× the whole operator's runtime at sf0.1. The threshold
    // form returns -1 whenever the distance exceeds `maxDist`, so a single
    // `>= 0` is the complete filter; the surviving ~candidate-count rows
    // pay one more evaluation in the output projection.
    l.join(r, Seq("__blk", "__lb"))
      .filter(col("id1") < col("id2") &&
        abs(col("len1") - col("len2")) <= maxDist &&
        levenshtein(col("t1"), col("t2"), maxDist) >= 0)
      .withColumn("dist", levenshtein(col("t1"), col("t2"), maxDist))
      .select("id1", "id2", "dist")
  }

  // ---- SimHash ----------------------------------------------------------

  /** Oracle-portable 64-bit string hash: the little-endian u64 of the
    * FIRST 8 md5 digest bytes, as a signed long — bit-for-bit the value
    * DuckDB's `md5_number_upper(s)` returns (verified against DuckDB 1.0:
    * md5('abc') = 900150983cd24fb0…, LE-u64 of bytes 90 01 50 98 3c d2 4f
    * b0 = 12704604231530709392 = md5_number_upper('abc')). Lets a
    * hash-dependent result (e.g. a SimHash fingerprint or Hamming
    * distance) be reproduced exactly by a DuckDB oracle; ~2× the cost of
    * `xxhash64`, so scale paths keep xxhash64 as the default and take this
    * only for oracle parity.
    *
    * Built from the hex form: byte-reverse the first 8 digest bytes (hex
    * pairs 8..1), then one signed base-16 parse — `conv(_, 16, -10)`
    * interprets the 64-bit pattern as two's-complement, exactly the
    * reinterpretation DuckDB's UBIGINT→bit-twiddling sees.
    */
  def md5Hash64(c: Column): Column = {
    val hex = md5(c)
    val le = concat((7 to 0 by -1).map(i => substring(hex, 2 * i + 1, 2)): _*)
    conv(le, 16, -10).cast("long")
  }

  /** 64-bit frequency-weighted SimHash fingerprint: bit b of the output is
    * 1 iff the sum over token OCCURRENCES of ±1 (sign of bit b of
    * tokenHash(token)) is positive. Weighting by occurrence (no distinct)
    * matters: on a small shared vocabulary, distinct-token sets are nearly
    * identical across documents and unweighted SimHash stops
    * discriminating. Pure expression pipeline: explode → 64 conditional
    * sums → bit reassembly.
    *
    * `tokenHash` is any 64-bit uniform hash; the default `xxhash64` is the
    * cheapest codegen'd choice, [[md5Hash64]] the oracle-portable one
    * (DuckDB can reproduce it, so the driver hash-checks the pair output).
    */
  def simhash64(df: DataFrame, textCol: String, idCol: String,
      tokenHash: Column => Column = xxhash64(_)): DataFrame = {
    // Bit-count form: bit b is set iff 2·count(bit b of token hash set) >
    // n_tokens — algebraically identical to the ±1-sum formulation
    // (sum(±1) = 2·cnt − n), but countable branchlessly. Three 21-bit
    // counters are packed per 64-bit sum lane, so the aggregate holds 22
    // buffers instead of 64 branchy conditional sums — the generated
    // update code (the dominant cost: whole-stage-codegen compilation) is
    // ~3× smaller. Bound analysis: each counter <= n, so a lane's value is
    // at most (2²¹−1)·(2⁴²+2²¹+1) = 2⁶³−1 — exactly Long.MaxValue, and
    // partial sums are monotone, so documents up to 2²¹−1 (~2 M) token
    // occurrences (~12 MB of text) can neither carry between fields nor
    // overflow the signed sum. (The previous 4×16-bit packing overflowed
    // the SIGNED long at 2¹⁵ occurrences — within range of a ~200 KB
    // web document.)
    // pre-shuffle on the aggregation key (see minhashSignature): replaces
    // the groupBy exchange, parallelizes the tokenize+hash explode.
    // (A shuffle-free per-row variant — folding the lane sums with
    // `aggregate` over the token-hash array — was measured 3.5× SLOWER:
    // higher-order functions evaluate interpreted, outside whole-stage
    // codegen, so 22 folds × tokens beat the codegen'd explode+sum only
    // on paper. Don't retry it.)
    //
    // Occurrences collapse to (doc, DISTINCT token, count) BEFORE hashing:
    // real corpora are zipfian, so distinct tokens per document run far
    // below occurrences (~6× on the test corpus), and the token hash +
    // 64-bit lane extraction then run once per distinct token, weighted by
    // `__c` in the lane sums — algebraically identical to per-occurrence
    // summing. Both aggregations sit on the same repartition(id) exchange
    // (HashPartitioning(id) satisfies the (id, token) clustering), so the
    // collapse adds NO shuffle — measured ~25% off the whole operator with
    // the cheap xxhash64, more with md5Hash64.
    val tok = df.select(col(idCol), col(textCol))
      .repartition(shuffleWidth(df), col(idCol))
      .select(col(idCol), explode(tokens(col(textCol))).as("__t"))
      .groupBy(col(idCol), col("__t"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__h", tokenHash(col("__t")))
    // lane L packs bits 3L..3L+2 of the token hash, 21 bits/field; the
    // per-field bound is unchanged by the count weighting (each field sums
    // occurrence counts to <= n, exactly as the per-occurrence form did)
    val nLanes = (64 + 2) / 3 // 22; the last lane holds bit 63 alone
    val lanes = (0 until nLanes).map { l =>
      sum(col("__c") * (0 until math.min(3, 64 - 3 * l)).map { j =>
        shiftleft(shiftright(col("__h"), 3 * l + j).bitwiseAND(1), 21 * j)
      }.reduce(_ bitwiseOR _)).as(s"lane_$l")
    }
    val sums = tok.groupBy(col(idCol))
      .agg(sum(col("__c")).as("__n"), lanes: _*)
    val fp = (0 until 64).map { b =>
      val cnt = shiftright(col(s"lane_${b / 3}"), 21 * (b % 3)).bitwiseAND(0x1FFFFFL)
      when(cnt * 2 > col("__n"), shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce((a, c) => a.bitwiseOR(c))
    // The packed-lane bound is enforced, not just commented: beyond 2²¹−1
    // token occurrences a counter could exceed its field and corrupt the
    // fingerprint silently. assert_true costs one comparison per document
    // and fails the job loudly instead (ADVICE r2).
    sums.select(col(idCol),
      when(assert_true(col("__n") < (1L << 21),
        lit("simhash64: document has >=2^21 token occurrences; " +
          "packed 21-bit lane counters would overflow")).isNull,
        fp).as("simhash"))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs, COMPLETE within `maxDistance` by construction
    * (asserted against brute-force all-pairs in DedupSpec): split the 64
    * fingerprint bits into `b` near-equal blocks and index every
    * combination of `q = b - maxDistance` blocks. A pair within Hamming
    * distance d flips bits in at most d blocks, leaving >= b - d >= q
    * blocks untouched — so at least one q-subset of blocks matches exactly
    * (pigeonhole on block combinations; the multi-table scheme of Manku et
    * al., "Detecting Near-Duplicates for Web Crawling", WWW'07). Candidates
    * are verified by exact Hamming distance, so the banding only ever
    * affects completeness — which the combination count guarantees — never
    * precision.
    *
    * Block-count choice: for small d, q = 1 with b = d+1 blocks keeps keys
    * wide (64/b bits). At larger d single blocks get too narrow — d = 8
    * with q = 1 means 7-bit keys and ~n²/2⁷ random bucket collisions — so
    * q = 2 with b = d+2 is the starting point: C(b,2) keys, each carrying
    * 2·64/b ≈ 13 bits of selectivity. The banding runs over DISTINCT
    * fingerprints (duplicate cliques collapse before the join) and the
    * depth q is ADAPTIVE (see [[fingerprintHammingPairs]]): measured
    * candidate mass above the per-fingerprint budget upgrades to
    * q = 3, 4 — more tables, exponentially more selective keys — the
    * corpus-growth knob that keeps the banded self-join linear where a
    * fixed q is quadratic.
    */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxDistance: Int = 3,
      tokenHash: Column => Column = xxhash64(_)): DataFrame =
    fingerprintHammingPairs(simhash64(df, textCol, idCol, tokenHash),
      idCol, "simhash", maxDistance)

  /** Banded Hamming-pair search over ANY precomputed 64-bit fingerprint
    * column (SimHash, perceptual image hashes, audio fingerprints, …):
    * the combination-banding scheme documented on [[simhashPairs]],
    * factored out so non-text fingerprints reuse the same
    * completeness-guaranteed candidate generation. Emits
    * (id1, id2, distance), id1 < id2, distance <= maxDistance.
    *
    * CANONICALIZE-THEN-BAND: the banded self-join runs over DISTINCT
    * fingerprint values, not documents. Duplicate cliques — the hot-key
    * hazard of every real corpus (viral text ⇒ thousands of docs with
    * the SAME simhash, colliding in every table at every depth) —
    * collapse to one representative before any join, so clique size
    * never multiplies bucket mass. Doc-level pairs come back from two
    * output-bound equality joins on the fingerprint value: cross-group
    * pairs via the verified fingerprint pairs, intra-group (distance 0)
    * pairs via a self-join of identical fingerprints. Candidate rows
    * carry both fingerprint VALUES (the value is its own key), so exact
    * Hamming verification is a row-local bit_count — no re-attach join.
    *
    * ADAPTIVE COMBINATION DEPTH (the Manku WWW'07 multi-table schema as a
    * corpus-growth knob, priced like [[ngramJaccardPairs]]'s density
    * gate): any q with b = d + q blocks is COMPLETE — d flipped bits
    * touch ≤ d blocks, leaving ≥ q untouched, so some q-subset key
    * matches exactly — which makes q a free parameter trading table
    * count C(b, q) against key selectivity q·64/b bits. A fixed q goes
    * quadratic once the distinct-fingerprint count outgrows the key
    * space (d = 8, q = 2: ~13-bit keys ⇒ candidate mass ~
    * n²·C(10,2)/2¹³ — measured 8.85× at 10× corpus in SCALE_r11 before
    * the gate). The depth is PRICED IN CLOSED FORM from the distinct
    * count: expected random mass C(b,q)·n²/2^(1+w) against a
    * `candidatesPerDoc · n_distinct` budget, deepening until it fits or
    * the table cap (512 keys/fp) is hit — d = 8 upgrades q 2→3
    * (165 keys, ~17.5 bits) around 50k distinct fps and 3→4 (495 keys,
    * ~21 bits) around 500k; each step is ~16× fewer random collisions
    * for ~3× more (linear) key rows. The analytic form is deliberate:
    * an r11 measurement experiment showed bucket mass is flat across
    * q = 2..4 on dense corpora — true near-duplicates share untouched
    * blocks at every depth, so only the random term (which the formula
    * prices exactly) responds to q, and a measurement probe costs more
    * than the join it tunes (2.5 s of probe against a 0.9 s join at
    * 5k docs, mostly Catalyst codegen of per-combo keys). Every depth
    * yields the SAME verified output; the gate changes cost, never
    * answers. `candidatesPerDoc = Int.MaxValue` pins the shallowest
    * depth (no gate).
    */
  def fingerprintHammingPairs(fps: DataFrame, idCol: String, fpCol: String,
      maxDistance: Int, candidatesPerDoc: Int = 64): DataFrame = {
    require(maxDistance >= 0 && maxDistance <= 16,
      s"maxDistance=$maxDistance outside the supported 0..16 banding range")
    val fp = fps.select(col(idCol), col(fpCol)).cache()
    // the canonical frame: one row per distinct fingerprint VALUE — the
    // value is both the join payload and the pair identity
    val dfp = fp.select(col(fpCol).as("__f")).distinct().cache()

    // keyed frame at combination depth q over b = maxDistance + q blocks:
    // one 64-bit key per q-subset of blocks; depth and combo position are
    // hashed in so distinct combos occupy distinct key spaces (a
    // cross-combo hash collision only adds a candidate, which exact
    // verification discards). The q-subsets ship as ONE array literal
    // consumed by posexplode + transform/element_at — per-combo key
    // expressions (C(12,4) = 495 of them at the deepest probe) made
    // Catalyst codegen the bottleneck: ~6 s of plan compilation per
    // call against a 0.8 s join, invariant in the row count
    def keyedAt(q: Int): DataFrame = {
      val blocks = math.max(maxDistance + q, 1)
      val bounds = (0 to blocks).map(c => 64 * c / blocks)
      def blockVal(h: Column, c: Int): Column = {
        val start = bounds(c)
        val width = bounds(c + 1) - start
        val v = shiftright(h, start)
        if (start + width >= 64) v else v.bitwiseAND((1L << width) - 1)
      }
      val vals = array((0 until blocks).map(c => blockVal(col("__f"), c)): _*)
      val combos = (0 until blocks).combinations(q).map(_.toSeq).toSeq
      dfp.select(col("__f"), vals.as("__vals"),
          posexplode(typedLit(combos)).as(Seq("__pos", "__combo")))
        .select(col("__f"),
          xxhash64(lit(q), col("__pos"),
            transform(col("__combo"),
              i => element_at(col("__vals"), i + 1))).as("__key"))
    }
    val qStart = if (maxDistance <= 4) 1 else 2
    // deepest q whose table count C(d+q, q) stays within the linear
    // explode budget (512 keys/fingerprint)
    val qMax = (qStart to 4).takeWhile { q =>
      (1 to q).foldLeft(BigInt(1))((a, i) => a * (maxDistance + i) / i) <= 512
    }.lastOption.getOrElse(qStart)
    var q = qStart
    if (candidatesPerDoc != Int.MaxValue && qMax > qStart) {
      val log = org.slf4j.LoggerFactory.getLogger(getClass)
      // depth only affects the RANDOM collision term: fingerprints that
      // genuinely sit ≤ d bits apart share untouched blocks at EVERY
      // depth (measured r11: bucket mass flat within 10% across
      // q = 2..4 on dense corpora), so the choice is priced in closed
      // form from the distinct count alone — no measurement job can
      // change it. Expected random mass at depth q over b = d + q
      // blocks: C(b,q) tables × n²/2 pairs / 2^w keys, with w taken as
      // the MINIMUM combo width (sum of the q narrowest blocks) so the
      // estimate errs toward deepening, whose cost is linear key rows.
      val n = math.max(dfp.count(), 1L).toDouble
      def predictedRandomMass(depth: Int): Double = {
        val b = maxDistance + depth
        val tables = (1 to depth)
          .foldLeft(BigInt(1))((a, i) => a * (b - depth + i) / i).toDouble
        val widths = (0 until b).map(c => 64 * (c + 1) / b - 64 * c / b)
        val wMin = widths.sorted.take(depth).sum
        tables * n * n / 2 / math.pow(2, wMin)
      }
      val budget = candidatesPerDoc.toDouble * n
      while (q < qMax && predictedRandomMass(q) > budget) q += 1
      if (q > qStart) log.warn(
        s"fingerprintHammingPairs depth gate engaged: predicted random " +
          s"bucket mass ${predictedRandomMass(qStart).toLong} at " +
          s"q=$qStart exceeds $candidatesPerDoc/fingerprint over " +
          s"${n.toLong} distinct fingerprints; deepened to q=$q " +
          s"(b=${maxDistance + q} blocks, predicted " +
          s"${predictedRandomMass(q).toLong})")
    }
    val keyed = keyedAt(q)
    // verified DISTINCT-FINGERPRINT pairs: the candidate row already
    // carries both values, so verification is row-local (bit_count of
    // the xor) — no join back to a lookup table
    val l = keyed.select(col("__f").as("h1"), col("__key"))
    val r = keyed.select(col("__f").as("h2"), col("__key"))
    val fpPairs = l.join(r, "__key")
      .filter(col("h1") < col("h2"))
      .select("h1", "h2").distinct()
      .withColumn("distance", hamming(col("h1"), col("h2")))
      .filter(col("distance") <= maxDistance)
    // expand back to document pairs — both joins are equality joins on
    // the fingerprint value and emit only true output rows
    val l2 = fp.select(col(idCol).as("ida"), col(fpCol).as("h1"))
    val r2 = fp.select(col(idCol).as("idb"), col(fpCol).as("h2"))
    val cross = fpPairs.join(l2, "h1").join(r2, "h2")
      .select(least(col("ida"), col("idb")).as("id1"),
        greatest(col("ida"), col("idb")).as("id2"), col("distance"))
    val intra = fp.select(col(idCol).as("id1"), col(fpCol).as("__f"))
      .join(fp.select(col(idCol).as("id2"), col(fpCol).as("__f")), "__f")
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), lit(0).as("distance"))
    cross.unionAll(intra)
  }

  // ---- exact n-gram Jaccard ---------------------------------------------

  /** Exact n-gram Jaccard similarity between the documents of `pairs`
    * (id1, id2): |A ∩ B| / |A ∪ B| over distinct word n-grams. Used as the
    * exact verifier behind MinHash/SimHash candidates, or standalone with a
    * blocking key at small scale.
    */
  def ngramJaccard(df: DataFrame, pairs: DataFrame, textCol: String,
      idCol: String, n: Int = 3): DataFrame = {
    // only documents that appear in a candidate pair need their shingle
    // sets — semi-join first so the shingle computation is proportional to
    // the candidate count, not the corpus.
    val needed = pairs.select(col("id1").as(idCol))
      .union(pairs.select(col("id2").as(idCol))).distinct()
    // repartition on id: parallelizes shingling (see minhashSignature) and
    // pre-partitions both join sides below on their key.
    val sh = df.join(needed, Seq(idCol), "left_semi")
      .select(col(idCol), col(textCol))
      .repartition(shuffleWidth(df), col(idCol))
      .select(col(idCol), hashedShingles(col(textCol), n).as("__s"))
    val l = sh.select(col(idCol).as("id1"), col("__s").as("s1"))
    val r = sh.select(col(idCol).as("id2"), col("__s").as("s2"))
    pairs.join(l, "id1").join(r, "id2")
      .withColumn("jaccard",
        size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2"))))
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** All-pairs n-gram Jaccard >= threshold within blocking columns (e.g.
    * language + a length bucket), LOSSLESSLY pruned by a PPJoin-style
    * prefix filter (Xiao et al., "Efficient Similarity Joins for Near
    * Duplicate Detection", WWW'08; Bayardo et al. All-Pairs, WWW'07):
    * with each shingle set sorted in a canonical global order (ascending
    * 64-bit hash), a pair with Jaccard >= t must share at least one
    * element among each side's first |s| − ⌈t·|s|⌉ + 1 elements — if all
    * common elements hid in the ⌈t·|s|⌉ − 1 suffix, the overlap would be
    * below the t·|s| that J >= t forces. Candidates therefore come from an
    * equality join on (block…, prefix-token) instead of the full block
    * self-join, so an adversarial block (every document in one (lang,
    * len-bucket)) costs ~(shared prefix tokens)², not (block size)² —
    * documents with no shared content generate no candidates at all.
    * Verification is still the exact Jaccard, so the filter affects cost,
    * never the result.
    *
    * Scale caveat (measured, SCALE_r08.json): the prefix filter's pruning
    * power is the RARITY of prefix shingles. On a pathologically
    * low-diversity corpus (the 36-word-vocabulary scale fixture) almost
    * every bigram is common, candidate generation approaches the full
    * block self-join, and a 10× corpus costs ~24× (output stays linear).
    * Both standard refinements were measured there and do NOT help:
    *  - df-ascending canonical order (PPJoin §3) produced 33.59M
    *    candidates vs 33.94M for hash order (−1%) while paying two extra
    *    shuffles — with only ~1 300 possible bigrams no ordering makes a
    *    prefix rare (ScaleBench `ngram_candidates_*`);
    *  - positional/count filters cut VERIFICATION, but generation is
    *    ~80% of the wall time here (15.7 s of 19.8 s), so the ceiling on
    *    any post-candidate filter is the remaining ~20%.
    * The candidate set is inherently dense at any lossless prefix scheme
    * on such corpora. Natural-text vocabularies keep prefixes rare and
    * the join near-linear; round-9 adds an AUTOMATIC density gate (see
    * the inline comment): a one-aggregate candidate-mass prediction from
    * the prefix-token histogram routes dense corpora to MinHash-banded
    * candidates + the same exact-Jaccard verify, so the quadratic tail is
    * never run blind. `fallbackCandidatesPerDoc` is the per-doc candidate
    * budget above which the fallback engages; the switch is LOGGED (the
    * result's completeness changes with corpus density at the same
    * arguments — silent recall loss is not acceptable), and
    * `fallbackCandidatesPerDoc = Int.MaxValue` forces the lossless prefix
    * path unconditionally.
    */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      blockCols: Seq[(String, Column)], n: Int = 3,
      threshold: Double = 0.5,
      fallbackCandidatesPerDoc: Int = 256): DataFrame = {
    val names = blockCols.map(_._1)
    // repartition BEFORE shingling (see minhashSignature): a single-file
    // corpus is one scan split, and per-row shingling is a dominant cost —
    // without the exchange it runs on one core.
    val raw = df.select(Seq(col(idCol), col(textCol)) ++
        blockCols.map { case (nm, c) => c.as(nm) }: _*)
      // NOT pinned to shuffleWidth (r16): pinning regressed
      // dedup_ngram_lang_block ~1.75× — the cached `sh` feeds the prefix
      // self-join whose fanout dwarfs the shingle stage, and the wider
      // cache layout shifted the join into its slow mode more often.
      .repartition(col(idCol))
      .select(Seq(col(idCol)) ++ names.map(col) :+
        hashedShingles(col(textCol), n).as("__s0"): _*)
    // Canonical order = ascending hash (measured against an ascending
    // document-frequency order — PPJoin §3's refinement — on the test
    // corpus: df-order pruned only ~2% more candidates while its extra
    // explode+join+re-collect shuffles cost ~40% wall time, so the simple
    // order wins here; both are sound, any global total order is).
    val sh = raw
      .select(Seq(col(idCol)) ++ names.map(col) :+
        sort_array(col("__s0")).as("__s"): _*)
      .cache() // feeds the density probe, candidate gen, and verify joins
    // Density gate (VERDICT r8 #2): the prefix filter's pruning power is
    // shingle RARITY, and on a low-diversity corpus (measured: 36-word
    // vocabulary, 10× docs → 11× wall, 33.9M candidates for 279 answers)
    // no lossless prefix scheme has rare shingles to prune with. Predict
    // the candidate mass BEFORE paying for it: one linear aggregate over
    // the prefix-token histogram gives Σ c·(c−1)/2 — the exact size of the
    // prefix self-join's output before pair-dedup. If that exceeds
    // fallbackCandidatesPerDoc per document, bail to MinHash-banded
    // candidate generation (probabilistic, near-linear: 1.27× at the same
    // 10× fixture) followed by the SAME exact-Jaccard verification. The
    // fallback trades the lossless-candidate guarantee for the banding
    // S-curve: at k=64/b=16/r=4 a pair at J = t = 0.5 surfaces with
    // p ≈ 0.64, but the high-J pairs that dominate real dedup answers
    // (J ≥ 0.9 → p > 1 − 3e-13) are effectively never lost, and random
    // low-J pairs almost never become candidates (J ≈ 0.02 → ~2.5e-6),
    // which is exactly why it stays linear where the prefix join cannot.
    // The probe costs two short actions on the cached frame — the
    // adaptive-planning price for never running the quadratic tail blind.
    val sz = size(col("__s"))
    val prefLen = (sz - ceil(sz * threshold - 1e-9) + 1).cast("int")
    val prefToks = sh.select(names.map(col) :+
      explode(slice(col("__s"), lit(1), greatest(prefLen, lit(0)))).as("__tok"): _*)
    val mass = prefToks.groupBy(("__tok" +: names).map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .agg(sum(col("__c") * (col("__c") - 1) / 2).as("__m"))
      .first().getAs[Any]("__m") match {
        case null => 0L
        case v: java.lang.Number => v.longValue()
      }
    val nDocs = sh.count()
    val cand =
      if (mass <= fallbackCandidatesPerDoc.toLong * math.max(nDocs, 1L))
        ngramPrefixCandidates(sh, idCol, names, threshold)
      else {
        // The gate switches a lossless API to probabilistic candidates —
        // callers must be able to SEE that recall changed (ADVICE r9).
        // fallbackCandidatesPerDoc=Int.MaxValue forces the lossless path.
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"ngramJaccardPairs density gate engaged: predicted prefix-join " +
            s"mass $mass > ${fallbackCandidatesPerDoc}/doc x $nDocs docs; " +
            s"switching to MinHash-banded candidates (k=64,b=16: p~0.64 at " +
            s"J=threshold, >0.999 at J>=0.8). Pass " +
            s"fallbackCandidatesPerDoc=Int.MaxValue to force the lossless " +
            s"prefix path.")
        // MinHash from the ALREADY-hashed shingle sets (no re-shingling):
        // k=64 seed-derived families over the cached __s longs, computed
        // by the one-pass native signature expression (no shuffle). Block
        // columns ride in the banding join key, so cross-block candidates
        // never materialize — the fallback prunes WITHIN the blocking
        // semantics exactly like the prefix path.
        val k = 64; val bands = 16; val r = k / bands
        val sig = sh
          .select(Seq(col(idCol)) ++ names.map(col) :+
            graft.functions.minhashSigs(col("__s"), k).as("__sig"): _*)
          .filter(col("__sig").isNotNull)
          .select(Seq(col(idCol)) ++ names.map(col) ++
            (0 until k).map(i => col("__sig").getItem(i).as(s"sig_$i")): _*)
        val bandHashes = (0 until bands).map { b =>
          xxhash64((b * r until (b + 1) * r).map(i => col(s"sig_$i")): _*)
        }
        val buckets = sig.select(Seq(col(idCol)) ++ names.map(col) :+
          posexplode(array(bandHashes: _*)).as(Seq("band", "bucket")): _*)
        val bl = buckets.select(Seq(col(idCol).as("id1")) ++ names.map(col) ++
          Seq(col("band"), col("bucket")): _*)
        val br = buckets.select(Seq(col(idCol).as("id2")) ++ names.map(col) ++
          Seq(col("band"), col("bucket")): _*)
        bl.join(br, Seq("band", "bucket") ++ names)
          .filter(col("id1") < col("id2"))
          .select(names.map(col) ++ Seq(col("id1"), col("id2")): _*)
          .distinct()
      }
    val l = sh.select(col(idCol).as("id1"), col("__s").as("s1"))
    val r = sh.select(col(idCol).as("id2"), col("__s").as("s2"))
    cand.join(l, "id1").join(r, "id2")
      .withColumn("jaccard",
        size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2"))))
      .filter(col("jaccard") >= threshold)
      .select(names.map(col) ++ Seq(col("id1"), col("id2"),
        round(col("jaccard"), 6).as("jaccard")): _*)
  }

  // ---- asymmetric containment -------------------------------------------

  /** Asymmetric containment pairs (Broder 1997's C(A,B) = |A∩B|/|A| on
    * word n-gram shingles): every ordered pair (contained, container) with
    * containment ≥ thresholdPermille/1000. Candidate generation is
    * LOSSLESS by default (the prefix filter below) and every emitted pair
    * is exactly verified; on corpora so dense that the lossless join's
    * predicted mass exceeds `fallbackCandidatesPerDoc` per document, a
    * density gate (logged) switches candidates to min-wise containment
    * probing — per-pair miss probability ≤ (1−C)^16, containment-aware so
    * small-inside-large pairs keep full recall — and
    * `fallbackCandidatesPerDoc = Int.MaxValue` forces the lossless path
    * unconditionally. Never all-pairs and never an uncapped hot-shingle
    * join (VERDICT r8 #1:
    * the naive inverted-index self-join pays f² candidate rows for a
    * shingle in f docs — one stopword-ish trigram at 100× corpus scale is
    * the classic skewed-key blow-up).
    *
    * Plan — a prefix filter specialised to the ASYMMETRIC threshold:
    * C(A,B) ≥ t forces |A∩B| ≥ ⌈t·|A|⌉, so at most m = |A| − ⌈t·|A|⌉ of
    * A's shingles can be missing from B — therefore ANY m+1 of A's
    * shingles must include one that B also has. The contained side hence
    * emits only its m+1 RAREST shingles (global document-frequency
    * ascending — rarity is a pure performance heuristic here, any m+1
    * would be complete; df-ascending makes the emitted keys the coldest
    * ones, so the hot shingle that breaks the naive join almost never
    * enters a prefix). The container side must stay fully indexed
    * (containment is one-sided: B may be arbitrarily large), so a shingle
    * with df f now costs (#docs with it in-prefix)·f ≈ 0·f for hot keys
    * instead of f². Verification then recomputes the EXACT intersection
    * per surviving candidate from the full per-doc shingle arrays
    * (array_intersect on the string shingles — byte-identical to the
    * all-pairs oracle), so the filter moves cost, never the result.
    *
    * Join keys are xxhash64(shingle) longs: collisions can only ADD
    * candidates (equal strings always hash equal), and exact verification
    * kills them, so hashing is result-neutral. (A same-document collision
    * could in principle waste one prefix slot; odds ~|A|²/2⁶⁴ per doc.)
    */
  def containmentPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int = 3, thresholdPermille: Int = 900,
      fallbackCandidatesPerDoc: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sh = df.select(col(idCol), col(textCol))
      .repartition(shuffleWidth(df), col(idCol)) // parallelize shingling off scan splits
      .select(col(idCol), shingles(col(textCol), n).as("__arr"))
      .cache() // feeds df-ranking, the container index, and both verify joins
    val ex = sh.select(col(idCol), explode(col("__arr")).as("__g"))
      .select(col(idCol), xxhash64(col("__g")).as("__k"))
    val dfreq = ex.groupBy("__k").agg(count(lit(1)).as("__df"))
      .cache() // shingle-domain-sized; feeds the probe and the df-ranking
    // Density gate (same idea as ngramJaccardPairs', but priced from the
    // df TABLE ALONE so the bail-out path never pays the per-occurrence
    // ranking window): the full inverted self-join emits Σ_k df·(df−1)
    // rows; the prefix join keeps ≈ the (1−t) rarest fraction of each
    // doc's shingles, so its mass is ≈ (1−t)·Σ df·(df−1) — an upper-
    // bound estimate that one shingle-domain aggregate computes. On a
    // low-diversity corpus even the rarest shingles' df grows linearly
    // with the corpus (measured: 5.3× wall for 10× docs on the 36-word
    // fixture before the gate), so past the per-doc budget we use a
    // CONTAINMENT-AWARE probabilistic scheme (ADVICE r9 replaced the
    // earlier symmetric-Jaccard banding, which missed exactly the
    // small-doc-inside-large-doc pairs this function exists to find):
    // min-wise probing. For seed i, the argmin shingle of A under
    // hash_i is a (min-wise) uniform sample of A's distinct shingles,
    // so P(probe_i ∈ B) = |A∩B|/|A| = C(A,B) — the probe hits the
    // container index with probability equal to the CONTAINMENT itself,
    // independent of |B|. Each doc emits its k=16 argmin shingles as
    // probes against the full inverted index; a true pair at C ≥ t=0.9
    // is missed with probability ≤ (1−t)^k = 1e-16 — size-ratio-blind,
    // unlike Jaccard banding. Candidate mass is Σ_s argminCount(s)·df(s)
    // and argmin choice is df-UNBIASED (uniform over each doc's
    // shingles), so a stopword shingle in f docs costs ~k·f²/|A| — not
    // f² per seed — and every surviving candidate still passes the
    // exact array_intersect verify. The lossless prefix path stays the
    // default wherever the probe says it is affordable;
    // fallbackCandidatesPerDoc=Int.MaxValue forces it unconditionally.
    val m0 = dfreq.agg(sum(col("__df") * (col("__df") - 1)).as("__m"))
      .first().getAs[Any]("__m") match {
        case null => 0L
        case v: java.lang.Number => v.longValue()
      }
    val prefixFrac = math.max(0.05, (1000 - thresholdPermille) / 1000.0)
    val nDocs = sh.count()
    val cand =
      if (m0 * prefixFrac <=
          fallbackCandidatesPerDoc.toLong * math.max(nDocs, 1L)) {
        // m+1 with exact integers: ceil(n·p/1000) = (n·p + 999) div 1000.
        val prefLen = (size(col("__arr")) -
          floor((size(col("__arr")) * thresholdPermille + 999) / 1000) + 1)
        val pref = ex.join(dfreq, "__k")
          .withColumn("__rk", row_number().over(
            Window.partitionBy(col(idCol)).orderBy(col("__df"), col("__k"))))
          .join(sh.select(col(idCol), prefLen.cast("int").as("__plen")), idCol)
          .filter(col("__rk") <= col("__plen"))
        pref.select(col(idCol).as("contained_id"), col("__k"))
          .join(ex.select(col(idCol).as("container_id"), col("__k")), "__k")
          .filter(col("contained_id") =!= col("container_id"))
          .select("contained_id", "container_id").distinct()
      } else {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"containmentPairs density gate engaged: predicted prefix-join " +
            s"mass ~${(m0 * prefixFrac).toLong} > " +
            s"$fallbackCandidatesPerDoc/doc x $nDocs docs; switching to " +
            s"min-wise containment probing (k=16: per-pair miss <= " +
            s"(1-C)^16). Pass fallbackCandidatesPerDoc=Int.MaxValue to " +
            s"force the lossless prefix path.")
        val k = 16
        // Contained side: k argmin shingles (min_by per seed family) —
        // direction is built in, since every doc both probes (as A) and
        // is fully indexed (as B); no orientation-doubling pass needed.
        val probes = ex.groupBy(col(idCol)).agg(
          min_by(col("__k"), xxhash64(lit(0), col("__k"))).as("p_0"),
          (1 until k).map(i =>
            min_by(col("__k"), xxhash64(lit(i), col("__k"))).as(s"p_$i")): _*)
        val probeKeys = probes.select(col(idCol).as("contained_id"),
          explode(array_distinct(
            array((0 until k).map(i => col(s"p_$i")): _*))).as("__k"))
        probeKeys
          .join(ex.select(col(idCol).as("container_id"), col("__k")), "__k")
          .filter(col("contained_id") =!= col("container_id"))
          .select("contained_id", "container_id").distinct()
      }
    cand
      .join(sh.select(col(idCol).as("contained_id"), col("__arr").as("__a")),
        "contained_id")
      .join(sh.select(col(idCol).as("container_id"), col("__arr").as("__b")),
        "container_id")
      .select(col("contained_id"), col("container_id"),
        size(array_intersect(col("__a"), col("__b"))).cast("long").as("inter"),
        size(col("__a")).cast("long").as("n_contained"))
      .filter(col("inter") * 1000 >= col("n_contained") * thresholdPermille)
      .withColumn("containment_permille",
        expr("inter * 1000 DIV n_contained"))
  }

  /** Candidate (block…, id1, id2) pairs from the prefix filter over a
    * frame of (idCol, block columns, `__s` = hashed shingles sorted in any
    * consistent global order — ngramJaccardPairs uses plain ascending
    * hash; see its comment for why a document-frequency order was
    * measured and rejected). Public so the pruning factor is
    * observable/testable on its own; the ε in the ceiling guards float
    * noise in t·|s| toward the SAFE side (a hair-longer prefix, never a
    * shorter one).
    */
  def ngramPrefixCandidates(sh: DataFrame, idCol: String,
      names: Seq[String], threshold: Double): DataFrame = {
    val sz = size(col("__s"))
    val prefLen = (sz - ceil(sz * threshold - 1e-9) + 1).cast("int")
    val pref = sh.select(Seq(col(idCol)) ++ names.map(col) :+
      explode(slice(col("__s"), lit(1), greatest(prefLen, lit(0)))).as("__tok"): _*)
    val l = pref.select(Seq(col(idCol).as("id1")) ++ names.map(col) :+
      col("__tok"): _*)
    val r = pref.select(Seq(col(idCol).as("id2")) ++ names.map(col) :+
      col("__tok"): _*)
    // block columns stay in the join key: the prefix filter prunes WITHIN
    // the blocking semantics, it must not widen them
    l.join(r, "__tok" +: names)
      .filter(col("id1") < col("id2"))
      .select(names.map(col) ++ Seq(col("id1"), col("id2")): _*)
      .distinct()
  }
}
