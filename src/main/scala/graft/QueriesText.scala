package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, Dedup, IntervalJoin, QualityGates, Resample,
  Sessionize, Similarity, TextAnalysis, Watermark}
import graft.pipeline.Bucketing
import graft.time.{RolloverCalendar, SessionCalendar}

/** Text family queries + DuckDB oracles (split from the
  * monolithic SparkEntry in round 12; entry bodies unchanged). */
private[graft] trait QueriesText extends QueryShared {

  protected def textQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Masked-LM objective construction: deterministic masking (every
    // position ≡ 1 mod 7) replaces the token with <mask> in the input
    // and collects the original tokens as labels — the BERT-style
    // example builder, as pure per-row array expressions (indexed
    // transform + filter, zero exchanges before the order-by). A real
    // pipeline swaps the position rule for a keyed hash; the fixed rule
    // keeps the oracle exact.
    "mlm_masking" -> { (s, d) =>
      val t = Dedup.tokens(col("text"))
      val masked = transform(t, (x, i) =>
        when(i % 7 === 1, lit("<mask>")).otherwise(x))
      val labels = filter(
        transform(t, (x, i) => when(i % 7 === 1, x)), _.isNotNull)
      Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          array_join(masked, " ").as("input"),
          array_join(labels, " ").as("labels"),
          size(labels).as("n_masked"))
        .orderBy("doc_id")
    },


    // Retrieval/pretraining chunking: overlapping 64-token windows at
    // stride 48 per document — the standard RAG / long-document split.
    // Start offsets come from an in-row `sequence`, the window from an
    // in-row `slice`: pure per-row expressions, zero exchanges before
    // the final order-by, output rows ≈ n_tokens/stride per doc.
    "doc_chunking" -> { (s, d) =>
      val size_ = 64
      val stride = 48
      Tables.documents(s, d)
        .select(col("doc_id"), Dedup.tokens(col("text")).as("t"))
        .withColumn("n_tok", size(col("t")))
        .filter(col("n_tok") > 0)
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(0), col("n_tok") - 1, lit(stride)))
            .as("start"))
        .select(col("doc_id"),
          (col("start") / stride).cast("int").as("chunk_idx"),
          array_join(slice(col("t"), col("start") + 1, lit(size_)), " ")
            .as("chunk_text"),
          size(slice(col("t"), col("start") + 1, lit(size_))).as("n_tokens"))
        .orderBy("doc_id", "chunk_idx")
    },


    // Tokenizer training, iteration 0: the BPE pair statistics every
    // merge decision reads — adjacent character-pair counts weighted by
    // word frequency, top-20 by (count desc, pair). The Sennrich ACL'16
    // collapse: statistics run over the DISTINCT word table (one corpus
    // exchange for word counts; the pair explosion touches
    // vocabulary-sized data only), and the top-k is a per-partition heap
    // (TakeOrderedAndProject), never a full sort. The full merge loop is
    // ops/Bpe.trainMerges (spec-tested); each extra iteration repeats
    // this query's vocabulary-sized tail.
    "bpe_merge_step" -> { (s, d) =>
      graft.ops.Bpe.pairCounts(
          graft.ops.Bpe.wordTable(Tables.documents(s, d), "text"))
        .orderBy(desc("cnt"), asc("pair"))
        .limit(20)
    },


    // PII redaction over a planted contact-line fixture (the corpus itself
    // is PII-free; the fixture derives deterministically from doc_id, the
    // same pattern the multimodal queries use). Counts are pre-redaction;
    // the redacted text ships as md5 so the oracle compares a fixed-width
    // digest instead of a kilobyte string.
    "pii_redact" -> { (s, d) =>
      val planted = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com or call "),
          (lit(7000000000L) + col("doc_id") * 104729L).cast("string"))
          .as("text"))
      planted.select(col("doc_id"),
          TextAnalysis.emailCount(col("text")).cast("long").as("n_emails"),
          TextAnalysis.longDigitCount(col("text")).cast("long")
            .as("n_digit_runs"),
          md5(TextAnalysis.redactPii(col("text"))).as("redacted_md5"))
        .orderBy("doc_id")
    },


    // Text statistics: token counts, punctuation/digit ratios, mean length.
    "text_stats" -> { (s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.bpeishTokenCount(col("text")).as("n_bpeish"),
        round(TextAnalysis.punctRatio(col("text")), 6).as("punct_ratio"),
        round(TextAnalysis.digitRatio(col("text")), 6).as("digit_ratio"),
        round(TextAnalysis.meanTokenLen(col("text")), 6).as("mean_token_len"))
        .orderBy("doc_id")
    },


    // Heuristic language id per document + corpus distribution.
    "text_langid" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    },


    // Quality scoring (composite, two-phase) + English stopword ratio.
    "text_quality" -> { (s, d) =>
      TextAnalysis.withQualityScore(Tables.documents(s, d), "text", "quality")
        .select(col("doc_id"), col("quality"),
          round(TextAnalysis.stopwordRatio(col("text"), "en"), 6).as("stop_en"))
        .orderBy("doc_id")
    },


    // Gopher-style repetition metrics (Rae et al. 2021 §A1.1): mass of
    // the single most frequent 1/2/3-gram per document + the keep gate at
    // the published thresholds, via the explode + count-aggregation form
    // (one linear token-level exchange — the per-row HOF form is
    // interpreted-quadratic per doc and exists only for inline checks).
    // The oracle recomputes the exact fractions via unnest + max/sum.
    // Keyword extraction: top-3 terms per document by smoothed TF-IDF
    // (sklearn form), ties broken by term. df reuses the (doc,term)
    // aggregate, so the token explode is exchanged once.
    "tfidf_top_terms" -> { (s, d) =>
      graft.ops.TermIndex.tfidfTopTerms(Tables.documents(s, d),
          "text", "doc_id", k = 3)
        .orderBy("doc_id", "rank")
    },


    // BM25 retrieval over a 3-term query: "dup" is the rare term (df≈26 of
    // 500 -> idf≈2.9, dominates), hash/join are near-stopwords (idf≈0.02),
    // so the ranking exercises the full idf spread. Global top-20 via
    // orderBy+limit (TakeOrderedAndProject — per-partition heaps, no
    // single-partition sort of the corpus).
    "bm25_search" -> { (s, d) =>
      graft.ops.TermIndex.bm25Search(Tables.documents(s, d),
          "text", "doc_id", queryTerms = Seq("hash", "join", "dup"),
          k1 = 1.2, b = 0.75, topK = 20)
        .orderBy("rank")
    },


    // CCNet-style LM quality scoring, self-contained: an add-one-smoothed
    // bigram model trained on the corpus in the same job scores each
    // document's bits-per-token; high-entropy docs are dropped. The keep
    // gate reads the ROUNDED bits column so both engines decide from the
    // identical value. 4.95 bits is corpus-tuned (the sf0.01 distribution
    // spans 4.73-5.24): like every perplexity gate, the cut point comes
    // from the corpus percentile you want, not from theory.
    "lm_perplexity" -> { (s, d) =>
      graft.ops.LanguageModel.bigramScore(Tables.documents(s, d),
          "text", "doc_id", maxBits = 4.95)
        .orderBy("doc_id")
    },


    "text_repetition" -> { (s, d) =>
      TextAnalysis.repetitionMetrics(Tables.documents(s, d), "text", "doc_id")
        .select(col("doc_id"),
          round(col("top1_frac"), 6).as("top1_frac"),
          round(col("top2_frac"), 6).as("top2_frac"),
          round(col("top3_frac"), 6).as("top3_frac"),
          col("keep"))
        .orderBy("doc_id")
    },


    // Vocabulary building: top tokens by corpus frequency with dense
    // ranks — the explode + count + rank shape a tokenizer-training
    // pipeline runs at corpus scale (partial top-k applies to the rank
    // window, see PlanSpec).
    "vocab_top_tokens" -> { (s, d) =>
      Tables.documents(s, d)
        .repartition(shuffleWidth(s), col("doc_id")) // parallelize the tokenize explode
        .select(explode(graft.ops.Dedup.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("freq"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(desc("freq"), col("token"))))
        .filter(col("rank") <= 100)
        .select("rank", "token", "freq")
        .orderBy("rank")
    },


    // Mergeable corpus-integrity checksum — the read-side twin of
    // shard_manifest for validating a corpus copy/migration by CONTENT,
    // not just ids: 8 per-shard rows, the xor-MERGE of those rows
    // (shard = -1), and an independent direct global scan (shard = -2).
    // XOR is the aggregate — commutative, associative, self-inverse —
    // so shard checksums combine into the corpus checksum without
    // re-reading data: at 100 TB each shard validates in its own
    // map-side-combined pass (or incrementally per file) and the merge
    // is 8 longs. Rows -1 and -2 carrying identical values inside the
    // hash-checked output is the in-band mergeability proof. Content
    // hash = oracle-portable md5Hash64 over doc_id|lang|text, masked to
    // 63 bits so both engines xor in signed-safe range.
    "corpus_integrity_checksum" -> { (s, d) =>
      val md5h: Column => Column = Dedup.md5Hash64
      val rows = Tables.documents(s, d).select(
        pmod(md5h(col("doc_id").cast("string")), lit(8L)).cast("int")
          .as("shard"),
        md5h(concat_ws("\u0001", col("doc_id"), col("lang"), col("text")))
          .bitwiseAND(lit(Long.MaxValue)).as("h"),
        col("n_chars"))
      val shards = rows.groupBy("shard").agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(h)").as("content_xor"),
        sum("n_chars").as("char_sum"))
      val merged = shards.agg(
        sum("n_docs").as("n_docs"),
        expr("bit_xor(content_xor)").as("content_xor"),
        sum("char_sum").as("char_sum"))
        .select(lit(-1).as("shard"), col("n_docs"), col("content_xor"),
          col("char_sum"))
      val direct = rows.agg(
        count(lit(1)).as("n_docs"),
        expr("bit_xor(h)").as("content_xor"),
        sum("n_chars").as("char_sum"))
        .select(lit(-2).as("shard"), col("n_docs"), col("content_xor"),
          col("char_sum"))
      shards.unionByName(merged).unionByName(direct).orderBy("shard")
    },


    // Vocabulary coverage cutoff — the tokenizer-sizing question "how
    // many types cover 90% of token mass?" (the long-tail shape that
    // decides vocab size and OOV policy). Corpus scans once into the
    // vocabulary-sized frequency table; the cumulative window and the
    // total are vocab-sized work (the window's single partition holds
    // |vocab| rows, NOT corpus rows — same rationale as vocab_top_tokens'
    // rank). A type is kept while the mass BEFORE it is under 90% of
    // total, so the crossing type is included; the comparison is
    // 10·(cum−freq) < 9·total — pure integers, no float share crosses
    // engines. One summary row: vocab size, kept size, kept/total mass,
    // and a token-length checksum pinning the kept SET.
    "vocab_coverage_cutoff" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val f = Tables.documents(s, d)
        .repartition(shuffleWidth(s), col("doc_id")) // parallelize the tokenize explode
        .select(explode(graft.ops.Dedup.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("freq"))
      val w = Window.orderBy(desc("freq"), col("token"))
        .rowsBetween(Window.unboundedPreceding, 0)
      f.withColumn("cum", sum("freq").over(w))
        .crossJoin(broadcast(f.agg(sum(col("freq")).as("total"))))
        .withColumn("kept", (col("cum") - col("freq")) * 10 < col("total") * 9)
        .agg(count(lit(1)).as("n_vocab"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("freq")).otherwise(0L)).as("mass_kept"),
          max(col("total")).as("mass_total"),
          sum(when(col("kept"), length(col("token"))).otherwise(0L))
            .as("kept_len_checksum"))
    },


    // Distinctive vocabulary per source — which tokens are
    // over-represented in a source vs the REST of the corpus (the
    // exact-integer stand-in for log-likelihood keyword extraction:
    // permille-rate LIFT = in-source rate − elsewhere rate, both floor
    // permille, so ranking is engine-exact where G²'s x·ln x would
    // float-flip). Token-keyed exchange for counts, vocabulary-sized
    // work after; top-3 per source by (lift, token) window rank.
    "distinctive_tokens_by_source" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val tok = Tables.documents(s, d)
        .select(col("source"),
          explode(graft.ops.Dedup.tokens(col("text"))).as("token"))
      val st = tok.groupBy("source", "token").agg(count(lit(1)).as("c_st"))
      val t = st.groupBy("token").agg(sum(col("c_st")).as("c_t"))
      val srcTot = st.groupBy("source").agg(sum(col("c_st")).as("n_s"))
      val bigN = st.agg(sum(col("c_st")).as("big_n"))
      val lift = st.join(t, "token").join(broadcast(srcTot), "source")
        .crossJoin(broadcast(bigN))
        .withColumn("lift_permille",
          expr("c_st * 1000 DIV n_s - (c_t - c_st) * 1000 DIV (big_n - n_s)"))
      val w = Window.partitionBy("source")
        .orderBy(desc("lift_permille"), asc("token"))
      lift.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
        .select(col("source"), col("rk"), col("token"),
          col("lift_permille"), col("c_st"))
        .orderBy("source", "rk")
    },


    // Zipf rank-size law over the token frequencies — the corpus
    // statistic behind every vocabulary-size decision: top-30 tokens by
    // (freq, token) rank with the freq·rank product (≈ constant under
    // Zipf) as an exact integer. Token counts are one corpus exchange;
    // the rank is a 30-row heap (TakeOrderedAndProject), never a full
    // sort.
    "zipf_fit_tokens" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val freqs = Tables.documents(s, d)
        .select(explode(graft.ops.Dedup.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("freq"))
      val w = Window.orderBy(desc("freq"), asc("token"))
      freqs.orderBy(desc("freq"), asc("token")).limit(30)
        .withColumn("rank", row_number().over(w))
        .select(col("rank"), col("token"), col("freq"),
          (col("freq") * col("rank")).as("freq_rank_product"))
        .orderBy("rank")
    },


    // Classifier-vs-ground-truth confusion matrix: declared corpus lang ×
    // the n-gram langId prediction (same predictor text_langid oracles
    // per-doc), each cell carrying a doc_id checksum so membership — not
    // just cardinality — is pinned. The standard eval audit for any
    // labeling pass at 100 TB: one groupBy over |langs|² cells, the
    // predictor stays inside whole-stage codegen.
    "langid_confusion" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), TextAnalysis.langId(col("text")).as("lang_pred"),
          col("doc_id"))
        .groupBy("lang", "lang_pred")
        .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("id_checksum"))
        .orderBy("lang", "lang_pred")
    },


    // PMI collocations (Church & Hanks 1990): adjacent-token pairs
    // scored by pointwise mutual information against the unigram
    // margins — the classic "which bigrams are phrases" statistic a
    // tokenizer-training pipeline computes before merging tokens. All
    // counts are exact; the PMI ratio ships as the floor-scaled integer
    // (c_xy·B·10⁶) DIV (c_x·c_y) so no log/float crosses engines (PMI
    // ordering is monotone in the ratio). Two token-domain aggregations
    // plus a broadcast of the (tiny) unigram table — the corpus is
    // scanned once at any scale.
    "pmi_collocations" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .repartition(shuffleWidth(s), col("doc_id"))
        .select(graft.ops.Dedup.tokens(col("text")).as("t"))
      val big = toks.select(explode(expr(
          "zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1)," +
            " (a, b) -> struct(a, b))")).as("p"))
        .select(col("p.a").as("w1"), col("p.b").as("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      val uni = toks.select(explode(col("t")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      // Unigram joins unhinted (r10-#2 hazard class): the vocabulary is
      // corpus-proportional, so no driver-pinned broadcast — AQE picks
      // broadcast while small, shuffled join at scale.
      big
        .join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
        .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
        .crossJoin(broadcast(big.agg(sum("c_xy").as("b_tot"))))
        .filter(col("c_xy") >= 5)
        // DECIMAL(38,0) intermediate (ADVICE r10): c_xy·b_tot·10⁶ as a
        // BIGINT product approaches 2⁶³ once b_tot ~ 1e7 with frequent
        // bigrams — non-ANSI Spark would wrap silently while the oracle
        // errors. 38 digits hold the product up to b_tot ~ 1e12 exactly;
        // DIV on decimals is IntegralDivide and lands back in BIGINT.
        .withColumn("pmi_scaled",
          expr("(CAST(c_xy AS DECIMAL(38,0)) * b_tot * 1000000)" +
            " DIV (c_x * c_y)"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(desc("pmi_scaled"), col("w1"), col("w2"))))
        .filter(col("rk") <= 50)
        .select("w1", "w2", "c_xy", "c_x", "c_y", "pmi_scaled")
        .orderBy(desc("pmi_scaled"), col("w1"), col("w2"))
    },


    // Dictionary phrase tagging — the taxonomy-classification pass of a
    // curation pipeline: a categorized phrase dictionary (uni- and
    // bigrams) matched against every document by OCCURRENCE (positional
    // n-grams, not the distinct shingle set), per-category match and
    // doc counts plus the top-matching document. At scale this is one
    // broadcast join of the corpus n-gram stream against a dictionary
    // that is tiny by construction — no shuffle touches the corpus
    // until the per-doc aggregation.
    "dictionary_phrase_tagging" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val dict = Seq(
        ("storage", "table"), ("storage", "row scan"),
        ("storage", "column"), ("engine", "query"),
        ("engine", "sort merge"), ("engine", "hash join"),
        ("stream", "stream"), ("stream", "window"), ("stream", "batch")
      ).toDF("category", "phrase")
      val toks = Tables.documents(s, d)
        .repartition(shuffleWidth(s), col("doc_id"))
        .withColumn("t", graft.ops.Dedup.tokens(col("text")))
      val g1 = toks.select(col("doc_id"), explode(col("t")).as("phrase"))
      val g2 = toks.filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(t)-2)," +
            " i -> concat_ws(' ', t[i], t[i+1]))")).as("phrase"))
      val m = g1.unionByName(g2).join(broadcast(dict), "phrase")
        .groupBy("doc_id", "category")
        .agg(count(lit(1)).as("n"))
      m.withColumn("rk", row_number().over(
          Window.partitionBy("category").orderBy(desc("n"), col("doc_id"))))
        .groupBy("category")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("n_matches"),
          max(when(col("rk") === 1, col("doc_id"))).as("top_doc_id"),
          max(when(col("rk") === 1, col("n"))).as("top_doc_matches"))
        .orderBy("category")
    }
  )

  protected def textOracles: Map[String, String] = Map(

    // 1-based DuckDB comprehension index i maps to Spark's 0-based
    // transform index as (i-1); the filtered-comprehension form builds
    // the labels list directly.
    "mlm_masking" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS s
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id,
        |  array_to_string([CASE WHEN (i - 1) % 7 = 1 THEN '<mask>'
        |                        ELSE s[i] END
        |                   for i in range(1, len(s) + 1)], ' ') AS input,
        |  array_to_string([s[i] for i in range(1, len(s) + 1)
        |                   if (i - 1) % 7 = 1], ' ') AS labels,
        |  len([s[i] for i in range(1, len(s) + 1)
        |       if (i - 1) % 7 = 1]) AS n_masked
        |FROM t ORDER BY doc_id""".stripMargin,


    // DuckDB list slices are 1-based and end-inclusive; range(0, n, 48)
    // matches Spark's sequence(0, n-1, 48) start set exactly.
    "doc_chunking" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    trim(lower(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS s
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, s, CAST(unnest(range(0, len(s), 48)) AS INT) AS start
        |  FROM t WHERE len(s) > 0)
        |SELECT doc_id, start // 48 AS chunk_idx,
        |  array_to_string(s[start + 1 : start + 64], ' ') AS chunk_text,
        |  len(s[start + 1 : start + 64]) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,


    // Same distinct-word collapse; (cnt desc, pair) totally orders, so
    // the LIMIT 20 set is identical in both engines.
    "bpe_merge_step" ->
      """WITH w AS (
        |  SELECT word, count(*) AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |  WHERE word <> '' GROUP BY word),
        |p AS (
        |  SELECT unnest([substr(word, i, 1) || ' ' || substr(word, i + 1, 1)
        |                 for i in range(1, length(word))]) AS pair, n
        |  FROM w WHERE length(word) >= 2)
        |SELECT pair, CAST(sum(n) AS BIGINT) AS cnt
        |FROM p GROUP BY pair
        |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin,


    "pii_redact" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
        |    '@example.com or call ' ||
        |    CAST(7000000000 + doc_id * 104729 AS VARCHAR) AS text
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '[0-9]{7,}')) AS BIGINT) AS n_digit_runs,
        |  md5(regexp_replace(
        |    regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '[0-9]{7,}', '<NUM>', 'g')) AS redacted_md5
        |FROM planted ORDER BY doc_id""".stripMargin,


    "text_stats" ->
      """SELECT doc_id,
        |  CASE WHEN len(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens,
        |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS n_bpeish,
        |  round((length(text) - length(regexp_replace(text,
        |    '[.,;:!?''"()\[\]-]', '', 'g')))::DOUBLE / length(text), 6) AS punct_ratio,
        |  round((length(text) - length(regexp_replace(text,
        |    '[0-9]', '', 'g')))::DOUBLE / length(text), 6) AS digit_ratio,
        |  round(list_sum([len(t) for t in regexp_split_to_array(trim(text), '\s+')])::DOUBLE /
        |    len(regexp_split_to_array(trim(text), '\s+')), 6) AS mean_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,


    "text_langid" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id,
        |    len(list_filter(toks, t -> t IN ('the','and','of','to','a','in','is','it','for','on'))) AS s_en,
        |    len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein','mit','zu','den'))) AS s_de,
        |    len(list_filter(toks, t -> t IN ('el','la','de','que','y','en','un','es','por','los'))) AS s_es,
        |    len(list_filter(toks, t -> t IN ('le','la','de','et','un','est','pour','que','dans','les'))) AS s_fr
        |  FROM s)
        |SELECT doc_id,
        |  CASE WHEN s_en = greatest(s_en, s_de, s_es, s_fr) AND s_en > 0 THEN 'en'
        |       WHEN s_de = greatest(s_en, s_de, s_es, s_fr) AND s_de > 0 THEN 'de'
        |       WHEN s_es = greatest(s_en, s_de, s_es, s_fr) AND s_es > 0 THEN 'es'
        |       WHEN s_fr = greatest(s_en, s_de, s_es, s_fr) AND s_fr > 0 THEN 'fr'
        |       ELSE 'und' END AS lang_pred
        |FROM sc ORDER BY doc_id""".stripMargin,


    "text_quality" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    CASE WHEN len(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tok,
        |    (length(text) - length(regexp_replace(text, '[.,;:!?''"()\[\]-]', '', 'g')))::DOUBLE
        |      / length(text) AS punct,
        |    (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
        |      / length(text) AS digit,
        |    list_sum([len(t) for t in regexp_split_to_array(trim(text), '\s+')])::DOUBLE /
        |      len(regexp_split_to_array(trim(text), '\s+')) AS mtl
        |  FROM documents)
        |SELECT doc_id,
        |  round(least(n_tok / 64.0, 1.0) * (CASE WHEN n_tok > 4096 THEN 0.5 ELSE 1.0 END) * 0.4
        |    + (CASE WHEN punct <= 0.2 THEN 1.0 ELSE 0.5 END) * 0.2
        |    + (CASE WHEN digit <= 0.2 THEN 1.0 ELSE 0.5 END) * 0.2
        |    + (CASE WHEN mtl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality,
        |  round(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
        |    t -> t IN ('the','and','of','to','a','in','is','it','for','on')))::DOUBLE /
        |    len(regexp_split_to_array(lower(trim(text)), '\s+')), 6) AS stop_en
        |FROM f ORDER BY doc_id""".stripMargin,


    // Top n-gram mass per document: unnest each gram family, count, and
    // take max/sum per doc — exactly the Spark expression's value. Docs
    // shorter than n tokens have no n-grams: the LEFT JOIN's NULL
    // coalesces to 0, matching the Spark guard.
    // Same tf/df/N integers; ln over an integer-derived double ratio
    // agrees across engines far beyond the 6 rounded decimals. Rank ties
    // (equal tf and df -> bit-identical scores) break by term in both.
    "tfidf_top_terms" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS s
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM (
        |  SELECT doc_id, unnest(s) AS term FROM t) GROUP BY doc_id, term),
        |d AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS nd FROM documents),
        |sc AS (SELECT doc_id, term, tf, df,
        |    tf * (ln((nd + 1)::DOUBLE / (df + 1)) + 1) AS score,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tf * (ln((nd + 1)::DOUBLE / (df + 1)) + 1) DESC, term)
        |      AS rank
        |  FROM tf JOIN d USING (term) CROSS JOIN n)
        |SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df,
        |  round(score, 6) AS score
        |FROM sc WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,


    // Same tf/df/dl/avgdl integers-and-ratios; the Okapi weight is spelled
    // with identical association in both engines, so the double math
    // agrees to the last ulp and the 6-dp round is safe margin.
    "bm25_search" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS s
        |  FROM documents),
        |d AS (SELECT doc_id, len(s) AS dl FROM t),
        |st AS (SELECT count(*) AS nd, sum(dl)::DOUBLE / count(*) AS avgdl
        |       FROM d),
        |h AS (SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(s) AS term FROM t) u
        |  WHERE term IN ('hash', 'join', 'dup')
        |  GROUP BY doc_id, term),
        |dfc AS (SELECT term, count(*) AS dfd FROM h GROUP BY term),
        |sc AS (SELECT h.doc_id, count(*) AS n_hits,
        |    sum(ln((nd - dfd + 0.5) / (dfd + 0.5) + 1) * tf * 2.2 /
        |        (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))) AS score
        |  FROM h JOIN dfc USING (term) JOIN d USING (doc_id) CROSS JOIN st
        |  GROUP BY h.doc_id),
        |top AS (SELECT doc_id, n_hits, score FROM sc
        |        ORDER BY score DESC, doc_id LIMIT 20)
        |SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
        |  doc_id, n_hits, round(score, 6) AS score
        |FROM top ORDER BY rank""".stripMargin,


    // Same model arithmetic from the literal tokens: c(u,w)+1 over c(u)+V
    // is exact integer-derived division in both engines; the per-doc sum
    // of m·(−log2 p) is double in both, rounded to 6/4 dp (log2/pow agree
    // far beyond that — same argument as the cosine/percentile oracles).
    "lm_perplexity" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS s
        |  FROM documents),
        |uni AS (SELECT u, count(*) AS cu FROM (
        |  SELECT unnest(s) AS u FROM t) GROUP BY u),
        |v AS (SELECT count(*) AS nv FROM uni),
        |db AS (SELECT doc_id, u, w, count(*) AS m FROM (
        |    SELECT doc_id, s[i] AS u, s[i+1] AS w FROM (
        |      SELECT doc_id, s, unnest([i for i in range(1, len(s))]) AS i
        |      FROM t))
        |  GROUP BY doc_id, u, w),
        |cw AS (SELECT u, w, sum(m) AS cuw FROM db GROUP BY u, w),
        |sc AS (SELECT db.doc_id,
        |    sum(m * -log2((cuw + 1)::DOUBLE / (cu + nv))) AS tot,
        |    sum(m) AS nb
        |  FROM db JOIN cw USING (u, w) JOIN uni USING (u) CROSS JOIN v
        |  GROUP BY db.doc_id)
        |SELECT t.doc_id,
        |  CAST(coalesce(nb, 0) AS BIGINT) AS n_bigrams,
        |  round(coalesce(tot / nb, 0), 6) AS bits_per_token,
        |  round(pow(2, coalesce(tot / nb, 0)), 4) AS ppl,
        |  round(coalesce(tot / nb, 0), 6) <= 4.95 AS keep
        |FROM t LEFT JOIN sc USING (doc_id)
        |ORDER BY doc_id""".stripMargin,


    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, len(trim(text)) AS nz,
        |    regexp_split_to_array(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS s
        |  FROM documents),
        |f1 AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS f FROM (
        |  SELECT doc_id, g, count(*) AS c FROM (
        |    SELECT doc_id, unnest(s) AS g FROM t) GROUP BY doc_id, g)
        |  GROUP BY doc_id),
        |f2 AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS f FROM (
        |  SELECT doc_id, g, count(*) AS c FROM (
        |    SELECT doc_id, unnest([s[i] || ' ' || s[i+1]
        |                           for i in range(1, len(s))]) AS g FROM t)
        |  GROUP BY doc_id, g)
        |  GROUP BY doc_id),
        |f3 AS (SELECT doc_id, max(c)::DOUBLE / sum(c) AS f FROM (
        |  SELECT doc_id, g, count(*) AS c FROM (
        |    SELECT doc_id, unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
        |                           for i in range(1, len(s) - 1)]) AS g FROM t)
        |  GROUP BY doc_id, g)
        |  GROUP BY doc_id),
        |j AS (
        |  SELECT t.doc_id,
        |    CASE WHEN nz = 0 THEN 0 ELSE coalesce(f1.f, 0) END AS r1,
        |    CASE WHEN nz = 0 THEN 0 ELSE coalesce(f2.f, 0) END AS r2,
        |    CASE WHEN nz = 0 THEN 0 ELSE coalesce(f3.f, 0) END AS r3
        |  FROM t LEFT JOIN f1 USING (doc_id) LEFT JOIN f2 USING (doc_id)
        |         LEFT JOIN f3 USING (doc_id))
        |SELECT doc_id, round(r1, 6) AS top1_frac, round(r2, 6) AS top2_frac,
        |  round(r3, 6) AS top3_frac,
        |  (r1 <= 0.20 AND r2 <= 0.18 AND r3 <= 0.16) AS keep
        |FROM j ORDER BY doc_id""".stripMargin,


    // Same normalize + split as the other document oracles.
    "vocab_top_tokens" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents),
        |f AS (SELECT token, count(*) AS freq FROM toks GROUP BY token),
        |r AS (SELECT token, freq,
        |  row_number() OVER (ORDER BY freq DESC, token) AS rank FROM f)
        |SELECT rank, token, freq FROM r WHERE rank <= 100
        |ORDER BY rank""".stripMargin,


    // Same two-level construction: per-shard content xors, their merge
    // (-1), and an independent direct global scan (-2). The 63-bit mask
    // keeps the xor in signed-BIGINT range on both engines; % 8 on the
    // unsigned md5 value equals Spark's signed pmod for power-of-two
    // moduli (low bits agree).
    "corpus_integrity_checksum" ->
      """WITH r AS (
        |  SELECT
        |    CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) % 8 AS INT)
        |      AS shard,
        |    CAST(md5_number_upper(doc_id || chr(1) || lang || chr(1) ||
        |         text) & 9223372036854775807 AS BIGINT) AS h,
        |    n_chars
        |  FROM documents),
        |s AS (
        |  SELECT shard, count(*) AS n_docs, bit_xor(h) AS content_xor,
        |    CAST(sum(n_chars) AS BIGINT) AS char_sum
        |  FROM r GROUP BY 1),
        |m AS (
        |  SELECT -1 AS shard, CAST(sum(n_docs) AS BIGINT) AS n_docs,
        |    bit_xor(content_xor) AS content_xor,
        |    CAST(sum(char_sum) AS BIGINT) AS char_sum
        |  FROM s),
        |g AS (
        |  SELECT -2 AS shard, count(*) AS n_docs, bit_xor(h) AS content_xor,
        |    CAST(sum(n_chars) AS BIGINT) AS char_sum
        |  FROM r)
        |SELECT * FROM s UNION ALL SELECT * FROM m UNION ALL SELECT * FROM g
        |ORDER BY shard""".stripMargin,


    // Same tokenization as vocab_top_tokens; the 90% rule as the
    // identical integer comparison.
    "vocab_coverage_cutoff" ->
      """WITH toks AS (
        |  SELECT unnest(string_split(trim(regexp_replace(lower(text),
        |    '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents),
        |f AS (SELECT token, count(*) AS freq FROM toks GROUP BY token),
        |c AS (
        |  SELECT token, freq,
        |    sum(freq) OVER (ORDER BY freq DESC, token
        |      ROWS UNBOUNDED PRECEDING) AS cum,
        |    sum(freq) OVER () AS total
        |  FROM f)
        |SELECT count(*) AS n_vocab,
        |  CAST(sum(CASE WHEN (cum - freq) * 10 < total * 9
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN (cum - freq) * 10 < total * 9
        |                THEN freq ELSE 0 END) AS BIGINT) AS mass_kept,
        |  CAST(max(total) AS BIGINT) AS mass_total,
        |  CAST(sum(CASE WHEN (cum - freq) * 10 < total * 9
        |                THEN length(token) ELSE 0 END) AS BIGINT)
        |    AS kept_len_checksum
        |FROM c""".stripMargin,


    // Same permille-lift rank with (lift desc, token) tiebreak.
    "distinctive_tokens_by_source" ->
      """WITH tok AS (
        |  SELECT source,
        |    unnest(string_split(trim(regexp_replace(lower(text),
        |      '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents),
        |st AS (SELECT source, token, count(*) AS c_st FROM tok
        |       GROUP BY 1, 2),
        |t AS (SELECT token, CAST(sum(c_st) AS BIGINT) AS c_t FROM st
        |      GROUP BY 1),
        |srct AS (SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM st
        |         GROUP BY 1),
        |nn AS (SELECT CAST(sum(c_st) AS BIGINT) AS big_n FROM st),
        |lift AS (
        |  SELECT st.source, st.token, st.c_st,
        |    st.c_st * 1000 // srct.n_s
        |      - (t.c_t - st.c_st) * 1000 // (nn.big_n - srct.n_s)
        |      AS lift_permille
        |  FROM st JOIN t USING (token) JOIN srct USING (source)
        |  CROSS JOIN nn)
        |SELECT source, CAST(rk AS BIGINT) AS rk, token, lift_permille,
        |  c_st
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY lift_permille DESC, token) AS rk
        |  FROM lift)
        |WHERE rk <= 3 ORDER BY source, rk""".stripMargin,


    // Same (freq desc, token) rank and exact products.
    "zipf_fit_tokens" ->
      """WITH freqs AS (
        |  SELECT token, count(*) AS freq FROM (
        |    SELECT unnest(string_split(trim(regexp_replace(lower(text),
        |      '\s+', ' ', 'g')), ' ')) AS token
        |    FROM documents)
        |  GROUP BY 1),
        |ranked AS (
        |  SELECT token, freq,
        |    row_number() OVER (ORDER BY freq DESC, token) AS rank
        |  FROM freqs)
        |SELECT rank, token, freq, freq * rank AS freq_rank_product
        |FROM ranked WHERE rank <= 30 ORDER BY rank""".stripMargin,


    // Same stopword-score predictor as the text_langid oracle, joined
    // back to the declared label.
    "langid_confusion" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id,
        |    len(list_filter(toks, t -> t IN ('the','and','of','to','a','in','is','it','for','on'))) AS s_en,
        |    len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein','mit','zu','den'))) AS s_de,
        |    len(list_filter(toks, t -> t IN ('el','la','de','que','y','en','un','es','por','los'))) AS s_es,
        |    len(list_filter(toks, t -> t IN ('le','la','de','et','un','est','pour','que','dans','les'))) AS s_fr
        |  FROM s),
        |pred AS (
        |  SELECT doc_id,
        |    CASE WHEN s_en = greatest(s_en, s_de, s_es, s_fr) AND s_en > 0 THEN 'en'
        |         WHEN s_de = greatest(s_en, s_de, s_es, s_fr) AND s_de > 0 THEN 'de'
        |         WHEN s_es = greatest(s_en, s_de, s_es, s_fr) AND s_es > 0 THEN 'es'
        |         WHEN s_fr = greatest(s_en, s_de, s_es, s_fr) AND s_fr > 0 THEN 'fr'
        |         ELSE 'und' END AS lang_pred
        |  FROM sc)
        |SELECT d.lang, p.lang_pred, count(*) AS n_docs,
        |  CAST(sum(d.doc_id) AS BIGINT) AS id_checksum
        |FROM documents d JOIN pred p USING (doc_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,


    // Exact bigram/unigram counts; PMI ships as the floor-scaled ratio.
    "pmi_collocations" ->
      """WITH tk AS (
        |  SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ',
        |    'g')), ' ') AS s
        |  FROM documents),
        |bg AS (
        |  SELECT unnest([s[i] || ' ' || s[i+1]
        |                 for i in range(1, len(s))]) AS g FROM tk),
        |bc AS (
        |  SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2,
        |    count(*) AS c_xy
        |  FROM bg GROUP BY 1, 2),
        |u AS (
        |  SELECT w, count(*) AS c
        |  FROM (SELECT unnest(s) AS w FROM tk) GROUP BY 1),
        |tot AS (SELECT CAST(sum(c_xy) AS BIGINT) AS b_tot FROM bc)
        |SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
        |  CAST(x.c AS BIGINT) AS c_x, CAST(y.c AS BIGINT) AS c_y,
        |  CAST((CAST(c_xy AS HUGEINT) * b_tot * 1000000)
        |       // (x.c * y.c) AS BIGINT)
        |    AS pmi_scaled
        |FROM bc JOIN u x ON bc.w1 = x.w JOIN u y ON bc.w2 = y.w, tot
        |WHERE c_xy >= 5
        |ORDER BY pmi_scaled DESC, w1, w2 LIMIT 50""".stripMargin,


    // Same occurrence-counting n-gram stream against the same literal
    // dictionary; top doc via the identical (n DESC, doc_id) rank.
    "dictionary_phrase_tagging" ->
      """WITH dict(category, phrase) AS (VALUES
        |  ('storage', 'table'), ('storage', 'row scan'),
        |  ('storage', 'column'), ('engine', 'query'),
        |  ('engine', 'sort merge'), ('engine', 'hash join'),
        |  ('stream', 'stream'), ('stream', 'window'), ('stream', 'batch')),
        |tk AS (
        |  SELECT doc_id, string_split(trim(regexp_replace(lower(text),
        |    '\s+', ' ', 'g')), ' ') AS s
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, unnest(s) AS phrase FROM tk
        |  UNION ALL
        |  SELECT doc_id, unnest([s[i] || ' ' || s[i+1]
        |                         for i in range(1, len(s))]) AS phrase
        |  FROM tk WHERE len(s) >= 2),
        |m AS (
        |  SELECT doc_id, category, count(*) AS n
        |  FROM grams JOIN dict USING (phrase)
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT doc_id, category, n,
        |    row_number() OVER (PARTITION BY category
        |      ORDER BY n DESC, doc_id) AS rk
        |  FROM m)
        |SELECT category, count(*) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_matches,
        |  max(CASE WHEN rk = 1 THEN doc_id END) AS top_doc_id,
        |  CAST(max(CASE WHEN rk = 1 THEN n END) AS BIGINT)
        |    AS top_doc_matches
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
