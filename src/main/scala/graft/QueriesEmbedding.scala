package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, Dedup, IntervalJoin, QualityGates, Resample,
  Sessionize, Similarity, TextAnalysis, Watermark}
import graft.pipeline.Bucketing
import graft.time.{RolloverCalendar, SessionCalendar}

/** Embedding family queries + DuckDB oracles (split from the
  * monolithic SparkEntry in round 12; entry bodies unchanged). */
private[graft] trait QueriesEmbedding extends QueryShared {

  protected def embeddingQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // RAG diversity re-ranking: exact top-8 ANN candidates per query
    // (self excluded) re-ordered by maximal marginal relevance (λ=0.5,
    // 3 picks) so near-duplicate passages don't crowd the context
    // window. Sequential only in the pick dimension (3 unrolled
    // candidate-sized stages), parallel across queries; relevance and
    // pairwise sims enter the score rounded to 6 decimals, so the
    // greedy argmax is reproducible in any engine (ranks are emitted,
    // scores stay internal).
    "rag_mmr_rerank" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val q = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      val top = graft.ops.Similarity.topKBruteForce(
          emb.join(q.select(col("query_id").as("vec_id")), Seq("vec_id"), "left_anti"),
          q, k = 8)
      val cand = top
        .select(col("query_id"), col("vec_id"), col("sim").as("rel"))
        .join(emb, "vec_id")
        .select(col("query_id"), col("vec_id"), col("rel"), col("embedding"))
        // candidates are (queries × k) rows but every MMR iteration
        // re-reads them — cache so the corpus-wide ANN scoring runs once,
        // not once per unrolled pick stage
        .cache()
      graft.ops.Mmr.rerank(cand, picks = 3, lambda = 0.5)
        .select(col("query_id"), col("mmr_rank"), col("vec_id"))
        .orderBy("query_id", "mmr_rank")
    },


    // Exact brute-force cosine top-5 for a 10-query batch.
    "embed_topk_bruteforce" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      Similarity.topKBruteForce(emb, q, k = 5).orderBy("query_id", "rank")
    },


    // ANN IVF with the same recall@1-on-near-dup-queries bound: a query
    // ≈ its source vector lands in the source's centroid cell (or an
    // adjacent one — nProbe=3 covers Voronoi-boundary cases), so the
    // probed cells contain the true neighbour with high probability
    // while scanning ~nProbe/k of the corpus. Same oracle contract as
    // embed_topk_lsh.
    "embed_topk_ivf" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val centroids = graft.ops.Ivf.trainCentroids(emb, k = 16, iters = 1)
      val q = perturbedQueries(emb)
      val exact = Similarity.topKBruteForce(emb, q, k = 5)
      val ann = graft.ops.Ivf.topK(emb, q, centroids, k = 5, nProbe = 3)
      withRecallOk(exact, ann)
    },


    // The SERVING shape of IVF at 100 TB: the index is not an in-memory
    // structure but the STORAGE LAYOUT — embeddings written once
    // partitioned by cell id (with their trained centroids beside them),
    // so a query's nProbe cells prune to a handful of partition
    // DIRECTORIES at scan time and the cluster reads only those. The
    // probed cell-id list is queries×nProbe ids (≤ 30 — a documented
    // driver-bounded collect, the IVF analog of the k-means centroid
    // precedent); everything else is the same broadcast-rerank as the
    // in-memory path, and the same planted-recall oracle applies.
    "ann_persisted_ivf_index" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val root = stagedIvf.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_ivf")
          val emb = Tables.embeddings(s, d)
          val centroids = graft.ops.Ivf.trainCentroids(emb, k = 16, iters = 1)
          centroids.coalesce(1).write.parquet(s"$tmp/centroids")
          graft.ops.Ivf.assignCells(emb, "embedding", centroids, n = 1)
            .write.partitionBy("cid").parquet(s"$tmp/index")
          tmp
        })
      val emb = Tables.embeddings(s, d)
      val centroids = s.read.parquet(s"$root/centroids")
      val q = perturbedQueries(emb)
      val queryCells = graft.ops.Ivf.assignCells(q, "query_vec",
        centroids, n = 3)
      val needed = queryCells.select("cid").distinct()
        .collect().map(_.getInt(0)).sorted
      val scanned = s.read.parquet(s"$root/index")
        .filter(col("cid").isin(needed.map(Int.box): _*))
      val ann = scanned.join(broadcast(queryCells), "cid")
        .withColumn("sim", Similarity.cosine(col("embedding"), col("query_vec")))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("query_id")).orderBy(desc("sim"), col("vec_id"))))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("sim"), 6).as("sim"))
      val exact = Similarity.topKBruteForce(emb, q, k = 5)
      withRecallOk(exact, ann)
    },


    // Incremental ANN-INDEX maintenance — the append path of a persisted
    // IVF layout, completing the IVM family on the vector side
    // (components, join, and top-k deltas exist; this is the index
    // delta): "yesterday's" cell assignment of the base corpus is held
    // as a cell-partitioned layout (staged once, exactly as a deployment
    // materializes it), and when the 10% delta batch of new vectors
    // arrives, ONLY the delta is assigned — against the same stored
    // seed centroids — and merged with the layout. Cost ∝ |delta|; the
    // base corpus is never rescanned, re-embedded, or re-clustered.
    // The oracle assigns EVERY vector from scratch, so the green hash
    // proves append ≡ rebuild per cell. Similarity runs on integer-
    // quantized vectors (round(x·100), the int8-quantization-family
    // precedent) so the argmax is engine-portable — float cosine
    // near-ties could legally differ between engines. Assignment is the
    // assignCells shape: 16 literal seed vectors, per-row in-row argmax
    // (array_min over (−sim, cid) structs), zero exchanges; the seed
    // collect is 16×64 longs — centroid-sized, never data.
    "ivm_ivf_append" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"),
        transform(col("embedding"),
          x => round(x.cast("double") * 100).cast("long")).as("qv"))
      val seeds = emb.filter(col("vec_id") < 16)
        .collect().map(r => (r.getLong(0).toInt, r.getSeq[Long](1).toArray))
        .sortBy(_._1)
      def cellOf(qv: Column): Column = {
        val cands = seeds.map { case (cid, sv) =>
          struct(
            (-aggregate(zip_with(qv, lit(sv), (a, b) => a * b),
              lit(0L), (acc, x) => acc + x)).as("negSim"),
            lit(cid).as("cid"))
        }
        array_min(array(cands.toSeq: _*)).getField("cid")
      }
      val root = stagedIvmIvf.computeIfAbsent(s"${sessionTag(s)}:$d", _ => {
        val tmp = stagedTmpDir("graft_ivm_ivf")
        emb.filter(pmod(col("vec_id"), lit(10L)) =!= 0L)
          .select(col("vec_id"), cellOf(col("qv")).as("cid"))
          .write.partitionBy("cid").parquet(s"$tmp/index")
        tmp
      })
      val stored = s.read.parquet(s"$root/index")
        .select(col("vec_id"), col("cid"), lit(0L).as("is_new"))
      val delta = emb.filter(pmod(col("vec_id"), lit(10L)) === 0L)
        .select(col("vec_id"), cellOf(col("qv")).as("cid"),
          lit(1L).as("is_new"))
      stored.unionByName(delta)
        .groupBy("cid")
        .agg(count(lit(1)).as("n_vectors"), sum("is_new").as("n_new"),
          sum("vec_id").as("id_checksum"))
        .orderBy("cid")
    },


    "embed_topk_ivf_exact" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val centroids = graft.ops.Ivf.trainCentroids(emb, k = 16, iters = 1)
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      graft.ops.Ivf.topK(emb, q, centroids, k = 5, nProbe = 16)
        .orderBy("query_id", "rank")
    },


    // End-to-end retrieval (the RAG read path): perturbed queries →
    // exact cosine top-3 over the embedding corpus → fetch the matched
    // documents' text by the shared id. The ANN arm is the established
    // exact scorer (broadcast queries, partial top-k); the fetch is one
    // equality join against the documents table — at scale the id join
    // is the point: candidates travel as ids, text is fetched once for
    // k·|queries| rows, never for the corpus.
    "rag_retrieve_docs" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val hits = Similarity.topKBruteForce(emb, perturbedQueries(emb), k = 3)
      hits.join(Tables.documents(s, d),
          hits("vec_id") === col("doc_id"))
        .select(col("query_id"), col("rank"), col("doc_id"), col("lang"),
          substring(col("text"), 1, 40).as("snippet"), col("sim"))
        .orderBy("query_id", "rank")
    },


    // One Lloyd step of k-means, driver-checked: assign every vector to
    // its nearest seed centroid (in-row codegen argmax — zero exchanges),
    // then recompute per-cell per-dimension means. This is exactly the
    // update [[Ivf.trainCentroids]] iterates; the only shuffles are the
    // (cid, pos) partial aggregate and the final order-by.
    "kmeans_update_centroids" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      graft.ops.Ivf.assignCells(emb, "embedding", cents, n = 1)
        .select(col("cid"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(count(lit(1)).as("n"),
          round(avg(col("v").cast("double")), 6).as("mean"))
        .orderBy("cid", "pos")
    },


    // Symmetric per-vector int8 quantization (max-abs scale) — the 4×
    // shrink before writing an ANN corpus; map-only, zero shuffle. The
    // oracle checks every lane through exact integer checksums.
    "embed_quantize_int8" -> { (s, d) =>
      val q = graft.ops.Quantize.int8Lanes(col("embedding"))
      Tables.embeddings(s, d).select(col("vec_id"),
        round(graft.ops.Quantize.maxAbs(col("embedding")), 6).as("scale"),
        aggregate(q, lit(0L), (a, x) => a + x).as("q_sum"),
        array_min(q).as("q_min"),
        array_max(q).as("q_max"))
        .orderBy("vec_id")
    },


    // Columnar array analytics: per-dimension mean/extremes across the
    // embedding corpus — posexplode + groupBy(dim), one shuffle of
    // (dim, partial agg), never the vectors themselves.
    "embed_dim_stats" -> { (s, d) =>
      Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"),
          round(avg(col("v").cast("double")), 6).as("mean"),
          round(min(col("v").cast("double")), 6).as("lo"),
          round(max(col("v").cast("double")), 6).as("hi"))
        .orderBy("dim")
    },


    // Hashing-trick featurization (Weinberger et al., ICML 2009): each
    // token hashes to one of 64 buckets with a ±1 sign bit, so the
    // feature space is fixed-width regardless of vocabulary — the
    // standard way to featurize an unbounded token space at 100 TB (no
    // vocabulary broadcast, no OOV path, one token-level exchange with
    // map-side combine). Hash = the oracle-portable md5Hash64
    // (= DuckDB md5_number_upper; xxhash64 stays the documented scale
    // default, same twin convention as dedup_simhash_pairs). bucket and
    // sign read single bit ranges of the hash, so signed-vs-unsigned
    // representation changes no bit. Emitted per doc: nonzero count, L1
    // mass, and a bucket-weighted checksum — exact integers that pin
    // every signed bucket count without emitting |docs|×64 rows.
    "feature_hash_vectors" -> { (s, d) =>
      val h = graft.ops.Dedup.md5Hash64(col("token"))
      Tables.documents(s, d)
        .repartition(shuffleWidth(s), col("doc_id")) // parallelize the tokenize explode
        .select(col("doc_id"),
          explode(graft.ops.Dedup.tokens(col("text"))).as("token"))
        .select(col("doc_id"),
          pmod(h, lit(64)).cast("int").as("bucket"),
          (lit(1L) - shiftright(h, 6).bitwiseAND(lit(1L)) * lit(2L))
            .as("sign"))
        .groupBy("doc_id", "bucket").agg(sum("sign").as("v"))
        .filter(col("v") =!= 0)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nnz"), sum(abs(col("v"))).as("l1"),
          sum(col("bucket") * col("v")).as("checksum"))
        .orderBy("doc_id")
    },


    // NOT IN vs NOT EXISTS under a NULL-bearing subquery — the ANSI
    // tri-valued-logic audit as a data op. The exclusion list derives a
    // NULL from the data's own rule (nullif on one member), and the
    // three forms disagree by design: NOT IN returns ZERO rows (x <>
    // NULL is UNKNOWN, so no row ever passes), NOT EXISTS ignores the
    // NULL member (its equality never matches, so that nation's
    // customers are NOT excluded), and the null-guarded NOT IN restores
    // the NOT EXISTS count. Production rule this encodes: never NOT IN
    // against a nullable key — an anti-join that silently returns empty
    // is the classic pipeline-eats-the-table bug.
    "not_in_null_semantics" -> { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("nin_customer")
      Tables.nation(s, d).createOrReplaceTempView("nin_nation")
      s.sql("""
        WITH excl AS (
          SELECT nullif(n_nationkey, 10) AS k FROM nin_nation
          WHERE n_regionkey = 0)
        SELECT 'not_in' AS form, count(*) AS cnt FROM nin_customer
        WHERE c_nationkey NOT IN (SELECT k FROM excl)
        UNION ALL
        SELECT 'not_exists', count(*) FROM nin_customer c
        WHERE NOT EXISTS (SELECT 1 FROM excl e WHERE e.k = c.c_nationkey)
        UNION ALL
        SELECT 'not_in_nonnull', count(*) FROM nin_customer
        WHERE c_nationkey NOT IN (SELECT k FROM excl WHERE k IS NOT NULL)
        ORDER BY form""")
    },


    // Product-quantization code assignment (Jégou et al., TPAMI 2011):
    // the 64-dim space splits into 4 16-dim subspaces, each vector's
    // sub-block snaps to the nearest of 16 codebook entries (first 16
    // vectors, the same data-derived-codebook convention as the IVF
    // centroids) — 64 floats compress to 4 codes. Zero-shuffle per row:
    // the codebook broadcasts, the argmin is min(struct(dist, code))
    // per (vector, subspace) with the code tiebreak making equal
    // distances deterministic. Exact-L2 doubles in array order — both
    // engines sum the same sequence, so assignments hash-match.
    "embed_pq_assign" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cb = emb.filter(col("vec_id") < 16)
        .select(col("vec_id").cast("int").as("code"),
          col("embedding").as("cv"))
      emb.select(col("vec_id"), explode(expr("sequence(0, 3)")).as("sub"),
          col("embedding"))
        .join(broadcast(cb))
        .withColumn("dist", expr(
          """aggregate(zip_with(slice(embedding, sub * 16 + 1, 16),
                                slice(cv, sub * 16 + 1, 16),
                                (x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) *
                                          (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),
                       CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"""))
        .groupBy("vec_id", "sub")
        .agg(min(struct(col("dist"), col("code"))).as("m"))
        .select(col("vec_id"), col("sub"), col("m.code").as("code"))
        .orderBy("vec_id", "sub")
    },


    // ANN retrieval quality as a driver-checked metric: MRR / hit@10 of
    // the IVF path (nProbe = 3 over the 8 data-derived cells) against
    // the exact top-1 ground truth, per query (vectors 100–115).
    // rank = 0 records a miss; rr is the exact integer micro-reciprocal.
    // nProbe = 1 measured 2/16 hits on these unclustered synthetic
    // vectors, nProbe = 3 gives 8/16 — a mid-range operating point
    // where the metric actually discriminates (the config choice is the
    // same recall-vs-scan-bound dial documented on Ivf). The exact
    // referee is query-side only (16 × corpus), never corpus × corpus.
    "ann_mrr_hit_at_k" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("cv"))
      val sim = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          graft.ops.Similarity.cosine(col("embedding"), col("cv")).as("s"))
      val wCell = Window.partitionBy("vec_id").orderBy(desc("s"), col("cid"))
      val asg = sim.withColumn("rn", row_number().over(wCell))
        .filter(col("rn") === 1).select(col("vec_id"), col("cid"))
      val qcells = sim.filter(col("vec_id").between(100, 115))
        .withColumn("rn", row_number().over(wCell))
        .filter(col("rn") <= 3).select(col("vec_id").as("qid"), col("cid"))
      val qs = emb.filter(col("vec_id").between(100, 115))
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val ex = emb.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("tid"),
          graft.ops.Similarity.cosine(col("qv"), col("embedding")).as("s"))
        .cache()
      val wQ = Window.partitionBy("qid").orderBy(desc("s"), col("tid"))
      val truth = ex.withColumn("rn", row_number().over(wQ))
        .filter(col("rn") === 1).select(col("qid"), col("tid").as("truth_id"))
      val ranked = ex
        .join(qcells, Seq("qid"))
        .join(asg.select(col("vec_id").as("tid"), col("cid")), Seq("tid", "cid"))
        .withColumn("rk", row_number().over(wQ))
      truth.join(ranked.filter(col("rk") <= 10)
          .select(col("qid"), col("tid").as("truth_id"), col("rk")),
          Seq("qid", "truth_id"), "left")
        .select(col("qid"), col("truth_id"),
          coalesce(col("rk").cast("long"), lit(0L)).as("rank_in_ivf"),
          coalesce(expr("1000000 DIV rk"), lit(0L)).as("rr_micro"),
          when(col("rk").isNotNull, 1L).otherwise(0L).as("hit_at_10"))
        .orderBy("qid")
    },


    // Top-N-with-ties semantics audit: "top-3 lineitems by quantity per
    // part" under row_number (exactly 3), rank (ties at the boundary
    // spill in, gaps after), and dense_rank (every tied LEVEL counts as
    // one) — three different row counts from the same English sentence,
    // quantified with checksums. Quantities tie constantly (small
    // integers), so the three forms genuinely diverge here — the
    // classic silent over/under-delivery bug in top-N reports.
    "rank_semantics_audit" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("l_partkey")
        .orderBy(desc("l_quantity"), col("l_orderkey"), col("l_linenumber"))
      val wt = Window.partitionBy("l_partkey").orderBy(desc("l_quantity"))
      val li = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"), col("l_orderkey"),
          col("l_linenumber"))
        .withColumn("rn", row_number().over(w))
        .withColumn("rk", rank().over(wt))
        .withColumn("dr", dense_rank().over(wt))
        .cache()
      def form(name: String, cond: Column) = li.filter(cond)
        .agg(lit(name).as("form"), count(lit(1)).as("n_rows"),
          sum(col("l_orderkey") + col("l_linenumber")).as("checksum"))
        .select("form", "n_rows", "checksum")
      form("dense_rank", col("dr") <= 3)
        .union(form("rank", col("rk") <= 3))
        .union(form("row_number", col("rn") <= 3))
        .orderBy("form")
    },


    // Hodges-Lehmann location-shift estimator between the purchase and
    // click daily-revenue distributions: the LOWER median (rank
    // ⌊(m+1)/2⌋ — deterministic, no .5 interpolation) of all pairwise
    // differences, exact cents. The pairwise stage is days×days
    // (bounded by the calendar window, broadcast); the value at the
    // median rank is well-defined under ties because the order key IS
    // the value. The robust "how much more does a purchase-day gross"
    // answer that a mean difference gets wrong under heavy tails.
    "hodges_lehmann_daily_shift" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
      def dailyRev(t: String, out: String) =
        ev.filter(col("event_type") === t)
          .groupBy(to_date(col("ts")).as(out + "_day"))
          .agg(sum(floor(col("value") * 100)).as(out + "_rev"))
      val diffs = dailyRev("purchase", "p")
        .crossJoin(broadcast(dailyRev("click", "c")))
        .select((col("p_rev") - col("c_rev")).as("diff"))
      val tot = diffs.agg(count(lit(1)).as("n_pairs"))
      diffs.withColumn("rn", row_number().over(Window.orderBy("diff")))
        .crossJoin(broadcast(tot))
        .filter(col("rn") === expr("(n_pairs + 1) DIV 2"))
        .select(col("n_pairs"), col("diff").as("hl_shift_cents"))
    },


    // Quantile DEFINITION audit at p50/p90 per event type: nearest-rank
    // (percentile_disc's ceil), the lower type-1 value, and linear
    // interpolation held EXACT by the ×100 trick — interp×100 =
    // 100·x_k + r·(x_{k+1} − x_k) with r = (n−1)·p mod 100 — so three
    // "the median" answers that genuinely differ sit side by side with
    // no float interpolation anywhere. The practical complement of
    // rank_semantics_audit: same English, three numbers.
    "quantile_semantics_audit" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 100).as("cents"))
      val ranked = ev.withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy("cents", "event_id")))
      val targets = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(s.range(2)
          .select((col("id") * 40 + 50).as("p"))))
        .withColumn("k_disc", expr("(p * n + 99) DIV 100"))
        .withColumn("k_low", expr("1 + ((n - 1) * p) DIV 100"))
        .withColumn("r", expr("((n - 1) * p) % 100"))
        .withColumn("k_high",
          expr("least(n, k_low + CASE WHEN r > 0 THEN 1 ELSE 0 END)"))
      targets
        .join(ranked.select(col("event_type").as("et1"), col("rn"),
          col("cents").as("x_disc")),
          col("event_type") === col("et1") && col("k_disc") === col("rn"))
        .drop("et1", "rn")
        .join(ranked.select(col("event_type").as("et2"), col("rn"),
          col("cents").as("x_low")),
          col("event_type") === col("et2") && col("k_low") === col("rn"))
        .drop("et2", "rn")
        .join(ranked.select(col("event_type").as("et3"), col("rn"),
          col("cents").as("x_high")),
          col("event_type") === col("et3") && col("k_high") === col("rn"))
        .drop("et3", "rn")
        .select(col("event_type"), col("p"), col("n"),
          col("x_disc").as("disc_cents"),
          col("x_low").as("lower_cents"),
          (lit(100L) * col("x_low") +
            col("r") * (col("x_high") - col("x_low")))
            .as("interp_cents_x100"))
        .orderBy("event_type", "p")
    },


    // Sparse-vector / AboveThreshold replay (Dwork & Roth Alg. 1, the
    // non-refreshing variant): daily event counts probed against a
    // noisy threshold (mean count + two-sided geometric noise — the
    // same trailing-zeros-of-keyed-md5 mechanism as
    // dp_geometric_noise_histogram, deterministic so the MECHANISM is
    // hash-checkable), per-day query noise keyed by the date string,
    // and only the FIRST 5 above-threshold days are released — the
    // privacy win of SVT is that the non-released comparisons cost
    // nothing. Threshold refresh after each release is the sequential
    // part deliberately traded away; documented, standard composition.
    "dp_sparse_vector_replay" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val md5h: Column => Column = graft.ops.Dedup.md5Hash64
      def tz(seed: String, key: Column): Column = {
        val h = md5h(concat(lit(seed), key)).bitwiseAND(lit(Long.MaxValue))
        (length(conv(h.bitwiseAND(-h), 10, 2)) - 1).cast("long")
      }
      val daily = Tables.events(s, d)
        .groupBy(date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("true_count"))
      // integer mean via DIV: Spark's `/` then cast truncates while
      // DuckDB's CAST(double) rounds — floor division sidesteps both
      val thr = daily.agg(sum("true_count").as("s"),
          count(lit(1)).as("n"))
        .select(expr("s DIV n").as("t"))
        .select(col("t"),
          (col("t") + tz("svtT1|", lit("T")) - tz("svtT2|", lit("T")))
            .as("tn"))
      daily.crossJoin(broadcast(thr))
        .withColumn("noisy_count", col("true_count") +
          tz("svtq1|", col("day")) - tz("svtq2|", col("day")))
        .filter(col("noisy_count") >= col("tn"))
        .withColumn("hit_rank", row_number().over(Window.orderBy("day")))
        .filter(col("hit_rank") <= 5)
        .select(col("day"), col("true_count"), col("noisy_count"),
          col("t").as("threshold"), col("tn").as("noisy_threshold"),
          col("hit_rank"))
        .orderBy("day")
    },


    // IVF recall-vs-probes tuning curve: the 16 benchmark queries
    // retrieved at nProbe ∈ {1,2,4,8}, recall@10 against the in-query
    // exact top-10 — the monotone table an ANN operator is tuned from
    // (recall climbs toward 1000‰ as probes widen; the knee picks the
    // production setting). Query-cell ranks are computed once at the
    // widest probe depth and filtered per config, so the whole sweep
    // is ONE candidate join + one window, not four retrieval runs.
    "ivf_recall_curve" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("cv"))
      val sim = emb.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("cid"),
          graft.ops.Similarity.cosine(col("embedding"), col("cv")).as("s"))
      val wCell = Window.partitionBy("vec_id").orderBy(desc("s"), col("cid"))
      val corpusCell = sim.withColumn("rn", row_number().over(wCell))
        .filter(col("rn") === 1).select(col("vec_id").as("tid"), col("cid"))
      val qcells = sim.filter(col("vec_id").between(100, 115))
        .withColumn("crank", row_number().over(wCell))
        .filter(col("crank") <= 8)
        .select(col("vec_id").as("qid"), col("cid"), col("crank"))
      val qs = emb.filter(col("vec_id").between(100, 115))
        .select(col("vec_id").as("qid"), col("embedding").as("qv"))
      val ex = emb.crossJoin(broadcast(qs))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("tid"),
          graft.ops.Similarity.cosine(col("qv"), col("embedding")).as("s"))
        .cache()
      val wQ = Window.partitionBy("qid").orderBy(desc("s"), col("tid"))
      val exact = ex.withColumn("rk", row_number().over(wQ))
        .filter(col("rk") <= 10).select(col("qid"), col("tid"))
      val configs = s.range(4)
        .select(expr("shiftleft(1, CAST(id AS INT))").as("np"))
      val retrieved = ex
        .join(qcells, "qid")
        .join(corpusCell, Seq("tid", "cid"))
        .crossJoin(broadcast(configs))
        .filter(col("crank") <= col("np"))
        .withColumn("rk", row_number().over(Window
          .partitionBy("np", "qid").orderBy(desc("s"), col("tid"))))
        .filter(col("rk") <= 10)
        .select(col("np"), col("qid"), col("tid"))
      retrieved.join(exact, Seq("qid", "tid"))
        .groupBy("np").agg(count(lit(1)).as("sum_hits"))
        .withColumn("n_queries", lit(16L))
        .withColumn("recall_permille",
          expr("(1000 * sum_hits) DIV (10 * n_queries)"))
        .select("np", "n_queries", "sum_hits", "recall_permille")
        .orderBy("np")
    },


    // Query-directed multi-probe LSH (Lv et al. 2007): ONE 10-plane
    // table, with each query probing its own bucket plus all subset-
    // flips of its 3 smallest-margin hyperplanes (8 probes) — the
    // recall of ~8 independent tables while the corpus is hashed once.
    // At the persisted-layout scale this is the difference between
    // storing the index once vs `tables` times. Same planted-near-dup
    // recall@1 ≥ 0.8 oracle contract as embed_topk_lsh.
    "embed_topk_multiprobe" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d)
      val q = perturbedQueries(emb)
      val exact = Similarity.topKBruteForce(emb, q, k = 5)
      val planes = 10
      val c = emb.withColumn("__bkt",
        Similarity.signBucket(col("embedding"), 64, planes))
      val probes = q.withColumn("__bkt", explode(
        Similarity.multiProbeBuckets(col("query_vec"), 64, planes,
          nFlip = 3)))
      val ann = c.join(broadcast(probes), "__bkt")
        .withColumn("sim",
          Similarity.cosine(col("embedding"), col("query_vec")))
        // a candidate found by several probes is one candidate
        .groupBy("query_id", "vec_id").agg(max("sim").as("sim"))
        .withColumn("rank", row_number().over(
          Window.partitionBy("query_id").orderBy(desc("sim"),
            col("vec_id"))))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("vec_id"),
          round(col("sim"), 6).as("sim"))
      withRecallOk(exact, ann)
    }
  )

  protected def embeddingOracles: Map[String, String] = Map(

    // Same candidate set (top-8 by raw cosine, self excluded, rounded
    // rel), pairwise sims among candidates, then the three greedy picks
    // unrolled; all score inputs are the identical rounded doubles.
    "rag_mmr_rerank" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |sc AS (
        |  SELECT q.query_id, a.vec_id, a.embedding,
        |    list_sum([a.embedding[i]::DOUBLE * q.qv[i]::DOUBLE
        |              for i in range(1, len(a.embedding) + 1)]) /
        |    (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
        |                    for i in range(1, len(a.embedding) + 1)])) *
        |     sqrt(list_sum([q.qv[i]::DOUBLE * q.qv[i]::DOUBLE
        |                    for i in range(1, len(q.qv) + 1)]))) AS rawsim
        |  FROM embeddings a CROSS JOIN q WHERE a.vec_id <> q.query_id),
        |cand AS (
        |  SELECT query_id, vec_id, round(rawsim, 6) AS rel FROM (
        |    SELECT query_id, vec_id, rawsim,
        |      row_number() OVER (PARTITION BY query_id
        |                         ORDER BY rawsim DESC, vec_id) AS rn
        |    FROM sc) WHERE rn <= 8),
        |pw AS (
        |  SELECT c1.query_id, c1.vec_id AS a, c2.vec_id AS b,
        |    round(list_sum([e1.embedding[i]::DOUBLE * e2.embedding[i]::DOUBLE
        |              for i in range(1, len(e1.embedding) + 1)]) /
        |    (sqrt(list_sum([e1.embedding[i]::DOUBLE * e1.embedding[i]::DOUBLE
        |                    for i in range(1, len(e1.embedding) + 1)])) *
        |     sqrt(list_sum([e2.embedding[i]::DOUBLE * e2.embedding[i]::DOUBLE
        |                    for i in range(1, len(e2.embedding) + 1)]))), 6) AS s
        |  FROM cand c1 JOIN cand c2
        |    ON c1.query_id = c2.query_id AND c1.vec_id <> c2.vec_id
        |  JOIN embeddings e1 ON e1.vec_id = c1.vec_id
        |  JOIN embeddings e2 ON e2.vec_id = c2.vec_id),
        |p1 AS (
        |  SELECT query_id, vec_id, rel FROM cand
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |                             ORDER BY rel DESC, vec_id) = 1),
        |s2 AS (
        |  SELECT c.query_id, c.vec_id, c.rel,
        |    0.5 * c.rel - 0.5 * w1.s AS score
        |  FROM cand c
        |  JOIN p1 ON c.query_id = p1.query_id AND c.vec_id <> p1.vec_id
        |  JOIN pw w1 ON w1.query_id = c.query_id AND w1.a = c.vec_id
        |             AND w1.b = p1.vec_id),
        |p2 AS (
        |  SELECT query_id, vec_id, rel FROM s2
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |                             ORDER BY score DESC, vec_id) = 1),
        |s3 AS (
        |  SELECT c.query_id, c.vec_id,
        |    0.5 * c.rel - 0.5 * greatest(w1.s, w2.s) AS score
        |  FROM cand c
        |  JOIN p1 ON c.query_id = p1.query_id AND c.vec_id <> p1.vec_id
        |  JOIN p2 ON c.query_id = p2.query_id AND c.vec_id <> p2.vec_id
        |  JOIN pw w1 ON w1.query_id = c.query_id AND w1.a = c.vec_id
        |             AND w1.b = p1.vec_id
        |  JOIN pw w2 ON w2.query_id = c.query_id AND w2.a = c.vec_id
        |             AND w2.b = p2.vec_id),
        |p3 AS (
        |  SELECT query_id, vec_id FROM s3
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |                             ORDER BY score DESC, vec_id) = 1)
        |SELECT query_id, 1 AS mmr_rank, vec_id FROM p1
        |UNION ALL SELECT query_id, 2, vec_id FROM p2
        |UNION ALL SELECT query_id, 3, vec_id FROM p3
        |ORDER BY query_id, mmr_rank""".stripMargin,


    "embed_topk_bruteforce" -> topk5OracleSql,

    "embed_topk_ivf" -> topk5PerturbedOracleSql,

    // The disk-layout IVF path answers the same queries under the same
    // recall bound.
    "ann_persisted_ivf_index" -> topk5PerturbedOracleSql,

    // From-scratch assignment of EVERY vector to its argmax-quantized-
    // dot seed cell (sim DESC, cid tiebreak — the engine's (−sim, cid)
    // struct-min); per-cell counts/new-counts/checksums. Equality proves
    // the engine's delta-only append ≡ a full index rebuild.
    "ivm_ivf_append" ->
      """WITH q AS (
        |  SELECT vec_id,
        |    [CAST(round(embedding[i]::DOUBLE * 100) AS BIGINT)
        |     for i in range(1, len(embedding) + 1)] AS qv
        |  FROM embeddings),
        |seeds AS (SELECT vec_id AS cid, qv AS sv FROM q WHERE vec_id < 16),
        |sims AS (
        |  SELECT v.vec_id, s.cid,
        |    list_sum([v.qv[i] * s.sv[i]
        |              for i in range(1, len(v.qv) + 1)]) AS sim
        |  FROM q v CROSS JOIN seeds s),
        |assign AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT vec_id, cid,
        |      row_number() OVER (PARTITION BY vec_id
        |        ORDER BY sim DESC, cid) AS rk
        |    FROM sims) WHERE rk = 1)
        |SELECT CAST(cid AS INTEGER) AS cid, count(*) AS n_vectors,
        |  CAST(sum(CASE WHEN vec_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  CAST(sum(vec_id) AS BIGINT) AS id_checksum
        |FROM assign GROUP BY 1 ORDER BY 1""".stripMargin,

    "embed_topk_ivf_exact" -> topk5OracleSql,


    // The perturbed-query exact top-3 joined to documents on the shared
    // id; substring is 1-based in both engines.
    "rag_retrieve_docs" ->
      s"""WITH q AS (
        |  SELECT vec_id AS query_id,
        |    ${perturbSqlFor("vec_id", "embedding")} AS qv
        |  FROM embeddings WHERE vec_id < 10),
        |s AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_sum([e.embedding[i]::DOUBLE * q.qv[i]::DOUBLE
        |              for i in range(1, len(e.embedding) + 1)]) /
        |    (sqrt(list_sum([e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE
        |                    for i in range(1, len(e.embedding) + 1)])) *
        |     sqrt(list_sum([q.qv[i]::DOUBLE * q.qv[i]::DOUBLE
        |                    for i in range(1, len(q.qv) + 1)]))) AS sim
        |  FROM embeddings e CROSS JOIN q),
        |r AS (
        |  SELECT query_id, vec_id, sim,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY sim DESC, vec_id) AS rank
        |  FROM s)
        |SELECT r.query_id, r.rank, d.doc_id, d.lang,
        |  substring(d.text, 1, 40) AS snippet, round(r.sim, 6) AS sim
        |FROM r JOIN documents d ON d.doc_id = r.vec_id
        |WHERE r.rank <= 3 ORDER BY query_id, rank""".stripMargin,


    // Same cell-assignment CTE as the SemDeDup oracle, then per-cell
    // per-dimension means (1-based subscripts shifted to Spark's 0-based
    // posexplode, the embed_dim_stats convention).
    "kmeans_update_centroids" ->
      """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS cv
        |      FROM embeddings WHERE vec_id < 8),
        |s AS (
        |  SELECT a.vec_id, c.cid,
        |    list_sum([a.embedding[i]::DOUBLE * c.cv[i]::DOUBLE
        |              for i in range(1, len(a.embedding) + 1)]) /
        |    (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
        |                    for i in range(1, len(a.embedding) + 1)])) *
        |     sqrt(list_sum([c.cv[i]::DOUBLE * c.cv[i]::DOUBLE
        |                    for i in range(1, len(c.cv) + 1)]))) AS sim
        |  FROM embeddings a CROSS JOIN c),
        |asg AS (
        |  SELECT vec_id, cid FROM s
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY sim DESC, cid) = 1),
        |u AS (
        |  SELECT vec_id, unnest(embedding) AS val,
        |    generate_subscripts(embedding, 1) AS pos
        |  FROM embeddings)
        |SELECT a.cid, CAST(u.pos - 1 AS INT) AS pos, count(*) AS n,
        |  round(avg(u.val::DOUBLE), 6) AS mean
        |FROM asg a JOIN u ON u.vec_id = a.vec_id
        |GROUP BY 1, 2 ORDER BY cid, pos""".stripMargin,


    // Lane arithmetic is identical IEEE doubles in both engines; the
    // checksums (sum/min/max of int lanes) are exact integers.
    "embed_quantize_int8" ->
      """WITH m AS (
        |  SELECT vec_id, embedding,
        |    list_max([abs(x::DOUBLE) for x in embedding]) AS s
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, s,
        |    [CASE WHEN s = 0 THEN 0
        |          ELSE CAST(round(x::DOUBLE / s * 127) AS INT) END
        |     for x in embedding] AS qv
        |  FROM m)
        |SELECT vec_id, round(s, 6) AS scale,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  list_min(qv) AS q_min,
        |  list_max(qv) AS q_max
        |FROM q ORDER BY vec_id""".stripMargin,


    "embed_dim_stats" ->
      """SELECT CAST(u.pos - 1 AS INT) AS dim, count(*) AS n,
        |  round(avg(u.val::DOUBLE), 6) AS mean,
        |  round(min(u.val::DOUBLE), 6) AS lo,
        |  round(max(u.val::DOUBLE), 6) AS hi
        |FROM (SELECT unnest(embedding) AS val,
        |        generate_subscripts(embedding, 1) AS pos
        |      FROM embeddings) u
        |GROUP BY 1 ORDER BY dim""".stripMargin,


    // md5_number_upper IS md5Hash64; (h % 64) and (h >> 6) & 1 read the
    // identical bit ranges on the unsigned view.
    "feature_hash_vectors" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(trim(regexp_replace(
        |    lower(text), '\s+', ' ', 'g')), ' ')) AS token
        |  FROM documents),
        |h AS (SELECT doc_id, md5_number_upper(token) AS h FROM toks),
        |b AS (SELECT doc_id, CAST(h % 64 AS INTEGER) AS bucket,
        |        1 - 2 * CAST((h >> 6) & 1 AS BIGINT) AS sign
        |      FROM h),
        |v AS (SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS v
        |      FROM b GROUP BY 1, 2 HAVING sum(sign) <> 0)
        |SELECT doc_id, count(*) AS nnz, CAST(sum(abs(v)) AS BIGINT) AS l1,
        |  CAST(sum(bucket * v) AS BIGINT) AS checksum
        |FROM v GROUP BY 1 ORDER BY doc_id""".stripMargin,


    // Both engines implement the same ANSI tri-valued logic; the three
    // counts are the audit.
    "not_in_null_semantics" ->
      """WITH excl AS (
        |  SELECT nullif(n_nationkey, 10) AS k FROM nation
        |  WHERE n_regionkey = 0)
        |SELECT 'not_in' AS form, count(*) AS cnt FROM customer
        |WHERE c_nationkey NOT IN (SELECT k FROM excl)
        |UNION ALL
        |SELECT 'not_exists', count(*) FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM excl e WHERE e.k = c.c_nationkey)
        |UNION ALL
        |SELECT 'not_in_nonnull', count(*) FROM customer
        |WHERE c_nationkey NOT IN (SELECT k FROM excl WHERE k IS NOT NULL)
        |ORDER BY form""".stripMargin,


    // Exact-L2 argmin per (vector, 16-dim sub-block) against the first-16
    // codebook; dist ties break on code.
    "embed_pq_assign" ->
      """WITH cb AS (SELECT CAST(vec_id AS INTEGER) AS code, embedding AS cv
        |  FROM embeddings WHERE vec_id < 16),
        |d AS (
        |  SELECT e.vec_id, sub.s AS sub, cb.code,
        |    list_sum([ (e.embedding[i]::DOUBLE - cb.cv[i]::DOUBLE) *
        |               (e.embedding[i]::DOUBLE - cb.cv[i]::DOUBLE)
        |               for i in range(1 + sub.s * 16, 17 + sub.s * 16)])
        |      AS dist
        |  FROM embeddings e, range(4) sub(s), cb)
        |SELECT vec_id, sub, code FROM d
        |QUALIFY row_number() OVER (PARTITION BY vec_id, sub
        |                           ORDER BY dist, code) = 1
        |ORDER BY vec_id, sub""".stripMargin,


    // Exact top-1 truth vs nProbe=3 IVF top-10; rank 0 = miss.
    "ann_mrr_hit_at_k" ->
      """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |sim AS (SELECT a.vec_id, c.cid,
        |    list_sum([a.embedding[i]::DOUBLE * c.cv[i]::DOUBLE
        |              for i in range(1, len(a.embedding) + 1)]) /
        |    (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
        |                    for i in range(1, len(a.embedding) + 1)])) *
        |     sqrt(list_sum([c.cv[i]::DOUBLE * c.cv[i]::DOUBLE
        |                    for i in range(1, len(c.cv) + 1)]))) AS s
        |  FROM embeddings a CROSS JOIN c),
        |asg AS (SELECT vec_id, cid FROM sim
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY s DESC, cid) = 1),
        |qcells AS (SELECT vec_id AS qid, cid FROM sim
        |  WHERE vec_id BETWEEN 100 AND 115
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY s DESC, cid) <= 3),
        |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  WHERE vec_id BETWEEN 100 AND 115),
        |ex AS MATERIALIZED (
        |  SELECT q.qid, e.vec_id AS tid,
        |    list_sum([q.qv[i]::DOUBLE * e.embedding[i]::DOUBLE
        |              for i in range(1, len(q.qv) + 1)]) /
        |    (sqrt(list_sum([q.qv[i]::DOUBLE * q.qv[i]::DOUBLE
        |                    for i in range(1, len(q.qv) + 1)])) *
        |     sqrt(list_sum([e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE
        |                    for i in range(1, len(e.embedding) + 1)]))) AS s
        |  FROM qs q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid),
        |truth AS (SELECT qid, tid AS truth_id FROM ex
        |  QUALIFY row_number() OVER (PARTITION BY qid
        |                             ORDER BY s DESC, tid) = 1),
        |ivf AS (SELECT e.qid, e.tid, e.s FROM ex e
        |  JOIN qcells qc ON qc.qid = e.qid
        |  JOIN asg ac ON ac.vec_id = e.tid AND ac.cid = qc.cid),
        |ranked AS (SELECT qid, tid, row_number() OVER (PARTITION BY qid
        |    ORDER BY s DESC, tid) AS rk FROM ivf),
        |sys AS (SELECT qid, tid, rk FROM ranked WHERE rk <= 10)
        |SELECT t.qid, t.truth_id,
        |  CAST(coalesce(s.rk, 0) AS BIGINT) AS rank_in_ivf,
        |  CAST(CASE WHEN s.rk IS NULL THEN 0
        |       ELSE 1000000 // s.rk END AS BIGINT) AS rr_micro,
        |  CAST(CASE WHEN s.rk IS NULL THEN 0 ELSE 1 END AS BIGINT)
        |    AS hit_at_10
        |FROM truth t LEFT JOIN sys s ON s.qid = t.qid AND s.tid = t.truth_id
        |ORDER BY t.qid""".stripMargin,


    // Same three window forms.
    "rank_semantics_audit" ->
      """WITH li AS (
        |  SELECT l_partkey, l_quantity, l_orderkey, l_linenumber,
        |    row_number() OVER (PARTITION BY l_partkey
        |      ORDER BY l_quantity DESC, l_orderkey, l_linenumber) AS rn,
        |    rank() OVER (PARTITION BY l_partkey
        |      ORDER BY l_quantity DESC) AS rk,
        |    dense_rank() OVER (PARTITION BY l_partkey
        |      ORDER BY l_quantity DESC) AS dr
        |  FROM lineitem)
        |SELECT 'dense_rank' AS form, count(*) AS n_rows,
        |  CAST(sum(l_orderkey + l_linenumber) AS BIGINT) AS checksum
        |FROM li WHERE dr <= 3
        |UNION ALL
        |SELECT 'rank', count(*),
        |  CAST(sum(l_orderkey + l_linenumber) AS BIGINT)
        |FROM li WHERE rk <= 3
        |UNION ALL
        |SELECT 'row_number', count(*),
        |  CAST(sum(l_orderkey + l_linenumber) AS BIGINT)
        |FROM li WHERE rn <= 3
        |ORDER BY form""".stripMargin,


    // Same lower-median-of-pairwise-differences.
    "hodges_lehmann_daily_shift" ->
      """WITH p AS (
        |  SELECT CAST(ts AS DATE) AS dy,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |c AS (
        |  SELECT CAST(ts AS DATE) AS dy,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM events WHERE event_type = 'click' GROUP BY 1),
        |df AS (SELECT p.rev - c.rev AS diff FROM p CROSS JOIN c),
        |r AS (SELECT diff, row_number() OVER (ORDER BY diff) AS rn FROM df),
        |t AS (SELECT count(*) AS n_pairs FROM df)
        |SELECT t.n_pairs, r.diff AS hl_shift_cents
        |FROM r, t WHERE r.rn = (t.n_pairs + 1) // 2""".stripMargin,


    // Same three definitions against the same ranked rows.
    "quantile_semantics_audit" ->
      """WITH ev AS (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |rk AS (SELECT event_type, cents,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY cents, event_id) AS rn FROM ev),
        |tg AS (
        |  SELECT t.event_type, t.n, pp.p,
        |    (pp.p * t.n + 99) // 100 AS k_disc,
        |    1 + ((t.n - 1) * pp.p) // 100 AS k_low,
        |    ((t.n - 1) * pp.p) % 100 AS r,
        |    least(t.n, 1 + ((t.n - 1) * pp.p) // 100
        |      + CASE WHEN ((t.n - 1) * pp.p) % 100 > 0 THEN 1 ELSE 0 END)
        |      AS k_high
        |  FROM (SELECT event_type, count(*) AS n FROM ev GROUP BY 1) t
        |  CROSS JOIN (SELECT unnest([50, 90]) AS p) pp)
        |SELECT tg.event_type, tg.p, tg.n,
        |  d.cents AS disc_cents, lo.cents AS lower_cents,
        |  CAST(100 * lo.cents + tg.r * (hi.cents - lo.cents) AS BIGINT)
        |    AS interp_cents_x100
        |FROM tg
        |JOIN rk d ON d.event_type = tg.event_type AND d.rn = tg.k_disc
        |JOIN rk lo ON lo.event_type = tg.event_type AND lo.rn = tg.k_low
        |JOIN rk hi ON hi.event_type = tg.event_type AND hi.rn = tg.k_high
        |ORDER BY tg.event_type, tg.p""".stripMargin,


    // Same keyed trailing-zeros noise; printf('%b') is DuckDB's binary
    // rendering of h & −h (length−1 = trailing-zero count).
    "dp_sparse_vector_replay" ->
      """WITH dd AS (
        |  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
        |    count(*) AS true_count
        |  FROM events GROUP BY 1),
        |th AS (SELECT CAST(sum(true_count) AS BIGINT) // count(*) AS t
        |  FROM dd),
        |tn AS (SELECT t,
        |    t + CAST(length(printf('%b', h1 & (-h1))) - 1 AS BIGINT)
        |      - CAST(length(printf('%b', h2 & (-h2))) - 1 AS BIGINT)
        |      AS tn
        |  FROM (SELECT t,
        |    CAST(md5_number_upper('svtT1|T') & 9223372036854775807
        |      AS BIGINT) AS h1,
        |    CAST(md5_number_upper('svtT2|T') & 9223372036854775807
        |      AS BIGINT) AS h2 FROM th)),
        |nz AS (SELECT day, true_count,
        |    CAST(true_count AS BIGINT)
        |      + CAST(length(printf('%b', hq1 & (-hq1))) - 1 AS BIGINT)
        |      - CAST(length(printf('%b', hq2 & (-hq2))) - 1 AS BIGINT)
        |      AS noisy_count
        |  FROM (SELECT day, true_count,
        |    CAST(md5_number_upper('svtq1|' || day) & 9223372036854775807
        |      AS BIGINT) AS hq1,
        |    CAST(md5_number_upper('svtq2|' || day) & 9223372036854775807
        |      AS BIGINT) AS hq2
        |    FROM dd)),
        |hits AS (
        |  SELECT nz.day, nz.true_count, nz.noisy_count, tn.t AS threshold,
        |    tn.tn AS noisy_threshold,
        |    row_number() OVER (ORDER BY nz.day) AS hit_rank
        |  FROM nz CROSS JOIN tn WHERE nz.noisy_count >= tn.tn)
        |SELECT day, CAST(true_count AS BIGINT) AS true_count, noisy_count,
        |  threshold, noisy_threshold, hit_rank
        |FROM hits WHERE hit_rank <= 5 ORDER BY day""".stripMargin,


    // Same cells / candidates / exact top-10, config sweep by filter.
    "ivf_recall_curve" ->
      """WITH c AS (SELECT CAST(vec_id AS INT) AS cid,
        |      embedding AS cv FROM embeddings WHERE vec_id < 8),
        |s AS (
        |  SELECT a.vec_id, c.cid,
        |    list_sum([a.embedding[i]::DOUBLE * c.cv[i]::DOUBLE
        |              for i in range(1, len(a.embedding) + 1)]) /
        |    (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
        |                    for i in range(1, len(a.embedding) + 1)])) *
        |     sqrt(list_sum([c.cv[i]::DOUBLE * c.cv[i]::DOUBLE
        |                    for i in range(1, len(c.cv) + 1)]))) AS sim
        |  FROM embeddings a CROSS JOIN c),
        |asg AS (
        |  SELECT vec_id AS tid, cid FROM s
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY sim DESC, cid) = 1),
        |qc AS (
        |  SELECT vec_id AS qid, cid,
        |    row_number() OVER (PARTITION BY vec_id
        |                       ORDER BY sim DESC, cid) AS crank
        |  FROM s WHERE vec_id BETWEEN 100 AND 115
        |  QUALIFY crank <= 8),
        |q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
        |  WHERE vec_id BETWEEN 100 AND 115),
        |ex AS (
        |  SELECT q.qid, e2.vec_id AS tid,
        |    list_sum([e2.embedding[i]::DOUBLE * q.qv[i]::DOUBLE
        |              for i in range(1, len(e2.embedding) + 1)]) /
        |    (sqrt(list_sum([e2.embedding[i]::DOUBLE * e2.embedding[i]::DOUBLE
        |                    for i in range(1, len(e2.embedding) + 1)])) *
        |     sqrt(list_sum([q.qv[i]::DOUBLE * q.qv[i]::DOUBLE
        |                    for i in range(1, len(q.qv) + 1)]))) AS sim
        |  FROM embeddings e2 CROSS JOIN q WHERE e2.vec_id <> q.qid),
        |exact AS (SELECT qid, tid FROM ex
        |  QUALIFY row_number() OVER (PARTITION BY qid
        |    ORDER BY sim DESC, tid) <= 10),
        |cf AS (SELECT unnest([1, 2, 4, 8]) AS np),
        |cand AS (
        |  SELECT cf.np, ex.qid, ex.tid, ex.sim
        |  FROM ex JOIN qc ON qc.qid = ex.qid
        |  JOIN asg ON asg.tid = ex.tid AND asg.cid = qc.cid
        |  CROSS JOIN cf WHERE qc.crank <= cf.np),
        |ret AS (SELECT np, qid, tid FROM cand
        |  QUALIFY row_number() OVER (PARTITION BY np, qid
        |    ORDER BY sim DESC, tid) <= 10)
        |SELECT ret.np, CAST(16 AS BIGINT) AS n_queries,
        |  count(*) AS sum_hits,
        |  (1000 * count(*)) // 160 AS recall_permille
        |FROM ret JOIN exact
        |  ON exact.qid = ret.qid AND exact.tid = ret.tid
        |GROUP BY 1 ORDER BY 1""".stripMargin,


    // The emitted rows are the exact top-5 of the perturbed queries (the
    // recall flag is the Spark-side measurement pinned TRUE) — identical
    // contract to embed_topk_lsh.
    "embed_topk_multiprobe" -> topk5PerturbedOracleSql
  )
}
