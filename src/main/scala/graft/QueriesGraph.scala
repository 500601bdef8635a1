package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{AsOfJoin, Dedup, IntervalJoin, QualityGates, Resample,
  Sessionize, Similarity, TextAnalysis, Watermark}
import graft.pipeline.Bucketing
import graft.time.{RolloverCalendar, SessionCalendar}

/** Graph family queries + DuckDB oracles (split from the
  * monolithic SparkEntry in round 12; entry bodies unchanged). */
private[graft] trait QueriesGraph extends QueryShared {

  protected def graphQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Krippendorff's alpha (nominal) COMPONENTS — the multi-rater
    // generalization of cohens_kappa_components: event types play the
    // raters, users the units, rating = the rater's event count mod 4.
    // Only complete units (all 5 raters present) enter, so the
    // per-unit pair denominator (m−1) is constant and every component
    // is an exact integer: observed disagreement = ordered rater pairs
    // disagreeing within a unit; expected disagreement components =
    // the pooled category marginals n_c (Σ n_c·n_c' over c≠c' and the
    // grand N are caller arithmetic). α = 1 − (N−1)·D_o_pairs /
    // (m−1)/n_units / Σ_{c≠c'} n_c·n_c' — assembled from these exact
    // integers by the caller, never a float in the data plane.
    "krippendorff_alpha_components" -> { (s, d) =>
      val r = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type"))
        .agg(pmod(count(lit(1)), lit(4)).as("rating"))
      val complete = r.groupBy("user_id")
        .agg(count(lit(1)).as("m")).filter(col("m") === 5)
        .select("user_id")
      val ru = r.join(complete, Seq("user_id"), "left_semi")
      val disagree = ru.as("a")
        .join(ru.as("b"), col("a.user_id") === col("b.user_id") &&
          col("a.event_type") =!= col("b.event_type"))
        .agg(sum(when(col("a.rating") =!= col("b.rating"), 1L)
          .otherwise(0L)).as("observed_disagree_pairs"),
          count(lit(1)).as("total_pairs"))
      val marginals = ru.groupBy("rating")
        .agg(count(lit(1)).as("n_c"))
      val nUnits = complete.agg(count(lit(1)).as("n_units"))
      disagree.crossJoin(broadcast(nUnits))
        .crossJoin(broadcast(marginals
          .agg(sum(col("n_c")).as("n_total"),
            sum(col("n_c") * col("n_c")).as("sum_nc_sq"))))
        .select(col("n_units"), col("n_total"), col("sum_nc_sq"),
          col("observed_disagree_pairs"), col("total_pairs"),
          (col("n_total") * col("n_total") - col("sum_nc_sq"))
            .as("expected_disagree_pairs_numer"))
    },


    // One label-propagation step over the kNN similarity graph — the
    // semi-supervised labeling / weak-supervision pass: every vector
    // takes the majority label of its top-3 in-cell neighbours
    // (tie-break: smaller label id), isolated vectors keep their own.
    // Vote counts are integers and the winner is a WindowGroupLimit-style
    // rank over (votes desc, label), so the step is deterministic in any
    // engine; one equality join to fetch neighbour labels + one
    // src-keyed aggregate — graph-sized work, no vectors after the join.
    "label_propagation" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      val edges = knnEdges(s, d, 3)
        .select(col("src"), col("dst"))
      val lbl = emb.select(col("vec_id"), col("label"))
      val votes = edges
        .join(lbl.select(col("vec_id").as("dst"), col("label").as("nb_label")),
          "dst")
        .groupBy(col("src"), col("nb_label")).agg(count(lit(1)).as("v"))
      val w = Window.partitionBy(col("src")).orderBy(desc("v"), asc("nb_label"))
      val prop = votes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("src").as("vec_id"), col("nb_label"))
      lbl.join(prop, Seq("vec_id"), "left")
        .select(col("vec_id"), col("label"),
          coalesce(col("nb_label"), col("label")).as("prop_label"),
          (coalesce(col("nb_label"), col("label")) =!= col("label"))
            .as("changed"))
        .orderBy("vec_id")
    },


    // Graph centrality over the kNN similarity graph: two integer-exact
    // PageRank iterations (micro-unit ranks, damping 0.85 as the exact
    // rule 150000 + (85·Σ floor(r/outdeg)) div 100) over the same
    // within-cell top-3 edge set as embed_knn_graph. Each iteration is
    // one equality join on src + one map-side-combined dst aggregate —
    // graph-keyed shuffles only, nothing driver-side; all-integer
    // arithmetic means no float drift between engines or retries.
    "pagerank_knn" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      val edges = knnEdges(s, d, 3)
        .select(col("src"), col("dst"))
      graft.ops.PageRank.iterate(
          emb.select(col("vec_id").as("id")), edges, iters = 2)
        .select(col("id").as("vec_id"), col("rank").as("pagerank_micro"))
        // Sanity guard (ranks are >= the 150000 teleport floor) that also
        // keeps count-only consumers honest: without a referenced rank
        // column, both iterations are provably-unique-key outer joins and
        // Catalyst folds the ENTIRE computation out of a count() — the
        // bench would time nothing (observed: 0.7 s at a corpus where the
        // materialized query costs ~50 s).
        .filter(col("pagerank_micro") > 0)
        .orderBy("vec_id")
    },


    // kNN-graph construction (diversity sampling / density estimation
    // substrate): every vector's top-3 cosine neighbours within its
    // Voronoi cell — zero-shuffle cell assignment over the 8 seed
    // centroids, equality join on cid, per-source WindowGroupLimit rank.
    // nProbe=1 keeps the result exactly reproducible by the oracle; the
    // cross-boundary nProbe>1 recall gain is spec-asserted instead.
    "embed_knn_graph" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      graft.ops.KnnGraph.inCells(emb, cents, k = 3)
        .orderBy("src", "rank")
    },


    // The persisted kNN-graph substrate's correctness proof (VERDICT r9
    // #1): the k=3 slice SERVED from the build-once cell-partitioned
    // layout (rank pushed to the parquet scan) must hash-equal the
    // freshly-built graph — it shares embed_knn_graph's exact DuckDB
    // oracle, so persisted ≡ fresh ≡ oracle in one row. Every other
    // graph-family query reads this same layout via knnEdges.
    "knn_graph_persisted" -> { (s, d) =>
      knnEdges(s, d, 3).orderBy("src", "rank")
    },


    // Triangle counting over the kNN similarity graph — the community-
    // density signal (an embedding whose kNN edges close many triangles
    // sits inside a tight cluster; triangle-free edges are hub artifacts).
    // Compact-forward scheme: orient edges low→high, wedge-join on the
    // middle vertex, close against the oriented edge set — each triangle
    // x<y<z materializes exactly once, wedge work is degree-bounded
    // (out-degree ≤ k here; see ops/Graph for the power-law orientation
    // refinement). Exact integer counts; the oracle rebuilds the same
    // edges from cosines and the same oriented joins.
    "triangle_count_knn" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      val edges = knnEdges(s, d, 3)
      graft.ops.Graph.triangleCounts(graft.ops.Graph.undirected(edges))
        .orderBy("vertex")
    },


    // 2-hop recommendations over the kNN graph — triadic closure
    // ("neighbours of my neighbours that I'm not yet linked to"), the
    // item-to-item recommender over a similarity graph and the expansion
    // step of diffusion-based retrieval. Path counts are exact integers;
    // direct edges and self-loops are excluded; top-3 per source by
    // (paths desc, id) runs as a WindowGroupLimit. The middle-vertex join
    // fans out ≤ k per edge endpoint (out-degree capped at k), so total
    // path work is ≤ n·k² — linear in n at fixed k, same argument as the
    // triangle count.
    "knn_2hop_recommend" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      // cached: three join legs (both path hops + the direct-edge anti
      // join) would otherwise each rebuild the cosine candidate join —
      // wall-clock wash at local[32] (legs overlap), but 3× less work;
      // see ops/Graph.triangleCounts for the measured trade-off
      val e = knnEdges(s, d, 3)
        .select("src", "dst").cache()
      val two = e.select(col("src").as("a"), col("dst").as("m"))
        .join(e.select(col("src").as("m"), col("dst").as("c")), "m")
        .filter(col("a") =!= col("c"))
        .groupBy("a", "c").agg(count(lit(1)).as("n_paths"))
      val w = Window.partitionBy("a").orderBy(desc("n_paths"), col("c"))
      two.join(e.select(col("src").as("a"), col("dst").as("c")),
          Seq("a", "c"), "left_anti")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("a").as("src"), col("rank"), col("c").as("rec"),
          col("n_paths"))
        .orderBy("src", "rank")
    },


    // Local clustering coefficient per vertex of the kNN similarity graph
    // (same cells/k config as triangle_count_knn so the DuckDB oracle can
    // rebuild the identical graph): 2·tri/(deg·(deg−1)) in exact
    // micro-units — the community-density signal that separates
    // intra-cluster vectors from hub artifacts before label propagation.
    "clustering_coeff_knn" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      val edges = knnEdges(s, d, 3)
      graft.ops.Graph.localClustering(graft.ops.Graph.undirected(edges))
        .orderBy("vertex")
    },


    // Connected components over the kNN similarity graph, as a
    // first-class ORACLED surface for the iterative algorithm the dedup
    // survivors ride (Components is otherwise only spec- and
    // indirectly-covered). Alternating small-star/large-star (Kiveris et
    // al., SoCC'14) — O(log n) rounds on ANY graph shape, each round one
    // aggregation + one join hash-partitioned by vertex, which is the
    // 100 TB algorithm (plain min-label propagation needs O(diameter)
    // rounds on chains). Output is the component summary: min-id label,
    // size, max vertex. Oracle: DuckDB WITH RECURSIVE transitive closure
    // → min reachable label per vertex (component-size² intermediate —
    // fine at oracle SFs, and exactly the formulation the distributed
    // algorithm exists to avoid).
    "graph_components_knn" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      val und = graft.ops.Graph.undirected(
        knnEdges(s, d, 3))
      graft.ops.Components.connectedComponentsStar(und, "a", "b")
        .groupBy("comp")
        .agg(count(lit(1)).as("n_vertices"), max("v").as("max_vertex"))
        .orderBy("comp")
    },


    // Incremental connected-components maintenance — the daily update a
    // persisted 100 TB dedup-cluster graph needs when a delta batch of
    // edges arrives: NEVER re-run components over the full edge set.
    // The algebra is contraction: yesterday's labels collapse each old
    // component to its min-id super-node; delta edges map through the
    // labels onto the contracted graph; components of THAT tiny graph
    // (≤ |Δ| edges) relabel only the touched clusters (an old label is
    // the min id of its component, so min over merged labels IS the
    // merged component's min id — the invariant that makes the
    // composition exact). Cost ∝ |Δ| + touched components; the full
    // graph is read once for yesterday's state, which a production
    // deployment holds materialized. The 10% delta is a deterministic
    // hash split of the kNN edge set (edges "arriving late"); the
    // oracle recomputes the merged graph FROM SCRATCH, so the green
    // hash proves incremental ≡ scratch, per vertex.
    "ivm_components_delta" -> { (s, d) =>
      val und = graft.ops.Graph.undirected(knnEdges(s, d, 3))
        .withColumn("is_delta",
          pmod(Dedup.md5Hash64(concat(lit("ccd|"), col("a"),
              lit("|"), col("b"))).bitwiseAND(lit(Long.MaxValue)),
            lit(10L)) === 0L)
      val delta = und.filter(col("is_delta")).select("a", "b")
        .localCheckpoint() // tiny; read thrice (verts, two label maps)
      // yesterday's materialized state: staged once per (session, dir),
      // exactly as a deployment would hold it — the query then measures
      // the maintenance path alone (delta split + contraction + relabel)
      val l0root = stagedCcLabels.computeIfAbsent(
        s"${sessionTag(s)}:$d", _ => {
          val tmp = stagedTmpDir("graft_cc_state")
          val e0 = und.filter(!col("is_delta")).select("a", "b")
          graft.ops.Components.connectedComponentsStar(e0, "a", "b")
            .write.mode("overwrite").parquet(s"$tmp/labels")
          tmp
        })
      val l0 = s.read.parquet(s"$l0root/labels")
      graft.ops.Components.applyDelta(l0, delta)
        .withColumn("changed", col("old_comp") =!= col("new_comp"))
        .orderBy("v")
    },


    // BFS layers from the 8 centroid vertices over the kNN graph —
    // "how far is every embedding from a landmark" (coverage radius /
    // seed-expansion shape). Three unrolled frontier rounds, each one
    // edge join + an anti-join against the labeled set, all
    // hash-partitioned by vertex; per-layer summary with an id checksum.
    // The frontier never revisits (anti-join), so per-round work is
    // O(frontier × degree) — the distributed BFS invariant; the oracle
    // is the UNION ALL path enumeration bounded at 3 hops, min hop per
    // vertex.
    "bfs_layers_knn" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      val und = graft.ops.Graph.undirected(
        knnEdges(s, d, 3))
      val sym = und.select(col("a").as("v"), col("b").as("w"))
        .union(und.select(col("b").as("v"), col("a").as("w")))
        .localCheckpoint()
      // One checkpoint per round (the frontier); `labeled` stays a LAZY
      // union of the checkpointed frontiers — flat lineage, no second
      // materialization job per round (r16: driver job overhead, not row
      // work, dominates these rounds at the bench SFs).
      var frontier = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("v"), lit(0).as("dist")).localCheckpoint()
      var labeled = frontier
      for (i <- 1 to 3) {
        frontier = sym
          .join(frontier.select(col("v").as("w")), "w")
          .select(col("v")).distinct()
          .join(labeled.select("v"), Seq("v"), "left_anti")
          .select(col("v"), lit(i).as("dist")).localCheckpoint()
        labeled = labeled.union(frontier)
      }
      labeled.groupBy("dist")
        .agg(count(lit(1)).as("n_vertices"), sum(col("v")).as("id_checksum"),
          max(col("v")).as("max_vertex"))
        .orderBy("dist")
    },


    // Incremental view maintenance over a JOIN — the delta algebra
    // Δ(A⋈B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB made executable: per-customer
    // revenue from orders⋈lineitem, maintained as base(old,old) plus the
    // three delta terms at a 2000-01-01 cutoff (orders delta by
    // o_orderdate, lineitem delta by l_shipdate — independent change
    // feeds, so all three terms are non-trivial). At 100 TB this is THE
    // pattern: each refresh joins only delta-sized inputs against the
    // other side, never recomputes the base. Exact decimal revenue; the
    // oracle computes the full join directly with CASE-split item counts
    // — equality proves the delta decomposition.
    "ivm_join_delta" -> { (s, d) =>
      val cut = lit("2000-01-01 00:00:00").cast("timestamp")
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        (col("o_orderdate") >= cut).as("o_new"))
      val li = Tables.lineitem(s, d).select(col("l_orderkey"),
        col("l_extendedprice").cast("decimal(12,2)").as("price"),
        (col("l_shipdate") >= cut).as("l_new"))
      def term(oNew: Boolean, lNew: Boolean) =
        o.filter(col("o_new") === oNew)
          .join(li.filter(col("l_new") === lNew),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_custkey")
          .agg(sum(col("price")).as("rev"), count(lit(1)).as("n"))
          .withColumn("is_delta", lit(if (oNew || lNew) 1L else 0L))
      term(false, false)
        .unionByName(term(true, false))
        .unionByName(term(false, true))
        .unionByName(term(true, true))
        .groupBy("o_custkey")
        .agg(sum(col("rev")).cast("double").as("revenue"),
          sum(when(col("is_delta") === 0L, col("n")).otherwise(0L))
            .as("n_items_base"),
          sum(when(col("is_delta") === 1L, col("n")).otherwise(0L))
            .as("n_items_delta"))
        .orderBy("o_custkey")
    },


    // Degree distribution of the kNN graph — the first diagnostic run
    // on any graph before choosing join strategies (wedge orientation,
    // hub salting): per undirected degree, vertex count + id checksum.
    // Degrees are k-bounded on the out side but IN-degree skews toward
    // hub embeddings — this is the query that would surface it.
    "degree_distribution_knn" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      val und = graft.ops.Graph.undirected(
        knnEdges(s, d, 3))
      und.select(col("a").as("v")).union(und.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("degree"))
        .groupBy("degree")
        .agg(count(lit(1)).as("n_vertices"), sum(col("v")).as("id_checksum"))
        .orderBy("degree")
    },


    // Link prediction by common neighbors over the kNN graph (same
    // cells=8/k=3 substrate as the other graph queries): for every
    // NON-adjacent pair sharing >= 1 neighbor, the common-neighbor count
    // plus both degrees — the exact-integer inputs to Adamic-Adar /
    // preferential-attachment scores (the log/product is the caller's
    // float, the components-not-ratios contract). Plan: one wedge join
    // on the shared-neighbor key (never all-pairs), an anti-join against
    // the edge set, degree re-attach from the collapsed vertex domain.
    // Hub skew bounds wedge fan-out at max_deg² per vertex — the
    // (degree, id) orientation fix documented on Graph applies here too.
    "link_prediction_knn" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      val und = graft.ops.Graph.undirected(
        knnEdges(s, d, 3)).cache()
      val adj = und.select(col("a").as("n"), col("b").as("v"))
        .union(und.select(col("b").as("n"), col("a").as("v")))
      val wed = adj.as("l")
        .join(adj.as("r"), col("l.n") === col("r.n") && col("l.v") < col("r.v"))
        .groupBy(col("l.v").as("id1"), col("r.v").as("id2"))
        .agg(count(lit(1)).as("common_neighbors"))
      val deg = adj.groupBy(col("n").as("v")).agg(count(lit(1)).as("degree"))
      wed.join(und, col("id1") === col("a") && col("id2") === col("b"),
          "left_anti")
        .join(deg.select(col("v").as("id1"), col("degree").as("deg1")), "id1")
        .join(deg.select(col("v").as("id2"), col("degree").as("deg2")), "id2")
        .withColumn("rank", row_number().over(
          Window.orderBy(desc("common_neighbors"), col("id1"), col("id2"))))
        .filter(col("rank") <= 50)
        .select("id1", "id2", "common_neighbors", "deg1", "deg2", "rank")
        .orderBy("rank")
    },


    // Chi-squared contingency components for event_type × ISO weekday —
    // the categorical-drift / independence audit with every term EXACT:
    // observed cell counts, both marginals, and the scaled residual
    // numerator n·O − rowT·colT (BIGINT-safe: both products <= ~1e10 at
    // sf0.1). Chi² itself is the caller's one float division per cell —
    // the components-not-ratios contract. Weekday parity pinned to ISO:
    // Spark weekday(ts)+1 = DuckDB isodow (Monday = 1); raw dayofweek
    // disagrees between engines (Sunday = 1 vs 0) — the documented trap.
    "contingency_chi2_components" -> { (s, d) =>
      val o = Tables.events(s, d)
        .select(col("event_type"), expr("weekday(ts) + 1").as("isodow"))
        .groupBy("event_type", "isodow").agg(count(lit(1)).as("observed"))
      val rt = o.groupBy("event_type").agg(sum("observed").as("row_total"))
      val ct = o.groupBy("isodow").agg(sum("observed").as("col_total"))
      val n = o.agg(sum("observed").as("n_total"))
      o.join(broadcast(rt), "event_type").join(broadcast(ct), "isodow")
        .crossJoin(broadcast(n))
        .select(col("event_type"), col("isodow"), col("observed"),
          col("row_total"), col("col_total"), col("n_total"),
          expr("n_total * observed - row_total * col_total").as("resid_num"))
        .orderBy("event_type", "isodow")
    },


    // Onion decomposition of the kNN graph (k-core peel at k = 4 on the
    // cells=8/k=3 substrate): the layer histogram with per-layer id
    // checksums. The 4-core is EMPTY on this graph (a 3-out-degree kNN
    // graph has 3-core = everything, 4-core = nothing — both measured,
    // which is exactly why the per-round LAYERS, not the core, carry the
    // signal: they are the coreness/centrality ordering used for graph
    // sparsification and influence ranking). Peel depth measured 4 at
    // both SFs; the oracle unrolls 8 rounds and would surface (not
    // absorb) a deeper peel as a mismatch.
    "graph_onion_layers_knn" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      val und = graft.ops.Graph.undirected(
        knnEdges(s, d, 3))
      graft.ops.Graph.onionLayers(und, k = 4)
        .groupBy("layer")
        .agg(count(lit(1)).as("n_vertices"), sum("v").as("id_checksum"))
        .orderBy("layer")
    },


    // Degree assortativity components for the kNN graph (Newman 2002
    // mixing patterns): per-edge degree products and sums as EXACT
    // integers — m, Σdᵢdⱼ, Σ(dᵢ+dⱼ), Σ(dᵢ²+dⱼ²) — from which the Pearson
    // assortativity coefficient is one float formula the caller applies
    // (components-not-ratios). Disassortative kNN graphs (hubs link to
    // leaves) vs assortative social graphs is THE structural diagnostic
    // for whether hub-oriented wedge bounds apply. One degree aggregate +
    // two vertex-keyed joins onto the edge list — all equality shuffles.
    "degree_assortativity_knn" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      val und = graft.ops.Graph.undirected(
        knnEdges(s, d, 3)).cache()
      val deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
      und
        .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
        .agg(count(lit(1)).as("m"),
          sum(col("da") * col("db")).as("sum_didj"),
          sum(col("da") + col("db")).as("sum_di_plus_dj"),
          sum(col("da") * col("da") + col("db") * col("db")).as("sum_di2_dj2"))
    },


    // Two rounds of Weisfeiler-Lehman color refinement on the kNN graph
    // (Weisfeiler & Leman 1968; the 1-WL test): color₀ = degree, each
    // round rehashes (own color | sorted neighbor colors). The final
    // color-class histogram is the graph's structural fingerprint —
    // 498 of 500 vertices land in singleton classes after 2 rounds on
    // this substrate (irregular graphs refine fast), and the same
    // machinery is the canonical GNN-expressiveness baseline. Each round
    // is one edge-keyed join + one vertex aggregate (linear in edges);
    // colors are md5Hash64 masked to 63 bits so both engines' signed
    // views agree, and the sorted-list canonicalization makes the
    // aggregate order-independent.
    "wl_refinement_knn" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      val und = graft.ops.Graph.undirected(
        knnEdges(s, d, 3)).cache()
      val adj = und.select(col("a").as("v"), col("b").as("w"))
        .union(und.select(col("b").as("v"), col("a").as("w"))).cache()
      def step(colors: DataFrame): DataFrame = {
        val cv = colors.select(col("v").as("vv"), col("c").as("cv"))
        val cw = colors.select(col("v").as("ww"), col("c").as("cw"))
        adj.join(cv, col("v") === col("vv")).join(cw, col("w") === col("ww"))
          .groupBy(col("v"), col("cv"))
          .agg(expr("""concat_ws(',', transform(array_sort(collect_list(cw)),
                       x -> CAST(x AS STRING)))""").as("nbrs"))
          .select(col("v"),
            graft.ops.Dedup.md5Hash64(concat(col("cv"), lit("|"), col("nbrs")))
              .bitwiseAND(lit(Long.MaxValue)).as("c"))
      }
      val c0 = adj.groupBy("v").agg(count(lit(1)).as("c"))
      // each step reads its input colors TWICE (cv and cw sides), so an
      // uncached round-1 subplan executes twice inside round 2 — cache
      // the intermediate (5k rows) to run each round once (r9: ~5.7 s →
      // ~4 s at sf0.1)
      val c1 = step(c0).cache()
      step(c1)
        .groupBy(col("c").as("wl_color"))
        .agg(count(lit(1)).as("n_vertices"), sum("v").as("id_checksum"))
        .orderBy("wl_color")
    },


    // CUPED variance-reduction components (Deng et al., WSDM 2013):
    // per-user pre-period (days 1–15) and experiment-period (16–30)
    // purchase cents, hash-assigned variants, and the exact integer
    // moment sums (n, Σx, Σy, Σxy, Σx², Σy²) per variant from which
    // theta and the adjusted-delta variance are two float formulas the
    // caller applies. BIGINT-safe: per-user cents ~1e6, xy ~1e12,
    // sums ~1e15 at sf0.1. The experimentation stack's covariance
    // reduction as a data op — not a float in sight.
    "cuped_components" -> { (s, d) =>
      val md5h: Column => Column = graft.ops.Dedup.md5Hash64
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(
          sum(when(to_date(col("ts")) < lit("2024-01-16").cast("date"),
            round(col("value") * 100).cast("long")).otherwise(0L)).as("x"),
          sum(when(to_date(col("ts")) >= lit("2024-01-16").cast("date"),
            round(col("value") * 100).cast("long")).otherwise(0L)).as("y"))
        .withColumn("variant",
          md5h(concat(lit("v|"), col("user_id")))
            .bitwiseAND(lit(Long.MaxValue)) % 2)
        .groupBy("variant")
        .agg(count(lit(1)).as("n_users"), sum("x").as("sum_x"),
          sum("y").as("sum_y"), sum(col("x") * col("y")).as("sum_xy"),
          sum(col("x") * col("x")).as("sum_x2"),
          sum(col("y") * col("y")).as("sum_y2"))
        .orderBy("variant")
    },


    // Weighted single-source shortest paths on the kNN graph (multi-seed
    // Bellman-Ford, Graph.weightedSssp): edge weight = the quantized
    // DISSIMILARITY floor((1 − sim₆)·10⁶) — so a 2-hop path through
    // close neighbors can beat a 1-hop weak edge, which is exactly what
    // hop-count BFS (bfs_layers_knn) cannot express. Integer weights
    // make the fixpoint exact; seeds are vectors 0–3. The floor() is
    // explicit because CAST(double AS BIGINT) ROUNDS in DuckDB but
    // truncates in Spark — the documented cross-engine trap. Oracle
    // unrolls 12 relax rounds (measured fixpoint: 5 at sf0.01, 8 at
    // sf0.1) and fails loudly if the data ever needs more.
    "weighted_sssp_knn" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      val knn = knnEdges(s, d, 3)
      val uw = knn
        .groupBy(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .agg(max("sim").as("ms"))
        .select(col("a"), col("b"),
          expr("CAST(floor((1 - ms) * 1000000) AS BIGINT)").as("w"))
      val edges = uw.select(col("a").as("v"), col("b").as("u"), col("w"))
        .union(uw.select(col("b").as("v"), col("a").as("u"), col("w")))
      val seeds = edges.select("v").filter(col("v") < 4)
      graft.ops.Graph.weightedSssp(edges, seeds).orderBy("v")
    },


    // Cohen's kappa inputs for the langid labeler vs declared labels:
    // n, observed agreement, and Σ row-marginal·col-marginal — kappa =
    // (n·agree − Σrc) / (n² − Σrc) is the caller's one division. The
    // inter-rater reliability audit with both "raters" recomputable.
    "cohens_kappa_components" -> { (s, d) =>
      val j = Tables.documents(s, d)
        .select(col("lang"), TextAnalysis.langId(col("text")).as("pred"))
        .cache()
      val rows = j.groupBy(col("lang").as("k")).agg(count(lit(1)).as("r"))
      val cols = j.groupBy(col("pred").as("k")).agg(count(lit(1)).as("c"))
      val marg = rows.join(cols, Seq("k"), "full_outer")
        .select(coalesce(col("r"), lit(0L)).as("r"),
          coalesce(col("c"), lit(0L)).as("c"))
        .agg(sum(col("r") * col("c")).as("sum_marginal_products"))
      j.agg(count(lit(1)).as("n"),
          sum(when(col("lang") === col("pred"), 1L).otherwise(0L))
            .as("n_agree"))
        .crossJoin(broadcast(marg))
    },


    // Directed-graph reciprocity of the kNN edge set: the share of
    // (src → dst) edges whose reverse is also a kNN edge — high
    // reciprocity means the similarity neighborhood is symmetric (good
    // for undirected collapsing), low means hubs absorb asymmetric
    // edges. One self-join on the swapped key pair, exact permille.
    "knn_reciprocity" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      val e = knnEdges(s, d, 3)
        .select("src", "dst").cache()
      val rec = e.join(e.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")
      e.agg(count(lit(1)).as("n_directed"))
        .crossJoin(broadcast(rec.agg(count(lit(1)).as("n_reciprocal"))))
        .select(col("n_directed"), col("n_reciprocal"),
          expr("n_reciprocal * 1000 DIV n_directed")
            .as("reciprocity_permille"))
    },


    // Exact higher-moment sums per event type — n, Σx, Σx², Σx³, Σx⁴ in
    // whole value units (x ≤ 490, so Σx⁴ ≤ ~1.2e15 at sf0.1 —
    // BIGINT-safe; the scaling rule is the contract, cents would
    // overflow at x⁴). Skewness/kurtosis are the caller's float
    // formulas over these five integers — the one-pass moments pipeline
    // with map-side combine.
    "higher_moments_components" -> { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), round(col("value")).cast("long").as("x"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("s1"),
          sum(expr("x * x")).as("s2"), sum(expr("x * x * x")).as("s3"),
          sum(expr("x * x * x * x")).as("s4"))
        .orderBy("event_type")
    },


    // Cronbach's alpha inputs (internal-consistency reliability): event
    // types as items, per-user counts as scores on the DENSE grid
    // (absent cells are true zeros — the left-join-to-grid step is the
    // trap), item and total variance NUMERATORS n·Σx²−(Σx)² exact —
    // alpha = k/(k−1)·(1 − Σitem/total) is the caller's float.
    "cronbach_alpha_components" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val m = ev.groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("x"))
      val grid = ev.select("user_id").distinct()
        .crossJoin(broadcast(ev.select("event_type").distinct()))
        .join(m, Seq("user_id", "event_type"), "left")
        .select(col("user_id"), col("event_type"),
          coalesce(col("x"), lit(0L)).as("x"))
        .cache()
      val iv = grid.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
          sum(expr("x * x")).as("sxx"))
        .agg(count(lit(1)).as("k"),
          sum(expr("n * sxx - sx * sx")).as("sum_item_var_num"))
      val tot = grid.groupBy("user_id").agg(sum("x").as("tx"))
        .agg(count(lit(1)).as("n_users"), sum("tx").as("s"),
          sum(expr("tx * tx")).as("ss"))
        .select(col("n_users"),
          expr("n_users * ss - s * s").as("total_var_num"))
      iv.crossJoin(broadcast(tot))
        .select(col("k"), col("n_users"), col("sum_item_var_num"),
          col("total_var_num"))
    },


    // Kendall tau-b components over the daily (event count, revenue)
    // series: every day pair classified concordant / discordant /
    // x-tied / y-tied / both-tied, in exact integers (revenue in
    // floor-cents, cast per row BEFORE the sum — a double sum is
    // addition-order-dependent and would flip ULPs between engines).
    // The scan + daily aggregate is the linear part; the pair stage is
    // days² with days bounded by the calendar window, so the self-join
    // is broadcast and tiny at any corpus size. Tau-b itself
    // ((C−D)/√((n0−nx)(n0−ny))) is a caller-side float over these
    // five integers — the engine's contract is the exact counts.
    "kendall_tau_components" -> { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100)).as("rev"))
      val a = daily.select(col("day").as("da"), col("n").as("na"),
        col("rev").as("ra"))
      val b = daily.select(col("day").as("db"), col("n").as("nb"),
        col("rev").as("rb"))
      a.join(broadcast(b), col("da") < col("db"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when((col("na") - col("nb")) * (col("ra") - col("rb")) > 0,
            1L).otherwise(0L)).as("concordant"),
          sum(when((col("na") - col("nb")) * (col("ra") - col("rb")) < 0,
            1L).otherwise(0L)).as("discordant"),
          sum(when(col("na") === col("nb") && col("ra") =!= col("rb"),
            1L).otherwise(0L)).as("ties_x_only"),
          sum(when(col("ra") === col("rb") && col("na") =!= col("nb"),
            1L).otherwise(0L)).as("ties_y_only"),
          sum(when(col("na") === col("nb") && col("ra") === col("rb"),
            1L).otherwise(0L)).as("ties_both"))
    },


    // Spearman rank-correlation components with AVERAGE-rank tie
    // handling kept integer-exact via the ×2 trick: the doubled average
    // rank of a tie group is 2·minrank + (groupsize − 1), an integer, so
    // Σ(2rx − 2ry)² = 4·Σd² needs no fractions. Tie-correction terms
    // Σ(t³−t) per axis come from value-frequency aggregates, not pair
    // joins. The windows order 30 daily rows — the single-partition
    // window is over the AGGREGATE, never the raw scan.
    "spearman_rank_components" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100)).as("rev"))
        .cache()
      val ranked = daily
        .withColumn("rx2", lit(2L) * rank().over(Window.orderBy("n")) +
          count(lit(1)).over(Window.partitionBy("n")) - 1)
        .withColumn("ry2", lit(2L) * rank().over(Window.orderBy("rev")) +
          count(lit(1)).over(Window.partitionBy("rev")) - 1)
        .agg(count(lit(1)).as("n_days"),
          sum((col("rx2") - col("ry2")) * (col("rx2") - col("ry2")))
            .as("sum_d2_x4"))
      def tieTerm(c: String, out: String) = daily.groupBy(col(c))
        .agg(count(lit(1)).as("t"))
        .agg(sum(col("t") * col("t") * col("t") - col("t")).as(out))
      ranked.crossJoin(broadcast(tieTerm("n", "tie_x")))
        .crossJoin(broadcast(tieTerm("rev", "tie_y")))
        .select("n_days", "sum_d2_x4", "tie_x", "tie_y")
    },


    // Chao1 species-richness components (Chao 1984) per source over
    // token BIGRAMS — "how much vocabulary haven't we crawled yet":
    // observed distinct D, singletons f1, doubletons f2, and the
    // bias-corrected estimate D + f1(f1−1)/(2(f2+1)) as an integer
    // milli-value (always defined, unlike the f1²/2f2 form when f2=0).
    // Bigrams, not unigrams: the 31-word synthetic vocab saturates
    // unigrams (f1=0 → vacuous); bigram space is genuinely open
    // (f1≈300/source at sf0.01). Multiplicity-preserving grams (NOT
    // Dedup.shingles, which is array_distinct'd) — frequency-of-
    // frequency statistics die under distinct. One explode + two
    // map-side-combined aggregates.
    "chao1_richness_components" -> { (s, d) =>
      val n = 2
      val toks = graft.ops.Dedup.tokens(col("text"))
      val shifted = (0 until n).map(i =>
        slice(toks, lit(i + 1), size(toks)).as(s"t$i"))
      val grams = transform(
        filter(arrays_zip(shifted: _*),
          x => x.getField(s"t${n - 1}").isNotNull),
        x => concat_ws(" ", (0 until n).map(i => x.getField(s"t$i")): _*))
      Tables.documents(s, d)
        .repartition(shuffleWidth(s), col("doc_id"))
        .select(col("source"), explode(grams).as("g"))
        .groupBy("source", "g").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(sum("c").as("n_bigrams"),
          count(lit(1)).as("distinct_bigrams"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
        .withColumn("chao1_milli",
          col("distinct_bigrams") * 1000 +
            expr("(1000 * f1 * (f1 - 1)) DIV (2 * (f2 + 1))"))
        .orderBy("source")
    },


    // Exact Gini coefficient of customer revenue concentration via the
    // rank formula G = (2·Σi·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx), all integer
    // cents — the single-number complement of the top-share Pareto
    // query. Tie-safe: equal revenues contribute the same Σi·x term
    // under any tie order, so the row_number is deterministic AND
    // immaterial. The global rank runs over the per-customer AGGREGATE
    // (3 orders of magnitude smaller than the scan), not raw orders.
    // Σi·x peaks ~1e17 at sf0.1 — an order of magnitude of BIGINT
    // headroom; the overflow frontier is ~sf10, documented here.
    "gini_concentration_components" -> { (s, d) =>
      val rev = Tables.orders(s, d)
        .select(col("o_custkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
        .groupBy("o_custkey").agg(sum("c").as("x"))
      // rank i via RangeRank (customers grow with the corpus — the r13
      // growth audit measured the old global row_number at 10× rows-in)
      graft.ops.RangeRank.withGlobalPos(rev,
          Seq(col("x"), col("o_custkey")), "i")
        .agg(count(lit(1)).as("n_customers"),
          sum("x").as("total_cents"),
          sum(col("i") * col("x")).as("rank_weighted_sum"))
        .select(col("n_customers"), col("total_cents"),
          col("rank_weighted_sum"),
          (lit(2L) * col("rank_weighted_sum") -
            (col("n_customers") + 1) * col("total_cents")).as("gini_num"),
          (col("n_customers") * col("total_cents")).as("gini_den"))
        .withColumn("gini_milli",
          // NOT (1000·num) DIV den: num·1000 tops 5.6e19 at sf0.1 —
          // past BIGINT. num DIV (den DIV 1000) stays in range and both
          // engines evaluate the identical expression.
          expr("gini_num DIV (gini_den DIV 1000)"))
    },


    // Per-edge triangle support over the kNN graph — the k-truss
    // building block (edge is in the k-truss iff support ≥ k−2): for
    // each undirected edge (a,b), the number of common neighbors, via
    // two equi-joins through the symmetric adjacency (self-loops absent
    // so a,b never count themselves). Support-0 edges survive through
    // the left join — dropping them silently is the classic bug this
    // histogram would hide. Output is the support distribution with id
    // checksums.
    "edge_triangle_support" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      val und = graft.ops.Graph.undirected(
        knnEdges(s, d, 3)).cache()
      val sym = und.select(col("a").as("v"), col("b").as("w"))
        .union(und.select(col("b").as("v"), col("a").as("w")))
      val cn = und
        .join(sym.select(col("v").as("a"), col("w").as("x")), "a")
        .join(sym.select(col("v").as("b"), col("w").as("x")), Seq("b", "x"))
        .groupBy("a", "b").agg(count(lit(1)).as("sup"))
      und.join(cn, Seq("a", "b"), "left")
        .select(col("a"), col("b"),
          coalesce(col("sup"), lit(0L)).as("support"))
        .groupBy("support")
        .agg(count(lit(1)).as("n_edges"),
          sum(col("a") + col("b")).as("edge_checksum"))
        .orderBy("support")
    },


    // Difference-in-differences: users who signed up during the
    // "campaign" window (days 10–19) vs everyone else, purchase value
    // before (days 0–9) vs after (days 20+). All four cell components
    // are exact integers; the DiD point estimate is four IEEE quotients
    // combined and floored to milli-cents — identical across engines
    // because each quotient is a single division of exact sums. The
    // standard pre/post × treat/control causal readout, one scan + one
    // broadcast semi-join.
    "diff_in_diff_components" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .crossJoin(broadcast(Tables.events(s, d)
          .agg(min(to_date(col("ts"))).as("d0"))))
        .select(col("user_id"), col("event_type"),
          datediff(to_date(col("ts")), col("d0")).as("day"),
          floor(col("value") * 100).as("cents"))
      val treated = ev.filter(col("event_type") === "signup" &&
          col("day") >= 10 && col("day") < 20)
        .select(col("user_id")).distinct().withColumn("tr", lit(1))
      val cells = ev.filter(col("event_type") === "purchase" &&
          (col("day") < 10 || col("day") >= 20))
        .join(broadcast(treated), Seq("user_id"), "left")
        .select(when(col("tr").isNotNull, "T").otherwise("C").as("grp"),
          when(col("day") < 10, "pre").otherwise("post").as("period"),
          col("cents"))
        .groupBy("grp", "period")
        .agg(count(lit(1)).as("n"), sum("cents").as("sc"))
      def cell(g: String, p: String, c: String) =
        min(when(col("grp") === g && col("period") === p, col(c)))
      cells.agg(
          cell("T", "pre", "n").as("t_pre_n"),
          cell("T", "pre", "sc").as("t_pre_cents"),
          cell("T", "post", "n").as("t_post_n"),
          cell("T", "post", "sc").as("t_post_cents"),
          cell("C", "pre", "n").as("c_pre_n"),
          cell("C", "pre", "sc").as("c_pre_cents"),
          cell("C", "post", "n").as("c_post_n"),
          cell("C", "post", "sc").as("c_post_cents"))
        .withColumn("did_milli", floor(lit(1000.0) *
          ((col("t_post_cents").cast("double") / col("t_post_n") -
            col("t_pre_cents").cast("double") / col("t_pre_n")) -
           (col("c_post_cents").cast("double") / col("c_post_n") -
            col("c_pre_cents").cast("double") / col("c_pre_n"))))
          .cast("long"))
    },


    // Incremental top-k maintenance readout: the top-10 most-active
    // users at the 2024-01-25 watermark vs after the remaining days
    // arrive — every user in EITHER leaderboard, with both ranks and
    // the transition class (entered/left/up/down/same). The delta a
    // materialized top-k view must reproduce without a full recompute;
    // the full-outer join of the two ranked frames IS the maintenance
    // contract. Ranks over per-user aggregates only.
    "ivm_topk_delta" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
      def top10(pred: Column, rankName: String, cntName: String) =
        ev.filter(pred).groupBy("user_id")
          .agg(count(lit(1)).as(cntName))
          .withColumn(rankName, row_number().over(
            Window.orderBy(desc(cntName), col("user_id"))))
          .filter(col(rankName) <= 10)
      val before = top10(to_date(col("ts")) < to_date(lit("2024-01-25")),
        "rank_before", "n_before")
      val after = top10(lit(true), "rank_after", "n_after")
      before.join(after, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          coalesce(col("rank_before"), lit(0)).as("rank_before"),
          coalesce(col("n_before"), lit(0L)).as("n_before"),
          coalesce(col("rank_after"), lit(0)).as("rank_after"),
          coalesce(col("n_after"), lit(0L)).as("n_after"))
        .withColumn("status",
          when(col("rank_before") === 0, "entered")
            .when(col("rank_after") === 0, "left")
            .when(col("rank_after") < col("rank_before"), "up")
            .when(col("rank_after") > col("rank_before"), "down")
            .otherwise("same"))
        .orderBy(when(col("rank_after") === 0, 99)
          .otherwise(col("rank_after")), col("user_id"))
    },


    // Cluster-sampling design-effect components (balanced ANOVA, m=6
    // events per user so every sum-of-squares clears its denominator):
    // km·SSB = k·Σs_i² − T² and m·SSW = m·Σy² − Σs_i², both exact
    // integers; ICC and DEFF = 1 + (m−1)·ICC are caller floats over
    // these. The survey-sampling companion to neyman_allocation_exact:
    // how much a user-clustered sample inflates variance vs SRS.
    "design_effect_components" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val y = Tables.events(s, d)
        .select(col("user_id"), col("event_id"),
          floor(col("value") * 100).as("y"))
        .withColumn("rn", row_number().over(Window.partitionBy("user_id")
          .orderBy("event_id")))
        .filter(col("rn") <= 6)
      val per = y.groupBy("user_id")
        .agg(count(lit(1)).as("m_i"), sum("y").as("s_i"),
          sum(col("y") * col("y")).as("ss_i"))
        .filter(col("m_i") === 6)
      per.agg(count(lit(1)).as("k"),
          sum("s_i").as("t_sum"),
          sum(col("s_i") * col("s_i")).as("sum_si_sq"),
          sum("ss_i").as("sum_y_sq"))
        .select(col("k"), lit(6L).as("m"), col("t_sum"), col("sum_y_sq"),
          (col("k") * col("sum_si_sq") - col("t_sum") * col("t_sum"))
            .as("km_ssb"),
          (lit(6L) * col("sum_y_sq") - col("sum_si_sq")).as("m_ssw"))
    },


    // Cosine DISTANCE is not a metric — the triangle-inequality
    // violation rate over all ordered triples of a 30-vector panel,
    // counted exactly: d(a,c) > d(a,b) + d(b,c) for each of the three
    // middle choices. The number an ANN index design that assumes
    // metric pruning (vp-trees, triangle-based candidate elimination)
    // silently depends on; >0 here is the proof it would prune wrong.
    // 435 pairwise cosines computed once, 4 060 triples by equi-joins
    // on the pair table.
    "cosine_triangle_violations" -> { (s, d) =>
      val v = Tables.embeddings(s, d).filter(col("vec_id") < 30)
        .select(col("vec_id"), col("embedding"))
      val p = v.select(col("vec_id").as("i"), col("embedding").as("vi"))
        .join(v.select(col("vec_id").as("j"), col("embedding").as("vj")),
          col("i") < col("j"))
        .select(col("i"), col("j"),
          (lit(1.0) - graft.ops.Similarity.cosine(col("vi"), col("vj")))
            .as("dist"))
        .cache()
      def side(i: String, j: String, out: String) =
        p.select(col("i").as(i), col("j").as(j), col("dist").as(out))
      val t = side("a", "b", "dab").join(side("b", "c", "dbc"), "b")
        .join(side("a", "c", "dac"), Seq("a", "c"))
      t.select(col("a"), col("b"), col("c"),
          (col("dac") - col("dab") - col("dbc")).as("v1"),
          (col("dab") - col("dac") - col("dbc")).as("v2"),
          (col("dbc") - col("dab") - col("dac")).as("v3"))
        .agg(count(lit(1)).as("n_triples"),
          sum(when(col("v1") > 0, 1L).otherwise(0L) +
            when(col("v2") > 0, 1L).otherwise(0L) +
            when(col("v3") > 0, 1L).otherwise(0L))
            .as("n_violating_checks"),
          sum(when(col("v1") > 0 || col("v2") > 0 || col("v3") > 0, 1L)
            .otherwise(0L)).as("n_violating_triples"),
          floor(greatest(max("v1"), max("v2"), max("v3")) * 1000)
            .cast("long").as("max_violation_milli"))
        .withColumn("n_checks", col("n_triples") * 3)
        .select("n_triples", "n_checks", "n_violating_checks",
          "n_violating_triples", "max_violation_milli")
    },


    // The AGM / worst-case-optimal-join motivation, measured: counting
    // triangles through a binary join plan materializes every WEDGE
    // (Σ d(d−1)/2 two-paths) before the closing edge filters them; the
    // wedge-to-triangle ratio IS the intermediate-result blowup a WCOJ
    // avoids. On the kNN graph: edges, wedges, closed triangles
    // (3·triangle count via closing-edge join), blowup in permille.
    // Degrees from one aggregate; the wedge count never materializes
    // wedges — that's the point of computing it from degrees.
    "agm_triangle_blowup" -> { (s, d) =>
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
      val cents = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("centroid"))
      val und = graft.ops.Graph.undirected(
        knnEdges(s, d, 3)).cache()
      val sym = und.select(col("a").as("v"), col("b").as("w"))
        .union(und.select(col("b").as("v"), col("a").as("w")))
      val deg = sym.groupBy("v").agg(count(lit(1)).as("dg"))
      val wedges = deg.agg(sum(expr("dg * (dg - 1) DIV 2")).as("n_wedges"))
      val m = und.agg(count(lit(1)).as("n_edges"))
      // closed wedges: ordered triangle (a<b<c) found via two edges
      // (a,b), (b,c) plus the closing (a,c)
      val tri = und.select(col("a"), col("b"))
        .join(und.select(col("a").as("b"), col("b").as("c")), "b")
        .join(und.select(col("a"), col("b").as("c")), Seq("a", "c"))
        .agg(count(lit(1)).as("n_triangles"))
      m.crossJoin(broadcast(wedges)).crossJoin(broadcast(tri))
        .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
          expr("""CASE WHEN n_triangles > 0
            THEN (1000 * n_wedges) DIV n_triangles ELSE -1 END""")
            .as("wedge_per_triangle_milli"))
    },


    // Arc price elasticity between consecutive days, fully integer by
    // clearing the per-day mean-price fractions: with q = purchases,
    // S = cents sum, e = ((q₂−q₁)(S₁q₂+S₂q₁)) / ((S₂q₁−S₁q₂)(q₁+q₂))
    // — numerator and denominator emitted as exact signed BIGINTs (the
    // signed quotient stays with the caller: engines disagree on
    // negative integer division). The day pairs where demand moved
    // WITH price (positive ratio) are visible as matching signs.
    "arc_elasticity_components" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("q"),
          sum(floor(col("value") * 100)).as("sc"))
      val w = Window.orderBy("day")
      daily
        .withColumn("q1", lag("q", 1).over(w))
        .withColumn("s1", lag("sc", 1).over(w))
        .filter(col("q1").isNotNull)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("q1"), col("q").as("q2"), col("s1"), col("sc").as("s2"))
        .withColumn("e_num",
          expr("(q2 - q1) * (s1 * q2 + s2 * q1)"))
        .withColumn("e_den",
          expr("(s2 * q1 - s1 * q2) * (q1 + q2)"))
        .orderBy("day")
    },


    // Regression-discontinuity components at the activity median:
    // running variable = user's event count, outcome = the user's
    // purchase cents sum; four cells (below/above threshold × narrow
    // ±2 / wide ±8 bandwidth) with exact counts and sums — the
    // local-mean gap at the cutoff vs the wide-bandwidth gap is the
    // bandwidth-sensitivity check every RDD referee asks for. One user
    // aggregate + one broadcast threshold.
    "regression_discontinuity_components" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val users = Tables.events(s, d)
        .groupBy("user_id")
        .agg(count(lit(1)).as("activity"),
          sum(when(col("event_type") === "purchase",
            floor(col("value") * 100)).otherwise(0L)).as("pc"))
      val nU = users.agg(count(lit(1)).as("nu"))
      // median rank via RangeRank: users grow with the corpus (r13
      // growth audit measured the old global row_number at 10× rows-in)
      val thr = graft.ops.RangeRank.withGlobalPos(users,
          Seq(col("activity"), col("user_id")), "rn")
        .crossJoin(broadcast(nU))
        .filter(col("rn") === expr("(nu + 1) DIV 2"))
        .select(col("activity").as("cut"))
      def cell(side: String, bw: Int) = {
        val in =
          if (side == "below")
            col("activity") < col("cut") &&
              col("activity") >= col("cut") - bw
          else
            col("activity") >= col("cut") &&
              col("activity") < col("cut") + bw
        struct(sum(when(in, 1L).otherwise(0L)).as("n"),
          sum(when(in, col("pc")).otherwise(0L)).as("s"))
      }
      users.crossJoin(broadcast(thr))
        .agg(first("cut").as("cutoff_activity"),
          cell("below", 2).as("below_narrow"),
          cell("above", 2).as("above_narrow"),
          cell("below", 8).as("below_wide"),
          cell("above", 8).as("above_wide"))
        .select(col("cutoff_activity"),
          col("below_narrow.n").as("n_below_narrow"),
          col("below_narrow.s").as("cents_below_narrow"),
          col("above_narrow.n").as("n_above_narrow"),
          col("above_narrow.s").as("cents_above_narrow"),
          col("below_wide.n").as("n_below_wide"),
          col("below_wide.s").as("cents_below_wide"),
          col("above_wide.n").as("n_above_wide"),
          col("above_wide.s").as("cents_above_wide"))
    },


    // Brown-Forsythe (median-centered Levene) spread-homogeneity
    // components per event type: absolute deviations from each type's
    // EXACT lower-median stay integers, so n, Σ|z|, Σz² per group are
    // exact and the W statistic is the caller's float — the
    // variance-equality check that must pass before pooling types in
    // any ANOVA, median-centered because the raw Levene is wrecked by
    // the same heavy tails it's testing for.
    "levene_components" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("event_id"),
          floor(col("value") * 100).as("cents"))
      val n = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      val med = ev.withColumn("rn", row_number().over(
          Window.partitionBy("event_type").orderBy("cents", "event_id")))
        .join(broadcast(n), "event_type")
        .filter(col("rn") === expr("(n + 1) DIV 2"))
        .select(col("event_type"), col("cents").as("med"))
      ev.join(broadcast(med), "event_type")
        .withColumn("z", abs(col("cents") - col("med")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), first("med").as("median_cents"),
          sum("z").as("sum_absdev"),
          sum(col("z") * col("z")).as("sum_absdev_sq"))
        .orderBy("event_type")
    },


    // Wald-Wolfowitz runs test components on the daily up/down revenue
    // sequence: observed runs vs the exact expected-runs rational
    // E·n = n + 2·n₁·n₂ — is the series trending/mean-reverting or
    // coin-flip random. All integers; the z-score's variance term is
    // the caller's float over these.
    "runs_test_components" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(floor(col("value") * 100)).as("rev"))
      val w = Window.orderBy("day")
      val signs = daily.withColumn("prev", lag("rev", 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("up", when(col("rev") > col("prev"), 1L).otherwise(0L))
        .withColumn("flip",
          when(col("up") =!= lag("up", 1).over(w), 1L).otherwise(0L))
      signs.agg(
          sum("up").as("n1"),
          sum(lit(1L) - col("up")).as("n2"),
          (sum(when(col("flip").isNull, 0L).otherwise(col("flip"))) + 1L)
            .as("n_runs"))
        .select(col("n1"), col("n2"), col("n_runs"),
          (col("n1") + col("n2") + lit(2L) * col("n1") * col("n2"))
            .as("expected_runs_num"),
          (col("n1") + col("n2")).as("expected_runs_den"))
    },


    // Two-sample Kolmogorov–Smirnov components for click-vs-purchase
    // value distributions: D = max|F₁−F₂| cross-multiplied to the
    // integer max|F₁·n₂ − F₂·n₁| (D = d_num / d_den), with the argmax
    // support point. The ordered scan runs over DISTINCT cents values —
    // eventually bounded by the value domain (≤15001), but the r13
    // growth audit measured it 3.9× per decade BELOW saturation, so
    // both ECDFs now ride one RangeRank two-level prefix pass and the
    // argmax is a distributed top-1 (TakeOrderedAndProject), leaving no
    // corpus-fed SinglePartition stage at any SF.
    "ks_test_components" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"), floor(col("value") * 100).as("cents"))
      val g = ev.groupBy("cents").agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("k1"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("k2"))
      val tot = ev.agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("n1"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n2"))
      graft.ops.RangeRank.withGlobalPrefixes(g, Seq(col("cents")),
          Seq("k1", "k2"), "__pos", Seq("f1", "f2"))
        .crossJoin(broadcast(tot))
        .withColumn("dd",
          abs(col("f1") * col("n2") - col("f2") * col("n1")))
        .orderBy(desc("dd"), col("cents")).limit(1)
        .select(col("n1"), col("n2"), col("dd").as("d_num"),
          (col("n1") * col("n2")).as("d_den"),
          col("cents").as("d_at_cents"))
    }
  )

  protected def graphOracles: Map[String, String] = Map(

    // Complete-unit coincidence components; all exact integers.
    "krippendorff_alpha_components" ->
      """WITH r AS (
        |  SELECT user_id, event_type, count(*) % 4 AS rating
        |  FROM events GROUP BY 1, 2),
        |cu AS (SELECT user_id FROM r GROUP BY 1 HAVING count(*) = 5),
        |ru AS (SELECT r.* FROM r JOIN cu USING (user_id)),
        |d AS (SELECT
        |  CAST(sum(CASE WHEN a.rating <> b.rating THEN 1 ELSE 0 END)
        |    AS BIGINT) AS observed_disagree_pairs,
        |  count(*) AS total_pairs
        |  FROM ru a JOIN ru b ON a.user_id = b.user_id
        |    AND a.event_type <> b.event_type),
        |m AS (SELECT CAST(sum(nc) AS BIGINT) AS n_total,
        |  CAST(sum(nc * nc) AS BIGINT) AS sum_nc_sq FROM (
        |    SELECT rating, count(*) AS nc FROM ru GROUP BY 1) t(rating, nc)),
        |u AS (SELECT count(*) AS n_units FROM cu)
        |SELECT u.n_units, m.n_total, m.sum_nc_sq,
        |  d.observed_disagree_pairs, d.total_pairs,
        |  m.n_total * m.n_total - m.sum_nc_sq
        |    AS expected_disagree_pairs_numer
        |FROM d, m, u""".stripMargin,


    // The embed_knn_graph edge CTE, then integer majority votes with the
    // same (votes desc, label) tie rule.
    "label_propagation" ->
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
        |p AS (
        |  SELECT x.vec_id AS src, y.vec_id AS dst,
        |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |              for i in range(1, len(ax.embedding) + 1)]) /
        |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
        |                    for i in range(1, len(ax.embedding) + 1)])) *
        |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
        |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
        |  JOIN embeddings ax ON ax.vec_id = x.vec_id
        |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
        |e AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src
        |                         ORDER BY sim DESC, dst) AS rank
        |    FROM p) WHERE rank <= 3),
        |v AS (
        |  SELECT e.src, l.label AS nb_label, count(*) AS v
        |  FROM e JOIN embeddings l ON e.dst = l.vec_id GROUP BY 1, 2),
        |w AS (
        |  SELECT src, nb_label FROM v
        |  QUALIFY row_number() OVER (PARTITION BY src
        |                             ORDER BY v DESC, nb_label) = 1)
        |SELECT m.vec_id, m.label,
        |  COALESCE(w.nb_label, m.label) AS prop_label,
        |  COALESCE(w.nb_label, m.label) <> m.label AS changed
        |FROM embeddings m LEFT JOIN w ON m.vec_id = w.src
        |ORDER BY vec_id""".stripMargin,


    // The embed_knn_graph edge CTE (same cell assignment + within-cell
    // top-3), then the two damped iterations as pure integer arithmetic
    // (// is floor division; nonneg operands make it truncation, same as
    // Spark's div).
    "pagerank_knn" ->
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
        |p AS (
        |  SELECT x.vec_id AS src, y.vec_id AS dst,
        |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |              for i in range(1, len(ax.embedding) + 1)]) /
        |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
        |                    for i in range(1, len(ax.embedding) + 1)])) *
        |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
        |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
        |  JOIN embeddings ax ON ax.vec_id = x.vec_id
        |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
        |e AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src
        |                         ORDER BY sim DESC, dst) AS rank
        |    FROM p) WHERE rank <= 3),
        |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
        |n AS (SELECT vec_id AS id FROM embeddings),
        |in1 AS (
        |  SELECT e.dst, CAST(sum(1000000 // d.outdeg) AS BIGINT) AS inu
        |  FROM e JOIN deg d ON e.src = d.src GROUP BY e.dst),
        |r1 AS (
        |  SELECT n.id,
        |    150000 + (85 * COALESCE(in1.inu, 0)) // 100 AS rank
        |  FROM n LEFT JOIN in1 ON n.id = in1.dst),
        |in2 AS (
        |  SELECT e.dst, CAST(sum(r1.rank // d.outdeg) AS BIGINT) AS inu
        |  FROM e JOIN deg d ON e.src = d.src
        |  JOIN r1 ON e.src = r1.id GROUP BY e.dst),
        |r2 AS (
        |  SELECT n.id,
        |    150000 + (85 * COALESCE(in2.inu, 0)) // 100 AS rank
        |  FROM n LEFT JOIN in2 ON n.id = in2.dst)
        |SELECT id AS vec_id, CAST(rank AS BIGINT) AS pagerank_micro
        |FROM r2 ORDER BY vec_id""".stripMargin,

    "embed_knn_graph" -> knnGraphK3OracleSql,


    // Same cell-assignment CTE as the SemDeDup oracle, then an exact
    // within-cell top-3 by (sim desc, dst) — both engines compute the
    // cosine as a double dot product in index order, so the rounded sims
    // and the ranking are bit-identical. knn_graph_persisted shares this
    // oracle verbatim: the layout-served slice must hash-equal the fresh
    // build.
    "knn_graph_persisted" -> knnGraphK3OracleSql,


    // The embed_knn_graph edge CTE (same cell assignment + within-cell
    // top-3), canonicalized to oriented a<b edges, then the same
    // compact-forward wedge join: each triangle x<y<z appears once.
    "triangle_count_knn" ->
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
        |p AS (
        |  SELECT x.vec_id AS src, y.vec_id AS dst,
        |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |              for i in range(1, len(ax.embedding) + 1)]) /
        |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
        |                    for i in range(1, len(ax.embedding) + 1)])) *
        |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
        |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
        |  JOIN embeddings ax ON ax.vec_id = x.vec_id
        |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
        |e AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src
        |                         ORDER BY sim DESC, dst) AS rank
        |    FROM p) WHERE rank <= 3),
        |u AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM u e1 JOIN u e2 ON e1.b = e2.a
        |  JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT vertex, count(*) AS n_triangles
        |FROM (SELECT unnest([x, y, z]) AS vertex FROM tri)
        |GROUP BY 1 ORDER BY vertex""".stripMargin,


    // The embed_knn_graph edge CTE, then the same triadic-closure plan:
    // middle-vertex path join, direct-edge anti join, top-3 per source.
    "knn_2hop_recommend" ->
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
        |p AS (
        |  SELECT x.vec_id AS src, y.vec_id AS dst,
        |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |              for i in range(1, len(ax.embedding) + 1)]) /
        |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
        |                    for i in range(1, len(ax.embedding) + 1)])) *
        |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
        |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
        |  JOIN embeddings ax ON ax.vec_id = x.vec_id
        |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
        |e AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src
        |                         ORDER BY sim DESC, dst) AS rank
        |    FROM p) WHERE rank <= 3),
        |two AS (
        |  SELECT e1.src AS a, e2.dst AS c, count(*) AS n_paths
        |  FROM e e1 JOIN e e2 ON e1.dst = e2.src AND e2.dst <> e1.src
        |  GROUP BY 1, 2),
        |rec AS (
        |  SELECT a, c, n_paths FROM two
        |  WHERE NOT EXISTS (SELECT 1 FROM e
        |                    WHERE e.src = two.a AND e.dst = two.c)),
        |r AS (
        |  SELECT a, c, n_paths,
        |    row_number() OVER (PARTITION BY a
        |                       ORDER BY n_paths DESC, c) AS rank
        |  FROM rec)
        |SELECT a AS src, rank, c AS rec, n_paths FROM r
        |WHERE rank <= 3 ORDER BY src, rank""".stripMargin,


    // triangle_count_knn's graph construction extended with degrees; the
    // micro-unit floor quotient matches Spark's DIV bit-for-bit.
    "clustering_coeff_knn" ->
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
        |p AS (
        |  SELECT x.vec_id AS src, y.vec_id AS dst,
        |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |              for i in range(1, len(ax.embedding) + 1)]) /
        |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
        |                    for i in range(1, len(ax.embedding) + 1)])) *
        |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
        |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
        |  JOIN embeddings ax ON ax.vec_id = x.vec_id
        |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
        |e AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src
        |                         ORDER BY sim DESC, dst) AS rank
        |    FROM p) WHERE rank <= 3),
        |u AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e),
        |deg AS (
        |  SELECT vertex, CAST(count(*) AS BIGINT) AS degree FROM (
        |    SELECT a AS vertex FROM u UNION ALL SELECT b AS vertex FROM u)
        |  GROUP BY 1),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM u e1 JOIN u e2 ON e1.b = e2.a
        |  JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b),
        |tc AS (
        |  SELECT vertex, CAST(count(*) AS BIGINT) AS n_triangles
        |  FROM (SELECT unnest([x, y, z]) AS vertex FROM tri)
        |  GROUP BY 1)
        |SELECT d.vertex, d.degree,
        |  coalesce(tc.n_triangles, 0) AS n_triangles,
        |  coalesce(tc.n_triangles, 0) * 2000000 //
        |    (d.degree * (d.degree - 1)) AS lcc_micro
        |FROM deg d LEFT JOIN tc USING (vertex)
        |WHERE d.degree >= 2 ORDER BY d.vertex""".stripMargin,


    // Same kNN edge set as triangle_count_knn, then the textbook
    // transitive closure the distributed star algorithm avoids: every
    // (vertex, reachable-vertex) pair, min per vertex = component label.
    "graph_components_knn" ->
      """WITH RECURSIVE c AS (SELECT CAST(vec_id AS INT) AS cid,
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
        |  SELECT vec_id, cid FROM s
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY sim DESC, cid) = 1),
        |p AS (
        |  SELECT x.vec_id AS src, y.vec_id AS dst,
        |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |              for i in range(1, len(ax.embedding) + 1)]) /
        |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
        |                    for i in range(1, len(ax.embedding) + 1)])) *
        |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
        |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
        |  JOIN embeddings ax ON ax.vec_id = x.vec_id
        |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
        |e AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src
        |                         ORDER BY sim DESC, dst) AS rank
        |    FROM p) WHERE rank <= 3),
        |u AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e WHERE src <> dst),
        |verts AS (SELECT a AS v FROM u UNION SELECT b FROM u),
        |sym2 AS (SELECT a AS v, b AS w FROM u
        |         UNION ALL SELECT b AS v, a AS w FROM u),
        |walk AS (
        |  SELECT v, v AS comp FROM verts
        |  UNION
        |  SELECT s2.v, walk.comp
        |  FROM sym2 s2 JOIN walk ON walk.v = s2.w),
        |lab AS (SELECT v, min(comp) AS comp FROM walk GROUP BY v)
        |SELECT comp, count(*) AS n_vertices, max(v) AS max_vertex
        |FROM lab GROUP BY comp ORDER BY comp""".stripMargin,


    // Same kNN edge construction; the merged-graph labels recomputed
    // FROM SCRATCH (ground truth for the Spark side's contraction).
    "ivm_components_delta" ->
      """WITH RECURSIVE c AS (SELECT CAST(vec_id AS INT) AS cid,
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
        |  SELECT vec_id, cid FROM s
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY sim DESC, cid) = 1),
        |p AS (
        |  SELECT x.vec_id AS src, y.vec_id AS dst,
        |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |              for i in range(1, len(ax.embedding) + 1)]) /
        |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
        |                    for i in range(1, len(ax.embedding) + 1)])) *
        |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
        |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
        |  JOIN embeddings ax ON ax.vec_id = x.vec_id
        |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
        |e AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src
        |                         ORDER BY sim DESC, dst) AS rank
        |    FROM p) WHERE rank <= 3),
        |u AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e WHERE src <> dst),
        |tagged AS (
        |  SELECT a, b,
        |    (md5_number_upper('ccd|' || a || '|' || b)
        |     & 9223372036854775807) % 10 = 0 AS is_delta
        |  FROM u),
        |v0 AS (SELECT a AS v FROM tagged WHERE NOT is_delta
        |       UNION SELECT b FROM tagged WHERE NOT is_delta),
        |sym0 AS (SELECT a AS v, b AS w FROM tagged WHERE NOT is_delta
        |         UNION ALL SELECT b, a FROM tagged WHERE NOT is_delta),
        |walk0 AS (
        |  SELECT v, v AS comp FROM v0
        |  UNION
        |  SELECT s0.v, walk0.comp
        |  FROM sym0 s0 JOIN walk0 ON walk0.v = s0.w),
        |lab0 AS (SELECT v, min(comp) AS comp FROM walk0 GROUP BY v),
        |dverts AS (
        |  -- explicit DISTINCT: DuckDB's CTE inlining has been observed
        |  -- to leak duplicates through a bare UNION over this subplan
        |  SELECT DISTINCT v FROM (
        |    SELECT a AS v FROM tagged WHERE is_delta
        |    UNION ALL SELECT b FROM tagged WHERE is_delta)),
        |stale AS (
        |  SELECT v, comp FROM lab0
        |  UNION ALL
        |  SELECT v, v AS comp FROM dverts
        |  WHERE v NOT IN (SELECT v FROM lab0)),
        |verts AS (SELECT a AS v FROM tagged UNION SELECT b FROM tagged),
        |sym AS (SELECT a AS v, b AS w FROM tagged
        |        UNION ALL SELECT b, a FROM tagged),
        |walk AS (
        |  SELECT v, v AS comp FROM verts
        |  UNION
        |  SELECT sy.v, walk.comp
        |  FROM sym sy JOIN walk ON walk.v = sy.w),
        |lab AS (SELECT v, min(comp) AS comp FROM walk GROUP BY v)
        |SELECT st.v, st.comp AS old_comp, lab.comp AS new_comp,
        |  st.comp <> lab.comp AS changed
        |FROM stale st JOIN lab ON lab.v = st.v
        |ORDER BY st.v""".stripMargin,


    // Same kNN edge set; bounded UNION ALL path enumeration (≤3 hops),
    // min hop per vertex, per-layer summary.
    "bfs_layers_knn" ->
      """WITH RECURSIVE c AS (SELECT CAST(vec_id AS INT) AS cid,
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
        |  SELECT vec_id, cid FROM s
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY sim DESC, cid) = 1),
        |p AS (
        |  SELECT x.vec_id AS src, y.vec_id AS dst,
        |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |              for i in range(1, len(ax.embedding) + 1)]) /
        |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
        |                    for i in range(1, len(ax.embedding) + 1)])) *
        |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
        |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
        |  JOIN embeddings ax ON ax.vec_id = x.vec_id
        |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
        |e AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src
        |                         ORDER BY sim DESC, dst) AS rank
        |    FROM p) WHERE rank <= 3),
        |u AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e WHERE src <> dst),
        |sym2 AS (SELECT a AS v, b AS w FROM u
        |         UNION ALL SELECT b AS v, a AS w FROM u),
        |seeds AS (SELECT DISTINCT vec_id AS v FROM embeddings
        |          WHERE vec_id < 8),
        |walk AS (
        |  SELECT v, 0 AS d FROM seeds
        |  UNION ALL
        |  SELECT s2.w AS v, walk.d + 1 AS d
        |  FROM walk JOIN sym2 s2 ON s2.v = walk.v WHERE walk.d < 3),
        |lab AS (SELECT v, min(d) AS dist FROM walk GROUP BY v)
        |SELECT dist, count(*) AS n_vertices,
        |  CAST(sum(v) AS BIGINT) AS id_checksum, max(v) AS max_vertex
        |FROM lab GROUP BY dist ORDER BY dist""".stripMargin,


    // The full join computed directly; CASE-split item counts mirror the
    // four delta terms.
    "ivm_join_delta" ->
      """SELECT o.o_custkey,
        |  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |    AS revenue,
        |  CAST(sum(CASE WHEN o.o_orderdate < TIMESTAMP '2000-01-01'
        |    AND l.l_shipdate < TIMESTAMP '2000-01-01' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_items_base,
        |  CAST(sum(CASE WHEN o.o_orderdate >= TIMESTAMP '2000-01-01'
        |    OR l.l_shipdate >= TIMESTAMP '2000-01-01' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_items_delta
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1 ORDER BY o.o_custkey""".stripMargin,


    // Same kNN edges; undirected degree histogram.
    "degree_distribution_knn" ->
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
        |  SELECT vec_id, cid FROM s
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY sim DESC, cid) = 1),
        |p AS (
        |  SELECT x.vec_id AS src, y.vec_id AS dst,
        |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |              for i in range(1, len(ax.embedding) + 1)]) /
        |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
        |                    for i in range(1, len(ax.embedding) + 1)])) *
        |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
        |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
        |  JOIN embeddings ax ON ax.vec_id = x.vec_id
        |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
        |e AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src
        |                         ORDER BY sim DESC, dst) AS rank
        |    FROM p) WHERE rank <= 3),
        |u AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e WHERE src <> dst),
        |deg AS (
        |  SELECT v, count(*) AS degree FROM (
        |    SELECT a AS v FROM u UNION ALL SELECT b FROM u)
        |  GROUP BY v)
        |SELECT degree, count(*) AS n_vertices,
        |  CAST(sum(v) AS BIGINT) AS id_checksum
        |FROM deg GROUP BY degree ORDER BY degree""".stripMargin,


    // Same kNN substrate as degree_distribution_knn, then wedge-counted
    // common neighbors over non-adjacent pairs.
    "link_prediction_knn" ->
      """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |s AS (
        |  SELECT a.vec_id, c.cid,
        |    list_sum([a.embedding[i]::DOUBLE * c.cv[i]::DOUBLE
        |              for i in range(1, len(a.embedding) + 1)]) /
        |    (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
        |                    for i in range(1, len(a.embedding) + 1)])) *
        |     sqrt(list_sum([c.cv[i]::DOUBLE * c.cv[i]::DOUBLE
        |                    for i in range(1, len(c.cv) + 1)]))) AS sim
        |  FROM embeddings a CROSS JOIN c),
        |asg AS (SELECT vec_id, cid FROM s
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY sim DESC, cid) = 1),
        |p AS (
        |  SELECT x.vec_id AS src, y.vec_id AS dst,
        |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |              for i in range(1, len(ax.embedding) + 1)]) /
        |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
        |                    for i in range(1, len(ax.embedding) + 1)])) *
        |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
        |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
        |  JOIN embeddings ax ON ax.vec_id = x.vec_id
        |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
        |e AS (SELECT src, dst FROM (
        |    SELECT src, dst, row_number() OVER (PARTITION BY src
        |      ORDER BY sim DESC, dst) AS rank FROM p) WHERE rank <= 3),
        |u AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e WHERE src <> dst),
        |adj AS (SELECT a AS n, b AS v FROM u UNION ALL SELECT b, a FROM u),
        |wed AS (SELECT l.v AS id1, r.v AS id2, count(*) AS common_neighbors
        |  FROM adj l JOIN adj r ON l.n = r.n AND l.v < r.v GROUP BY 1, 2),
        |nonadj AS (
        |  SELECT w.* FROM wed w
        |  WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.a = w.id1
        |                    AND u.b = w.id2)),
        |deg AS (SELECT n AS v, count(*) AS degree FROM adj GROUP BY 1)
        |SELECT id1, id2, common_neighbors,
        |  d1.degree AS deg1, d2.degree AS deg2,
        |  row_number() OVER (ORDER BY common_neighbors DESC, id1, id2)
        |    AS rank
        |FROM nonadj JOIN deg d1 ON d1.v = id1 JOIN deg d2 ON d2.v = id2
        |QUALIFY rank <= 50 ORDER BY rank""".stripMargin,


    // isodow = Spark weekday + 1 (ISO Monday=1 in both).
    "contingency_chi2_components" ->
      """WITH o AS (
        |  SELECT event_type, CAST(isodow(ts) AS INTEGER) AS isodow,
        |    count(*) AS observed
        |  FROM events GROUP BY 1, 2),
        |rt AS (SELECT event_type, CAST(sum(observed) AS BIGINT) AS row_total
        |       FROM o GROUP BY 1),
        |ct AS (SELECT isodow, CAST(sum(observed) AS BIGINT) AS col_total
        |       FROM o GROUP BY 1),
        |n AS (SELECT CAST(sum(observed) AS BIGINT) AS n_total FROM o)
        |SELECT o.event_type, o.isodow, o.observed,
        |  rt.row_total, ct.col_total, n.n_total,
        |  n.n_total * o.observed - rt.row_total * ct.col_total AS resid_num
        |FROM o JOIN rt USING (event_type) JOIN ct USING (isodow) CROSS JOIN n
        |ORDER BY o.event_type, o.isodow""".stripMargin,


    "graph_onion_layers_knn" -> onionOracleSql,


    // Same kNN substrate; per-edge degree products/sums, one row.
    "degree_assortativity_knn" ->
      """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |s AS (
        |  SELECT a.vec_id, c.cid,
        |    list_sum([a.embedding[i]::DOUBLE * c.cv[i]::DOUBLE
        |              for i in range(1, len(a.embedding) + 1)]) /
        |    (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
        |                    for i in range(1, len(a.embedding) + 1)])) *
        |     sqrt(list_sum([c.cv[i]::DOUBLE * c.cv[i]::DOUBLE
        |                    for i in range(1, len(c.cv) + 1)]))) AS sim
        |  FROM embeddings a CROSS JOIN c),
        |asg AS (SELECT vec_id, cid FROM s
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY sim DESC, cid) = 1),
        |p AS (
        |  SELECT x.vec_id AS src, y.vec_id AS dst,
        |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |              for i in range(1, len(ax.embedding) + 1)]) /
        |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
        |                    for i in range(1, len(ax.embedding) + 1)])) *
        |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
        |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
        |  JOIN embeddings ax ON ax.vec_id = x.vec_id
        |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
        |e AS (SELECT src, dst FROM (
        |    SELECT src, dst, row_number() OVER (PARTITION BY src
        |      ORDER BY sim DESC, dst) AS rank FROM p) WHERE rank <= 3),
        |u AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
        |  greatest(src, dst) AS b FROM e WHERE src <> dst),
        |deg AS (SELECT v, count(*) AS deg FROM (
        |  SELECT a AS v FROM u UNION ALL SELECT b FROM u) GROUP BY 1)
        |SELECT count(*) AS m,
        |  CAST(sum(da.deg * db.deg) AS BIGINT) AS sum_didj,
        |  CAST(sum(da.deg + db.deg) AS BIGINT) AS sum_di_plus_dj,
        |  CAST(sum(da.deg * da.deg + db.deg * db.deg) AS BIGINT)
        |    AS sum_di2_dj2
        |FROM u JOIN deg da ON da.v = u.a JOIN deg db ON db.v = u.b"""
        .stripMargin,


    // Same kNN substrate; two hash-refinement rounds, colors masked to
    // 63 bits so the signed/unsigned views agree.
    "wl_refinement_knn" ->
      """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |s AS (
        |  SELECT a.vec_id, c.cid,
        |    list_sum([a.embedding[i]::DOUBLE * c.cv[i]::DOUBLE
        |              for i in range(1, len(a.embedding) + 1)]) /
        |    (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
        |                    for i in range(1, len(a.embedding) + 1)])) *
        |     sqrt(list_sum([c.cv[i]::DOUBLE * c.cv[i]::DOUBLE
        |                    for i in range(1, len(c.cv) + 1)]))) AS sim
        |  FROM embeddings a CROSS JOIN c),
        |asg AS (SELECT vec_id, cid FROM s
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY sim DESC, cid) = 1),
        |p AS (
        |  SELECT x.vec_id AS src, y.vec_id AS dst,
        |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |              for i in range(1, len(ax.embedding) + 1)]) /
        |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
        |                    for i in range(1, len(ax.embedding) + 1)])) *
        |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
        |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
        |  JOIN embeddings ax ON ax.vec_id = x.vec_id
        |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
        |e AS (SELECT src, dst FROM (
        |    SELECT src, dst, row_number() OVER (PARTITION BY src
        |      ORDER BY sim DESC, dst) AS rank FROM p) WHERE rank <= 3),
        |u AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS a,
        |  greatest(src, dst) AS b FROM e WHERE src <> dst),
        |adj AS MATERIALIZED (SELECT a AS v, b AS w FROM u
        |  UNION ALL SELECT b, a FROM u),
        |c0 AS MATERIALIZED (SELECT v, CAST(count(*) AS BIGINT) AS col
        |  FROM adj GROUP BY 1),
        |c1 AS MATERIALIZED (
        |  SELECT adj.v, CAST(md5_number_upper(
        |    c0v.col || '|' || array_to_string(list_sort(list(c0w.col)), ','))
        |    & 9223372036854775807 AS BIGINT) AS col
        |  FROM adj JOIN c0 c0v ON c0v.v = adj.v
        |  JOIN c0 c0w ON c0w.v = adj.w
        |  GROUP BY adj.v, c0v.col),
        |c2 AS (
        |  SELECT adj.v, CAST(md5_number_upper(
        |    c1v.col || '|' || array_to_string(list_sort(list(c1w.col)), ','))
        |    & 9223372036854775807 AS BIGINT) AS col
        |  FROM adj JOIN c1 c1v ON c1v.v = adj.v
        |  JOIN c1 c1w ON c1w.v = adj.w
        |  GROUP BY adj.v, c1v.col)
        |SELECT col AS wl_color, count(*) AS n_vertices,
        |  CAST(sum(v) AS BIGINT) AS id_checksum
        |FROM c2 GROUP BY 1 ORDER BY wl_color""".stripMargin,


    // Same half-month split, masked-hash variants, exact moments.
    "cuped_components" ->
      """WITH u AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
        |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS y
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |v AS (SELECT user_id, x, y,
        |  CAST((md5_number_upper('v|' || user_id) & 9223372036854775807) % 2
        |       AS BIGINT) AS variant FROM u)
        |SELECT variant, count(*) AS n_users, CAST(sum(x) AS BIGINT) AS sum_x,
        |  CAST(sum(y) AS BIGINT) AS sum_y,
        |  CAST(sum(x * y) AS BIGINT) AS sum_xy,
        |  CAST(sum(x * x) AS BIGINT) AS sum_x2,
        |  CAST(sum(y * y) AS BIGINT) AS sum_y2
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,


    "weighted_sssp_knn" -> ssspOracleSql,


    // Same stopword predictor; marginal product sum over the label
    // domain.
    "cohens_kappa_components" ->
      """WITH s AS (
        |  SELECT doc_id, lang,
        |    regexp_split_to_array(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |sc AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(toks, t -> t IN ('the','and','of','to','a','in','is','it','for','on'))) AS s_en,
        |    len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','ein','mit','zu','den'))) AS s_de,
        |    len(list_filter(toks, t -> t IN ('el','la','de','que','y','en','un','es','por','los'))) AS s_es,
        |    len(list_filter(toks, t -> t IN ('le','la','de','et','un','est','pour','que','dans','les'))) AS s_fr
        |  FROM s),
        |j AS (
        |  SELECT lang,
        |    CASE WHEN s_en = greatest(s_en, s_de, s_es, s_fr) AND s_en > 0 THEN 'en'
        |         WHEN s_de = greatest(s_en, s_de, s_es, s_fr) AND s_de > 0 THEN 'de'
        |         WHEN s_es = greatest(s_en, s_de, s_es, s_fr) AND s_es > 0 THEN 'es'
        |         WHEN s_fr = greatest(s_en, s_de, s_es, s_fr) AND s_fr > 0 THEN 'fr'
        |         ELSE 'und' END AS pred
        |  FROM sc),
        |rows_ AS (SELECT lang AS k, count(*) AS r FROM j GROUP BY 1),
        |cols_ AS (SELECT pred AS k, count(*) AS c FROM j GROUP BY 1),
        |marg AS (
        |  SELECT CAST(sum(coalesce(r, 0) * coalesce(c, 0)) AS BIGINT)
        |    AS sum_marginal_products
        |  FROM rows_ FULL OUTER JOIN cols_ USING (k))
        |SELECT (SELECT count(*) FROM j) AS n,
        |  (SELECT CAST(count(*) FILTER (lang = pred) AS BIGINT) FROM j)
        |    AS n_agree,
        |  sum_marginal_products
        |FROM marg""".stripMargin,


    // Same kNN chain; reverse-edge semi-join.
    "knn_reciprocity" ->
      """WITH c AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |s AS (
        |  SELECT a.vec_id, c.cid,
        |    list_sum([a.embedding[i]::DOUBLE * c.cv[i]::DOUBLE
        |              for i in range(1, len(a.embedding) + 1)]) /
        |    (sqrt(list_sum([a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE
        |                    for i in range(1, len(a.embedding) + 1)])) *
        |     sqrt(list_sum([c.cv[i]::DOUBLE * c.cv[i]::DOUBLE
        |                    for i in range(1, len(c.cv) + 1)]))) AS sim
        |  FROM embeddings a CROSS JOIN c),
        |asg AS (SELECT vec_id, cid FROM s
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY sim DESC, cid) = 1),
        |p AS (
        |  SELECT x.vec_id AS src, y.vec_id AS dst,
        |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |              for i in range(1, len(ax.embedding) + 1)]) /
        |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
        |                    for i in range(1, len(ax.embedding) + 1)])) *
        |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
        |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
        |  JOIN embeddings ax ON ax.vec_id = x.vec_id
        |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
        |e AS MATERIALIZED (SELECT src, dst FROM (
        |    SELECT src, dst, row_number() OVER (PARTITION BY src
        |      ORDER BY sim DESC, dst) AS rank FROM p) WHERE rank <= 3)
        |SELECT (SELECT count(*) FROM e) AS n_directed,
        |  (SELECT count(*) FROM e a
        |   WHERE EXISTS (SELECT 1 FROM e b
        |                 WHERE b.src = a.dst AND b.dst = a.src))
        |    AS n_reciprocal,
        |  (SELECT count(*) FROM e a
        |   WHERE EXISTS (SELECT 1 FROM e b
        |                 WHERE b.src = a.dst AND b.dst = a.src)) * 1000
        |    // (SELECT count(*) FROM e) AS reciprocity_permille"""
        .stripMargin,


    // Same whole-unit scaling rule.
    "higher_moments_components" ->
      """WITH t AS (SELECT event_type, CAST(round(value) AS BIGINT) AS x
        |           FROM events)
        |SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT) AS s1,
        |  CAST(sum(x * x) AS BIGINT) AS s2,
        |  CAST(sum(x * x * x) AS BIGINT) AS s3,
        |  CAST(sum(x * x * x * x) AS BIGINT) AS s4
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,


    // Same dense grid and n·Σx²−(Σx)² numerators.
    "cronbach_alpha_components" ->
      """WITH m AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT)
        |    AS x FROM events GROUP BY 1, 2),
        |grid AS (SELECT u.user_id, t.event_type, coalesce(m.x, 0) AS x
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
        |  LEFT JOIN m ON m.user_id = u.user_id
        |    AND m.event_type = t.event_type),
        |iv AS (SELECT event_type, count(*) AS n, CAST(sum(x) AS BIGINT)
        |    AS s, CAST(sum(x * x) AS BIGINT) AS ss FROM grid GROUP BY 1),
        |tot AS (SELECT user_id, CAST(sum(x) AS BIGINT) AS tx
        |        FROM grid GROUP BY 1),
        |tv AS (SELECT count(*) AS n, CAST(sum(tx) AS BIGINT) AS s,
        |       CAST(sum(tx * tx) AS BIGINT) AS ss FROM tot)
        |SELECT (SELECT count(*) FROM iv) AS k, tv.n AS n_users,
        |  (SELECT CAST(sum(n * ss - s * s) AS BIGINT) FROM iv)
        |    AS sum_item_var_num,
        |  CAST(tv.n * tv.ss - tv.s * tv.s AS BIGINT) AS total_var_num
        |FROM tv""".stripMargin,


    // Same pair classification over the same daily aggregate.
    "kendall_tau_components" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS dy, count(*) AS n,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM events GROUP BY 1)
        |SELECT count(*) AS n_pairs,
        |  CAST(sum(CASE WHEN (a.n - b.n) * (a.rev - b.rev) > 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS concordant,
        |  CAST(sum(CASE WHEN (a.n - b.n) * (a.rev - b.rev) < 0
        |    THEN 1 ELSE 0 END) AS BIGINT) AS discordant,
        |  CAST(sum(CASE WHEN a.n = b.n AND a.rev <> b.rev
        |    THEN 1 ELSE 0 END) AS BIGINT) AS ties_x_only,
        |  CAST(sum(CASE WHEN a.rev = b.rev AND a.n <> b.n
        |    THEN 1 ELSE 0 END) AS BIGINT) AS ties_y_only,
        |  CAST(sum(CASE WHEN a.n = b.n AND a.rev = b.rev
        |    THEN 1 ELSE 0 END) AS BIGINT) AS ties_both
        |FROM d a JOIN d b ON a.dy < b.dy""".stripMargin,


    // Same doubled-average-rank form.
    "spearman_rank_components" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS dy, count(*) AS n,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT 2 * rank() OVER (ORDER BY n)
        |      + count(*) OVER (PARTITION BY n) - 1 AS rx2,
        |    2 * rank() OVER (ORDER BY rev)
        |      + count(*) OVER (PARTITION BY rev) - 1 AS ry2
        |  FROM d),
        |tx AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie_x
        |  FROM (SELECT count(*) AS t FROM d GROUP BY n)),
        |ty AS (SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie_y
        |  FROM (SELECT count(*) AS t FROM d GROUP BY rev))
        |SELECT (SELECT count(*) FROM d) AS n_days,
        |  (SELECT CAST(sum((rx2 - ry2) * (rx2 - ry2)) AS BIGINT) FROM r)
        |    AS sum_d2_x4,
        |  tx.tie_x, ty.tie_y
        |FROM tx, ty""".stripMargin,


    // Same multiplicity-preserving bigram frequency-of-frequencies.
    "chao1_richness_components" ->
      """WITH toks AS (
        |  SELECT doc_id, source,
        |    unnest(string_split(trim(regexp_replace(lower(text),
        |      '\s+', ' ', 'g')), ' ')) AS tok,
        |    generate_subscripts(string_split(trim(regexp_replace(
        |      lower(text), '\s+', ' ', 'g')), ' '), 1) AS pos
        |  FROM documents),
        |big AS (
        |  SELECT a.source, a.tok || ' ' || b.tok AS g
        |  FROM toks a JOIN toks b
        |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |c AS (SELECT source, g, count(*) AS c FROM big GROUP BY 1, 2)
        |SELECT source, CAST(sum(c) AS BIGINT) AS n_bigrams,
        |  count(*) AS distinct_bigrams,
        |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
        |  CAST(count(*) * 1000
        |    + (1000 * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
        |       * (sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1))
        |      // (2 * (sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1))
        |    AS BIGINT) AS chao1_milli
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,


    // Same rank-formula components.
    "gini_concentration_components" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS x
        |  FROM orders GROUP BY 1),
        |r AS (SELECT x,
        |  CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT) AS i
        |  FROM rev),
        |a AS (SELECT count(*) AS n_customers,
        |  CAST(sum(x) AS BIGINT) AS total_cents,
        |  CAST(sum(i * x) AS BIGINT) AS rank_weighted_sum FROM r),
        |b AS (SELECT n_customers, total_cents, rank_weighted_sum,
        |  2 * rank_weighted_sum - (n_customers + 1) * total_cents
        |    AS gini_num,
        |  n_customers * total_cents AS gini_den FROM a)
        |SELECT *, gini_num // (gini_den // 1000) AS gini_milli
        |FROM b""".stripMargin,


    // Same kNN edges; common-neighbor counts with zero-support edges
    // kept via the left join.
    "edge_triangle_support" ->
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
        |  SELECT vec_id, cid FROM s
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY sim DESC, cid) = 1),
        |p AS (
        |  SELECT x.vec_id AS src, y.vec_id AS dst,
        |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |              for i in range(1, len(ax.embedding) + 1)]) /
        |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
        |                    for i in range(1, len(ax.embedding) + 1)])) *
        |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
        |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
        |  JOIN embeddings ax ON ax.vec_id = x.vec_id
        |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
        |e AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src
        |                         ORDER BY sim DESC, dst) AS rank
        |    FROM p) WHERE rank <= 3),
        |u AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e WHERE src <> dst),
        |sym2 AS (SELECT a AS v, b AS w FROM u
        |         UNION ALL SELECT b AS v, a AS w FROM u),
        |cn AS (
        |  SELECT u.a, u.b, count(*) AS sup
        |  FROM u JOIN sym2 s1 ON s1.v = u.a
        |  JOIN sym2 s2 ON s2.v = u.b AND s2.w = s1.w
        |  GROUP BY 1, 2),
        |se AS (
        |  SELECT u.a, u.b, coalesce(cn.sup, 0) AS support
        |  FROM u LEFT JOIN cn ON cn.a = u.a AND cn.b = u.b)
        |SELECT support, count(*) AS n_edges,
        |  CAST(sum(a + b) AS BIGINT) AS edge_checksum
        |FROM se GROUP BY 1 ORDER BY 1""".stripMargin,


    // Same four cells + IEEE-quotient point estimate.
    "diff_in_diff_components" ->
      """WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS d0 FROM events),
        |e AS (
        |  SELECT user_id, event_type,
        |    date_diff('day', d0.d0, CAST(ts AS DATE)) AS day,
        |    CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events CROSS JOIN d0),
        |tr AS (SELECT DISTINCT user_id FROM e
        |  WHERE event_type = 'signup' AND day >= 10 AND day < 20),
        |p AS (
        |  SELECT CASE WHEN tr.user_id IS NOT NULL THEN 'T' ELSE 'C' END
        |      AS grp,
        |    CASE WHEN e.day < 10 THEN 'pre' ELSE 'post' END AS period,
        |    e.cents
        |  FROM e LEFT JOIN tr ON tr.user_id = e.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND (e.day < 10 OR e.day >= 20)),
        |c AS (SELECT grp, period, count(*) AS n,
        |    CAST(sum(cents) AS BIGINT) AS sc
        |  FROM p GROUP BY 1, 2),
        |w AS (SELECT
        |  min(CASE WHEN grp = 'T' AND period = 'pre' THEN n END)
        |    AS t_pre_n,
        |  min(CASE WHEN grp = 'T' AND period = 'pre' THEN sc END)
        |    AS t_pre_cents,
        |  min(CASE WHEN grp = 'T' AND period = 'post' THEN n END)
        |    AS t_post_n,
        |  min(CASE WHEN grp = 'T' AND period = 'post' THEN sc END)
        |    AS t_post_cents,
        |  min(CASE WHEN grp = 'C' AND period = 'pre' THEN n END)
        |    AS c_pre_n,
        |  min(CASE WHEN grp = 'C' AND period = 'pre' THEN sc END)
        |    AS c_pre_cents,
        |  min(CASE WHEN grp = 'C' AND period = 'post' THEN n END)
        |    AS c_post_n,
        |  min(CASE WHEN grp = 'C' AND period = 'post' THEN sc END)
        |    AS c_post_cents
        |  FROM c)
        |SELECT t_pre_n, t_pre_cents, t_post_n, t_post_cents,
        |  c_pre_n, c_pre_cents, c_post_n, c_post_cents,
        |  CAST(floor(1000.0 *
        |    ((CAST(t_post_cents AS DOUBLE) / t_post_n
        |      - CAST(t_pre_cents AS DOUBLE) / t_pre_n)
        |   - (CAST(c_post_cents AS DOUBLE) / c_post_n
        |      - CAST(c_pre_cents AS DOUBLE) / c_pre_n))) AS BIGINT)
        |    AS did_milli
        |FROM w""".stripMargin,


    // Same two ranked frames, full-outer.
    "ivm_topk_delta" ->
      """WITH b AS (
        |  SELECT user_id, count(*) AS n_before,
        |    CAST(row_number() OVER (ORDER BY count(*) DESC, user_id)
        |      AS INTEGER) AS rank_before
        |  FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-25'
        |  GROUP BY 1 QUALIFY rank_before <= 10),
        |a AS (
        |  SELECT user_id, count(*) AS n_after,
        |    CAST(row_number() OVER (ORDER BY count(*) DESC, user_id)
        |      AS INTEGER) AS rank_after
        |  FROM events GROUP BY 1 QUALIFY rank_after <= 10),
        |j AS (
        |  SELECT coalesce(b.user_id, a.user_id) AS user_id,
        |    coalesce(b.rank_before, 0) AS rank_before,
        |    coalesce(b.n_before, 0) AS n_before,
        |    coalesce(a.rank_after, 0) AS rank_after,
        |    coalesce(a.n_after, 0) AS n_after
        |  FROM b FULL OUTER JOIN a ON a.user_id = b.user_id)
        |SELECT user_id, rank_before, CAST(n_before AS BIGINT) AS n_before,
        |  rank_after, CAST(n_after AS BIGINT) AS n_after,
        |  CASE WHEN rank_before = 0 THEN 'entered'
        |       WHEN rank_after = 0 THEN 'left'
        |       WHEN rank_after < rank_before THEN 'up'
        |       WHEN rank_after > rank_before THEN 'down'
        |       ELSE 'same' END AS status
        |FROM j
        |ORDER BY CASE WHEN rank_after = 0 THEN 99 ELSE rank_after END,
        |  user_id""".stripMargin,


    // Same balanced take-6 ANOVA integers.
    "design_effect_components" ->
      """WITH y AS (
        |  SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS y
        |  FROM (SELECT user_id, value,
        |      row_number() OVER (PARTITION BY user_id
        |        ORDER BY event_id) AS rn
        |    FROM events) WHERE rn <= 6),
        |per AS (
        |  SELECT user_id, count(*) AS m_i,
        |    CAST(sum(y) AS BIGINT) AS s_i,
        |    CAST(sum(y * y) AS BIGINT) AS ss_i
        |  FROM y GROUP BY 1),
        |b AS (SELECT * FROM per WHERE m_i = 6),
        |a AS (SELECT count(*) AS k,
        |  CAST(sum(s_i) AS BIGINT) AS t_sum,
        |  CAST(sum(s_i * s_i) AS BIGINT) AS sum_si_sq,
        |  CAST(sum(ss_i) AS BIGINT) AS sum_y_sq FROM b)
        |SELECT k, CAST(6 AS BIGINT) AS m, t_sum, sum_y_sq,
        |  k * sum_si_sq - t_sum * t_sum AS km_ssb,
        |  6 * sum_y_sq - sum_si_sq AS m_ssw
        |FROM a""".stripMargin,


    // Same pair table and triple joins.
    "cosine_triangle_violations" ->
      """WITH v AS (SELECT vec_id, embedding FROM embeddings
        |  WHERE vec_id < 30),
        |p AS (
        |  SELECT a.vec_id AS i, b.vec_id AS j,
        |    1.0 - (
        |    list_sum([a.embedding[i2]::DOUBLE * b.embedding[i2]::DOUBLE
        |              for i2 in range(1, len(a.embedding) + 1)]) /
        |    (sqrt(list_sum([a.embedding[i2]::DOUBLE * a.embedding[i2]::DOUBLE
        |                    for i2 in range(1, len(a.embedding) + 1)])) *
        |     sqrt(list_sum([b.embedding[i2]::DOUBLE * b.embedding[i2]::DOUBLE
        |                    for i2 in range(1, len(b.embedding) + 1)]))))
        |      AS dist
        |  FROM v a JOIN v b ON a.vec_id < b.vec_id),
        |t AS (
        |  SELECT ab.i AS a, ab.j AS b, bc.j AS c,
        |    ac.dist - ab.dist - bc.dist AS v1,
        |    ab.dist - ac.dist - bc.dist AS v2,
        |    bc.dist - ab.dist - ac.dist AS v3
        |  FROM p ab JOIN p bc ON bc.i = ab.j
        |  JOIN p ac ON ac.i = ab.i AND ac.j = bc.j)
        |SELECT count(*) AS n_triples, count(*) * 3 AS n_checks,
        |  CAST(sum((CASE WHEN v1 > 0 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v2 > 0 THEN 1 ELSE 0 END)
        |    + (CASE WHEN v3 > 0 THEN 1 ELSE 0 END)) AS BIGINT)
        |    AS n_violating_checks,
        |  CAST(sum(CASE WHEN v1 > 0 OR v2 > 0 OR v3 > 0 THEN 1 ELSE 0
        |    END) AS BIGINT) AS n_violating_triples,
        |  CAST(floor(greatest(max(v1), max(v2), max(v3)) * 1000)
        |    AS BIGINT) AS max_violation_milli
        |FROM t""".stripMargin,


    // Same kNN edges; wedges from degrees, triangles by closing edge.
    "agm_triangle_blowup" ->
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
        |  SELECT vec_id, cid FROM s
        |  QUALIFY row_number() OVER (PARTITION BY vec_id
        |                             ORDER BY sim DESC, cid) = 1),
        |p AS (
        |  SELECT x.vec_id AS src, y.vec_id AS dst,
        |    list_sum([ax.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |              for i in range(1, len(ax.embedding) + 1)]) /
        |    (sqrt(list_sum([ax.embedding[i]::DOUBLE * ax.embedding[i]::DOUBLE
        |                    for i in range(1, len(ax.embedding) + 1)])) *
        |     sqrt(list_sum([ay.embedding[i]::DOUBLE * ay.embedding[i]::DOUBLE
        |                    for i in range(1, len(ay.embedding) + 1)]))) AS sim
        |  FROM asg x JOIN asg y ON x.cid = y.cid AND x.vec_id <> y.vec_id
        |  JOIN embeddings ax ON ax.vec_id = x.vec_id
        |  JOIN embeddings ay ON ay.vec_id = y.vec_id),
        |e AS (
        |  SELECT src, dst FROM (
        |    SELECT src, dst,
        |      row_number() OVER (PARTITION BY src
        |                         ORDER BY sim DESC, dst) AS rank
        |    FROM p) WHERE rank <= 3),
        |u AS (
        |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
        |  FROM e WHERE src <> dst),
        |sym2 AS (SELECT a AS v, b AS w FROM u
        |         UNION ALL SELECT b AS v, a AS w FROM u),
        |dg AS (SELECT v, count(*) AS dg FROM sym2 GROUP BY 1),
        |wd AS (SELECT CAST(sum(dg * (dg - 1) // 2) AS BIGINT)
        |  AS n_wedges FROM dg),
        |m AS (SELECT count(*) AS n_edges FROM u),
        |tri AS (
        |  SELECT count(*) AS n_triangles
        |  FROM u ab JOIN u bc ON bc.a = ab.b
        |  JOIN u ac ON ac.a = ab.a AND ac.b = bc.b)
        |SELECT m.n_edges, wd.n_wedges, tri.n_triangles,
        |  CASE WHEN tri.n_triangles > 0
        |    THEN (1000 * wd.n_wedges) // tri.n_triangles ELSE -1 END
        |    AS wedge_per_triangle_milli
        |FROM m CROSS JOIN wd CROSS JOIN tri""".stripMargin,


    // Same cleared-fraction components.
    "arc_elasticity_components" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS q,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sc
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |l AS (SELECT day, CAST(q AS BIGINT) AS q2, sc AS s2,
        |    CAST(lag(q) OVER (ORDER BY day) AS BIGINT) AS q1,
        |    lag(sc) OVER (ORDER BY day) AS s1
        |  FROM daily)
        |SELECT strftime(day, '%Y-%m-%d') AS day, q1, q2, s1, s2,
        |  (q2 - q1) * (s1 * q2 + s2 * q1) AS e_num,
        |  (s2 * q1 - s1 * q2) * (q1 + q2) AS e_den
        |FROM l WHERE q1 IS NOT NULL ORDER BY day""".stripMargin,


    // Same four cells around the same median cutoff.
    "regression_discontinuity_components" ->
      """WITH users AS (
        |  SELECT user_id, count(*) AS activity,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END)
        |      AS BIGINT) AS pc
        |  FROM events GROUP BY 1),
        |nu AS (SELECT count(*) AS nu FROM users),
        |thr AS (SELECT activity AS cut FROM users CROSS JOIN nu
        |  QUALIFY row_number() OVER (ORDER BY activity, user_id)
        |    = (nu + 1) // 2)
        |SELECT min(cut) AS cutoff_activity,
        |  CAST(sum(CASE WHEN activity < cut AND activity >= cut - 2
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_below_narrow,
        |  CAST(sum(CASE WHEN activity < cut AND activity >= cut - 2
        |    THEN pc ELSE 0 END) AS BIGINT) AS cents_below_narrow,
        |  CAST(sum(CASE WHEN activity >= cut AND activity < cut + 2
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_above_narrow,
        |  CAST(sum(CASE WHEN activity >= cut AND activity < cut + 2
        |    THEN pc ELSE 0 END) AS BIGINT) AS cents_above_narrow,
        |  CAST(sum(CASE WHEN activity < cut AND activity >= cut - 8
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_below_wide,
        |  CAST(sum(CASE WHEN activity < cut AND activity >= cut - 8
        |    THEN pc ELSE 0 END) AS BIGINT) AS cents_below_wide,
        |  CAST(sum(CASE WHEN activity >= cut AND activity < cut + 8
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_above_wide,
        |  CAST(sum(CASE WHEN activity >= cut AND activity < cut + 8
        |    THEN pc ELSE 0 END) AS BIGINT) AS cents_above_wide
        |FROM users CROSS JOIN thr""".stripMargin,


    // Same per-type medians and integer deviations.
    "levene_components" ->
      """WITH ev AS (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |nn AS (SELECT event_type, count(*) AS n FROM ev GROUP BY 1),
        |med AS (
        |  SELECT ev.event_type, ev.cents AS med
        |  FROM ev JOIN nn USING (event_type)
        |  QUALIFY row_number() OVER (PARTITION BY ev.event_type
        |    ORDER BY cents, event_id) = (n + 1) // 2),
        |z AS (SELECT ev.event_type, med.med,
        |    abs(ev.cents - med.med) AS z
        |  FROM ev JOIN med USING (event_type))
        |SELECT event_type, count(*) AS n, min(med) AS median_cents,
        |  CAST(sum(z) AS BIGINT) AS sum_absdev,
        |  CAST(sum(z * z) AS BIGINT) AS sum_absdev_sq
        |FROM z GROUP BY 1 ORDER BY 1""".stripMargin,


    // Same sign sequence and run counting.
    "runs_test_components" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT)
        |      AS rev
        |  FROM events GROUP BY 1),
        |s1 AS (SELECT day, rev, lag(rev) OVER (ORDER BY day) AS prev
        |  FROM daily),
        |s2 AS (SELECT day, CASE WHEN rev > prev THEN 1 ELSE 0 END AS up
        |  FROM s1 WHERE prev IS NOT NULL),
        |s3 AS (SELECT up,
        |  CASE WHEN up <> lag(up) OVER (ORDER BY day) THEN 1 ELSE 0 END
        |    AS flip FROM s2)
        |SELECT CAST(sum(up) AS BIGINT) AS n1,
        |  CAST(sum(1 - up) AS BIGINT) AS n2,
        |  CAST(sum(flip) + 1 AS BIGINT) AS n_runs,
        |  CAST(sum(up) + sum(1 - up) + 2 * sum(up) * sum(1 - up)
        |    AS BIGINT) AS expected_runs_num,
        |  CAST(sum(up) + sum(1 - up) AS BIGINT) AS expected_runs_den
        |FROM s3""".stripMargin,


    // Same cross-multiplied D statistic over the distinct-cents support.
    "ks_test_components" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |g AS (
        |  SELECT cents,
        |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k1,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k2
        |  FROM ev GROUP BY 1),
        |t AS (
        |  SELECT CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n1,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n2 FROM ev),
        |c AS (
        |  SELECT cents,
        |    CAST(sum(k1) OVER (ORDER BY cents) AS BIGINT) AS f1,
        |    CAST(sum(k2) OVER (ORDER BY cents) AS BIGINT) AS f2
        |  FROM g)
        |SELECT n1, n2, CAST(abs(f1 * n2 - f2 * n1) AS BIGINT) AS d_num,
        |  CAST(n1 * n2 AS BIGINT) AS d_den, cents AS d_at_cents
        |FROM c, t
        |QUALIFY row_number() OVER (ORDER BY abs(f1 * n2 - f2 * n1) DESC,
        |  cents) = 1""".stripMargin
  )
}
