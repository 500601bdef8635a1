package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: time selected queries twice in one session to
  * separate plan/codegen overhead from steady-state execution.
  * `runMain graft.Profile <sfDir> <query1> <query2> ...`
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("GRAFT_LOG", "ERROR"))
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    if (args.tail.headOption.contains("explainq")) {
      // generic formatted-plan dump for any SparkEntry query:
      //   runMain graft.Profile <sfDir> explainq <query1> <query2> ...
      import org.apache.spark.sql.execution.ExplainMode
      args.drop(2).foreach { q =>
        println(s"===== $q =====")
        println(SparkEntry.queries(q)(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted")))
      }
    } else if (args.tail.headOption.contains("showplans")) {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.execution.ExplainMode
      def show(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
        println(s"===== $label =====")
        println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
      }
      show("resample", SparkEntry.queries("resample_5m_ohlcv")(spark, sfDir))
      show("resample_bars", graft.ops.Resample.ohlcvBars(
        Tables.events(spark, sfDir).select(col("ts"), col("value").as("open"),
          col("value").as("high"), col("value").as("low"), col("value").as("close"),
          lit(1L).as("volume")), "5 minutes"))
      show("dedup_exact", graft.ops.Dedup.exact(
        Tables.documents(spark, sfDir), "text", "doc_id"))
    } else if (args.tail.headOption.contains("simhash")) {
      import org.apache.spark.sql.functions._
      import graft.ops.Dedup
      val docs = Tables.documents(spark, sfDir)
      val fp = Dedup.simhash64(docs, "text", "doc_id").cache()
      time("fingerprints")(fp.count())
      time("pairs (fp cached)")(Dedup.simhashPairs(docs, "text", "doc_id",
        maxDistance = 8).count())
    } else if (args.tail.headOption.contains("ngram")) {
      import org.apache.spark.sql.functions._
      import graft.ops.Dedup
      val docs = Tables.documents(spark, sfDir)
      val blockCols = Seq("lang" -> col("lang"),
        "len_bucket" -> (col("n_chars") / 64).cast("long"))
      val sh = docs.repartition(col("doc_id")).select(
        Seq(col("doc_id")) ++ blockCols.map { case (nm, c) => c.as(nm) } :+
          sort_array(Dedup.hashedShingles(col("text"), 2)).as("__s"): _*).cache()
      time("shingle+sort")(sh.count())
      val sz = size(col("__s"))
      val prefLen = (sz - ceil(sz * 0.5 - 1e-9) + 1).cast("int")
      val pref = sh.select(col("doc_id"), col("lang"), col("len_bucket"),
        explode(slice(col("__s"), lit(1), greatest(prefLen, lit(0)))).as("__tok"))
      val pl = pref.select(col("doc_id").as("id1"), col("lang"), col("len_bucket"), col("__tok"))
      val pr = pref.select(col("doc_id").as("id2"), col("lang"), col("len_bucket"), col("__tok"))
      time("join fanout (pre-distinct)")(pl.join(pr, Seq("__tok", "lang", "len_bucket"))
        .filter(col("id1") < col("id2")).count())
      time("prefix candidates")(Dedup.ngramPrefixCandidates(
        sh, "doc_id", blockCols.map(_._1), 0.5).count())
      val l = sh.select(col("doc_id").as("id1"), col("lang"), col("len_bucket"), col("__s").as("s1"))
      val r = sh.select(col("doc_id").as("id2"), col("lang"), col("len_bucket"), col("__s").as("s2"))
      time("naive full (parallel shingle)")(l.join(r, Seq("lang", "len_bucket"))
        .filter(col("id1") < col("id2"))
        .withColumn("jaccard", size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2"))))
        .filter(col("jaccard") >= 0.5).count())
      time("full query")(SparkEntry.queries("dedup_ngram_lang_block")(spark, sfDir).count())
    } else if (args.tail.headOption.contains("stages")) {
      import graft.ops.Dedup
      val docs = Tables.documents(spark, sfDir)
      time("shingles")(docs.select(org.apache.spark.sql.functions.explode(
        Dedup.hashedShingles(org.apache.spark.sql.functions.col("text"), 3))).count())
      val sig = Dedup.minhashSignature(docs, "text", "doc_id", k = 32)
      time("signature")(sig.count())
      val cand = Dedup.minhashCandidates(sig, "doc_id", k = 32, bands = 16)
      time("candidates")(cand.count())
      time("verify")(Dedup.ngramJaccard(docs, cand, "text", "doc_id", 3).count())
    } else if (args.tail.headOption.contains("editdist")) {
      // Stage breakdown of Dedup.editDistancePairs: normalize/keys,
      // candidate generation, distance scoring, plus the real operator and
      // the per-(block, length-bucket) occupancy histogram. (The r5 5.6 s
      // regression lived in the JOIN CONDITION: Catalyst pushed the
      // two-conjunct distance filter into the BroadcastHashJoin, where
      // levenshtein has no subexpression elimination — see the scaladoc on
      // editDistancePairs.)
      import org.apache.spark.sql.functions._
      import graft.ops.Dedup
      val docs = Tables.documents(spark, sfDir)
      time("docs")(docs.count())
      val keyed = docs.select(col("doc_id"),
        Dedup.normalize(col("text")).as("__norm"))
        .select(col("doc_id"),
          xxhash64(substring(col("__norm"), 1, 40)).as("__blk"),
          substring(col("__norm"), 1, 300).as("__t"))
        .withColumn("__len", length(col("__t")))
        .withColumn("__lb", floor(col("__len") / 60)).cache()
      time("keys (cached)")(keyed.count())
      val l = keyed.select(col("doc_id").as("id1"), col("__blk"), col("__lb"),
        col("__len").as("len1"), col("__t").as("t1"))
      val r = keyed.select(col("doc_id").as("id2"), col("__blk"),
        explode(array(col("__lb") - 1, col("__lb"), col("__lb") + 1)).as("__lb"),
        col("__len").as("len2"), col("__t").as("t2"))
      val cand = l.join(r, Seq("__blk", "__lb"))
        .filter(col("id1") < col("id2"))
        .filter(abs(col("len1") - col("len2")) <= 60)
      time("join pre-filter")(l.join(r, Seq("__blk", "__lb")).count())
      time("candidates")(cand.count())
      time("levenshtein on candidates")(cand
        .filter(levenshtein(col("t1"), col("t2"), 60) >= 0).count())
      spark.sharedState.cacheManager.clearCache()
      (1 to 2).foreach { i =>
        time(s"real operator run$i")(Dedup.editDistancePairs(docs, "text",
          "doc_id", prefixLen = 40, maxLen = 300, maxDist = 60).count())
      }
      println("[profile] (block, length-bucket) histogram (top 10):")
      keyed.groupBy("__blk", "__lb").count().orderBy(desc("count")).show(10)
    } else if (args.tail.headOption.contains("shingleonly")) {
      import org.apache.spark.sql.functions._
      import graft.ops.Dedup
      val docs = Tables.documents(spark, sfDir)
      (1 to 3).foreach { i =>
        time(s"string shingle explode run$i")(docs.repartition(col("doc_id"))
          .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("g"))
          .count())
      }
      (1 to 3).foreach { i =>
        time(s"hashed shingle explode run$i")(docs.repartition(col("doc_id"))
          .select(col("doc_id"), explode(Dedup.hashedShingles(col("text"), 3)).as("g"))
          .count())
      }
    } else if (args.tail.headOption.contains("bandcurve")) {
      // Stage breakdown of minhash_band_recall_curve (VERDICT r8 #4;
      // r14: 1024-doc cap to match the shipped query).
      import org.apache.spark.sql.functions._
      import graft.ops.Dedup
      val docs = Tables.documents(spark, sfDir).filter(col("doc_id") < 1024)
      val sh = docs.repartition(
          spark.sessionState.conf.numShufflePartitions, col("doc_id"))
        .select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("g"))
      time("shingle explode")(sh.count())
      val gh = sh.select("g").distinct().select((col("g") +: (0 until 16)
        .map(i => Dedup.md5Hash64(concat(lit(s"mh$i|"), col("g")))
          .bitwiseAND(lit(Long.MaxValue)).as(s"h$i"))) :+
          xxhash64(col("g")).as("xh"): _*)
      time("distinct md5 hashes")(gh.count())
      val hashed = sh.join(broadcast(gh), "g").drop("g").cache()
      time("hashed join (cache)")(hashed.count())
      val sigs = hashed.groupBy("doc_id").agg(
        min(col("h0")).as("s0"),
        (1 until 16).map(i => min(col(s"h$i")).as(s"s$i")): _*).cache()
      time("sigs")(sigs.count())
      def candidates(bands: Int, rows: Int) = {
        val keys = array((0 until bands).map(j =>
          struct(lit(j).as("bi"), concat_ws(",",
            (0 until rows).map(x => col(s"s${j * rows + x}")): _*).as("bk"))): _*)
        val b = sigs.select(col("doc_id"), explode(keys).as("e"))
          .select(col("doc_id"), col("e.bi").as("bi"), col("e.bk").as("bk"))
        b.select(col("doc_id").as("id1"), col("bi"), col("bk"))
          .join(b.select(col("doc_id").as("id2"), col("bi"), col("bk")),
            Seq("bi", "bk"))
          .filter(col("id1") < col("id2"))
          .select("id1", "id2").distinct()
          .withColumn("config", lit(s"b${bands}_r$rows"))
      }
      time("cand 1x16")(candidates(1, 16).count())
      time("cand 2x8")(candidates(2, 8).count())
      time("cand 4x4")(candidates(4, 4).count())
      time("cand 8x2")(candidates(8, 2).count())
      val xsigs = hashed.groupBy("doc_id").agg(
        min(xxhash64(lit(0), col("xh"))).as("sig_0"),
        (1 until 16).map(i => min(xxhash64(lit(i), col("xh"))).as(s"sig_$i")): _*)
      val gcand = Dedup.minhashCandidates(xsigs, "doc_id", k = 16, bands = 8)
      time("gold candidates")(gcand.count())
      val arrs = hashed.groupBy("doc_id").agg(collect_set(col("xh")).as("hs"))
      time("gold verify")(gcand
        .join(arrs.select(col("doc_id").as("id1"), col("hs").as("hs1")), "id1")
        .join(arrs.select(col("doc_id").as("id2"), col("hs").as("hs2")), "id2")
        .filter(size(array_intersect(col("hs1"), col("hs2"))).cast("double") /
          size(array_union(col("hs1"), col("hs2"))) >= 0.8).count())
      spark.sharedState.cacheManager.clearCache()
      time("full query")(SparkEntry.queries("minhash_band_recall_curve")(spark, sfDir).count())
    } else if (args.tail.headOption.contains("funnel")) {
      // Stage breakdown of curation_funnel (VERDICT r8 #7).
      import org.apache.spark.sql.functions._
      import graft.ops.{Dedup, TextAnalysis}
      val docs = Tables.documents(spark, sfDir)
      val evalDocs = docs.filter(col("source") === "src0")
      val raw = TextAnalysis.withQualityScore(
        docs.filter(col("source") =!= "src0"), "text", "quality").cache()
      time("quality+cache")(raw.count())
      val lenPred = col("n_chars").between(100, 20000)
      val qPred = round(col("quality"), 6) >= 0.9
      time("head conditional sums")(raw.agg(count(lit(1)),
        sum(when(lenPred, 1L)), sum(when(lenPred && qPred, 1L))).count())
      val s2 = raw.filter(lenPred && qPred)
      val s3 = Dedup.decontaminate(s2, evalDocs, "text", "doc_id", n = 5).cache()
      time("decontaminate+cache")(s3.count())
      val pairs = Dedup.minhashExactPairs(s3, "text", "doc_id",
        k = 16, bands = 8, shingleN = 3, threshold = 0.8)
      time("minhash pairs")(pairs.count())
      time("survivors (components)")(Dedup.nearDupSurvivors(s3, pairs, "doc_id").count())
      spark.sharedState.cacheManager.clearCache()
      time("full query")(SparkEntry.queries("curation_funnel")(spark, sfDir).count())
    } else args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        spark.sharedState.cacheManager.clearCache()
        time(s"$name run$i")(fn(spark, sfDir).count())
      }
    }
    spark.stop()
  }
}
