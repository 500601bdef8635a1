package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf1-scale generator for the quadratic-tail bench
  * (VERDICT r6 #6): documents and embeddings at 10× sf0.1 (50 000 docs /
  * 20 000 vectors), mirroring the driver tables' shape — word-soup text
  * over a small vocabulary, a few percent planted near-duplicate and
  * exact-duplicate structure, lang/source splits — WITHOUT replicating
  * rows (a naive 10× copy of sf0.1 would plant 10-cliques of exact dups
  * and measure the clique blow-up, not the operator's scaling).
  *
  * Everything derives from xxhash64(seed, id): no RNG state, so the
  * output is identical across runs and partitionings.
  *
  * Usage: Test/runMain graft.GenScaleData <outDir> [docs] [vecs]
  */
object GenScaleData {

  private val vocab = Seq("key", "agg", "row", "scan", "slow", "fast",
    "table", "value", "part", "hash", "merge", "batch", "spark", "line",
    "sort", "window", "the", "a", "stream", "query", "big", "small",
    "join", "filter", "group", "order", "data", "column", "customer",
    "shuffle", "broadcast", "bucket", "codegen", "parquet", "exchange",
    "plan")

  private def h(seed: Int, c: Column): Column = xxhash64(lit(seed), c)

  /** The word stream of document `idExpr`: 20..90 vocab words (avg ~55,
    * matching the driver tables' ~300-char word-soup documents — doc
    * LENGTH shapes n-gram similarity quadratically, so the scale corpus
    * must match it, not just the row count), fully determined by the id —
    * so a doc built from another doc's id is an exact copy of its text.
    */
  private def wordStream(idExpr: Column): Column = {
    val len = (pmod(h(1, idExpr), lit(70)) + 20).cast("int")
    concat_ws(" ", transform(sequence(lit(0), len - 1),
      k => element_at(lit(vocab.toArray),
        (pmod(h(2, idExpr * 131 + k.cast("long")), lit(vocab.size)) + 1)
          .cast("int"))))
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/root/repo/tmp-sf1")
    val nDocs = args.lift(1).map(_.toLong).getOrElse(50000L)
    val nVecs = args.lift(2).map(_.toLong).getOrElse(20000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val langs = Seq("en", "en", "en", "en", "de", "fr", "es", "zh")
    val id = col("doc_id")
    // Planted structure at scale-invariant RATES (the driver tables'
    // magnitudes): ~1% near-dup of the predecessor (same stream + one
    // extra token -> high Jaccard, small edit distance), ~0.5% exact dup.
    val docs = spark.range(nDocs).select(col("id").as("doc_id"))
      .withColumn("text",
        when(pmod(id, lit(100)) === 1,
          concat_ws(" ", wordStream(id - 1), lit("extra")))
          .when(pmod(id, lit(200)) === 3, wordStream(id - 3))
          .otherwise(wordStream(id)))
      .withColumn("lang", element_at(lit(langs.toArray),
        (pmod(h(3, id), lit(langs.size)) + 1).cast("int")))
      .withColumn("source", concat(lit("src"), pmod(h(4, id), lit(10))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
    docs.repartition(8).write.mode("overwrite")
      .parquet(s"$outDir/documents.parquet")

    // embeddings: 64-dim floats in [-1, 1), ~2% planted near-dups (the
    // predecessor's vector uniformly scaled -> cosine 1 against it)
    val vid = col("vec_id")
    val base = when(pmod(vid, lit(50)) === 1, vid - 1).otherwise(vid)
    val vecs = spark.range(nVecs).select(col("id").as("vec_id"))
      .withColumn("embedding", transform(sequence(lit(0), lit(63)),
        // cast the FINAL value: float arithmetic promotes to double in
        // Spark SQL, and a double-typed array breaks float vectorized reads
        j => (pmod(h(5, base * 67 + j.cast("long")), lit(2000)) / lit(1000.0)
          - lit(1.0)).cast("float")))
      .withColumn("embedding",
        when(pmod(vid, lit(50)) === 1,
          transform(col("embedding"), x => (x * lit(0.95)).cast("float")))
          .otherwise(col("embedding")))
      .withColumn("label", pmod(h(6, vid), lit(16)).cast("int"))
      .select("vec_id", "embedding", "label")
    vecs.repartition(4).write.mode("overwrite")
      .parquet(s"$outDir/embeddings.parquet")

    println(s"wrote $nDocs docs + $nVecs vecs to $outDir")
    spark.stop()
  }
}
