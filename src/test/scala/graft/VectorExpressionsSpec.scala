package graft

import org.apache.spark.sql.functions._

import graft.functions.vectors
import graft.ops.Similarity

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("native VecDot/VecNormSq are bit-identical to the HOF fold on real embeddings") {
    val emb = Tables.embeddings(spark, sf0001)
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".as("qv")).crossJoin(emb)
    val diff = q.select(
        vectors.vecDot($"embedding", $"qv").as("fast"),
        Similarity.dotHof($"embedding", $"qv").as("hof"),
        vectors.vecNormSq($"embedding").as("fastn"),
        (Similarity.normHof($"embedding") * Similarity.normHof($"embedding")).as("hofn"))
      .filter($"fast" =!= $"hof")
      .count()
    assert(diff == 0)
  }

  test("known values + empty/zero-vector edges") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array.empty[Float], Array.empty[Float]),
      (Array(0.0f, 0.0f), Array(1.0f, 1.0f))
    ).toDF("a", "b")
    val rows = df.select(
      vectors.vecDot($"a", $"b").as("d"),
      vectors.cosineFast($"a", $"b").as("c")).collect()
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(1).getDouble(0) == 0.0 && rows(1).getDouble(1) == 0.0)
    assert(rows(2).getDouble(1) == 0.0) // zero vector -> cosine 0, no NaN
  }

  test("the native expression participates in whole-stage codegen") {
    val emb = Tables.embeddings(spark, sf0001)
    val df = emb.select(vectors.vecNormSq($"embedding").as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"codegen fell back:\n$plan")
  }
}
