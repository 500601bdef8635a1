package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal,
  UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All k MinHash signature components in ONE array traversal, fully
  * codegen'd — the native replacement for the explode + k-aggregate
  * signature pipeline ([[graft.ops.Dedup.minhashSignature]]'s original
  * form): `sig[i] = min over elements e of xxhash64(i, e)`.
  *
  * Why an Expression and not built-ins:
  *  - the explode+groupBy form pays a SHUFFLE of every (doc, shingle)
  *    occurrence just to re-meet rows that started on the same row — the
  *    aggregation is per-document, so it never needed to move;
  *  - the shuffle-free built-in spelling,
  *    `array_min(transform(arr, e -> xxhash64(i, e)))` × k, runs the
  *    lambda INTERPRETED (higher-order functions stay outside
  *    whole-stage codegen — the TextAnalysis "interpreted-HOF trap"),
  *    k passes per row.
  *  This expression is one pass, k running minima in registers,
  *  generated Java in the codegen stage.
  *
  * Bit-compatibility contract (spec-pinned): component i equals the
  * built-in `min(xxhash64(lit(i), e))`. Spark's multi-arg xxhash64 folds
  * left with seed 42 — `xxhash64(lit(i), e) = hashLong(e, seed_i)` where
  * `seed_i = xxhash64(lit(i))` — so the per-family seeds are obtained by
  * EVALUATING `XxHash64(Literal(i))` once at plan time and the per-element
  * work is a single `XXH64.hashLong`. Empty input yields NULL (the
  * aggregate form emits no row for a shingle-less document; callers
  * filter, preserving that contract).
  */
case class MinHashSigs(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "k must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  // Both eval paths read elements with arr.getLong(j), which on a
  // null-slot or non-long array would silently mis-hash garbage instead
  // of skipping like the pinned xxhash64-aggregate form — so reject
  // anything but ARRAY<BIGINT> with containsNull=false at ANALYSIS time.
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sigs requires ARRAY<BIGINT> with containsNull=false " +
            s"(hashed shingles never contain nulls); got ${other.sql}")
    }

  // seed_i = xxhash64(lit(i)) under the default seed 42 — the exact fold
  // prefix of the built-in xxhash64(lit(i), e).
  private lazy val seeds: Array[Long] =
    Array.tabulate(k)(i =>
      XxHash64(Seq(Literal(i)), 42L).eval(null).asInstanceOf[Long])

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val e = arr.getLong(j)
      var i = 0
      while (i < k) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashLong(e, seeds(i))
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("mhSeeds", seeds, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val e = ctx.freshName("e")
      val h = ctx.freshName("h")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $e = $a.getLong($j);
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |        .hashLong($e, $seedsRef[$i]);
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |    }
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column facade. */
object minhashSigs {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def apply(hashedShingles: Column, k: Int): Column =
    column(MinHashSigs(expression(hashedShingles), k))
}
