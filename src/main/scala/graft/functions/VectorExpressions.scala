package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector-similarity hot path.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * allocates a lambda frame per element; these expressions generate a tight
  * primitive loop instead (`doGenCode`), which is the difference between
  * scanning a 100 TB embedding corpus at memory bandwidth and at lambda
  * dispatch speed. Accumulation is left-to-right in double, bit-identical
  * to the HOF form (asserted in VectorExpressionsSpec) and to DuckDB's
  * sequential list fold — so swapping the implementation cannot change
  * oracle results.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sum of squares of a float vector (squared L2 norm), same loop shape. */
case class VecNormSq(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < x.numElements()) {
      val v = x.getFloat(i).toDouble; s += v * v; i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val v = ctx.freshName("v")
      s"""
         |double $s = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $s += $v * $v;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-facade for the native vector expressions (Column <-> Expression
  * bridging via the Spark 4 classic-mode ExpressionUtils).
  */
object vectors {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def vecDot(a: Column, b: Column): Column =
    column(VecDot(expression(a), expression(b)))
  def vecNormSq(a: Column): Column = column(VecNormSq(expression(a)))

  /** Cosine similarity on `array<float>` columns via the native loop
    * expressions; 0 for zero vectors (same contract as
    * [[graft.ops.Similarity.cosine]]).
    */
  def cosineFast(a: Column, b: Column): Column = {
    val d = sqrt(vecNormSq(a)) * sqrt(vecNormSq(b))
    when(d === 0.0, 0.0).otherwise(vecDot(a, b) / d)
  }
}
