package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's `private[sql]` Column <-> Expression conversions
  * (classic mode). The standard pattern for libraries that define native
  * Catalyst expressions: one shim object compiled into the sql package,
  * everything else stays in the library's own namespace.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Eager ColumnNode → catalyst conversion: the lazy
    * `ExpressionUtils.expression` wrapper (`ColumnNodeExpression`) is only
    * unwrapped on DataFrame API paths; expressions returned from a
    * function-registry builder must be real catalyst trees (unresolved
    * functions inside are fine — the analyzer resolves them in place).
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a function into an EXISTING session's registry (unlike
    * `SparkSessionExtensions`, which only applies at builder time).
    */
  def registerFunction(spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")
}
