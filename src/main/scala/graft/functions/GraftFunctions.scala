package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftColumnBridge.{column, expression, registerFunction}
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.time.{RolloverCalendar, SessionCalendar}

/** SQL-facing registration of the engine's function surface: after
  * `GraftFunctions.register(spark)`, every function is callable from
  * `spark.sql(...)` — the library serves SQL users, not only the
  * DataFrame API.
  *
  * The session/rollover functions are Column combinators lowered through
  * the bridge; `vec_dot`/`vec_norm_sq` bind the native codegen'd
  * expressions directly.
  */
object GraftFunctions {

  private def lift1(f: Column => Column): Seq[Expression] => Expression =
    exprs => expression(f(column(exprs.head)))

  val all: Map[String, Seq[Expression] => Expression] = Map(
    "vec_dot" -> (exprs => VecDot(exprs(0), exprs(1))),
    "vec_norm_sq" -> (exprs => VecNormSq(exprs.head)),
    "session_id" -> lift1(SessionCalendar.sessionId),
    "market_type" -> lift1(SessionCalendar.marketType),
    "date_market_type" -> lift1(SessionCalendar.dateMarketType(_)),
    "session_open_date" -> lift1(SessionCalendar.sessionOpenDate),
    "third_wednesday" -> lift1(RolloverCalendar.thirdWednesday),
    "next_contract_month" -> lift1(RolloverCalendar.nextContractMonth))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) => registerFunction(spark, name, builder) }
}
