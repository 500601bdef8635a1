package graft

import graft.functions.GraftFunctions

class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions work from spark.sql") {
    GraftFunctions.register(spark)
    Seq(("2026-01-01 04:00:00", Array(1.0f, 2.0f), Array(3.0f, 4.0f)))
      .toDF("ts_s", "a", "b").createOrReplaceTempView("g_test")
    val r = spark.sql(
      """SELECT session_id(CAST(ts_s AS TIMESTAMP)) AS sid,
        |  date_market_type(CAST(ts_s AS TIMESTAMP)) AS dmt,
        |  vec_dot(a, b) AS d, vec_norm_sq(a) AS n,
        |  date_format(third_wednesday(DATE '2025-12-01'), 'yyyy-MM-dd') AS tw,
        |  next_contract_month('202512') AS nc
        |FROM g_test""".stripMargin).collect()(0)
    assert(r.getAs[String]("sid") == "2025-12-31_N")
    assert(r.getAs[String]("dmt") == "251231N")
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Double]("n") == 5.0)
    assert(r.getAs[String]("tw") == "2025-12-17")
    assert(r.getAs[String]("nc") == "202601")
  }
}
