package graft

import org.apache.spark.sql.functions._

import graft.ops.BloomJoin

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bloom-pruned semi join equals the plain semi join on real tables") {
    val li = Tables.lineitem(spark, sf0001)
    val urgent = Tables.orders(spark, sf0001)
      .filter($"o_orderpriority" === "1-URGENT")
    val plain = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"),
        "left_semi")
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().toSet
    val bloomed = BloomJoin.semiJoin(li, urgent, "l_orderkey", "o_orderkey",
        expectedItems = 4096, numBits = 1 << 16)
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().toSet
    assert(bloomed == plain && plain.nonEmpty)
  }

  test("a deliberately tiny bloom (high FP rate) still yields exact results") {
    val li = Tables.lineitem(spark, sf0001)
    val urgent = Tables.orders(spark, sf0001)
      .filter($"o_orderpriority" === "1-URGENT")
    // 64 bits for thousands of keys: nearly every probe row passes the
    // bloom; the exact join must still remove every false positive
    val bloomed = BloomJoin.semiJoin(li, urgent, "l_orderkey", "o_orderkey",
        expectedItems = 16, numBits = 64)
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().toSet
    val plain = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"),
        "left_semi")
      .select("l_orderkey", "l_linenumber").as[(Long, Long)].collect().toSet
    assert(bloomed == plain)
  }

  test("empty build side yields an empty result (NULL bloom drops all rows)") {
    val li = Tables.lineitem(spark, sf0001)
    val none = Tables.orders(spark, sf0001).filter($"o_orderkey" < 0)
    assert(BloomJoin.semiJoin(li, none, "l_orderkey", "o_orderkey",
      expectedItems = 16, numBits = 64).count() == 0)
  }

  test("the might_contain prune sits on the probe side below the semi join") {
    val plan = SparkEntry.queries("bloom_semi_join")(spark, sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    assert(plan.contains("might_contain"), s"bloom prune missing:\n$plan")
    val pruneLine = plan.split("\n").indexWhere(_.contains("might_contain"))
    val joinLine = plan.split("\n").indexWhere(_.contains("LeftSemi"))
    assert(joinLine >= 0 && pruneLine > joinLine,
      s"prune not below the semi join (join@$joinLine, prune@$pruneLine):\n$plan")
  }
}
