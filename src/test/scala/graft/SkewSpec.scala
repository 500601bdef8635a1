package graft

import org.apache.spark.sql.functions._

import graft.ops.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("two-phase salted aggregation equals direct aggregation") {
    val li = Tables.lineitem(spark, sf0001)
    val direct = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").as("q"), max($"l_extendedprice").as("p"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    // sum/max compose across phases exactly (integral-valued quantities)
    val salted = Skew.twoPhaseAgg(li, Seq($"l_returnflag"), $"l_orderkey", 8,
        "sum", Seq("l_quantity" -> "q"))
      .join(Skew.twoPhaseAgg(li, Seq($"l_returnflag"), $"l_orderkey", 8,
        "max", Seq("l_extendedprice" -> "p")), "l_returnflag")
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(salted.map(t => (t._1, t._3)) == direct.map(t => (t._1, t._3)))
    assert(salted.map(_._2).zip(direct.map(_._2)).forall {
      case (a, b) => math.abs(a - b) < 1e-6
    })
  }

  test("salted join equals plain join, spreads a hot key over n salts") {
    val facts = Tables.lineitem(spark, sf0001)
      .select($"l_orderkey".as("k"), $"l_linenumber", $"l_quantity")
    val dim = Tables.orders(spark, sf0001)
      .select($"o_orderkey".as("k"), $"o_orderstatus")
    val plain = facts.join(dim, Seq("k")).count()
    val salted = Skew.saltedJoin(facts, dim, "k", $"l_linenumber", 4)
    assert(salted.count() == plain)
    // the salt really does spread rows: >1 distinct salt for a multi-row key
    val spread = facts.withColumn("s", Skew.salt($"l_linenumber", 4))
      .groupBy("k").agg(countDistinct($"s").as("d"))
      .agg(max($"d")).as[Long].head()
    assert(spread > 1)
  }

  test("salt is deterministic across evaluations") {
    val a = Tables.events(spark, sf0001)
      .select($"event_id", Skew.salt($"event_id", 16).as("s")).collect()
    val b = Tables.events(spark, sf0001)
      .select($"event_id", Skew.salt($"event_id", 16).as("s")).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      b.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }
}
