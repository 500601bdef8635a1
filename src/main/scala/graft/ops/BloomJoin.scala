package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-pruned semi join: aggregate the build side's join keys into one
  * bloom filter (a few MB of bits, one scalar row), prune the probe side
  * with `might_contain` BEFORE its shuffle, then run the exact semi join
  * on the survivors.
  *
  * The result is EXACTLY the plain semi join — the bloom admits only
  * false positives and the exact join removes them — so the operator is
  * oracle-checkable against `WHERE EXISTS`. The win at scale: when the
  * build side is too big to broadcast as a hash relation but its KEY SET
  * fits a bloom (n keys ≈ n·10 bits at 1% FP), the probe side's shuffle
  * shrinks by the join's selectivity. At 100 TB that is the difference
  * between shuffling the whole fact table and shuffling the ~matching
  * fraction.
  *
  * Spark's `InjectRuntimeFilter` does this opportunistically for
  * selective shuffle joins behind cost heuristics; this is the explicit
  * form a pipeline author controls — always on, sized by the caller,
  * stable across optimizer versions. Same construction as the injected
  * form: `BloomFilterAggregate(XxHash64(key))` on the build side wired
  * into `BloomFilterMightContain(scalar-subquery, XxHash64(key))` on the
  * probe side (both sides hash with the same default seed).
  *
  * An EMPTY build side aggregates to a NULL bloom; `might_contain(NULL)`
  * is NULL, the filter drops every probe row, and the semi join would
  * have returned nothing anyway — semantics preserved.
  */
object BloomJoin {

  /** `probe SEMI JOIN build ON probe(probeKey) = build(buildKey)`, with a
    * bloom prune on the probe side. `expectedItems` should be ≥ the build
    * side's distinct key count; `numBits` ≈ 10× that for ~1% false
    * positives (false positives cost shuffle bytes, never correctness).
    */
  def semiJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, expectedItems: Long, numBits: Long): DataFrame = {
    require(expectedItems > 0 && numBits > 0)
    val bloomDf = build.agg(GraftColumnBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(GraftColumnBridge.expression(build(buildKey)))),
        Literal(expectedItems), Literal(numBits))
        .toAggregateExpression()).as("__bloom"))
    val mightContain = GraftColumnBridge.column(BloomFilterMightContain(
      ScalarSubquery(bloomDf.queryExecution.analyzed),
      new XxHash64(Seq(GraftColumnBridge.expression(probe(probeKey))))))
    probe.filter(mightContain)
      .join(build, probe(probeKey) === build(buildKey), "left_semi")
  }
}
