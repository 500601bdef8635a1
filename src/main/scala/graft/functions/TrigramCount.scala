package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct code-point-trigram COUNT of a string as one native codegen
  * expression — the trigram-index cardinality a fuzzy-search pipeline
  * needs per document (|T(d)| in the Jaccard denominator
  * |T(d) ∩ T(q)| / (|T(d)| + |T(q)| − |T(d) ∩ T(q)|)).
  *
  * Why an Expression: the declarative form
  * `size(array_distinct(transform(sequence(1, len−2), i → substring(t, i, 3))))`
  * materializes one UTF8String per trigram position (~len allocations
  * per document) plus the distinct hash pass and the array itself —
  * measured at ~1.6 ms/doc on 300-char documents, the dominant cost of
  * `trigram_search_typo` at the x100 tier (25.7 s / 500k docs,
  * SCALE_TEXT_r13). This expression packs each code-point triple into
  * one long (3 × 21 bits — code points are ≤ U+10FFFF < 2^21) and
  * counts distinct keys in a per-row open-addressed long table: zero
  * per-trigram allocations, one long[] per row, O(len) work. Same
  * trigram semantics as the SQL form: code-point windows (Spark's
  * `substring` slices code points, not bytes), strings with fewer than
  * 3 code points have zero trigrams.
  *
  * Equivalence to the array form (incl. surrogate pairs, len<3, empty
  * string) is property-pinned in TrigramCountSpec.
  */
case class DistinctTrigramCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any): Any =
    TrigramOps.distinctTrigramCount(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TrigramOps.distinctTrigramCount($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Row-level kernel shared by eval and generated code (the StaticInvoke
  * pattern: the generated span makes one static call, no boxing, no
  * virtual dispatch).
  */
object TrigramOps {

  /** Number of DISTINCT code-point trigrams of `u`. 0 for fewer than 3
    * code points.
    */
  def distinctTrigramCount(u: UTF8String): Int = {
    val s = u.toString
    val nChars = s.length
    if (nChars < 3) return 0 // <3 chars implies <3 code points
    // Open-addressed table sized ≥2× the max trigram count (≤ nChars−2),
    // power of two for mask probing. Keys are (cp0<<42 | cp1<<21 | cp2)+1
    // so 0 stays the empty sentinel (the +1 cannot collide: the packed
    // value is < 2^63−1, and +1 is a bijection). The target is computed
    // in LONG and clamped at 2^30 slots (ADVICE r13): near-2^31-char
    // strings would overflow `(nChars−2)*2` negative in int arithmetic,
    // leaving cap=4 and an infinite probe loop once 4 distinct keys
    // land. At the clamp the table holds 2^30 ≈ 1.07e9 distinct
    // trigrams — more than any real document (load factor only passes
    // 1.0 beyond that, and such a string is ~2 GiB on the heap anyway).
    val target = math.min((nChars.toLong - 2) * 2, 1L << 30)
    var cap = 4
    while (cap < target) cap <<= 1
    val table = new Array[Long](cap)
    val mask = cap - 1
    var count = 0
    var c0 = 0; var c1 = 0; var c2 = 0
    var i = 0
    var seen = 0
    while (i < nChars) {
      val cp = s.codePointAt(i)
      i += Character.charCount(cp)
      c0 = c1; c1 = c2; c2 = cp
      seen += 1
      if (seen >= 3) {
        // Full-table bail (ADVICE r14): past the 2^30-slot clamp the load
        // factor can reach 1.0 (a >2^30-char string with >2^30 distinct
        // trigrams), at which point a linear probe for a NEW key never
        // finds an empty slot — degrade to the capped count instead of a
        // spinning task. (count == cap ⇒ every slot is occupied.)
        if (count == cap) return count
        val key = ((c0.toLong << 42) | (c1.toLong << 21) | c2.toLong) + 1L
        // Fibonacci mix, then linear probe.
        var idx = ((key * 0x9E3779B97F4A7C15L) >>> 40).toInt & mask
        while (table(idx) != 0L && table(idx) != key) idx = (idx + 1) & mask
        if (table(idx) == 0L) { table(idx) = key; count += 1 }
      }
    }
    count
  }
}

/** Column facade, same bridging as [[strings]]. */
object trigrams {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}

  def distinctTrigramCount(c: Column): Column =
    column(DistinctTrigramCount(expression(c)))
}
