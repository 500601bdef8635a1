package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash content-defined chunk boundaries — the 100 TB path for
  * CDC dedup (`cdc_chunk_dedup` computes the same window fingerprints
  * with one md5 DIGEST per position; this expression pays one multiply
  * and one subtract per byte).
  *
  * Contract (fixed constants, shared with the DuckDB oracle):
  *  - window W = 8 bytes, base B = 32, boundary mask = low 6 bits zero;
  *  - the window hash of bytes b[i−7..i] is the EXACT integer
  *    Σ b[k]·32^(i−k) — no modulus: the polynomial tops out at
  *    255·(32⁸−1)/31 ≈ 9·10¹² and never leaves a long, so a
  *    non-rolling re-computation (the oracle's closed form per
  *    position) is bit-identical to the rolling update
  *    h ← (h − b[i−8]·32⁷)·32 + b[i];
  *  - output: 1-based positions i+1 (chunk STARTS after each boundary
  *    window end i ≥ 8), matching the md5 form's `pos = i + 1`.
  *
  * Byte-based, so positions equal character positions only for ASCII
  * input — the normalized corpus is ASCII, and the oracle's
  * `ord(substr(...))` sees the same values there; feeding non-ASCII
  * text shifts positions by the multi-byte delta on BOTH sides of any
  * all-ASCII prefix (documented, not silently divergent: RabinSpec
  * pins the ASCII contract).
  */
case class RabinChunkStarts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private final val W = 8
  private final val B = 32L
  private final val BW1 = {
    var p = 1L; (1 until W).foreach(_ => p *= B); p // B^(W-1) = 32^7
  }
  private final val MASK = 63L

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String]
    val n = s.numBytes()
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    var i = 0
    while (i < n) {
      h = h * B + (s.getByte(i) & 0xffL)
      if (i >= W) h -= ((s.getByte(i - W) & 0xffL) * BW1 * B)
      // window complete once i >= W-1; emit 1-based start = (i+1)+1
      if (i >= W - 1 && (h & MASK) == 0L) out += (i + 2)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cnt = ctx.freshName("cnt")
      val buf = ctx.freshName("buf")
      s"""
         |int $n = $a.numBytes();
         |long $h = 0L;
         |int[] $buf = new int[$n > 7 ? $n - 7 : 0];
         |int $cnt = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = $h * ${B}L + (((long) $a.getByte($i)) & 0xffL);
         |  if ($i >= $W) $h -= ((((long) $a.getByte($i - $W)) & 0xffL) * ${BW1 * B}L);
         |  if ($i >= ${W - 1} && ($h & ${MASK}L) == 0L) $buf[$cnt++] = $i + 2;
         |}
         |int[] ${buf}2 = new int[$cnt];
         |System.arraycopy($buf, 0, ${buf}2, 0, $cnt);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(${buf}2);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column facade. */
object rabin {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def chunkStarts(text: Column): Column =
    column(RabinChunkStarts(expression(text)))
}
