package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.model.Bar

/** Typed `Aggregator` variant of the OHLCV resample (SURVEY.md §7.3's
  * optional `Aggregator[Bar, OhlcBuf, Ohlc]`) — the Dataset API
  * formulation for callers who want compile-time row types. The untyped
  * [[Resample]] (min_by/max_by built-ins) remains the default: it stays in
  * whole-stage codegen, while a typed Aggregator pays
  * serialization at the aggregation boundary. Both produce identical
  * values (TypedResampleSpec).
  */
object TypedResample {

  /** Mutable-free reduction buffer: earliest/latest bar timestamps carry
    * the open/close; merge is associative + commutative, so partial
    * aggregation (map-side combine) is safe.
    */
  case class OhlcBuf(
      openTs: Long, open: Double,
      high: Double, low: Double,
      closeTs: Long, close: Double,
      volume: Long)

  case class Ohlc(open: Double, high: Double, low: Double, close: Double,
      volume: Long)

  val ohlcv: Aggregator[Bar, OhlcBuf, Ohlc] =
    new Aggregator[Bar, OhlcBuf, Ohlc] {
      def zero: OhlcBuf =
        OhlcBuf(Long.MaxValue, 0.0, Double.MinValue, Double.MaxValue,
          Long.MinValue, 0.0, 0L)

      def reduce(b: OhlcBuf, a: Bar): OhlcBuf = {
        val t = a.ts.getTime
        OhlcBuf(
          if (t < b.openTs) t else b.openTs,
          if (t < b.openTs) a.open else b.open,
          math.max(b.high, a.high), math.min(b.low, a.low),
          if (t > b.closeTs) t else b.closeTs,
          if (t > b.closeTs) a.close else b.close,
          b.volume + a.volume)
      }

      def merge(x: OhlcBuf, y: OhlcBuf): OhlcBuf =
        OhlcBuf(
          if (x.openTs <= y.openTs) x.openTs else y.openTs,
          if (x.openTs <= y.openTs) x.open else y.open,
          math.max(x.high, y.high), math.min(x.low, y.low),
          if (x.closeTs >= y.closeTs) x.closeTs else y.closeTs,
          if (x.closeTs >= y.closeTs) x.close else y.close,
          x.volume + y.volume)

      def finish(b: OhlcBuf): Ohlc = Ohlc(b.open, b.high, b.low, b.close, b.volume)

      def bufferEncoder: Encoder[OhlcBuf] = Encoders.product[OhlcBuf]
      def outputEncoder: Encoder[Ohlc] = Encoders.product[Ohlc]
    }

  /** Resample typed bars into `widthMinutes` buckets (closed-right,
    * left-labeled like [[Resample]]): bucket key = epoch-millis bucket
    * start of (ts - 1µs... at millisecond resolution, -1 ms).
    */
  def ohlcvBars(bars: Dataset[Bar], widthMinutes: Int): Dataset[(Long, Ohlc)] = {
    import bars.sparkSession.implicits._
    val width = widthMinutes * 60000L
    bars.groupByKey { b =>
      val shifted = b.ts.getTime - 1
      shifted - java.lang.Math.floorMod(shifted, width)
    }.agg(ohlcv.toColumn)
  }
}
