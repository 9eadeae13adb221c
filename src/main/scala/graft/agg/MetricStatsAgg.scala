package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed single-pass stats aggregator — the reference's `stats.Statistic`
  * accumulate/finalize interface (metricstatsprocessor/internal/stats/
  * stats.go:24-28) as one `Aggregator[IN, BUF, OUT]`: min, max, int-division
  * avg (avg_statistic.go:61-66), count, and first/last by arrival key, in
  * ONE buffer instead of six separate aggregate expressions. Codegen-managed
  * buffer, partial-merge capable (map-side combine at scale).
  *
  * The arrival key is the typed triple (epoch-micros, conv_id, turn_idx) —
  * NOT a per-row formatted string: at 10^12 rows a printf in the hottest
  * aggregation path allocates ~40 bytes/row purely to get lexicographic
  * ordering the tuple already has.
  */
object MetricStatsAgg {

  /** Arrival-order key; orders identically to the oracle's
    * printf('%019d %s %010d', epoch_us, conv_id, turn_idx) string.
    */
  case class ArrKey(tsu: Long, conv: String, turn: Int)

  private def lt(a: ArrKey, b: ArrKey): Boolean =
    a.tsu < b.tsu || (a.tsu == b.tsu &&
      (a.conv < b.conv || (a.conv == b.conv && a.turn < b.turn)))

  case class In(value: Long, tsu: Long, conv: String, turn: Int)
  case class Buf(min: Long, max: Long, sum: Long, count: Long,
                 firstArr: ArrKey, firstVal: Long,
                 lastArr: ArrKey, lastVal: Long)
  case class Stats(stat_min: Long, stat_max: Long, stat_avg_int: Long,
                   stat_avg_double: Double, stat_count: Long,
                   stat_first: Long, stat_last: Long)

  val Zero: Buf = Buf(Long.MaxValue, Long.MinValue, 0L, 0L, null, 0L, null, 0L)

  object agg extends Aggregator[In, Buf, Stats] {
    def zero: Buf = Zero

    def reduce(b: Buf, in: In): Buf = {
      val k = ArrKey(in.tsu, in.conv, in.turn)
      Buf(
        math.min(b.min, in.value), math.max(b.max, in.value),
        b.sum + in.value, b.count + 1,
        if (b.firstArr == null || lt(k, b.firstArr)) k else b.firstArr,
        if (b.firstArr == null || lt(k, b.firstArr)) in.value else b.firstVal,
        if (b.lastArr == null || lt(b.lastArr, k)) k else b.lastArr,
        if (b.lastArr == null || lt(b.lastArr, k)) in.value else b.lastVal)
    }

    def merge(a: Buf, b: Buf): Buf =
      if (a.count == 0) b else if (b.count == 0) a
      else Buf(
        math.min(a.min, b.min), math.max(a.max, b.max),
        a.sum + b.sum, a.count + b.count,
        if (lt(a.firstArr, b.firstArr)) a.firstArr else b.firstArr,
        if (lt(a.firstArr, b.firstArr)) a.firstVal else b.firstVal,
        if (lt(b.lastArr, a.lastArr)) a.lastArr else b.lastArr,
        if (lt(b.lastArr, a.lastArr)) a.lastVal else b.lastVal)

    def finish(b: Buf): Stats = Stats(
      b.min, b.max,
      b.sum / math.max(1L, b.count), // int division: avg_statistic.go:61-66
      b.sum.toDouble / math.max(1L, b.count),
      b.count, b.firstVal, b.lastVal)

    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  /** Column form: `metric_stats(value, tsu, conv, turn)`. */
  def metricStats(value: Column, tsu: Column, conv: Column, turn: Column): Column =
    udaf(agg, Encoders.product[In])(value, tsu, conv, turn)
}
