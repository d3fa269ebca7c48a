package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded "latest N points" aggregate (SURVEY §7.3's custom-Aggregator
  * extension point): keeps the N points with the largest `ts`,
  * deduplicated on (ts, value), ties on equal ts resolved by value —
  * the aggregate form of the demo chart's last-200 state
  * (`app/spark_stream.py:31`, `spark_stream_web.py:48`).
  *
  * Unlike the complete-mode sort+limit (whose aggregation state grows
  * with distinct keys) this buffer is O(N) per group forever: partial
  * buffers compact to 2N before shuffling, merge is a bounded
  * concat+compact — usable in update/complete streaming or as a plain
  * batch aggregate, and registrable as a SQL UDAF via
  * `functions.udaf`.
  */
class LastNAggregator(n: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def compact(b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    b.distinct.sortBy(p => (p._1, p._2)).takeRight(n)

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(b: Seq[(Long, Double)], a: (Long, Double))
      : Seq[(Long, Double)] = {
    val appended = b :+ a
    // amortize: only compact when the buffer doubles
    if (appended.size > 2 * n) compact(appended) else appended
  }

  override def merge(x: Seq[(Long, Double)], y: Seq[(Long, Double)])
      : Seq[(Long, Double)] = compact(x ++ y)

  override def finish(b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    compact(b)

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Long, Double)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Long, Double)]]()
}
