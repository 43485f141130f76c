package graft.sim

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed `Aggregator`: each partition folds its rows
  * into a k-element list per group (map-side partial aggregation via
  * ObjectHashAggregate), so only |groups|·k rows cross the shuffle —
  * versus a `row_number().over(Window.partitionBy(group))`, which ships
  * EVERY scored row to the group's single reducer. At 100 TB with a
  * handful of query vectors the window plan is Q hot reducers each
  * receiving the corpus; this plan ships Q·k rows per map partition.
  *
  * Ordering: cosine descending, id ascending on ties — deterministic,
  * and identical to the window formulation it replaces.
  */
class TopKCosine(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  def zero: Seq[(Double, Long)] = Vector.empty

  def reduce(buf: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length < k) (buf :+ x).sortWith(better)
    else if (better(x, buf.last)) (buf.init :+ x).sortWith(better)
    else buf

  def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sortWith(better).take(k)

  def finish(buf: Seq[(Double, Long)]): Seq[Long] = buf.map(_._2)

  def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
