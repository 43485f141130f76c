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
  * Ordering: score descending, id ascending on ties — deterministic,
  * and identical to the window formulation it replaces. The score
  * compare runs on the [[SimilarityOps.qCosKey]]-quantized key (r11):
  * every oracle replaying a top-k this aggregator produced ranks on
  * the same 2^-32 fixed-point key, so a sub-ulp score divergence
  * between engines (DuckDB's builtin cosine, a float-summation
  * difference in an ADC fold) cannot flip a rank.
  */
class TopKCosine(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val qa = SimilarityOps.qCosKey(a._1); val qb = SimilarityOps.qCosKey(b._1)
    qa > qb || (qa == qb && a._2 < b._2)
  }

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

/** [[TopKCosine]] with the scores kept in the output — for surfaces
  * whose contract returns the ranked cosine alongside the neighbor id
  * (annSearch). Same bounded buffer, same (cos desc, id asc) order. */
class TopKCosineScored(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  private val inner = new TopKCosine(k)
  def zero: Seq[(Double, Long)] = inner.zero
  def reduce(b: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    inner.reduce(b, x)
  def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    inner.merge(a, b)
  def finish(buf: Seq[(Double, Long)]): Seq[(Double, Long)] = buf
  def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
}

/** Per-cluster centroid accumulator for the deterministic Lloyd step
  * (s04/s06): components quantized to 2^-32 and summed as LONGS — the
  * same fixed-point device the explode/groupBy formulation used, so the
  * result is bit-identical while the shuffle carries one (dim longs,
  * count) buffer per cluster per map partition instead of corpus×dim
  * exploded rows. Truncation (`.toLong`) and the final
  * `sum / (n · 2^32) → float` rounding match the SQL casts they
  * replace exactly; long sums are merge-order-insensitive, so shuffle
  * scheduling cannot flip a near-tie argmin downstream (the s04
  * determinism rule). Headroom: |x| ≲ 4 ⇒ ~2^29 vectors per cluster
  * before overflow — beyond that, widen to decimal(38,0). */
class CentroidSum(dim: Int)
    extends Aggregator[Seq[Float], (Array[Long], Long), Seq[Float]] {

  private val Scale = 4294967296.0 // 2^32

  def zero: (Array[Long], Long) = (new Array[Long](dim), 0L)

  def reduce(b: (Array[Long], Long), v: Seq[Float]): (Array[Long], Long) = {
    val acc = b._1
    var i = 0
    val n = math.min(dim, v.length)
    while (i < n) { acc(i) += (v(i).toDouble * Scale).toLong; i += 1 }
    (acc, b._2 + 1L)
  }

  def merge(a: (Array[Long], Long), b: (Array[Long], Long)): (Array[Long], Long) = {
    val acc = a._1
    var i = 0
    while (i < dim) { acc(i) += b._1(i); i += 1 }
    (acc, a._2 + b._2)
  }

  def finish(b: (Array[Long], Long)): Seq[Float] =
    if (b._2 == 0L) Seq.empty
    else {
      val n = b._2.toDouble
      b._1.toSeq.map(l => (l.toDouble / (n * Scale)).toFloat)
    }

  def bufferEncoder: Encoder[(Array[Long], Long)] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[Float]] = ExpressionEncoder()
}
