package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** A7 (SURVEY.md §2.3): the one custom typed aggregate — element-wise mean
  * of dense vectors (label centroids), as an `Aggregator[IN, BUF, OUT]` with
  * a real partial-merge (map-side combine) path: the buffer is (sum vector,
  * count) so executors combine locally and the shuffle carries one buffer
  * per (group, partition), never raw vectors.
  *
  * q_label_centroids expresses the same computation relationally
  * (posexplode + groupBy(label, pos) + avg) — that shape is skew-free at
  * extreme dimensionality; this typed form keeps whole vectors together and
  * wins when dim is modest (<= a few thousand) and groups are many.
  */
object VectorMeanAggregator
    extends Aggregator[Array[Double], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Double]): (Array[Double], Long) = {
    val (sum, n) = b
    if (sum.isEmpty) (v.clone(), n + 1)
    else {
      var i = 0
      while (i < sum.length && i < v.length) { sum(i) += v(i); i += 1 }
      (sum, n + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      val (sum, n) = a
      var i = 0
      while (i < sum.length && i < b._1.length) { sum(i) += b._1(i); i += 1 }
      (sum, n + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0L) Array.emptyDoubleArray else r._1.map(_ / r._2)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
