package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Accumulator: element-wise running sum + row count. */
case class CentroidAcc(n: Long, sum: Array[Double])

/** Typed centroid aggregator over float vectors (SURVEY.md §2.1 D9/L2).
  *
  * `Aggregator[IN, BUF, OUT]` with partial aggregation: each task folds its
  * rows into a local (n, Σ) buffer, buffers merge associatively at the
  * exchange, and only `dim`-sized buffers cross the wire — the classic
  * map-side-combine shape, safe at any group cardinality.
  */
object VectorCentroid extends Aggregator[Seq[Float], CentroidAcc, Seq[Double]] {

  override def zero: CentroidAcc = CentroidAcc(0L, Array.emptyDoubleArray)

  override def reduce(b: CentroidAcc, a: Seq[Float]): CentroidAcc =
    if (a == null) b
    else if (b.n == 0L) CentroidAcc(1L, a.map(_.toDouble).toArray)
    else {
      require(b.sum.length == a.length,
        s"vector length mismatch: ${b.sum.length} vs ${a.length}")
      val s = b.sum
      var i = 0
      while (i < s.length) { s(i) += a(i); i += 1 }
      CentroidAcc(b.n + 1, s)
    }

  override def merge(x: CentroidAcc, y: CentroidAcc): CentroidAcc =
    if (x.n == 0L) y
    else if (y.n == 0L) x
    else {
      val s = x.sum
      var i = 0
      while (i < s.length) { s(i) += y.sum(i); i += 1 }
      CentroidAcc(x.n + y.n, s)
    }

  override def finish(b: CentroidAcc): Seq[Double] =
    if (b.n == 0L) null else b.sum.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[CentroidAcc] = Encoders.product[CentroidAcc]

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
