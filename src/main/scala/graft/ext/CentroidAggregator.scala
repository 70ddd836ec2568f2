package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator (SURVEY.md §2.11 — `Aggregator[IN,BUF,OUT]`
  * reserved for the ✚ extensions): per-group embedding centroid.
  *
  * The buffer is a mutable (sum-vector, count) pair — partial
  * aggregation happens map-side per partition, only `dims + 1` doubles
  * shuffle per group. This is the accumulator shape every vector
  * pipeline needs (centroids for IVF training, label prototypes,
  * drift monitoring).
  */
object CentroidAggregator {

  final case class Buf(var sums: Array[Double], var n: Long)

  def apply(dims: Int): Aggregator[Seq[Float], Buf, Seq[Double]] =
    new Aggregator[Seq[Float], Buf, Seq[Double]] {
      override def zero: Buf = Buf(Array.fill(dims)(0.0), 0L)

      override def reduce(b: Buf, v: Seq[Float]): Buf = {
        var i = 0
        while (i < dims && i < v.length) { b.sums(i) += v(i); i += 1 }
        b.n += 1
        b
      }

      override def merge(a: Buf, b: Buf): Buf = {
        var i = 0
        while (i < dims) { a.sums(i) += b.sums(i); i += 1 }
        a.n += b.n
        a
      }

      override def finish(b: Buf): Seq[Double] =
        if (b.n == 0) Seq.fill(dims)(0.0)
        else b.sums.map(_ / b.n).toSeq

      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }
}
