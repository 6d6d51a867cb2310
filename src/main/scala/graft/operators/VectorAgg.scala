package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed aggregators over vector columns (SURVEY §2.11: the place the
  * engine demonstrates an Aggregator). */
object VectorAgg {

  /** Running (sum-vector, count) buffer. */
  final case class CentroidBuf(sums: Array[Double], n: Long)

  /** Element-wise mean of double vectors — the centroid of an embedding
    * group (building block for IVF coarse quantizers / cluster stats).
    * Partial aggregation happens naturally: reduce merges row vectors
    * into the buffer map-side, merge combines buffers across partitions.
    */
  class Centroid(dim: Int) extends Aggregator[Array[Double], CentroidBuf, Array[Double]] {
    override def zero: CentroidBuf = CentroidBuf(new Array[Double](dim), 0L)
    override def reduce(b: CentroidBuf, v: Array[Double]): CentroidBuf = {
      var i = 0
      while (i < dim && i < v.length) { b.sums(i) += v(i); i += 1 }
      CentroidBuf(b.sums, b.n + 1)
    }
    override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
      var i = 0
      while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
      CentroidBuf(a.sums, a.n + b.n)
    }
    override def finish(b: CentroidBuf): Array[Double] =
      if (b.n == 0) new Array[Double](dim) else b.sums.map(_ / b.n)
    override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Column form usable in groupBy(...).agg(...): centroid of an
    * array<double> column. */
  def centroid(vec: Column, dim: Int): Column =
    udaf(new Centroid(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]())
      .apply(vec)
}
