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

  /** One scored ANN candidate. */
  final case class Scored(neighbor_id: Long, cos_raw: Double)

  /** Bounded top-k by (cos_raw desc, neighbor_id asc) — the mergeable
    * form of per-group ranking. A `Window.orderBy + row_number` top-k
    * sorts and shuffles EVERY scored candidate of a group to one place;
    * this aggregator keeps only k rows per group in each partition
    * (map-side partial), so the shuffle carries ≤ k·partitions rows per
    * group instead of the full candidate set — at ANN scale (candidates
    * = probes × probed-list sizes) that is the difference between
    * shuffling k rows and shuffling the corpus. The buffer stays sorted;
    * most candidates fail the cheap beats-the-worst check and never
    * touch it. */
  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    // Explicit comparator so NaN ordering matches Spark SQL's window
    // ordering exactly: java.lang.Double.compare treats NaN as the
    // largest double, i.e. NaN ranks FIRST under desc — Scala's default
    // tuple sortBy on a negated key would put it last instead.
    private val ord: Ordering[Scored] = (x: Scored, y: Scored) => {
      val c = java.lang.Double.compare(y.cos_raw, x.cos_raw) // desc
      if (c != 0) c else java.lang.Long.compare(x.neighbor_id, y.neighbor_id)
    }
    private def best(xs: Seq[Scored]): Seq[Scored] = xs.sorted(ord).take(k)
    override def zero: Seq[Scored] = Seq.empty
    override def reduce(b: Seq[Scored], v: Scored): Seq[Scored] =
      if (b.length < k) best(v +: b)
      // buffer invariant: sorted best-first; ord (not IEEE >) so a NaN
      // worst element cannot block better candidates
      else if (ord.compare(v, b.last) < 0) best(v +: b.init)
      else b
    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      best(a ++ b)
    override def finish(b: Seq[Scored]): Seq[Scored] = best(b)
    override def bufferEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  }

  /** Column form: top-k (neighbor_id, cos_raw) pairs of a group. */
  def topK(neighborId: Column, cosRaw: Column, k: Int): Column =
    udaf(new TopK(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Scored]())
      .apply(neighborId, cosRaw)
}
