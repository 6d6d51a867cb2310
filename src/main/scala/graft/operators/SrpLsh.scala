package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Signed-random-projection (hyperplane) LSH for cosine similarity.
  *
  * Each of `nPlanes` deterministic pseudo-random hyperplanes contributes
  * one signature bit (sign of the projection); collision probability of
  * a bit is 1 - θ/π for vectors at angle θ. Banding the signature (any
  * shared band ⇒ candidate) turns top-k search into a bucketed join —
  * like Similarity.signBlock but with data-independent directions, so
  * recall does not depend on axis alignment.
  *
  * The planes are generated from a fixed SplitMix64 stream (no RNG
  * state, reproducible everywhere); signatures are pure expressions, so
  * the whole index is just a column — at scale you'd persist it and
  * bucket the table by band keys.
  */
object SrpLsh {

  /** SplitMix64 — deterministic plane coefficients in [-0.5, 0.5). */
  private def mix(z0: Long): Double = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }

  def planes(nPlanes: Int, dim: Int): Seq[Array[Double]] =
    (0 until nPlanes).map(p =>
      Array.tabulate(dim)(d => mix(p.toLong * 7919L + d.toLong)))

  /** Packed nPlanes-bit signature of a double-array column. */
  def signature(vec: Column, planeSet: Seq[Array[Double]]): Column =
    planeSet.zipWithIndex.map { case (plane, i) =>
      when(Similarity.dot(vec, lit(plane)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Extract `bands` band keys from a packed signature. */
  private def bandKeys(sig: Column, nPlanes: Int, bands: Int): Column = {
    val bits = nPlanes / bands
    val mask = (1 << bits) - 1
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(sig, b * bits).bitwiseAND(lit(mask)).as("key"))): _*)
  }

  /** Approximate top-k cosine neighbors: candidates = corpus vectors
    * sharing ≥1 signature band with the query, then exact cosine. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
      nPlanes: Int = 16, bands: Int = 4,
      idCol: String = "vec_id", vecCol: String = "vec",
      dim: Int = 64): DataFrame = {
    // dim must match the vectors: shorter planes null-pad the projection
    // via zip_with, collapsing every signature to 0 (a silent full
    // cross-join instead of LSH pruning).
    val planeSet = planes(nPlanes, dim)
    def banded(df: DataFrame, prefix: String): DataFrame =
      df.select(col(idCol).as(s"${prefix}_id"), col(vecCol).as(s"${prefix}_vec"),
        explode(bandKeys(signature(col(vecCol), planeSet), nPlanes, bands))
          .as("bk"))
        .select(col(s"${prefix}_id"), col(s"${prefix}_vec"),
          col("bk.band").as("band"), col("bk.key").as("key"))

    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val c = banded(corpus.repartition(par), "c")
    val q = banded(queries, "q")
    val candidates = c.join(broadcast(q), Seq("band", "key"))
      .where(col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("q_vec"), col("c_id"), col("c_vec"))
      .distinct()

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_raw").desc, col("neighbor_id").asc)
    candidates
      .select(col("q_id").as("query_id"), col("c_id").as("neighbor_id"),
        Similarity.cosine(col("q_vec"), col("c_vec")).as("cos_raw"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos_raw"), 6).as("cos_sim"))
  }
}
