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

  /** Packed nPlanes-bit signature of a double-array column. Fails fast
    * (raise_error) on a dimension mismatch — zip_with would otherwise
    * null-pad, every bit would go 0, and the LSH would silently become a
    * full cross product. */
  def signature(vec: Column, planeSet: Seq[Array[Double]]): Column = {
    val dim = planeSet.head.length
    val sig = planeSet.zipWithIndex.map { case (plane, i) =>
      when(Similarity.dot(vec, lit(plane)) > 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
    when(size(vec) === dim, sig).otherwise(raise_error(concat(
      lit(s"srp signature: expected $dim-dim vector, got "), size(vec))))
  }

  /** The band keys of a vector packed into ONE long each —
    * `(band index << bits) | band value` — so a persisted index table
    * can bucket and equi-join on a single column (the [[IndexStore]]
    * layout; exact and reversible, unlike a hash, so no cross-band
    * collisions at all). Same plane stream and banding as [[topK]]:
    * index and probe MUST derive keys identically or probes silently
    * miss. */
  def packedBandKeys(vec: Column, nPlanes: Int = 16, bands: Int = 4,
      dim: Int = 64): Column = {
    require(nPlanes > 0 && nPlanes <= 31 && bands > 0 && bands <= nPlanes &&
      nPlanes % bands == 0, s"bad nPlanes=$nPlanes/bands=$bands")
    val bits = nPlanes / bands
    val mask = (1 << bits) - 1
    val sig = signature(vec, planes(nPlanes, dim))
    array((0 until bands).map(b =>
      (shiftrightunsigned(sig, b * bits).bitwiseAND(lit(mask)).cast("long")
        + lit(b.toLong << bits)).as(s"bk$b")): _*)
  }

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
    require(nPlanes > 0 && nPlanes <= 31, s"nPlanes must be 1..31 (int signature), got $nPlanes")
    require(bands > 0 && bands <= nPlanes && nPlanes % bands == 0,
      s"bands ($bands) must divide nPlanes ($nPlanes)")
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
    // score in the banded join, THEN dedup multi-band collisions on the
    // narrow (ids, score) rows — shuffling the 64-double vectors through
    // a distinct would move ~1KB/candidate for nothing
    val scored = c.join(broadcast(q), Seq("band", "key"))
      .where(col("c_id") =!= col("q_id"))
      .select(col("q_id").as("query_id"), col("c_id").as("neighbor_id"),
        Similarity.cosine(col("q_vec"), col("c_vec")).as("cos_raw"))
      .groupBy("query_id", "neighbor_id")
      .agg(max(col("cos_raw")).as("cos_raw"))
    Similarity.rankTopK(scored, k)
  }
}
