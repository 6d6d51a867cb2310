package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{IndexStore, IvfIndex, Similarity, SrpLsh}

/** Measured adversarial recall floor of the SRP vec gate.
  *
  * SRP's hyperplanes are data-independent AND public (a fixed SplitMix64
  * stream — reproducibility is the feature), so an adversary, or plain
  * bad luck on ~2% of vectors, can place a cosine-0.999 near-duplicate
  * on the far side of one plane in EVERY band: zero shared band keys, so
  * the band join never surfaces the pair at ANY threshold. This spec
  * constructs that worst case deterministically against the real plane
  * stream, pins the evasion (0 of N caught — no silent "it usually
  * works"), and pins the mitigation the vec gate's third slot exists
  * for: a trained-centroid IVF gate ranks centroids by the vector's
  * position in the corpus's OWN density, which the minimal-norm
  * band-crossing perturbation barely moves. A random-direction control
  * at the same cosine pins that the floor is adversarial, not typical.
  * The measured numbers are recorded in ARCHITECTURE.md's measurement
  * section.
  *
  * Construction (all driver-side, fully deterministic, no RNG state):
  * the base pool is every sf0.001 embedding under 16 fixed sign
  * patterns (a diagonal ±1 matrix is orthogonal, so each pattern
  * preserves the corpus's internal geometry while re-rolling every
  * plane dot). For each base, take the minimum-|dot| plane in each
  * band and subtract 1.3× each projection — flipping exactly the sign
  * bits that make every band key differ. Bases where the combined
  * perturbation costs more than cosine 0.999, or where plane cross-talk
  * un-flips a chosen bit, are discarded; what remains is the measured
  * constructibility rate.
  */
class SrpAdversarialSpec extends SparkSpec {
  import spark.implicits._

  private val nPlanes = 16
  private val bands = 4
  private val dim = 64
  private val bits = nPlanes / bands
  private val idxPath = "/tmp/graft_index_spec"

  private def dropTable(t: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $t")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"$idxPath/$t"))
  }

  // -- driver-side vector math (the pool is 8,000 × 64 doubles) --------
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
  private def unit(a: Array[Double]): Array[Double] = {
    val n = math.sqrt(dot(a, a))
    a.map(_ / n)
  }

  /** SplitMix64 → [-0.5, 0.5), the same mixer family SrpLsh draws its
    * planes from — used here only for the 16 sign patterns (any fixed
    * deterministic stream would do; independence from the PLANE stream
    * comes from the distinct stride). */
  private def mix(z0: Long): Double = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble - 0.5
  }

  private lazy val planes: Array[Array[Double]] =
    SrpLsh.planes(nPlanes, dim).toArray
  private lazy val planeNorm2: Array[Double] = planes.map(p => dot(p, p))

  private lazy val corpus: Array[(Long, Array[Double])] =
    Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"),
        Similarity.toDoubleArray(col("embedding")).as("vec"))
      .as[(Long, Array[Double])].collect().sortBy(_._1)
      .map { case (id, v) => (id, unit(v)) }

  /** (baseId, baseVec) pool: corpus × 16 sign patterns. */
  private lazy val basePool: Array[(Long, Array[Double])] = {
    val pats = Array.tabulate(16, dim)((k, d) =>
      if (mix(k.toLong * 131071L + d) < 0) -1.0 else 1.0)
    for {
      k <- (0 until 16).toArray
      (id, v) <- corpus
    } yield (k.toLong * 1000L + id,
      Array.tabulate(dim)(d => v(d) * pats(k)(d)))
  }

  /** (stradId, baseId, stradVec): every base that admits a cosine-0.999
    * all-band straddler, perturbed across its per-band weakest plane. */
  private lazy val straddlers: Array[(Long, Long, Array[Double])] =
    basePool.flatMap { case (baseId, v) =>
      val d = planes.map(p => dot(v, p))
      val chosen = (0 until bands).map { b =>
        (b * bits until (b + 1) * bits).minBy(i => math.abs(d(i)))
      }
      val w = v.clone()
      chosen.foreach { i =>
        val coef = -1.3 * d(i) / planeNorm2(i)
        var j = 0
        while (j < dim) { w(j) += coef * planes(i)(j); j += 1 }
      }
      val wn = unit(w)
      val flipped = chosen.forall(i => (dot(wn, planes(i)) > 0) != (d(i) > 0))
      if (flipped && dot(v, wn) >= 0.999) Some((900000L + baseId, baseId, wn))
      else None
    }

  private def baseDF: DataFrame =
    basePool.toSeq.toDF("vec_id", "vec")
  private def stradDF: DataFrame =
    straddlers.toSeq.map { case (sid, _, v) => (sid, v) }.toDF("vec_id", "vec")

  test("constructibility: ~2% of bases admit a cosine-0.999 all-band straddler") {
    assert(basePool.length == 8000)
    // deterministic construction — the count IS the measured rate
    assert(straddlers.length == 184,
      s"expected 184 straddlers, got ${straddlers.length}")
    // every straddler is a TRUE near-dup of its base through the
    // ENGINE's fold (not just the driver-side math above): the gate is
    // obligated to catch these
    val pairs = straddlers.toSeq.map { case (sid, bid, v) =>
      (sid, bid, v, basePool.find(_._1 == bid).get._2)
    }.toDF("sid", "bid", "s_vec", "b_vec")
    val minCos = pairs
      .select(min(Similarity.cosine(col("s_vec"), col("b_vec")))).head().getDouble(0)
    assert(minCos >= 0.999, s"engine cosine dipped to $minCos")
  }

  test("adversarial floor: straddlers evade the SRP gate completely; the IVF slot catches them") {
    val (ex, sr, iv) = ("graft_spec_adv_x", "graft_spec_adv_s", "graft_spec_adv_i")
    def rebuild(withIvf: Boolean): Unit = {
      Seq(s"${ex}_fps", s"${sr}_bands", s"${sr}_vecs", s"${iv}_lists",
        s"${iv}_centroids").foreach(dropTable)
      IndexStore.buildExactVecIndex(baseDF, "vec_id", "vec", ex,
        s"$idxPath/$ex")
      IndexStore.buildSrpIndex(baseDF, sr, s"$idxPath/$sr")
      if (withIvf) IndexStore.buildIvfIndex(baseDF,
        IvfIndex.trainCentroids(baseDF, k = 8, iters = 2), iv,
        s"$idxPath/$iv")
    }

    // the probe itself: zero candidates, so zero matches — the evasion
    // is structural (no shared band key), not a threshold artifact
    rebuild(withIvf = false)
    assert(IndexStore.probeSrpNearDup(spark, stradDF, sr).isEmpty,
      "a straddler sharing ANY band key with its base breaks the construction")
    // composed two-gate ingest (exact → SRP): every straddler is a true
    // near-duplicate, and every one is waved through — this is the
    // measured blind spot, pinned at exactly 100% of the adversarial set
    val (acc2, dec2) = IndexStore.dedupIngestGateVec(spark, stradDF, ex, sr)
    assert(dec2.isEmpty, "no gate may cut a straddler without the IVF slot")
    assert(acc2.count() == straddlers.length)

    // the mitigation: same batch, three-gate variant. The IVF gate
    // probes nprobe=3 of 8 trained lists by the straddler's OWN cosine
    // ranking — a ≤2.6° perturbation rarely moves a vector out of its
    // base's probed set. Measured: 184 of 184 cut (the assertion floor
    // is 95% so a re-trained quantizer shifting a boundary case is a
    // nudge, not a spurious failure).
    rebuild(withIvf = true)
    val (acc3, dec3) = IndexStore.dedupIngestGateVec(spark, stradDF, ex, sr,
      ivfTable = Some(iv))
    val ivfCut = dec3.where(col("gate") === "ivf").count()
    info(s"IVF slot caught $ivfCut of ${straddlers.length} straddlers")
    assert(ivfCut >= math.ceil(straddlers.length * 0.95).toLong,
      s"IVF slot caught only $ivfCut of ${straddlers.length} straddlers")
    assert(ivfCut + acc3.count() == straddlers.length)
    // attribution: each caught straddler's IVF match set contains its
    // OWN base — the cut is the right pair, not a lucky collision
    val matched = IndexStore.probeIvfNearDup(spark, stradDF, iv)
      .select("query_id", "match_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = straddlers.map { case (sid, bid, _) => sid -> bid }.toMap
    val wrong = matched.filterNot { case (sid, ms) => ms.contains(expected(sid)) }
    assert(wrong.isEmpty, s"IVF matches missing the true base: ${wrong.keys.take(3)}")
  }

  test("random-direction control: the same cosine with an unsteered direction is caught") {
    // one planted pair per ORIGINAL corpus vector at exactly cosine
    // 0.9992 (unit-circle rotation toward a deterministic orthogonal
    // direction) — miss probability per pair is (1-p^4)^4 ≈ 6e-6 at
    // this angle, so 500/500 caught is the EXPECTED outcome and the
    // construction is deterministic, so the outcome is pinned exactly
    val cosT = 0.9992
    val sinT = math.sqrt(1 - cosT * cosT)
    val planted = corpus.map { case (id, v) =>
      val r = Array.tabulate(dim)(d => mix(id * 524287L + d))
      val proj = dot(r, v)
      val perp = unit(Array.tabulate(dim)(d => r(d) - proj * v(d)))
      (800000L + id, id,
        Array.tabulate(dim)(d => cosT * v(d) + sinT * perp(d)))
    }
    val sr = "graft_spec_advc_s"
    Seq(s"${sr}_bands", s"${sr}_vecs").foreach(dropTable)
    IndexStore.buildSrpIndex(corpus.toSeq.toDF("vec_id", "vec"), sr,
      s"$idxPath/$sr")
    val hits = IndexStore.probeSrpNearDup(spark,
        planted.toSeq.map { case (pid, _, v) => (pid, v) }.toDF("vec_id", "vec"),
        sr, threshold = 0.999)
      .select("query_id", "match_id").as[(Long, Long)].collect().toSet
    val missing = planted.filterNot { case (pid, bid, _) => hits((pid, bid)) }
    assert(missing.isEmpty,
      s"random-direction pairs missed by SRP: ${missing.map(_._1).take(5).toSeq}")
  }
}
