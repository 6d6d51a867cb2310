package graft

import graft.operators.Shapley

class ShapleySpec extends SparkSpec {
  import spark.implicits._

  test("two-player game matches the hand-computed Shapley values") {
    // v(∅)=10, v({0})=6, v({1})=8, v({0,1})=2
    val phi = Shapley.shapleyFromLosses(
      Map(0L -> 10L, 1L -> 6L, 2L -> 8L, 3L -> 2L), nPlayers = 2)
    // φ0·2! = (10−6) + (8−2) = 10; φ1·2! = (10−8) + (6−2) = 6
    assert(phi == Seq((0, 10L, 5L), (1, 6L, 3L)))
  }

  test("efficiency: values sum to P!·(v(∅) − v(full))") {
    val n = 4
    // arbitrary deterministic losses, monotone-ish with coalition size
    val losses = (0L until (1L << n)).map(s =>
      s -> (1000L - 37L * java.lang.Long.bitCount(s) -
        (s * 13L) % 11L)).toMap
    val phi = Shapley.shapleyFromLosses(losses, n)
    val fact = (1 to n).foldLeft(1L)(_ * _)
    assert(phi.map(_._2).sum ==
      fact * (losses(0L) - losses((1L << n) - 1)))
  }

  test("guards: player-count bound and missing coalitions fail loud") {
    intercept[IllegalArgumentException] {
      Shapley.shapleyFromLosses(Map(0L -> 1L), nPlayers = 13)
    }
    intercept[IllegalArgumentException] {
      Shapley.shapleyFromLosses(Map(0L -> 1L, 1L -> 1L), nPlayers = 2)
    }
  }

  test("symmetry: groups with identical content receive identical value") {
    // g0 and g1 carry the SAME text set; g2 is distinct. Shapley's
    // symmetry axiom demands φ(g0) == φ(g1) — the property
    // leave-one-out ablation structurally CANNOT deliver (each clone's
    // LOO marginal is ~0 because the other clone covers for it).
    val shared = "the quick brown fox jumps over the lazy dog"
    val docs = Seq(
      (0L, "src9", "the quick brown fox leaps today"), // eval (0 % 97 == 0)
      (1L, "src0", shared), (2L, "src0", shared + " again"),
      (3L, "src1", shared), (4L, "src1", shared + " again"),
      (5L, "src2", "completely unrelated filler tokens occupy this line")
    ).toDF("doc_id", "source", "text")
    val got = Shapley.sourceShapley(docs, nGroups = 3)
      .as[(String, Long, Long)].collect()
      .map { case (p, n, _) => p -> n }.toMap
    assert(got("g0") == got("g1"), s"clone groups must tie: $got")
    assert(got("g0") > 0L, "the shared-content groups cover eval bigrams")
    assert(got.keySet == Set("g0", "g1", "g2"))
  }

  test("sourceShapley is deterministic across runs") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "source", "text")
    val a = Shapley.sourceShapley(docs, nGroups = 3)
      .as[(String, Long, Long)].collect().toSeq
    val b = Shapley.sourceShapley(docs, nGroups = 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.size == 3)
  }

  test("stray players outside g0..g{P-1} fail loud, not silently drop") {
    val train = Seq(("g0", "alpha beta gamma"), ("weird", "beta gamma"))
      .toDF("player", "text")
    val evals = Seq((0L, "alpha beta")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Shapley.groupShapley(train, evals, nGroups = 2)
    }
    assert(e.getMessage.contains("weird"), e.getMessage)
  }

  test("an empty eval split fails with its cause named") {
    val train = Seq(("g0", "alpha beta gamma")).toDF("player", "text")
    val evals = Seq((0L, "   ")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Shapley.groupShapley(train, evals, nGroups = 1)
    }
    assert(e.getMessage.contains("zero bigrams"), e.getMessage)
  }

  // ── sampled estimator ──────────────────────────────────────────────

  test("sampled fold over ALL P! permutations equals the exact Shapley " +
      "fold bit-for-bit (convergence anchor)") {
    // each coalition S appears as p's prefix in exactly
    // |S|!·(P−1−|S|)! of the P! permutations, so the permutation sum
    // IS the exact factorial-weighted numerator — integer-exactly,
    // and phi_milli scales by nPerms = P! = the exact fold's P!.
    val n = 4
    val losses = (0L until (1L << n)).map(s =>
      s -> (1000L - 37L * java.lang.Long.bitCount(s) -
        (s * 13L) % 11L)).toMap
    val allPerms = (0 until n).permutations.toSeq
    val pre = Shapley.prefixMasksOf(allPerms)
    val sampled = Shapley.sampledFromLosses(losses, n, pre, allPerms.size)
    val exact = Shapley.shapleyFromLosses(losses, n)
    assert(sampled == exact, s"sampled=$sampled exact=$exact")
  }

  test("hash-derived permutations: deterministic, and the estimate " +
      "approaches the exact values as permutations accumulate") {
    val n = 4
    val losses = (0L until (1L << n)).map(s =>
      s -> (1000L - 37L * java.lang.Long.bitCount(s) -
        (s * 13L) % 11L)).toMap
    val exact = Shapley.shapleyFromLosses(losses, n)
      .map { case (p, _, milli) => p -> milli }.toMap
    def estErr(nPerms: Int): Long = {
      val pre = Shapley.permPrefixMasks(n, nPerms, "graft")
      Shapley.sampledFromLosses(losses, n, pre, nPerms)
        .map { case (p, _, milli) => math.abs(milli - exact(p)) }.max
    }
    // same seed ⇒ same permutations ⇒ same estimate (pure function)
    assert(Shapley.permPrefixMasks(n, 7, "graft") ==
      Shapley.permPrefixMasks(n, 7, "graft"))
    val errSmall = estErr(8)
    val errBig = estErr(480)
    assert(errBig <= errSmall,
      s"error must not grow with permutations: 8→$errSmall 480→$errBig")
    // at 480 draws of 24 possible orders the estimate is near-exact on
    // this fixture's scale (|phi_milli| ~ 15–40)
    assert(errBig <= 3L, s"480-perm estimate still off by $errBig")
  }

  test("sampledSourceShapley runs past the exact P ≤ 12 guard and is " +
      "deterministic") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "source", "text")
    val a = Shapley.sampledSourceShapley(docs, nGroups = 20, nPerms = 6)
      .as[(String, Long, Long)].collect().toSeq
    val b = Shapley.sampledSourceShapley(docs, nGroups = 20, nPerms = 6)
      .as[(String, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.size == 20)
    assert(a.map(_._1).toSet == (0 until 20).map(p => s"g$p").toSet)
  }
}
