package graft

import org.apache.spark.sql.functions._

import graft.operators.Doremi

class DoremiSpec extends SparkSpec {
  import spark.implicits._

  test("egWeights: equal excess stays uniform, step after step") {
    val w = Doremi.egWeights(
      Seq("a" -> 500L, "b" -> 500L, "c" -> 500L), Doremi.Config())
    assert(w.map(_._2).distinct.size == 1,
      s"equal-excess domains diverged: $w")
    // factors cancel in the normalize, so uniform is the fixed point
    // each domain can lose up to 2 micro across the two floor
    // divisions of a step, so the quantization slack is 2k
    assert(math.abs(w.map(_._2).sum - 1000000L) <= 2L * w.size,
      "weights must quantize to ~1e6 micro total")
  }

  test("egWeights: weight order follows excess order, smoothing floors the losers") {
    val cfg = Doremi.Config()
    val w = Doremi.egWeights(
      Seq("hard" -> 8000L, "mid" -> 2000L, "easy" -> 0L), cfg).toMap
    assert(w("hard") > w("mid") && w("mid") > w("easy"),
      s"weights must be monotone in excess: $w")
    // the uniform-smoothing mix guarantees every domain at least c/k
    w.values.foreach(v =>
      assert(v >= cfg.smoothMicro / 3, s"smoothing floor violated: $w"))
  }

  test("egWeights: one hand-computed step matches the integer arithmetic exactly") {
    val cfg = Doremi.Config(etaMicro = 200000L, smoothMicro = 100000L,
      steps = 1)
    val w = Doremi.egWeights(Seq("a" -> 1000L, "b" -> 0L), cfg).toMap
    // w0 = 500000 each; factors 1e6 + 200000*1000/1000 = 1200000 vs 1e6
    // u = (6e11, 5e11), z = 1.1e12
    // raw_a = floor(6e11*1e6/1.1e12 + .5) = 545455, raw_b = 454545
    // w = 900000*raw // 1e6 + 100000 // 2
    assert(w("a") == 900000L * 545455L / 1000000L + 50000L)
    assert(w("b") == 900000L * 454545L / 1000000L + 50000L)
  }

  test("domainSignals: a domain-coherent slice shows positive excess against a mixed reference") {
    // two domains with disjoint, internally repetitive phrase
    // distributions: each own-model fits its domain far better than
    // the pooled generalist, so excess must be positive for both
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "alpha beta gamma delta alpha beta gamma", "legal")
      else (i.toLong, "omega psi chi phi omega psi chi", "chat")
    }.toDF("doc_id", "text", "source")
    val sig = Doremi.domainSignals(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    sig.foreach { case (src, (refM, ownM, ex)) =>
      assert(ownM < refM, s"$src own-model must beat the generalist")
      assert(ex == refM - ownM && ex > 0, s"$src excess wrong: $sig")
    }
  }

  test("tokenSignalsFromCounts: coherent domains show positive token-level excess; serving weights quantize") {
    import graft.operators.NgramLm
    // same two-domain fixture as domainSignals — but scored from the
    // per-(source, bigram) COUNT table alone (the persisted-model
    // serving path): doc boundaries are gone, yet the per-instance
    // means must still put each own-model under the pooled generalist
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "alpha beta gamma delta alpha beta gamma", "legal")
      else (i.toLong, "omega psi chi phi omega psi chi", "chat")
    }.toDF("doc_id", "text", "source")
    val sbc = NgramLm.bigrams(docs, "doc_id", "text")
      .join(docs.select($"doc_id", $"source"), "doc_id")
      .groupBy("source", "bg").agg(count(lit(1)).as("cb"))
    val sig = Doremi.tokenSignalsFromCounts(sbc).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(sig.keySet == Set("legal", "chat"))
    sig.foreach { case (src, (nBg, refM, ownM, ex)) =>
      // 7 tokens + the <s> start marker = 7 bigrams per doc, 20 docs
      assert(nBg == 20L * 7L,
        s"$src must count every bigram instance: $sig")
      assert(ownM < refM, s"$src own-model must beat the generalist")
      assert(ex == refM - ownM && ex > 0, s"$src excess wrong: $sig")
    }
    val w = Doremi.tokenWeightsFromCounts(sbc).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("w_micro"))
    assert(w.toSeq == Doremi.tokenWeightsFromCounts(sbc).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("w_micro")).toSeq,
      "serving weights must be bit-deterministic")
    assert(math.abs(w.map(_._2).sum - 1000000L) <= 2L * w.length)
  }

  test("weights: end-to-end on sf0.001 — deterministic, floored, and ~1e6 total") {
    val docs = Tables.load(spark, sf0001, "documents")
    val cfg = Doremi.Config()
    val a = Doremi.weights(docs, cfg).collect()
    val b = Doremi.weights(docs, cfg).collect()
    assert(a.toSeq == b.toSeq, "the learned mixture must be bit-deterministic")
    val ws = a.map(_.getAs[Long]("w_micro"))
    val k = ws.length
    assert(k > 1)
    ws.foreach(w => assert(w >= cfg.smoothMicro / k))
    assert(math.abs(ws.sum - 1000000L) <= 2L * k,
      s"total weight ${ws.sum} drifted past quantization slack")
    // budgets derive proportionally
    val bud = Doremi.budgets(Doremi.weights(docs, cfg), 100000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    a.foreach { r =>
      val expect = r.getAs[Long]("w_micro") * 100000L / 1000000L
      assert(bud(r.getString(0)) == expect)
    }
  }

  test("repeated weight fits leave executor block storage stable " +
      "(freeBlocks discipline on the signal checkpoints)") {
    // a long-lived serving session re-fitting mixture weights must not
    // accumulate localCheckpoint blocks: weights() and
    // tokenWeightsFromCounts() land their bounded signal rows
    // driver-side and free every distributed intermediate before
    // returning — holding the RESULT frame must pin nothing
    val docs = Tables.load(spark, sf0001, "documents")
    val sc = spark.sparkContext
    val sbc = graft.operators.NgramLm
      .keyedBigramCounts(docs, "source", "text").localCheckpoint()
    // warm one call of each so one-time session state is off the books
    Doremi.weights(docs).collect()
    Doremi.tokenWeightsFromCounts(sbc).collect()
    val before = sc.getPersistentRDDs.keySet
    val held = (1 to 3).map { _ =>
      (Doremi.weights(docs), Doremi.tokenWeightsFromCounts(sbc))
    }
    held.foreach { case (a, b) => a.collect(); b.collect() }
    val leaked = (sc.getPersistentRDDs.keySet -- before)
      .filter(sc.getPersistentRDDs.contains)
    assert(leaked.isEmpty,
      s"repeated valuation calls leaked ${leaked.size} persistent RDDs " +
        "while their results are still held")
    sbc.queryExecution.optimizedPlan.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ =>
    }
  }

  test("ablationWeights: irreplaceable source upweighted, clones symmetric") {
    // 'uniq' owns vocabulary the eval set needs; 'red1'/'red2' are
    // verbatim clones of each other. Removing a clone leaves its twin's
    // counts standing (tiny smoothing shift only); removing 'uniq'
    // drops the eval's qq/rr bigrams to the smoothing floor — the
    // marginal-value signal the own-model floor (weights) cannot see:
    // all three sources are equally LEARNABLE.
    val train = Seq(
      ("uniq", "qq rr qq rr qq rr qq rr"),
      ("uniq", "rr qq rr qq rr qq"),
      ("red1", "aa bb aa bb aa bb aa bb"),
      ("red2", "aa bb aa bb aa bb aa bb"))
      .toDF("source", "text")
    val evals = Seq((1L, "qq rr qq rr qq"), (2L, "aa bb aa bb aa"))
      .toDF("doc_id", "text")
    val got = Doremi.ablationWeights(train, evals).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("abl_milli"), r.getAs[Long]("full_milli"),
          r.getAs[Long]("excess_milli"), r.getAs[Long]("w_micro"))).toMap
    assert(got.keySet == Set("uniq", "red1", "red2"))
    // clones are exactly symmetric (identical slices → identical
    // ablated models → identical integers), and far below 'uniq'
    assert(got("red1") == got("red2"),
      s"clone symmetry broke: ${got("red1")} vs ${got("red2")}")
    assert(got("uniq")._3 > got("red1")._3 * 3L / 2L,
      s"irreplaceable source's excess must dominate: $got")
    assert(got("uniq")._4 > got("red1")._4,
      s"irreplaceable source must be upweighted: $got")
    // removing 'uniq' strictly hurts the eval vs the full model
    assert(got("uniq")._1 > got("uniq")._2)
    // and the whole thing is bit-deterministic
    val again = Doremi.ablationWeights(train, evals).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("w_micro"))
      .toMap
    got.foreach { case (s, (_, _, _, w)) => assert(again(s) == w) }
  }

  test("shapleyWeights: clone sources split the credit leave-one-out erases") {
    // src1 and src2 (distinct Shapley GROUPS g1/g2) carry identical
    // content; src0 is irreplaceable. LOO ablation hands both clones
    // excess 0 — either covers for the other — so the EG loop starves
    // BOTH; the Shapley value averages over coalitions where neither
    // clone is present and splits their shared credit equally.
    val shared = "aa bb aa bb aa bb aa bb"
    val train = Seq(
      ("src0", "qq rr qq rr qq rr qq rr"),
      ("src1", shared), ("src1", "aa bb aa bb aa bb"),
      ("src2", shared), ("src2", "aa bb aa bb aa bb"))
      .toDF("source", "text")
    val evals = Seq((1L, "qq rr qq rr qq"), (2L, "aa bb aa bb aa"))
      .toDF("doc_id", "text")
    val sh = Doremi.shapleyWeights(train, evals, nGroups = 3).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("phi_milli"), r.getAs[Long]("w_micro"))).toMap
    val ab = Doremi.ablationWeights(train, evals).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("excess_milli"), r.getAs[Long]("w_micro"))).toMap
    assert(sh.keySet == Set("src0", "src1", "src2"))
    // LOO: a clone's marginal is heavily discounted (the other clone
    // covers for it — only the count-halving residual survives)
    assert(ab("src1")._1 * 2 < ab("src0")._1,
      s"LOO must discount clones for this fixture to bite: $ab")
    // Shapley: the clones' shared value survives, split equally
    assert(sh("src1") == sh("src2"), s"clone symmetry broke: $sh")
    assert(sh("src1")._1 > 0L, s"shared credit must survive: $sh")
    // the credit SHARE moves: the clones hold a strictly larger
    // fraction of the total signal under Shapley than under LOO —
    // coalitions where neither clone is present restore their value
    val shTot = sh.values.map(v => math.max(v._1, 0L)).sum.toDouble
    val abTot = ab.values.map(_._1).sum.toDouble
    assert(sh("src1")._1 / shTot > ab("src1")._1 / abTot,
      s"Shapley must restore clone credit share: sh=$sh ab=$ab")
    // and the budget holds the clones well above the smoothing floor
    // (absolute w_micro is NOT comparable across the two methods —
    // EG exponentiates the signal, and Shapley's signal scale is
    // milli-bits of coalition loss, not LOO's count-halving residual)
    assert(sh("src1")._2 == sh("src2")._2)
    assert(sh("src1")._2 > 100000L / 3L * 2L,
      s"clones must sit well above the smoothing floor: $sh")
    // bit-determinism, the family contract
    val again = Doremi.shapleyWeights(train, evals, nGroups = 3).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("w_micro"))
      .toMap
    sh.foreach { case (s, (_, w)) => assert(again(s) == w) }
  }

  test("sampledShapleyWeights: per-source granularity, deterministic, " +
      "weights ~1e6 total, one row per source") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
      .select("doc_id", "source", "text")
    val train = docs.where(col("doc_id") % 97 =!= 0)
    val evals = docs.where(col("doc_id") % 97 === 0)
      .select(col("doc_id"), col("text"))
    val w = Doremi.sampledShapleyWeights(train, evals,
      nGroups = 20, nPerms = 6)
    val rows = w.collect()
    val nSrc = train.select("source").distinct().count()
    assert(rows.length == nSrc)
    // EG weights are a distribution in micro units (floor loss only)
    val tot = rows.map(_.getAs[Long]("w_micro")).sum
    assert(tot >= 999000L && tot <= 1000000L, s"total $tot")
    // same hash-derived permutations ⇒ bit-identical weights
    val again = Doremi.sampledShapleyWeights(train, evals,
        nGroups = 20, nPerms = 6).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("w_micro"))
      .toMap
    rows.foreach(r => assert(
      again(r.getAs[String]("source")) == r.getAs[Long]("w_micro")))
  }
}
