package graft

import org.apache.spark.sql.functions._

import graft.operators.NgramLm

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("hand-computed add-one bigram cross-entropy, exact to the milli-bit") {
    // train "x y x y": bigrams (<s>,x) (x,y) (y,x) (x,y)
    //   bc: "<s> x"->1, "x y"->2, "y x"->1; cc: <s>->1, x->2, y->1
    //   vocab {<s>,x,y} + 1 unseen class -> V=4
    val model = NgramLm.train(docs(0L -> "x y x y"))
    // eval "x y z": p=2/5, 3/6, 1/5 -> milli-bits 1322, 1000, 2322
    val h = Seq(2.0 / 5, 3.0 / 6, 1.0 / 5)
      .map(p => math.floor(-math.log(p) / math.log(2.0) * 1000.0 + 0.5).toLong)
    assert(h == Seq(1322L, 1000L, 2322L))
    val got = NgramLm.scoreMicroBits(model, docs(8L -> "x y z")).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[Long]("n_bigrams") == 3L)
    assert(r.getAs[Long]("h_milli_tok") ==
      math.floor(h.sum * 1.0 / 3 + 0.5).toLong) // 1548
  }

  test("unseen-vocabulary text scores strictly higher than in-distribution text") {
    val model = NgramLm.train(docs(
      0L -> "a b a b a b", 1L -> "b a b a", 2L -> "a b a b a"))
    val scored = NgramLm.scoreMicroBits(model,
        docs(10L -> "a b a b", 11L -> "q r s t"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("h_milli_tok")).toMap
    assert(scored(11L) > scored(10L))
  }

  test("integer milli-bit sums are partitioning-invariant") {
    val corpus = Tables.load(spark, sf0001, "documents")
    val model = NgramLm.train(corpus.where($"doc_id" % 10 < 8))
    val eval_ = corpus.where($"doc_id" % 10 >= 8)
    val a = NgramLm.scoreMicroBits(model, eval_)
      .orderBy("doc_id").collect().toSeq
    val b = NgramLm.scoreMicroBits(model, eval_.repartition(7))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("broadcast and shuffle-join scoring agree") {
    val corpus = Tables.load(spark, sf0001, "documents").limit(100)
    val model = NgramLm.train(corpus)
    val bcast = NgramLm.scoreMicroBits(model, corpus)
      .orderBy("doc_id").collect().toSeq
    val shuffled = noBroadcast {
      NgramLm.scoreMicroBits(model, corpus, broadcastModel = false)
        .orderBy("doc_id").collect().toSeq
    }
    assert(bcast == shuffled)
  }

  test("token-less documents contribute no rows; one token is one bigram") {
    val model = NgramLm.train(docs(0L -> "a b"))
    val got = NgramLm.scoreMicroBits(model,
        docs(1L -> "", 2L -> "   ", 3L -> "\t\n", 4L -> "a"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_bigrams")).toMap
    assert(got == Map(4L -> 1L))
  }

  test("exact tercile bands are balanced and monotone in cross-entropy") {
    val corpus = Tables.load(spark, sf0001, "documents")
    val model = NgramLm.train(corpus.where($"doc_id" % 10 < 8))
    val banded = NgramLm.withBands(
        NgramLm.scoreMicroBits(model, corpus.where($"doc_id" % 10 >= 8)))
      .collect().map(r => r.getAs[String]("band") -> r.getAs[Long]("h_milli_tok"))
    val byBand = banded.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(byBand.keySet == Set("head", "middle", "tail"))
    val sizes = byBand.view.mapValues(_.length).toMap
    assert(sizes.values.max - sizes.values.min <= 1)
    assert(byBand("head").max <= byBand("middle").min)
    assert(byBand("middle").max <= byBand("tail").min)
  }

  test("rank-range banding is value-identical to windowed ntile(3), ties included") {
    import org.apache.spark.sql.expressions.Window
    // tie-heavy fixture: many docs share the same h_milli_tok, and
    // n mod 3 covers 0/1/2 across the three sliced sizes
    val base = (1L to 100L).map(i => (i, (i % 7) * 100L, i))
      .toDF("doc_id", "h_milli_tok", "n_bigrams")
    for (n <- Seq(100, 99, 98, 1, 2, 3)) {
      val scored = base.where($"doc_id" <= n)
      val got = NgramLm.withBands(scored)
        .select("doc_id", "band").as[(Long, String)].collect().toMap
      val nt = ntile(3).over(Window.orderBy($"h_milli_tok", $"doc_id"))
      val want = scored.withColumn("band",
          when(nt === 1, "head").when(nt === 2, "middle").otherwise("tail"))
        .select("doc_id", "band").as[(Long, String)].collect().toMap
      assert(got == want, s"band mismatch at n=$n")
    }
  }

  test("interpolated scoring: hand-computed mixture, exact to the milli-bit") {
    // train "x y x y": bc as in the bigram test; unigram rollup by the
    // SECOND endpoint: cur(x)=2 (<s>-x, y-x), cur(y)=2; ntok=4; V=4
    val model = NgramLm.train(docs(0L -> "x y x y"))
    def h(pBi: Double, pUni: Double): Long =
      math.floor(-StrictMath.log((pBi + pUni) / 2.0) / StrictMath.log(2.0)
        * 1000.0 + 0.5).toLong
    val expect = Seq(
      h(2.0 / 5, 3.0 / 8), // (<s>,x): bi (1+1)/(1+4), uni (2+1)/(4+4)
      h(3.0 / 6, 3.0 / 8), // (x,y)
      h(1.0 / 5, 1.0 / 8)) // (y,z): both unseen paths
    val got = NgramLm.scoreInterpolated(model, docs(8L -> "x y z")).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("n_bigrams") == 3L)
    assert(got.head.getAs[Long]("h_milli_tok") ==
      math.floor(expect.sum * 1.0 / 3 + 0.5).toLong)
  }

  test("interpolation softens the unseen-context cliff but keeps the ordering") {
    val model = NgramLm.train(docs(
      0L -> "a b a b a b c", 1L -> "b a b a c a"))
    // "c a": context c IS trained (c->nothing? c appears as cur and as
    // prev in doc1's "c a") — score a doc whose context is unseen:
    val pure = NgramLm.scoreMicroBits(model, docs(10L -> "q a q b"))
      .head().getAs[Long]("h_milli_tok")
    val interp = NgramLm.scoreInterpolated(model, docs(10L -> "q a q b"))
      .head().getAs[Long]("h_milli_tok")
    // a and b carry strong unigram evidence the pure model ignores
    // after the unseen context q
    assert(interp < pure,
      s"unigram evidence must soften the unseen-context floor: $interp vs $pure")
    // in-distribution text still scores lower than gibberish under both
    val inDist = NgramLm.scoreInterpolated(model, docs(11L -> "a b a b"))
      .head().getAs[Long]("h_milli_tok")
    assert(inDist < interp)
  }

  test("vocabCoverage: ranked heavy hitters with exact running coverage") {
    val corpus = docs(
      0L -> "a a a b b c", 1L -> "a b c d", 2L -> "a a e")
    // counts: a=6 b=3 c=2 d=1 e=1, total=13; ties d/e broken by token asc
    val got = NgramLm.vocabCoverage(corpus, k = 4).collect()
    assert(got.map(_.getAs[String]("token")).toSeq == Seq("a", "b", "c", "d"))
    assert(got.map(_.getAs[Long]("cnt")).toSeq == Seq(6L, 3L, 2L, 1L))
    assert(got.map(_.getAs[Long]("cum_cnt")).toSeq == Seq(6L, 9L, 11L, 12L))
    assert(got.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3, 4))
    // exact micro-rounded shares of total=13
    val shares = Seq(6L, 9L, 11L, 12L)
      .map(c => math.floor(c * 1000000.0 / 13 + 0.5).toLong)
    assert(got.map(_.getAs[Long]("cum_share_micro")).toSeq == shares)
  }

  test("vocabCoverage: k past the vocabulary covers the full stream") {
    val got = NgramLm.vocabCoverage(docs(0L -> "x y x", 1L -> "z"), k = 50)
      .collect()
    assert(got.length == 3)
    assert(got.last.getAs[Long]("cum_share_micro") == 1000000L)
  }

  test("vocabCoverage top-k is a TakeOrdered, not a global sort") {
    val df = NgramLm.vocabCoverage(
      Tables.load(spark, sf0001, "documents"), k = 50)
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected distributed top-k in:\n$plan")
  }

  test("sourceTokenKl: identical distributions score ~0, a skewed source scores high") {
    // two sources with the SAME distribution, one heavily skewed
    val corpus = Seq(
      ("a", "x x y z"), ("a", "x x y z"),
      ("b", "x x y z"), ("b", "x x y z"),
      ("c", "q q q q q q q q")).toDF("source", "text")
    val got = NgramLm.sourceTokenKl(corpus)
      .collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("kl_micro")).toMap
    // a and b match the blend except for c's mass: small positive KL;
    // per-term rounding can dip a true-zero a few micro-bits negative
    assert(got("a") == got("b"))
    assert(got("a") >= -5L)
    assert(got("c") > got("a") + 100000L,
      s"the skewed source must stand out: $got")
    // hand-check c: p(q)=1 in c, q(q)=8/24 -> KL = log2(3) bits
    val expect = math.floor(
      1.0 * (math.log(8.0 * 24 / (8.0 * 8)) / math.log(2.0)) * 1e6 + 0.5).toLong
    assert(got("c") == expect)
  }

  test("sourceTokenKl over the fixture: every source small, totals add up") {
    val got = NgramLm.sourceTokenKl(Tables.load(spark, sf0001, "documents"))
      .collect()
    assert(got.length > 1)
    val tokTotal = got.map(_.getAs[Long]("n_tokens")).sum
    val direct = Tables.load(spark, sf0001, "documents")
      .select(explode(NgramLm.cleanTokens($"text")).as("t")).count()
    assert(tokTotal == direct)
    got.foreach { r =>
      val kl = r.getAs[Long]("kl_micro")
      assert(kl >= -50L && kl < 1000000L,
        s"${r.getAs[String]("source")} kl=$kl out of the plausible band")
    }
  }

  test("scoring a trained model scans the corpus exactly once") {
    // train()'s boundary means the scoring plan reads the model as
    // checkpoint leaves: the only file scan left is the EVAL side. Two
    // parquet scans here would mean a model statistic is re-running its
    // corpus pass per consumer (the trap the boundary exists for).
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val corpus = Tables.load(spark, sf0001, "documents")
    val model = NgramLm.train(corpus.where($"doc_id" % 10 < 8))
    val df = NgramLm.scoreMicroBits(model, corpus.where($"doc_id" % 10 >= 8))
    df.collect()
    def scans(p: SparkPlan): Int = p match {
      case q: QueryStageExec => scans(q.plan)
      case r: ReusedExchangeExec => scans(r.child)
      case f: FileSourceScanExec => 1 + f.children.map(scans).sum
      case other => other.children.map(scans).sum
    }
    val n = scans(df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    })
    assert(n == 1, s"expected exactly one corpus scan (the eval side), saw $n")
  }

  test("approx banding (scale path, no global sort) agrees with exact ntile") {
    val corpus = Tables.load(spark, sf0001, "documents")
    val model = NgramLm.train(corpus.where($"doc_id" % 10 < 8))
    val scored = NgramLm.scoreMicroBits(model, corpus.where($"doc_id" % 10 >= 8))
    val exact = NgramLm.withBands(scored)
      .select("doc_id", "band").as[(Long, String)].collect().toMap
    val approx = NgramLm.withApproxBands(scored)
      .select("doc_id", "band").as[(Long, String)].collect().toMap
    assert(exact.keySet == approx.keySet)
    val agree = exact.keys.count(k => exact(k) == approx(k))
    // threshold-compare puts ties in the lower band where ntile force-
    // balances counts — boundary docs may differ, the interior may not
    assert(agree >= (exact.size * 0.9).toInt,
      s"only $agree of ${exact.size} band assignments agree")
  }

  test("ccnet pipeline invariants: dedup'd, tail-free, held-out slice only") {
    val out = SparkEntry.queries("ext_ccnet_pipeline")(spark, sf0001)
    val rows = out.select("doc_id", "band")
      .as[(Long, String)].collect()
    assert(rows.nonEmpty)
    // only the scored (held-out) slice can survive, copies included
    assert(rows.forall { case (id, _) => (id % 100000) % 10 >= 8 })
    // the tail band is the pipeline's whole point of rejection
    assert(rows.forall(_._2 != "tail"))
    // the keeper stage must leave at most one doc per fingerprint:
    // every planted copy pair (id, id+100000) keeps only the original
    assert(rows.map(_._1).count(_ >= 100000L) == 0)
    // and the planted copies' originals survive unless another gate
    // (band/lang/quality) cut them — so kept ids are unique
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("sliced ablation equals a retrain that never saw the source") {
    val base = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "source", "text")
    val heldOutSrc = base.select("source").distinct()
      .as[String].collect().sorted.head
    // plant one doc whose bigrams only the held-out source owns, so the
    // exhausted-bigram (cb fully cancelled) branch provably fires
    val corpus = base.unionByName(Seq(
      (900001L, heldOutSrc, "zzquniq zzwuniq zzquniq"))
      .toDF("doc_id", "source", "text"))
    val slices = graft.operators.Ops.checkpointKeepPartitioning(
      NgramLm.keyedBigramCounts(corpus, "source"))
    val tot = graft.operators.Ops.checkpointKeepPartitioning(
      slices.groupBy("bg").agg(sum($"cb").as("cb")))
    val heldOut = heldOutSrc
    // count-table identity: totals − slice == retrain-without-source
    val sliced = NgramLm.ablatedCounts(tot, slices, "source", heldOut)
      .as[(String, Long)].collect().toMap
    val retrain = NgramLm
      .bigramCounts(corpus.where($"source" =!= heldOut))
      .as[(String, Long)].collect().toMap
    assert(sliced == retrain)
    // and the exhausted-bigram drop actually fires on this fixture —
    // otherwise the cb>0 filter is untested
    val totMap = tot.as[(String, Long)].collect().toMap
    assert(totMap.keySet.diff(sliced.keySet).nonEmpty,
      "fixture has no bigram wholly owned by the held-out source")
    // model-level parity: eval scores match to the milli-bit
    val evals = corpus.where($"doc_id" % 7 === 0).select("doc_id", "text")
    val mSliced = NgramLm.modelFromCounts(
      graft.operators.Ops.checkpointKeepPartitioning(
        NgramLm.ablatedCounts(tot, slices, "source", heldOut)))
    val mRetrain = NgramLm.train(corpus.where($"source" =!= heldOut))
    val a = NgramLm.scoreMicroBits(mSliced, evals)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val b = NgramLm.scoreMicroBits(mRetrain, evals)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
    // the one-dataflow panel scorer lands on the same integers as the
    // per-member loop, member by member, bigram sum by bigram sum
    val tot2 = slices.groupBy("bg").agg(sum($"cb").as("cb"))
    val panel = Seq("none", heldOut)
    val abl = graft.operators.Ops.checkpointKeepPartitioning(
      NgramLm.panelAblatedCounts(tot2, slices, "source", panel))
    val keyed = NgramLm.scoreKeyedBigramMillis(abl, "held_out", evals)
      .groupBy("held_out")
      .agg(sum($"h_milli").as("h"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    val wantHeld = NgramLm.scoreBigramMillis(mRetrain, evals)
      .agg(sum($"h_milli"), count(lit(1))).as[(Long, Long)].head()
    val wantFull = NgramLm.scoreBigramMillis(
        NgramLm.train(corpus), evals)
      .agg(sum($"h_milli"), count(lit(1))).as[(Long, Long)].head()
    assert(keyed(heldOut) == wantHeld)
    assert(keyed("none") == wantFull)
  }

  test("beyond-broadcast flag: vocab/keyed/KL paths agree both ways, plans route") {
    // a web-corpus bigram table is tens of billions of rows — far past
    // any broadcast. Every model-table join needs a shuffle form, same
    // integers (the Tfidf broadcastVocab / Contamination broadcastEval
    // precedent). Values first, then the plans.
    val corpus = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "source", "text")
    val train = corpus.where($"doc_id" % 10 < 8)
    val evals = corpus.where($"doc_id" % 10 >= 8).select("doc_id", "text")
    val model = NgramLm.train(train)
    val vsize = model.vocabSize.as[Long].head()

    val v1 = NgramLm.scoreBigramsWithVocab(evals, model, vsize)
      .orderBy("doc_id").collect().toSeq
    val slices = graft.operators.Ops.checkpointKeepPartitioning(
      NgramLm.keyedBigramCounts(train, "source"))
    val tot = slices.groupBy("bg").agg(sum($"cb").as("cb"))
    val heldOut = train.select("source").distinct()
      .as[String].collect().sorted.head
    val abl = graft.operators.Ops.checkpointKeepPartitioning(
      NgramLm.panelAblatedCounts(tot, slices, "source",
        Seq("none", heldOut)))
    val v2 = NgramLm.scoreKeyedBigramMillis(abl, "held_out", evals)
      .orderBy("held_out", "doc_id", "h_milli").collect().toSeq
    val v3 = NgramLm.sourceTokenKl(corpus).collect().toSeq
    noBroadcast {
      assert(NgramLm.scoreBigramsWithVocab(evals, model, vsize,
          broadcastModel = false)
        .orderBy("doc_id").collect().toSeq == v1)
      assert(NgramLm.scoreKeyedBigramMillis(abl, "held_out", evals,
          broadcastModel = false)
        .orderBy("held_out", "doc_id", "h_milli").collect().toSeq == v2)
      assert(NgramLm.sourceTokenKl(corpus, broadcastModel = false)
        .collect().toSeq == v3)
      // with broadcasts off (the at-scale stand-in), the vocab scorer
      // must plan WITHOUT any broadcast join — its only joins are the
      // two model tables, so no hint may survive to force a 10-TB
      // build side through the driver
      val vocabPhys = NgramLm.scoreBigramsWithVocab(evals, model, vsize,
          broadcastModel = false)
        .queryExecution.executedPlan.toString
      assert(!vocabPhys.contains("BroadcastHashJoin"),
        s"flag=false still broadcasts a model table:\n$vocabPhys")
      assert(vocabPhys.contains("SortMergeJoin") ||
        vocabPhys.contains("ShuffledHashJoin"),
        s"flag=false lost its shuffle join:\n$vocabPhys")
      // the KL and keyed scorers keep ONLY their bounded broadcasts
      // (per-source totals / the P-row key list and vocab sizes); the
      // vocabulary-sized count joins must shuffle
      Seq(
        NgramLm.sourceTokenKl(corpus, broadcastModel = false),
        NgramLm.scoreKeyedBigramMillis(abl, "held_out", evals,
          broadcastModel = false))
        .foreach { df =>
          val phys = df.queryExecution.executedPlan.toString
          assert(phys.contains("SortMergeJoin") ||
            phys.contains("ShuffledHashJoin"),
            s"flag=false lost its shuffle join:\n$phys")
        }
    }
    // and flag=true still forces the broadcast even under tiny inputs
    val hinted = NgramLm.scoreBigramsWithVocab(evals, model, vsize)
      .queryExecution.executedPlan.toString
    assert(hinted.contains("BroadcastHashJoin"),
      s"flag=true lost the broadcast hint:\n$hinted")
  }
}
