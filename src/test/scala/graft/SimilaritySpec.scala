package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Tables.load(spark, sf0001, "embeddings")
    .select($"vec_id", Similarity.toDoubleArray($"embedding").as("vec"))

  test("cosine of a vector with itself is 1.0 (up to fp)") {
    val r = corpus.limit(10)
      .select(Similarity.cosine($"vec", $"vec").as("c")).as[Double].collect()
    r.foreach(c => assert(math.abs(c - 1.0) < 1e-12))
  }

  test("cosine is scale-invariant: v vs 1.001*v ≈ 1.0") {
    val r = corpus.limit(10)
      .select(Similarity.cosine($"vec",
        transform($"vec", x => x * 1.001)).as("c")).as[Double].collect()
    r.foreach(c => assert(math.abs(c - 1.0) < 1e-9))
  }

  test("brute-force topK returns exactly k ranked neighbors per query") {
    val topk = Similarity.cosineTopK(corpus, corpus.where($"vec_id" < 5), k = 3)
    val byQuery = topk.groupBy("query_id").agg(count(lit(1)).as("n"),
      max("rank").as("maxr")).as[(Long, Long, Int)].collect()
    assert(byQuery.length == 5)
    byQuery.foreach { case (_, n, maxr) => assert(n == 3 && maxr == 3) }
    // ranks ordered by descending similarity within each query
    val rows = topk.orderBy("query_id", "rank")
      .select("query_id", "rank", "cos_sim").as[(Long, Int, Double)].collect()
    rows.grouped(3).foreach { g =>
      assert(g.sliding(2).forall(p => p(0)._3 >= p(1)._3))
    }
  }

  test("blocked topK finds a planted scaled copy as top-1") {
    val plantedCorpus = corpus.unionAll(
      corpus.where($"vec_id" % 20 === 0)
        .select(($"vec_id" + 100000).as("vec_id"),
          transform($"vec", x => x * 1.001).as("vec")))
    val topk = Similarity.cosineTopKBlocked(
      plantedCorpus, plantedCorpus.where($"vec_id" === 0), k = 3)
    val top1 = topk.where($"rank" === 1)
      .select("neighbor_id", "cos_sim").as[(Long, Double)].head()
    assert(top1._1 == 100000L && top1._2 >= 0.999999)
  }

  test("sign-block is identical for a vector and its positive scaling") {
    val r = corpus.limit(20).select(
      Similarity.signBlock($"vec").as("b1"),
      Similarity.signBlock(transform($"vec", x => x * 1.001)).as("b2"))
      .as[(Int, Int)].collect()
    r.foreach { case (b1, b2) => assert(b1 == b2) }
  }

  test("blocked near-dup pairs carry cosine ≥ threshold only") {
    val plantedCorpus = corpus.unionAll(
      corpus.where($"vec_id" % 20 === 0)
        .select(($"vec_id" + 100000).as("vec_id"),
          transform($"vec", x => x * 1.001).as("vec")))
    val pairs = Similarity.blockedNearDupPairs(plantedCorpus, threshold = 0.999)
    val collected = pairs.as[(Long, Long, Double)].collect()
    assert(collected.nonEmpty)
    collected.foreach { case (a, b, c) => assert(a < b && c >= 0.999) }
    // all 25 planted source→copy pairs recovered (blocking preserves sign)
    val expected = (0L until 500L by 20).map(id => (id, id + 100000)).toSet
    val found = collected.map(p => (p._1, p._2)).toSet
    assert(expected.subsetOf(found))
  }

  test("native cosine_sim is bit-identical to the fold formulation") {
    val pairs = corpus.alias("a").join(corpus.alias("b"),
        col("a.vec_id") < col("b.vec_id") && col("a.vec_id") < 40)
      .select(col("a.vec").as("va"), col("b.vec").as("vb"))
    // null-safe inequality: a plain =!= returns NULL (row dropped) when
    // either side is null, which would hide a null-vs-value divergence
    val diverged = pairs.where(
      !(Similarity.cosine($"va", $"vb") <=>
        Similarity.cosineFold($"va", $"vb")))
    assert(diverged.count() == 0, "native expression must not move a single ulp")
  }

  test("cosine_sim of a zero-norm vector is null, not NaN") {
    // the fold's divisor is 0.0 there — null in non-ANSI Spark, an error
    // in ANSI; null is the only mode-independent answer
    val df = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0)), (Seq.empty[Double], Seq.empty[Double]))
      .toDF("a", "b")
    val out = df.select(Similarity.cosine($"a", $"b")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("rankTopK drops null-scored candidates instead of crashing") {
    val scored = Seq((1L, Option(10L), Option(0.9)), (1L, Option(11L), None),
        (1L, Option(12L), Option(0.5)))
      .toDF("query_id", "neighbor_id", "cos_raw")
    val out = Similarity.rankTopK(scored, k = 3)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 1, 10L, 0.9), (1L, 2, 12L, 0.5)))
  }

  test("NaN-scored candidates are dropped by both rank kernels (poison guard)") {
    // Spark and the TopK comparator both order NaN ABOVE every real
    // double, so without the guard one NaN-poisoned corpus vector
    // becomes the rank-1 neighbor of every query; both kernels must
    // drop NaN identically so parity holds on poisoned input too
    val scored = Seq((1L, 7L, Double.NaN), (1L, 3L, 0.9), (1L, 5L, 0.8),
        (1L, 9L, 0.7))
      .toDF("query_id", "neighbor_id", "cos_raw")
    val agg = Similarity.rankTopK(scored, k = 3)
      .orderBy("rank").select("rank", "neighbor_id")
      .as[(Int, Long)].collect().toSeq
    val win = Similarity.rankTopKWindow(scored, k = 3)
      .orderBy("rank").select("rank", "neighbor_id")
      .as[(Int, Long)].collect().toSeq
    assert(agg == win, s"agg=$agg win=$win")
    assert(agg == Seq((1, 3L), (2, 5L), (3, 9L)),
      s"the NaN row must not outrank real scores: $agg")
  }

  test("blockedNearDupPairs drops degenerate vectors instead of matching the block") {
    // a zero vector (null cosine) and a NaN-poisoned vector would both
    // land in block 0 and — unguarded — "match" every blockmate, since
    // Spark orders NaN above every real double
    val vecs = Seq(
      (1L, Seq(1.0, 2.0)), (2L, Seq(1.001, 2.002)), // genuine near-dups
      (3L, Seq(0.0, 0.0)),                          // zero → null cosine
      (4L, Seq(Double.NaN, 1.0)))                   // poisoned → NaN cosine
      .toDF("vec_id", "vec")
    val pairs = Similarity.blockedNearDupPairs(vecs, threshold = 0.999,
        blockDims = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)),
      s"degenerate vectors must never surface as near-dups: $pairs")
  }

  test("cosine_sim null semantics mirror zip_with: length mismatch → null") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),
        (Seq(1.0, 2.0), Seq(3.0, 4.0)))
      .toDF("a", "b")
    val out = df.select(Similarity.cosine($"a", $"b").as("c"))
      .collect().map(r => Option(r.get(0)))
    assert(out(0).isEmpty, "unequal lengths must yield null, like zip_with+aggregate")
    assert(out(1).nonEmpty)
  }

  test("bounded-heap topK aggregator ranks identically to the window kernel") {
    val queries = corpus.where($"vec_id" < 8)
    val scored = corpus.alias("c")
      .join(broadcast(queries.alias("q")), col("c.vec_id") =!= col("q.vec_id"))
      .select(col("q.vec_id").as("query_id"), col("c.vec_id").as("neighbor_id"),
        Similarity.cosine(col("q.vec"), col("c.vec")).as("cos_raw"))
    val agg = Similarity.rankTopK(scored, k = 7)
    val win = Similarity.rankTopKWindow(scored, k = 7)
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty,
      "aggregator and window top-k must agree row-for-row, ranks included")
    assert(agg.count() == win.count())
  }

  test("topK aggregator tiebreak: equal scores keep the lower neighbor id") {
    val scored = Seq(
      (1L, 10L, 0.5), (1L, 3L, 0.5), (1L, 7L, 0.5), (1L, 5L, 0.9))
      .toDF("query_id", "neighbor_id", "cos_raw")
    val top = Similarity.rankTopK(scored, k = 3)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect().toSeq
    assert(top == Seq((1L, 1, 5L, 0.9), (1L, 2, 3L, 0.5), (1L, 3, 7L, 0.5)))
  }

  test("native int8 expressions are bit-identical to their HOF twins") {
    // fixture embeddings plus the degenerate shapes: zero vector, empty,
    // null-element, negative-dominant
    val vecs = Tables.load(spark, sf0001, "embeddings")
      .select($"vec_id", Similarity.toDoubleArray($"embedding").as("vec"))
      .unionByName(Seq(
        (-1L, Seq(0.0, 0.0, 0.0)),
        (-2L, Seq.empty[Double]),
        (-3L, Seq(-5.0, 2.5, -0.25))).toDF("vec_id", "vec"))
      .unionByName(Seq(-4L).toDF("vec_id")
        .select($"vec_id", array(lit(1.0), lit(null).cast("double")).as("vec")))
    val both = vecs
      .withColumn("s_n", Similarity.int8Scale($"vec"))
      .withColumn("s_f", Similarity.int8ScaleFold($"vec"))
      .withColumn("q_n", Similarity.int8Codes($"vec", $"s_n"))
      .withColumn("q_f", Similarity.int8CodesFold($"vec", $"s_f"))
      .withColumn("d_n", Similarity.int8Dequantize($"q_n", $"s_n"))
      .withColumn("d_f", Similarity.int8DequantizeFold($"q_f", $"s_f"))
    // null-safe <=> everywhere: a null-vs-value divergence must FAIL,
    // not vanish inside a three-valued =!=
    val diverged = both.where(
      !($"s_n" <=> $"s_f") || !($"q_n" <=> $"q_f") || !($"d_n" <=> $"d_f"))
    assert(diverged.isEmpty,
      s"native/fold divergence:\n${diverged.take(3).mkString("\n")}")
  }

  test("int8 quantization: codes in [-127,127], bounded error, zero-vector safe") {
    val vecs = Tables.load(spark, sf0001, "embeddings")
      .select($"vec_id", Similarity.toDoubleArray($"embedding").as("vec"))
      .unionByName(Seq((-1L, Seq.fill(8)(0.0)))
        .toDF("vec_id", "vec")) // the degenerate vector must not divide by 0
      .withColumn("scale", Similarity.int8Scale($"vec"))
      .withColumn("qs", Similarity.int8Codes($"vec", $"scale"))
    // every code is an integer within int8's symmetric range
    val badCode = vecs.where(exists($"qs",
      q => q =!= floor(q) || abs(q) > 127)).count()
    assert(badCode == 0, "codes must be integers in [-127, 127]")
    // reconstruction error is bounded by half a quantization step:
    // |x - q/s| <= 0.5/s = maxAbs/254 per component
    val maxAbs = array_max(transform($"vec", x => abs(x)))
    val bound = when($"scale".isNull, lit(0.0)).otherwise(maxAbs / 254.0)
    val badErr = vecs.where(array_max(zip_with($"vec",
        Similarity.int8Dequantize($"qs", $"scale"),
        (x, d) => abs(x - d))) > bound + lit(1e-12)).count()
    assert(badErr == 0, "reconstruction error must stay within half a step")
    // the zero vector quantizes to zeros, reconstructs to zeros
    val z = vecs.where($"vec_id" === -1L)
      .select(Similarity.int8Dequantize($"qs", $"scale"))
      .as[Seq[Double]].head()
    assert(z.forall(_ == 0.0))
  }

  test("int8-quantized corpus preserves brute-force top-k recall") {
    val vecs = Tables.load(spark, sf0001, "embeddings")
      .select($"vec_id", Similarity.toDoubleArray($"embedding").as("vec"))
    val deq = vecs
      .withColumn("scale", Similarity.int8Scale($"vec"))
      .select($"vec_id", Similarity.int8Dequantize(
        Similarity.int8Codes($"vec", $"scale"), $"scale").as("vec"))
    val queries = vecs.where($"vec_id" < 10)
    val k = 10
    val exact = Similarity.cosineTopK(vecs, queries, k)
      .select($"query_id", $"neighbor_id")
    val quantized = Similarity.cosineTopK(deq, queries, k)
      .select($"query_id", $"neighbor_id")
    val hit = exact.intersect(quantized).count().toDouble
    val recall = hit / exact.count()
    assert(recall >= 0.9,
      f"int8 search recall@$k dropped to $recall%.2f — quantization " +
        "error is distorting the ranking beyond the storage trade")
  }

  test("native toDoubleArray equals the transform-cast over raw embeddings") {
    val raw = Tables.load(spark, sf0001, "embeddings")
    val bad = raw.select(
        Similarity.toDoubleArray($"embedding").as("fast"),
        transform($"embedding", _.cast("double")).as("ref"))
      .where($"fast" =!= $"ref")
    assert(bad.count() == 0)
  }

  private lazy val plantedCorpus = corpus.unionAll(
    corpus.where($"vec_id" % 20 === 0)
      .select(($"vec_id" + 100000).as("vec_id"),
        transform($"vec", x => x * 1.001).as("vec")))

  test("semanticDedup under a TRAINED quantizer: planted copies dropped, sources kept") {
    import graft.operators.IvfIndex
    val centDf = IvfIndex.trainCentroids(corpus, k = 8, iters = 2)
    val cent = IvfIndex.collectCentroids(centDf)
    val kept = Similarity.semanticDedup(plantedCorpus, cent, threshold = 0.999)
    val keptIds = kept.select("vec_id").as[Long].collect().toSet
    val baseIds = corpus.select("vec_id").as[Long].collect().toSet
    // a ×1.001 copy is cosine-1.0 with its source, lands in the same
    // cluster (assignment is scale-invariant), and carries the larger
    // id — so exactly the 25 planted ids must be dropped
    assert(keptIds == baseIds)
  }

  test("semanticDedup equals a window-assignment + explicit-pair reference") {
    import graft.operators.IvfIndex
    val centDf = IvfIndex.trainCentroids(corpus, k = 8, iters = 2)
    val cent = IvfIndex.collectCentroids(centDf)
    val kept = Similarity.semanticDedup(plantedCorpus, cent, threshold = 0.999)
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().toSet

    // independent kernels end to end: window-based assign (crossJoin +
    // row_number) instead of the literal-centroid projection, then an
    // explicit distinct-dropped-set difference instead of the anti-join
    val asg = IvfIndex.assign(plantedCorpus, centDf)
    val withVec = plantedCorpus.join(asg, "vec_id")
    val a = withVec.select($"vec_id".as("ia"), $"cluster_id".as("ca"), $"vec".as("va"))
    val b = withVec.select($"vec_id".as("ib"), $"cluster_id".as("cb"), $"vec".as("vb"))
    val dropped = a.join(b, $"ca" === $"cb" && $"ib" < $"ia")
      .where(Similarity.cosine($"va", $"vb") >= 0.999)
      .select($"ia").distinct().as[Long].collect().toSet
    val ref = asg.select("vec_id", "cluster_id").as[(Long, Int)].collect()
      .filterNot(r => dropped(r._1)).toSet
    assert(kept == ref)
  }

  test("semanticDedup plan: no cartesian, bounded shuffles even with broadcast off") {
    import graft.operators.IvfIndex
    noBroadcast {
      val cent = IvfIndex.collectCentroids(
        IvfIndex.trainCentroids(corpus, k = 4, iters = 1))
      val kept = Similarity.semanticDedup(corpus, cent, threshold = 0.999)
      val n = shuffleCount(kept)
      // assignment is a map-only projection (zero exchanges of its
      // own); what remains is the cluster-keyed self-join (2) and the
      // id anti-join (2) — anything beyond 4 means a layout is being
      // re-shuffled, anything cartesian means the cluster key was lost
      assert(n <= 4, s"semanticDedup shuffled $n times")
      val txt = kept.queryExecution.executedPlan.toString
      assert(!txt.contains("CartesianProduct"),
        "within-cluster join degenerated to a cartesian product")
    }
  }

  test("semanticDedup star-links a hot cluster through its representative, observed") {
    import graft.operators.{IndexStore, IvfIndex}
    // 1,150 byte-copies of one organic vector — a boilerplate embedding
    // above the default 1,000 cap — planted alongside the corpus; the
    // representative is vec 0 itself (min id in its own hot cluster)
    val copies = spark.range(1150)
      .select(($"id" + 2000000L).as("vec_id"))
      .crossJoin(corpus.where($"vec_id" === 0).select($"vec"))
    val withHot = corpus.unionAll(copies.select($"vec_id", $"vec"))
    val cent = IvfIndex.collectCentroids(
      IvfIndex.trainCentroids(corpus, k = 4, iters = 1))
    val kept = Similarity.semanticDedup(withHot, cent, threshold = 0.999)
    val keptIds = kept.collect().map(_.getLong(0)).toSet
    // every copy near-dups the representative → all 1,150 dropped;
    // organic members of the hot cluster are star-checked against the
    // rep only, don't near-dup it, and all survive
    assert(keptIds == corpus.select("vec_id").as[Long].collect().toSet)
    // and the bounded work is OBSERVED, never silent
    val act = IndexStore.capActivity(kept)
    assert(act.exists(a => a.rowsSuppressed >= 1150 && a.maxBucketN >= 1151),
      s"hot-cluster cap activity not observed: $act")
  }

  test("semanticDedupJoin (large-k path) is identical to the literal-centroid form") {
    import graft.operators.IvfIndex
    val centDf = IvfIndex.trainCentroids(corpus, k = 8, iters = 2)
    val lit = Similarity.semanticDedup(plantedCorpus,
        IvfIndex.collectCentroids(centDf), threshold = 0.999)
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().toSet
    val joined = Similarity.semanticDedupJoin(plantedCorpus, centDf,
        threshold = 0.999)
      .select("vec_id", "cluster_id").as[(Long, Int)].collect().toSet
    assert(lit == joined)
  }

  test("semanticDedup keeps a degenerate zero vector instead of NaN-matching its cluster") {
    import graft.operators.IvfIndex
    val zeroRow = Seq((999999L, Seq.fill(64)(0.0))).toDF("vec_id", "vec")
    val withZero = corpus.unionAll(zeroRow)
    val cent = IvfIndex.collectCentroids(
      IvfIndex.trainCentroids(corpus, k = 4, iters = 1))
    val kept = Similarity.semanticDedup(withZero, cent, threshold = 0.999)
    // the zero vector's cosines are all null → it can neither drop nor
    // be dropped; everything survives (no organic 0.999 pairs at sf0.001)
    assert(kept.count() == corpus.count() + 1)
    assert(kept.where($"vec_id" === 999999L).count() == 1)
  }
  test("quantized semdedup: guard band keeps every planted near-dup; keepers agree >= 99%") {
    import graft.operators.IvfIndex
    val base = Tables.load(spark, sf0001, "embeddings")
      .select($"vec_id", Similarity.toDoubleArray($"embedding").as("vec"))
    val corpus = base.unionByName(base.where($"vec_id" % 20 === 0)
      .select(($"vec_id" + 100000).as("vec_id"),
        transform($"vec", x => x * 1.001).as("vec")))
    val cent = IvfIndex.collectCentroids(base.where($"vec_id" < 8)
      .select($"vec_id".cast("int").as("cluster_id"), $"vec".as("centroid")))
    val fp = Similarity.semanticDedup(corpus, cent, threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    val q = Similarity.semanticDedupQuantized(corpus, cent, threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    // recall contract: int8 grid error must never hide a true near-dup —
    // every planted x1.001 copy (cosine 1.0 with its source) is dropped
    assert(!q.exists(_ >= 100000),
      s"quantized path kept planted copies: ${q.filter(_ >= 100000)}")
    // and the quantized keeper set tracks the fp set
    val n = corpus.count().toDouble
    val disagree = ((fp diff q) ++ (q diff fp)).size
    assert(disagree / n <= 0.01, s"$disagree of ${n.toLong} keepers flip")
    // guard band sits inside the threshold or the call refuses
    intercept[IllegalArgumentException] {
      Similarity.semanticDedupQuantized(corpus, cent, threshold = 0.5,
        guardBand = 0.6)
    }
  }

}
