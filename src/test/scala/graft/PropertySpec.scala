package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Normalize

/** Property-style tests (SURVEY §5): scalacheck generators with a fixed
  * seed produce an adversarial string corpus once, then each property is
  * checked column-wise over the whole corpus in a single Spark job.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val gen: Gen[String] = Gen.frequency(
    5 -> Gen.asciiPrintableStr,
    3 -> Gen.listOf(Gen.choose(Char.MinValue, '퟿')).map(_.mkString),
    1 -> Gen.listOfN(2500, Gen.alphaNumChar).map(_.mkString),
    1 -> Gen.oneOf("", "   ", "<>'", "'''", "0", "007", "999",
      "café ⚠ ñ", "a\tb\nc"))

  private lazy val corpus: Seq[String] =
    (0 until 300).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  private lazy val df = corpus.toDF("s").cache()

  test("truncation: length bound holds and is prefix-stable") {
    val bad = df.select(
        length(Normalize.truncated($"s", 250)).as("len"),
        Normalize.truncated($"s", 250).as("t250"),
        Normalize.truncated($"s", 2000).as("t2000"))
      .where($"len" > 250 || !$"t2000".startsWith($"t250"))
    assert(bad.count() == 0)
  }

  test("nfkdAscii: output is pure ASCII and idempotent") {
    val once = Normalize.nfkdAscii($"s")
    val bad = df.select(once.as("a"), Normalize.nfkdAscii(once).as("b"))
      .where($"a" =!= $"b" || $"a".rlike("[^\\x00-\\x7F]"))
    assert(bad.count() == 0)
  }

  test("stripEdges: result has no stripped chars at either end; inner preserved") {
    val bad = df.select(Normalize.stripEdges($"s").as("r"))
      .where($"r".rlike("^[<>']|[<>']$"))
    assert(bad.count() == 0)
  }

  test("digitsAsInt: null or in [0, maxValid]") {
    val bad = df.select(Normalize.digitsAsInt($"s").as("d"))
      .where($"d".isNotNull && ($"d" < 0 || $"d" > 100))
    assert(bad.count() == 0)
  }

  test("boolTo01 is total over arbitrary strings") {
    val vals = df.select(Normalize.boolTo01($"s").as("b"))
      .distinct().as[Int].collect().toSet
    assert(vals.subsetOf(Set(0, 1)))
  }

  test("reproject: forward/inverse roundtrip within 1e-9 deg over random coordinates") {
    import graft.functions.Reproject
    val coordGen = for {
      lon <- Gen.choose(-179.9, 179.9)
      lat <- Gen.choose(-85.0, 85.0) // Web-Mercator domain
    } yield (lon, lat)
    val pts = (0 until 300).flatMap(i =>
      coordGen.apply(Gen.Parameters.default, Seed(1000L + i))).toDF("lon", "lat")
    val (mx, my) = Reproject.project(col("lon"), col("lat"), 4326, 3857)
    val (rlon, rlat) = Reproject.project(mx, my, 3857, 4326)
    val bad = pts.where(
      abs(rlon - col("lon")) > 1e-9 || abs(rlat - col("lat")) > 1e-9)
    assert(bad.count() == 0)
  }

  test("topK aggregator equals the window kernel over random scored rows") {
    import graft.operators.Similarity
    val rowGen = for {
      q <- Gen.choose(0L, 5L)
      n <- Gen.choose(0L, 400L)
      c <- Gen.choose(-1.0, 1.0)
    } yield (q, n, c)
    val scored = (0 until 600)
      .flatMap(i => rowGen.apply(Gen.Parameters.default, Seed(2000L + i)))
      .distinct // duplicate (q, n) pairs would make ranking ill-defined
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("query_id", "neighbor_id", "cos_raw")
      .repartition(5)
    val agg = Similarity.rankTopK(scored, k = 4)
    val win = Similarity.rankTopKWindow(scored, k = 4)
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty)
  }

  test("hash sample: deterministic membership, no stratum left unsampled badly") {
    // md5-prefix membership is a pure function of the key: repeated runs
    // select the identical subset
    val li = Tables.load(spark, sf0001, "lineitem")
      .select($"l_orderkey" * 8 + $"l_linenumber" as "key")
    def sample() = li.where(
      substring(md5($"key".cast("string").cast("binary")), 1, 2) <= "0c")
      .as[Long].collect().toSet
    val s1 = sample(); val s2 = sample()
    assert(s1 == s2 && s1.nonEmpty)
    val rate = s1.size.toDouble / li.count()
    assert(rate > 0.02 && rate < 0.09, s"~5% expected, got $rate")
  }

  test("bigram LM: Spark scorer equals an independent in-JVM reference over the adversarial corpus") {
    import graft.operators.NgramLm
    // reference implementation from first principles — plain Scala
    // collections, no Spark — so the operator's join/aggregate
    // choreography is checked against the MATH, not against itself.
    // Same Java regex semantics the Column expressions compile to.
    def refToks(s: String): Seq[String] = {
      val stripped = s.toLowerCase.replaceAll("^\\s+|\\s+$", "")
      if (stripped.isEmpty) Seq("<s>")
      else "<s>" +: stripped.split("\\s+").toSeq
    }
    def refBigrams(toks: Seq[String]): Seq[(String, String)] =
      if (toks.length < 2) Nil
      else toks.sliding(2).map(p => (p(0), p(1))).toSeq
    val all = corpus.zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val (trainRows, evalRows) = all.partition(_._1 % 3 != 0)
    val trainBgs = trainRows.flatMap(r => refBigrams(refToks(r._2)))
    val bc = trainBgs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cc = trainBgs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val v = trainRows.flatMap(r => refToks(r._2)).toSet.size + 1L
    def hMilli(bg: (String, String)): Long = {
      val p = (bc.getOrElse(bg, 0L) + 1.0) / (cc.getOrElse(bg._1, 0L) + v)
      math.floor(-StrictMath.log(p) / StrictMath.log(2.0) * 1000.0 + 0.5).toLong
    }
    val expected = evalRows.flatMap { case (id, text) =>
      val bgs = refBigrams(refToks(text))
      if (bgs.isEmpty) None
      else {
        val hs = bgs.map(hMilli)
        Some((id, bgs.length.toLong,
          math.floor(hs.sum * 1.0 / hs.length + 0.5).toLong))
      }
    }.sortBy(_._1)
    val trainDf = trainRows.toDF("doc_id", "text")
    val evalDf = evalRows.toDF("doc_id", "text")
    val got = NgramLm.scoreMicroBits(NgramLm.train(trainDf), evalDf)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("c4 clean: native ≡ fold over the adversarial corpus") {
    import graft.functions.C4Clean
    val bad = df.select(C4Clean.c4LineClean($"s").as("a"),
        C4Clean.c4LineCleanFold($"s").as("b"))
      .where($"a" =!= $"b")
    assert(bad.count() == 0)
  }

  test("chunking: windows cover every token for arbitrary size/overlap") {
    import graft.operators.Chunking
    val docs = df.limit(150).select(
      monotonically_increasing_id().as("doc_id"), $"s".as("text"))
      .localCheckpoint()
    for ((cs, ov) <- Seq((4, 0), (4, 1), (7, 3), (64, 8))) {
      val chunks = Chunking.tokenChunks(docs, chunkSize = cs, overlap = ov)
      // token conservation: Σ n_tokens = n + overlap·(chunks − 1)
      val bad = chunks.groupBy("doc_id")
        .agg(sum("n_tokens").as("tot"), count(lit(1)).as("c"))
        .join(docs.select($"doc_id",
          size(split(trim($"text"), "\\s+")).as("n")), "doc_id")
        .where($"tot" =!= $"n" + ($"c" - 1) * ov)
      assert(bad.count() == 0, s"size=$cs overlap=$ov")
    }
  }

  test("gopher signals: fractions bounded, counts non-negative") {
    import graft.operators.QualityRules
    val docs = df.limit(200).select(
      monotonically_increasing_id().as("doc_id"), $"s".as("text"))
    val g = QualityRules.gopherQuality(docs)
    val bad = g.where(
      $"mean_word_len" < 0 || $"symbol_word_ratio" < 0 ||
        $"bullet_line_frac" < 0 || $"bullet_line_frac" > 1 ||
        $"ellipsis_line_frac" < 0 || $"ellipsis_line_frac" > 1 ||
        $"alpha_word_frac" < 0 || $"alpha_word_frac" > 1 ||
        $"n_stop_distinct" < 0 || $"n_stop_distinct" > 8 ||
        ($"gopher_pass" =!= 0 && $"gopher_pass" =!= 1))
    assert(bad.count() == 0)
  }

  test("watermark monotonicity: delta of a merge never lowers the watermark") {
    import graft.operators.Incremental
    val base = Tables.load(spark, sf0001, "orders")
    val target = base.where($"o_orderkey" % 3 =!= 0)
    val wm0 = target.agg(Incremental.watermarkExpr("o_orderdate"))
      .head().getTimestamp(0)
    val merged = Incremental.merge(target, base.where($"o_orderkey" % 3 === 0),
      "o_orderkey")
    val wm1 = merged.agg(Incremental.watermarkExpr("o_orderdate"))
      .head().getTimestamp(0)
    assert(!wm1.before(wm0))
  }

  test("dsir weights over the adversarial corpus: total, integer-stable, target-monotone") {
    import graft.operators.Dsir
    // adversarial texts (unicode, empties, giant tokens) as raw docs;
    // target = every 7th doc. The property: weights are defined for
    // EVERY doc, identical across partitionings, and a doc promoted
    // into the target slice can only gain weight mass in aggregate.
    val docs = corpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val target = docs.where($"doc_id" % 7 === 0)
    val raw = docs.where($"doc_id" % 7 =!= 0)
    val m = Dsir.fit(target, raw, hexChars = 2)
    val w1 = Dsir.scoreWeights(m, raw).orderBy("doc_id").collect().toSeq
    assert(w1.size == raw.count(), "every raw doc gets a weight row")
    val m2 = Dsir.fit(target.repartition(5), raw.repartition(3), hexChars = 2)
    val w2 = Dsir.scoreWeights(m2, raw.repartition(9))
      .orderBy("doc_id").collect().toSeq
    assert(w1 == w2, "weights must be partitioning-invariant")
  }

  test("best-fit packing invariants hold over random item sizes") {
    import graft.operators.BestFitPacking
    val sizes = (0 until 500).flatMap(i =>
      Gen.choose(1L, 256L).apply(Gen.Parameters.default, Seed(i.toLong)))
    val items = sizes.zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("item_id", "n_tokens")
    val packed = BestFitPacking.packBestFit(items, 256L, segmentSize = 64)
      .localCheckpoint()
    assert(packed.count() == sizes.size)
    val bins = packed.groupBy("bin_id").agg(sum("n_tokens").as("load"))
      .as[(Long, Long)].collect()
    bins.foreach { case (b, load) =>
      assert(load <= 256L, s"bin $b overflows with $load")
    }
    // per-segment first-fit tail bound over random inputs
    bins.groupBy(_._1 / 64).foreach { case (seg, bs) =>
      assert(bs.count(_._2 <= 128L) <= 1,
        s"segment $seg breaks the one-under-half-bin bound")
    }
  }

  test("span dedup equals a brute-force reference over phrase-collage corpora") {
    import graft.operators.SpanDedup
    // docs are random collages from a phrase pool, so cross-doc
    // repeats of every shape arise organically: whole-phrase shares,
    // multi-phrase runs (adjacent merges), junction 8-grams unique to
    // one doc, and sub-k phrases that must never flag
    val phrases = Vector(
      "alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight nine",
      "red green blue", "cat dog",
      "north south east west up down",
      "pack my box with five dozen liquor jugs now",
      "jump high run fast swim deep",
      "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10",
      "solo", "tiny pair",
      "lorem tokens for testing only here",
      "qq ww ee rr tt yy uu ii oo")
    val rnd = new scala.util.Random(42)
    val docs = (0 until 40).map { i =>
      val nPh = 1 + rnd.nextInt(4)
      (i.toLong,
        Seq.fill(nPh)(phrases(rnd.nextInt(phrases.size))).mkString(" "))
    }
    val k = 8
    val toks = docs.map { case (id, t) =>
      id -> t.split("\\s+").toVector }.toMap
    val occ = scala.collection.mutable
      .Map.empty[String, scala.collection.mutable.Set[Long]]
    for ((id, ts) <- toks; i <- 0 to ts.length - k)
      occ.getOrElseUpdate(ts.slice(i, i + k).mkString(" "),
        scala.collection.mutable.Set.empty) += id
    val coveredOf: Map[Long, Array[Boolean]] = toks.map { case (id, ts) =>
      val covered = Array.fill(ts.length)(false)
      for (i <- 0 to ts.length - k
           if occ(ts.slice(i, i + k).mkString(" ")).size >= 2;
           j <- i until i + k) covered(j) = true
      id -> covered
    }
    val expected = coveredOf.toSeq.flatMap { case (id, covered) =>
      val spans =
        scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
      var p = 0
      while (p < covered.length) {
        if (covered(p)) {
          var q = p
          while (q + 1 < covered.length && covered(q + 1)) q += 1
          spans += ((id, (p + 1).toLong, (q + 1).toLong, (q - p + 1).toLong))
          p = q + 1
        } else p += 1
      }
      spans
    }.sorted
    val got = SpanDedup
      .removalSpans(docs.toDF("doc_id", "text"), k = k, minDocs = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(got == expected,
      s"spans diverge from brute force: ${got.diff(expected).take(3)} vs " +
        s"${expected.diff(got).take(3)}")
    // the transform form: removal counts and the surviving token
    // stream both equal the brute-force coverage, doc for doc
    val cleaned = SpanDedup
      .cleanedDocs(docs.toDF("doc_id", "text"), k = k)
      .as[(Long, Long, Long, String)].collect()
    assert(cleaned.length == docs.length)
    cleaned.foreach { case (id, nb, nr, ct) =>
      val ts = toks(id)
      val covered = coveredOf(id)
      assert(nb == ts.length, s"doc $id n_before")
      assert(nr == covered.count(identity), s"doc $id n_removed")
      val keptExpected = ts.indices.filterNot(covered).map(ts)
      assert(ct.split(" ").filter(_.nonEmpty).toSeq == keptExpected,
        s"doc $id cleaned stream diverges")
    }
  }

  test("oversample repeat counts equal a brute-force reference over random budgets and masses") {
    import graft.operators.Ops
    val rnd = new scala.util.Random(7)
    val items = (0 until 400).map(i =>
      (i.toLong, s"src${i % 7}", 1L + rnd.nextInt(120)))
    // budgets span both regimes: below a source's mass (downsample),
    // above it (full passes), and far above (many passes)
    val budgets = (0 until 7).map(k =>
      (s"src$k", 1L + rnd.nextInt(40000))).toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // brute force: per source, md5 order, k full passes + prefix rule
    val expected = items.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      val mass = rows.map(_._3).sum
      val k = budgets(src) / mass
      val rem = budgets(src) % mass
      var cum = 0L
      rows.sortBy(r => (md5hex(r._1.toString), r._1)).flatMap { r =>
        cum += r._3
        val reps = k + (if (cum <= rem) 1L else 0L)
        if (reps > 0) Some(r._1 -> reps) else None
      }
    }.toMap
    val t = items.toDF("doc_id", "source", "n")
      .withColumn("hx", md5($"doc_id".cast("string").cast("binary")))
    val got = Ops.withGroupedRunningSum(t, $"source",
        Seq($"hx", $"doc_id"),
        expr("conv(substr(hx, 1, 13), 16, 10)").cast("double"),
        $"n", "cum")
      .join(broadcast(budgets.toSeq.toDF("source", "budget")), "source")
      .join(broadcast(items.toDF("doc_id", "source", "n")
        .groupBy("source").agg(sum($"n").as("m"))), "source")
      .select($"doc_id", (expr("budget DIV m") +
        when($"cum" <= $"budget" % $"m", 1L).otherwise(0L)).as("n_reps"))
      .where($"n_reps" > 0)
      .as[(Long, Long)].collect().toMap
    assert(got == expected, "distributed repeat counts diverge from brute force")
    // structural invariants: within a source n_reps ∈ {k, k+1}, spend
    // fits the budget to within one doc
    items.groupBy(_._2).foreach { case (src, rows) =>
      val mass = rows.map(_._3).sum
      val k = budgets(src) / mass
      rows.foreach { r =>
        val reps = got.getOrElse(r._1, 0L)
        assert(reps == k || reps == k + 1, s"$src doc ${r._1} reps $reps")
      }
      val spend = rows.map(r => got.getOrElse(r._1, 0L) * r._3).sum
      assert(spend <= budgets(src))
      assert(budgets(src) - spend < rows.map(_._3).max)
    }
  }

  test("charset quarantine is total, binary, and monotone in damage over arbitrary strings") {
    import graft.functions.TextAnalysis._
    val bad = df.select(charsetQuarantine($"s").as("q"),
        charsetQuarantine(concat($"s", lit("\u0001"))).as("qd"),
        charsetQuarantine(concat($"s", lit("�"))).as("qr"))
      .where($"q".isNull || !$"q".isin(0, 1) ||
        $"qd" =!= 1 || $"qr" =!= 1)
    assert(bad.count() == 0,
      "quarantine must be total, 0/1, and certain once damage is appended")
    // pure printable-ASCII strings (plus tab/newline/CR) always pass
    val clean = df
      .where($"s".rlike("^[\\x09\\x0A\\x0D\\x20-\\x7E]*$"))
      .where(charsetQuarantine($"s") =!= 0)
    assert(clean.count() == 0, "clean ASCII must never quarantine")
  }

  test("doremi serving weights quantize and floor over random count tables") {
    import graft.operators.Doremi
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 30).map(i => s"t$i")
    val sbc = (0 until 600).map { _ =>
      (s"dom${rnd.nextInt(5)}",
        s"${vocab(rnd.nextInt(30))} ${vocab(rnd.nextInt(30))}",
        1L + rnd.nextInt(50))
    }.groupBy(r => (r._1, r._2)).map { case ((s, b), rs) =>
      (s, b, rs.map(_._3).sum)
    }.toSeq.toDF("source", "bg", "cb")
    val cfg = Doremi.Config()
    val w = Doremi.tokenWeightsFromCounts(sbc, cfg).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("w_micro"))
    val k = w.length
    assert(k == 5)
    assert(math.abs(w.map(_._2).sum - 1000000L) <= 2L * k,
      s"weights must quantize to ~1e6 micro: ${w.toSeq}")
    w.foreach { case (s, v) =>
      assert(v >= cfg.smoothMicro / k, s"smoothing floor violated for $s")
    }
    val again = Doremi.tokenWeightsFromCounts(sbc, cfg).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("w_micro"))
    assert(w.toSeq == again.toSeq, "serving weights must be deterministic")
  }
}
