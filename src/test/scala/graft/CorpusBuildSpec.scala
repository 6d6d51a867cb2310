package graft

import org.apache.spark.sql.functions._
import graft.operators.{Contamination, CorpusBuild}

/** Invariants of the end-to-end corpus-build composition that the
  * value-level oracles can't see: shard totality, pack-size bounds,
  * budget respect, and post-decontamination cleanliness. */
class CorpusBuildSpec extends SparkSpec {
  import spark.implicits._

  private lazy val result: CorpusBuild.Result =
    ExtensionQueries.corpusBuildResult(spark, sf0001)
  private lazy val att = result.attribution.localCheckpoint()
  private lazy val manifest = result.manifest.localCheckpoint()

  test("attribution covers every corpus doc exactly once, with every stage live") {
    val n = Tables.load(spark, sf0001, "documents").count()
    val nEval = Tables.load(spark, sf0001, "documents")
      .where($"doc_id" % 97 === 0).count()
    val nSplant = Tables.load(spark, sf0001, "documents")
      .where($"doc_id" % 97 =!= 0 && $"doc_id" % 11 === 0).count()
    // corpus = base + structured + ws-twin + eval-rewrites
    val expected = (n - nEval) + 2 * nSplant + nEval
    assert(att.count() == expected)
    assert(att.select("doc_id").distinct().count() == expected,
      "first-cut attribution must be a function: one stage per doc")
    val byStage = att.groupBy("cut_stage").count()
      .as[(String, Long)].collect().toMap
    // the fixture guarantees these stages fire; budget depends on the
    // drawn sources so it is asserted separately below
    Seq("gopher", "dedup", "decon", "kept").foreach(st =>
      assert(byStage.getOrElse(st, 0L) > 0, s"stage $st never fired: $byStage"))
    // whitespace twins of structured plants lose their fingerprint
    // group to the smaller-id original whenever the original itself
    // cleared curation; a structured variant that organically fails a
    // curation gate (a couple of base docs push a Gopher ratio over)
    // takes its twin down at the SAME stage — first-cut consistency
    val twins = att.where($"doc_id" >= 500000 && $"doc_id" < 600000)
      .select($"doc_id", $"cut_stage".as("twin_stage"))
    assert(twins.count() == nSplant)
    val joined = twins
      .withColumn("orig_id", $"doc_id" - 200000)
      .join(att.select($"doc_id".as("orig_id"),
        $"cut_stage".as("orig_stage")), "orig_id")
      .localCheckpoint()
    assert(joined.count() == nSplant)
    assert(joined.where($"orig_stage".isin("kept", "dedup", "decon", "budget") &&
      $"twin_stage" =!= "dedup").count() == 0,
      "a twin whose original cleared curation must cut at dedup")
    assert(joined.where(!$"orig_stage".isin("kept", "dedup", "decon", "budget") &&
      $"twin_stage" =!= $"orig_stage").count() == 0,
      "a twin whose original fell at curation must fall at the same gate")
    assert(joined.where($"twin_stage" === "dedup").count() > 0,
      "at least one twin must exercise the dedup stage")
    // eval rewrites pass curation but die at decontamination
    val eplants = att.where($"doc_id" >= 600000)
    assert(eplants.count() == nEval)
    assert(eplants.where($"cut_stage" =!= "decon").count() == 0,
      "every +600000 eval rewrite must cut at decon")
  }

  test("token budgets hold for every source, and some source actually cut") {
    val kept = att.where($"cut_stage" === "kept").select("doc_id")
    val perSource = result.survivors
      .join(kept, "doc_id")
      .select($"source",
        graft.functions.TextAnalysis.tokenCount($"text").cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("tok"))
      .as[(String, Long)].collect().toMap
    val budgets = (0 until 20).map { i =>
      val b = i % 4 match {
        case 0 => 1000000L; case 1 => 2000L; case 2 => 1000L; case _ => 300L
      }
      s"src$i" -> b
    }.toMap
    perSource.foreach { case (src, tok) =>
      assert(tok <= budgets(src), s"$src kept $tok tokens over budget ${budgets(src)}")
    }
    assert(att.where($"cut_stage" === "budget").count() > 0,
      "the 300-token sources must cut at least one structured doc")
  }

  test("every kept doc lands in the manifest; every chunk in exactly one pack and shard") {
    val keptIds = att.where($"cut_stage" === "kept").select("doc_id")
    val manifestDocs = manifest.select("doc_id").distinct()
    assert(keptIds.exceptAll(manifestDocs).isEmpty &&
      manifestDocs.exceptAll(keptIds).isEmpty,
      "manifest docs must be exactly the kept docs")
    assert(manifest.groupBy("doc_id", "chunk_idx").count()
      .where($"count" > 1).count() == 0,
      "a chunk must appear exactly once")
    // packs: the running-sum cut means a pack's token total can exceed
    // the 512 target only by the tail of its last chunk
    val packTotals = manifest.groupBy("pack_id")
      .agg(sum("n_tokens").as("tok")).as[(Long, Long)].collect()
    assert(packTotals.nonEmpty)
    packTotals.foreach { case (p, tok) =>
      assert(tok < 512 + 32, s"pack $p holds $tok tokens")
    }
    // shards: fixed packsPerShard with one ragged tail — the
    // withHashShardId invariant, here over packs
    val shardPacks = manifest.select("pack_id", "shard_id").distinct()
      .groupBy("shard_id").count().as[(Long, Long)].collect()
      .sortBy(_._1)
    val last = shardPacks.map(_._1).max
    assert((0L to last).forall(id => shardPacks.exists(_._1 == id)),
      "shard ids must be dense")
    shardPacks.filter(_._1 < last).foreach { case (id, c) =>
      assert(c == 4, s"non-tail shard $id holds $c packs, want 4")
    }
    assert(manifest.select("pack_id", "shard_id").distinct().count() ==
      manifest.select("pack_id").distinct().count(),
      "every pack must map to exactly one shard")
  }

  test("the kept corpus is clean: no kept doc shares >= threshold 3-grams with eval") {
    val evals = Tables.load(spark, sf0001, "documents")
      .where($"doc_id" % 97 === 0).select("doc_id", "text")
    val maxShared = Contamination.sharedShingleCounts(
        result.survivors.select("doc_id", "text"), evals)
      .agg(max("n_shared")).head()
    assert(maxShared.isNullAt(0) || maxShared.getLong(0) < 10,
      s"a kept doc still shares ${maxShared} 3-grams with the eval set")
  }
  test("corpus-build plans: no limits, no global sorts, all windows partitioned") {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, LocalLimit, Sort => LSort, Window => LWindow}
    // the manifest plan is the live one (chunk -> pack -> shard over the
    // pinned survivors); the attribution plan unions the pinned stage
    // decisions. Neither may grow a driver funnel: no limit of any
    // kind, no global sort, and every window partitioned (the 3-pass
    // prefix's per-bucket windows) — the 100 TB stance, plan-asserted.
    for ((df, name) <- Seq((result.attribution, "attribution"),
        (result.manifest, "manifest"))) {
      val plan = df.queryExecution.optimizedPlan
      assert(plan.collect { case l: GlobalLimit => l }.isEmpty &&
        plan.collect { case l: LocalLimit => l }.isEmpty,
        s"$name grew a limit:\n$plan")
      assert(plan.collect { case so: LSort if so.global => so }.isEmpty,
        s"$name grew a global sort:\n$plan")
      plan.collect { case w: LWindow => w }.foreach(w =>
        assert(w.partitionSpec.nonEmpty,
          s"$name has a global window:\n$w"))
    }
  }

  test("release: shard-partitioned packs reconcile with the manifest and datacard") {
    val out = s"/tmp/graft_release_spec/${System.nanoTime()}"
    val datacard = CorpusBuild.release(result, out).localCheckpoint()
    // physical layout: exactly one directory per shard in the manifest
    val shardDirs = new java.io.File(s"$out/packs").listFiles
      .filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("shard_id=")).toSet
    val shards = manifest.select("shard_id").distinct()
      .as[Long].collect().map(s => s"shard_id=$s").toSet
    assert(shardDirs == shards,
      s"shard layout mismatch: dirs $shardDirs vs manifest $shards")
    // the written packs reconcile with the manifest token-for-token
    val packs = spark.read.parquet(s"$out/packs").localCheckpoint()
    assert(packs.select("pack_id").distinct().count() ==
      manifest.select("pack_id").distinct().count())
    assert(packs.agg(sum("pack_tokens")).head().getLong(0) ==
      manifest.agg(sum("n_tokens")).head().getLong(0))
    // every pack text carries at least one <eos> document separator
    assert(packs.where(!$"pack_text".contains("<eos>")).count() == 0)
    // the datacard covers exactly the surviving sources
    val cardSources = datacard.select("source").as[String].collect().toSet
    val survSources = result.survivors.select("source").distinct()
      .as[String].collect().toSet
    assert(cardSources == survSources)
    assert(datacard.agg(sum("n_docs")).head().getLong(0) ==
      result.survivors.count())
    // the packstats report conserves the manifest exactly: chunk,
    // pack, and token totals add up; capacity accounting is the
    // closed-form identity; and the splitting packer's straddle count
    // is visible (> 0 on this fixture — the FFD packer's is 0)
    val stats = spark.read.parquet(s"$out/packstats").localCheckpoint()
    assert(stats.agg(sum("n_chunks")).head().getLong(0) == manifest.count())
    assert(stats.agg(sum("n_packs")).head().getLong(0) ==
      manifest.select("pack_id").distinct().count())
    assert(stats.agg(sum("n_tokens")).head().getLong(0) ==
      manifest.agg(sum("n_tokens")).head().getLong(0))
    assert(stats.where($"pad_tokens" =!=
      $"n_packs" * 512 - $"n_tokens").count() == 0)
    assert(stats.agg(sum("n_boundary_splits")).head().getLong(0) > 0)
  }

  test("dsir-staged build: stage totality, target immunity, gate consistency") {
    val (corpus, evals, budgets) =
      ExtensionQueries.corpusBuildFixture(spark, sf0001)
    val plain = att
    val dsired = CorpusBuild.build(corpus, evals, budgets,
        dsirTarget = Some("src0"))
      .attribution.localCheckpoint()
    // totality: same universe, one stage per doc
    assert(dsired.count() == plain.count())
    assert(dsired.select("doc_id").distinct().count() == plain.count())
    // the stage is a pure INSERTION between decon and budget: every doc
    // whose plain verdict is a pre-dsir stage keeps it verbatim
    val pre = Seq("lang", "c4_page", "gopher", "dedup", "decon")
    val joined = plain.select($"doc_id", $"cut_stage".as("plain"))
      .join(dsired.select($"doc_id", $"cut_stage".as("gated")), "doc_id")
      .localCheckpoint()
    assert(joined.where($"plain".isin(pre: _*) && $"gated" =!= $"plain")
      .count() == 0, "a pre-dsir verdict changed under the dsir build")
    // dsir never cuts a target-source doc
    val srcOf = corpus.select("doc_id", "source")
    assert(dsired.join(srcOf, "doc_id")
      .where($"cut_stage" === "dsir" && $"source" === "src0")
      .count() == 0, "the target source must pass its own gate")
    // the gate fired, and whoever it cut was a plain-build survivor
    val cut = joined.where($"gated" === "dsir")
    assert(cut.count() > 0, "the dsir stage never fired")
    assert(cut.where(!$"plain".isin("kept", "budget")).count() == 0,
      "dsir cut a doc that was not a plain-build mixer candidate")
  }

  test("d4-staged build: insertion accounting, no-vector and null-sim docs pass") {
    val (corpus, evals, budgets) =
      ExtensionQueries.corpusBuildFixture(spark, sf0001)
    val es = ExtensionQueries.d4EmbeddingStages(spark, sf0001)
    val plain = att
    val d4 = CorpusBuild.build(corpus, evals, budgets,
        embedStages = Some(es))
      .attribution.localCheckpoint()
    // totality + function
    assert(d4.count() == plain.count())
    assert(d4.select("doc_id").distinct().count() == plain.count())
    // pure insertion between decon and the mixer: pre-D4 verdicts
    // unchanged; both new stages fire; whoever they cut was a
    // plain-build mixer candidate
    val pre = Seq("lang", "c4_page", "gopher", "dedup", "decon")
    val joined = plain.select($"doc_id", $"cut_stage".as("plain"))
      .join(d4.select($"doc_id", $"cut_stage".as("gated")), "doc_id")
      .localCheckpoint()
    assert(joined.where($"plain".isin(pre: _*) && $"gated" =!= $"plain")
      .count() == 0, "a pre-d4 verdict changed under the d4 build")
    val byStage = d4.groupBy("cut_stage").count()
      .as[(String, Long)].collect().toMap
    Seq("semdedup", "proto").foreach(st =>
      assert(byStage.getOrElse(st, 0L) > 0, s"stage $st never fired: $byStage"))
    assert(joined.where($"gated".isin("semdedup", "proto") &&
      !$"plain".isin("kept", "budget")).count() == 0,
      "an embedding stage cut a doc that was not a mixer candidate")
    // every planted x1.001 vector twin whose doc survives to the
    // embedding gates cuts at semdedup (its smaller-id source wins)
    val planted = d4.where($"doc_id" > 300000 && $"doc_id" < 500000 &&
      ($"doc_id" - 300000) % 33 === 0)
    assert(planted.where($"cut_stage" === "semdedup").count() > 0,
      "no planted vector twin exercised the semdedup stage")

    // an embedding GAP must never delete text: hide the vectors of
    // half the plants and give one doc a zero (null-sim) vector —
    // those docs must pass both embedding gates (though downstream
    // stages may still cut them)
    val holey = es.vectors.where($"doc_id" % 2 === 0)
      .unionByName(es.vectors.where($"doc_id" === 300033)
        .select($"doc_id", transform($"vec", _ => lit(0.0)).as("vec")))
    val d4h = CorpusBuild.build(corpus, evals, budgets,
        embedStages = Some(CorpusBuild.EmbeddingStages(
          holey, es.centroids, es.semThreshold)))
      .attribution.localCheckpoint()
    assert(d4h.count() == plain.count())
    assert(d4h.where(($"doc_id" % 2 =!= 0 || $"doc_id" === 300033) &&
      $"cut_stage".isin("semdedup", "proto")).count() == 0,
      "a doc with no vector (or a degenerate one) was cut by an embedding gate")
  }

  test("spanclean-staged build: insertion accounting, cleaned tokens drive the budget") {
    import graft.operators.SpanDedup
    val (corpus, evals, budgets) =
      ExtensionQueries.corpusBuildFixture(spark, sf0001)
    val plain = att
    val res = CorpusBuild.build(corpus, evals, budgets,
      spanCleanK = Some(8))
    val sc = res.attribution.localCheckpoint()
    // totality + function
    assert(sc.count() == plain.count())
    assert(sc.select("doc_id").distinct().count() == plain.count())
    // pure insertion after decon: pre-spanclean verdicts unchanged,
    // the stage fires, and whoever it cut was a plain-build mixer
    // candidate
    val pre = Seq("lang", "c4_page", "gopher", "dedup", "decon")
    val joined = plain.select($"doc_id", $"cut_stage".as("plain"))
      .join(sc.select($"doc_id", $"cut_stage".as("gated")), "doc_id")
      .localCheckpoint()
    assert(joined.where($"plain".isin(pre: _*) && $"gated" =!= $"plain")
      .count() == 0, "a pre-spanclean verdict changed under the build")
    assert(joined.where($"gated" === "spanclean" &&
      !$"plain".isin("kept", "budget")).count() == 0,
      "spanclean cut a doc that was not a mixer candidate")
    // the stage visibly CUT tokens from boilerplate-sharing survivors
    // even when no doc was fully covered (sf0.001 has none)
    val plainKept = plain.where($"cut_stage".isin("kept", "budget"))
      .select("doc_id")
    assert(SpanDedup.cleanedDocs(
        corpus.join(plainKept, "doc_id").select("doc_id", "text"), k = 8)
      .where($"n_removed" > 0).count() > 0,
      "no mixer candidate lost a repeated span")

    // full-coverage drill: plant a doc that IS a sub-document of a
    // larger plant (distinct fingerprints, both clear curation) — the
    // contained doc's every 8-gram repeats in its container, so it
    // must cut at the NEW stage while the container merely loses the
    // shared run and keeps its unique tail
    val passage = "the ancient library stood near the river and held " +
      "many thousand books about science history and art travelers " +
      "came from distant towns to read them each morning the keeper " +
      "opened heavy doors and greeted every visitor with quiet warmth " +
      "scholars spent long hours copying notes while students studied " +
      "maps charts and letters from faraway lands"
    val plants = Seq(
      (900001L, passage, "src0"),
      (900002L, passage + " plus uncommon trailing tokens appended here",
        "src0")).toDF("doc_id", "text", "source")
    val att3 = CorpusBuild.build(corpus.unionByName(plants), evals,
        budgets, spanCleanK = Some(8))
      .attribution.where($"doc_id" >= 900000L)
      .as[(Long, String)].collect().toMap
    assert(att3(900001L) == "spanclean",
      s"the fully-covered sub-document must cut at spanclean: $att3")
    assert(att3(900002L) == "kept",
      s"the container keeps its unique tail: $att3")
    // survivors' text is the CLEANED canonical form: re-cleaning the
    // survivor set against itself removes nothing new only for spans
    // the first pass already cut — i.e. every survivor's token count
    // matches the cleaner's post-clean count for that doc
    val surv = res.survivors.localCheckpoint()
    val recount = surv.select($"doc_id",
      graft.functions.TextAnalysis.tokenCount($"text").cast("long")
        .as("n_now"))
    // the build's survivors joined back to a fresh clean of the same
    // post-decon frame must agree token-for-token
    val pds = plain.where($"cut_stage".isin("kept", "budget"))
      .select("doc_id")
    val freshClean = SpanDedup.cleanedDocs(
        corpus.join(pds, "doc_id").select("doc_id", "text"), k = 8)
      .select($"doc_id",
        ($"n_before" - $"n_removed").as("n_expected"))
    assert(recount.join(freshClean, "doc_id")
      .where($"n_now" =!= $"n_expected").count() == 0,
      "survivor text is not the cleaner's output")
  }

  test("doremi-budgeted build: the learned mix is live and totals to the spend") {
    import graft.operators.Doremi
    val (corpus, evals, fixedBudgets) =
      ExtensionQueries.corpusBuildFixture(spark, sf0001)
    val w = Doremi.weights(corpus).localCheckpoint()
    val budgets = Doremi.budgets(w, totalTokens = 200000L)
      .localCheckpoint()
    // every fixture source gets a weight, and the spend allocation is
    // the exact integer share of the 200k total
    assert(w.count() == corpus.select("source").distinct().count())
    val learned = CorpusBuild
      .build(corpus, evals, budgets).attribution.localCheckpoint()
    assert(learned.count() ==
      ExtensionQueries.corpusBuildResult(spark, sf0001)
        .attribution.count(),
      "learned budgets must not change attribution totality")
    // the stage is LIVE: the learned mix must disagree with the
    // hand-set table on at least one doc's kept/budget verdict (the
    // fixture's fixed budgets are deliberately lopsided; a learned
    // near-uniform mix reallocates)
    val fixed = CorpusBuild
      .build(corpus, evals, fixedBudgets).attribution
    val diff = learned.withColumnRenamed("cut_stage", "a")
      .join(fixed.withColumnRenamed("cut_stage", "b"), "doc_id")
      .where($"a" =!= $"b").count()
    assert(diff > 0, "learned budgets produced the identical mix — stage inert?")
    // only budget-stage verdicts may move between the two runs
    val moved = learned.withColumnRenamed("cut_stage", "a")
      .join(fixed.withColumnRenamed("cut_stage", "b"), "doc_id")
      .where($"a" =!= $"b" &&
        !($"a".isin("kept", "budget") && $"b".isin("kept", "budget")))
      .count()
    assert(moved == 0, "non-budget stages must be immune to the mixer's table")
  }

  test("shard fingerprints: canonical (order-blind), content-sensitive, shard-local") {
    import graft.operators.CorpusBuild
    val manifest = ExtensionQueries.corpusBuildResult(spark, sf0001)
      .manifest.localCheckpoint()
    def fps(m: org.apache.spark.sql.DataFrame) =
      CorpusBuild.shardFingerprints(m)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = fps(manifest)
    assert(base.nonEmpty)
    // task scheduling / row order must not move a single hash
    assert(fps(manifest.repartition(7).sortWithinPartitions("n_tokens"))
      == base, "fingerprints must be canonical under any row order")
    // dropping one chunk changes ITS shard's hash and no other
    val victim = manifest.orderBy("doc_id", "chunk_idx").head()
    val vShard = victim.getAs[Long]("shard_id")
    val cut = fps(manifest.where(!($"doc_id" === victim.getAs[Long]("doc_id")
      && $"chunk_idx" === victim.getAs[Int]("chunk_idx"))))
    assert(cut(vShard) != base(vShard),
      "removing a chunk must change its shard's fingerprint")
    (base.keySet - vShard).foreach(sid =>
      assert(cut(sid) == base(sid),
        s"shard $sid's fingerprint moved without its content changing"))
  }

  test("mixer diff: the one-pass audit equals diffing two full builds") {
    import graft.operators.{CorpusBuild, Doremi}
    val (corpus, evals, fixedBudgets) =
      ExtensionQueries.corpusBuildFixture(spark, sf0001)
    val learned = Doremi.budgets(Doremi.weights(corpus), 2000L)
      .localCheckpoint()
    val diff = CorpusBuild.mixerDiff(corpus, evals, fixedBudgets, learned)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    // the expensive reference: two complete builds, attribution joined
    val a = CorpusBuild.build(corpus, evals, fixedBudgets).attribution
    val b = CorpusBuild.build(corpus, evals, learned).attribution
    val want = a.withColumnRenamed("cut_stage", "sa")
      .join(b.withColumnRenamed("cut_stage", "sb"), "doc_id")
      .where($"sa" =!= $"sb")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2)))
      .toMap
    assert(diff == want,
      "the shared-pass diff must equal the two-build diff exactly")
    assert(diff.nonEmpty,
      "the lopsided fixture tables must actually disagree somewhere")
    diff.values.foreach { case (sa, sb) =>
      assert(Set("kept", "budget")(sa) && Set("kept", "budget")(sb),
        "only ledger verdicts may appear in the audit")
    }
  }

  test("authority vs harmonic keeper: the two published ranks pick " +
      "DIFFERENT keepers for some cross-source dup group") {
    // Common Crawl ships both ranks over one host graph because they
    // disagree on hub-vs-proximity; if the fixture's dup groups never
    // exposed that disagreement, ext_corpus_build_harmonic would be a
    // renamed rerun of the authority build — this pins the second
    // signal as load-bearing. Compared at the curation stage (where
    // keepers live); the full compositions are value-oracle'd.
    val (corpus, _, _) =
      ExtensionQueries.corpusBuildFixture(spark, sf0001,
        withCrossSourcePlants = true)
    val auth = GraphQueries.sourceAuthorityRanks(spark, sf0001)
      .select($"source", $"rank_fp".as("priority"))
    val harm = GraphQueries.sourceHarmonicRanks(spark, sf0001)
      .select($"source", $"harmonic_fp".as("priority"))
    def keepers(pri: org.apache.spark.sql.DataFrame): Map[Long, String] =
      graft.operators.QualityRules
        .fineWebPipeline(corpus, keeperPriorities = Some(pri))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ka = keepers(auth)
    val kh = keepers(harm)
    assert(ka.keySet == kh.keySet)
    val swapped = ka.keys.filter(id =>
      Set(ka(id), kh(id)) == Set("kept", "dedup"))
    assert(swapped.nonEmpty,
      "expected at least one dup group whose keeper differs between " +
        "the authority and harmonic ranks — the fixture no longer " +
        "exercises the second rank signal")
    // sanity: the two source orderings genuinely differ somewhere
    val ra = auth.orderBy(desc("priority"), asc("source"))
      .select("source").as[String].collect().toSeq
    val rh = harm.orderBy(desc("priority"), asc("source"))
      .select("source").as[String].collect().toSeq
    assert(ra != rh, "rank orderings identical — signals degenerate")
  }

}
