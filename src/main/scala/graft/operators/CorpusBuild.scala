package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end "materialize a training corpus" composition — the
  * product a pipeline user actually runs, chaining the individually
  * oracle-checked stages into ONE dataflow with per-stage cut
  * attribution:
  *
  *   raw docs → FineWeb curation (lang / C4 / Gopher / exact-dedup,
  *   [[QualityRules.fineWebPipeline]]) → decontamination against a
  *   held-out eval set ([[Contamination.sharedShingleCounts]]) →
  *   token-budget source mixing (grouped 3-pass prefix) →
  *   token-window chunking ([[Chunking.tokenChunks]]) → fixed-token
  *   packing (global 3-pass prefix) → pack-level shard assignment
  *   ([[Ops.withHashShardId]]).
  *
  * Scale stance, stage by stage: curation is a projection + one dedup
  * shuffle with pinned decisions; decontamination broadcasts the
  * (distinct-deduped) eval shingles so the corpus never shuffles for
  * the join; mixing and packing use the bucketed prefix helpers — the
  * driver only ever sees per-bucket totals, never rows; shard ranks
  * run over DISTINCT pack ids (corpus tokens / packTokens rows, three
  * orders below the chunk count) and join back on pack_id. No stage
  * holds an O(corpus) structure on the driver.
  *
  * Cut attribution is FIRST-CUT, in pipeline order: `lang`, `c4_page`,
  * `gopher`, `dedup`, `decon`, (`spanclean` when the ExactSubstr
  * stage is set,) (`semdedup`, `proto` when the D4 embedding stages
  * are set,) (`dsir` when a selection target is set,) `budget`,
  * `kept` — each surviving doc carries `kept`, every other doc names
  * the stage that removed it (the dedupIngestGate convention,
  * extended across the composition).
  */
object CorpusBuild {

  /** Everything the build produces: per-input-doc attribution and the
    * chunk-level shard manifest over the kept docs. `survivors` is the
    * pinned (doc_id, text, source) frame the manifest derives from. */
  final case class Result(attribution: DataFrame, manifest: DataFrame,
      survivors: DataFrame)

  /** The D4-style embedding stages (Tirumala et al., arXiv:2308.12284:
    * SemDeDup then SSL-prototype pruning, run between decontamination
    * and selection/mixing):
    *
    * @param vectors   (doc_id, vec: array&lt;double&gt;) — the corpus
    *                  embedding store; docs WITHOUT a vector pass both
    *                  gates (the null-keep stance)
    * @param centroids the frozen quantizer (literal k×dim seq — the
    *                  [[IvfIndex.collectCentroids]] shape)
    * @param semThreshold within-cluster cosine at or above which the
    *                  larger-id doc is cut (`semdedup`)
    * @param pruneDen  prototype-prune the most-prototypical
    *                  ⌈n/pruneDen⌉ of the remaining scorable docs
    *                  (`proto`) — cutoff via the distributed 3-pass
    *                  rank, cutoff-value ties drop too
    */
  final case class EmbeddingStages(vectors: DataFrame,
      centroids: Seq[(Int, Seq[Double])], semThreshold: Double,
      pruneDen: Int = 5)

  /** Runs the full composition.
    *
    * @param corpus   (doc_id, text, source)
    * @param evalDocs (doc_id, text) — the held-out benchmark; corpus
    *                 docs sharing ≥ `contamThreshold` distinct word
    *                 3-grams with it are cut (`decon`)
    * @param budgets  (source, budget) — per-source token budgets; docs
    *                 keep in deterministic md5 order until their
    *                 source's budget is spent (`budget`)
    * @param dsirTarget when set, a DSIR selection stage runs between
    *                 decontamination and mixing: the named source is
    *                 the target distribution, every OTHER source's
    *                 surviving docs are importance-weighted against it
    *                 ([[Dsir]]) and cut (`dsir`) unless w_milli > 0 —
    *                 keep what looks more target than crawl. Target-
    *                 source docs pass the gate by definition.
    * @param embedStages when set, the D4 embedding stages run between
    *                 decontamination and DSIR/mixing — SemDeDup
    *                 (`semdedup`) then prototype pruning (`proto`);
    *                 see [[EmbeddingStages]]
    * @param spanCleanK when set, the ExactSubstr span-clean stage
    *                 ([[SpanDedup.cleanedDocs]] at k-gram size
    *                 `spanCleanK`) runs FIRST after decontamination:
    *                 cross-doc repeated extents measured within the
    *                 survivors are cut from every doc, a doc whose
    *                 whole text is covered cuts at `spanclean`, and
    *                 every downstream stage — DSIR features, the
    *                 budget mixer's token counts, chunking, packing,
    *                 the release packs — reads the CLEANED canonical
    *                 (lowercased, whitespace-normalized) text
    */
  /** @param keeperPriorities when set — (source, priority), e.g. the
    *   persisted authority ranks — the curation stage's exact-dedup
    *   keeper prefers the highest-priority source's copy over the
    *   min-id default (see [[QualityRules.fineWebPipeline]]): the
    *   rank-aware canonical-copy choice `ext_graph_rank_keeper`
    *   demonstrates standalone, threaded into the capstone. */
  def build(corpus: DataFrame, evalDocs: DataFrame, budgets: => DataFrame,
      contamThreshold: Int = 10, chunkSize: Int = 32, overlap: Int = 4,
      packTokens: Int = 512, packsPerShard: Int = 4,
      dsirTarget: Option[String] = None,
      embedStages: Option[EmbeddingStages] = None,
      spanCleanK: Option[Int] = None,
      keeperPriorities: Option[DataFrame] = None): Result = {
    // `budgets` is BY-NAME and read exactly once, at the mixing stage:
    // a budget table that is itself the product of an eager learning
    // pass (DoReMi / ablation / Shapley weights — seconds of
    // statements, independent of the curation chain) can be computed
    // on a caller thread CONCURRENTLY with the curation/decon/toks
    // statements (guide §2.6, overlap independent jobs) and handed in
    // as a future-blocking thunk ([[Ops.deferred]]); eager callers
    // pass a plain frame and nothing changes.
    require(contamThreshold >= 1 && packTokens > 0 && packsPerShard > 0)

    // ── curation + exact dedup (first-cut attribution inside) ──────
    val staged = QualityRules.fineWebPipeline(corpus,
      keeperPriorities = keeperPriorities) // (doc_id, cut_stage)
    val curated = corpus.join(
      staged.where(col("cut_stage") === "kept").select("doc_id"), "doc_id")

    // ── decontamination: distinct shared 3-grams vs the eval set ───
    // pinned: the id list is tiny and feeds BOTH the anti-join and the
    // attribution union — unpinned, each consumer re-runs the shingle
    // join (and everything upstream of it)
    val contamIds = Contamination
      .sharedShingleCounts(curated.select("doc_id", "text"), evalDocs)
      .where(col("n_shared") >= contamThreshold)
      .select("doc_id")
      .localCheckpoint()
    val cleanPreSpan = curated.join(contamIds, Seq("doc_id"), "left_anti")

    // ── optional ExactSubstr span-clean (first after decon): repeats
    //    are measured WITHIN the survivors (the corpus a release would
    //    ship), covered extents cut in place, fully-covered docs cut
    //    at `spanclean`. The survivor frame is pinned first — the
    //    cleaner consumes it for the shingle pass AND the text
    //    rewrite join, and the curation+decon chain above must not
    //    run once per consumer. ────────────────────────────────────
    val (cleanAll, spanCutIds) = spanCleanK match {
      case None => (cleanPreSpan, None)
      case Some(k) =>
        val base = Ops.checkpointKeepPartitioning(
          cleanPreSpan.select("doc_id", "text", "source"), eager = true)
        val cleaned = Ops.checkpointKeepPartitioning(
          SpanDedup.cleanedDocs(base.select("doc_id", "text"), k))
        val cut = cleaned
          .where(col("n_before") - col("n_removed") === 0)
          .select("doc_id").localCheckpoint()
        val rewritten = base.select("doc_id", "source")
          .join(cleaned.where(col("n_before") - col("n_removed") > 0)
            .select(col("doc_id"), col("clean_text").as("text")), "doc_id")
          .select("doc_id", "text", "source")
        (rewritten, Some(cut))
    }

    // ── optional D4 embedding stages (between decon and selection):
    //    SemDeDup cuts the larger-id member of every within-cluster
    //    near-dup pair (`semdedup`), then prototype pruning drops the
    //    most-prototypical ⌈n/pruneDen⌉ scorable survivors (`proto`,
    //    cutoff via the distributed 3-pass rank). Both stages run over
    //    the pinned survivors⋈vectors frame — centroid assignment is a
    //    zero-exchange literal projection, near-dup checks stay inside
    //    cluster buckets (hot-cluster capped), and docs without a
    //    vector (or with a degenerate null-sim one) pass both gates:
    //    an embedding gap must never silently delete text. ───────────
    val (cleanD4, semCutIds, protoCutIds) = embedStages match {
      case None => (cleanAll, None, None)
      case Some(es) =>
        val vecs = Ops.checkpointKeepPartitioning(
          es.vectors.join(cleanAll.select("doc_id"), "doc_id"))
        val keepers = Similarity.semanticDedup(vecs, es.centroids,
          es.semThreshold, idCol = "doc_id")
        val semCut = vecs.select("doc_id")
          .join(keepers.select("doc_id"), Seq("doc_id"), "left_anti")
          .localCheckpoint()
        val asg = IvfIndex.withClusterSim(
            vecs.join(semCut, Seq("doc_id"), "left_anti"), es.centroids)
          .localCheckpoint() // three consumers: count, rank, filter
        val real = asg.where(col("proto_sim").isNotNull)
        val n = real.count()
        val k = ((n + es.pruneDen - 1) / es.pruneDen).max(1L)
        val protoCut = (if (n == 0) None
          else Ops.kthOrderedValue[Double](real, -col("proto_sim"),
            col("doc_id"), k)) match {
          case None => semCut.where(lit(false))
          case Some(negCutoff) =>
            asg.where(col("proto_sim").isNotNull &&
                col("proto_sim") >= lit(-negCutoff))
              .select("doc_id").localCheckpoint()
        }
        (cleanAll.join(semCut, Seq("doc_id"), "left_anti")
            .join(protoCut, Seq("doc_id"), "left_anti"),
          Some(semCut), Some(protoCut))
    }

    // ── optional DSIR selection (between decon and mixing): fit the
    //    hashed-ngram importance model on the target source vs the
    //    rest OF THE SURVIVORS (the reference corpus a production fit
    //    would pin), gate raw docs on w_milli > 0. The raw feature
    //    stream is bucketed once and pinned — it feeds both the fit
    //    and the scorer. Cut ids are tiny and feed two consumers
    //    (anti-join + attribution), so they pin too. ────────────────
    val (clean, dsirCutIds) = dsirTarget match {
      case None => (cleanD4, None)
      case Some(t) =>
        val target = cleanD4.where(col("source") === t)
          .select("doc_id", "text")
        val rawDocs = cleanD4.where(col("source") =!= t)
        val rawFeats = Ops.checkpointKeepPartitioning(
          Dsir.bucketedFeatures(rawDocs.select("doc_id", "text"),
            hexChars = 2), eager = true) // ratios+unseen broadcasts
            // both force it concurrently when lazy (the convoy)
        val model = Dsir.fitBucketed(
          Dsir.bucketedFeatures(target, hexChars = 2), rawFeats, 2)
        val cut = Dsir.scoreWeightsBucketed(model, rawFeats,
            rawDocs.select("doc_id"))
          .where(col("w_milli") <= 0).select("doc_id")
          .localCheckpoint()
        (cleanD4.join(cut, Seq("doc_id"), "left_anti"), Some(cut))
    }

    // ── token-budget source mixing (grouped 3-pass prefix: a plain
    //    per-source window would funnel the biggest source through one
    //    task — the straggler the mixer exists to manage) ────────────
    // toks is pinned BEFORE the prefix: its three passes re-evaluate
    // lineage, and upstream of here sits the whole curation+decon
    // chain — unpinned, that chain would run once per pass (measured:
    // the dominant cost of the composed build). The pinned frame is
    // (id, source, n, hash) — no text, tiny at any corpus size.
    val toks = clean.select(col("doc_id"), col("source"),
      graft.functions.TextAnalysis.tokenCount(col("text")).cast("long")
        .as("__n"),
      md5(col("doc_id").cast("string").cast("binary")).as("__hx"))
      .localCheckpoint()
    val withCum = Ops.withGroupedRunningSum(toks, col("source"),
      Seq(col("__hx"), col("doc_id")),
      expr("conv(substr(__hx, 1, 13), 16, 10)").cast("double"),
      col("__n"), "__cum",
      leadingBounds = Some(Ops.md5PrefixBounds()))
    // pinned: two consumers (kept / over-budget) would otherwise each
    // re-run the full three-pass prefix
    val budgeted = withCum.join(broadcast(budgets), "source")
      .select("doc_id", "source", "__cum", "budget")
      .localCheckpoint()
    val keptIds = budgeted.where(col("__cum") <= col("budget"))
      .select("doc_id")
    val budgetCutIds = budgeted.where(col("__cum") > col("budget"))
      .select("doc_id")

    // Pin the survivors: chunking + packing + sharding re-evaluate
    // lineage across the prefix helpers' three passes, and the full
    // gate chain above is far too expensive to run thrice.
    val survivors = Ops.checkpointKeepPartitioning(
      clean.join(keptIds, "doc_id").select("doc_id", "text", "source"),
      eager = true)

    // ── attribution: first cut wins, survivors say kept ────────────
    val attribution = staged.where(col("cut_stage") =!= "kept")
      .unionByName(contamIds.select(col("doc_id"),
        lit("decon").as("cut_stage")))
      .unionByName(spanCutIds.fold(
        contamIds.where(lit(false)))(identity)
        .select(col("doc_id"), lit("spanclean").as("cut_stage")))
      .unionByName(semCutIds.fold(
        contamIds.where(lit(false)))(identity) // no stage → empty slice
        .select(col("doc_id"), lit("semdedup").as("cut_stage")))
      .unionByName(protoCutIds.fold(
        contamIds.where(lit(false)))(identity)
        .select(col("doc_id"), lit("proto").as("cut_stage")))
      .unionByName(dsirCutIds.fold(
        contamIds.where(lit(false)))(identity)
        .select(col("doc_id"), lit("dsir").as("cut_stage")))
      .unionByName(budgetCutIds.select(col("doc_id"),
        lit("budget").as("cut_stage")))
      .unionByName(survivors.select(col("doc_id"),
        lit("kept").as("cut_stage")))

    // ── chunk → pack → shard manifest ──────────────────────────────
    val chunks = Chunking.tokenChunks(survivors, chunkSize = chunkSize,
        overlap = overlap)
      .select(col("doc_id"), col("chunk_idx"),
        col("n_tokens").cast("long").as("n_tokens"))
    val packed = Ops.withGlobalRunningSum(chunks,
        Seq(col("doc_id"), col("chunk_idx")), col("doc_id"),
        col("n_tokens"), "__cum")
      .withColumn("pack_id",
        floor((col("__cum") - col("n_tokens")) / lit(packTokens.toDouble))
          .cast("long"))
      .drop("__cum")
    // Shards over DISTINCT pack ids: n/packTokens rows through the
    // md5-rank assigner, then an equi-join back — never a broadcast of
    // a corpus-sized side, never a rank over the chunk table itself.
    val packShards = Ops.withHashShardId(
        packed.select("pack_id").distinct(), col("pack_id"),
        shardSize = packsPerShard)
      .withColumnRenamed("shard_id", "shard_id")
    val manifest = packed.join(packShards, "pack_id")
      .select("doc_id", "chunk_idx", "n_tokens", "pack_id", "shard_id")

    Result(attribution, manifest, survivors)
  }

  /** Materializes a [[Result]] as the trainer-facing artifact set under
    * `outDir` — the step after the manifest, what a release actually
    * ships:
    *
    *   - `packs/`: the packed training sequences (pack_text with
    *     `<eos>` document separators, chunk/token counts), written
    *     `partitionBy(shard_id)` so a trainer maps one shard directory
    *     per reader — the physical layout IS the shard assignment.
    *   - `manifest/`: the chunk-level manifest as parquet.
    *   - `datacard/`: per-source doc/token counts of the KEPT corpus —
    *     the datasheet row set a release publishes (bounded ≤ sources
    *     rows, `coalesce(1)` is the documented tiny-frame exception).
    *   - `packstats/`: per-shard packing-efficiency report — pack and
    *     chunk counts, token totals, `pad_tokens` (shard capacity
    *     `n_packs × packTokens` minus tokens landed; negative means
    *     the shard's packs overflow their window) and
    *     `n_boundary_splits` (chunks straddling a pack boundary — the
    *     tokens a fixed-window trainer would truncate; 0 by
    *     construction for [[BestFitPacking]], nonzero for this
    *     splitting packer — the user-visible face of the two packers'
    *     trade). Chunk starts re-derive through the same 3-pass global
    *     running sum the packer used, so the report is exact at any
    *     corpus size.
    *
    * Pack assembly is a per-pack aggregation over bounded groups
    * (≤ packTokens tokens of text each); ids come from the already-
    * computed manifest, so no rank pass re-runs. Returns the datacard
    * READ BACK from disk — callers (and the oracle) value-check what
    * was physically written, not what was about to be. */
  def release(result: Result, outDir: String, chunkSize: Int = 32,
      overlap: Int = 4, packTokens: Int = 512): DataFrame = {
    val spark = result.survivors.sparkSession
    val chunks = Chunking.tokenChunks(result.survivors,
        chunkSize = chunkSize, overlap = overlap)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_text"),
        col("n_tokens").cast("long").as("n_tokens"))
    val withIds = chunks.join(
      result.manifest.select("doc_id", "chunk_idx", "pack_id", "shard_id"),
      Seq("doc_id", "chunk_idx"))
    val packs = withIds
      .withColumn("piece",
        when(col("chunk_idx") === 0,
          concat(lit("<eos> "), col("chunk_text")))
          .otherwise(col("chunk_text")))
      .groupBy("shard_id", "pack_id")
      .agg(count(lit(1)).as("n_chunks"), sum("n_tokens").as("pack_tokens"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("doc_id"),
            col("chunk_idx"), col("piece")))),
          sf => sf.getField("piece"))).as("pack_text"))
    packs.write.mode("overwrite").partitionBy("shard_id")
      .parquet(s"$outDir/packs")
    result.manifest.write.mode("overwrite").parquet(s"$outDir/manifest")
    result.survivors
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(graft.functions.TextAnalysis.tokenCount(col("text"))
          .cast("long")).as("n_tokens"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/datacard")
    packStats(result.manifest, packTokens)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/packstats")
    spark.read.parquet(s"$outDir/datacard").orderBy("source")
  }

  /** Per-shard INTEGRITY FINGERPRINTS over the release manifest: the
    * md5 of the shard's (pack, doc, chunk, tokens) rows in a canonical
    * total order, plus chunk/token totals. Two releases are
    * shard-diffable by comparing 64-hex-char rows instead of data, and
    * a trainer can verify a mounted shard against its manifest line
    * before consuming it. The per-shard collect is BOUNDED by
    * construction — a shard holds at most packsPerShard·packTokens
    * tokens' worth of chunks — so the sort-and-hash is constant work
    * per group no matter the corpus size, and the row order inside the
    * group is canonicalized (array_sort) so the fingerprint is a pure
    * function of the shard's content, not of task scheduling. */
  def shardFingerprints(manifest: DataFrame): DataFrame =
    manifest.groupBy("shard_id")
      .agg(
        md5(concat_ws("|", expr(
          "transform(array_sort(collect_list(struct(pack_id, doc_id, chunk_idx, n_tokens))), " +
            "r -> concat(cast(r.pack_id as string), ':', " +
            "cast(r.doc_id as string), ':', " +
            "cast(r.chunk_idx as string), ':', " +
            "cast(r.n_tokens as string)))"))
          .cast("binary")).as("fingerprint"),
        count(lit(1)).as("n_chunks"),
        sum(col("n_tokens")).as("n_tokens"))
      .orderBy("shard_id")

  /** The MIXER-CHANGE AUDIT — what would swapping budget table A for
    * budget table B do to the release? Exactly the docs whose
    * kept/budget verdict moves, with both verdicts. The earlier stages
    * are immune to the budget table by construction (drilled in
    * CorpusBuildSpec), so the diff is a pure function of the budget
    * entrants' cum prefix — which this computes ONCE over one shared
    * curation+decon pass and joins against BOTH broadcast budget
    * tables, instead of running two full builds and diffing their
    * attributions. The text never rides past the token count: the
    * diff'd frame is (id, source, n, hash), tiny at any corpus size. */
  def mixerDiff(corpus: DataFrame, evalDocs: DataFrame,
      budgetsA: => DataFrame, budgetsB: => DataFrame,
      contamThreshold: Int = 10): DataFrame = {
    // budget tables by-name, each read once at the final joins — a
    // LEARNED table (DoReMi weights) can be computed concurrently with
    // the curation+toks statements via [[Ops.deferred]] (guide §2.6)
    val staged = QualityRules.fineWebPipeline(corpus)
    val curated = corpus.join(
      staged.where(col("cut_stage") === "kept").select("doc_id"), "doc_id")
    val contamIds = Contamination
      .sharedShingleCounts(curated.select("doc_id", "text"), evalDocs)
      .where(col("n_shared") >= contamThreshold)
      .select("doc_id")
    val clean = curated.join(contamIds, Seq("doc_id"), "left_anti")
    // pinned for the prefix's three passes (the build's own stance)
    val toks = clean.select(col("doc_id"), col("source"),
      graft.functions.TextAnalysis.tokenCount(col("text")).cast("long")
        .as("__n"),
      md5(col("doc_id").cast("string").cast("binary")).as("__hx"))
      .localCheckpoint()
    val withCum = Ops.withGroupedRunningSum(toks, col("source"),
      Seq(col("__hx"), col("doc_id")),
      expr("conv(substr(__hx, 1, 13), 16, 10)").cast("double"),
      col("__n"), "__cum",
      leadingBounds = Some(Ops.md5PrefixBounds()))
    def verdict(b: Column): Column =
      when(col("__cum") <= b, "kept").otherwise("budget")
    withCum
      .join(broadcast(budgetsA.select(col("source"),
        col("budget").as("__ba"))), "source")
      .join(broadcast(budgetsB.select(col("source"),
        col("budget").as("__bb"))), "source")
      .select(col("doc_id"), verdict(col("__ba")).as("stage_a"),
        verdict(col("__bb")).as("stage_b"))
      .where(col("stage_a") =!= col("stage_b"))
  }

  /** The ATTRITION FUNNEL — per pipeline stage, how many documents and
    * how many (raw) tokens it cost: the one-table answer to "where did
    * my corpus go", the first diagnostic anyone runs on a curation
    * configuration (kept row included, so the table totals to the
    * input corpus). One broadcast-free join on doc_id + one bounded
    * groupBy — stage cardinality ≤ 9. */
  def funnel(attribution: DataFrame, corpus: DataFrame): DataFrame =
    attribution.join(corpus.select(col("doc_id"),
        graft.functions.TextAnalysis.tokenCount(col("text")).cast("long")
          .as("__n")), "doc_id")
      .groupBy("cut_stage")
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_tokens"))

  /** The per-shard packing-efficiency report (see [[release]]): chunk
    * starts re-derive from the manifest through the same 3-pass global
    * running sum the packer used (identical (doc_id, chunk_idx) order
    * → identical cums), boundary straddles are exact integer window
    * tests, and the aggregate is one bounded groupBy(shard). */
  def packStats(manifest: DataFrame, packTokens: Int): DataFrame =
    Ops.withGlobalRunningSum(
        manifest.select(col("doc_id"), col("chunk_idx"),
          col("n_tokens"), col("pack_id"), col("shard_id")),
        Seq(col("doc_id"), col("chunk_idx")), col("doc_id"),
        col("n_tokens"), "__cum")
      .withColumn("__split",
        expr(s"(__cum - n_tokens) DIV $packTokens") =!=
          expr(s"(__cum - 1) DIV $packTokens") && col("n_tokens") > 0)
      .groupBy("shard_id")
      .agg(countDistinct("pack_id").as("n_packs"),
        count(lit(1)).as("n_chunks"),
        sum("n_tokens").as("n_tokens"),
        sum(when(col("__split"), 1L).otherwise(0L))
          .as("n_boundary_splits"))
      .withColumn("pad_tokens",
        col("n_packs") * packTokens - col("n_tokens"))
      .select("shard_id", "n_packs", "n_chunks", "n_tokens",
        "pad_tokens", "n_boundary_splits")
}
