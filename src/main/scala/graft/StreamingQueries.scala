package graft

import org.apache.spark.sql.functions._

import graft.streaming.{StreamingBoilerplate, StreamingDedup, StreamingDistill, StreamingIndexIngest, StreamingLmScore, StreamingShards, StreamingSync}

/** Capability registry, batch 4: Structured Streaming formulations of the
  * incremental-sync semantics (SURVEY §2.10). The streams run
  * synchronously (processAllAvailable) over the same parquet, so their
  * results are oracle-checkable against batch SQL.
  */
object StreamingQueries {

  /** The streamed capstones' budget-ledger ARRIVAL order, mirroring
    * [[graft.streaming.StreamingCorpusBuild.run]]'s default staging:
    * two staged files ([0, 500000) = base + structured plants, then
    * [500000, ∞) = whitespace twins + eval rewrites), so arrival tier
    * is a single ≥ 500000 split. Two files exercise every cross-batch
    * path the four-file staging did (later-batch twins dedup against
    * the index the earlier batch built; stream start + checkpoint
    * resume per file) — the extra files were one more full stream
    * start + gate pass each, across SEVEN registered capstone streams,
    * with no new semantics (round-15 gate-budget work). */
  private val arrivalTierOrder =
    "(CASE WHEN doc_id >= 500000 THEN 1 ELSE 0 END), hx, doc_id"

  /** Stateful streaming pays a fixed per-micro-batch cost per shuffle
    * partition (a state-store task with its checkpoint delta file,
    * whether or not any rows hash there), so streaming state width is
    * sized to expected STATE volume, not inherited from the batch
    * shuffle width — 32 batch partitions would mean 32 near-empty
    * state commits per batch at bench scale. In production you size
    * this to peak keys/executor once at first checkpoint (it is fixed
    * for the checkpoint's life); the queries here create a fresh
    * checkpoint per run, so the narrow width never pins a long-lived
    * deployment. */
  private def withStreamingConf[T](s: org.apache.spark.sql.SparkSession)(f: => T): T =
    // unlocked-body variant: f starts a stream and BLOCKS draining it,
    // and the micro-batch thread may take the session monitor (catalog
    // lazy init) — the locked variant would deadlock sr4 on a fresh
    // session. The width only matters at the query's own start anyway.
    graft.operators.Ops.withSessionConfUnlockedBody(s,
      Map("spark.sql.shuffle.partitions" -> "8"))(f)

  val defs: Seq[QueryDef] = Seq(

    // Streaming windowed aggregation == batch time_bucket aggregation.
    QueryDef("sr1_streaming_window",
      Some("""SELECT time_bucket(INTERVAL 1 HOUR, ts) AS w_start, event_type,
             |       count(*) AS n_events, round(sum(value), 2) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin),
      (s, dir) => withStreamingConf(s)(
        StreamingSync.runWindowedToMemory(s, dir))),

    // foreachBatch micro-batch merge reconstructs the full table
    // (pk-unique source ⇒ merge of all batches == source).
    QueryDef("sr2_streaming_merge",
      Some("""SELECT event_id, user_id, event_type, value, ts FROM events
             |ORDER BY event_id""".stripMargin),
      (s, dir) => withStreamingConf(s)(
        StreamingSync.runForeachBatchMerge(s, dir,
            "/tmp/graft_stream/" + dir.replaceAll("[^a-zA-Z0-9]", "_"))
          .orderBy("event_id"))),

    // Stateful streaming dedup (flatMapGroupsWithState): first event per
    // (user, type) across micro-batches == min event_id per group in
    // batch SQL, thanks to range-ordered staging.
    QueryDef("sr3_streaming_dedup_state",
      Some("""SELECT min(event_id) AS event_id, user_id, event_type
             |FROM events GROUP BY user_id, event_type
             |ORDER BY user_id, event_type""".stripMargin),
      (s, dir) => withStreamingConf(s)(
        StreamingDedup.run(s, dir,
          "/tmp/graft_dedup/" + dir.replaceAll("[^a-zA-Z0-9]", "_")))),

    // Continuous dedup-ingest: micro-batches of documents appended to
    // the persisted MinHash index as they arrive, then the finished
    // index probed with planted near-dups. Final index content is batch-
    // order independent, so the probe is deterministic. Rows-only (LSH
    // banding not SQL-expressible); one-shot parity in StreamingSpec.
    QueryDef("sr4_streaming_index_ingest", None,
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        StreamingIndexIngest.run(s, dir, s"/tmp/graft_ingest/$tag",
          s"graft_smh_$tag", s"/tmp/graft_ingest/$tag/idx")
      }),

    // The COMPOSED multi-gate ingest run as a stream — the reference's
    // cron loop (`partial-update.sh`) as a forever-sync: indexes
    // pre-seeded from the corpus, two staged micro-batches gated
    // exact → winnow → minhash, per-batch first-gate decisions
    // accumulated in an append sink. Decision set is batch-order
    // independent by construction (planted relationships never cross
    // batch files). Rows-only (LSH banding); batch-gate parity and
    // checkpoint recovery spec'd in StreamingSpec.
    QueryDef("sr5_streaming_gate", None,
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        StreamingIndexIngest.runGate(s, dir, s"/tmp/graft_sgate/$tag",
          s"graft_sgx_$tag", s"graft_sgw_$tag", s"graft_sgm_$tag",
          s"/tmp/graft_sgate/$tag/idx")
      }),

    // The EMBEDDING composed gate as a stream — sr5's twin with all
    // three vec slots live (exact-vec → SRP@0.9999 → IVF@0.999), each
    // cutting the planted class only it can: byte-copies, ×2-scaled
    // cosine-1.0 copies, exact rotations at cosine 0.9995 (between the
    // thresholds), sign-flip survivors. Rows-only (trained k-means);
    // batch parity + attribution + checkpoint recovery in StreamingSpec.
    QueryDef("sr6_streaming_vec_gate", None,
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        StreamingIndexIngest.runGateVec(s, dir, s"/tmp/graft_svgate/$tag",
          s"graft_svx_$tag", s"graft_svs_$tag", s"graft_svi_$tag",
          s"/tmp/graft_svgate/$tag/idx")
      }),

    // Stream-scored perplexity: bigram LM trained in batch on the 80%
    // slice, the held-out 20% scored micro-batch by micro-batch via
    // stream-static joins against the pinned model. Every doc arrives
    // whole, so the drained complete-mode table equals the batch scorer
    // row-for-row — FULLY oracle-checkable (same CTEs as
    // ext_lm_perplexity, minus the banding, which needs a global sort a
    // stream can't express).
    QueryDef("sr7_streaming_lm_score",
      Some(ExtensionQueries.lmOracle("doc_id % 10 < 8")),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        StreamingLmScore.run(s, dir, s"/tmp/graft_lmscore/$tag")
      }),

    // The persisted LM maintained AS a stream: train-slice micro-batches
    // append to the model table (built on the first, auto-compaction
    // live mid-stream), the finished model scores the held-out slice.
    // Counts are additive, so the final table is batch-order
    // independent and the stream checks against the one-shot-train SQL
    // — the second fully oracle-checked stream after sr7.
    QueryDef("sr8_streaming_lm_ingest",
      Some(ExtensionQueries.lmOracle("doc_id % 10 < 8")),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        StreamingIndexIngest.runLmIngest(s, dir, s"/tmp/graft_lmingest/$tag",
          s"graft_slm_$tag", s"/tmp/graft_lmingest/$tag/idx")
      }),

    // Continuous training-shard production: document micro-batches cut
    // into fixed 128-doc shards as they arrive — md5-order within a
    // batch, ranks continuing across batches from the sink's count.
    // The staged arrival order is a pure function of the data (batch k
    // = doc_id % 4, drained in k order), so this is the third FULLY
    // oracle-checked stream: the SQL replays per-batch md5 ranks plus
    // exclusive batch offsets. Restart/replay idempotency and batch-
    // spanning shard invariants are spec'd in StreamingSpec.
    QueryDef("sr9_streaming_shards",
      Some("""WITH b AS (
             |  SELECT doc_id, doc_id % 4 AS batch,
             |         md5(CAST(doc_id AS VARCHAR)) AS hx
             |  FROM documents),
             |r AS (
             |  SELECT doc_id, batch,
             |         row_number() OVER (PARTITION BY batch ORDER BY hx, doc_id) AS rnb
             |  FROM b),
             |n AS (SELECT batch, count(*) AS cnt FROM b GROUP BY 1),
             |o AS (
             |  SELECT batch,
             |         coalesce(CAST(sum(cnt) OVER (ORDER BY batch
             |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS off
             |  FROM n)
             |SELECT r.doc_id,
             |       CAST((r.rnb - 1 + o.off) // 128 AS BIGINT) AS shard_id
             |FROM r JOIN o ON r.batch = o.batch
             |ORDER BY r.doc_id""".stripMargin),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        StreamingShards.run(s, dir, s"/tmp/graft_sshards/$tag")
      }),

    // The CCNet curation pipeline as a forever-sync — lang-ID + quality
    // gates, a FROZEN perplexity cutoff (the ⌈2n/3⌉-th order statistic
    // of the train slice's own scores: production CCNet filters the
    // crawl against reference-corpus cutoffs, and an integer order
    // statistic is engine-exact where tercile banding is not), then
    // exact-dedup ingest against a persisted index pre-seeded with the
    // accepted corpus; survivors append, so later batches dedup against
    // everything accepted before them. The fourth fully oracle-checked
    // stream: parity-file arrival is a pure function of the data and
    // every planted dup pair shares a micro-batch.
    QueryDef("sr10_streaming_ccnet", {
      val hits = graft.functions.TextAnalysis.stopwords.map { case (lang, ws) =>
        s"len(list_filter(toks2, x -> list_contains([${ws.map("'" + _ + "'").mkString(",")}], x))) AS s_$lang"
      }.mkString(",\n       ")
      val langs = graft.functions.TextAnalysis.stopwords.map(_._1)
      val best = s"greatest(${langs.map("s_" + _).mkString(", ")})"
      val pick = langs.map(l => s"WHEN s_$l = $best THEN '$l'").mkString(" ")
      Some(s"""WITH corpus AS (
              |  SELECT doc_id, text FROM documents
              |  UNION ALL
              |  SELECT doc_id + 100000, ' ' || text || '  ' FROM documents WHERE doc_id % 10 = 8),
              |tok AS (
              |  SELECT doc_id,
              |    list_prepend('<s>',
              |      CASE WHEN regexp_replace(lower(text), '^\\s+|\\s+$$', '', 'g') = ''
              |           THEN CAST([] AS VARCHAR[])
              |           ELSE string_split_regex(
              |                  regexp_replace(lower(text), '^\\s+|\\s+$$', '', 'g'), '\\s+')
              |      END) AS toks
              |  FROM corpus),
              |big AS (
              |  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS bg, toks[i] AS prev
              |  FROM tok, unnest(range(1, len(toks))) AS r(i)),
              |bc AS (
              |  SELECT bg, count(*) AS cb FROM big WHERE doc_id % 10 < 8 GROUP BY 1),
              |cc AS (
              |  SELECT string_split(bg, ' ')[1] AS prev, CAST(sum(cb) AS BIGINT) AS cctx
              |  FROM bc GROUP BY 1),
              |v AS (
              |  SELECT count(DISTINCT t) + 1 AS vsize
              |  FROM (SELECT unnest(toks) AS t FROM tok WHERE doc_id % 10 < 8)),
              |scored AS (
              |  SELECT e.doc_id,
              |    CAST(floor(-log2((coalesce(bc.cb, 0) + 1.0) /
              |                     (coalesce(cc.cctx, 0) + v.vsize))
              |               * 1000.0 + 0.5) AS BIGINT) AS h_milli
              |  FROM big e
              |  LEFT JOIN bc ON e.bg = bc.bg
              |  LEFT JOIN cc ON e.prev = cc.prev
              |  CROSS JOIN v),
              |agg AS (
              |  SELECT doc_id,
              |    CAST(floor(CAST(sum(h_milli) AS BIGINT) * 1.0 / count(*) + 0.5) AS BIGINT)
              |      AS h_milli_tok
              |  FROM scored GROUP BY 1),
              |nt AS (SELECT count(*) AS n FROM agg WHERE doc_id % 10 < 8),
              |thr AS (
              |  SELECT max(h_milli_tok) AS cutoff FROM (
              |    SELECT h_milli_tok,
              |           row_number() OVER (ORDER BY h_milli_tok, doc_id) AS rn
              |    FROM agg WHERE doc_id % 10 < 8) r CROSS JOIN nt
              |  WHERE r.rn <= greatest(1, (2 * nt.n) // 3)),
              |t2 AS (
              |  SELECT doc_id, text,
              |    string_split_regex(trim(lower(text)), '\\s+') AS toks2
              |  FROM corpus),
              |s2 AS (
              |  SELECT doc_id,
              |    CAST(len(list_filter(toks2, x -> x <> '')) AS DOUBLE) AS n_toks,
              |    CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS n_alpha,
              |    CAST(length(text) AS DOUBLE) AS n_chars,
              |    CAST(len(list_filter(toks2,
              |      x -> list_contains(['the','and','of','to','a','in','is','it'], x))) AS DOUBLE)
              |      AS n_stop,
              |    $hits,
              |    array_to_string(toks2, ' ') AS c
              |  FROM t2),
              |feat AS (
              |  SELECT doc_id,
              |    CASE WHEN $best = 0 THEN 'und' $pick ELSE 'und' END AS lang_pred,
              |    floor((least(1.0, n_toks / 100.0) * 0.5
              |          + (CASE WHEN n_chars > 0 THEN n_alpha / n_chars ELSE 0.0 END) * 0.3
              |          + least(1.0, (CASE WHEN n_toks > 0 THEN n_stop / n_toks ELSE 0.0 END) * 4.0) * 0.2)
              |          * 10000.0 + 0.5) / 10000.0 AS quality,
              |    c
              |  FROM s2),
              |train_c AS (
              |  SELECT DISTINCT c FROM s2 WHERE doc_id % 10 < 8),
              |kept AS (
              |  SELECT f.doc_id, f.lang_pred, f.quality, a.h_milli_tok, f.c
              |  FROM feat f JOIN agg a ON f.doc_id = a.doc_id CROSS JOIN thr
              |  WHERE f.doc_id % 10 >= 8
              |    AND f.lang_pred = 'en' AND f.quality >= 0.45
              |    AND a.h_milli_tok <= thr.cutoff)
              |SELECT k.doc_id, k.lang_pred, k.quality, k.h_milli_tok
              |FROM kept k
              |WHERE NOT EXISTS (SELECT 1 FROM train_c t WHERE t.c = k.c)
              |  AND NOT EXISTS (SELECT 1 FROM kept k2
              |                  WHERE k2.c = k.c AND k2.doc_id < k.doc_id)
              |ORDER BY k.doc_id""".stripMargin)
    },
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingCuration.run(s, dir,
          s"/tmp/graft_sccnet/$tag", s"graft_scc_$tag",
          s"/tmp/graft_sccnet/$tag/idx")
      }),

    // The supervised probe maintained AS a stream (sr8's twin for the
    // linear model): each micro-batch appends its one-row integer
    // moment frame to a batch-keyed sink; the final fit solves over one
    // row per batch. Moments are additive and exact, so the stream is
    // batch-order independent and checks against the ONE-SHOT SQL —
    // the fifth fully oracle-checked stream. Replay idempotence
    // (duplicate batch rows in the sink) is spec'd in StreamingSpec.
    QueryDef("sr11_streaming_probe",
      ExtensionQueries.linearProbeOracle,
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingProbe.run(s, dir, s"/tmp/graft_sprobe/$tag")
      }),

    // The corpus-build capstone as a forever-sync (StreamingCorpusBuild):
    // curation gates per doc, exact-dedup ingest against a persisted
    // index (cross-batch probes, the production path), decontamination
    // against the frozen eval set, and a token-budget mixer whose
    // per-source spend continues across micro-batches from the sink's
    // ledger. The oracle is the SAME chained SQL as ext_corpus_build
    // with ONE change: the budget window spends in ARRIVAL order
    // (range bucket, then md5) — id-range staging makes arrival a pure
    // function of the data, which is what keeps the stream's ledger
    // replayable in SQL. Replay and resume drills in StreamingSpec.
    QueryDef("sr12_streaming_corpus",
      Some(ExtensionQueries.corpusBuildCtes(budgetOrder =
          arrivalTierOrder) + "\n" +
        """SELECT a.doc_id,
          |  CASE WHEN a.cut_stage <> 'kept' THEN a.cut_stage
          |       WHEN a.doc_id IN (SELECT doc_id FROM contam) THEN 'decon'
          |       ELSE fn.cut_stage END AS cut_stage
          |FROM attributed a LEFT JOIN final fn ON a.doc_id = fn.doc_id
          |ORDER BY a.doc_id""".stripMargin),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val (corpus, evals, budgets) =
          ExtensionQueries.corpusBuildFixture(s, dir)
        graft.streaming.StreamingCorpusBuild.run(s, corpus, evals, budgets,
          s"/tmp/graft_scorpus/$tag", s"graft_scb_$tag",
          s"/tmp/graft_scorpus/$tag/idx")
      }),

    // The streamed capstone with the LEARNED mixture: DoReMi weights
    // fit batch-side over the reference corpus (the sr17 pinned-model
    // stance — a forever-sync freezes its mixture per release window)
    // and their budgets drive the stream's per-source spend ledger.
    // Same dm_ weight CTEs as the batch ext_corpus_build_doremi, with
    // the budget window in ARRIVAL order.
    QueryDef("sr26_streaming_corpus_doremi",
      Some(ExtensionQueries.corpusBuildCtes(budgetOrder =
          arrivalTierOrder,
          budgetCte = Some(
            SelectionQueries.doremiWeightCtes(5, 200000L, 100000L,
              docsRel = "corpus") + ",\n" +
            "w(source, budget) AS (SELECT source, (w * 2000) // 1000000 AS budget FROM dm_w5)")) +
        "\n" +
        """SELECT a.doc_id,
          |  CASE WHEN a.cut_stage <> 'kept' THEN a.cut_stage
          |       WHEN a.doc_id IN (SELECT doc_id FROM contam) THEN 'decon'
          |       ELSE fn.cut_stage END AS cut_stage
          |FROM attributed a LEFT JOIN final fn ON a.doc_id = fn.doc_id
          |ORDER BY a.doc_id""".stripMargin),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val (corpus, evals, _) =
          ExtensionQueries.corpusBuildFixture(s, dir)
        // tight 2k pool — see ext_corpus_build_doremi: the ledger must
        // actually cut for the arrival-order spend to be value-checked.
        // The fit is passed BY-NAME: run() resolves it on a background
        // thread while the stream scaffolding sets up (§2.6).
        graft.streaming.StreamingCorpusBuild.run(s, corpus, evals,
          graft.operators.Doremi.budgets(
            graft.operators.Doremi.weights(corpus), 2000L),
          s"/tmp/graft_scorpus_dm/$tag", s"graft_scbdm_$tag",
          s"/tmp/graft_scorpus_dm/$tag/idx")
      }),

    // Continuous mixture-model maintenance: micro-batches append into
    // the persisted DoReMi count table (keyed replay-exactly-once
    // lifecycle), weights re-derive from the table alone at stream end.
    // Counts are additive, so the stream equals a one-shot fit over the
    // same slice — the token-level serving oracle, fully hash-checked.
    QueryDef("sr27_streaming_doremi_ingest",
      Some(SelectionQueries.doremiTokenWeightsSql(5, 200000L, 100000L,
        docsRel = "(SELECT * FROM documents WHERE doc_id % 10 < 8) d8")),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        StreamingIndexIngest.runDoremiIngest(s, dir,
          s"/tmp/graft_dmingest/$tag", s"graft_sdm_$tag",
          s"/tmp/graft_dmingest/$tag/idx")
      }),

    // Continuous maintenance MONITORING: the doremi ingest with the
    // index-fleet health row captured after every micro-batch — the
    // live time series of the is-maintenance-keeping-up glance.
    // Rows-only (table properties / file listings are not
    // DuckDB-visible); the clock-resets / monotonicity invariants are
    // drilled in StreamingSpec.
    QueryDef("sr30_streaming_index_health", None,
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        StreamingIndexIngest.runDoremiIngestMonitored(s, dir,
          s"/tmp/graft_dmhealth/$tag", s"graft_sdmh_$tag",
          s"/tmp/graft_dmhealth/$tag/idx")
      }),

    // Sketch-store forever-sync: per-lang HLL registers max-merged per
    // micro-batch (O(batch) scan + a ≤ m-row append — per-batch cost
    // pinned regardless of how long the stream has run). The oracle is
    // the DIRECT one-shot sketch of the whole corpus: equality is the
    // max algebra's batch-slicing invariance, value-checked register
    // by register.
    QueryDef("sr31_streaming_hll",
      Some(SketchQueries.langRegistersOracleSql),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        StreamingIndexIngest.runHllIngest(s, dir,
          s"/tmp/graft_hllingest/$tag", s"graft_shll_$tag",
          s"/tmp/graft_hllingest/$tag/idx")
      }),

    // The distilled quality gate as a forever-sync: weights fit
    // batch-side (nightly-fit stance), every micro-batch scored under
    // the weight LITERAL — a stateless zero-shuffle projection per
    // batch, the cheapest serving shape a gate can have. Whole docs per
    // file ⇒ the appended table equals the batch gate row-for-row,
    // which is the oracle's check.
    QueryDef("sr32_streaming_distill",
      Some(DistillQueries.gateOracleSql),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        StreamingDistill.run(s, dir, s"/tmp/graft_distill/$tag")
      }),

    // sr32's amortized twin: the gate hydrates its weights from the
    // persisted distill index (built here for the drill; production
    // builds nightly) — per-launch model load is one bounded table
    // read instead of four corpus-scanning GD steps. Same oracle:
    // the serving path must be value-invisible.
    QueryDef("sr33_streaming_distill_idx",
      Some(DistillQueries.gateOracleSql),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        StreamingDistill.runFromIndex(s, dir,
          s"/tmp/graft_distill_idx/$tag", s"graft_sdst_$tag")
      }),

    // Frequency-sketch-store forever-sync: per-source Count-Min
    // registers summed per micro-batch. Same pinned per-batch cost
    // shape as sr31, but the registers are additive, so every append
    // rides the stream's batch id through the keyed replay discipline
    // (a replayed batch cannot double-count — drills in
    // IndexStoreSpec). The oracle is the direct one-shot per-source
    // sketch of the whole corpus, value-checked register by register.
    QueryDef("sr34_streaming_cms",
      Some(SketchQueries.sourceCmsRegistersOracleSql),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        StreamingIndexIngest.runCmsIngest(s, dir,
          s"/tmp/graft_cmsingest/$tag", s"graft_scms_$tag",
          s"/tmp/graft_cmsingest/$tag/idx")
      }),

    // The histogram store maintained as a stream: per-source
    // token-length registers summed per micro-batch under the keyed
    // replay discipline (sr34's argument verbatim), cutoffs then
    // servable from the bounded table at any time with zero corpus
    // reads. Oracle: the direct one-shot per-source histogram.
    QueryDef("sr36_streaming_qhist",
      Some(SketchQueries.sourceQhistRegistersOracleSql),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        StreamingIndexIngest.runQhistIngest(s, dir,
          s"/tmp/graft_qhingest/$tag", s"graft_sqh_$tag",
          s"/tmp/graft_qhingest/$tag/idx")
      }),

    // Streaming CLUSTER MAINTENANCE — the clustering family's
    // forever-sync: each micro-batch probes the growing MinHash index
    // for cross-batch near-dup edges, collapses labeled endpoints to
    // their current components, runs connected components on the
    // batch-bounded touched graph, and lands one labels delta plus a
    // flat remap snapshot (never a history rewrite). The maintained
    // labels serve the streamed soft-dedup and cluster-split decisions
    // (cluster_size as aggregate+join). Rows-only (banded LSH, the
    // ext_soft_dedup_e2e stance); batch parity — labels after N
    // batches ≡ one-shot components over the union — and the crash/
    // replay drill are pinned in StreamingSpec.
    QueryDef("sr37_streaming_clusters", None,
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingClusters.run(s, dir,
          s"/tmp/graft_sclusters/$tag", s"graft_scl_$tag",
          s"/tmp/graft_sclusters/$tag/idx")
      }),

    // The authority store maintained as a stream: per-batch
    // (source, shingle) distinct-doc counts appended under the keyed
    // replay discipline, fixed-point PageRank source ranks then served
    // from the bounded folded edge list at any time with zero corpus
    // reads. VALUE-oracle'd: the integer ranks make even the streamed
    // graph family hash-checkable against the one-shot SQL.
    QueryDef("sr38_streaming_authority",
      Some(GraphQueries.authorityOracleSql),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        StreamingIndexIngest.runAuthorityIngest(s, dir,
          s"/tmp/graft_authingest/$tag", s"graft_sauth_$tag",
          s"/tmp/graft_authingest/$tag/idx")
      }),

    // The sketch composed into a streamed CLEANER: boilerplate-line
    // removal per micro-batch against the FROZEN persisted Count-Min
    // store (nightly-sketch stance — register table and threshold
    // built batch-side, per-batch gating is depth broadcast joins).
    // Docs arrive whole and the sketch never moves mid-stream, so the
    // appended sink equals the batch clean row-for-row — the same
    // oracle as ext_boilerplate_cms.
    QueryDef("sr35_streaming_boilerplate",
      Some(SketchQueries.boilerplateCmsOracleSql),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        StreamingBoilerplate.run(s, dir,
          s"/tmp/graft_boiler/$tag", s"graft_sboil_$tag")
      }),

    // The streamed capstone WITH the selection stage: the DSIR model is
    // fitted batch-side over the reference corpus's post-decon
    // survivors (frozen-cutoff stance; production reads the persisted
    // DSIR index) and gates every micro-batch between decon and the
    // budget ledger. Same withDsir oracle CTEs as the batch
    // ext_corpus_build_dsir, with the budget window in ARRIVAL order.
    QueryDef("sr17_streaming_corpus_dsir",
      Some(ExtensionQueries.corpusBuildCtes(budgetOrder =
          arrivalTierOrder,
          withDsir = true) + "\n" +
        """SELECT a.doc_id,
          |  CASE WHEN a.cut_stage <> 'kept' THEN a.cut_stage
          |       WHEN a.doc_id IN (SELECT doc_id FROM contam) THEN 'decon'
          |       WHEN a.doc_id IN (SELECT doc_id FROM dsircut) THEN 'dsir'
          |       ELSE fn.cut_stage END AS cut_stage
          |FROM attributed a LEFT JOIN final fn ON a.doc_id = fn.doc_id
          |ORDER BY a.doc_id""".stripMargin),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val (corpus, evals, budgets) =
          ExtensionQueries.corpusBuildFixture(s, dir)
        // fit expression passed BY-NAME: run() resolves it on a
        // background thread while the stream scaffolding sets up (§2.6)
        graft.streaming.StreamingCorpusBuild.run(s, corpus, evals, budgets,
          s"/tmp/graft_scorpusd/$tag", s"graft_scbd_$tag",
          s"/tmp/graft_scorpusd/$tag/idx",
          dsir = Some(graft.streaming.StreamingCorpusBuild
            .pinnedDsirFromCorpus(corpus, evals, 10, "src0")))
      }),

    // sr17's PRODUCTION hydration path: the pinned DSIR model comes
    // from the PERSISTED index (IndexStore.buildDsirIndex over the same
    // post-decon split — the nightly-amortized fit production appends
    // to) instead of a per-run batch-side refit. Same oracle SQL as
    // sr17: both paths re-hydrate through Dsir.modelFromCounts over
    // identical per-bucket counts, so the streamed decisions are
    // bit-identical — the ARCHITECTURE claim, now hash-proven.
    QueryDef("sr20_streaming_corpus_dsir_idx",
      Some(ExtensionQueries.corpusBuildCtes(budgetOrder =
          arrivalTierOrder,
          withDsir = true) + "\n" +
        """SELECT a.doc_id,
          |  CASE WHEN a.cut_stage <> 'kept' THEN a.cut_stage
          |       WHEN a.doc_id IN (SELECT doc_id FROM contam) THEN 'decon'
          |       WHEN a.doc_id IN (SELECT doc_id FROM dsircut) THEN 'dsir'
          |       ELSE fn.cut_stage END AS cut_stage
          |FROM attributed a LEFT JOIN final fn ON a.doc_id = fn.doc_id
          |ORDER BY a.doc_id""".stripMargin),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val (corpus, evals, budgets) =
          ExtensionQueries.corpusBuildFixture(s, dir)
        // index build + hydration passed BY-NAME: run() resolves the
        // whole chain on a background thread while the stream
        // scaffolding sets up (§2.6); its tables (_counts) are disjoint
        // from run's (_fps), so the DDL never races
        graft.streaming.StreamingCorpusBuild.run(s, corpus, evals, budgets,
          s"/tmp/graft_scorpusdx/$tag", s"graft_scbdx_$tag",
          s"/tmp/graft_scorpusdx/$tag/idx",
          dsir = {
            val (target, raw) = graft.streaming.StreamingCorpusBuild
              .postDeconSplit(corpus, evals, 10, "src0")
            s.sql(s"DROP TABLE IF EXISTS graft_scbdx_${tag}_counts")
            graft.operators.IndexStore.buildDsirIndex(target, raw,
              "doc_id", "text", s"graft_scbdx_$tag",
              s"/tmp/graft_scorpusdx/$tag/dsiridx")
            Some(graft.streaming.StreamingCorpusBuild
              .pinnedDsirFromIndex(s, s"graft_scbdx_$tag", "src0"))
          })
      }),

    // sr26's PRODUCTION hydration path: the frozen mixture comes from
    // the PERSISTED DoReMi index (built once over the reference
    // corpus; appends amortize the corpus pass) instead of a per-run
    // batch-side fit. Serving semantics are token-level, so the
    // oracle's budget chain swaps in the token CTEs — the streamed
    // ledger then pays the index-served budgets out in arrival order.
    QueryDef("sr28_streaming_corpus_doremi_idx",
      Some(ExtensionQueries.corpusBuildCtes(budgetOrder =
          arrivalTierOrder,
          budgetCte = Some(
            SelectionQueries.doremiTokenWeightCtes(5, 200000L, 100000L,
              docsRel = "corpus") + ",\n" +
            "w(source, budget) AS (SELECT source, (w * 2000) // 1000000 AS budget FROM dm_w5)")) +
        "\n" +
        """SELECT a.doc_id,
          |  CASE WHEN a.cut_stage <> 'kept' THEN a.cut_stage
          |       WHEN a.doc_id IN (SELECT doc_id FROM contam) THEN 'decon'
          |       ELSE fn.cut_stage END AS cut_stage
          |FROM attributed a LEFT JOIN final fn ON a.doc_id = fn.doc_id
          |ORDER BY a.doc_id""".stripMargin),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val (corpus, evals, _) =
          ExtensionQueries.corpusBuildFixture(s, dir)
        val tbl = s"graft_scbdmx_$tag"
        // index build + re-weighting passed BY-NAME: run() resolves the
        // chain on a background thread while the stream scaffolding
        // sets up (§2.6); the _dmc table is disjoint from run's _fps
        graft.streaming.StreamingCorpusBuild.run(s, corpus, evals,
          {
            s.sql(s"DROP TABLE IF EXISTS ${tbl}_dmc")
            graft.operators.IndexStore.buildDoremiIndex(corpus, "doc_id",
              "source", "text", tbl, s"/tmp/graft_scorpus_dmx/$tag/dmidx")
            graft.operators.Doremi.budgets(
              graft.operators.IndexStore.doremiWeightsFromIndex(s, tbl),
              2000L)
          }, s"/tmp/graft_scorpus_dmx/$tag", tbl,
          s"/tmp/graft_scorpus_dmx/$tag/idx")
      }),

    // The quarantine-staged curation as a forever-sync: charset triage
    // at stage zero of every micro-batch, the FineWeb gates as one
    // projection, survivors dedup'd against an exact index pre-seeded
    // with the lake (nothing seen before is ever re-accepted) with the
    // BatchManifest replay protocol. Fully oracle-checked: staged
    // arrival order equals id order, so the stream's first-arriving
    // keeper IS the oracle's min-id keeper; the index preseed makes
    // 'dedup' for any doc whose fingerprint the lake already holds.
    QueryDef("sr29_streaming_quarantine",
      Some(s"""WITH base AS (
              |  SELECT doc_id, text FROM documents WHERE doc_id % 10 < 8),
              |crawl AS (
              |  SELECT doc_id, text FROM documents WHERE doc_id % 10 >= 8
              |  UNION ALL
              |  SELECT doc_id + 100000, ' ' || text || '  '
              |  FROM documents WHERE doc_id % 10 = 8
              |  UNION ALL
              |  SELECT doc_id + 200000, ' ' || text || ' '
              |  FROM documents WHERE doc_id % 10 = 2
              |  UNION ALL
              |  SELECT doc_id + 700000,
              |    '- item one' || chr(10) || '- item two' || chr(10) || text ||
              |    ' to of and that have with.' || chr(10) ||
              |    'Good sentence with many words written here.' || chr(10) ||
              |    'this short line mentions javascript libraries.' || chr(10) ||
              |    'Trailing thought...' || chr(10) ||
              |    'Another proper sentence ends with five words.' || chr(1)
              |  FROM documents WHERE doc_id % 10 = 9),
              |bfp AS (
              |  SELECT DISTINCT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
              |  FROM base),
              |${ExtensionQueries.quarantineStageCtes("crawl")},
              |keepers AS (
              |  SELECT fingerprint, min(doc_id) AS keeper_id
              |  FROM staged
              |  WHERE stage = 'survivor'
              |    AND fingerprint NOT IN (SELECT fingerprint FROM bfp)
              |  GROUP BY 1)
              |SELECT s.doc_id,
              |  CASE WHEN s.stage <> 'survivor' THEN s.stage
              |       WHEN s.fingerprint IN (SELECT fingerprint FROM bfp) THEN 'dedup'
              |       WHEN s.doc_id = k.keeper_id THEN 'kept'
              |       ELSE 'dedup' END AS cut_stage
              |FROM staged s LEFT JOIN keepers k ON s.fingerprint = k.fingerprint
              |ORDER BY s.doc_id""".stripMargin),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingQuarantineCuration.run(s, dir,
          s"/tmp/graft_squar/$tag", s"graft_squar_$tag",
          s"/tmp/graft_squar/$tag/idx")
      }),

    // SemDeDup as a forever-sync (StreamingSemDedup): pinned centroids,
    // within-batch kernel + cross-batch near-dup check against the SEEN
    // cluster members (keepers or not — the batch rule), keepers append.
    // Rows-only (trained-quantizer cosine ties are not SQL-portable);
    // exact parity with the batch kernel over the same corpus, plus the
    // replay drill, are in StreamingSpec.
    QueryDef("sr13_streaming_semdedup", None,
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingSemDedup.run(s, dir,
          s"/tmp/graft_ssemded/$tag")
      }),

    // Paragraph-level dedup as a forever-sync (StreamingParagraphDedup):
    // each batch's lines check within the batch and against the
    // persisted LINE-fingerprint index (the exact IndexStore kind
    // reused on (doc·10⁶+line, para) rows); cleaned docs append.
    // Oracle'd — id-range staging makes the first-arriving line keeper
    // the global min-(doc,line) keeper, so the stream checks against
    // the SAME SQL as ext_paragraph_dedup, verbatim.
    QueryDef("sr14_streaming_paragraph_dedup",
      Some(ExtensionQueries.paragraphDedupOracleSql),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingParagraphDedup.run(s, dir,
          s"/tmp/graft_sparaded/$tag", s"graft_spd_$tag",
          s"/tmp/graft_sparaded/$tag/idx")
      }),

    // DSIR steering as a stream: the importance model fits once in
    // batch (pinned ratio table), the raw slice scores as it lands and
    // gates on w_milli > 0 — keep what looks more target than crawl.
    // Docs arrive whole and scoring is stateless per feature, so the
    // drained table equals the batch scorer row-for-row: the same
    // chained SQL as ext_dsir_weights plus the gate (a featureless doc
    // emits no stream row, and the w_milli > 0 gate excludes its
    // zero-weight oracle row the same way).
    QueryDef("sr15_streaming_dsir",
      Some(SelectionQueries.dsirFeatureSql +
        """SELECT doc_id, n_feats, w_milli FROM w
          |WHERE w_milli > 0 ORDER BY doc_id""".stripMargin),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingDsir.run(s, dir, s"/tmp/graft_sdsir/$tag")
      }),

    // Gate-drift monitoring as a stream: every micro-batch's
    // independent verdict-combination counts land keyed by arrival
    // batch — the dashboard that catches a crawl-mix shift before the
    // composed kept-rate moves. Batch counts are a pure function of
    // the batch's rows (overwrite-mode per-batch dirs, replay
    // idempotent), and arrival is the doc_id residue — fully
    // SQL-replayable.
    QueryDef("sr19_streaming_venn",
      Some("WITH " + ExtensionQueries.gateFlagsCtes("documents") + "\n" +
        """SELECT CAST(doc_id % 4 AS INT) AS batch_res,
          |  lang_en, c4_ok, gopher_pass,
          |  CAST(count(*) AS BIGINT) AS n_docs
          |FROM flags
          |GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4""".stripMargin),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingVenn.run(s, dir, s"/tmp/graft_svenn/$tag")
      }),

    // No-truncation packing as a forever-sync: per-batch segmented FFD
    // with bin numbering continued from the committed sink (the
    // StreamingShards manifest protocol verbatim — atomic per-batch
    // commits, replay overwrites wholesale). Bins close at batch end:
    // the bounded-padding trade for stateless batches. FFD is not
    // SQL-expressible → rows-only; invariants + replay drill in
    // StreamingSpec.
    QueryDef("sr18_streaming_packing", None,
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingPacking
          .run(s, dir, s"/tmp/graft_spack/$tag")
          .groupBy("bin_id")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
          .orderBy("bin_id")
      }),

    // The streamed capstone WITH the ExactSubstr span-clean stage: the
    // shingle-DF index (ninth persisted kind) is built batch-side over
    // the reference corpus's POST-DECON survivors — so its hot set
    // equals the batch ext_corpus_build_spanclean's measured-within-
    // survivors set exactly — and every micro-batch's survivors clean
    // against it between decon and the budget ledger, which counts
    // CLEANED tokens (quarter budgets, the decision-relevance
    // tightening). Same CTEs as the batch spanclean build with the
    // budget window in ARRIVAL order.
    QueryDef("sr23_streaming_corpus_spanclean",
      Some(ExtensionQueries.corpusBuildCtes(budgetOrder =
          arrivalTierOrder,
          withSpanClean = true, budgetDiv = 4) + "\n" +
        """SELECT a.doc_id,
          |  CASE WHEN a.cut_stage <> 'kept' THEN a.cut_stage
          |       WHEN a.doc_id IN (SELECT doc_id FROM contam) THEN 'decon'
          |       WHEN a.doc_id IN (SELECT doc_id FROM spancut) THEN 'spanclean'
          |       ELSE fn.cut_stage END AS cut_stage
          |FROM attributed a LEFT JOIN final fn ON a.doc_id = fn.doc_id
          |ORDER BY a.doc_id""".stripMargin),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val (corpus, evals, budgets) =
          ExtensionQueries.corpusBuildFixture(s, dir)
        val surv = graft.streaming.StreamingCorpusBuild
          .postDeconSurvivors(corpus, evals, 10)
        s.sql(s"DROP TABLE IF EXISTS graft_scbsp_${tag}_sdf")
        graft.operators.IndexStore.buildSpanIndex(
          surv.select("doc_id", "text"), "doc_id", "text",
          s"graft_scbsp_$tag", s"/tmp/graft_scorpuss/$tag/sdfidx")
        graft.streaming.StreamingCorpusBuild.run(s, corpus, evals,
          budgets.select(col("source"),
            (col("budget") / 4).cast("long").as("budget")),
          s"/tmp/graft_scorpuss/$tag", s"graft_scbs_$tag",
          s"/tmp/graft_scorpuss/$tag/idx",
          spanTable = Some(s"graft_scbsp_$tag"))
      }),

    // The forever-sync emitting TRAINER-READY packs: the streamed
    // corpus build (sr12) chained into the streamed FFD packer (sr18)
    // inside one micro-batch transaction — each batch's KEPT docs pack
    // into fixed-budget bins, bin numbering continued via the same
    // atomic manifest that carries the budget ledger. The pack
    // COVERAGE is fully oracle-checked (every packed doc is a
    // budget-window survivor with its exact token count, and nothing
    // else); bin geometry is FFD (not SQL-expressible) — overflow/
    // exactly-once/density/replay invariants are spec'd in
    // StreamingSpec.
    QueryDef("sr21_streaming_corpus_pack",
      Some(ExtensionQueries.corpusBuildCtes(budgetOrder =
          arrivalTierOrder) + "\n" +
        """SELECT bc.doc_id, bc.n AS n_tokens
          |FROM bc JOIN w ON bc.source = w.source
          |WHERE bc.cum <= w.budget
          |ORDER BY bc.doc_id""".stripMargin),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        val (corpus, evals, budgets) =
          ExtensionQueries.corpusBuildFixture(s, dir)
        graft.streaming.StreamingCorpusBuild.run(s, corpus, evals, budgets,
          s"/tmp/graft_scpack/$tag", s"graft_scp_$tag",
          s"/tmp/graft_scpack/$tag/idx", packBinSize = Some(256L))
        graft.streaming.StreamingCorpusBuild
          .readPacks(s, s"/tmp/graft_scpack/$tag/sink")
          .select("doc_id", "n_tokens").orderBy("doc_id")
      }),

    // Cross-document span removal as a forever-sync: the shingle-DF
    // index (ninth persisted kind) is built once over the reference
    // corpus, arriving docs clean against it statelessly — each batch's
    // shingles probe the bucketed table in place, the span merge
    // windows per doc. Drained sink ≡ batch cleaner row-for-row: the
    // SAME SQL as ext_crossdoc_clean. Replay drill in StreamingSpec.
    QueryDef("sr22_streaming_crossdoc",
      Some(ExtensionQueries.crossDocCleanOracleSql),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingCrossDoc.run(s, dir,
          s"/tmp/graft_scrossdoc/$tag", s"graft_scd_$tag",
          s"/tmp/graft_scrossdoc/$tag/idx")
      }),

    // The PQ code store maintained AS a stream (the tenth kind's sr4
    // twin): codebooks train on the first micro-batch (frozen-book
    // stance — retraining would orphan stored codes), later batches
    // encode-and-append frozen, and the finished store answers ADC
    // top-1 for ×2-scaled copies of the whole corpus. Rows-only
    // (Lloyd training); every-copy-resolves + one-shot-parity bounds
    // in StreamingSpec.
    QueryDef("sr24_streaming_pq_ingest", None,
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        StreamingIndexIngest.runPq(s, dir, s"/tmp/graft_spq/$tag",
          s"graft_spq_$tag", s"/tmp/graft_spq/$tag/idx")
      }),

    // The exact dedup gate as an ACCELERATED forever-sync: every
    // micro-batch appends the fingerprint index and ORs its batch
    // filter into the persisted Bloom sidecar (both O(batch)), so the
    // finished store answers planted whitespace twins through the
    // broadcast-local bit test before the index join ever runs —
    // value-identical to the plain probe, which is what the oracle's
    // normalized-text join checks. Stamp-protocol crash drills in
    // BloomGateSpec; stream parity + live-prefilter assertion in
    // StreamingSpec.
    QueryDef("sr25_streaming_bloom_gate",
      Some("""WITH norm AS (
        |  SELECT doc_id,
        |    array_to_string(string_split_regex(trim(lower(text)), '\s+'), ' ') AS c
        |  FROM documents),
        |q AS (
        |  SELECT doc_id + 900000 AS query_id, c FROM norm WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 950000, c || ' zmod' FROM norm WHERE doc_id % 5 = 2)
        |SELECT q.query_id, n.doc_id AS match_id
        |FROM q JOIN norm n ON q.c = n.c
        |ORDER BY query_id, match_id""".stripMargin),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        StreamingIndexIngest.runExactBloomed(s, dir,
          s"/tmp/graft_sbloom/$tag", s"graft_sbloom_$tag",
          s"/tmp/graft_sbloom/$tag/idx")
      }),

    // Prototype pruning as a stream: centroids + the ⌈n/5⌉ cutoff are
    // fitted once in batch (the frozen-cutoff discipline — sr10's
    // pinned reference-corpus statistics), then embeddings gate as they
    // land through one zero-exchange projection. Stateless per row, so
    // the drained table IS the batch prune: same oracle verbatim.
    QueryDef("sr16_streaming_prototype",
      Some(SelectionQueries.prototypePruneOracleSql),
      (s, dir) => withStreamingConf(s) {
        val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
        graft.streaming.StreamingPrototype.run(s, dir, s"/tmp/graft_sproto/$tag")
      }))
}
