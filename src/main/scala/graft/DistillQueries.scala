package graft

import org.apache.spark.sql.functions._

import graft.operators.{Distill, Ops, QualityRules}

/** Capability registry, batch 9: LEARNED gating — the rule suites
  * (Gopher/C4/FineWeb) distilled into a linear scorer whose training
  * run itself is engine-portable integer arithmetic, so the DuckDB
  * oracle replays gradient descent step for step and hash-checks the
  * WEIGHTS, not just the verdicts. The production story is the
  * fastText-classifier stance: the teacher rules are interpretable but
  * per-rule tuned; the student gives one dense score a pipeline can
  * threshold, calibrate, and serve as a zero-shuffle projection.
  *
  * Fixture: the filter-Venn corpus convention — raw documents (which
  * fail the Gopher composite) plus structured variants of every third
  * doc (which pass), giving the teacher a 25/75 class split the
  * student must reproduce.
  */
object DistillQueries {
  import Tables.load

  private val structuredVariantSql =
    """'- item one' || chr(10) || '- item two' || chr(10) || text ||
      |    ' to of and that have with.' || chr(10) ||
      |    'Good sentence with many words written here.' || chr(10) ||
      |    'this short line mentions javascript libraries.' || chr(10) ||
      |    'Trailing thought...' || chr(10) ||
      |    'Another proper sentence ends with five words.'""".stripMargin

  /** Shared oracle prelude: the labeled corpus (`lab`), the presence
    * features (`fxg`), and the full GD chain to the final weight CTE. */
  private[graft] val fitPreludeSql: String = {
    val (fitBase, _) = Distill.fitCtes()
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 300000,
       |    $structuredVariantSql
       |  FROM documents WHERE doc_id % 3 = 0),
       |${ExtensionQueries.gateFlagsCtes("corpus")},
       |lab AS (SELECT doc_id, gopher_pass AS y FROM flags),
       |${Distill.featureSql("corpus")},
       |$fitBase,
       |""".stripMargin
  }

  private[graft] val finalWeights: String = Distill.fitCtes()._2

  /** Scored-corpus CTE over the final weights — shared by the gate
    * query, the agreement report, and the streaming twin (sr32). */
  private[graft] val gateOracleSql: String =
    fitPreludeSql +
      s"""zf AS (
         |  SELECT f.doc_id, CAST(1000 * sum(w.w) AS BIGINT) AS z_micro
         |  FROM fxg f JOIN $finalWeights w USING (bucket) GROUP BY 1)
         |SELECT l.doc_id, z.z_micro,
         |  CAST(z.z_micro >= 0 AS INT) AS student_pass,
         |  l.y AS teacher_pass
         |FROM lab l JOIN zf z USING (doc_id)
         |ORDER BY l.doc_id""".stripMargin

  /** Spark side of the shared fixture: one corpus scan computing the
    * feature array AND the teacher verdict in the same projection,
    * pinned — the fit rescans it once per GD step and the scorer once
    * more, and an unpinned plan would re-run the corpus build each
    * time. */
  /** The fixture corpus (raw docs + passing structured variants) —
    * shared with the streaming twin's staged source. */
  private[graft] def corpusOf(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val d = load(s, dir, "documents").select("doc_id", "text")
    d.unionByName(d.where(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 300000).as("doc_id"),
        ExtensionQueries.structuredVariant(col("text")).as("text")))
  }

  private[graft] def labeledFeatures(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val corpus = corpusOf(s, dir)
    Ops.checkpointKeepPartitioning(
      corpus.select(col("doc_id"),
        Distill.featureBuckets(col("text")).as("buckets"),
        QualityRules.gopherPassColumn(col("text")).cast("int").as("y")))
  }

  val defs: Seq[QueryDef] = Seq(

    // The fitted weight table itself, hash-checked: DuckDB replays all
    // four full-batch GD steps in integer/IEEE-pinned arithmetic and
    // must land on bit-identical weights. This is the strongest claim
    // in the batch — not "the model predicts similarly" but "the
    // TRAINING RUN is deterministic and engine-portable".
    QueryDef("ext_distill_weights",
      Some(fitPreludeSql +
        s"""sel AS (SELECT bucket, w FROM $finalWeights)
           |SELECT bucket, w FROM sel ORDER BY bucket""".stripMargin),
      (s, dir) => {
        val lf = labeledFeatures(s, dir)
        Distill.weightsFrame(s, Distill.fit(lf, "buckets", "y"))
          .orderBy("bucket")
      }),

    // Per-doc student verdicts next to the teacher's — the score is a
    // zero-shuffle projection under a broadcast weight literal
    // (plan-pinned in DistillSpec).
    QueryDef("ext_distill_gate",
      Some(gateOracleSql),
      (s, dir) => {
        val lf = labeledFeatures(s, dir)
        Distill.score(lf, "buckets", Distill.fit(lf, "buckets", "y"))
          .select(col("doc_id"), col("z_micro"), col("student_pass"),
            col("y").as("teacher_pass"))
          .orderBy("doc_id")
      }),

    // The nightly-fit production path: weights persisted as the
    // thirteenth index kind (refit-only — GD has no mergeable count
    // table to append to; the artifact IS the bounded weight table,
    // swapped atomically), hydrated back and served. Same oracle as
    // the inline gate: persistence must be value-invisible.
    QueryDef("ext_distill_persisted",
      Some(gateOracleSql),
      (s, dir) => {
        val tbl = "graft_dstp_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
        val lf = labeledFeatures(s, dir)
        graft.operators.IndexStore.buildDistillIndex(lf, "buckets", "y",
          tbl, s"/tmp/graft_index/$tbl")
        graft.operators.IndexStore.scoreFromDistillIndex(s, tbl, lf,
            "buckets")
          .select(col("doc_id"), col("z_micro"), col("student_pass"),
            col("y").as("teacher_pass"))
          .orderBy("doc_id")
      }),

    // Calibration/reliability table — the threshold-tuning artifact: z
    // deciles (exact global ntile via the 3-pass prefix, no
    // single-task sort) against the teacher's pass rate per decile. A
    // monotone table means the score RANKS quality even where the
    // 0-threshold verdict disagrees, which is what lets an operator
    // trade recall for precision by moving the cut.
    QueryDef("ext_distill_calibration",
      Some(fitPreludeSql +
        s"""zf AS (
           |  SELECT f.doc_id, CAST(1000 * sum(w.w) AS BIGINT) AS z_micro
           |  FROM fxg f JOIN $finalWeights w USING (bucket) GROUP BY 1),
           |dec AS (
           |  SELECT l.doc_id, l.y, z.z_micro,
           |    CAST(ntile(10) OVER (ORDER BY z.z_micro, l.doc_id) AS BIGINT)
           |      AS decile
           |  FROM lab l JOIN zf z USING (doc_id))
           |SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(y) AS BIGINT) AS n_teacher_pass,
           |  CAST(floor(sum(y) * 1000.0 / count(*)) AS BIGINT)
           |    AS pass_rate_milli
           |FROM dec GROUP BY 1 ORDER BY 1""".stripMargin),
      (s, dir) => {
        val lf = labeledFeatures(s, dir)
        val scored = Distill.score(lf, "buckets",
          Distill.fit(lf, "buckets", "y"))
        Ops.withGlobalNtile(scored,
            Seq(col("z_micro"), col("doc_id")), col("z_micro"),
            k = 10, outCol = "decile")
          .groupBy("decile")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("y")).cast("long").as("n_teacher_pass"),
            floor(sum(col("y")) * lit(1000.0) / count(lit(1)))
              .cast("long").as("pass_rate_milli"))
          .orderBy("decile")
      }),

    // The student gate COMPOSED: the fitted scorer (nightly fit on the
    // reference fixture) gating a LIVE corpus that additionally
    // carries whitespace twins of the passing variants, then
    // exact-dedup keepers among the gate's survivors — first-cut
    // attribution per doc ('distill' | 'dup' | 'kept'). The twins must
    // pass the gate (same canonical tokens ⇒ same features ⇒ same z)
    // and die at dedup; the base docs die at the gate and never reach
    // the fingerprint exchange — the gate-before-shuffle ordering that
    // makes a cheap learned gate worth serving first at 100 TB.
    QueryDef("ext_distill_pipeline",
      Some(fitPreludeSql +
        s"""live AS (
           |  SELECT doc_id, text FROM corpus
           |  UNION ALL
           |  SELECT doc_id + 600000, ' ' || text || '  '
           |  FROM corpus WHERE doc_id >= 300000),
           |${Distill.featureSql("live", "fxl")},
           |zl AS (
           |  SELECT f.doc_id, CAST(1000 * sum(w.w) AS BIGINT) AS z_micro
           |  FROM fxl f JOIN $finalWeights w USING (bucket) GROUP BY 1),
           |gl AS (
           |  SELECT l.doc_id,
           |    CAST(z.z_micro >= 0 AS INT) AS student_pass,
           |    md5(lower(regexp_replace(trim(l.text), '\\s+', ' ', 'g'))) AS fp
           |  FROM live l JOIN zl z USING (doc_id)),
           |kl AS (
           |  SELECT fp, min(doc_id) AS keeper_id FROM gl
           |  WHERE student_pass = 1 GROUP BY 1)
           |SELECT gl.doc_id,
           |  CASE WHEN gl.student_pass = 0 THEN 'distill'
           |       WHEN gl.doc_id <> kl.keeper_id THEN 'dup'
           |       ELSE 'kept' END AS cut_stage
           |FROM gl LEFT JOIN kl USING (fp)
           |ORDER BY gl.doc_id""".stripMargin),
      (s, dir) => {
        val w = Distill.fit(labeledFeatures(s, dir), "buckets", "y")
        val c = corpusOf(s, dir)
        val live = c.unionByName(c.where(col("doc_id") >= 300000)
          .select((col("doc_id") + 600000).as("doc_id"),
            concat(lit(" "), col("text"), lit("  ")).as("text")))
        // boundary: scored feeds the keeper aggregate AND the join back
        // — unpinned, Catalyst would inline the feature projection +
        // weight join into both consumers (the rawFeats doctrine).
        // EAGER: the two consumers are parallel stages of ONE final
        // statement, so a lazy pin gets first-forced by both
        // concurrently (the convoy) — materialize once instead.
        val scored = graft.operators.Ops.checkpointKeepPartitioning(
          Distill.score(
            live.select(col("doc_id"),
              Distill.featureBuckets(col("text")).as("buckets"),
              graft.functions.TextAnalysis.fingerprintMd5(col("text"))
                .as("fp")),
            "buckets", w), eager = true)
        // keeper via an AGGREGATE over the gate's survivors joined
        // back, not a fingerprint-partitioned window — a boilerplate
        // fingerprint with millions of passing copies stays a map-side
        // rollup plus an AQE-skew-splittable join probe instead of one
        // hot window task (the r14 hot-key-window doctrine; the left
        // join keeps failing docs attributable to 'distill')
        val keepers = scored.where(col("student_pass") === 1)
          .groupBy("fp").agg(min(col("doc_id")).as("keeper_id"))
        scored.join(keepers, Seq("fp"), "left")
          .select(col("doc_id"),
            when(col("student_pass") === 0, "distill")
              .when(col("doc_id") =!= col("keeper_id"), "dup")
              .otherwise("kept").as("cut_stage"))
          .orderBy("doc_id")
      }),

    // The confusion table — the number a gate owner actually reads
    // before swapping rules for the student (the fixture converges to
    // 99.7% agreement; the 0.3% are borderline docs the hard sigmoid
    // leaves near z = 0).
    QueryDef("ext_distill_agreement",
      Some(fitPreludeSql +
        s"""zf AS (
           |  SELECT f.doc_id, CAST(1000 * sum(w.w) AS BIGINT) AS z_micro
           |  FROM fxg f JOIN $finalWeights w USING (bucket) GROUP BY 1)
           |SELECT l.y AS teacher_pass,
           |  CAST(z.z_micro >= 0 AS INT) AS student_pass,
           |  CAST(count(*) AS BIGINT) AS n_docs
           |FROM lab l JOIN zf z USING (doc_id)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
      (s, dir) => {
        val lf = labeledFeatures(s, dir)
        Distill.score(lf, "buckets", Distill.fit(lf, "buckets", "y"))
          .groupBy(col("y").as("teacher_pass"), col("student_pass"))
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("teacher_pass", "student_pass")
      }))
}
