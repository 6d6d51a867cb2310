package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DoReMi-style domain reweighting (Xie et al., arXiv:2302.03169's
  * sibling arXiv:2305.10429): learn per-source mixture weights from
  * per-domain EXCESS LOSS rather than hand-tuning the token budgets
  * the mixer spends (`ext_source_token_budget`,
  * [[CorpusBuild.build]]'s `budgets`).
  *
  * The paper's loop trains a proxy model under Group DRO, updating
  * domain weights by exponentiated gradient on per-domain excess loss
  * (proxy − reference), then trains the real model on the learned
  * mixture. Re-expressed for a deterministic batch engine with the
  * bigram-LM machinery this repo already owns ([[NgramLm]]):
  *
  *   - the REFERENCE model is the generalist: one bigram LM trained on
  *     the whole corpus (the uniform-mixture model the paper starts
  *     from);
  *   - the per-domain ACHIEVABLE loss is the domain's own bigram LM
  *     scored on its own docs — the analogue of the paper's
  *     per-domain entropy floor (its eq. 2 baseline);
  *   - excess λ_d = max(0, mean_d(ref loss) − mean_d(own loss)) in
  *     integer milli-bits/token: how much the generalist underperforms
  *     on the domain relative to what a domain-fit model proves is
  *     learnable — exactly the "learnable but not yet learned" signal
  *     DoReMi upweights (noise-floor domains where even the own-model
  *     loss is high contribute only their REDUCIBLE part);
  *   - T multiplicative-weights steps on the bounded per-domain
  *     table: w ← normalize(w · (1 + η·λ)), then mix with uniform at
  *     rate c (the paper's smoothing). The update uses the LINEARIZED
  *     exponentiated-gradient factor (1 + η·λ) instead of exp(η·λ) —
  *     the classic multiplicative-weights surrogate — because it is an
  *     exact rational: every step stays in integer micro-units plus
  *     one IEEE double divide of exactly-representable integers, so
  *     the loop is bit-identical across engines and the DuckDB oracle
  *     replays it as an unrolled CTE chain. exp() would hang the
  *     round-trip on libm last-ulp agreement.
  *
  * Scale shape: ONE corpus bigram pass feeds everything. The
  * per-(source, bigram) count table is the primary aggregate; the
  * reference model's counts are a rollup of it (sum over source), the
  * context counts are second-level rollups, and the vocabularies are
  * distinct-endpoint counts — no second corpus read. Scoring joins the
  * pinned bigram stream against the bounded (vocab²-capped) model
  * tables once, computing BOTH losses per bigram in the same select.
  * The EG loop itself runs on a table bounded by the number of
  * domains (≤ sources, not rows) — collected driver-side under the
  * same bounded-scalar stance as the k×dim IVF centroids, never the
  * corpus. At 100 TB nothing here exceeds: the corpus moves once
  * (keyed by doc for the per-doc rollup), the models are vocab-bounded
  * broadcasts (flag for beyond-broadcast vocabularies, same stance as
  * [[NgramLm.scoreMicroBits]]), and the loop state is K rows.
  */
object Doremi {

  /** η and c in micro-units (η = etaMicro/1e6 per excess BIT,
    * c = smoothMicro/1e6), `steps` EG iterations. */
  final case class Config(etaMicro: Long = 200000L,
      smoothMicro: Long = 100000L, steps: Int = 5) {
    require(etaMicro > 0 && smoothMicro >= 0 && smoothMicro <= 1000000L
      && steps >= 1)
  }

  /** Per-domain loss signals from one corpus bigram pass:
    * (source, n_docs, ref_milli, own_milli, excess_milli) with the
    * means in integer milli-bits/token over the domain's scorable
    * (≥1-bigram) docs. Both models are add-one-smoothed pure bigram
    * LMs ([[NgramLm.scoreMicroBits]] semantics); the reference trains
    * on ALL docs, the own-model family is the per-source count table
    * the reference rolls up from. */
  def domainSignals(docs: DataFrame, srcCol: String = "source",
      textCol: String = "text", broadcastModels: Boolean = true)
      : DataFrame = {
    def side(df: DataFrame) = if (broadcastModels) broadcast(df) else df
    // one corpus tokenize+explode pass, tagged with the domain; pinned —
    // it feeds the count aggregate AND the scoring join below
    val bgs = Ops.checkpointKeepPartitioning(
      NgramLm.bigrams(docs, textCol = textCol)
        .join(docs.select(col("doc_id"), col(srcCol).as("source")),
          "doc_id"))
    // primary aggregate: per-(source, bigram) counts; everything else
    // is a rollup of this table, so the corpus is never re-read.
    // EAGER: six broadcast model subplans below all read this table —
    // left lazy, their concurrent first-forcing convoys on the
    // unmaterialized checkpoint's per-partition block locks (measured:
    // 7 concurrent ~12.5 s jobs for a ~1 s chain). One sequential
    // materialization (which also forces the bgs pin, single-threaded)
    // lets every broadcast read blocks.
    val sbc = Ops.checkpointKeepPartitioning(
      bgs.groupBy("source", "bg").agg(count(lit(1)).as("cb")),
      eager = true)
    val scc = sbc.groupBy(col("source"),
        substring_index(col("bg"), " ", 1).as("prev"))
      .agg(sum(col("cb")).as("cctx_own"))
    val sv = sbc.select(col("source"),
        substring_index(col("bg"), " ", 1).as("t"))
      .union(sbc.select(col("source"),
        substring_index(col("bg"), " ", -1).as("t")))
      .groupBy("source").agg((countDistinct(col("t")) + 1).as("vsize_own"))
    val bc = sbc.groupBy("bg").agg(sum(col("cb")).as("cb_ref"))
    val cc = bc.groupBy(substring_index(col("bg"), " ", 1).as("prev"))
      .agg(sum(col("cb_ref")).as("cctx_ref"))
    val v = bc.select(substring_index(col("bg"), " ", 1).as("t"))
      .union(bc.select(substring_index(col("bg"), " ", -1).as("t")))
      .agg((countDistinct(col("t")) + 1).as("vsize_ref"))

    def hMilli(cb: org.apache.spark.sql.Column,
        cctx: org.apache.spark.sql.Column,
        vsize: org.apache.spark.sql.Column) =
      floor(-log2((coalesce(cb, lit(0L)) + lit(1.0)) /
          (coalesce(cctx, lit(0L)) + vsize)) * lit(1000.0) + lit(0.5))

    // both losses in ONE pass over the pinned bigram stream
    val scored = bgs
      .join(side(bc.withColumnRenamed("bg", "bgr")),
        col("bg") === col("bgr"), "left").drop("bgr")
      .join(side(cc.withColumnRenamed("prev", "pr")),
        col("prev") === col("pr"), "left").drop("pr")
      .join(side(sbc.select(col("source").as("so"), col("bg").as("bgo"),
          col("cb").as("cb_own"))),
        col("source") === col("so") && col("bg") === col("bgo"), "left")
      .drop("so", "bgo")
      .join(side(scc.withColumnRenamed("source", "sc")
          .withColumnRenamed("prev", "pc")),
        col("source") === col("sc") && col("prev") === col("pc"), "left")
      .drop("sc", "pc")
      .join(side(sv), "source")
      .crossJoin(broadcast(v))
      .select(col("doc_id"), col("source"),
        hMilli(col("cb_ref"), col("cctx_ref"), col("vsize_ref"))
          .as("h_ref"),
        hMilli(col("cb_own"), col("cctx_own"), col("vsize_own"))
          .as("h_own"))
    val perDoc = scored.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("nb"), sum(col("h_ref")).as("tr"),
        sum(col("h_own")).as("to"))
      .select(col("doc_id"), col("source"),
        floor(col("tr") * lit(1.0) / col("nb") + lit(0.5)).as("ref_tok"),
        floor(col("to") * lit(1.0) / col("nb") + lit(0.5)).as("own_tok"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        floor(sum(col("ref_tok")) * lit(1.0) / count(lit(1)) + lit(0.5))
          .cast("long").as("ref_milli"),
        floor(sum(col("own_tok")) * lit(1.0) / count(lit(1)) + lit(0.5))
          .cast("long").as("own_milli"))
      .withColumn("excess_milli",
        greatest(lit(0L), col("ref_milli") - col("own_milli")))
  }

  /** The bounded EG loop, exactly as the oracle unrolls it. Inputs and
    * outputs in micro-units; one entry per domain, sorted by source.
    * Every step: u = w·(1e6 + η·λ/1000) in exact integers, renormalize
    * by one IEEE double divide (operands < 2^53), floor-quantize back
    * to micro, then the integer uniform-smoothing mix. The loop runs
    * on K = #domains values — driver-side bounded state, like the BPE
    * argmax and the IVF centroid collect. */
  def egWeights(excessBySource: Seq[(String, Long)], cfg: Config)
      : Seq[(String, Long)] = {
    val sorted = excessBySource.sortBy(_._1)
    val k = sorted.size
    require(k >= 1, "at least one domain")
    var w = Array.fill(k)(1000000L / k)
    for (_ <- 1 to cfg.steps) {
      val u = Array.tabulate(k) { i =>
        w(i) * (1000000L + (cfg.etaMicro * sorted(i)._2) / 1000L)
      }
      val z = u.sum
      w = Array.tabulate(k) { i =>
        val raw = math.floor(u(i).toDouble * 1000000.0 / z.toDouble + 0.5)
          .toLong
        ((1000000L - cfg.smoothMicro) * raw) / 1000000L +
          cfg.smoothMicro / k
      }
    }
    sorted.map(_._1).zip(w.toSeq)
  }

  /** End-to-end: (source, n_docs, ref_milli, own_milli, excess_milli,
    * w_micro) ordered by source. */
  def weights(docs: DataFrame, cfg: Config = Config(),
      srcCol: String = "source", textCol: String = "text",
      broadcastModels: Boolean = true): DataFrame = {
    val spark = docs.sparkSession
    // the signal table is bounded (#domains rows): land it DRIVER-side
    // once, free every distributed intermediate (the eager checkpoint
    // severs the corpus-sized bgs/sbc pins inside domainSignals, which
    // are then freed through the pre-checkpoint plan), and hand back a
    // plan over local rows — a checkpointed sig kept in the result
    // join would hold executor blocks alive for as long as the caller
    // held the result, accumulating storage across repeated weight
    // calls in a long-lived session (the ablationWeights idiom;
    // DoremiSpec asserts the stability)
    val sig0 = domainSignals(docs, srcCol, textCol, broadcastModels)
    val sig = sig0.localCheckpoint()
    Ops.freeLogicalRddBlocks(sig0)
    // explicit column order BEFORE the positional reads: a reordered
    // producer select would otherwise silently bind the wrong signal
    // (ref/own/excess are all longs — no exception, wrong weights)
    val sigRows = sig.select("source", "n_docs", "ref_milli",
      "own_milli", "excess_milli").collect()
    Ops.freeLogicalRddBlocks(sig)
    import spark.implicits._
    val local = sigRows.toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toDF("source", "n_docs", "ref_milli", "own_milli", "excess_milli")
    val ex = sigRows.map(r => (r.getString(0), r.getLong(4))).toSeq
    val w = egWeights(ex, cfg)
    local.join(broadcast(w.toDF("source", "w_micro")), "source")
      .orderBy("source")
  }

  /** Learned weights as the mixer's budget table: (source, budget)
    * with budget = w_micro·totalTokens // 1e6 — what
    * [[CorpusBuild.build]] consumes in place of hand-set budgets. */
  def budgets(weightsDf: DataFrame, totalTokens: Long): DataFrame =
    weightsDf.select(col("source"),
      ((col("w_micro") * lit(totalTokens)) / lit(1000000L))
        .cast("long").as("budget"))

  /** Ablation-driven mixture weights — the leave-one-source-out panel
    * as the EG loop's excess signal: excess_milli(s) = max(0,
    * h(without s) − h(full)) on a FROZEN eval set, i.e. how much the
    * corpus-trained model degrades when source s is removed — the
    * source's MEASURED marginal value, where [[weights]] uses the
    * own-model learnability floor (a source can be easy to fit yet
    * contribute nothing the rest of the corpus doesn't already carry;
    * the ablation delta catches exactly that). Output: (source,
    * n_bigrams, abl_milli, full_milli, excess_milli, w_micro) ordered
    * by source, ready for [[budgets]].
    *
    * Scale shape — the ablation panel discipline unchanged
    * ([[NgramLm.panelAblatedCounts]]): ONE corpus count pass builds the
    * keyed slices, every panel model is a vocabulary-sized join of the
    * totals against its slice, the eval stream crosses the bounded
    * panel once, and the EG loop runs on #sources rows driver-side.
    * Going from 6 sources to 600 adds rows to bounded tables only. */
  def ablationWeights(train: DataFrame, evals: DataFrame,
      cfg: Config = Config(), srcCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    // both pins EAGER: the scoring pass's four concurrent broadcast
    // subplans (keys/counts/cc/v) otherwise first-force the lazy abl
    // chain in parallel and convoy on its block locks, and abl's own
    // totals+join branches double-force slices (the domainSignals
    // measurement — see that site's comment)
    val slices = Ops.checkpointKeepPartitioning(
      NgramLm.keyedBigramCounts(train, srcCol, textCol), eager = true)
    val tot = slices.groupBy("bg").agg(sum(col("cb")).as("cb"))
    val panel = "none" +: train.select(srcCol).distinct()
      .as[String].collect().sorted.toSeq
    val abl = Ops.checkpointKeepPartitioning(
      NgramLm.panelAblatedCounts(tot, slices, srcCol, panel),
      eager = true)
    val perHeld = NgramLm.scoreKeyedBigramMillis(abl, "held_out", evals,
        textCol = textCol)
      .groupBy("held_out")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        floor(sum(col("h_milli")) * lit(1.0) / count(lit(1)) + lit(0.5))
          .cast("long").as("h_milli_tok"))
      .localCheckpoint() // bounded: one row per panel member
    val full = perHeld.where(col("held_out") === "none")
      .select(col("h_milli_tok").as("full_milli"))
    // the signal table is bounded (#sources rows): land it DRIVER-side
    // once, free every distributed intermediate, and hand back a plan
    // over local rows — a checkpointed sig would keep executor blocks
    // alive for as long as the caller holds the result, accumulating
    // storage across repeated weight calls in a long-lived session
    val sigRows = perHeld.where(col("held_out") =!= "none")
      .crossJoin(broadcast(full))
      .select(col("held_out").as("source"), col("n_bigrams"),
        col("h_milli_tok").as("abl_milli"), col("full_milli"),
        greatest(lit(0L), col("h_milli_tok") - col("full_milli"))
          .as("excess_milli"))
      .collect()
    Ops.freeLogicalRddBlocks(perHeld)
    Ops.freeLogicalRddBlocks(abl)
    Ops.freeLogicalRddBlocks(slices)
    val sig = sigRows.toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toDF("source", "n_bigrams", "abl_milli", "full_milli",
        "excess_milli")
    val ex = sigRows.map(r => (r.getString(0), r.getLong(4))).toSeq
    val w = egWeights(ex, cfg)
    sig.join(broadcast(w.toDF("source", "w_micro")), "source")
      .orderBy("source")
  }

  /** Shapley-driven mixture weights — [[ablationWeights]] with the
    * leave-one-out delta replaced by the source's GROUP Shapley value
    * ([[Shapley.groupShapley]]): where LOO hands two redundant feeds
    * each a ~0 signal (either covers for the other, so the EG loop
    * starves BOTH), the Shapley value splits their shared credit, and
    * the budget follows it. Clamped at 0 (a group that hurts gets the
    * smoothing floor, like a zero-excess domain), uniform within a
    * group by construction. Output (source, player, phi_milli,
    * excess_milli, w_micro) ordered by source, ready for [[budgets]].
    * Scale shape: the Shapley pass is one corpus count pass plus
    * 2^P-bounded table work; the EG loop stays #sources driver rows. */
  def shapleyWeights(train: DataFrame, evals: DataFrame,
      nGroups: Int = 5, cfg: Config = Config(),
      srcCol: String = "source", textCol: String = "text",
      broadcastModels: Boolean = true): DataFrame = {
    val spark = train.sparkSession
    val phi = Shapley.groupShapley(
      train.withColumn("player", Shapley.sourceGroup(col(srcCol), nGroups)),
      evals, nGroups, textCol, broadcastModels)
    // bounded (#sources) signal rows land driver-side (see
    // ablationWeights — no lingering checkpoint blocks; phi is already
    // a literal frame, groupShapley frees its own intermediates)
    val sigRows = train.select(col(srcCol).as("source")).distinct()
      .withColumn("player", Shapley.sourceGroup(col("source"), nGroups))
      .join(broadcast(phi), "player")
      .select(col("source"), col("player"), col("phi_milli"),
        greatest(lit(0L), col("phi_milli")).as("excess_milli"))
      .collect()
    import spark.implicits._
    val sig = sigRows.toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
      .toDF("source", "player", "phi_milli", "excess_milli")
    val ex = sigRows.map(r => (r.getString(0), r.getLong(3))).toSeq
    val w = egWeights(ex, cfg)
    sig.join(broadcast(w.toDF("source", "w_micro")), "source")
      .orderBy("source")
  }

  /** [[shapleyWeights]] with the SAMPLED estimator
    * ([[Shapley.sampledGroupShapley]]) supplying the values — the
    * composition at PER-SOURCE granularity (or any P past the exact
    * enumerator's 12), where the exact game would need 2^P models.
    * Same clamp-at-0 + EG budget semantics; phi_milli is the
    * per-permutation mean marginal, on the exact game's scale. */
  def sampledShapleyWeights(train: DataFrame, evals: DataFrame,
      nGroups: Int = 20, nPerms: Int = 24, seed: String = "graft",
      cfg: Config = Config(), srcCol: String = "source",
      textCol: String = "text", broadcastModels: Boolean = true)
      : DataFrame = {
    val spark = train.sparkSession
    val phi = Shapley.sampledGroupShapley(
      train.withColumn("player", Shapley.sourceGroup(col(srcCol), nGroups)),
      evals, nGroups, nPerms, seed, textCol, broadcastModels)
    val sigRows = train.select(col(srcCol).as("source")).distinct()
      .withColumn("player", Shapley.sourceGroup(col("source"), nGroups))
      .join(broadcast(phi), "player")
      .select(col("source"), col("player"), col("phi_milli"),
        greatest(lit(0L), col("phi_milli")).as("excess_milli"))
      .collect()
    import spark.implicits._
    val sig = sigRows.toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
      .toDF("source", "player", "phi_milli", "excess_milli")
    val ex = sigRows.map(r => (r.getString(0), r.getLong(3))).toSeq
    val w = egWeights(ex, cfg)
    sig.join(broadcast(w.toDF("source", "w_micro")), "source")
      .orderBy("source")
  }

  /** Per-domain signals from a per-(source, bigram) COUNT table alone
    * — no text, no corpus re-read: (source, n_bigrams, ref_milli,
    * own_milli, excess_milli) with the means per BIGRAM INSTANCE
    * (token-level), not per doc. The per-doc form ([[domainSignals]])
    * needs doc boundaries, which a count table deliberately forgets;
    * the per-instance mean is the same expectation re-weighted by doc
    * length, computable EXACTLY from counts: Σ c·h / Σ c with h the
    * usual integer milli-bits. This is what makes the persisted model
    * ([[IndexStore.buildDoremiIndex]]) servable: mixture weights
    * recompute from the vocab-bounded table in O(vocab), while the
    * corpus-sized pass happens once at count time and O(batch) on
    * appends. The c·h products are exact longs (h < 2^15 milli-bits,
    * so counts up to ~2^48 instances per (source, bigram) stay exact
    * — beyond that swap the sum to decimal, the sourceTokenKl
    * caveat). */
  def tokenSignalsFromCounts(sbc: DataFrame): DataFrame = {
    // eager: five model rollups below (scc/sv/bc→cc/v) force this pin
    // concurrently when left lazy (auto-broadcast builds) — the
    // domainSignals convoy; one sequential materialization instead
    val pinned = Ops.checkpointKeepPartitioning(sbc, eager = true)
    val scc = pinned.groupBy(col("source"),
        substring_index(col("bg"), " ", 1).as("prev"))
      .agg(sum(col("cb")).as("cctx_own"))
    val sv = pinned.select(col("source"),
        substring_index(col("bg"), " ", 1).as("t"))
      .union(pinned.select(col("source"),
        substring_index(col("bg"), " ", -1).as("t")))
      .groupBy("source").agg((countDistinct(col("t")) + 1).as("vsize_own"))
    val bc = pinned.groupBy("bg").agg(sum(col("cb")).as("cb_ref"))
    val cc = bc.groupBy(substring_index(col("bg"), " ", 1).as("prev"))
      .agg(sum(col("cb_ref")).as("cctx_ref"))
    val v = bc.select(substring_index(col("bg"), " ", 1).as("t"))
      .union(bc.select(substring_index(col("bg"), " ", -1).as("t")))
      .agg((countDistinct(col("t")) + 1).as("vsize_ref"))

    def hMilli(cb: org.apache.spark.sql.Column,
        cctx: org.apache.spark.sql.Column,
        vsize: org.apache.spark.sql.Column) =
      floor(-log2((coalesce(cb, lit(0L)) + lit(1.0)) /
          (coalesce(cctx, lit(0L)) + vsize)) * lit(1000.0) + lit(0.5))
        .cast("long")

    pinned
      .join(bc.withColumnRenamed("bg", "bgr"),
        col("bg") === col("bgr"), "left").drop("bgr")
      .join(cc.withColumnRenamed("prev", "pr"),
        substring_index(col("bg"), " ", 1) === col("pr"), "left").drop("pr")
      .join(scc.withColumnRenamed("source", "sc")
          .withColumnRenamed("prev", "pc"),
        col("source") === col("sc") &&
          substring_index(col("bg"), " ", 1) === col("pc"), "left")
      .drop("sc", "pc")
      .join(sv, "source")
      .crossJoin(broadcast(v))
      .select(col("source"), col("cb"),
        (col("cb") * hMilli(col("cb_ref"), col("cctx_ref"),
          col("vsize_ref"))).as("whr"),
        (col("cb") * hMilli(col("cb"), col("cctx_own"),
          col("vsize_own"))).as("who"))
      .groupBy("source")
      .agg(sum(col("cb")).as("n_bigrams"),
        floor(sum(col("whr")) * lit(1.0) / sum(col("cb")) + lit(0.5))
          .cast("long").as("ref_milli"),
        floor(sum(col("who")) * lit(1.0) / sum(col("cb")) + lit(0.5))
          .cast("long").as("own_milli"))
      .withColumn("excess_milli",
        greatest(lit(0L), col("ref_milli") - col("own_milli")))
  }

  /** [[weights]] over a count table — the persisted-model serving
    * path. */
  def tokenWeightsFromCounts(sbc: DataFrame, cfg: Config = Config())
      : DataFrame = {
    val spark = sbc.sparkSession
    // same driver-side landing as [[weights]]: the bounded signal rows
    // are collected once, the vocab-sized pinned intermediates freed,
    // and the result built over local rows — repeated re-weighting
    // against a long-lived serving session must not accumulate blocks
    val sig0 = tokenSignalsFromCounts(sbc)
    val sig = sig0.localCheckpoint()
    Ops.freeLogicalRddBlocks(sig0)
    // explicit column order before positional reads (see weights)
    val sigRows = sig.select("source", "n_bigrams", "ref_milli",
      "own_milli", "excess_milli").collect()
    Ops.freeLogicalRddBlocks(sig)
    import spark.implicits._
    val local = sigRows.toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .toDF("source", "n_bigrams", "ref_milli", "own_milli",
        "excess_milli")
    val ex = sigRows.map(r => (r.getString(0), r.getLong(4))).toSeq
    val w = egWeights(ex, cfg)
    local.join(broadcast(w.toDF("source", "w_micro")), "source")
      .orderBy("source")
  }
}
