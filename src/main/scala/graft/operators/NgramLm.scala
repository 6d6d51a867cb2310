package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Shingles

/** Corpus-trained bigram language model with add-one smoothing, scored
  * as integer milli-bits of cross-entropy per token — the CCNet-style
  * perplexity filter that splits a crawl into head/middle/tail quality
  * bands. The reference pipeline's curation surface stops at
  * closed-form per-row ratios (cf. the quality heuristics mirrored in
  * `t2_quality_score`); a corpus-STATISTICS quality model is the next
  * rung a training-data pipeline needs, and unlike an external LM it is
  * trained by the same engine that scores with it.
  *
  * Determinism doctrine: per-bigram log-probabilities are quantized to
  * integer milli-bits (`floor(-log2(p)*1000 + 0.5)`) BEFORE the per-doc
  * sum, so the aggregate is an order-independent integer sum — a double
  * sum would hash-differ across partitionings, and engine-local `log`
  * implementations (JVM StrictMath/fdlibm vs DuckDB libm) can disagree
  * in the last ulp, which a 1e-3 grid makes irrelevant (flip risk per
  * term ~1e-12) where a 1e-6 grid would not.
  *
  * Scale shape (100 TB corpus): training is one shuffle on the bigram
  * key with map-side partial aggregation, context counts are a second
  * far smaller shuffle over the count table itself, and the vocabulary
  * size is a 1-row aggregate kept lazy as a frame (no job at model
  * construction). Scoring joins the exploded bigram stream against the
  * two count tables: broadcast by default (a web-scale bigram table can
  * be pruned to top-k counts first — everything pruned scores as
  * unseen, which only moves mass toward the smoothing floor); with
  * `broadcastModel=false` they shuffle-join on the bigram/context keys,
  * where the one systematically hot probe key (`<s>`, first position of
  * every document) is AQE-skew-split territory — the build side holds
  * one row per key, so splitting the probe side is always legal.
  */
object NgramLm {

  /** Trained model: `bigramCounts(bg, cb)`, `contextCounts(prev, cctx)`,
    * `vocabSize(vsize)` (1 row, distinct train tokens incl. `<s>` + 1
    * for the unseen class). All lazy frames — constructing a model
    * launches no jobs; persist via IndexStore tables for reuse. */
  final case class Model(
      bigramCounts: DataFrame,
      contextCounts: DataFrame,
      vocabSize: DataFrame)

  /** Whitespace tokens of the lowercased text, empty-free: the text is
    * fully whitespace-stripped first (`trim` alone strips only spaces,
    * so tab/newline-led text would split with an empty head), and a
    * whitespace-only doc maps to `[]` rather than `['']`. */
  def cleanTokens(text: Column): Column = {
    val stripped = regexp_replace(lower(text), "^\\s+|\\s+$", "")
    when(stripped === "", array().cast("array<string>"))
      .otherwise(split(stripped, "\\s+"))
  }

  /** Sentence-start-marked token array: `<s>` + [[cleanTokens]]. */
  def sentenceTokens(text: Column): Column =
    concat(array(lit("<s>")), cleanTokens(text))

  /** Exploded bigram stream: (doc_id, bg "prev cur", prev). Built from
    * the codegen'd [[graft.functions.NgramShingles]] native (n=2) —
    * space-joined pairs are an exact key because tokens cannot contain
    * whitespace post-split. A token-less doc contributes no rows (the
    * shingle native would collapse a 1-element array to a whole-text
    * shingle, so it is guarded to empty). */
  def bigrams(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = sentenceTokens(col(textCol))
    docs
      .select(col(idCol).as("doc_id"),
        when(size(toks) >= 2, Shingles.ngramShingles(toks, 2))
          .otherwise(array().cast("array<string>")).as("bgs"))
      .select(col("doc_id"), explode(col("bgs")).as("bg"))
      .withColumn("prev", substring_index(col("bg"), " ", 1))
  }

  /** Train on a document frame (idCol, textCol). One corpus pass: the
    * bigram-count table is built once behind a lazy materialization
    * boundary (construction launches no jobs), and BOTH derived
    * statistics read it instead of the corpus — the context counts as a
    * second-level rollup, and the vocabulary as the distinct endpoints
    * of the counted bigrams, which is exactly the train vocabulary
    * because every token of every doc appears in some bigram (token i
    * is the `cur` of bigram i, with `<s>` opening each doc; a token-less
    * doc contributes no bigrams and no tokens). Without the boundary
    * Catalyst would inline the full tokenize+explode+aggregate corpus
    * pass once per consumer — the same trap ARCHITECTURE.md records for
    * the winnow and TF-IDF frames. */
  def train(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", eagerCounts: Boolean = false): Model =
    // `eagerCounts = true` materializes the count pin at train() time:
    // a scoring statement broadcasts all three model tables at once,
    // and their concurrent subplans first-force a LAZY count pin in
    // parallel — convoying on the unmaterialized blocks' per-partition
    // locks (measured ~6× on the Doremi twin of this boundary). A
    // caller that scores immediately should pass true (one sequential
    // count; every broadcast then reads blocks). The DEFAULT stays
    // lazy: constructing a model launches no jobs (the Model contract,
    // pinned in DedupSpec) — a model built for later/streamed serving
    // pays nothing until first use.
    modelFromCounts(Ops.checkpointKeepPartitioning(
      bigramCounts(docs, idCol, textCol), eager = eagerCounts))

  /** Raw additive count rows for `docs` — the model's persistable
    * state. Counts form a commutative group (merge = sum, unlearn =
    * negate), which is what makes the persisted-LM lifecycle exact
    * (see IndexStore.buildLmIndex). */
  def bigramCounts(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    bigrams(docs, idCol, textCol)
      .groupBy("bg").agg(count(lit(1)).as("cb"))

  /** Per-`keyCol` bigram-count SLICES `(keyCol, bg, cb)` — the keyed
    * form of [[bigramCounts]], ONE corpus tokenize+explode pass that
    * every leave-one-key-out consumer reads instead of re-scanning the
    * corpus per panel member. The global table is this one's rollup
    * (sum over keys), so a keyed build subsumes the unkeyed one; the
    * slices inherit the counts' group structure (merge = sum, ablate =
    * subtract), which is what makes [[ablatedCounts]] EXACT. */
  def keyedBigramCounts(docs: DataFrame, keyCol: String,
      textCol: String = "text"): DataFrame =
    bigrams(docs, keyCol, textCol)
      .groupBy(col("doc_id").as(keyCol), col("bg"))
      .agg(count(lit(1)).as("cb"))

  /** Leave-one-key-out count table derived WITHOUT re-reading the
    * corpus: totals minus the held-out key's slice, exhausted bigrams
    * (count fully owned by the held-out key) dropped — row-for-row
    * equal to retraining on `docs.where(key =!= heldOut)`, because
    * counts subtract exactly and [[modelFromCounts]] re-derives the
    * context counts and vocabulary from whatever bigrams survive.
    * Both inputs are count tables (vocabulary-sized, not
    * corpus-sized), so a P-member ablation panel pays the corpus scan
    * once plus P count-table joins. */
  def ablatedCounts(totals: DataFrame, slices: DataFrame,
      keyCol: String, heldOut: String): DataFrame =
    totals.join(
        slices.where(col(keyCol) === heldOut)
          .select(col("bg"), col("cb").as("cb_out")),
        Seq("bg"), "left")
      .select(col("bg"),
        (col("cb") - coalesce(col("cb_out"), lit(0L))).as("cb"))
      .where(col("cb") > 0)

  /** The whole ablation PANEL's count tables in one keyed frame
    * `(panelCol, bg, cb)`: for each panel member, totals minus that
    * member's slice ([[ablatedCounts]] semantics), with a member
    * matching no slice key (conventionally `"none"`) yielding the
    * full model. One broadcast-joined pass over two vocabulary-sized
    * tables builds ALL the panel's models — paired with
    * [[scoreKeyedBigramMillis]], a P-member ablation costs one corpus
    * pass (the slices) plus bounded-table work, independent of P. */
  def panelAblatedCounts(totals: DataFrame, slices: DataFrame,
      keyCol: String, panel: Seq[String],
      panelCol: String = "held_out"): DataFrame = {
    val spark = totals.sparkSession
    import spark.implicits._
    totals.select(col("bg"), col("cb").as("cb_tot"))
      .crossJoin(broadcast(panel.toDF(panelCol)))
      .join(slices.select(col(keyCol).as(panelCol), col("bg"),
          col("cb").as("cb_out")),
        Seq(panelCol, "bg"), "left")
      .select(col(panelCol), col("bg"),
        (col("cb_tot") - coalesce(col("cb_out"), lit(0L))).as("cb"))
      .where(col("cb") > 0)
  }

  /** Scores `docs` under EVERY model of a keyed count frame
    * `(keyCol, bg, cb)` in one dataflow — the ablation-panel (or any
    * model-ensemble) form: per-key context counts and vocabularies
    * derive from the keyed counts exactly as [[modelFromCounts]] does
    * per model, the eval bigram stream crosses the (bounded) key list
    * once, and all three model tables join as broadcasts. Output
    * `(keyCol, doc_id, h_milli)` — same integers, P models for the
    * price of one scoring pass and ZERO per-model jobs (the per-model
    * loop pays a materialization and three aggregations per member;
    * this pays them once for the whole panel). The caller supplies
    * `keyedCounts` behind a materialization boundary.
    * `broadcastModel=false` is the beyond-broadcast path: the keyed
    * count and context tables shuffle-join on their (key, bg/prev)
    * keys instead of broadcasting P× a web-scale vocabulary. The
    * panel KEY list and the per-key vocab sizes stay broadcast either
    * way — both are P rows by construction, so they never outgrow a
    * broadcast no matter how large the corpus or vocabulary. */
  def scoreKeyedBigramMillis(keyedCounts: DataFrame, keyCol: String,
      docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", broadcastModel: Boolean = true): DataFrame = {
    def side(df: DataFrame) = if (broadcastModel) broadcast(df) else df
    val keys = keyedCounts.select(keyCol).distinct()
    val cc = keyedCounts
      .groupBy(col(keyCol), substring_index(col("bg"), " ", 1).as("prev"))
      .agg(sum(col("cb")).as("cctx"))
    val v = keyedCounts
      .select(col(keyCol), substring_index(col("bg"), " ", 1).as("t"))
      .union(keyedCounts
        .select(col(keyCol), substring_index(col("bg"), " ", -1).as("t")))
      .groupBy(keyCol).agg((countDistinct(col("t")) + 1).as("vsize"))
    bigrams(docs, idCol, textCol)
      .crossJoin(broadcast(keys))
      .join(side(keyedCounts), Seq(keyCol, "bg"), "left")
      .join(side(cc), Seq(keyCol, "prev"), "left")
      .join(broadcast(v), Seq(keyCol), "left")
      .select(col(keyCol), col("doc_id"),
        hMilli(col("cb"), col("cctx"), col("vsize")).as("h_milli"))
  }

  /** Derives the full model from a (bg, cb) count frame: context counts
    * as a second-level rollup, vocabulary as the distinct endpoints of
    * the counted bigrams. The caller supplies the frame already behind
    * a materialization boundary (or a persisted table scan) — each
    * derived statistic is one more consumer of it. */
  def modelFromCounts(bc: DataFrame): Model = {
    val cc = bc
      .groupBy(substring_index(col("bg"), " ", 1).as("prev"))
      .agg(sum(col("cb")).as("cctx"))
    val v = bc.select(substring_index(col("bg"), " ", 1).as("t"))
      .union(bc.select(substring_index(col("bg"), " ", -1).as("t")))
      .agg((countDistinct(col("t")) + 1).as("vsize"))
    Model(bc, cc, v)
  }

  /** Score documents: (doc_id, n_bigrams, h_milli_tok) where
    * h_milli_tok is the rounded mean of per-bigram integer milli-bits
    * under add-one smoothing, p = (c(prev,cur)+1) / (c(prev)+V). An
    * unseen context degrades to the uniform floor 1/V. The final
    * division is double over exactly-representable integers (< 2^53),
    * so it is bit-identical across engines. */
  /** Per-bigram integer milli-bits: `floor(-log2(p)*1000 + 0.5)` with
    * p = (cb+1)/(cctx+V) — the quantization that makes the per-doc sum
    * order-independent. */
  private[operators] def hMilli(cb: Column, cctx: Column,
      vsize: Column): Column =
    floor(-log2((coalesce(cb, lit(0L)) + lit(1.0)) /
        (coalesce(cctx, lit(0L)) + vsize))
      * lit(1000.0) + lit(0.5))

  /** Per-doc rollup of the quantized bigram scores. The final division
    * is double over exactly-representable integers (< 2^53), so it is
    * bit-identical across engines. */
  private def perDoc(scoredBigrams: DataFrame): DataFrame =
    scoredBigrams
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("h_milli")).as("h_total"))
      .select(col("doc_id"), col("n_bigrams"),
        floor(col("h_total") * lit(1.0) / col("n_bigrams") + lit(0.5))
          .as("h_milli_tok"))

  def scoreMicroBits(model: Model, docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", broadcastModel: Boolean = true): DataFrame =
    perDoc(scoreBigramMillis(model, docs, idCol, textCol, broadcastModel))

  /** The per-bigram quantized scores BEFORE the per-doc rollup —
    * `(doc_id, h_milli)` one row per bigram occurrence. Callers that
    * aggregate at a different grain (a corpus-level eval, a per-source
    * ablation) consume this so their rounding happens exactly once, at
    * their own grain, instead of averaging already-rounded per-doc
    * means. */
  def scoreBigramMillis(model: Model, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      broadcastModel: Boolean = true): DataFrame = {
    def side(df: DataFrame) = if (broadcastModel) broadcast(df) else df
    bigrams(docs, idCol, textCol)
      .join(side(model.bigramCounts), Seq("bg"), "left")
      .join(side(model.contextCounts), Seq("prev"), "left")
      .crossJoin(broadcast(model.vocabSize))
      .select(col("doc_id"),
        hMilli(col("cb"), col("cctx"), col("vsize")).as("h_milli"))
  }

  /** Interpolated (Jelinek-Mercer, equal-weight) scoring:
    * p = (p_bigram + p_unigram) / 2 with both components add-one
    * smoothed — the standard fix for the pure bigram model's cliff on
    * unseen contexts (a rare-but-valid word after an unseen context
    * scores the uniform floor under [[scoreMicroBits]]; here its
    * unigram evidence carries half the mass). Needs NO new model
    * state: unigram counts are the bigram table rolled up by its
    * SECOND endpoint (every token occurrence is the `cur` of exactly
    * one bigram once `<s>` opens each doc), and the token total is the
    * bigram total for the same reason. The /2.0 is exact in IEEE
    * doubles, so the determinism doctrine holds unchanged. */
  def scoreInterpolated(model: Model, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      broadcastModel: Boolean = true): DataFrame = {
    def side(df: DataFrame) = if (broadcastModel) broadcast(df) else df
    val uc = model.bigramCounts
      .groupBy(substring_index(col("bg"), " ", -1).as("cur"))
      .agg(sum(col("cb")).as("cu"))
    val nTot = model.bigramCounts.agg(sum(col("cb")).as("ntok"))
    val pBi = (coalesce(col("cb"), lit(0L)) + lit(1.0)) /
      (coalesce(col("cctx"), lit(0L)) + col("vsize"))
    val pUni = (coalesce(col("cu"), lit(0L)) + lit(1.0)) /
      (col("ntok") + col("vsize"))
    perDoc(bigrams(docs, idCol, textCol)
      .withColumn("cur", substring_index(col("bg"), " ", -1))
      .join(side(model.bigramCounts), Seq("bg"), "left")
      .join(side(model.contextCounts), Seq("prev"), "left")
      .join(side(uc), Seq("cur"), "left")
      .crossJoin(broadcast(model.vocabSize))
      .crossJoin(broadcast(nTot))
      .select(col("doc_id"),
        floor(-log2((pBi + pUni) / lit(2.0)) * lit(1000.0) + lit(0.5))
          .as("h_milli")))
  }

  /** Streaming-compatible scoring: same math as [[scoreMicroBits]] but
    * the vocabulary size is a pre-resolved literal (a stream cannot
    * cross-join the 1-row vocab frame — a streaming cartesian is
    * unsupported, correctly: the "frame" would have to be re-read every
    * micro-batch). The count-table joins are stream-static left joins;
    * the caller pins the model frames (localCheckpoint or a persisted
    * IndexStore table) so the static side isn't recomputed per batch.
    * `broadcastModel=false` is the beyond-broadcast path (a web-scale
    * bigram table is tens of billions of rows): the same stream-static
    * left joins planned as shuffle joins — legal for a stateless
    * stream-side-preserved join — with the `<s>` hot probe key
    * AQE-skew-splittable in batch runs (the build side holds one row
    * per key, so splitting the probe side is always legal). */
  def scoreBigramsWithVocab(docsOrStream: DataFrame, model: Model,
      vocabSize: Long, idCol: String = "doc_id",
      textCol: String = "text", broadcastModel: Boolean = true): DataFrame = {
    def side(df: DataFrame) = if (broadcastModel) broadcast(df) else df
    perDoc(bigrams(docsOrStream, idCol, textCol)
      .join(side(model.bigramCounts), Seq("bg"), "left")
      .join(side(model.contextCounts), Seq("prev"), "left")
      .select(col("doc_id"),
        hMilli(col("cb"), col("cctx"), lit(vocabSize)).as("h_milli")))
  }

  /** Exact CCNet-style tercile banding (head = lowest cross-entropy),
    * without the global sort: [[Ops.withGlobalNtile]] computes the
    * tile from the 3-pass bucketed global rank — value-identical to
    * `ntile(3) OVER (ORDER BY h_milli_tok, doc_id)` for every input
    * including ties, with no single-task funnel anywhere in the plan
    * (the straggler the old windowed form carried; [[withApproxBands]]
    * remains as the cheaper threshold-based alternative). */
  def withBands(scored: DataFrame): DataFrame = {
    require(!scored.columns.contains("__band_t"),
      "withBands reserves __band_t")
    Ops.withGlobalNtile(scored,
        Seq(col("h_milli_tok"), col("doc_id")), col("h_milli_tok"),
        k = 3, outCol = "__band_t")
      .withColumn("band",
        when(col("__band_t") === 1, "head")
          .when(col("__band_t") === 2, "middle").otherwise("tail"))
      .drop("__band_t")
  }

  /** Corpus token heavy hitters with cumulative coverage — the
    * tokenizer-design statistic ("how much of the stream do the top-k
    * types cover"). Scale shape: one shuffle for the count table
    * (map-side partial agg over the exploded token stream), the top-k
    * via orderBy+limit (planned as a distributed TakeOrderedAndProject
    * — per-partition heaps, never a global sort), the grand total as a
    * broadcast 1-row aggregate, and the running-coverage window runs
    * over the ALREADY-LIMITED k rows, so its single partition holds k
    * rows, not the vocabulary. Count ties at the k-boundary are broken
    * by token ascending in both the top-k and the window order, so the
    * cut is a pure function of the data. cum_share_micro is an exactly-
    * rounded double over exact integers — engine-deterministic. */
  def vocabCoverage(docs: DataFrame, k: Int = 50,
      textCol: String = "text"): DataFrame = {
    val counts = docs
      .select(explode(cleanTokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    val top = counts.orderBy(col("cnt").desc, col("token")).limit(k)
    val w = Window.orderBy(col("cnt").desc, col("token"))
      .rowsBetween(Window.unboundedPreceding, 0)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("token"))))
      .withColumn("cum_cnt", sum(col("cnt")).over(w))
      .select(col("rank"), col("token"), col("cnt"), col("cum_cnt"),
        floor(col("cum_cnt") * lit(1000000.0) / col("total") + lit(0.5))
          .as("cum_share_micro"))
      .orderBy("rank")
  }

  /** Per-source token-distribution drift: KL(source ‖ corpus) in
    * micro-bits — the data-mixing diagnostic that tells you which
    * source's token distribution has wandered from the blend it feeds
    * (a unigram form of the domain-reweighting signal). One corpus
    * shuffle builds the (source, token) counts; the source totals,
    * corpus token counts, and grand total all derive from that table
    * rather than re-reading the corpus. Per-term values quantize to
    * integer micro-bits BEFORE the per-source sum (same determinism
    * doctrine as the LM scores); terms can be negative, so a true-zero
    * divergence may sum to a few negative micro-bits of rounding — the
    * spec pins the tolerance. Every source token exists in the corpus
    * by construction, so q > 0 and no smoothing is needed. Exact
    * cross-engine products require counts within 2^53 — at warehouse
    * scale swap the grand-total factor to a precomputed double.
    * `broadcastModel=false` is the beyond-broadcast path: the
    * vocabulary-sized corpus-token count table shuffle-joins on the
    * token key instead of broadcasting. The per-source totals and the
    * 1-row grand total stay broadcast either way — bounded by the
    * source count, not the vocabulary. */
  def sourceTokenKl(docs: DataFrame, srcCol: String = "source",
      textCol: String = "text", broadcastModel: Boolean = true,
      eagerCounts: Boolean = false): DataFrame = {
    val tok = docs.select(col(srcCol).as("source"),
      explode(cleanTokens(col(textCol))).as("token"))
    // boundary: sc feeds the source totals, the corpus counts, AND the
    // scoring join — unpinned, each consumer would re-run the corpus
    // tokenize+explode+aggregate pass (the train()/winnow/TF-IDF trap)
    // eagerCounts = true: three concurrent broadcasts first-force a
    // lazy pin (the train() convoy); default stays construction-lazy
    val sc = Ops.checkpointKeepPartitioning(
      tok.groupBy("source", "token").agg(count(lit(1)).as("cs")),
      eager = eagerCounts)
    val sTot = sc.groupBy("source").agg(sum(col("cs")).as("ns"))
    val ct = sc.groupBy("token").agg(sum(col("cs")).as("c"))
    val n = ct.agg(sum(col("c")).as("n"))
    sc.join(broadcast(sTot), "source")
      .join(if (broadcastModel) broadcast(ct) else ct, "token")
      .crossJoin(broadcast(n))
      .select(col("source"), col("cs"),
        floor((col("cs") / col("ns")) *
            log2((col("cs") * col("n")) / (col("ns") * col("c"))) *
            lit(1000000.0) + lit(0.5))
          .as("term_micro"))
      .groupBy("source")
      .agg(sum(col("cs")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("term_micro")).as("kl_micro"))
      .orderBy("source")
  }

  /** Scale-path banding: tercile THRESHOLDS from one approximate
    * percentile aggregate (broadcast, then a map-side compare) — no
    * global sort, no single-partition window. Band populations are
    * approximate within the sketch accuracy; the per-doc score itself
    * is unchanged. */
  def withApproxBands(scored: DataFrame, accuracy: Int = 10000): DataFrame = {
    val cuts = scored.agg(
      percentile_approx(col("h_milli_tok"), lit(1.0 / 3), lit(accuracy)).as("t1"),
      percentile_approx(col("h_milli_tok"), lit(2.0 / 3), lit(accuracy)).as("t2"))
    scored.crossJoin(broadcast(cuts))
      .withColumn("band",
        when(col("h_milli_tok") <= col("t1"), "head")
          .when(col("h_milli_tok") <= col("t2"), "middle")
          .otherwise("tail"))
      .drop("t1", "t2")
  }
}
