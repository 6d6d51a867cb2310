package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{C4Clean, TextAnalysis}

/** The two published web-corpus filter SUITES, as whole-document rule
  * evaluations — the deterministic companions of the signal family
  * t1–t8 (which score; these decide):
  *
  *  - Gopher document-quality rules (Rae et al. 2021, public
  *    arXiv:2112.11446, appendix A1): word-count bounds, mean word
  *    length, symbol-to-word ratio, bullet/ellipsis line fractions,
  *    alphabetic-word fraction, and the ≥2-distinct-stopwords check.
  *  - C4 cleaning (Raffel et al. 2020, public arXiv:1910.10683 §2.2):
  *    line-level retention (terminal punctuation, ≥5 words, no
  *    "javascript") plus the page-level drops (lorem ipsum, curly
  *    brace, fewer than three sentences surviving).
  *
  * Scale shape: both are single-pass projections — every rule is a
  * codegen'd Column expression (regexp_count / array_contains /
  * length) or the native [[graft.functions.C4LineClean]] scan, so the
  * suites run inside whole-stage codegen with ZERO shuffle at any
  * corpus size; a 100 TB filter pass is exactly as parallel as its
  * scan. Fractions are floor-quantized to 1e-4 (the engine-determinism
  * doctrine); pass flags compare the QUANTIZED values so the decision
  * reproduces bit-for-bit in any engine that mirrors the arithmetic.
  */
object QualityRules {

  private def quant4(c: Column): Column =
    floor(c * 10000.0 + 0.5) / 10000.0

  /** Gopher appendix-A1 stop set: a doc must contain ≥ 2 distinct. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The seven quantized Gopher signals as named Columns over `t` —
    * shared by [[gopherQuality]] (which emits them all) and
    * [[fineWebPipeline]] (which folds just the pass decision into one
    * projection). */
  private def gopherSignalCols(t: Column): Seq[(String, Column)] = {
    val toks = TextAnalysis.tokens(t)
    val nWords = TextAnalysis.tokenCount(t).cast("long")
    // Sum of token lengths == count of non-whitespace characters: one
    // regexp_replace instead of an interpreted per-token aggregate.
    val nonWsChars = length(regexp_replace(t, "\\s", "")).cast("double")
    val meanLenQ = quant4(when(nWords > 0, nonWsChars / nWords).otherwise(0.0))
    // "either the hash symbol or the ellipsis": the binding ratio is
    // the worse of the two. Non-overlapping '...' counts agree between
    // Java regex and RE2 (both leftmost, resume after the match).
    val nHash = regexp_count(t, lit("#")).cast("double")
    val nEllipsis = regexp_count(t, lit("\\.\\.\\.")).cast("double")
    val symRatioQ = quant4(when(nWords > 0,
      greatest(nHash, nEllipsis) / nWords).otherwise(0.0))
    val nLines = (regexp_count(t, lit("\n")) + 1).cast("double")
    val bulletFracQ = quant4(
      regexp_count(t, lit("(?m)^[ \\t]*[-*•]")).cast("double") / nLines)
    val ellipsisFracQ = quant4(
      regexp_count(t, lit("(?m)\\.\\.\\.$")).cast("double") / nLines)
    // A word "with at least one alphabetic character": greedy \S*
    // expands to the whole whitespace-delimited run, so each qualifying
    // token matches exactly once in both Java regex and RE2.
    val nAlphaWords = regexp_count(t, lit("\\S*[A-Za-z]\\S*")).cast("double")
    val alphaFracQ = quant4(when(nWords > 0, nAlphaWords / nWords)
      .otherwise(0.0))
    val nStopDistinct = gopherStopwords
      .map(w => when(array_contains(toks, w), 1).otherwise(0))
      .reduce(_ + _)

    Seq(
      "n_words" -> nWords,
      "mean_word_len" -> meanLenQ,
      "symbol_word_ratio" -> symRatioQ,
      "bullet_line_frac" -> bulletFracQ,
      "ellipsis_line_frac" -> ellipsisFracQ,
      "alpha_word_frac" -> alphaFracQ,
      "n_stop_distinct" -> nStopDistinct.cast("long"))
  }

  /** The published thresholds over the (quantized) signals. */
  private def gopherPassExpr(sig: Map[String, Column]): Column =
    sig("n_words") >= 50 && sig("n_words") <= 100000 &&
      sig("mean_word_len") >= 3.0 && sig("mean_word_len") <= 10.0 &&
      sig("symbol_word_ratio") <= 0.1 &&
      sig("bullet_line_frac") <= 0.9 &&
      sig("ellipsis_line_frac") <= 0.3 &&
      sig("alpha_word_frac") >= 0.8 &&
      sig("n_stop_distinct") >= 2

  /** The composite Gopher verdict as ONE inline Column over the text —
    * for callers that fold the teacher signal into their own single
    * projection (the distillation fit computes features and label in
    * one corpus scan; a join against [[gopherQuality]] would scan
    * twice). */
  def gopherPassColumn(t: Column): Column =
    gopherPassExpr(gopherSignalCols(t).toMap)

  /** Per-document Gopher rule evaluation. Emits every measured signal
    * alongside the composite `gopher_pass` (0/1) so downstream mixing
    * can re-weight individual rules without re-scanning. */
  def gopherQuality(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sig = gopherSignalCols(col(textCol))
    docs.select(col(idCol) +: sig.map { case (n, c) => c.as(n) }: _*)
      .withColumn("gopher_pass",
        gopherPassExpr(sig.map { case (n, _) => n -> col(n) }.toMap)
          .cast("int"))
  }

  /** Every curation gate evaluated INDEPENDENTLY per document —
    * `(id, lang_en, c4_ok, gopher_pass)` as 0/1 flags. First-cut
    * attribution hides overlap; this is the raw material for the
    * filter-Venn report (`ext_filter_venn`) and its streaming drift
    * monitor. One scan, zero shuffles before the caller's aggregate. */
  def gateFlags(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // gopher_pass inline over the signal columns (the fineWebPipeline
    // staging convention) — a join against gopherQuality(docs) here
    // would scan the corpus twice and pay a corpus-sized exchange, per
    // micro-batch in the streaming Venn monitor
    docs.select(col(idCol),
      (TextAnalysis.langId(t) === "en").cast("int").as("lang_en"),
      (!(lower(t).contains("lorem ipsum") || t.contains("{")))
        .cast("int").as("c4_ok"),
      gopherPassExpr(gopherSignalCols(t).toMap).cast("int")
        .as("gopher_pass"))
  }

  /** Per-document C4 cleaning: the cleaned text (kept lines re-joined
    * with '\n'; empty when nothing survives), kept-line and sentence
    * counts, and the page-level `c4_keep` (0/1). */
  def c4Filter(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minWords: Int = 5,
      minSentences: Int = 3): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol), t,
      C4Clean.c4LineClean(t, minWords).as("clean_text"))
      .select(col(idCol), col("clean_text"),
        when(col("clean_text") === "", 0L)
          .otherwise((regexp_count(col("clean_text"), lit("\n")) + 1)
            .cast("long")).as("n_lines_kept"),
        regexp_count(col("clean_text"), lit("[.!?]")).cast("long")
          .as("n_sentences"),
        (regexp_count(col("clean_text"), lit("[.!?]")) >= minSentences &&
          !lower(t).contains("lorem ipsum") &&
          !t.contains("{")).cast("int").as("c4_keep"))
  }

  /** FineWeb-style composed curation (Penedo et al. 2024, public
    * arXiv:2406.17557): language-ID → C4 page drops → Gopher quality
    * gate → exact-dedup keeper, cost-ascending like the ingest gates,
    * with every document attributed to the FIRST stage that cut it
    * (`lang` / `c4_page` / `gopher` / `dedup`) or `kept`. FineWeb runs
    * MinHash at the dedup slot; this composition uses the canonical
    * exact fingerprint so the WHOLE pipeline is value-checkable against
    * a SQL oracle — the MinHash slot is the same keeper choreography
    * (see `IndexStore.dedupIngestGate` for the banded form).
    *
    * Scale shape: the three filter stages fold into ONE codegen'd
    * projection (zero shuffle — cut rows never reach an exchange);
    * only survivors shuffle, once, on the dedup fingerprint (a groupBy
    * min + join on the same key — no per-group window, hot boilerplate
    * fingerprints stay linear). */
  /** The per-doc FineWeb stage verdict as one codegen'd expression —
    * 'lang' / 'c4_page' / 'gopher' / 'survivor' in cut order. Public so
    * streaming twins compose additional gates (e.g. the charset
    * quarantine) AHEAD of it without re-deriving the rule set. */
  def fineWebStageExpr(t: Column): Column =
    when(TextAnalysis.langId(t) =!= "en", "lang")
      .when(lower(t).contains("lorem ipsum") || t.contains("{"), "c4_page")
      .when(!gopherPassExpr(gopherSignalCols(t).toMap), "gopher")
      .otherwise("survivor")

  /** @param keeperPriorities when set — a bounded (source, priority)
    *   table, e.g. the persisted authority ranks
    *   ([[IndexStore.authorityFromIndex]]) — the exact-dedup keeper
    *   within each fingerprint group is the copy from the
    *   HIGHEST-priority source (min-id tiebreak; unlisted sources rank
    *   0) instead of the arbitrary min id: the most-authoritative copy
    *   is the natural canonical document. Same hot-fingerprint-safe
    *   struct-max aggregate as [[Dedup.priorityKeepers]] — never a
    *   window over the fingerprint group. */
  def fineWebPipeline(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      keeperPriorities: Option[DataFrame] = None,
      srcCol: String = "source"): DataFrame = {
    val t = col(textCol)
    // Pin the decision frame (eager localCheckpoint): three consumers
    // read it — the cut branch, the survivor branch, and the keeper
    // aggregate — and without the pin each re-evaluates the full
    // signal tree over the corpus (measured 3× the query cost). The
    // pinned frame is (id, fingerprint, stage[, priority]), NOT the
    // text — tiny at any corpus size. Same boundary doctrine as the
    // ingest gates: executor-local blocks; see
    // Dedup.ReliableBoundaryConf for the durable variant under dynamic
    // allocation.
    val decision = keeperPriorities match {
      case None =>
        docs.select(col(idCol),
          TextAnalysis.fingerprintMd5(t).as("fingerprint"),
          fineWebStageExpr(t).as("stage"))
      case Some(pri) =>
        docs.select(col(idCol),
            TextAnalysis.fingerprintMd5(t).as("fingerprint"),
            fineWebStageExpr(t).as("stage"), col(srcCol).as("__ksrc"))
          .join(broadcast(pri.select(col("source").as("__ksrc"),
            col("priority").as("__kpri"))), Seq("__ksrc"), "left")
          .select(col(idCol), col("fingerprint"), col("stage"),
            coalesce(col("__kpri"), lit(0L)).as("__kpri"))
    }
    val staged = Ops.checkpointKeepPartitioning(decision, eager = true)
    val cut = staged.where(col("stage") =!= "survivor")
      .select(col(idCol), col("stage").as("cut_stage"))
    val survivors = staged.where(col("stage") === "survivor")
    val keepers =
      if (keeperPriorities.isEmpty)
        survivors.groupBy("fingerprint")
          .agg(min(col(idCol)).as("keeper_id"))
      else
        survivors.groupBy("fingerprint")
          .agg(max(struct(col("__kpri"), (-col(idCol)).as("neg_id")))
            .as("best"))
          .select(col("fingerprint"), (-col("best.neg_id")).as("keeper_id"))
    val attributed = survivors.join(keepers, "fingerprint")
      .select(col(idCol),
        when(col(idCol) === col("keeper_id"), "kept")
          .otherwise("dedup").as("cut_stage"))
    cut.unionAll(attributed)
  }
}
