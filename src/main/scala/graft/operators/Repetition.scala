package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style character-weighted within-document repetition signals
  * (Rae et al. 2021, public arXiv:2112.11446, appendix A1 "repetition
  * filters") — the quality-filter family that complements
  * `TextAnalysis.repetitionRatio` (which counts duplicate n-gram
  * OCCURRENCES): here every occurrence is weighted by its character
  * length, so one repeated long phrase scores higher than many repeated
  * short ones, which is what makes the filter catch boilerplate headers
  * and looped generations rather than just common function words.
  *
  * Scale shape: explode → count per (doc, gram) → per-doc aggregate —
  * two shuffles, both keyed by doc id (the second) or (doc, gram) (the
  * first), so the work is embarrassingly parallel across documents and
  * no key concentrates more than one document's grams. That is the same
  * shape as the TF stage of `Tfidf` and holds at corpus scale; the
  * per-row HOF alternative (histogram each gram array in place) is an
  * O(grams²) interpreted lambda per document — the HOF-tree trap
  * ARCHITECTURE.md documents.
  */
object Repetition {

  private def quant4(c: org.apache.spark.sql.Column) =
    floor(c * 10000.0 + 0.5) / 10000.0

  /** Per document: `dup_tri_char_frac` — the fraction of trigram-
    * occurrence characters covered by trigrams appearing ≥ 2 times in
    * the document — and `top_bigram_char_frac` — the fraction of
    * bigram-occurrence characters covered by the single most frequent
    * bigram (ties break on the lexicographically smallest bigram, so
    * the winner is a pure function of the data). Both quantized to
    * 1e-4 by the engine-determinism doctrine; both 0.0 for documents
    * too short to repeat (≤ one shingle window). */
  def gopherSignals(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def gramCounts(n: Int): DataFrame = docs
      .select(col(idCol), explode(Dedup.wordShingles(col(textCol), n)).as("g"))
      .groupBy(idCol, "g").agg(count(lit(1)).as("cnt"))

    val tri = gramCounts(3).groupBy(idCol).agg(
      sum(col("cnt") * length(col("g"))).as("total_chars"),
      sum(when(col("cnt") >= 2, col("cnt") * length(col("g")))
        .otherwise(0L)).as("dup_chars"))

    // min(struct(-cnt, g)) = highest count, then smallest bigram — the
    // single-row argmax without a per-doc ordered window
    val bi = gramCounts(2).groupBy(idCol).agg(
      sum(col("cnt") * length(col("g"))).as("total2"),
      min(struct((-col("cnt")).as("nc"), col("g").as("g"))).as("top"))

    tri.join(bi, idCol)
      .select(col(idCol),
        quant4(when(col("total_chars") > 0,
          col("dup_chars").cast("double") / col("total_chars"))
          .otherwise(0.0)).as("dup_tri_char_frac"),
        quant4(when(col("total2") > 0,
          (-col("top.nc") * length(col("top.g"))).cast("double") /
            col("total2"))
          .otherwise(0.0)).as("top_bigram_char_frac"))
  }

  /** Per-document deflate compression ratio (compressed/raw bytes of the
    * UTF-8 text) — the entropy-side quality signal of web-scale
    * curation stacks: templated/looped text compresses far below
    * natural prose, binary-ish noise compresses above it. This is the
    * ONE text signal that runs outside Catalyst expressions —
    * entropy coding is not expressible as a column tree — so it takes
    * the same `mapPartitions` route as the multimodal decode: typed,
    * partition-local, zero shuffle, one `Deflater` instance reused
    * (reset) per partition rather than allocated per row. Ratios are
    * floor-quantized to 1e-4; byte counts are exact. Rows-only in the
    * correctness harness (DuckDB has no deflate) — planted orderings
    * are spec'd in TextAnalysisSpec. */
  def compressionRatio(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION)
        val buf = new Array[Byte](8192)
        it.map { case (id, text) =>
          val raw = Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var n = 0L
          while (!deflater.finished()) n += deflater.deflate(buf)
          val ratio =
            if (raw.length > 0) n.toDouble / raw.length else 1.0
          (id, raw.length.toLong, n,
            math.floor(ratio * 10000.0 + 0.5) / 10000.0)
        }
      }
      .toDF(idCol, "n_bytes", "n_deflate", "deflate_ratio")
  }
}
