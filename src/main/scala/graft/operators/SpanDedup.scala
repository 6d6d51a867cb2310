package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document repeated-SPAN removal — the ExactSubstr deduplication
  * of Lee et al., "Deduplicating Training Data Makes Language Models
  * Better" (arXiv:2107.06499), at word-k-gram granularity: any text run
  * that appears verbatim in ≥ `minDocs` distinct documents is removed
  * from every document it appears in. This sits between whole-document
  * dedup ([[Dedup.exactDuplicateGroups]]) and line dedup
  * ([[Dedup.paragraphDedup]]): it catches boilerplate sentences and
  * quoted passages that ride inside otherwise-unique documents.
  *
  * The suffix-array the paper builds is a single-machine structure; the
  * distributed formulation uses the standard k-gram cover: every
  * verbatim repeat of length ≥ k contains a repeated k-gram, and the
  * union of flagged k-gram extents IS the union of maximal repeated
  * runs of length ≥ k (shorter repeats are deliberately below the
  * threshold, exactly the paper's 50-token floor). So: explode k-gram
  * starts, count distinct docs per shingle (one map-side-combined
  * shuffle keyed by the shingle), semi-join the starts back (shuffle
  * join on the same key — the flagged side can be corpus-scale, so
  * never a broadcast), and merge per-doc flagged extents into maximal
  * spans with a per-doc window (bounded by document length).
  *
  * Scale notes: positions move once per token (the explode is ~k× the
  * corpus in bytes because each shingle string repeats its tokens k
  * times — at petabyte scale the join key narrows to a fixed-width
  * shingle digest, md5 being engine-portable if oracle parity must
  * hold; kept as the exact string here so DuckDB replays the query
  * verbatim). The only window is partitioned by doc_id. Removal
  * applies per doc via a bounded span-array lookup — no second
  * corpus-wide pass.
  *
  * Removal semantics are the released ExactSubstr tool's: EVERY
  * occurrence of a flagged span is cut (the paper notes keeping one
  * copy changes little); a keep-one variant composes by exempting the
  * min-(doc_id, start) occurrence per shingle before the cover merge.
  */
object SpanDedup {

  /** Filtered token array (DuckDB-parity: `list_filter(string_split_
    * regex(trim(lower(text)), '\s+'), x -> x <> '')`). Shared with
    * GraphQueries' shared-shingle source graph so the two families
    * tokenize identically. */
  private[graft] def toks(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), t => t =!= "")

  /** (doc_id, start, s): every k-gram shingle with its 1-based start
    * position over the filtered tokens. Docs shorter than k emit
    * nothing — they cannot contain a length-≥k repeat. */
  def shingleStarts(docs: DataFrame, k: Int): DataFrame = {
    require(k >= 2, s"k-gram size must be ≥ 2, got $k")
    docs
      .select(col("doc_id"), toks(col("text")).as("__t"))
      .where(size(col("__t")) >= k)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("__t")) - (k - 1)),
        i => struct(i.as("start"),
          concat_ws(" ", slice(col("__t"), i, lit(k))).as("s")))).as("g"))
      .select(col("doc_id"), col("g.start").as("start"), col("g.s").as("s"))
  }

  /** Maximal removal spans: `(doc_id, span_start, span_end, n_tokens)`
    * — per doc, the merged extents (1-based token positions, inclusive)
    * of every k-gram occurring in ≥ `minDocs` distinct documents. */
  def removalSpans(docs: DataFrame, k: Int = 8,
      minDocs: Int = 2): DataFrame = {
    // pinned: the starts feed both the hot-shingle aggregation and the
    // flag join — unpinned, the corpus-sized tokenize+shingle explode
    // would run twice (the rawFeats doctrine). Eager: both consumers
    // are parallel subplans of one statement, so a lazy pin convoys
    // (the sharedShingleFractions stance)
    val starts = Ops.checkpointKeepPartitioning(
      shingleStarts(docs, k), eager = true)
    val hot = starts.groupBy("s")
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select("s")
    mergeExtents(starts.join(hot, "s")
      .select(col("doc_id"), col("start"),
        (col("start") + (k - 1)).as("end")))
  }

  /** The KEEP-ONE form (the paper's stated semantic: "remove all but
    * one occurrence of each duplicated substring"): per hot shingle,
    * the globally-FIRST occurrence — the STRUCT min of
    * (doc_id, start), lexicographic ordering, replayed in the oracle
    * as `min(ROW(doc_id, s0))` — is exempt from flagging, so one copy
    * of every repeated run survives where [[removalSpans]] cuts them
    * all. The struct form replaces the arithmetic `doc_id·10⁶ + start`
    * encoding, which wraps 63-bit longs once doc ids pass ~9.2e12
    * (real for 64-bit hash ids; silent at fixture scale — the
    * softDedupKeep overflow class). Exemption is shingle-granular: a
    * keeper occurrence can still lose FLANKING tokens to overlapping
    * hot shingles whose own keepers live elsewhere — inherent to the
    * k-gram cover (the suffix-array tool has the same edge at run
    * boundaries). */
  def removalSpansKeepFirst(docs: DataFrame, k: Int = 8,
      minDocs: Int = 2): DataFrame = {
    // eager: same convoy stance as removalSpans
    val starts = Ops.checkpointKeepPartitioning(
      shingleStarts(docs, k), eager = true)
    val hot = starts.groupBy("s")
      .agg(countDistinct(col("doc_id")).as("__nd"),
        min(struct(col("doc_id"), col("start"))).as("__kk"))
      .where(col("__nd") >= minDocs)
      .select("s", "__kk")
    mergeExtents(starts.join(hot, "s")
      .where(struct(col("doc_id"), col("start")) =!= col("__kk"))
      .select(col("doc_id"), col("start"),
        (col("start") + (k - 1)).as("end")))
  }

  /** Spans of `docs` flagged against an EXTERNAL hot-shingle set —
    * the serving half of [[removalSpans]], reused by the persisted
    * document-frequency index ([[IndexStore.removalSpansFromIndex]])
    * and the frozen-reference streaming twin. */
  def removalSpansAgainst(docs: DataFrame, hot: DataFrame,
      k: Int): DataFrame =
    mergeExtents(shingleStarts(docs, k).join(hot, "s")
      .select(col("doc_id"), col("start"),
        (col("start") + (k - 1)).as("end")))

  /** Merges flagged `(doc_id, start, end)` extents (inclusive) into
    * maximal spans: a new span opens where this start clears every
    * previous end + 1 (overlap AND adjacency both merge). The only
    * window is per doc — bounded by document length. */
  private def mergeExtents(flagged: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("start", "end")
    val prevMax = Window.partitionBy("doc_id").orderBy("start", "end")
      .rowsBetween(Window.unboundedPreceding, -1)
    flagged
      .withColumn("__new",
        when(col("start") > coalesce(max(col("end")).over(prevMax),
          lit(0L) - 1) + 1, 1L).otherwise(0L))
      .withColumn("__span", sum(col("__new")).over(byDoc))
      .groupBy(col("doc_id"), col("__span"))
      .agg(min(col("start")).cast("long").as("span_start"),
        max(col("end")).cast("long").as("span_end"))
      .withColumn("n_tokens", col("span_end") - col("span_start") + 1)
      .select("doc_id", "span_start", "span_end", "n_tokens")
  }

  /** The transform form: every doc with its flagged tokens removed —
    * `(doc_id, n_before, n_removed, clean_text)` for EVERY input doc
    * (docs with no flagged span pass through whole; `clean_text` is
    * whitespace-normalized — single spaces — on both engines). The
    * span table joins back per doc as a bounded array, and the token
    * filter is one positional `exists` over it — no corpus-wide second
    * pass, no window. */
  def cleanedDocs(docs: DataFrame, k: Int = 8, minDocs: Int = 2)
      : DataFrame =
    cleanedDocsWith(docs, removalSpans(docs, k, minDocs))

  /** [[cleanedDocs]] with the span table supplied — the serving form
    * for index-backed and streaming callers. */
  def cleanedDocsWith(docs: DataFrame, spanTable: DataFrame): DataFrame = {
    val spans = spanTable
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    docs
      .select(col("doc_id"), toks(col("text")).as("__t"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("__t")).cast("long").as("n_before"),
        filter(
          transform(col("__t"),
            (t, i) => struct(t.as("tok"), (i + 1).cast("long").as("pos"))),
          p => coalesce(!exists(col("__spans"),
            sp => p.getField("pos").between(
              sp.getField("span_start"), sp.getField("span_end"))),
            lit(true))).as("__kept"))
      .select(col("doc_id"), col("n_before"),
        (col("n_before") - size(col("__kept"))).cast("long")
          .as("n_removed"),
        concat_ws(" ", transform(col("__kept"),
          p => p.getField("tok"))).as("clean_text"))
  }
}
