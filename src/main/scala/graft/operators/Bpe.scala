package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Shingles, TextAnalysis}

/** Distributed byte-pair-encoding vocabulary induction (Sennrich et al.
  * 2016, public arXiv:1508.07909) — the tokenizer-side companion of the
  * curation stack: learn the merge table FROM the corpus the other
  * operators curate.
  *
  * Scale shape, stage by stage:
  *  - The corpus collapses to a DISTINCT-WORD frequency table first
  *    (`explode` → `groupBy(word)`), so every later iteration works on
  *    vocabulary-sized data, not corpus-sized — the classic BPE trick,
  *    and the reason this trains on 100 TB: a trillion tokens is a few
  *    million distinct words.
  *  - Each merge iteration is ONE shuffle (pair-count aggregate keyed
  *    by the pair) followed by a SINGLE-ROW argmax (`min(struct(-cnt,
  *    pair))` — no global sort, no per-key window), whose one row is
  *    the only thing the driver ever holds.
  *  - Applying the winning merge is a codegen'd literal `replace` over
  *    the symbol strings — no shuffle, no lambda.
  *
  * Symbol strings are DOUBLE-spaced ("  c  h  a  t  ") so a literal
  * replace of " a  b " with " ab " is exactly BPE's leftmost
  * non-overlapping merge: each neighbor keeps one of its two separator
  * spaces, so chained occurrences ("a a a") merge left-to-right the
  * way a sequential BPE implementation does, and the engine-portable
  * `replace` (DuckDB mirrors it verbatim) preserves the invariant.
  *
  * Each iteration re-materializes the vocabulary table via
  * `localCheckpoint` — bounded by vocabulary size — so plan depth does
  * not grow with the merge count (64 nested replaces would defeat
  * codegen).
  */
object Bpe {

  /** One learned merge: rank (1-based), the two symbols, and the pair's
    * weighted count at the time it won. */
  case class BpeMerge(merge_rank: Int, left_sym: String, right_sym: String,
      n_pair: Long)

  /** The double-spaced initial symbol string of a word column. */
  private[operators] def symbolString(word: org.apache.spark.sql.Column) =
    concat(regexp_replace(word, "(.)", "  $1"), lit("  "))

  /** Distinct-word frequency table of a corpus: (sym, freq). */
  private def vocabulary(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(symbolString(col("w")).as("sym"), col("freq"))

  /** Learn `numMerges` merges. Returns them in rank order. */
  def trainMerges(docs: DataFrame, textCol: String = "text",
      numMerges: Int = 4): Seq[BpeMerge] = {
    require(numMerges >= 1)
    var vocab = vocabulary(docs, textCol).localCheckpoint(true)
    val merges = Seq.newBuilder[BpeMerge]
    var k = 1
    var exhausted = false
    while (k <= numMerges && !exhausted) {
      val toks = split(trim(col("sym")), "\\s+")
      val top: Row = vocab
        .where(size(toks) >= 2)
        .select(explode(Shingles.ngramShingles(toks, 2)).as("pair"),
          col("freq"))
        .groupBy("pair").agg(sum("freq").as("cnt"))
        .agg(min(struct((-col("cnt")).as("nc"), col("pair").as("pair")))
          .as("top"))
        .select(col("top.pair"), (-col("top.nc")).as("cnt"))
        .head()
      if (top.isNullAt(0)) { exhausted = true }
      else {
        val Array(a, b) = top.getString(0).split(" ", 2)
        val cnt = top.getLong(1)
        merges += BpeMerge(k, a, b, cnt)
        val old = vocab
        vocab = vocab.select(
          replace(col("sym"), lit(s" $a  $b "), lit(s" $a$b ")).as("sym"),
          col("freq")).localCheckpoint(true)
        old.unpersist()
        k += 1
      }
    }
    // the last vocabulary state is dead once the merge table is out —
    // leave no pinned blocks behind (repeated-runs doctrine, DedupSpec)
    vocab.unpersist()
    merges.result()
  }

  /** The merge table as a DataFrame (rank order) — the `queries` form. */
  def trainMergesDF(spark: SparkSession, docs: DataFrame,
      textCol: String = "text", numMerges: Int = 4): DataFrame = {
    import spark.implicits._
    trainMerges(docs, textCol, numMerges).toDF()
  }

  /** Segment a text column with a learned merge table: per document,
    * the BPE symbol count after applying every merge in rank order —
    * the REAL-tokenizer token count next to t3's `bpeish` heuristic.
    * The merges arrive as literals (driver-held, vocabulary-bounded),
    * so the whole segmentation is one codegen'd projection: per word,
    * build the symbol string, chain the literal replaces, count
    * symbols; then sum over the words of the document. */
  def bpeTokenCount(text: org.apache.spark.sql.Column,
      merges: Seq[BpeMerge]): org.apache.spark.sql.Column = {
    // Apply to the whole doc at once: the double-spaced construction is
    // per-word, but since merges never cross the "  " word boundary —
    // a pattern " a  b " cannot straddle two words, which are separated
    // by FOUR spaces ("  " + "  ") — the whole-document string is
    // equivalent to per-word application.
    val docSym = concat(regexp_replace(
      regexp_replace(trim(lower(text)), "\\s+", "    "), // 4-space word gap
      "([^ ])", "  $1"), lit("  "))
    val merged = merges.foldLeft(docSym) { (s, m) =>
      replace(s, lit(s" ${m.left_sym}  ${m.right_sym} "),
        lit(s" ${m.left_sym}${m.right_sym} "))
    }
    // whitespace-ONLY guard via regexp, not trim: trim strips spaces
    // only, so a tab-only doc would fall through and count one phantom
    // symbol (caught by the segment-consistency spec)
    when(regexp_replace(lower(text), "\\s", "") === "", 0)
      .otherwise(size(split(trim(merged), "\\s+")))
  }

  /** The segmentation itself: the document's BPE symbol sequence after
    * applying every merge in rank order, single-space-joined (word
    * boundaries dissolve — the downstream consumer is a token stream).
    * Same codegen'd literal-replace chain as [[bpeTokenCount]]; an
    * empty document segments to the empty string. */
  def bpeSegment(text: org.apache.spark.sql.Column,
      merges: Seq[BpeMerge]): org.apache.spark.sql.Column = {
    val docSym = concat(regexp_replace(
      regexp_replace(trim(lower(text)), "\\s+", "    "),
      "([^ ])", "  $1"), lit("  "))
    val merged = merges.foldLeft(docSym) { (s, m) =>
      replace(s, lit(s" ${m.left_sym}  ${m.right_sym} "),
        lit(s" ${m.left_sym}${m.right_sym} "))
    }
    when(regexp_replace(lower(text), "\\s", "") === "", lit(""))
      .otherwise(regexp_replace(trim(merged), "\\s+", " "))
  }
}
