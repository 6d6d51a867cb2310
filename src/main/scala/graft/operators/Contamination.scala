package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection (LLM-pipeline surface): how many
  * word n-gram shingles each corpus document shares with a held-out
  * evaluation set. One explode per side + one equi-join on the shingle —
  * never an all-pairs document comparison.
  *
  * Two join shapes for the two regimes an eval set comes in:
  *
  *   - `broadcastEval = true` (default): eval suites are small —
  *     thousands of documents, a few million distinct shingles — so the
  *     distinct-deduped eval side broadcasts and the corpus never
  *     shuffles for the join. This is the 100 TB fast path.
  *   - `broadcastEval = false`: the shuffle-by-shingle fallback for
  *     eval sets beyond broadcast range (e.g. checking one corpus slice
  *     against another). Forced to a shuffle join via the merge hint;
  *     hot shingles (common trigrams) are split at runtime by AQE's
  *     skew-join handling over the sort-merge shape. At petabyte scale
  *     the join key would narrow to xxhash64(shingle) — 8 bytes moved
  *     instead of strings, at 2^-64 collision odds — kept as the exact
  *     string here so both paths are value-identical
  *     (ContaminationSpec pins parity on the same fixture).
  */
object Contamination {

  /** Distinct shingles of the eval set, one row per shingle. */
  def evalShingles(evalDocs: DataFrame, n: Int = 3): DataFrame =
    evalDocs
      .select(explode(array_distinct(Dedup.wordShingles(col("text"), n))).as("s"))
      .distinct()

  /** (doc_id, n_shared): corpus documents with ≥1 shingle in the eval
    * set and the count of distinct shared shingles. */
  def sharedShingleCounts(corpus: DataFrame, evalDocs: DataFrame,
      n: Int = 3, broadcastEval: Boolean = true): DataFrame = {
    val ev = evalShingles(evalDocs, n)
    val corpusShingles = corpus.select(col("doc_id"),
      explode(array_distinct(Dedup.wordShingles(col("text"), n))).as("s"))
    val joined =
      if (broadcastEval) corpusShingles.join(broadcast(ev), "s")
      else corpusShingles.join(ev.hint("shuffle_merge"), "s")
    joined.groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
  }

  /** Leak FORENSICS — which eval document leaked into which corpus
    * document: `(doc_id, eval_id, n_shared)` with the count of
    * distinct shingles the pair shares, at or above `minShared`. The
    * per-doc count answers "is this doc contaminated"; this answers
    * the decon reviewer's next question, "by WHAT" — the table a leak
    * postmortem or an eval-suite fix starts from. Still never an
    * all-pairs document comparison: one explode per side, one
    * equi-join on the shingle, one (doc, eval) count — output is
    * bounded by actual leakage, and the eval side (now per-eval-doc
    * rather than globally distinct) remains broadcast-sized for any
    * real eval suite. */
  def sharedShinglePairs(corpus: DataFrame, evalDocs: DataFrame,
      n: Int = 3, minShared: Long = 1L,
      broadcastEval: Boolean = true): DataFrame = {
    val ev = evalDocs.select(col("doc_id").as("eval_id"),
      explode(array_distinct(Dedup.wordShingles(col("text"), n))).as("s"))
    val corpusShingles = corpus.select(col("doc_id"),
      explode(array_distinct(Dedup.wordShingles(col("text"), n))).as("s"))
    val joined =
      if (broadcastEval) corpusShingles.join(broadcast(ev), "s")
      else corpusShingles.join(ev.hint("shuffle_merge"), "s")
    joined.groupBy("doc_id", "eval_id").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** The FRACTION form of the check — per document, what share of its
    * distinct shingles the eval set contains: `(doc_id, n_shingles,
    * n_shared, frac, flagged)` for EVERY corpus doc (zero-overlap docs
    * included). Fraction thresholds are the PaLM/GPT-4-style
    * contamination rule (a long doc sharing 10 shingles is noise; a
    * short doc sharing 80% of itself is a leak) — the count form's
    * complement, not replacement. `frac` floors onto the 1e-4 grid so
    * the ratio can never hash-flip on engine division order. */
  def sharedShingleFractions(corpus: DataFrame, evalDocs: DataFrame,
      n: Int = 3, flagAt: Double = 0.5,
      broadcastEval: Boolean = true): DataFrame = {
    val ev = evalShingles(evalDocs, n)
    // pinned: TWO consumers (the exploded join and the per-doc size
    // projection) — unpinned, the corpus-sized tokenize+shingle pass
    // would run twice (the rawFeats doctrine from the DSIR path)
    // eager: the exploded-join branch and the per-doc size branch are
    // parallel stages of one statement — a lazy pin gets first-forced
    // by both concurrently (the convoy); materialize the corpus-sized
    // shingle pass once instead
    val withSh = Ops.checkpointKeepPartitioning(
      corpus.select(col("doc_id"),
        array_distinct(Dedup.wordShingles(col("text"), n)).as("sh")),
      eager = true)
    val exploded = withSh.select(col("doc_id"), explode(col("sh")).as("s"))
    val joined =
      if (broadcastEval) exploded.join(broadcast(ev), "s")
      else exploded.join(ev.hint("shuffle_merge"), "s")
    val shared = joined.groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    withSh.select(col("doc_id"), size(col("sh")).cast("long").as("n_shingles"))
      .join(shared, Seq("doc_id"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("frac",
        floor(col("n_shared").cast("double") / col("n_shingles")
          * lit(10000.0) + lit(0.5)) / lit(10000.0))
      .withColumn("flagged", (col("frac") >= flagAt).cast("int"))
  }
}
