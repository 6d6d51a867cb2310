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
}
