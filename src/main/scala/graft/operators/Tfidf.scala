package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction (reference has no analogue; this is part of
  * the LLM-pipeline surface: per-document top terms for doc
  * representation / quality routing).
  *
  * Scoring uses a LINEAR idf scaled to integers — tf · ((1e6 · N) div
  * df) — so ranking and output are exact integer arithmetic in every
  * engine (a float ln() idf risks cross-engine ulp drift at rank
  * boundaries; the monotone-in-df linear form keeps it portable).
  *
  * Scale shape: term frequencies aggregate with map-side partials; the
  * top-k window partitions by doc_id — an unbounded-cardinality key, so
  * it spreads across the cluster at any corpus size. The one join —
  * per-doc tf rows against the corpus-wide document frequencies — is
  * where zipfian skew lives: a stop word appears in nearly every
  * document, so a plain shuffle join on `term` funnels its tf rows
  * through one reducer. Two skew-safe paths:
  *
  *   - `broadcastVocab = true` (default): broadcast the (term, df)
  *     table. The corpus side never shuffles for the join at all.
  *     SAFE under the documented vocab bound: distinct alphabetic terms
  *     of length ≥ 3 grow sub-linearly in corpus size (Heaps' law) and
  *     plateau around 10^6–10^7 for natural-language text — tens of MB
  *     as (term, df) pairs, comfortably broadcastable. A pathological
  *     vocabulary (random strings, OCR noise) can exceed that;
  *   - `broadcastVocab = false`: [[Ops.saltedJoin]] spreads each hot
  *     term over `nSalts` shuffle partitions — the fallback when the
  *     vocabulary is beyond broadcast range. Value-identical to the
  *     broadcast path (TfidfSpec pins parity and both plan shapes).
  */
object Tfidf {

  /** Per-document term frequencies: (doc_id, term, tf) for alphabetic
    * terms of length ≥ 3. Map-side partial aggregation applies — the
    * exploded token stream combines locally before the one shuffle. */
  def termFrequencies(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .where(length(col("term")) >= 3)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Top-`k` terms per document by the integer TF-IDF score, ties broken
    * alphabetically. Output: (doc_id, term, score_m), unordered. */
  def topTerms(docs: DataFrame, k: Int = 3, broadcastVocab: Boolean = true,
      nSalts: Int = 8): DataFrame = {
    // Materialization boundary: tf feeds the document-frequency
    // aggregation AND the scored join's stream side — without it the
    // tokenize+explode+count chain (shuffle included) runs twice. Lazy
    // localCheckpoint computes once; blocks drain via the context
    // cleaner when the frame drops (the Dedup boundary stance). Routed
    // through Ops.checkpointKeepPartitioning so construction stays
    // job-free — a plain lazy localCheckpoint planned under AQE runs
    // the corpus shuffle at CONSTRUCTION time (see the helper's
    // scaladoc); the captured (doc, term) layout is incidental here.
    val tf = Ops.checkpointKeepPartitioning(termFrequencies(docs))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scoredInput =
      if (broadcastVocab) tf.join(broadcast(dfreq), "term")
      else Ops.saltedJoin(tf, dfreq, "term", nSalts)
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_m").desc, col("term").asc)
    scoredInput.crossJoin(broadcast(nDocs))
      .withColumn("score_m", expr("tf * ((1000000L * n_docs) div df)"))
      .withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select("doc_id", "term", "score_m")
  }
}
