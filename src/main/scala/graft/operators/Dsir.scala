package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Shingles

/** DSIR-style data selection: importance resampling over hashed n-gram
  * features (Xie et al., "Data Selection for Language Models via
  * Importance Resampling", arXiv:2302.03169). Given a small TARGET
  * corpus (the distribution you want more of — a Wikipedia-like source)
  * and a large RAW corpus (the crawl), fit bag-of-hashed-ngram models of
  * both, weight every raw document by its log-likelihood ratio, and
  * resample raw documents proportional to weight via deterministic
  * Gumbel top-k. This is the data-SELECTION rung above the per-row
  * quality heuristics (`t2`/Gopher/C4) and the corpus-statistics LM
  * filter ([[NgramLm]]): it steers the kept corpus TOWARD a target
  * distribution instead of merely away from junk. The reference
  * pipeline (a row-sync ETL, cf. /root/reference/sync-db.py) has no
  * counterpart; this is training-data-pipeline surface.
  *
  * Determinism doctrine (the [[NgramLm]] rules, applied twice):
  *   - Feature hashing is engine-portable: a feature's bucket is the
  *     first `hexChars` hex digits of `md5(feature)` kept AS A STRING —
  *     never a numeric conversion — so Spark and the DuckDB oracle
  *     agree byte-for-byte and the bucket space is exactly
  *     M = 16^hexChars.
  *   - Per-bucket log-ratios quantize to integer MILLI-BITS before the
  *     per-doc sum, so document weights are order-independent integer
  *     sums and last-ulp libm disagreement between engines cannot flip
  *     a hash (flip risk per term ~1e-12 on the 1e-3 grid).
  *   - The Gumbel perturbation derives its uniform from the 52-bit
  *     numeric value of `md5(doc_id)` — 13 hex digits, exactly
  *     representable in a double (the `ext_balanced_class_cap`
  *     precedent) — so "random" resampling is a pure function of the
  *     data, replayable by the oracle.
  *
  * Scale shape (100 TB raw corpus): fitting is one exploded-feature
  * `groupBy(bucket)` per corpus — map-side combine collapses every
  * partition to ≤M rows, so the shuffle moves O(partitions × M), not
  * corpus-sized data. The ratio table is ≤M rows (bounded, constant) and
  * BROADCASTS onto the scoring stream; scoring shuffles one thin
  * (doc_id, partial-sum) row per document per partition (explode keeps a
  * document's features partition-local, so the map-side partial
  * aggregation collapses each doc before the exchange). Selection is a
  * constant-k `TakeOrderedAndProject` — never a global sort. No stage
  * materializes more than the token stream it was handed.
  */
object Dsir {

  /** Hashed-feature stream: one row per unigram AND per space-joined
    * bigram occurrence, bucketed to the first `hexChars` hex digits of
    * its md5 — `(doc_id, bucket)`. Tokenization is [[NgramLm.cleanTokens]]
    * (lowercased whitespace tokens, whitespace-only → no rows); both
    * n-gram orders ride ONE explode over the concatenated arrays. */
  def bucketedFeatures(docs: DataFrame, hexChars: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(hexChars >= 1 && hexChars <= 8, s"hexChars=$hexChars out of range")
    val toks = NgramLm.cleanTokens(col(textCol))
    val bigs = when(size(toks) >= 2, Shingles.ngramShingles(toks, 2))
      .otherwise(array().cast("array<string>"))
    docs
      .select(col(idCol).as("doc_id"), explode(concat(toks, bigs)).as("feat"))
      .select(col("doc_id"),
        substring(md5(col("feat").cast("binary")), 1, hexChars).as("bucket"))
  }

  /** Per-bucket feature counts plus the corpus total as a lazy 1-row
    * frame — `(counts(bucket, c), total(n))`. */
  private def bucketCounts(feats: DataFrame): (DataFrame, DataFrame) = {
    val counts = feats.groupBy("bucket").agg(count(lit(1)).as("c"))
    (counts, counts.agg(coalesce(sum("c"), lit(0L)).as("n")))
  }

  /** Fitted importance model: per-bucket milli-bit log-likelihood
    * ratios over the FULL 16^hexChars bucket space (Laplace-smoothed),
    * materialized only for buckets seen in either corpus —
    * `(bucket, r_milli)` — plus the both-unseen floor ratio `r0_milli`
    * as a 1-row frame. A bucket's ratio is
    * `floor((log2((ct+1)/(CT+M)) − log2((cr+1)/(CR+M))) * 1000 + 0.5)`:
    * positive where the target over-represents the bucket. All frames
    * are lazy; constructing a model launches no jobs. */
  final case class Model(ratios: DataFrame, unseen: DataFrame, hexChars: Int)

  def fit(target: DataFrame, raw: DataFrame, hexChars: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): Model =
    fitBucketed(bucketedFeatures(target, hexChars, idCol, textCol),
      bucketedFeatures(raw, hexChars, idCol, textCol), hexChars)

  /** [[fit]] over pre-bucketed feature streams — callers that also
    * SCORE the raw corpus should bucket it once, pin the stream
    * ([[Ops.checkpointKeepPartitioning]]), and feed the same frame to
    * both fit and [[scoreWeightsBucketed]]: tokenization+hashing is the
    * corpus-sized cost here, and an unpinned plan pays it twice. */
  def fitBucketed(targetFeats: DataFrame, rawFeats: DataFrame,
      hexChars: Int): Model = {
    val (tc, _) = bucketCounts(targetFeats)
    val (rc, _) = bucketCounts(rawFeats)
    modelFromCounts(tc, rc, hexChars)
  }

  /** [[fitBucketed]] over already-aggregated per-bucket count tables
    * `(bucket, c)` — the form a PERSISTED model (additive counts, the
    * LM-table precedent) re-hydrates through. Totals re-derive from
    * the counts, so folded/negated appends need no side state. */
  def modelFromCounts(tcIn: DataFrame, rcIn: DataFrame,
      hexChars: Int): Model = {
    val m = math.pow(16.0, hexChars.toDouble)
    val tc = tcIn.select(col("bucket"), col("c"))
    val rc = rcIn.select(col("bucket"), col("c"))
    val tn = tc.agg(coalesce(sum("c"), lit(0L)).as("n"))
    val rn = rc.agg(coalesce(sum("c"), lit(0L)).as("n"))
    // full outer: target-only buckets still need a ratio (a scored doc
    // can hit them), raw-only buckets dominate at crawl scale
    val joined = tc.withColumnRenamed("c", "ct")
      .join(rc.withColumnRenamed("c", "cr"), Seq("bucket"), "full_outer")
      .crossJoin(broadcast(tn.withColumnRenamed("n", "tn")))
      .crossJoin(broadcast(rn.withColumnRenamed("n", "rn")))
    val ratio = floor(
      (log2((coalesce(col("ct"), lit(0L)) + lit(1.0)) / (col("tn") + lit(m))) -
       log2((coalesce(col("cr"), lit(0L)) + lit(1.0)) / (col("rn") + lit(m))))
        * lit(1000.0) + lit(0.5)).cast("long")
    val ratios = joined.select(col("bucket"), ratio.as("r_milli"))
    val unseen = tn.withColumnRenamed("n", "tn")
      .crossJoin(rn.withColumnRenamed("n", "rn"))
      .select(floor(
        (log2(lit(1.0) / (col("tn") + lit(m))) -
         log2(lit(1.0) / (col("rn") + lit(m)))) * lit(1000.0) + lit(0.5))
        .cast("long").as("r0_milli"))
    Model(ratios, unseen, hexChars)
  }

  /** Per-document importance log-weights in integer milli-bits:
    * `(doc_id, n_feats, w_milli)`. The ratio table broadcasts (≤16^hexChars
    * rows by construction); documents with no features are kept at
    * weight 0 so selection ranks every input row. */
  def scoreWeights(model: Model, docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    scoreWeightsBucketed(model,
      bucketedFeatures(docs, model.hexChars, idCol, textCol),
      docs.select(col(idCol).as("doc_id")))

  /** [[scoreWeights]] over a pre-bucketed feature stream; `ids` is the
    * (doc_id) universe for the zero-feature backfill. */
  def scoreWeightsBucketed(model: Model, feats: DataFrame,
      ids: DataFrame): DataFrame = {
    val scored = feats
      .join(broadcast(model.ratios), Seq("bucket"), "left")
      .crossJoin(broadcast(model.unseen))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("r_milli"), col("r0_milli"))).as("w_milli"))
    ids.join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("w_milli"), lit(0L)).as("w_milli"))
  }

  /** Stream-safe scoring: the per-doc weight aggregate WITHOUT the
    * zero-feature backfill join (a stream cannot join itself past its
    * own aggregation) and with `r0` resolved to a literal (a stream
    * cannot cross-join the lazy 1-row unseen frame — the
    * StreamingLmScore vocab precedent). A featureless document emits no
    * row; batch/stream parity over feature-bearing docs is spec'd in
    * StreamingSpec. */
  def scoreWeightsStream(ratios: DataFrame, r0Milli: Long, hexChars: Int,
      docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    bucketedFeatures(docs, hexChars, idCol, textCol)
      .join(broadcast(ratios), Seq("bucket"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"),
        sum(coalesce(col("r_milli"), lit(r0Milli))).as("w_milli"))

  /** Deterministic Gumbel key for sampling-without-replacement ∝
    * exp₂(w_milli/1000): `w_milli + floor(−log2(−ln u) * 1000 + 0.5)`
    * with `u = (md5₅₂(doc_id)+1) / (2⁵²+1)` — strictly inside (0,1), so
    * neither log can hit a pole. Exposed for the streaming twin. */
  def gumbelKey(idCol: Column, wMilli: Column): Column = {
    val hv = conv(substring(md5(idCol.cast("string").cast("binary")), 1, 13),
      16, 10).cast("double")
    val u = (hv + lit(1.0)) / lit(4503599627370497.0) // 2^52 + 1
    wMilli + floor(-log2(-log(u)) * lit(1000.0) + lit(0.5)).cast("long")
  }

  /** Gumbel top-k resample: the k raw documents selected without
    * replacement with probability ∝ their importance weight —
    * `(doc_id, n_feats, w_milli, key_milli)`, constant-k
    * TakeOrderedAndProject, doc_id tiebreak. */
  def resample(weights: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be positive")
    weights
      .withColumn("key_milli", gumbelKey(col("doc_id"), col("w_milli")))
      .orderBy(col("key_milli").desc, col("doc_id"))
      .limit(k)
  }
}
