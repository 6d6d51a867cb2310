package graft

import graft.Tables.load
import graft.operators.Shapley

/** Data-valuation queries — what is each slice of the corpus WORTH to
  * the model? Leave-one-out ablation (the ext_source_ablation family)
  * answers it against the full remainder only; exact Shapley
  * (Ghorbani & Zou 2019) averages over every coalition, so redundant
  * slices split their shared credit instead of both scoring zero. */
object ValuationQueries {

  private val Groups = 5

  /** One player per fixture source (src0..src19) — the granularity the
    * exact game cannot reach. */
  private val SampledGroups = 20
  private val SampledPerms = 24

  private[graft] val defs: Seq[QueryDef] = Seq(

    // Exact Shapley value of 5 source GROUPS over the frozen-eval
    // bigram-LM loss: one corpus pass (per-group count slices), 2^5
    // coalition models as slice SUMS (counts are a commutative group —
    // zero retrains), ONE eval-scoring pass across all coalitions,
    // then the exact factorial-weighted fold on 32 driver rows. All
    // integer after the milli-bit quantization, so the whole value
    // table — including negative values — hash-matches the oracle.
    QueryDef("ext_source_shapley",
      Some(s"""WITH evald AS (
              |  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
              |trainpl AS (
              |  SELECT 'g' || CAST(CAST(regexp_extract(source, '[0-9]+', 0)
              |      AS BIGINT) % $Groups AS VARCHAR) AS player,
              |    text
              |  FROM documents WHERE doc_id % 97 <> 0),
              |${Shapley.oracleSql(Groups)}""".stripMargin),
      (s, dir) => Shapley.sourceShapley(
        load(s, dir, "documents").select("doc_id", "source", "text"),
        nGroups = Groups)),

    // SAMPLED Shapley at PER-SOURCE granularity (P = 20 players — past
    // the exact enumerator's P ≤ 12 guard): 24 deterministic
    // hash-derived permutations visit ≤ 2·24·20 distinct prefix
    // coalitions where exact would need 2^20 models. Fully
    // VALUE-oracle'd — the permutations are a pure function of
    // (seed, m, player) md5 keys, so DuckDB re-derives the identical
    // walk and the integer milli-bit algebra hashes exactly
    // (ShapleySpec separately proves the estimator equals the exact
    // fold bit-for-bit when given all P! permutations).
    QueryDef("ext_source_shapley_sampled",
      Some(s"""WITH evald AS (
              |  SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
              |trainpl AS (
              |  SELECT 'g' || CAST(CAST(regexp_extract(source, '[0-9]+', 0)
              |      AS BIGINT) % $SampledGroups AS VARCHAR) AS player,
              |    text
              |  FROM documents WHERE doc_id % 97 <> 0),
              |${Shapley.sampledOracleSql(SampledGroups, SampledPerms)}"""
        .stripMargin),
      (s, dir) => Shapley.sampledSourceShapley(
        load(s, dir, "documents").select("doc_id", "source", "text"),
        nGroups = SampledGroups, nPerms = SampledPerms))
  )
}
