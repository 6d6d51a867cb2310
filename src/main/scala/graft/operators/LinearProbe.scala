package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Closed-form supervised training IN the engine: a two-feature ridge
  * regression fit by the normal equations, computed entirely from
  * integer moment sums — the supervised member of the in-engine
  * training family (k-means, bigram LM, PCA, BPE are the others). The
  * FineWeb-Edu pattern in miniature: distill expensive judgments into
  * a cheap linear scorer the engine can apply in one projection.
  *
  * Determinism doctrine (the reason this is ORACLE-CHECKABLE, unlike
  * iterative gradient descent): per-row features arrive as INTEGERS
  * (milli-unit quantized upstream), so the nine moment sums are exact
  * and independent of partitioning and summation order; the 3×3 solve
  * is then one fixed-order Cramer formula over doubles cast from those
  * integers — bit-identical in any engine that mirrors the expression
  * tree, which the DuckDB oracle does verbatim. R² comes from the same
  * moments (SSE = Syy − 2wᵀb + wᵀAw), never from a float sum over
  * rows.
  *
  * Scale shape: ONE aggregate over the corpus (nine sums — map-side
  * partial, no shuffle beyond the single-row combine), then a one-row
  * projection. Training cost equals one scan at any corpus size.
  */
object LinearProbe {

  private def quant6(c: Column): Column =
    floor(c * 1000000.0 + 0.5) / 1000000.0

  private val momentCols = Seq("n", "s1", "s2", "s11", "s12", "s22",
    "sy", "s1y", "s2y", "syy")

  /** The exact integer moment frame of a feature batch (one row) —
    * ADDITIVE model state, the supervised twin of the LM's count table:
    * moments(a ∪ b) = moments(a) + moments(b) column-wise, so
    * incremental training folds a new batch's moments in and EXACT
    * unlearning subtracts a batch's moments — both bit-identical to a
    * retrain that saw (or never saw) the batch, because every entry is
    * an exact integer. */
  def moments(feats: DataFrame, x1Col: String, x2Col: String,
      yCol: String): DataFrame =
    feats.agg(
      count(lit(1)).as("n"),
      sum(col(x1Col)).as("s1"),
      sum(col(x2Col)).as("s2"),
      sum(col(x1Col) * col(x1Col)).as("s11"),
      sum(col(x1Col) * col(x2Col)).as("s12"),
      sum(col(x2Col) * col(x2Col)).as("s22"),
      sum(col(yCol)).as("sy"),
      sum(col(x1Col) * col(yCol)).as("s1y"),
      sum(col(x2Col) * col(yCol)).as("s2y"),
      sum(col(yCol) * col(yCol)).as("syy"))

  private def combine(a: DataFrame, b: DataFrame,
      op: (Column, Column) => Column): DataFrame = {
    val bb = b.select(momentCols.map(c => col(c).as(s"_b_$c")): _*)
    a.crossJoin(bb)
      .select(momentCols.map(c => op(col(c), col(s"_b_$c")).as(c)): _*)
  }

  /** Fold a batch's moments into the model state (append). */
  def addMoments(a: DataFrame, b: DataFrame): DataFrame = combine(a, b, _ + _)

  /** Exact unlearning: remove a batch's contribution entirely. */
  def subtractMoments(a: DataFrame, b: DataFrame): DataFrame =
    combine(a, b, _ - _)

  /** Fit y ≈ b0 + b1·x1 + b2·x2 with ridge strength `lambda` on the
    * slope terms (intercept unpenalized). Input columns must be
    * integral (the caller quantizes). Returns one row: n, b0, b1, b2,
    * r2 (coefficients quantized to 1e-6, r2 to 1e-6). */
  def ridge2(feats: DataFrame, x1Col: String, x2Col: String,
      yCol: String, lambda: Double = 1.0): DataFrame =
    ridgeFromMoments(moments(feats, x1Col, x2Col, yCol), lambda)

  /** The solve, from a moment frame — shared by one-shot, incremental,
    * and unlearned training (whose moment frames are bit-identical to
    * the equivalent one-shot's, so the fits are too). */
  def ridgeFromMoments(m: DataFrame, lambda: Double = 1.0): DataFrame = {
    // every downstream operation in ONE fixed order, doubles from the
    // exact integer moments — the oracle mirrors this tree verbatim
    val n = col("n").cast("double")
    val s1 = col("s1").cast("double"); val s2 = col("s2").cast("double")
    val s11 = col("s11").cast("double") + lambda
    val s12 = col("s12").cast("double")
    val s22 = col("s22").cast("double") + lambda
    val sy = col("sy").cast("double")
    val s1y = col("s1y").cast("double"); val s2y = col("s2y").cast("double")
    val syy = col("syy").cast("double")
    val det = n * (s11 * s22 - s12 * s12) -
      s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
    val det0 = sy * (s11 * s22 - s12 * s12) -
      s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)
    val det1 = n * (s1y * s22 - s12 * s2y) -
      sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)
    val det2 = n * (s11 * s2y - s1y * s12) -
      s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)
    val b0 = det0 / det; val b1 = det1 / det; val b2 = det2 / det
    val sseModel = syy - lit(2.0) * (b0 * sy + b1 * s1y + b2 * s2y) +
      (b0 * (b0 * n + b1 * s1 + b2 * s2) +
        b1 * (b0 * s1 + b1 * (s11 - lambda) + b2 * s12) +
        b2 * (b0 * s2 + b1 * s12 + b2 * (s22 - lambda)))
    val sseMean = syy - sy * sy / n
    m.select(col("n"),
      quant6(b0).as("b0"), quant6(b1).as("b1"), quant6(b2).as("b2"),
      quant6(lit(1.0) - sseModel / sseMean).as("r2"))
  }
}
