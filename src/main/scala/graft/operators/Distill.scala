package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distills a rule-based quality gate into a LEARNED linear scorer — the
  * fastText-classifier stance of the public curation pipelines (a cheap
  * model trained to reproduce an expensive or hand-tuned signal, then
  * applied as the production gate), built so the whole TRAINING RUN is
  * replayable in the DuckDB oracle:
  *
  *   - features are hashed bag-of-words PRESENCE bits: each document's
  *     distinct lowercased tokens hash to 256 two-hex-char buckets
  *     (plus one `__bias__` bucket every document carries), value 1000
  *     in milli units. Presence (not frequency) keeps every feature on
  *     the SAME scale — the frequency form puts the bias at 100× the
  *     per-token columns and full-batch gradient descent on that
  *     conditioning oscillates instead of converging (measured).
  *   - the model is logistic-style with a HARD sigmoid
  *     `p = clamp(0.5 + z/4, 0, 1)` evaluated in integer milli units:
  *     `p_milli = clamp(500 + z_micro/4000, 0, 1000)` with one
  *     IEEE-double floor — no exp(), whose libm rounding differs
  *     across engines. Saturation is hinge-like: a correctly-classified
  *     saturated doc contributes zero gradient, a wrongly-classified
  *     one contributes full magnitude.
  *   - training is full-batch gradient descent, `iters` steps of
  *     `w_b ← w_b − floor(η · Σ_docs∋b err_milli · 1000 / (n·10⁶))`,
  *     every intermediate an exact 64-bit integer (sums are
  *     order-independent) or an exactly-representable double — so
  *     Spark and DuckDB produce bit-identical weights after any number
  *     of steps.
  *
  * Scale shape: one corpus scan per GD step — the z/err projection and
  * the per-bucket gradient partial-aggregate to ≤ 257 rows before the
  * only exchange; the weight vector lives as a bounded driver map
  * (the IVF-centroid precedent) broadcast into each step's expressions
  * as a literal. Nothing per-step grows with the corpus, and scoring
  * is a pure zero-shuffle projection. The sufficient statistics of GD
  * are the per-doc rows themselves (unlike the LM/DSIR/DoReMi count
  * models there is NO mergeable count table to persist), so the
  * persistable artifact is the fitted weight TABLE — refits rebuild,
  * stated here once.
  */
object Distill {

  /** Milli-units learning rate (1000 = η 1.0) and step count. The
    * defaults converge on the fixture in 4 steps (99.7% teacher
    * agreement) — measured, not guessed. */
  final case class Config(iters: Int = 4, etaMilli: Long = 1000L)

  val BiasBucket = "__bias__"

  /** Distinct hashed-presence buckets of a document's tokens, bias
    * included — the model's entire feature view of a doc. */
  def featureBuckets(text: Column): Column =
    array_distinct(concat(
      array(lit(BiasBucket)),
      transform(split(trim(lower(text)), "\\s+"),
        t => substring(md5(t.cast("binary")), 1, 2))))

  /** z in micro units for a bucket array under a weight map literal:
    * every present feature contributes x = 1000 milli. */
  private def zMicro(buckets: Column, w: Map[String, Long]): Column =
    if (w.isEmpty) lit(0L) // typedLit cannot carry an empty map literal
    else {
      val wMap = typedLit(w)
      aggregate(buckets, lit(0L),
        (acc, b) => acc + coalesce(element_at(wMap, b), lit(0L))) * 1000L
    }

  /** err = p − y in milli units (hard sigmoid, integer-exact). */
  private def errMilli(z: Column, yMilli: Column): Column =
    least(lit(1000L), greatest(lit(0L),
      floor(lit(500.0) + z / lit(4000.0)).cast("long"))) - yMilli

  /** Fits the weights over `labeled(idCol, bucketsCol, labelCol)` where
    * label is 0/1. Returns the bounded weight map. The caller should
    * hand a PINNED frame (it is scanned once per GD step). */
  def fit(labeled: DataFrame, bucketsCol: String, labelCol: String,
      cfg: Config = Config()): Map[String, Long] = {
    val n = labeled.count()
    require(n > 0, "distill fit over an empty corpus")
    var w = Map.empty[String, Long]
    for (_ <- 1 to cfg.iters) {
      val err = errMilli(zMicro(col(bucketsCol), w),
        col(labelCol).cast("long") * 1000L)
      // one job: err projection → explode → ≤257-group partial agg
      val grads = labeled.select(err.as("err"), col(bucketsCol).as("bs"))
        .select(col("err"), explode(col("bs")).as("bucket"))
        .groupBy("bucket").agg(sum(col("err")).as("se"))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      val updated = grads.map { case (b, se) =>
        val gv = 1000.0 * se
        b -> (w.getOrElse(b, 0L) -
          math.floor(cfg.etaMilli * gv / (n * 1000000.0)).toLong)
      }
      // buckets untouched by this step's gradient keep their weight
      w = w ++ updated
    }
    w
  }

  /** Scores docs under fitted weights: zero-shuffle projection adding
    * `z_micro` and the 0/1 `student_pass` (z ≥ 0). */
  def score(docs: DataFrame, bucketsCol: String,
      w: Map[String, Long]): DataFrame = {
    val z = zMicro(col(bucketsCol), w)
    docs.withColumn("z_micro", z)
      .withColumn("student_pass", (col("z_micro") >= 0L).cast("int"))
  }

  /** The weight map as a sorted two-column frame (for output, the
    * persisted artifact, and the oracle hash). */
  def weightsFrame(spark: org.apache.spark.sql.SparkSession,
      w: Map[String, Long]): DataFrame = {
    import spark.implicits._
    w.toSeq.sortBy(_._1).toDF("bucket", "w")
  }

  // ---- DuckDB mirrors -------------------------------------------------

  /** Feature CTEs over `corpus(doc_id, text)`: `fxg(doc_id, bucket)`
    * distinct presence rows, bias included. */
  def featureSql(corpusRel: String, outName: String = "fxg"): String =
    s"""$outName AS (
       |  SELECT DISTINCT doc_id, bucket FROM (
       |    SELECT doc_id, substr(md5(tok), 1, 2) AS bucket
       |    FROM (SELECT doc_id,
       |            unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
       |          FROM $corpusRel)
       |    UNION ALL
       |    SELECT doc_id, '$BiasBucket' FROM $corpusRel))""".stripMargin

  /** The GD chain from `fxg` + `lab(doc_id, y)` to the final weight CTE
    * (returned name), replaying [[fit]] step for step. */
  def fitCtes(cfg: Config = Config()): (String, String) = {
    val steps = (1 to cfg.iters).map { t =>
      val (prev, cur) = (s"w${t - 1}", s"w$t")
      s"""z$t AS (
         |  SELECT f.doc_id, CAST(1000 * sum(w.w) AS BIGINT) AS z_micro
         |  FROM fxg f JOIN $prev w USING (bucket) GROUP BY 1),
         |e$t AS (
         |  SELECT l.doc_id,
         |    least(1000, greatest(0,
         |      CAST(floor(500.0 + z.z_micro / 4000.0) AS BIGINT)))
         |      - l.y * 1000 AS err
         |  FROM lab l JOIN z$t z USING (doc_id)),
         |g$t AS (
         |  SELECT f.bucket, CAST(1000.0 * sum(e.err) AS DOUBLE) AS gv
         |  FROM fxg f JOIN e$t e USING (doc_id) GROUP BY 1),
         |$cur AS (
         |  SELECT w.bucket,
         |    CAST(w.w - CAST(floor(${cfg.etaMilli} * coalesce(g.gv, 0.0)
         |         / (n.n * 1000000.0)) AS BIGINT) AS BIGINT) AS w
         |  FROM $prev w LEFT JOIN g$t g USING (bucket) CROSS JOIN n)"""
        .stripMargin
    }
    val base =
      s"""n AS (SELECT count(*) AS n FROM lab),
         |w0 AS (SELECT DISTINCT bucket, CAST(0 AS BIGINT) AS w FROM fxg),
         |${steps.mkString(",\n")}""".stripMargin
    (base, s"w${cfg.iters}")
  }
}
