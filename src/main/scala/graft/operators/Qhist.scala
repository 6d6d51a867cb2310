package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable log-bucketed QUANTILE histograms — the third sketch
  * family next to [[Hll]] (distinct counts) and [[CountMin]]
  * (frequencies): "what is the p-th percentile of this per-doc
  * metric" answered from a bounded register table instead of a
  * corpus-wide rank pass. The exact-percentile machinery
  * ([[Ops.kthOrderedValueFrame]]) pays a 3-pass bucketed prefix over
  * the corpus PER QUESTION; the histogram pays ONE corpus scan ever,
  * then every cutoff — any percentile, any time, any union of groups
  * — reads ≤ `maxBuckets` rows. The price is bounded relative error:
  * within a bucket the true value is known only to the bucket bounds.
  *
  * Bucketing (integer-exact, engine-portable — no logs, no floats
  * beyond exact powers of two): non-negative long `v` maps to
  *   - `v` itself for `v < 16` (the 16 exact small buckets);
  *   - otherwise with `b = bit_length(v)` (= `length(bin(v))` in both
  *     Spark and DuckDB — a positive integer renders with no leading
  *     zeros), the bucket keeps the top FIVE bits:
  *     `16 + (b - 5) * 16 + ((v div 2^(b-5)) - 16)`.
  *     `v div 2^(b-5)` is a 5-bit value in [16, 32), so each power-of-
  *     two decade splits into 16 sub-buckets — relative width 1/16
  *     (6.25%), the histogram's error bound. `2^(b-5)` is computed as
  *     `CAST(pow(2, b-5) AS BIGINT)`: powers of two are exactly
  *     representable in IEEE doubles through 2^62, so the cast is
  *     exact in both engines.
  * A non-negative long has bit length ≤ 63, so the largest bucket is
  * 16 + (63−5)·16 + 15 = 959 — the table is bounded at ~960 rows per
  * group whatever the corpus. Negative inputs violate the contract and
  * fail loudly in [[registers]] (a silent negative bucket id would
  * corrupt the histogram and its served bounds).
  *
  * Register algebra: counts — the same commutative group as
  * [[CountMin]], so per-slice histograms merge by ADDITION into the
  * union's histogram exactly (row-for-row), and a slice unlearns by
  * negation (exactly-cancelled buckets drop). A persisted store
  * therefore carries the keyed-batch replay discipline where a stream
  * feeds it; the one-shot forms here need none.
  *
  * Serving: the p-permille cutoff is the UPPER BOUND of the first
  * bucket whose running count reaches `ceil(p·N/1000)` — a windowed
  * cumsum over the BOUNDED table (partitioned by the group columns;
  * the partition-less-window doctrine concerns corpus-sized frames,
  * and this one is ≤ 976 rows per group by construction). The served
  * cutoff c guarantees: at least p‰ of values are ≤ c, and c exceeds
  * the true p-th percentile by at most one bucket width (6.25%
  * relative).
  */
object Qhist {
  /** Sub-buckets per power-of-two decade (top 5 bits kept). */
  val subBuckets = 16
  /** Bucket-table size bound for 63-bit longs (max bucket id 959). */
  val maxBuckets = 960

  /** The bucketing as a Spark-SQL/DuckDB-shared expression over a
    * column NAME — `div` is integral in both dialects, so no double
    * division ever touches the value. */
  private def bucketExprSql(v: String, divOp: String): String =
    s"""CASE WHEN $v < 16 THEN CAST($v AS INT)
       |ELSE CAST(16 + (length(bin($v)) - 5) * 16
       |  + ($v $divOp CAST(pow(2, length(bin($v)) - 5) AS BIGINT)) - 16
       |  AS INT) END""".stripMargin

  /** Bucket id of a non-negative long column (by name). */
  def bucketOf(vName: String): Column =
    expr(bucketExprSql(vName, "div"))

  /** Inclusive upper value bound of a bucket id — the served cutoff
    * value: the largest v mapping to the bucket. */
  def bucketUpper(bucket: Column): Column = {
    val sub = ((bucket - 16) % 16).cast("long")
    val base = pow(lit(2.0), ((bucket - 16) / 16).cast("int")
      .cast("double")).cast("long")
    when(bucket < 16, bucket.cast("long"))
      .otherwise((lit(16L) + sub + 1L) * base - 1L)
  }

  /** Per-group histogram `(groupCols…, bucket, cnt)` over a
    * non-negative long metric — one scan, map-side partial sum to
    * ≤ [[maxBuckets]] rows per group. */
  def registers(df: DataFrame, valueCol: String,
      groupCols: Seq[String] = Nil): DataFrame =
    df.select(groupCols.map(col) :+
        col(valueCol).cast("long").as("__qh_v"): _*)
      // contract enforcement, not a filter: a negative metric would
      // silently emit a negative bucket id with an inconsistent upper
      // bound, corrupting the histogram — fail the job loudly instead
      // (CASE evaluates lazily, so the error fires only on violation)
      .select(groupCols.map(col) :+
        when(col("__qh_v") < 0, raise_error(concat(
            lit("Qhist.registers: negative metric value "),
            col("__qh_v").cast("string"),
            lit(s" in column $valueCol (non-negative-long contract)"))))
          .otherwise(col("__qh_v")).as("__qh_v"): _*)
      .select(groupCols.map(col) :+
        bucketOf("__qh_v").as("bucket"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).cast("long").as("cnt"))

  /** Register-wise fold (merge of sketches; compaction of a store).
    * Exactly-cancelled buckets drop — unlearn equals rebuild. */
  def fold(regs: DataFrame, groupCols: Seq[String] = Nil): DataFrame =
    regs.groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(sum(col("cnt")).as("cnt"))
      .where(col("cnt") =!= 0L)

  /** Percentile cutoffs from a folded register table: one row per
    * (group, p_permille) with the served cutoff value (the matched
    * bucket's upper bound). `ps` are permille ranks (500 = median).
    * All work is over the bounded table: a per-group cumsum window
    * plus a broadcast of the permille list. */
  def cutoffs(regs: DataFrame, ps: Seq[Int],
      groupCols: Seq[String] = Nil): DataFrame = {
    val spark = regs.sparkSession
    import spark.implicits._
    val w = Window.partitionBy((if (groupCols.isEmpty) Seq(lit(0))
      else groupCols.map(col)): _*).orderBy("bucket")
    val cum = regs
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(
        Window.partitionBy((if (groupCols.isEmpty) Seq(lit(0))
          else groupCols.map(col)): _*)))
    cum.crossJoin(broadcast(ps.toDF("p_permille")))
      .where(col("cum") * 1000L >= col("p_permille") * col("total"))
      .groupBy((groupCols :+ "p_permille").map(col): _*)
      .agg(min(col("bucket")).as("bucket"))
      .withColumn("cutoff", bucketUpper(col("bucket")))
  }

  /** DuckDB mirror of [[bucketOf]] over expression `$v`. */
  def bucketSql(v: String): String = bucketExprSql(v, "//")

  /** DuckDB mirror of [[bucketUpper]] over expression `$b`. */
  def bucketUpperSql(b: String): String =
    s"""CASE WHEN $b < 16 THEN CAST($b AS BIGINT)
       |ELSE (16 + (($b - 16) % 16) + 1)
       |  * CAST(pow(2, ($b - 16) // 16) AS BIGINT) - 1 END""".stripMargin

  /** DuckDB mirror of [[registers]] over `$from((grpExpr) AS g…,
    * ($vExpr) AS v)`. */
  def registersSql(from: String, vExpr: String,
      grpExprs: Seq[(String, String)] = Nil): String = {
    val grpSel = grpExprs.map { case (e, n) => s"$e AS $n, " }.mkString
    val grpRef = grpExprs.map(_._2 + ", ").mkString
    val by = (grpExprs.map(_._2) :+ "bucket")
      .zipWithIndex.map(_._2 + 1).mkString(", ")
    s"""SELECT ${grpRef}bucket, CAST(count(*) AS BIGINT) AS cnt FROM (
       |  SELECT ${grpSel}${bucketSql(vExpr)} AS bucket FROM $from)
       |GROUP BY $by""".stripMargin
  }
}
