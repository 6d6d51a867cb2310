package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketches (Flajolet et al. 2007), built
  * for the 100 TB reporting stance: a `count(distinct x)` over a
  * corpus-sized column shuffles every distinct value once, while the
  * HLL register table is a FIXED 512 rows per group — the corpus pays
  * one scan with a map-side partial `max` per register, the driver and
  * every downstream consumer only ever see the bounded table, and
  * sketches of two corpora merge by register-wise `max` without
  * touching either corpus again. The reference pipeline's row-count
  * bookkeeping (SURVEY §2 A4/S4) is the same question at toy scale;
  * this is the form that still answers it when the column is a
  * hundred-billion-shingle stream.
  *
  * Engine-portable register computation — every step replays
  * bit-for-bit in DuckDB so the register table itself is
  * oracle-checkable:
  *   - `h` = integer value of the first 13 hex digits of `md5(item)`
  *     (52 bits, the repo's standard replayable hash);
  *   - `idx = h mod 512` (p = 9 low bits picks the register);
  *   - `rho` = leading-zero count of the remaining 43-bit suffix + 1,
  *     computed WITHOUT floats as `44 - length(bin(q))` — `bin()`
  *     renders a positive integer with no leading zeros in both Spark
  *     and DuckDB, so its string length IS the bit length; `q = 0`
  *     (all 43 suffix bits zero) is the explicit `rho = 44` branch.
  *
  * The raw-HLL estimate stays in integer/IEEE-portable arithmetic:
  * `T = Σ_j 2^(44 − r_j)` summed over all 512 registers (absent
  * register rows contribute `2^44`, the `r = 0` term) is an exact
  * integer ≤ 512·2^44 = 2^53; `A = (512²·2^44) div T` is one 64-bit
  * floor division (numerator 2^62, no overflow); the final
  * `floor(α₅₁₂ · A)` is a single IEEE-double multiply of an exactly
  * representable integer, identical across engines. No linear-counting
  * small-range correction: it needs `ln`, whose libm rounding is not
  * pinned across engines — the documented consequence is downward bias
  * for cardinalities below ≈ 2.5·m = 1280, where the exact count is
  * cheap anyway.
  *
  * Merge/append algebra: a register row is an observed lower bound on
  * the register's true value and serving folds with `max`, which is
  * idempotent and commutative — so the persisted sketch store needs NO
  * batch-key replay discipline (unlike the additive LM/DoReMi count
  * tables): a crash-replayed append writes rows the fold absorbs.
  * The same algebra means a sketch CANNOT unlearn (max has no inverse)
  * — retiring a slice means rebuilding its sketch, stated here once.
  */
object Hll {
  /** Register-index bits: m = 512 registers. */
  val p = 9
  val m: Int = 1 << p
  /** Hash bits left after the index is peeled off: 52 − p. */
  val suffixBits: Int = 52 - p
  /** rho when the whole suffix is zero (max leading-zero run + 1). */
  val rhoMax: Int = suffixBits + 1
  /** α₅₁₂ = 0.7213 / (1 + 1.079/512), to 6 decimal digits. */
  val alpha512 = "0.719783"
  /** 512² · 2^44 = 2^62 — the estimate's constant numerator. */
  val scaledNumerator: Long = m.toLong * m.toLong * (1L << rhoMax)

  /** 52-bit replayable item hash (13 hex digits of md5). */
  def hash52(item: Column): Column =
    conv(substring(md5(item.cast("binary")), 1, 13), 16, 10).cast("long")

  /** Per-group register table `(groupCols…, idx, r)` over `itemCol` —
    * one corpus scan, partial-aggregated to ≤ 512 rows per group
    * before the (bounded) exchange. Duplicate items are absorbed by
    * the `max`, so callers never pre-distinct. */
  def registers(items: DataFrame, itemCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val h = hash52(col(itemCol))
    val q = shiftright(h, p)
    val rho = when(q === 0L, lit(rhoMax))
      .otherwise(lit(rhoMax) - length(bin(q)))
    items
      .select(groupCols.map(col) ++ Seq(
        pmod(h, lit(m.toLong)).cast("int").as("idx"),
        rho.cast("int").as("rho")): _*)
      .groupBy((groupCols :+ "idx").map(col): _*)
      .agg(max(col("rho")).as("r"))
  }

  /** Register-wise fold of (possibly repeated) register rows — the
    * merge of any number of sketches over the same grouping, and the
    * compaction of an append-only sketch store. */
  def fold(regs: DataFrame, groupCols: Seq[String] = Nil): DataFrame =
    regs.groupBy((groupCols :+ "idx").map(col): _*)
      .agg(max(col("r")).as("r"))

  /** Raw-HLL cardinality estimate per group from a FOLDED register
    * table (one row per (group, idx)). Emits the observed register
    * count and the scaled harmonic denominator alongside the estimate
    * so a reader can audit the arithmetic. */
  def estimate(regs: DataFrame, groupCols: Seq[String] = Nil): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) regs.groupBy()
      else regs.groupBy(groupCols.map(col): _*)
    grouped
      .agg(count(lit(1)).cast("long").as("n_regs"),
        sum(expr(s"shiftleft(cast(1 as bigint), $rhoMax - r)")).as("__s"))
      .withColumn("t_scaled",
        col("__s") + (lit(m.toLong) - col("n_regs")) * lit(1L << rhoMax))
      .withColumn("est",
        // α forced to DOUBLE in both engines: a bare decimal literal
        // lands in DECIMAL arithmetic whose scale/rounding rules are
        // dialect-specific; IEEE double multiply is pinned
        expr(s"cast(floor(cast($alpha512 as double) * " +
          s"(cast($scaledNumerator as bigint) div t_scaled)) as bigint)"))
      .drop("__s")
  }

  /** DuckDB mirror of [[registers]] over `$from((grpExpr) AS grp,
    * (itemExpr) AS item)` rows — callers splice it as a CTE body. */
  def registersSql(from: String, itemExpr: String,
      grpExprs: Seq[(String, String)] = Nil): String = {
    val grpSel = grpExprs.map { case (e, n) => s"$e AS $n, " }.mkString
    val grpBy = grpExprs.map(_._2)
    val grpRef = grpBy.map(_ + ", ").mkString
    val by = (grpBy :+ "idx").zipWithIndex.map(_._2 + 1).mkString(", ")
    s"""SELECT ${grpRef}idx, max(rho) AS r FROM (
       |  SELECT ${grpRef}h % $m AS idx,
       |    CASE WHEN h // $m = 0 THEN $rhoMax
       |         ELSE $rhoMax - length(bin(h // $m)) END AS rho
       |  FROM (SELECT ${grpSel}CAST(('0x' || substr(md5($itemExpr), 1, 13))
       |                 AS BIGINT) AS h
       |        FROM $from))
       |GROUP BY $by""".stripMargin
  }

  /** DuckDB mirror of [[estimate]] over a folded register CTE
    * `$regs(grpCols…, idx, r)`. */
  def estimateSql(regs: String, grpCols: Seq[String] = Nil): String = {
    val g = grpCols.map(_ + ", ").mkString
    val by =
      if (grpCols.isEmpty) ""
      else "GROUP BY " + grpCols.indices.map(_ + 1).mkString(", ")
    s"""SELECT ${g}n_regs, t_scaled,
       |  CAST(floor(CAST($alpha512 AS DOUBLE) *
       |             ($scaledNumerator // t_scaled)) AS BIGINT) AS est
       |FROM (
       |  SELECT ${g}CAST(count(*) AS BIGINT) AS n_regs,
       |    CAST(sum((CAST(1 AS BIGINT) << ($rhoMax - r))) AS BIGINT)
       |      + ($m - count(*)) * (CAST(1 AS BIGINT) << $rhoMax) AS t_scaled
       |  FROM $regs $by)""".stripMargin
  }
}
