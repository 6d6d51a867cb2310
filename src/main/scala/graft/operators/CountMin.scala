package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min frequency sketches (Cormode & Muthukrishnan 2005) — the
  * COUNTING sibling of the [[Hll]] cardinality sketch, built for the
  * same 100 TB reporting stance: an exact per-item frequency table
  * over a corpus-sized stream shuffles every distinct item once, while
  * the CM register table is a FIXED `depth × width = 768` rows per
  * group — the corpus pays one scan with a map-side partial `sum` per
  * register, and every downstream frequency question (is this shingle
  * boilerplate-hot? how often does this n-gram occur per source?) is
  * answered from the bounded table. The reference pipeline's row-count
  * bookkeeping (SURVEY §2 A4/S4) asks "how many rows"; this is the
  * sketch that still answers "how many of EACH" when the item space is
  * a hundred-billion-shingle stream.
  *
  * Engine-portable register computation — every step replays
  * bit-for-bit in DuckDB so the register CONTENT is oracle-checkable:
  *   - row `j`'s hash of an item is the integer value of the first 13
  *     hex digits of `md5(j || ':' || item)` (52 bits of the repo's
  *     standard replayable hash, salted per row so the `depth` hash
  *     functions are independent);
  *   - `idx = h mod 256` picks the register; the register value is the
  *     plain occurrence count — integer arithmetic end to end.
  *
  * Estimation: `est(item) = min_j c[j][h_j(item)]` over the `depth`
  * rows, with an absent register reading 0. The classic guarantees
  * hold: `est ≥ exact` ALWAYS (collisions only add), and
  * `est ≤ exact + εN` with probability `1 − δ` for `ε = e/width ≈
  * 1.06%`, `δ = e^−depth ≈ 5%` — and because both sides are integers
  * the overestimate property is spec-assertable exactly, not
  * approximately.
  *
  * Merge/unlearn algebra — the part [[Hll]] cannot do: registers are
  * SUMS, a commutative group. sketch(A) + sketch(B) = sketch(A ⊎ B)
  * EXACTLY (not just approximately — the register tables are equal
  * row-for-row), and sketch(total) − sketch(slice) = sketch(rest)
  * exactly, so a persisted sketch store supports the same
  * append-by-delta / unlearn-by-negation lifecycle as the LM and DSIR
  * count models ([[IndexStore]]), with compaction folding cancellation
  * pairs away. The flip side of additivity: a crash-REPLAYED append
  * double-counts (max would absorb it, sum does not), so the persisted
  * kind needs the keyed-batch replay discipline where a stream feeds
  * it.
  */
object CountMin {
  /** Independent hash rows. δ = e^−3 ≈ 5%. */
  val depth = 3
  /** Registers per row (power of two). ε = e/256 ≈ 1.06% of stream
    * mass. */
  val width = 256

  /** 52-bit replayable item hash for row `j`: md5 of `"j:item"`. */
  def hash52(row: Int, item: Column): Column =
    conv(substring(md5(concat(lit(s"$row:"), item.cast("string"))
      .cast("binary")), 1, 13), 16, 10).cast("long")

  private def idxFor(row: Int, item: Column): Column =
    pmod(hash52(row, item), lit(width.toLong)).cast("int")

  /** Per-group register table `(groupCols…, row_j, idx, c)` over
    * `itemCol` — one corpus scan, each occurrence routed to `depth`
    * registers, partial-aggregated to ≤ `depth·width` rows per group
    * before the (bounded) exchange. */
  def registers(items: DataFrame, itemCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val routed = explode(array((0 until depth).map(j =>
      struct(lit(j).as("row_j"), idxFor(j, col(itemCol)).as("idx"))): _*))
    items
      .select(groupCols.map(col) :+ routed.as("reg"): _*)
      .select(groupCols.map(col) ++ Seq(
        col("reg.row_j").as("row_j"), col("reg.idx").as("idx")): _*)
      .groupBy((groupCols ++ Seq("row_j", "idx")).map(col): _*)
      .agg(count(lit(1)).cast("long").as("c"))
  }

  /** Register-wise fold of (possibly repeated, possibly negated)
    * register rows — the merge of any number of sketches over the same
    * grouping, and the compaction of an append-only sketch store.
    * Zero rows are DROPPED so an exactly-cancelled register is
    * indistinguishable from one never touched — that is what makes
    * subtract-unlearn equal a rebuild row-for-row. */
  def fold(regs: DataFrame, groupCols: Seq[String] = Nil): DataFrame =
    regs.groupBy((groupCols ++ Seq("row_j", "idx")).map(col): _*)
      .agg(sum(col("c")).as("c"))
      .where(col("c") =!= 0L)

  /** Point estimates for a bounded candidate frame `cands(itemCol)`:
    * `(itemCol, est)` with `est = min_j c[j][h_j(item)]`, absent
    * registers reading 0. The register side is ≤ `depth·width` rows —
    * broadcast by construction — so estimation is a map-side join over
    * the candidates, never a corpus operation. */
  def estimate(regs: DataFrame, cands: DataFrame,
      itemCol: String = "item", groupCols: Seq[String] = Nil): DataFrame = {
    val routed = explode(array((0 until depth).map(j =>
      struct(lit(j).as("row_j"), idxFor(j, col(itemCol)).as("idx"))): _*))
    val keep = groupCols :+ itemCol
    cands
      .select(keep.map(col) :+ routed.as("reg"): _*)
      .select(keep.map(col) ++ Seq(col("reg.row_j").as("row_j"),
        col("reg.idx").as("idx")): _*)
      .join(broadcast(
          regs.select((groupCols ++ Seq("row_j", "idx", "c")).map(col): _*)),
        groupCols ++ Seq("row_j", "idx"), "left")
      .groupBy(keep.map(col): _*)
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** Per-OCCURRENCE estimates as a zero-shuffle projection: appends
    * `outCol` = the sketch estimate of `itemCol`'s frequency to every
    * row of a corpus-sized frame via `depth` BROADCAST joins against
    * the per-row register slices (≤ width rows each) + `least()` —
    * no explode, no re-aggregation, no exchange on the corpus side.
    * This is the serving shape that makes the sketch a per-row
    * PREDICATE ("is this line boilerplate-hot?") inside a scan,
    * where [[estimate]] answers for a bounded candidate list. */
  def withEstimate(df: DataFrame, itemCol: String, regs: DataFrame,
      outCol: String = "est"): DataFrame = {
    // contract: UNGROUPED registers only. A grouped table (e.g. raw
    // cmsRegistersFromIndex output, which carries grp) holds duplicate
    // idx rows across groups — the broadcast joins would multiply the
    // corpus rows and silently corrupt every downstream count. Callers
    // fold/select to one sketch first.
    require(regs.columns.toSet == Set("row_j", "idx", "c"),
      "withEstimate expects ungrouped registers with exactly " +
        s"(row_j, idx, c); got (${regs.columns.mkString(", ")}) — " +
        "fold or filter a grouped register table to ONE sketch first")
    val joined = (0 until depth).foldLeft(df) { (acc, j) =>
      acc.withColumn(s"__cms_i$j", idxFor(j, col(itemCol)))
        .join(broadcast(regs.where(col("row_j") === j)
            .select(col("idx").as(s"__cms_i$j"), col("c").as(s"__cms_c$j"))),
          Seq(s"__cms_i$j"), "left")
    }
    joined
      .withColumn(outCol, least((0 until depth)
        .map(j => coalesce(col(s"__cms_c$j"), lit(0L))): _*))
      .drop((0 until depth)
        .flatMap(j => Seq(s"__cms_i$j", s"__cms_c$j")): _*)
  }

  /** DuckDB mirror of [[registers]] over `$from((grpExpr) AS grp…,
    * (itemExpr) AS item)` rows — callers splice it as a CTE body. */
  def registersSql(from: String, itemExpr: String,
      grpExprs: Seq[(String, String)] = Nil): String = {
    val grpSel = grpExprs.map { case (e, n) => s"$e AS $n, " }.mkString
    val grpRef = grpExprs.map(_._2 + ", ").mkString
    val by = (grpExprs.map(_._2) ++ Seq("row_j", "idx"))
      .zipWithIndex.map(_._2 + 1).mkString(", ")
    s"""SELECT ${grpRef}row_j, idx, CAST(count(*) AS BIGINT) AS c FROM (
       |  SELECT ${grpSel}j AS row_j,
       |    CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
       |           $itemExpr), 1, 13)) AS BIGINT) % $width AS idx
       |  FROM $from, unnest(${(0 until depth).mkString("[", ", ", "]")})
       |    AS t(j))
       |GROUP BY $by""".stripMargin
  }

  /** DuckDB mirror of [[withEstimate]] over a register CTE named
    * `regs(row_j, idx, c)`: selects `$selectCols` plus `est` from
    * `$from`, chaining one LEFT JOIN per hash row. */
  def withEstimateSql(from: String, itemExpr: String,
      selectCols: String): String = {
    val joins = (0 until depth).map(j =>
      s"""LEFT JOIN (SELECT idx, c FROM regs WHERE row_j = $j) r$j
         |  ON CAST(('0x' || substr(md5('$j:' || $itemExpr), 1, 13))
         |     AS BIGINT) % $width = r$j.idx""".stripMargin)
      .mkString("\n")
    val le = (0 until depth).map(j => s"coalesce(r$j.c, 0)")
      .mkString(", ")
    s"""SELECT $selectCols, least($le) AS est
       |FROM $from
       |$joins""".stripMargin
  }

  /** DuckDB mirror of [[estimate]] over a folded register CTE
    * `$regs(row_j, idx, c)` and candidates `$cands($itemCol)`. */
  def estimateSql(regs: String, cands: String,
      itemCol: String = "item"): String =
    s"""SELECT $itemCol, min(coalesce(r.c, 0)) AS est FROM (
       |  SELECT $itemCol, j AS row_j,
       |    CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
       |           $itemCol), 1, 13)) AS BIGINT) % $width AS idx
       |  FROM $cands, unnest(${(0 until depth).mkString("[", ", ", "]")})
       |    AS t(j)) q
       |LEFT JOIN $regs r ON q.row_j = r.row_j AND q.idx = r.idx
       |GROUP BY 1""".stripMargin
}
