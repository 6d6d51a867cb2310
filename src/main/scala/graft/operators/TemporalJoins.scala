package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators Spark lacks as built-ins, composed from
  * existing operators per the preference order (compose > custom plan):
  *
  *  - as-of join: union-tag + running `last(ignoreNulls)` over a
  *    (key, time) window — one shuffle by key, no per-row lookups, the
  *    classic composition that scales as a single sort-merge pass;
  *  - banded range join: |l.ts − r.ts| ≤ tolerance via time-bucket
  *    equi-join on {b−1, b, b+1} then exact residual filter — the
  *    equi-join keys keep the shuffle bounded where a raw inequality
  *    join would degenerate to a broadcast-nested-loop cross product.
  */
object TemporalJoins {

  /** For each left row, attach `valueCol` of the most recent right row
    * with rightTs ≤ leftTs within the same `key` (inclusive, like
    * DuckDB/kdb ASOF). Left rows with no prior right row keep null.
    *
    * The right value rides inside a struct so that a matched-but-null
    * value is distinguishable from "no prior row" (a bare
    * last(ignoreNulls) would skip the null and fall back to an older
    * row, diverging from ASOF semantics). Null semantics match native
    * ASOF: a null right timestamp never satisfies `r.ts <= l.ts`, so
    * null-ts right rows are excluded up front (the window's NULLS FIRST
    * ordering would otherwise sort them before everything and invent a
    * match); a null-ts left row matches nothing and keeps null. Ties
    * among right rows at the same ts resolve deterministically to the
    * greatest value (engines with native ASOF pick arbitrarily there —
    * avoid tie-ful data when comparing). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      tsCol: String, valueCol: String,
      outValue: String = "asof_value"): DataFrame = {
    val leftCols = left.columns
    Seq("__is_left", "__rv", "__m").foreach(c =>
      require(!leftCols.contains(c) && !right.columns.contains(c),
        s"asofJoin reserves the column name $c"))
    val rvType = right.schema(valueCol).dataType
    val nullRv = lit(null)
      .cast(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("v", rvType))))
    val l = left.withColumn("__is_left", lit(1)).withColumn("__rv", nullRv)
    val r = right.where(col(tsCol).isNotNull).select(
      col(key), col(tsCol),
      lit(0).as("__is_left"), struct(col(valueCol).as("v")).as("__rv"))
    // align schemas: right side carries nulls for the other left columns
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols.map(col) ++ Seq(col("__is_left"), col("__rv"))).toIndexedSeq: _*)
    val unioned = l.select((leftCols.map(col) ++ Seq(col("__is_left"), col("__rv"))).toIndexedSeq: _*)
      .unionByName(rAligned)
    // right rows sort before left rows at equal ts ⇒ inclusive (≤) asof;
    // __rv as final key makes equal-ts right rows deterministic
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol).asc, col("__is_left").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    unioned
      .withColumn("__m", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__is_left") === 1)
      .withColumn(outValue, col("__m.v"))
      .drop("__is_left", "__rv", "__m")
  }

  /** Pairs (l, r) with the same `key` and |l.ts − r.ts| ≤ tolerance
    * seconds, EXACT at microsecond resolution (the residual filter
    * compares epoch micros — a whole-second truncation would admit
    * pairs up to ~1 s outside the tolerance on sub-second data).
    * `delta_sec` is the signed whole-second difference of the
    * truncated epochs — SQL date_diff('second') semantics, engine-
    * portable. Both sides are bucketed to `tolerance`-sized epochs and
    * joined on (key, adjacent bucket) before the exact filter; second
    * truncation shifts a bucket index by at most one, which the ±1
    * band explode already covers, so candidate completeness holds. */
  def bandedRangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, toleranceSec: Long,
      idCol: String = "event_id"): DataFrame = {
    require(toleranceSec > 0,
      s"toleranceSec=$toleranceSec: the band width must be positive " +
        "(an exact-timestamp join is an equi-join on the timestamp)")
    require(!left.columns.contains("__bucket") &&
      !right.columns.contains("__bucket"),
      "bandedRangeJoin reserves the column name __bucket")
    def bucketed(df: DataFrame, ts: String, prefix: String, explodeBands: Boolean) = {
      val b = (col(ts).cast("long") / toleranceSec).cast("long")
      val withB =
        if (explodeBands)
          df.withColumn("__bucket", explode(array(b - 1, b, b + 1)))
        else df.withColumn("__bucket", b)
      withB.select(col(key), col(ts).as(s"${prefix}_ts"),
        col("__bucket"),
        col(idCol).as(s"${prefix}_id"))
    }
    val l = bucketed(left, leftTs, "l", explodeBands = false)
    val r = bucketed(right, rightTs, "r", explodeBands = true)
    // no distinct needed: the left side keeps one bucket per row and the
    // right side's three exploded buckets are distinct values, so each
    // (l, r) pair joins at most once
    l.join(r, Seq(key, "__bucket"))
      .where(abs(unix_micros(col("l_ts")) - unix_micros(col("r_ts")))
        <= toleranceSec * 1000000L)
      .select(col(key), col("l_id"), col("r_id"),
        (col("l_ts").cast("long") - col("r_ts").cast("long")).as("delta_sec"))
  }
}
