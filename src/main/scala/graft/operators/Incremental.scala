package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermark-driven incremental sync semantics (SURVEY §2.10, §3.1):
  * max-timestamp watermark, strict-`>` delta extraction, join-based
  * upsert/merge, anti-join deletion reconciliation, semi-join archival.
  *
  * Scale notes (100 TB stance):
  *  - the watermark is a single-row aggregate (map-side partial max →
  *    one tiny shuffle) — safe at any scale;
  *  - merge shuffles both sides by pk exactly once (sort-merge join);
  *    with the target bucketed by pk the shuffle disappears entirely —
  *    proven by plan-walk in MergeBucketedSpec (zero exchanges when both
  *    sides share the bucketing; delta-only movement otherwise);
  *  - reconciliation key-sets are (pk) projections — Parquet column
  *    pruning keeps them narrow; the id-set join broadcasts when small.
  */
object Incremental {

  /** A1/A2 (sync-db2.py:57-60, sync-db2-viewer.py:52-55): max watermark
    * with an epoch default when the target is empty. */
  def watermarkExpr(wmCol: String): Column =
    coalesce(max(col(wmCol)), to_timestamp(lit("1970-01-01 00:00:00")))

  /** F2 (sync-db2.py:163-167): strictly-newer delta. The strict `>` plus
    * idempotent merge makes re-runs safe — re-modified rows simply
    * re-arrive and overwrite. */
  def delta(source: DataFrame, wmCol: String, watermark: Column): DataFrame =
    source.where(col(wmCol) > watermark)

  /** J3/J4/W3 (sync-db2-viewer.py:17-80, sync-db2.py:78-88): join-based
    * upsert with whole-row-replace semantics, like the reference's
    * `ON CONFLICT DO UPDATE SET col = excluded.col` (sync-db2-viewer.py:
    * 56-79): when the delta has the pk, EVERY delta column wins —
    * including nulls, so a re-modified row can legitimately clear a
    * field (per-column coalesce would resurrect the stale value).
    * Idempotent: merging the same delta twice is a no-op.
    *
    * PRECONDITION: the delta is pk-UNIQUE — a snapshot per key, which
    * is what a watermark pull of source state yields (the reference's
    * SOQL query returns each case once). A CDC/log-shaped delta with
    * several rows per pk would full-outer-multiply against the target
    * and silently break the warehouse's pk invariant (the reference's
    * sequential executemany has an arrival order to break the tie; a
    * DataFrame has none, so there is no well-defined "last" to pick).
    * Collapse such a delta first with [[latestPerKey]], which makes the
    * tie-break explicit. */
  def merge(target: DataFrame, deltaDf: DataFrame, pk: String): DataFrame = {
    val cols = target.columns
    // Qualified-by-alias references survive self-joins (target and delta
    // are often derived from the same base relation).
    val deltaExists = col(s"d.$pk").isNotNull
    target.alias("t")
      .join(deltaDf.alias("d"), col(s"t.$pk") === col(s"d.$pk"), "full_outer")
      .select(cols.map { c =>
        if (c == pk) coalesce(col(s"d.$c"), col(s"t.$c")).as(c)
        else when(deltaExists, col(s"d.$c")).otherwise(col(s"t.$c")).as(c)
      }.toIndexedSeq: _*)
  }

  /** Collapses a CDC/log-shaped delta (several rows per pk) to the
    * newest row per key — the explicit tie-break [[merge]]'s pk-unique
    * precondition needs. "Newest" is max (orderCol, then the whole row)
    * so equal-timestamp duplicates still resolve deterministically.
    * One map-side-combining aggregation, no window sort. */
  def latestPerKey(deltaDf: DataFrame, pk: String,
      orderCol: String): DataFrame = {
    require(!deltaDf.columns.contains("__latest"),
      "latestPerKey reserves the column name __latest")
    // backtick-quoted references (and getField on the way out), not raw
    // string paths: a column name containing a dot would otherwise parse
    // as a nested struct traversal and fail — or resolve wrongly
    def qcol(c: String): Column = col("`" + c.replace("`", "``") + "`")
    val payload = deltaDf.columns.filter(_ != pk)
    deltaDf
      .groupBy(qcol(pk))
      .agg(max(struct((qcol(orderCol) +:
        payload.filter(_ != orderCol).map(qcol).toSeq).toIndexedSeq: _*))
        .as("__latest"))
      .select(qcol(pk) +: payload.map(c =>
        col("__latest").getField(c).as(c)).toIndexedSeq: _*)
  }

  /** J2 (delete-removed-tickets.py:136-142): ids the warehouse has that
    * the source no longer returns. The reference does this with Python
    * sets over 1000-id chunks; one distributed anti-join replaces the
    * whole chunk loop. */
  def deletedIds(warehouseIds: DataFrame, sourceIds: DataFrame, pk: String): DataFrame =
    warehouseIds.select(pk).join(sourceIds.select(pk), Seq(pk), "left_anti")

  /** J5 first half (delete-removed-tickets.py:150-159): full rows to
    * archive before deletion — semi join against the deleted id set. */
  def archiveRows(warehouse: DataFrame, deleted: DataFrame, pk: String): DataFrame =
    warehouse.join(deleted.select(pk), Seq(pk), "left_semi")

  /** J5 second half / W5 (config.py:57-61, delete-removed-tickets.py:
    * 160-185): the warehouse minus the deleted ids. */
  def purge(warehouse: DataFrame, deleted: DataFrame, pk: String): DataFrame =
    warehouse.join(deleted.select(pk), Seq(pk), "left_anti")

  /** §3.1 complete cycle as one dataflow: watermark → delta → merge. */
  def incrementalSync(target: DataFrame, source: DataFrame,
      pk: String, wmCol: String): DataFrame = {
    val wm = target.agg(watermarkExpr(wmCol)).head().getTimestamp(0)
    merge(target, delta(source, wmCol, lit(wm)), pk)
  }
}
