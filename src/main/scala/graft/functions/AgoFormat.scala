package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's AGO-bound row formatting (`format_row`,
  * /root/reference/sync-db2-ago.py:135-246) as Column expressions:
  * null↔empty-string dances, UTC-string detection, timestamp formatting,
  * and WKT→ESRI-JSON point geometry.
  */
object AgoFormat {

  /** X11 — non-datetime fields: null → '' (sync-db2-ago.py:154-158). */
  def nullToEmpty(c: Column): Column = coalesce(c, lit(""))

  /** X11 — datetime-string fields: '' → null (sync-db2-ago.py:159-163). */
  def emptyToNull(c: Column): Column = nullif(c, lit(""))

  /** X13 — timestamp → 'YYYY-MM-DD HH24:MI:SS' text
    * (sync-db2-ago.py:480-482). */
  def formatTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** X12 — a datetime string carrying a '+0000' UTC marker is reparsed
    * and shifted to US Eastern; anything else passes through
    * (sync-db2-ago.py:164-169). try_to_timestamp, not to_timestamp: the
    * contains() test is deliberately loose (matching the reference's
    * substring check), so a string that carries '+0000' but doesn't
    * parse — the marker mid-string, a mangled date — must degrade to
    * null like every other unparseable date in this module, not raise
    * under Spark 4's default ANSI mode. */
  def utcStringToEastern(c: Column): Column =
    when(c.contains("+0000"),
      formatTs(from_utc_timestamp(
        try_to_timestamp(regexp_replace(c, "\\s*\\+0000$", ""),
          lit("yyyy-MM-dd HH:mm:ss")),
        "America/New_York")))
      .otherwise(c)

  /** X15 — point geometry → ESRI JSON (sync-db2-ago.py:97-105,171-246).
    * Null/zero coordinates take the reference's POINT EMPTY path, which
    * emits NaN coordinates (sync-db2-ago.py:171-177). Built entirely
    * from to_json(struct(...)) — no UDF. */
  def esriPointJson(lon: Column, lat: Column): Column = {
    val empty = lit(GeoJsonUtil.NanPointJson) // one spelling across X15 variants
    when(lon.isNotNull && lat.isNotNull && lon =!= 0 && lat =!= 0,
      to_json(struct(
        lon.as("x"), lat.as("y"),
        struct(lit(4326).as("wkid")).as("spatial_reference"))))
      .otherwise(empty)
  }
}
