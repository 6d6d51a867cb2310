package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Normalize
import graft.operators.Incremental

/** Core capability registry, batch 1: the reference's main dataflow
  * (SURVEY §2.1-§2.7, §3.1) as named queries with DuckDB oracles.
  * Every query reads `$sfDir/<table>.parquet` and returns a
  * deterministically-ordered DataFrame.
  */
object CoreQueries {
  import Tables.load

  /** §3.1 flagship: watermark → strict-> delta → cleaned → agg.
    * Mirrors sync-db2.py:90-190 end-to-end over the `events` table. */
  def flagship(spark: SparkSession, dir: String): DataFrame = {
    val events = load(spark, dir, "events")
    val target = events.where(col("ts") < to_timestamp(lit("2024-01-20 00:00:00")))
    val wm = target.agg(Incremental.watermarkExpr("ts")).head().getTimestamp(0)
    Incremental.delta(events, "ts", lit(wm))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        max(col("ts")).as("max_ts"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy("event_type")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("e2e_incremental_agg",
      Some("""WITH target AS (SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-20 00:00:00')
             |SELECT event_type, count(*) AS n_events, max(ts) AS max_ts,
             |       round(sum(value), 2) AS sum_value
             |FROM events WHERE ts > (SELECT coalesce(max(ts), TIMESTAMP '1970-01-01 00:00:00') FROM target)
             |GROUP BY event_type ORDER BY event_type""".stripMargin),
      flagship),

    // S1/S2/S3 — pruned, filtered scan (SOQL projection+predicate analog,
    // config.py:102-145). Catalyst pushes both into the parquet reader.
    QueryDef("s1_scan_pruned_filtered",
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
             |FROM lineitem
             |WHERE l_returnflag = 'R' AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin),
      (s, dir) => load(s, dir, "lineitem")
        .where(col("l_returnflag") === "R" &&
          col("l_shipdate") >= to_timestamp(lit("1995-01-01 00:00:00")))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")),

    // S4 — pushed-down source count (config.py:146-149).
    QueryDef("s4_count_pushdown",
      Some("SELECT count(*) AS cnt FROM lineitem WHERE l_returnflag = 'R'"),
      (s, dir) => load(s, dir, "lineitem")
        .where(col("l_returnflag") === "R")
        .agg(count(lit(1)).as("cnt"))),

    // S6/A1/X13 — formatted max-timestamp watermark (sync-db2.py:57-60).
    QueryDef("s6_max_watermark_fmt",
      Some("""SELECT strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_updated
             |FROM orders""".stripMargin),
      (s, dir) => load(s, dir, "orders")
        .agg(date_format(max(col("o_orderdate")), "yyyy-MM-dd HH:mm:ss")
          .as("max_updated"))),

    // F1 — half-open date-range delta window (sync-db2.py:52-55).
    QueryDef("f1_range_window",
      Some("""SELECT event_id, ts, event_type, value FROM events
             |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
             |  AND ts <  TIMESTAMP '2024-01-11 00:00:00'
             |ORDER BY event_id""".stripMargin),
      (s, dir) => load(s, dir, "events")
        .where(col("ts") >= to_timestamp(lit("2024-01-10 00:00:00")) &&
          col("ts") < to_timestamp(lit("2024-01-11 00:00:00")))
        .select("event_id", "ts", "event_type", "value")
        .orderBy("event_id")),

    // F2/A1 — strict-> watermark delta from a target snapshot
    // (sync-db2.py:163-167).
    QueryDef("f2_watermark_delta",
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
             |FROM orders
             |WHERE o_orderdate > (SELECT coalesce(max(o_orderdate), TIMESTAMP '1970-01-01 00:00:00')
             |                     FROM orders
             |                     WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00')
             |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        val orders = load(s, dir, "orders")
        val snapshot = orders.where(
          col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
        val wm = snapshot.agg(Incremental.watermarkExpr("o_orderdate"))
          .head().getTimestamp(0)
        Incremental.delta(orders, "o_orderdate", lit(wm))
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate")
          .orderBy("o_orderkey")
      }),

    // J1/A4 — semi-join count (UPDATE_COUNT_STMT, config.py:50-55).
    QueryDef("j1_semi_join_count",
      Some("""SELECT count(*) AS cnt FROM lineitem
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')""".stripMargin),
      (s, dir) => {
        val li = load(s, dir, "lineitem")
        val o = load(s, dir, "orders").where(col("o_orderstatus") === "F")
        li.join(o, li("l_orderkey") === o("o_orderkey"), "left_semi")
          .agg(count(lit(1)).as("cnt"))
      }),

    // J2 — anti-join deletion reconciliation (delete-removed-tickets.py:
    // 136-142): warehouse ids minus the ids the source still returns.
    QueryDef("j2_anti_join_deletes",
      Some("""SELECT o_orderkey FROM orders w
             |WHERE NOT EXISTS (SELECT 1 FROM orders s
             |                  WHERE s.o_orderkey % 7 <> 0 AND s.o_orderkey = w.o_orderkey)
             |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        val orders = load(s, dir, "orders")
        val sourceIds = orders.where(col("o_orderkey") % 7 =!= 0)
        Incremental.deletedIds(orders, sourceIds, "o_orderkey")
          .orderBy("o_orderkey")
      }),

    // J5 — archive-before-delete: full rows for the deleted id set
    // (delete-removed-tickets.py:150-159).
    QueryDef("j5_archive_semi_join",
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |       o_orderdate, o_orderpriority
             |FROM orders w
             |WHERE NOT EXISTS (SELECT 1 FROM orders s
             |                  WHERE s.o_orderkey % 7 <> 0 AND s.o_orderkey = w.o_orderkey)
             |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        val orders = load(s, dir, "orders")
        val deleted = Incremental.deletedIds(
          orders, orders.where(col("o_orderkey") % 7 =!= 0), "o_orderkey")
        Incremental.archiveRows(orders, deleted, "o_orderkey")
          .orderBy("o_orderkey")
      }),

    // J3/J4/W3 — join-based upsert/MERGE (sync-db2-viewer.py:17-80):
    // delta rows overwrite, unmatched target rows survive.
    QueryDef("j4_merge_upsert",
      Some("""WITH target AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 0),
             |delta AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |                 o_orderdate, 'RUSH-RESYNC' AS o_orderpriority
             |          FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
             |SELECT coalesce(d.o_orderkey, t.o_orderkey) AS o_orderkey,
             |       CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_custkey ELSE t.o_custkey END AS o_custkey,
             |       CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
             |       CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
             |       CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_orderdate ELSE t.o_orderdate END AS o_orderdate,
             |       CASE WHEN d.o_orderkey IS NOT NULL THEN d.o_orderpriority ELSE t.o_orderpriority END AS o_orderpriority
             |FROM target t FULL OUTER JOIN delta d ON t.o_orderkey = d.o_orderkey
             |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        val orders = load(s, dir, "orders")
        val target = orders.where(col("o_orderkey") % 10 =!= 0)
        val delta = orders
          .where(col("o_orderdate") >= to_timestamp(lit("2000-01-01 00:00:00")))
          .withColumn("o_orderpriority", lit("RUSH-RESYNC"))
        Incremental.merge(target, delta, "o_orderkey").orderBy("o_orderkey")
      }),

    // A2 — max with epoch default over an empty set (sync-db2-viewer.py:52-55).
    QueryDef("a2_watermark_empty_default",
      Some("""SELECT coalesce(max(ts), TIMESTAMP '1970-01-01 00:00:00') AS wm
             |FROM events WHERE event_type = 'no_such_type'""".stripMargin),
      (s, dir) => load(s, dir, "events")
        .where(col("event_type") === "no_such_type")
        .agg(Incremental.watermarkExpr("ts").as("wm"))),

    // O4 — uniqueness check (delete-removed-tickets.py:117).
    QueryDef("o4_dedup_check",
      Some("""SELECT count(*) AS n, count(DISTINCT o_orderkey) AS n_distinct
             |FROM orders""".stripMargin),
      (s, dir) => load(s, dir, "orders")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_orderkey")).as("n_distinct"))),

    // X2 — Python str.strip("<>'") ends-only semantics (common.py:134),
    // exercised by wrapping the text in stripped chars first.
    QueryDef("x2_strip_edges",
      Some("""SELECT doc_id,
             |  regexp_replace('<<' || text || '>>', '^[<>'']+|[<>'']+$', '', 'g') AS cleaned
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => load(s, dir, "documents")
        .select(col("doc_id"),
          Normalize.stripEdges(concat(lit("<<"), col("text"), lit(">>")))
            .as("cleaned"))
        .orderBy("doc_id")),

    // X2 (AGO variant) — strip quotes/angles everywhere
    // (sync-db2-ago.py:144-152).
    QueryDef("x2b_strip_all_specials",
      Some("""SELECT doc_id,
             |  translate('"' || text || '"', '''"<>', '') AS cleaned
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => load(s, dir, "documents")
        .select(col("doc_id"),
          Normalize.stripAllSpecials(concat(lit("\""), col("text"), lit("\"")))
            .as("cleaned"))
        .orderBy("doc_id")),

    // X4 — bounded truncation with null→'' (common.py:136-137).
    QueryDef("x4_truncate_bounded",
      Some("""SELECT doc_id, substring(coalesce(text, ''), 1, 250) AS description,
             |       length(substring(coalesce(text, ''), 1, 250)) AS description_len
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => load(s, dir, "documents")
        .select(col("doc_id"),
          Normalize.truncated(col("text"), 250).as("description"),
          length(Normalize.truncated(col("text"), 250)).as("description_len"))
        .orderBy("doc_id")),

    // X5+F7 — regex digit extraction with >100 domain guard
    // (common.py:148-169), over part brands ('Brand#13' → 13).
    QueryDef("x5_regex_digits_guarded",
      Some("""SELECT p_partkey,
             |  CASE WHEN regexp_extract(p_brand, '[0-9]+', 0) <> ''
             |        AND CAST(regexp_extract(p_brand, '[0-9]+', 0) AS INTEGER) <= 100
             |       THEN CAST(regexp_extract(p_brand, '[0-9]+', 0) AS INTEGER) END AS district
             |FROM part ORDER BY p_partkey""".stripMargin),
      (s, dir) => load(s, dir, "part")
        .select(col("p_partkey"),
          Normalize.digitsAsInt(col("p_brand")).as("district"))
        .orderBy("p_partkey")),

    // X6 — lowercase+trim normalization (common.py:171-175).
    QueryDef("x6_lower_trim",
      Some("""SELECT event_id, lower(trim('  ' || upper(event_type) || ' ')) AS pinpoint
             |FROM events ORDER BY event_id""".stripMargin),
      (s, dir) => load(s, dir, "events")
        .select(col("event_id"),
          Normalize.lowerTrim(concat(lit("  "), upper(col("event_type")), lit(" ")))
            .as("pinpoint"))
        .orderBy("event_id")),

    // X7 — int parse with 0-as-null (common.py:177-181).
    QueryDef("x7_long_zero_as_null",
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_custkey % 5 <> 0 THEN o_custkey % 5 END AS parent_id
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, dir) => load(s, dir, "orders")
        .select(col("o_orderkey"),
          Normalize.longZeroAsNull(col("o_custkey") % 5).as("parent_id"))
        .orderBy("o_orderkey")),

    // X8 — truthiness → 0/1 (common.py:184-186): ONLY 'false' → 0;
    // 'False', null and '0' are truthy (the reference quirk).
    QueryDef("x8_bool_to_01",
      Some("""SELECT o_orderkey,
             |  CASE WHEN flag = 'false' THEN 0 ELSE 1 END AS private_case
             |FROM (SELECT o_orderkey,
             |        CASE WHEN o_orderkey % 4 = 0 THEN 'false'
             |             WHEN o_orderkey % 4 = 1 THEN 'true'
             |             WHEN o_orderkey % 4 = 2 THEN 'False' END AS flag
             |      FROM orders) ORDER BY o_orderkey""".stripMargin),
      (s, dir) => load(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 4 === 0, lit("false"))
            .when(col("o_orderkey") % 4 === 1, lit("true"))
            .when(col("o_orderkey") % 4 === 2, lit("False")).as("flag"))
        .select(col("o_orderkey"),
          Normalize.boolTo01(col("flag")).as("private_case"))
        .orderBy("o_orderkey")),

    // X10 — conditional source column (common.py:204-207).
    QueryDef("x10_conditional_column",
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_orderstatus = 'F' THEN 'closed:' || o_orderpriority
             |       ELSE 'open:' || o_orderstatus END AS status_notes
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, dir) => load(s, dir, "orders")
        .select(col("o_orderkey"),
          Normalize.statusNotes(
            when(col("o_orderstatus") === "F", lit("Closed"))
              .otherwise(col("o_orderstatus")),
            concat(lit("closed:"), col("o_orderpriority")),
            concat(lit("open:"), col("o_orderstatus"))).as("status_notes"))
        .orderBy("o_orderkey")),

    // X1+F6 — WKT point synthesis with zero-coordinate guard
    // (common.py:118-128) over synthesized lon/lat.
    QueryDef("x1_wkt_point_guarded",
      Some("""SELECT c_custkey,
             |  CASE WHEN lon IS NOT NULL AND lat IS NOT NULL AND lon <> 0 AND lat <> 0
             |       THEN 'SRID=4326;POINT (' || CAST(lon AS VARCHAR) || ' ' ||
             |            CAST(lat AS VARCHAR) || ')' END AS shape
             |FROM (SELECT c_custkey,
             |        -75.0 - c_acctbal / 10000.0 AS lon,
             |        CASE WHEN c_custkey % 50 = 0 THEN 0.0
             |             ELSE 39.0 + (c_custkey % 100) / 100.0 END AS lat
             |      FROM customer) ORDER BY c_custkey""".stripMargin),
      (s, dir) => load(s, dir, "customer")
        .select(col("c_custkey"),
          (lit(-75.0) - col("c_acctbal") / 10000.0).as("lon"),
          when(col("c_custkey") % 50 === 0, 0.0)
            .otherwise(lit(39.0) + (col("c_custkey") % 100) / 100.0).as("lat"))
        .select(col("c_custkey"),
          Normalize.wktPoint(col("lon"), col("lat")).as("shape"))
        .orderBy("c_custkey")),

    // X16 — general re-projection (sync-db2-ago.py:40-42,70-126): the
    // identity path (equal SRIDs — the reference's deployed config,
    // config.py:5-6) passes lon/lat through untouched, and the general
    // path applies the closed-form 4326→3857 spherical-Mercator
    // equations, which DuckDB reproduces exactly; both engines quantize
    // to 0.1 mm with the floor(x·10⁴+0.5)/10⁴ pattern (round() ties
    // disagree across engines). Inverse/roundtrip and unsupported-SRID
    // failure are pinned in NormalizeSpec.
    QueryDef("x16_reproject",
      Some("""SELECT c_custkey, lon AS lon_id, lat AS lat_id,
             |  floor(radians(lon) * 6378137 * 10000 + 0.5) / 10000 AS merc_x,
             |  floor(ln(tan(pi() / 4 + radians(lat) / 2)) * 6378137 * 10000 + 0.5) / 10000 AS merc_y
             |FROM (SELECT c_custkey,
             |        -75.0 - c_acctbal / 10000.0 AS lon,
             |        39.0 + (c_custkey % 100) / 100.0 AS lat
             |      FROM customer) ORDER BY c_custkey""".stripMargin),
      (s, dir) => {
        val src = load(s, dir, "customer")
          .select(col("c_custkey"),
            (lit(-75.0) - col("c_acctbal") / 10000.0).as("lon"),
            (lit(39.0) + (col("c_custkey") % 100) / 100.0).as("lat"))
        val (lonId, latId) = graft.functions.Reproject
          .project(col("lon"), col("lat"), 4326, 4326) // identity path
        val (mx, my) = graft.functions.Reproject
          .project(col("lon"), col("lat"), 4326, 3857)
        def q4(c: org.apache.spark.sql.Column) =
          floor(c * 10000 + 0.5) / 10000
        src.select(col("c_custkey"), lonId.as("lon_id"), latId.as("lat_id"),
            q4(mx).as("merc_x"), q4(my).as("merc_y"))
          .orderBy("c_custkey")
      }),

    // X3 — NFKD→ASCII via the native codegen'd expression; no DuckDB
    // equivalent, so rows-only check (allowed per SparkEntry contract).
    QueryDef("x3_nfkd_ascii", None,
      (s, dir) => load(s, dir, "documents")
        .select(col("doc_id"),
          Normalize.nfkdAscii(concat(col("text"), lit(" café ⚠ ñ")))
            .as("ascii_text"))
        .orderBy("doc_id")))
}
