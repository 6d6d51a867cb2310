package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.AgoFormat

/** Capability registry, batch 2: the rest of SURVEY §2's operator
  * inventory — sources/sinks, projection surface, window derivation,
  * IN-list batching, AGO formatting (X11-X15), batching/chunking.
  */
object InventoryQueries {
  import Tables.load

  private def tmpDir(name: String, sfDir: String): String =
    s"/tmp/graft_$name/" + sfDir.replaceAll("[^a-zA-Z0-9]", "_")

  private val fmtSec = "yyyy-MM-dd HH:mm:ss"

  val defs: Seq[QueryDef] = Seq(

    // W1+S5 — CSV write then header-driven CSV read-back (sync-db2.py:71-72,
    // seed.py:27-36). Values survive the text roundtrip bit-exactly
    // (shortest-roundtrip double rendering both ways).
    QueryDef("s5_csv_roundtrip",
      Some("""SELECT event_id, event_type, value FROM events ORDER BY event_id"""),
      (s, dir) => {
        val out = tmpDir("csv", dir)
        load(s, dir, "events").select("event_id", "event_type", "value")
          .write.mode("overwrite").option("header", "true").csv(out)
        s.read.option("header", "true")
          .schema(StructType(Seq(
            StructField("event_id", LongType),
            StructField("event_type", StringType),
            StructField("value", DoubleType))))
          .csv(out)
          .orderBy("event_id")
      }),

    // JSONL roundtrip — the lingua franca format of training-data
    // interchange: the documents table written as newline-delimited
    // JSON and read back under an explicit schema (schema-on-read, no
    // inference pass over 100 TB). JSON string escaping must carry
    // quotes/control chars in document text bit-exactly; the oracle is
    // the source table itself.
    QueryDef("s12_jsonl_roundtrip",
      Some("""SELECT doc_id, source, text FROM documents ORDER BY doc_id"""),
      (s, dir) => {
        val out = tmpDir("jsonl", dir)
        load(s, dir, "documents").select("doc_id", "source", "text")
          .write.mode("overwrite").json(out)
        s.read.schema(StructType(Seq(
            StructField("doc_id", LongType),
            StructField("source", StringType),
            StructField("text", StringType))))
          .json(out)
          .orderBy("doc_id")
      }),

    // ORC interchange roundtrip — the other columnar format Spark ships
    // natively (warehouse estates mix parquet and ORC); write → read →
    // values must survive bit-exactly, oracle is the source table.
    QueryDef("s13_orc_roundtrip",
      Some("""SELECT doc_id, source, text FROM documents ORDER BY doc_id"""),
      (s, dir) => {
        val out = tmpDir("orc", dir)
        load(s, dir, "documents").select("doc_id", "source", "text")
          .write.mode("overwrite").orc(out)
        s.read.orc(out).orderBy("doc_id")
      }),

    // S1 (production shape) — DataSource V2 connector with source-side
    // watermark + record-type pushdown and column pruning; rows are
    // deterministic so DuckDB can generate the same relation.
    QueryDef("s1b_dsv2_connector",
      Some("""SELECT CAST(i AS VARCHAR) AS CaseNumber,
             |       ['New','Open','Closed'][CAST(i % 3 AS INTEGER) + 1] AS Status,
             |       TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i) MINUTE AS LastModifiedDate
             |FROM range(0, 2000) t(i)
             |WHERE TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i) MINUTE
             |        > TIMESTAMP '2024-01-01 12:00:00'
             |  AND (CASE WHEN i % 5 = 0 THEN 'OTHER'
             |            WHEN i % 5 = 1 THEN '012G00000014BhVIAU'
             |            ELSE '' END) = 'OTHER'
             |ORDER BY CAST(CaseNumber AS BIGINT)""".stripMargin),
      (s, dir) => s.read.format("graft.sources.CaseSource")
        .option("rows", "2000").option("partitions", "8").load()
        .where(col("LastModifiedDate") >
          to_timestamp(lit("2024-01-01 12:00:00")) &&
          col("RecordTypeId") === "OTHER")
        .select("CaseNumber", "Status", "LastModifiedDate")
        .orderBy(col("CaseNumber").cast("long"))),

    // S7/O1 — ordered (pk, watermark) key scan (sync-db2-ago.py:543-566).
    QueryDef("s7_ordered_key_scan",
      Some("""SELECT o_orderkey, o_orderdate FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1999-01-01 00:00:00'
             |ORDER BY o_orderdate ASC, o_orderkey ASC""".stripMargin),
      (s, dir) => load(s, dir, "orders")
        .where(col("o_orderdate") >= to_timestamp(lit("1999-01-01 00:00:00")))
        .select("o_orderkey", "o_orderdate")
        .orderBy(asc("o_orderdate"), asc("o_orderkey"))),

    // S8 — per-row point lookups collapsed into one broadcast-hash join
    // of the key batch against the table (sync-db2-ago.py:589-617; the
    // reference's N+1 pattern, §3.2).
    QueryDef("s8_point_lookup_batch",
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
             |FROM orders WHERE o_orderkey % 100 = 0
             |ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        val orders = load(s, dir, "orders")
        val keys = orders.where(col("o_orderkey") % 100 === 0)
          .select(col("o_orderkey").as("k"))
        orders.join(broadcast(keys), col("o_orderkey") === col("k"), "inner")
          .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate")
          .orderBy("o_orderkey")
      }),

    // S9/O2 — full id scan, newest-first (delete-removed-tickets.py:99-105).
    QueryDef("s9_id_scan_desc",
      Some("SELECT o_orderkey FROM orders ORDER BY o_orderkey DESC"),
      (s, dir) => load(s, dir, "orders")
        .select("o_orderkey").orderBy(desc("o_orderkey"))),

    // O3 — limit (delete-removed-tickets.py:100's debug `limit 5`).
    QueryDef("o3_sorted_limit",
      Some("SELECT o_orderkey FROM orders ORDER BY o_orderkey DESC LIMIT 100"),
      (s, dir) => load(s, dir, "orders")
        .select("o_orderkey").orderBy(desc("o_orderkey")).limit(100)),

    // S10+O5 — sink existence probe with cardinality-1 assertion
    // (sync-db2-ago.py:383-429,598-613).
    QueryDef("s10_existence_probe",
      Some("""SELECT count(*) AS n_found, CAST(count(*) = 1 AS INTEGER) AS exactly_one
             |FROM orders WHERE o_orderkey = 42""".stripMargin),
      (s, dir) => load(s, dir, "orders")
        .where(col("o_orderkey") === 42)
        .agg(count(lit(1)).as("n_found"),
          (count(lit(1)) === 1).cast("int").as("exactly_one"))),

    // S11 — catalog introspection: runtime schema of `customer` as rows
    // (information_schema fetch, sync-db2-ago.py:446-453). The oracle is
    // the expected-headers literal, exactly like the reference's whitelist.
    QueryDef("s11_catalog_introspection",
      Some(Seq("c_acctbal", "c_custkey", "c_mktsegment", "c_name", "c_nationkey")
        .map(c => s"SELECT '$c' AS column_name")
        .mkString("", " UNION ALL ", " ORDER BY column_name")),
      (s, dir) => {
        val cols = load(s, dir, "customer").schema.fieldNames.sorted
        import s.implicits._
        cols.toSeq.toDF("column_name").orderBy("column_name")
      }),

    // P1 — FIELD_MAP rename-projection (config.py:63-97, common.py:117).
    QueryDef("p1_rename_projection",
      Some("""SELECT o_orderkey AS service_request_id, o_custkey AS requester_id,
             |       o_orderstatus AS status, o_totalprice AS total_price,
             |       o_orderdate AS requested_datetime, o_orderpriority AS service_priority
             |FROM orders ORDER BY service_request_id""".stripMargin),
      (s, dir) => {
        val fieldMap = Seq( // dest -> src, reference FIELD_MAP style
          "service_request_id" -> "o_orderkey",
          "requester_id" -> "o_custkey",
          "status" -> "o_orderstatus",
          "total_price" -> "o_totalprice",
          "requested_datetime" -> "o_orderdate",
          "service_priority" -> "o_orderpriority")
        load(s, dir, "orders")
          .select(fieldMap.map { case (d, src) => col(src).as(d) }: _*)
          .orderBy("service_request_id")
      }),

    // P2 — derived columns attached to the projection (common.py:128,136,216).
    QueryDef("p2_derived_columns",
      Some("""SELECT doc_id, substring(coalesce(text, ''), 1, 2000) AS description_full,
             |       source || ':' || lang AS source_tag
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => load(s, dir, "documents")
        .withColumn("description_full",
          substring(coalesce(col("text"), lit("")), 1, 2000))
        .withColumn("source_tag", concat(col("source"), lit(":"), col("lang")))
        .select("doc_id", "description_full", "source_tag")
        .orderBy("doc_id")),

    // P3 — column drop (sync-db2-ago.py:466,173).
    QueryDef("p3_column_drop",
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, dir) => load(s, dir, "orders")
        .drop("o_orderpriority")
        .orderBy("o_orderkey")),

    // P4 — computed select-list rewrite: dates → to_char-style text
    // (sync-db2-ago.py:474-485).
    QueryDef("p4_computed_select_rewrite",
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate_str,
             |       o_orderstatus
             |FROM orders ORDER BY o_orderkey""".stripMargin),
      (s, dir) => load(s, dir, "orders")
        .select(col("o_orderkey"),
          date_format(col("o_orderdate"), fmtSec).as("o_orderdate_str"),
          col("o_orderstatus"))
        .orderBy("o_orderkey")),

    // P5 — lowercase all column names (sync-db2-ago.py:622).
    QueryDef("p5_lowercase_headers",
      Some("""SELECT event_id, event_type FROM events ORDER BY event_id"""),
      (s, dir) => {
        val shouty = load(s, dir, "events").select("event_id", "event_type")
          .toDF("EVENT_ID", "EVENT_TYPE") // simulate upstream casing
        shouty.toDF(shouty.columns.map(_.toLowerCase).toIndexedSeq: _*)
          .orderBy("event_id")
      }),

    // P6 — schema assertion: actual fields vs expected whitelist
    // (sync-db2-ago.py:440-459,487-502). Left side is true runtime
    // introspection; the oracle is the whitelist literal.
    QueryDef("p6_schema_assert",
      Some(Seq("event_id", "event_type", "props", "ts", "user_id", "value")
        .map(c => s"SELECT '$c' AS column_name, 1 AS is_expected")
        .mkString("", " UNION ALL ", " ORDER BY column_name")),
      (s, dir) => {
        val expected =
          Set("event_id", "ts", "user_id", "event_type", "value", "props")
        val actual = load(s, dir, "events").schema.fieldNames
        import s.implicits._
        actual.toSeq.toDF("column_name")
          .withColumn("is_expected",
            col("column_name").isin(expected.toSeq: _*).cast("int"))
          .orderBy("column_name")
      }),

    // F3 — day/month/year window derivation incl. December rollover
    // (sync-db2.py:106-135): windows are computed in driver code (as the
    // reference does), then applied as half-open range filters.
    QueryDef("f3_window_derivation",
      Some("""SELECT 'day:2024-01-15' AS window_kind, count(*) AS n FROM events
             |  WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' AND ts < TIMESTAMP '2024-01-16 00:00:00'
             |UNION ALL
             |SELECT 'month:2023-12' AS window_kind, count(*) AS n FROM events
             |  WHERE ts >= TIMESTAMP '2023-12-01 00:00:00' AND ts < TIMESTAMP '2024-01-01 00:00:00'
             |UNION ALL
             |SELECT 'month:2024-01' AS window_kind, count(*) AS n FROM events
             |  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-02-01 00:00:00'
             |UNION ALL
             |SELECT 'year:2024' AS window_kind, count(*) AS n FROM events
             |  WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2025-01-01 00:00:00'
             |ORDER BY window_kind""".stripMargin),
      (s, dir) => {
        import java.time.LocalDate
        def monthWindow(y: Int, m: Int): (String, String) = {
          val start = LocalDate.of(y, m, 1)
          (s"$start 00:00:00", s"${start.plusMonths(1)} 00:00:00") // Dec rollover via plusMonths
        }
        def dayWindow(d: String): (String, String) =
          (s"$d 00:00:00", s"${LocalDate.parse(d).plusDays(1)} 00:00:00")
        def yearWindow(y: Int): (String, String) =
          (s"$y-01-01 00:00:00", s"${y + 1}-01-01 00:00:00")
        val windows = Seq(
          "day:2024-01-15" -> dayWindow("2024-01-15"),
          "month:2023-12" -> monthWindow(2023, 12),
          "month:2024-01" -> monthWindow(2024, 1),
          "year:2024" -> yearWindow(2024))
        val events = load(s, dir, "events")
        windows.map { case (kind, (lo, hi)) =>
          events.where(col("ts") >= to_timestamp(lit(lo)) &&
              col("ts") < to_timestamp(lit(hi)))
            .agg(count(lit(1)).as("n"))
            .select(lit(kind).as("window_kind"), col("n"))
        }.reduce(_.unionAll(_)).orderBy("window_kind")
      }),

    // F4 — 1000-id IN-list membership (delete-removed-tickets.py:128-135);
    // Catalyst compiles the big isin into an efficient predicate.
    QueryDef("f4_inlist_batch", {
      val inList = (0 until 1000).map(_ * 3L).mkString(", ")
      Some(s"""SELECT count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
              |FROM lineitem WHERE l_orderkey IN ($inList)""".stripMargin)
    },
      (s, dir) => {
        val ids = (0 until 1000).map(i => java.lang.Long.valueOf(i * 3L))
        load(s, dir, "lineitem")
          .where(col("l_orderkey").isin(ids: _*))
          .agg(count(lit(1)).as("cnt"),
            round(sum(col("l_quantity")), 2).as("sum_qty"))
      }),

    // F5 — pk equality lookup (sync-db2-ago.py:583-593).
    QueryDef("f5_pk_equality",
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             |       o_orderdate, o_orderpriority
             |FROM orders WHERE o_orderkey = 42""".stripMargin),
      (s, dir) => load(s, dir, "orders").where(col("o_orderkey") === 42)),

    // J6/W7 — truncate-and-reload (seed.py:20-39): overwrite a parquet
    // target, then serve from the reloaded table.
    QueryDef("j6_truncate_reload",
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             |WHERE o_orderstatus = 'O' ORDER BY o_orderkey""".stripMargin),
      (s, dir) => {
        val out = tmpDir("seed", dir)
        load(s, dir, "orders").where(col("o_orderstatus") === "O")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .write.mode("overwrite").parquet(out)
        s.read.parquet(out).orderBy("o_orderkey")
      }),

    // A3+X14 — watermark as epoch seconds (AGO outStatistics max +
    // fromtimestamp, sync-db2-ago.py:516-535).
    QueryDef("a3_epoch_watermark",
      Some("""SELECT CAST(floor(epoch(max(ts))) AS BIGINT) AS wm_epoch FROM events"""),
      (s, dir) => load(s, dir, "events")
        .agg(unix_timestamp(max(col("ts"))).as("wm_epoch"))),

    // A5 — affected-rowcount of a merge: the delta cardinality
    // (sync-db2-viewer.py:86).
    QueryDef("a5_affected_rowcount",
      Some("""SELECT count(*) AS affected FROM orders
             |WHERE o_orderdate > (SELECT max(o_orderdate) FROM orders
             |                     WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00')""".stripMargin),
      (s, dir) => {
        val orders = load(s, dir, "orders")
        val wm = orders
          .where(col("o_orderdate") < to_timestamp(lit("1998-01-01 00:00:00")))
          .agg(max(col("o_orderdate"))).head().getTimestamp(0)
        orders.where(col("o_orderdate") > lit(wm))
          .agg(count(lit(1)).as("affected"))
      }),

    // X9 — UTC → US Eastern wall-clock conversion (common.py:189-201).
    QueryDef("x9_tz_eastern",
      Some("""SELECT event_id,
             |       timezone('America/New_York', timezone('UTC', ts)) AS ts_eastern
             |FROM events ORDER BY event_id""".stripMargin),
      (s, dir) => load(s, dir, "events")
        .select(col("event_id"),
          from_utc_timestamp(col("ts"), "America/New_York").as("ts_eastern"))
        .orderBy("event_id")),

    // X11 — null→'' for text, ''→null for datetime strings
    // (sync-db2-ago.py:154-163).
    QueryDef("x11_null_empty_dance",
      Some("""SELECT doc_id,
             |  coalesce(CASE WHEN doc_id % 10 <> 0 THEN source END, '') AS source_filled,
             |  nullif(CASE WHEN doc_id % 7 = 0 THEN '' ELSE '2024-01-01 00:00:00' END, '') AS dt_str
             |FROM documents ORDER BY doc_id""".stripMargin),
      (s, dir) => load(s, dir, "documents")
        .select(col("doc_id"),
          AgoFormat.nullToEmpty(when(col("doc_id") % 10 =!= 0, col("source")))
            .as("source_filled"),
          AgoFormat.emptyToNull(
            when(col("doc_id") % 7 === 0, lit(""))
              .otherwise(lit("2024-01-01 00:00:00"))).as("dt_str"))
        .orderBy("doc_id")),

    // X12 — '+0000'-marked strings reparsed to US Eastern
    // (sync-db2-ago.py:164-169).
    QueryDef("x12_utc_string_convert",
      Some("""WITH s AS (
             |  SELECT event_id,
             |         CASE WHEN event_id % 2 = 0
             |              THEN strftime(ts, '%Y-%m-%d %H:%M:%S') || ' +0000'
             |              ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS dt
             |  FROM events)
             |SELECT event_id,
             |  CASE WHEN contains(dt, '+0000')
             |       THEN strftime(timezone('America/New_York', timezone('UTC',
             |              strptime(regexp_replace(dt, '\s*\+0000$', ''),
             |                       '%Y-%m-%d %H:%M:%S'))), '%Y-%m-%d %H:%M:%S')
             |       ELSE dt END AS dt_local
             |FROM s ORDER BY event_id""".stripMargin),
      (s, dir) => load(s, dir, "events")
        .select(col("event_id"),
          when(col("event_id") % 2 === 0,
            concat(date_format(col("ts"), fmtSec), lit(" +0000")))
            .otherwise(date_format(col("ts"), fmtSec)).as("dt"))
        .select(col("event_id"),
          AgoFormat.utcStringToEastern(col("dt")).as("dt_local"))
        .orderBy("event_id")),

    // X13 — per-row to_char-style timestamp formatting
    // (sync-db2-ago.py:480-482).
    QueryDef("x13_date_format",
      Some("""SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str
             |FROM events ORDER BY event_id""".stripMargin),
      (s, dir) => load(s, dir, "events")
        .select(col("event_id"), AgoFormat.formatTs(col("ts")).as("ts_str"))
        .orderBy("event_id")),

    // X15 — WKT point → ESRI JSON geometry with the POINT EMPTY NaN path
    // (sync-db2-ago.py:97-105,171-246), pure to_json(struct(...)).
    QueryDef("x15_esri_point_json",
      Some("""SELECT c_custkey,
             |  CASE WHEN lat <> 0
             |       THEN '{"x":' || CAST(lon AS VARCHAR) || ',"y":' || CAST(lat AS VARCHAR)
             |            || ',"spatial_reference":{"wkid":4326}}'
             |       ELSE '{"x":"NaN","y":"NaN","spatial_reference":{"wkid":4326}}'
             |  END AS geometry
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
          AgoFormat.esriPointJson(col("lon"), col("lat")).as("geometry"))
        .orderBy("c_custkey")),

    // X15 (general) — full WKT → ESRI JSON via the native
    // EsriGeometryJson expression: points, polygons (exterior ring),
    // multipolygons, linestrings, empties (POINT EMPTY + MULTIPOINT
    // EMPTY null-coordinate point), and the non-empty-MULTIPOINT
    // NotImplementedError path as null. Rows-only: the parser semantics
    // are pinned exactly in GeoJsonSpec; a SQL mirror of WKT parsing
    // would re-implement the operator.
    QueryDef("x15b_esri_geometry_general", None,
      (s, dir) => {
        val shapes = load(s, dir, "customer")
          .select(col("c_custkey"),
            (col("c_custkey") % 10).cast("int").as("x"),
            (col("c_nationkey") % 10).cast("int").as("y"))
          .select(col("c_custkey"),
            when(col("c_custkey") % 6 === 0, lit("POINT EMPTY"))
              .when(col("c_custkey") % 6 === 1,
                concat(lit("POINT ("), col("x"), lit(" "), col("y"), lit(")")))
              .when(col("c_custkey") % 6 === 2,
                concat(lit("POLYGON (("), col("x"), lit(" "), col("y"),
                  lit(", "), col("x") + 1, lit(" "), col("y"),
                  lit(", "), col("x"), lit(" "), col("y") + 1,
                  lit(", "), col("x"), lit(" "), col("y"), lit("))")))
              .when(col("c_custkey") % 6 === 3,
                concat(lit("LINESTRING ("), col("x"), lit(" "), col("y"),
                  lit(", "), col("x") + 2, lit(" "), col("y") + 2, lit(")")))
              .when(col("c_custkey") % 6 === 4,
                concat(lit("MULTIPOINT ("), col("x"), lit(" "), col("y"), lit(")")))
              .otherwise(
                concat(lit("MULTIPOLYGON ((("), col("x"), lit(" "), col("y"),
                  lit(", "), col("x") + 1, lit(" "), col("y"),
                  lit(", "), col("x"), lit(" "), col("y") + 1,
                  lit(", "), col("x"), lit(" "), col("y"), lit(")))")))
              .as("wkt"))
        shapes.select(col("c_custkey"), col("wkt"),
          graft.functions.GeoJson.esriGeometryJson(col("wkt")).as("geometry"))
          .orderBy("c_custkey")
      }),

    // W4/B2 — deterministic batch assignment for the ordered sink:
    // 50-row batches in updated-ASC order (sync-db2-ago.py:548,645-687).
    // Enumeration is range-bucketed (Ops.withGlobalRowNumber) — no
    // single-task global Window.orderBy.
    QueryDef("w4_batched_sink",
      Some("""WITH numbered AS (
             |  SELECT event_id, row_number() OVER (ORDER BY ts, event_id) AS rn
             |  FROM events)
             |SELECT CAST(floor((rn - 1) / 50.0) AS BIGINT) AS batch_id,
             |       count(*) AS n_rows, min(event_id) AS first_id, max(event_id) AS last_id
             |FROM numbered GROUP BY 1 ORDER BY batch_id""".stripMargin),
      (s, dir) => {
        graft.operators.Ops.withGlobalRowNumber(load(s, dir, "events"),
            Seq(col("ts"), col("event_id")), col("ts"))
          .withColumn("batch_id", expr("(rn - 1) div 50"))
          .groupBy("batch_id")
          .agg(count(lit(1)).as("n_rows"),
            min(col("event_id")).as("first_id"),
            max(col("event_id")).as("last_id"))
          .orderBy("batch_id")
      }),

    // W4's operational half — the bounded-retry batched flush
    // (sync-db2-ago.py:249-336): ordered 50-row batches pushed through
    // BatchedSink's retry ladder against a flaky in-JVM sink (every
    // batch's first attempt rolls back — the reference's code-1003
    // shape; no remote sink exists in this container). The result is the
    // driver-visible report: all batches landed, one retry each, nothing
    // poisoned. Rows-only by nature (a retry ladder is not a SQL
    // expression); exactly-once/poison-isolation proofs are in
    // BatchedSinkSpec.
    QueryDef("w4b_retry_sink", None,
      (s, dir) => {
        import s.implicits._
        val batches = graft.operators.Ops.withGlobalRowNumber(
            load(s, dir, "events"), Seq(col("ts"), col("event_id")), col("ts"))
          .withColumn("batch_id", expr("(rn - 1) div 50"))
          .where(col("batch_id") < 4)
          .repartitionByRange(4, col("batch_id"))
          .select("event_id", "batch_id")
        FlakyDemoSink.reset()
        val report = graft.operators.BatchedSink.writeBatched(batches,
          batchSize = 50, maxTries = 5, backoffMs = 1)(FlakyDemoSink.flush)
        // n_sink_rows comes from the sink's own counter — accumulator
        // totals and what actually landed must agree
        Seq((report.batches, report.rows, report.retries,
            report.poisoned.size.toLong, FlakyDemoSink.landedTotal))
          .toDF("n_batches", "n_rows", "n_retries", "n_poisoned",
            "n_sink_rows")
      }),

    // B1 — 1000-id chunked iteration (delete-removed-tickets.py:81-84,
    // 114-115) as deterministic chunk bucketing.
    QueryDef("b1_chunked_ids",
      Some("""WITH numbered AS (
             |  SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS rn
             |  FROM orders)
             |SELECT CAST(floor((rn - 1) / 1000.0) AS BIGINT) AS chunk_id,
             |       count(*) AS n, min(o_orderkey) AS lo, max(o_orderkey) AS hi
             |FROM numbered GROUP BY 1 ORDER BY chunk_id""".stripMargin),
      (s, dir) => {
        graft.operators.Ops.withGlobalRowNumber(load(s, dir, "orders"),
            Seq(col("o_orderkey")), col("o_orderkey"))
          .withColumn("chunk_id", expr("(rn - 1) div 1000"))
          .groupBy("chunk_id")
          .agg(count(lit(1)).as("n"),
            min(col("o_orderkey")).as("lo"),
            max(col("o_orderkey")).as("hi"))
          .orderBy("chunk_id")
      }),

    // W8 — per-year table fan-out (sync-year-custom.py:93-94,127):
    // partitioned write, then partition-pruned read-back.
    QueryDef("w8_partition_fanout",
      Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, count(*) AS n
             |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin),
      (s, dir) => {
        val out = tmpDir("fanout", dir)
        load(s, dir, "orders")
          .withColumn("yr", year(col("o_orderdate")))
          .write.mode("overwrite").partitionBy("yr").parquet(out)
        s.read.parquet(out)
          .groupBy("yr").agg(count(lit(1)).as("n"))
          .select(col("yr").cast("int").as("yr"), col("n"))
          .orderBy("yr")
      }))
}

/** Stand-in for the reference's remote feature layer in w4b_retry_sink:
  * records landed batches in-JVM and rolls back every batch's FIRST
  * attempt (the code-1003 shape, sync-db2-ago.py:296-304). No remote
  * sink exists in this container; the retry ladder, accumulators, and
  * batch plumbing it exercises are the real operator. */
object FlakyDemoSink {
  private val attempts =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  private val landedRows = new java.util.concurrent.atomic.AtomicLong()

  def reset(): Unit = { attempts.clear(); landedRows.set(0L) }

  /** Rows the sink itself saw land — cross-checked against the
    * accumulator totals in w4b_retry_sink's report row. */
  def landedTotal: Long = landedRows.get()

  def flush(key: String, rows: Seq[org.apache.spark.sql.Row]): Unit = {
    val n = attempts.merge(key, 1, (a, b) => a + b)
    if (n <= 1)
      throw new graft.operators.BatchedSink.RetryableFailure(
        s"demo rollback of $key")
    landedRows.addAndGet(rows.size.toLong)
  }
}
