package graft

import org.apache.spark.sql.functions._

/** Capability registry, batch 5: the reference's actual case pipeline
  * end-to-end (SF_WHERE → FIELD_MAP → process_row), verified column by
  * column against a DuckDB oracle that mirrors every transform (the
  * synthetic raw feed is ASCII, so the NFKD step is the identity and the
  * whole pipeline stays oracle-expressible).
  */
object Case311Queries {

  private val strip = "'^[<>'']+|[<>'']+$'"

  val defs: Seq[QueryDef] = Seq(
    QueryDef("case311_pipeline",
      Some(s"""WITH raw AS (
              |  SELECT
              |    CAST(e.event_id AS VARCHAR) AS case_number,
              |    ['New','Open','Closed','Pending'][CAST(e.event_id % 4 AS INTEGER) + 1] AS status0,
              |    CASE WHEN e.event_id % 17 = 0 THEN NULL
              |         ELSE '<''' || d.text || '''>' END AS description0,
              |    strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS created_s,
              |    strftime(e.ts + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS modified_s,
              |    CASE WHEN e.event_id % 5 = 0 THEN 'not-a-date'
              |         ELSE strftime(e.ts + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') END AS closed_s,
              |    CASE WHEN e.event_id % 23 = 0 THEN '012G00000014BhVIAU'
              |         WHEN e.event_id % 29 = 0 THEN '' ELSE 'OTHER' END AS record_type_id,
              |    CASE WHEN e.event_id % 31 = 0 THEN 'Agency Receivables'
              |         ELSE 'Request:' || e.event_type END AS case_record_type,
              |    CASE WHEN e.event_id % 13 = 0 THEN 'garbage'
              |         WHEN e.event_id % 11 = 0 THEN '0'
              |         ELSE CAST(-75.0 - e.value / 10000.0 AS VARCHAR) END AS lon_s,
              |    CASE WHEN e.event_id % 19 = 0 THEN NULL
              |         ELSE CAST(39.0 + (e.user_id % 100) / 100.0 AS VARCHAR) END AS lat_s,
              |    ['false','true','0'][CAST(e.event_id % 3 AS INTEGER) + 1] AS private0,
              |    'resolved: ' || e.event_type AS close_reason,
              |    'update: ' || e.event_type AS status_update,
              |    'PD-' || CAST(e.event_id % 120 AS VARCHAR) AS police0,
              |    substring(CAST(e.event_id AS VARCHAR), 1, 1) AS council0,
              |    CASE WHEN e.event_id % 7 = 0 THEN NULL
              |         ELSE '  AREA-' || CAST(e.user_id AS VARCHAR) || ' ' END AS pinpoint0,
              |    CAST(e.event_id % 50 AS VARCHAR) AS parent0,
              |    CASE WHEN e.event_id % 8 = 0 THEN rpad('PA-', 40, 'x') ELSE 'PA' END AS plate_state0,
              |    '191' || CAST(e.event_id % 100 AS VARCHAR) AS zip0
              |  FROM events e JOIN documents d ON (e.event_id % 500) = d.doc_id),
              |f AS (
              |  SELECT * FROM raw
              |  WHERE record_type_id <> '012G00000014BhVIAU'
              |    AND case_record_type NOT IN ('', 'Agency Receivables', 'Revenue Escalation')
              |    AND record_type_id <> ''),
              |t AS (
              |  SELECT
              |    case_number AS service_request_id,
              |    coalesce(status0, '') AS status,
              |    CASE WHEN TRY_CAST(lon_s AS DOUBLE) IS NOT NULL AND TRY_CAST(lat_s AS DOUBLE) IS NOT NULL
              |              AND TRY_CAST(lon_s AS DOUBLE) <> 0 AND TRY_CAST(lat_s AS DOUBLE) <> 0
              |         THEN 'SRID=4326;POINT (' || CAST(TRY_CAST(lon_s AS DOUBLE) AS VARCHAR) || ' '
              |              || CAST(TRY_CAST(lat_s AS DOUBLE) AS VARCHAR) || ')' END AS shape,
              |    coalesce(substring(regexp_replace(description0, $strip, '', 'g'), 1, 250), '') AS description,
              |    substring(regexp_replace(description0, $strip, '', 'g'), 1, 2000) AS description_full,
              |    coalesce(substring(regexp_replace(
              |      CASE WHEN status0 = 'Closed' THEN close_reason ELSE status_update END,
              |      $strip, '', 'g'), 1, 2000), '') AS status_notes,
              |    CASE WHEN regexp_extract(police0, '[0-9]+') <> ''
              |              AND TRY_CAST(regexp_extract(police0, '[0-9]+') AS INTEGER) <= 100
              |         THEN TRY_CAST(regexp_extract(police0, '[0-9]+') AS INTEGER) END AS police_district,
              |    CASE WHEN regexp_extract(council0, '[0-9]+') <> ''
              |              AND TRY_CAST(regexp_extract(council0, '[0-9]+') AS INTEGER) <= 100
              |         THEN TRY_CAST(regexp_extract(council0, '[0-9]+') AS INTEGER) END AS council_district_num,
              |    lower(trim(pinpoint0)) AS pinpoint_area,
              |    CASE WHEN TRY_CAST(parent0 AS BIGINT) <> 0 THEN TRY_CAST(parent0 AS BIGINT) END
              |      AS parent_service_request_id,
              |    CASE WHEN private0 = 'false' THEN 0 ELSE 1 END AS private_case,
              |    timezone('America/New_York', timezone('UTC', TRY_CAST(created_s AS TIMESTAMP))) AS requested_datetime,
              |    timezone('America/New_York', timezone('UTC', TRY_CAST(modified_s AS TIMESTAMP))) AS updated_datetime,
              |    timezone('America/New_York', timezone('UTC', TRY_CAST(closed_s AS TIMESTAMP))) AS closed_datetime,
              |    substring(plate_state0, 1, 30) AS vehicle_license_plate_state,
              |    coalesce(zip0, '') AS zipcode
              |  FROM f)
              |SELECT * FROM t ORDER BY CAST(service_request_id AS BIGINT)""".stripMargin),
      (s, dir) => Case311.normalize(Case311.syntheticRaw(s, dir))
        .select("service_request_id", "status", "shape", "description",
          "description_full", "status_notes", "police_district",
          "council_district_num", "pinpoint_area", "parent_service_request_id",
          "private_case", "requested_datetime", "updated_datetime",
          "closed_datetime", "vehicle_license_plate_state", "zipcode")
        .orderBy(col("service_request_id").cast("long"))),

    // The reference's FULL operational cycle in one dataflow
    // (sync-db2.py end-to-end + delete-removed-tickets.py): day-0 bulk
    // load → a sync cycle later the source has re-modified cases (every
    // 6th, now Closed, LastModifiedDate bumped) and deleted cases (every
    // 37th) → watermark from the warehouse, strict-> delta extraction,
    // whole-row-replace merge, anti-join deletion reconciliation, purge.
    // The ORACLE is the semantic fixed point, computed independently:
    // normalize the source's CURRENT state (v2 rows override v1, deleted
    // ids gone) — merge-then-normalize and normalize-then-merge must
    // agree because the merge replaces whole rows keyed on the id and
    // the transform is deterministic and row-wise.
    QueryDef("case311_full_cycle",
      Some(s"""WITH raw AS (
              |  SELECT
              |    e.event_id AS eid,
              |    CAST(e.event_id AS VARCHAR) AS case_number,
              |    ['New','Open','Closed','Pending'][CAST(e.event_id % 4 AS INTEGER) + 1] AS status0,
              |    CASE WHEN e.event_id % 17 = 0 THEN NULL
              |         ELSE '<''' || d.text || '''>' END AS description0,
              |    strftime(e.ts + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS modified_s,
              |    strftime(e.ts + INTERVAL 1 HOUR + INTERVAL 7300 DAY, '%Y-%m-%d %H:%M:%S') AS modified2_s,
              |    CASE WHEN e.event_id % 23 = 0 THEN '012G00000014BhVIAU'
              |         WHEN e.event_id % 29 = 0 THEN '' ELSE 'OTHER' END AS record_type_id,
              |    CASE WHEN e.event_id % 31 = 0 THEN 'Agency Receivables'
              |         ELSE 'Request:' || e.event_type END AS case_record_type,
              |    'resolved: ' || e.event_type AS close_reason,
              |    'update: ' || e.event_type AS status_update,
              |    'PD-' || CAST(e.event_id % 120 AS VARCHAR) AS police0,
              |    ['false','true','0'][CAST(e.event_id % 3 AS INTEGER) + 1] AS private0,
              |    '191' || CAST(e.event_id % 100 AS VARCHAR) AS zip0
              |  FROM events e JOIN documents d ON (e.event_id % 500) = d.doc_id),
              |cur AS (
              |  SELECT raw.* REPLACE (
              |      CASE WHEN eid % 6 = 0 THEN 'Closed' ELSE status0 END AS status0,
              |      CASE WHEN eid % 6 = 0 THEN modified2_s ELSE modified_s END AS modified_s)
              |  FROM raw WHERE eid % 37 <> 0),
              |f AS (
              |  SELECT * FROM cur
              |  WHERE record_type_id <> '012G00000014BhVIAU'
              |    AND case_record_type NOT IN ('', 'Agency Receivables', 'Revenue Escalation')
              |    AND record_type_id <> ''),
              |t AS (
              |  SELECT
              |    case_number AS service_request_id,
              |    coalesce(status0, '') AS status,
              |    coalesce(substring(regexp_replace(description0, $strip, '', 'g'), 1, 250), '') AS description,
              |    coalesce(substring(regexp_replace(
              |      CASE WHEN status0 = 'Closed' THEN close_reason ELSE status_update END,
              |      $strip, '', 'g'), 1, 2000), '') AS status_notes,
              |    CASE WHEN regexp_extract(police0, '[0-9]+') <> ''
              |              AND TRY_CAST(regexp_extract(police0, '[0-9]+') AS INTEGER) <= 100
              |         THEN TRY_CAST(regexp_extract(police0, '[0-9]+') AS INTEGER) END AS police_district,
              |    CASE WHEN private0 = 'false' THEN 0 ELSE 1 END AS private_case,
              |    timezone('America/New_York', timezone('UTC', TRY_CAST(modified_s AS TIMESTAMP))) AS updated_datetime,
              |    coalesce(zip0, '') AS zipcode
              |  FROM f)
              |SELECT * FROM t ORDER BY CAST(service_request_id AS BIGINT)""".stripMargin),
      (s, dir) => {
        val fmt = "yyyy-MM-dd HH:mm:ss"
        val raw = Case311.syntheticRaw(s, dir)
        val idL = col("CaseNumber").cast("long")
        // day-0 bulk load (W7 truncate-and-load shape)
        val warehouse = Case311.normalize(raw)
        // the source one cycle later: every 6th case re-modified and
        // closed (LastModifiedDate bumped far past the old watermark),
        // every 37th case deleted at the source
        val modified = raw.where(idL % 6 === 0 && idL % 37 =!= 0)
          .withColumn("Status", lit("Closed"))
          .withColumn("LastModifiedDate", date_format(
            to_timestamp(col("LastModifiedDate"), fmt)
              + expr("INTERVAL 7300 DAYS"), fmt))
        // A1 watermark (epoch default on an empty target) → F2 strict->
        // delta → J3/J4 whole-row merge, all via the library's own cycle
        val merged = graft.operators.Incremental.incrementalSync(
          warehouse, Case311.normalize(modified),
          "service_request_id", "updated_datetime")
        // J2 deletion reconciliation + J5/W5 purge
        val sourceIds = raw.where(idL % 37 =!= 0)
          .select(col("CaseNumber").as("service_request_id"))
        val deleted = graft.operators.Incremental.deletedIds(
          merged.select("service_request_id"), sourceIds, "service_request_id")
        graft.operators.Incremental.purge(merged, deleted, "service_request_id")
          .select("service_request_id", "status", "description",
            "status_notes", "police_district", "private_case",
            "updated_datetime", "zipcode")
          .orderBy(col("service_request_id").cast("long"))
      }))
}
