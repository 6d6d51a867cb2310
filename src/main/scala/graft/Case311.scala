package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Normalize

/** The reference's actual 311-case pipeline, end-to-end: the 31-field
  * FIELD_MAP rename-projection (config.py:63-97), the SF_WHERE source
  * predicate (config.py:102), and every process_row transform
  * (common.py:112-224) — reproduced faithfully, including its quirks:
  *
  *  - the `'POINT EMPTY'` branch of the shape builder is dead code
  *    (guarded by `0 not in [x, y]`, common.py:121-124) → shape is WKT or
  *    null, never POINT EMPTY;
  *  - `private_case` is 0 only for False/'false' — null/'0'/garbage all
  *    map to 1 (common.py:184-186 truthiness);
  *  - a district value of 0 survives the >100 guard (the falsy check at
  *    common.py:154 skips it);
  *  - a null description leaves description_full null (the strip throws
  *    before description_full is assigned, common.py:133-139);
  *  - every TEXT_FIELD ends non-null ('' for null) and ≤2000 chars
  *    (common.py:220-222).
  */
object Case311 {

  /** config.py:63-97 — destination → source. */
  val FieldMap: Seq[(String, String)] = Seq(
    "service_request_id" -> "CaseNumber",
    "status" -> "Status",
    "service_name" -> "Case_Record_Type__c",
    "service_code" -> "Service_Code__c",
    "description" -> "Description",
    "agency_responsible" -> "Department__c",
    "service_notice" -> "SLA__c",
    "requested_datetime" -> "CreatedDate",
    "updated_datetime" -> "LastModifiedDate",
    "expected_datetime" -> "Sla_date__c",
    "closed_datetime" -> "ClosedDate",
    "address" -> "Street__c",
    "zipcode" -> "ZipCode__c",
    "media_url" -> "Media_Url__c",
    "private_case" -> "Private_Case__c",
    "subject" -> "Subject",
    "type_" -> "Type",
    "police_district" -> "Police_District__c",
    "council_district_num" -> "Council_District_No__c",
    "pinpoint_area" -> "Pinpoint_Area__c",
    "parent_service_request_id" -> "SAG_Parent_Case_Number__c",
    "li_district" -> "L_I_District__c",
    "sanitation_district" -> "Sanitation_District__c",
    "service_request_origin" -> "Origin",
    "service_type" -> "Service_Request_Type__c",
    "record_id" -> "Id",
    "vehicle_model" -> "Model__c",
    "vehicle_make" -> "Make__c",
    "vehicle_color" -> "Color__c",
    "vehicle_body_style" -> "Body_Style__c",
    "vehicle_license_plate" -> "License_Plate__c",
    "vehicle_license_plate_state" -> "License_Plate_State__c")

  /** config.py:33-46 — fields forced non-null and ≤2000. */
  val TextFields: Seq[String] = Seq(
    "status", "status_notes", "service_name", "service_code", "description",
    "agency_responsible", "service_notice", "address", "zipcode",
    "media_url", "subject", "type_")

  /** config.py:102 — SF_WHERE source predicate. Null handling is
    * deliberate: SOQL stores empty strings as null, so the reference's
    * `RecordTypeId != ''` / `NOT IN ('', ...)` terms are Salesforce's
    * is-not-blank idiom and EXCLUDE null rows — which is exactly what
    * Spark's null-propagating `=!=` / `!isin` do here. (SOQL's `!=
    * 'literal'` alone would keep nulls, unlike SQL; the `''` terms in
    * this predicate make the two agree.) */
  def sfWhere: Column =
    col("RecordTypeId") =!= "012G00000014BhVIAU" &&
      !col("Case_Record_Type__c").isin("", "Agency Receivables", "Revenue Escalation") &&
      col("RecordTypeId") =!= ""

  /** common.py:112-224 — the whole transform, columnar. Input: a frame
    * with the SOQL source columns (config.py:104-142). */
  def normalize(raw: DataFrame): DataFrame = {
    val projected = raw.where(sfWhere).select(
      FieldMap.map { case (dest, src) => col(src).as(dest) } ++ Seq(
        col("Centerline__Longitude__s").as("_lon"),
        col("Centerline__Latitude__s").as("_lat"),
        col("Close_Reason__c").as("_close_reason"),
        col("Status_Update__c").as("_status_update")): _*)

    val lon = col("_lon").try_cast("double")
    val lat = col("_lat").try_cast("double")
    val cleanedDesc = Normalize.nfkdAscii(Normalize.stripEdges(col("description")))
    val rawStatusNotes = Normalize.statusNotes(
      col("status"), col("_close_reason"), col("_status_update"))

    val transformed = projected
      // X1/F6 geometry (common.py:118-128)
      .withColumn("shape", Normalize.wktPoint(lon, lat))
      // description / description_full (common.py:133-139)
      .withColumn("description_full", substring(cleanedDesc, 1, 2000))
      .withColumn("description", substring(cleanedDesc, 1, 250))
      // plate-state truncation, null preserved (common.py:142-144)
      .withColumn("vehicle_license_plate_state",
        substring(col("vehicle_license_plate_state"), 1, 30))
      // districts: regex digits, >100 discarded (common.py:147-169)
      .withColumn("police_district", Normalize.digitsAsInt(col("police_district")))
      .withColumn("council_district_num",
        Normalize.digitsAsInt(col("council_district_num")))
      // pinpoint_area lower+strip (common.py:171-175)
      .withColumn("pinpoint_area", Normalize.lowerTrim(col("pinpoint_area")))
      // parent id: 0/'0'/garbage → null (common.py:177-181)
      .withColumn("parent_service_request_id",
        Normalize.longZeroAsNull(col("parent_service_request_id")))
      // private flag truthiness (common.py:184-186): only False/'false'
      // → 0, case-SENSITIVE — 'False'/'FALSE'/null/'0' are all truthy
      .withColumn("private_case", Normalize.boolTo01(col("private_case")))
      // status_notes pick + clean + truncate (common.py:204-216); the
      // shared cleanText also maps null → '' early, which the
      // TextFields pass below applies anyway
      .withColumn("status_notes", Normalize.cleanText(rawStatusNotes, 2000))

    // date fields → US Eastern, unparseable → null (common.py:189-201)
    val dated = Seq("requested", "updated", "expected", "closed")
      .foldLeft(transformed) { (df, p) =>
        df.withColumn(s"${p}_datetime",
          Normalize.toEastern(try_to_timestamp(col(s"${p}_datetime"))))
      }

    // TEXT_FIELDS: null → '', truncate 2000 (common.py:220-222)
    val texted = TextFields.foldLeft(dated) { (df, f) =>
      df.withColumn(f, Normalize.truncated(col(f), 2000))
    }

    texted.drop("_lon", "_lat", "_close_reason", "_status_update")
  }

  /** A deterministic Salesforce-shaped raw frame synthesized from the
    * fixtures (events ⨝ documents), exercising every normalize path:
    * filtered record types, null/garbage/zero coordinates, dirty quoted
    * descriptions, out-of-domain districts, unparseable dates, oversized
    * plate states, the private-flag truthiness table. */
  def syntheticRaw(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "events")
    val d = Tables.load(spark, dir, "documents").select(
      col("doc_id"), col("text"), col("source"))
    val fmt = "yyyy-MM-dd HH:mm:ss"
    e.withColumn("doc_id", col("event_id") % 500)
      .join(d, "doc_id")
      .select(
        col("event_id").cast("string").as("CaseNumber"),
        element_at(array(lit("New"), lit("Open"), lit("Closed"), lit("Pending")),
          (col("event_id") % 4).cast("int") + 1).as("Status"),
        when(col("event_id") % 17 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("<'"), col("text"), lit("'>"))).as("Description"),
        date_format(col("ts"), fmt).as("CreatedDate"),
        date_format(col("ts") + expr("INTERVAL 1 HOUR"), fmt).as("LastModifiedDate"),
        when(col("event_id") % 5 === 0, lit("not-a-date"))
          .otherwise(date_format(col("ts") + expr("INTERVAL 2 HOUR"), fmt))
          .as("ClosedDate"),
        date_format(col("ts") + expr("INTERVAL 72 HOUR"), fmt).as("Sla_date__c"),
        when(col("event_id") % 23 === 0, lit("012G00000014BhVIAU"))
          .when(col("event_id") % 29 === 0, lit(""))
          .otherwise(lit("OTHER")).as("RecordTypeId"),
        when(col("event_id") % 31 === 0, lit("Agency Receivables"))
          .otherwise(concat(lit("Request:"), col("event_type")))
          .as("Case_Record_Type__c"),
        when(col("event_id") % 13 === 0, lit("garbage"))
          .when(col("event_id") % 11 === 0, lit("0"))
          .otherwise((lit(-75.0) - col("value") / 10000.0).cast("string"))
          .as("Centerline__Longitude__s"),
        when(col("event_id") % 19 === 0, lit(null).cast("string"))
          .otherwise((lit(39.0) + (col("user_id") % 100) / 100.0).cast("string"))
          .as("Centerline__Latitude__s"),
        concat(lit("Dept-"), col("source")).as("Department__c"),
        concat(lit("Street "), col("event_id") % 1000).as("Street__c"),
        element_at(array(lit("false"), lit("true"), lit("0")),
          (col("event_id") % 3).cast("int") + 1).as("Private_Case__c"),
        lit("Standard SLA").as("SLA__c"),
        concat(lit("SC-"), col("event_id") % 40).as("Service_Code__c"),
        concat(lit("191"), col("event_id") % 100).as("ZipCode__c"),
        when(col("event_id") % 9 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("https://media/"), col("event_id"))).as("Media_Url__c"),
        concat(lit("resolved: "), col("event_type")).as("Close_Reason__c"),
        concat(lit("update: "), col("event_type")).as("Status_Update__c"),
        concat(lit("Subject "), col("event_type")).as("Subject"),
        lit("Case").as("Type"),
        concat(lit("PD-"), col("event_id") % 120).as("Police_District__c"),
        col("event_id").cast("string").substr(lit(1), lit(1)).as("Council_District_No__c"),
        when(col("event_id") % 7 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("  AREA-"), col("user_id"), lit(" ")))
          .as("Pinpoint_Area__c"),
        (col("event_id") % 50).cast("string").as("SAG_Parent_Case_Number__c"),
        concat(lit("LI-"), col("user_id") % 10).as("L_I_District__c"),
        concat(lit("SAN-"), col("user_id") % 6).as("Sanitation_District__c"),
        lit("Phone").as("Origin"),
        col("event_type").as("Service_Request_Type__c"),
        concat(lit("id-"), col("event_id")).as("Id"),
        lit("ModelX").as("Model__c"),
        lit("MakeY").as("Make__c"),
        lit("blue").as("Color__c"),
        lit("sedan").as("Body_Style__c"),
        concat(lit("PLATE"), col("event_id") % 100).as("License_Plate__c"),
        when(col("event_id") % 8 === 0, rpad(lit("PA-"), 40, "x"))
          .otherwise(lit("PA")).as("License_Plate_State__c"))
  }
}
