package graft

import org.apache.spark.sql.functions._

/** Pins the process_row quirks the pipeline must reproduce faithfully
  * (see Case311 scaladoc for the common.py line references). */
class Case311Spec extends SparkSpec {
  import spark.implicits._

  private lazy val out =
    Case311.normalize(Case311.syntheticRaw(spark, sf0001))
      .withColumn("srid", $"service_request_id".cast("long"))

  private def row(id: Long) = out.where($"srid" === id).head()

  test("SF_WHERE drops filtered record types") {
    val kept = out.select("srid").as[Long].collect().toSet
    assert(!kept.contains(23L)) // RecordTypeId = filtered id
    assert(!kept.contains(29L)) // RecordTypeId = ''
    assert(!kept.contains(31L)) // Agency Receivables
    assert(kept.contains(17L))
  }

  test("null description → description '' but description_full null") {
    val r = row(17) // 17 % 17 == 0 → null Description
    assert(r.getAs[String]("description") == "")
    assert(r.getAs[String]("description_full") == null)
  }

  test("private_case truthiness: only 'false' maps to 0; '0' and null map to 1") {
    assert(row(3).getAs[Int]("private_case") == 0)  // 'false'
    assert(row(1).getAs[Int]("private_case") == 1)  // 'true'
    assert(row(2).getAs[Int]("private_case") == 1)  // '0' → truthy (quirk)
    val withNull = Case311.normalize(
      Case311.syntheticRaw(spark, sf0001)
        .withColumn("Private_Case__c", lit(null).cast("string")))
    assert(withNull.head().getAs[Int]("private_case") == 1) // None → 1 (quirk)
    val withUpper = Case311.normalize(
      Case311.syntheticRaw(spark, sf0001)
        .withColumn("Private_Case__c", lit("False")))
    assert(withUpper.head().getAs[Int]("private_case") == 1) // case-sensitive
  }

  test("district >100 discarded; 0 survives (falsy-guard quirk)") {
    assert(row(110).get(row(110).fieldIndex("police_district")) == null) // PD-110
    assert(row(120).getAs[Int]("police_district") == 0)                  // PD-0
    assert(row(100).getAs[Int]("police_district") == 100)
  }

  test("zero or unparseable coordinate → null shape") {
    assert(row(11).getAs[String]("shape") == null)  // lon '0'
    assert(row(13).getAs[String]("shape") == null)  // lon 'garbage'
    assert(row(1).getAs[String]("shape") != null)
    assert(row(1).getAs[String]("shape").startsWith("SRID=4326;POINT ("))
  }

  test("unparseable date → null; others shifted to US Eastern") {
    assert(row(5).get(row(5).fieldIndex("closed_datetime")) == null) // 'not-a-date'
    val r = row(1)
    val req = r.getAs[java.sql.Timestamp]("requested_datetime")
    val upd = r.getAs[java.sql.Timestamp]("updated_datetime")
    assert(upd.getTime - req.getTime == 3600 * 1000L) // +1h preserved
  }

  test("status_notes picks close reason only when Closed") {
    assert(row(2).getAs[String]("status_notes").startsWith("resolved: "))  // 2%4=2 → Closed
    assert(row(1).getAs[String]("status_notes").startsWith("update: "))    // Open
  }

  test("plate state truncated to 30; TEXT_FIELDS non-null and ≤2000") {
    assert(row(8).getAs[String]("vehicle_license_plate_state").length == 30)
    val bad = out.where(
      Case311.TextFields.map(f => col(f).isNull || length(col(f)) > 2000)
        .reduce(_ || _))
    assert(bad.count() == 0)
  }
}
