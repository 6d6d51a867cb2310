package graft

import org.apache.spark.sql.functions._
import graft.functions.Normalize._

/** Unit vectors for SURVEY §2.7 scalar semantics, including every
  * try/except→null path of the reference's process_row. */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).head().get(0)

  test("stripEdges strips <>' from ends only (str.strip semantics)") {
    assert(one(stripEdges(lit("<<'a<b>c'>>"))) == "a<b>c")
    assert(one(stripEdges(lit("plain"))) == "plain")
    assert(one(stripEdges(lit("''''"))) == "")
  }

  test("stripAllSpecials removes '\"<> everywhere (AGO variant)") {
    assert(one(stripAllSpecials(lit("a'b\"c<d>e"))) == "abcde")
  }

  test("nfkdAscii strips accents to base letters and drops emoji") {
    assert(one(nfkdAscii(lit("café"))) == "cafe")
    assert(one(nfkdAscii(lit("naïve ☂ emoji 🎉 ñ"))) == "naive  emoji  n")
    assert(one(nfkdAscii(lit(""))) == "")
    // null in → null out
    assert(one(nfkdAscii(lit(null).cast("string"))) == null)
  }

  test("nfkdAscii is idempotent") {
    val s = "Ĥéllø wörld ⚠"
    assert(one(nfkdAscii(nfkdAscii(lit(s)))) == one(nfkdAscii(lit(s))))
  }

  test("truncated bounds length and maps null to ''") {
    assert(one(truncated(lit("x" * 3000), 2000)) == "x" * 2000)
    assert(one(truncated(lit(null).cast("string"), 10)) == "")
    assert(one(truncated(lit("short"), 250)) == "short")
  }

  test("digitsAsInt extracts first digit run, nulls out-of-domain") {
    assert(one(digitsAsInt(lit("Police District 7"))) == 7)
    assert(one(digitsAsInt(lit("district-042-x"))) == 42)
    assert(one(digitsAsInt(lit("no digits"))) == null)
    assert(one(digitsAsInt(lit("district 999"))) == null) // >100 guard
    assert(one(digitsAsInt(lit("007 bond"))) == 7)        // int('007') == 7
  }

  test("longZeroAsNull: 0 and garbage → null") {
    assert(one(longZeroAsNull(lit("17"))) == 17L)
    assert(one(longZeroAsNull(lit("0"))) == null)
    assert(one(longZeroAsNull(lit("garbage"))) == null)
  }

  test("boolTo01: ONLY false/'false' → 0; null/'0'/''/'False' are truthy → 1") {
    assert(one(boolTo01(lit("false"))) == 0)
    assert(one(boolTo01(lit(false))) == 0)      // boolean false → "false"
    assert(one(boolTo01(lit("False"))) == 1)    // case-sensitive (quirk)
    assert(one(boolTo01(lit("0"))) == 1)        // truthiness (quirk)
    assert(one(boolTo01(lit(""))) == 1)
    assert(one(boolTo01(lit(null).cast("string"))) == 1)
    assert(one(boolTo01(lit("true"))) == 1)
    assert(one(boolTo01(lit("anything"))) == 1)
  }

  test("wktPoint: zero or null coordinate → null shape") {
    assert(one(wktPoint(lit(-75.16), lit(39.95))) == "SRID=4326;POINT (-75.16 39.95)")
    assert(one(wktPoint(lit(0.0), lit(39.95))) == null)
    assert(one(wktPoint(lit(-75.16), lit(null).cast("double"))) == null)
  }

  test("statusNotes picks close reason only when Closed") {
    assert(one(statusNotes(lit("Closed"), lit("done"), lit("pending"))) == "done")
    assert(one(statusNotes(lit("Open"), lit("done"), lit("pending"))) == "pending")
  }

  test("cleanText composition bounds length after strip+ascii") {
    val r = one(cleanText(lit("<'" + "é" * 300 + "'>"), 250)).asInstanceOf[String]
    assert(r.length == 250 && r.forall(_ == 'e'))
  }

  test("X16 reproject: 4326->3857 roundtrips through the inverse; identity is exact") {
    import graft.functions.Reproject
    val pts = Seq((-75.1234, 39.9876), (0.0, 0.0), (150.5, -33.86))
      .toDF("lon", "lat")
    val (mx, my) = Reproject.project(col("lon"), col("lat"), 4326, 3857)
    val (rlon, rlat) = Reproject.project(mx, my, 3857, 4326)
    val maxErr = pts
      .select(greatest(abs(rlon - col("lon")), abs(rlat - col("lat"))).as("e"))
      .as[Double].collect().max
    assert(maxErr < 1e-9, s"roundtrip error $maxErr deg")

    val (ilon, ilat) = Reproject.project(col("lon"), col("lat"), 4326, 4326)
    assert(pts.where(ilon =!= col("lon") || ilat =!= col("lat")).isEmpty,
      "identity path must pass coordinates through untouched")
  }

  test("X16 reproject: unsupported SRID pairs fail fast, like NotImplementedError") {
    intercept[IllegalArgumentException] {
      graft.functions.Reproject.project(lit(0.0), lit(0.0), 4326, 2272)
    }
  }
}
