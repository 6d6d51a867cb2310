package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoJson.esriGeometryJson

class GeoJsonSpec extends SparkSpec {
  import spark.implicits._

  private def one(wkt: String): String =
    Seq(wkt).toDF("w").select(esriGeometryJson($"w").as("j"))
      .as[String].head()

  private val sr = """"spatial_reference":{"wkid":4326}"""

  test("point, with and without EWKT SRID prefix") {
    assert(one("POINT (-75.16 39.95)") == s"""{"x":-75.16,"y":39.95,$sr}""")
    assert(one("SRID=4326;POINT (-75.16 39.95)") == s"""{"x":-75.16,"y":39.95,$sr}""")
  }

  test("POINT EMPTY and blank → NaN point (reference's empty path)") {
    assert(one("POINT EMPTY") == s"""{"x":"NaN","y":"NaN",$sr}""")
    assert(one("  ") == s"""{"x":"NaN","y":"NaN",$sr}""")
  }

  test("polygon: exterior ring only, holes dropped like poly.exterior") {
    assert(one("POLYGON ((0 0, 0 1, 1 1, 0 0))") ==
      s"""{"rings":[[[0.0,0.0],[0.0,1.0],[1.0,1.0],[0.0,0.0]]],$sr}""")
    assert(one("POLYGON ((0 0, 0 4, 4 4, 0 0), (1 1, 1 2, 2 2, 1 1))") ==
      s"""{"rings":[[[0.0,0.0],[0.0,4.0],[4.0,4.0],[0.0,0.0]]],$sr}""")
  }

  test("multipolygon: one exterior ring per member") {
    assert(one("MULTIPOLYGON (((0 0, 0 1, 1 1, 0 0)), ((5 5, 5 6, 6 6, 5 5)))") ==
      s"""{"rings":[[[0.0,0.0],[0.0,1.0],[1.0,1.0],[0.0,0.0]],""" +
        s"""[[5.0,5.0],[5.0,6.0],[6.0,6.0],[5.0,5.0]]],$sr}""")
  }

  test("linestring → single path") {
    assert(one("LINESTRING (0 0, 1 1, 2 0)") ==
      s"""{"paths":[[[0.0,0.0],[1.0,1.0],[2.0,0.0]]],$sr}""")
  }

  test("MULTIPOINT (reference NotImplementedError) and garbage → null") {
    assert(one("MULTIPOINT (0 0, 1 1)") == null)
    assert(one("TRIANGLE (0 0)") == null)
    assert(one("POINT (abc def)") == null)
  }

  test("MULTIPOINT EMPTY rides the reference's POINT branch → null coords") {
    assert(one("MULTIPOINT EMPTY") == s"""{"x":null,"y":null,$sr}""")
  }

  test("typed EMPTY → one empty ring/path (format_ring on empty geometry)") {
    assert(one("POLYGON EMPTY") == s"""{"rings":[[]],$sr}""")
    assert(one("LINESTRING EMPTY") == s"""{"paths":[[]],$sr}""")
    assert(one("MULTIPOLYGON EMPTY") == s"""{"rings":[],$sr}""")
  }

  test("blank shape honors the layer geometry type (GEOMETRIC branches)") {
    import graft.functions.GeoJsonUtil
    def oneTyped(wkt: String, t: String): String =
      Seq(wkt).toDF("w").select(esriGeometryJson($"w", t).as("j"))
        .as[String].head()
    assert(oneTyped("", GeoJsonUtil.PolylineLayer) == s"""{"paths":[],$sr}""")
    assert(oneTyped("", GeoJsonUtil.PolygonLayer) == s"""{"rings":[],$sr}""")
    assert(oneTyped("", GeoJsonUtil.PointLayer) == s"""{"x":"NaN","y":"NaN",$sr}""")
  }

  test("non-nullable child + null-producing shape survives codegen") {
    // child is non-nullable (concat of literals over range's id): the
    // expression must still declare itself nullable and produce nulls.
    val df = spark.range(0, 10)
      .select(esriGeometryJson(
        concat(lit("MULTIPOINT ("), $"id".cast("string"), lit(" 0)")))
        .as("j"))
    assert(df.schema.head.nullable)
    assert(df.where($"j".isNull).count() == 10)
  }

  test("works over a column of mixed shapes without codegen failure") {
    val df = Seq(
      "POINT (1 2)", "POLYGON ((0 0, 0 1, 1 1, 0 0))",
      "LINESTRING (0 0, 1 1)", "MULTIPOINT (0 0)", "POINT EMPTY")
      .toDF("w").select(esriGeometryJson($"w").as("j"))
    assert(df.count() == 5)
    assert(df.where($"j".isNull).count() == 1) // only MULTIPOINT
  }
}
