package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** General WKT → ESRI JSON geometry (SURVEY §2.7 X15, the full version):
  * reproduces /root/reference/sync-db2-ago.py:70-126 + 171-246 —
  *
  *  - POINT (x y)                      → {"x":x,"y":y,"spatial_reference":{"wkid":4326}}
  *  - POLYGON ((ring) [,holes…])       → {"rings":[[…exterior…]],…} (exterior
  *    only, like the reference's poly.exterior access)
  *  - MULTIPOLYGON (((r1)),((r2)))     → {"rings":[[r1],[r2]],…} (one exterior
  *    ring per member polygon)
  *  - LINESTRING (x y, x y, …)         → {"paths":[[[x,y],…]],…}
  *  - ''/POINT EMPTY                   → empty geometry of the LAYER's
  *    type, like sync-db2-ago.py:181-205: NaN point for point layers,
  *    {"paths":[]} for polyline, {"rings":[]} for polygon
  *  - MULTIPOINT EMPTY                 → null-coordinate point (the
  *    reference's substring dispatch sends it down the POINT branch and
  *    project_and_format_shape returns (None, None),
  *    sync-db2-ago.py:103-105,209)
  *  - non-empty MULTIPOINT/unrecognized → null (reference raises
  *    NotImplementedError; the engine's swallow-to-null convention applies)
  *  - typed EMPTY ('POLYGON EMPTY', 'LINESTRING EMPTY') → one empty
  *    ring/path ({"rings":[[]]} / {"paths":[[]]}), matching the
  *    reference's format_ring on an empty shapely geometry wrapped by
  *    the {"rings":[ring]} construction (sync-db2-ago.py:230-242)
  *
  * An optional 'SRID=n;' EWKT prefix (the engine's internal shape format,
  * common.py:124) is stripped. Re-projection is the identity (IN_SRID ==
  * AGO_SRID == 4326, config.py:5-6).
  */
object GeoJsonUtil {
  private val Sr = """"spatial_reference":{"wkid":4326}"""
  /** Shared with AgoFormat.esriPointJson — one spelling of the empty
    * point geometry across both X15 variants. */
  val NanPointJson: String = s"""{"x":"NaN","y":"NaN",$Sr}"""
  val NullPointJson: String = s"""{"x":null,"y":null,$Sr}"""
  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Layer geometry types, reference GEOMETRIC values
    * (sync-db2-ago.py:181-205). */
  val PointLayer = "esriGeometryPoint"
  val PolylineLayer = "esriGeometryPolyline"
  val PolygonLayer = "esriGeometryPolygon"

  def esriJson(wkt: UTF8String, layerType: String): UTF8String = {
    val s0 = wkt.toString.trim
    val s = if (s0.startsWith("SRID=")) s0.substring(s0.indexOf(';') + 1).trim else s0
    val out: String =
      if (s.isEmpty || s == "POINT EMPTY") layerType match {
        case PolylineLayer => s"""{"paths":[],$Sr}"""
        case PolygonLayer => s"""{"rings":[],$Sr}"""
        case _ => NanPointJson
      }
      else if (s.startsWith("MULTIPOLYGON")) multiPolygon(body(s, "MULTIPOLYGON"))
      else if (s.startsWith("POLYGON")) polygon(body(s, "POLYGON"))
      else if (s.startsWith("LINESTRING")) lineString(body(s, "LINESTRING"))
      else if (s == "MULTIPOINT EMPTY") NullPointJson
      else if (s.startsWith("MULTIPOINT")) null
      else if (s.startsWith("POINT")) point(body(s, "POINT"))
      else null
    if (out == null) null else UTF8String.fromString(out)
  }

  /** Text after the type keyword, trimmed ('EMPTY' bodies → ""). */
  private def body(s: String, kw: String): String = {
    val rest = s.substring(kw.length).trim
    if (rest == "EMPTY") "" else rest
  }

  private def point(b: String): String = {
    if (b.isEmpty) return NanPointJson
    val inner = stripParens(b)
    val parts = Ws.split(inner.trim)
    if (parts.length < 2) return null
    try {
      val x = java.lang.Double.parseDouble(parts(0))
      val y = java.lang.Double.parseDouble(parts(1))
      s"""{"x":$x,"y":$y,$Sr}"""
    } catch { case _: NumberFormatException => null }
  }

  private def lineString(b: String): String = {
    if (b.isEmpty) return s"""{"paths":[[]],$Sr}""" // empty path, ref:240
    val path = coordList(stripParens(b))
    if (path == null) null else s"""{"paths":[$path],$Sr}"""
  }

  private def polygon(b: String): String = {
    if (b.isEmpty) return s"""{"rings":[[]],$Sr}""" // empty ring, ref:233
    // exterior ring = first parenthesized group inside the outer parens
    val rings = splitGroups(stripParens(b))
    if (rings.isEmpty) return s"""{"rings":[[]],$Sr}"""
    val ext = coordList(stripParens(rings.head))
    if (ext == null) null else s"""{"rings":[$ext],$Sr}"""
  }

  private def multiPolygon(b: String): String = {
    // MULTIPOLYGON EMPTY iterates zero member polygons → no rings (ref:226-230)
    if (b.isEmpty) return s"""{"rings":[],$Sr}"""
    val polys = splitGroups(stripParens(b))
    val ringJsons = polys.map { p =>
      val rings = splitGroups(stripParens(p))
      if (rings.isEmpty) null else coordList(stripParens(rings.head))
    }
    if (ringJsons.exists(_ == null)) null
    else s"""{"rings":[${ringJsons.mkString(",")}],$Sr}"""
  }

  private def stripParens(s: String): String = {
    val t = s.trim
    if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1) else t
  }

  /** Split "(...),(...)" at top parenthesis depth. */
  private def splitGroups(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var start = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** "x y, x y, …" → "[[x,y],[x,y],…]". */
  private def coordList(s: String): String = {
    val pts = s.split(",")
    val sb = new java.lang.StringBuilder("[")
    var first = true
    for (p <- pts) {
      val parts = Ws.split(p.trim)
      if (parts.length < 2) return null
      try {
        val x = java.lang.Double.parseDouble(parts(0))
        val y = java.lang.Double.parseDouble(parts(1))
        if (!first) sb.append(',')
        sb.append('[').append(x).append(',').append(y).append(']')
        first = false
      } catch { case _: NumberFormatException => return null }
    }
    sb.append(']').toString
  }
}

/** esri_geometry_json(string) → string, with codegen. `layerType` is the
  * target layer's geometry type (controls the empty-shape output, like
  * the reference's GEOMETRIC branches). */
case class EsriGeometryJson(child: Expression,
    layerType: String = GeoJsonUtil.PointLayer) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true // null input → null output
  // the function can return null (unrecognized shape) even for a
  // non-null input: the expression is nullable regardless of the child,
  // and generated code must re-check after the call (defineCodeGen would
  // mark the result non-null and NPE downstream; with a non-nullable
  // child, nullable=false would even elide the isNull variable the
  // re-check writes to).
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    GeoJsonUtil.esriJson(v.asInstanceOf[UTF8String], layerType)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // layerType is a free-form API string: a reference object keeps it
    // out of the generated source, where a quote or backslash in the
    // value would break Janino compilation
    val lt = ctx.addReferenceObj("layerType", layerType, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.GeoJsonUtil.esriJson($c, $lt);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): EsriGeometryJson =
    copy(child = newChild)
  override def prettyName: String = "esri_geometry_json"
}

object GeoJson {
  def esriGeometryJson(wkt: Column,
      layerType: String = GeoJsonUtil.PointLayer): Column =
    ColumnBridge.column(
      EsriGeometryJson(ColumnBridge.expression(wkt), layerType))
}
