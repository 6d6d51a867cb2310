package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** JVM-static text helpers, callable both from interpreted eval and from
  * whole-stage-generated Java (a static call keeps the expression inside
  * the codegen span instead of breaking it the way a Scala UDF would).
  */
object TextNorm {
  /** NFKD-normalize then keep only ASCII (reference: common.py:135
    * `unicodedata.normalize("NFKD", s).encode("ascii", "ignore")`):
    * strips accents to base letters and drops emoji/symbols entirely. */
  def nfkdAscii(s: UTF8String): UTF8String = {
    val norm =
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(norm.length)
    var i = 0
    while (i < norm.length) {
      val c = norm.charAt(i)
      if (c < 128) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Codegen-friendly NFKD→ASCII normalization as a native Catalyst
  * expression (SURVEY §2.7 X3). Null-intolerant: null in → null out. */
case class NfkdAscii(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextNorm.nfkdAscii(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.nfkdAscii($c)")
  override protected def withNewChildInternal(newChild: Expression): NfkdAscii =
    copy(child = newChild)
  override def prettyName: String = "nfkd_ascii"
}

/** The reference's per-row transform core (`process_row`,
  * /root/reference/common.py:112-224) re-expressed as pure Column
  * expressions — every function here is codegen'd by Catalyst, applies
  * columnar-batch-wide, and degrades to null instead of throwing, matching
  * the reference's try/except-swallowing style.
  */
object Normalize {

  /** X3 — NFKD unicode → ASCII (common.py:135,212). */
  def nfkdAscii(c: Column): Column =
    ColumnBridge.column(NfkdAscii(ColumnBridge.expression(c)))

  /** X2 (strict) — strip `<`, `>`, `'` from the ENDS only, like Python
    * `str.strip("<>'")` (common.py:134). */
  def stripEdges(c: Column): Column =
    regexp_replace(c, "^[<>']+|[<>']+$", "")

  /** X2 (AGO variant) — remove `'`, `"`, `<`, `>` EVERYWHERE, like the
    * replace-all loop in sync-db2-ago.py:144-152. */
  def stripAllSpecials(c: Column): Column =
    translate(c, "'\"<>", "")

  /** X4 — bounded truncation with null→'' (common.py:136-137,143,213-214,
    * 220-222; limits from config.py:33-46). */
  def truncated(c: Column, n: Int): Column =
    substring(coalesce(c, lit("")), 1, n)

  /** X5 + F7 — first run of digits as int, null when absent or when the
    * value exceeds the domain bound (common.py:148-169: district numbers
    * > 100 are discarded). */
  def digitsAsInt(c: Column, maxValid: Int = 100): Column = {
    val d = regexp_extract(c, "[0-9]+", 0)
    val i = when(d =!= "", d.try_cast("int"))
    when(i <= maxValid, i)
  }

  /** X6 — lowercase + trim, null-preserving (common.py:171-175). */
  def lowerTrim(c: Column): Column = lower(trim(c))

  /** X7 — integer parse with 0 treated as null (common.py:177-181:
    * parent_service_request_id of 0/'0'/garbage → null). try_cast keeps
    * the reference's swallow-to-null behavior under Spark's default ANSI
    * mode. */
  def longZeroAsNull(c: Column): Column = {
    val l = c.try_cast("long")
    when(l =!= 0, l)
  }

  /** X8 — boolean-ish → 0/1, exactly common.py:184-186
    * (`0 if private in [False, 'false'] else 1`): ONLY a boolean false
    * (which stringifies to "false") or the exact lowercase string
    * 'false' maps to 0; everything else — including null, '0', '' and
    * case variants like 'False' — is truthy and maps to 1. */
  def boolTo01(c: Column): Column =
    when(c.cast("string") === "false", 0).otherwise(1)

  /** X9 — UTC timestamp → US Eastern wall-clock (common.py:189-201).
    * Takes a TIMESTAMP column; string callers must parse first with
    * try_to_timestamp (a raw string here would go through an implicit
    * ANSI cast and THROW on garbage instead of degrading to null). */
  def toEastern(c: Column): Column =
    from_utc_timestamp(c, "America/New_York")

  /** X1 — WKT point synthesis with zero/null guard (common.py:118-128):
    * either coordinate null or 0 → null geometry, else
    * 'SRID=4326;POINT (lon lat)'. Text rendering follows the input
    * column type: double renders like Python's `'{}'.format(float)` —
    * including scientific notation for |v| < 1e-3 or ≥ 1e7, which the
    * reference produces too — so double-typed coordinates are the
    * faithful choice; pass decimals only when comparing against a
    * fixed-point oracle. */
  def wktPoint(lon: Column, lat: Column): Column =
    when(
      lon.isNotNull && lat.isNotNull && lon =!= 0 && lat =!= 0,
      concat(lit("SRID=4326;POINT ("), lon.cast("string"), lit(" "),
        lat.cast("string"), lit(")")))

  /** X10 — conditional source column: closed cases take the close reason,
    * open ones the latest status update (common.py:204-207). */
  def statusNotes(status: Column, closeReason: Column, statusUpdate: Column): Column =
    when(status === "Closed", closeReason).otherwise(statusUpdate)

  /** Composite cleaning used for free-text fields: edge-strip, NFKD→ASCII,
    * truncate — the common.py:133-137 sequence for `description`. */
  def cleanText(c: Column, n: Int): Column =
    truncated(nfkdAscii(stripEdges(c)), n)
}
