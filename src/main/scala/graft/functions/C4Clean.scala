package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** C4-style line-level cleaning (Raffel et al. 2020, public
  * arXiv:1910.10683 §2.2): keep only lines that end in a terminal
  * punctuation mark, carry at least five words, and do not mention
  * "javascript"; the kept lines re-join with their original newlines.
  * The page-level drops (lorem ipsum, curly brace, fewer than three
  * sentences surviving) stay OUTSIDE this expression as plain Column
  * predicates — they need the original text and the cleaned text side
  * by side.
  *
  * Native because the natural tree form — `filter(split(text, '\n'),
  * l -> ...)` — is an interpreted per-row lambda (ArrayFilter is
  * CodegenFallback) with an rlike per line, and line cleaning runs over
  * EVERY crawled page before any dedup can shrink the corpus. One
  * imperative scan per row keeps it inside whole-stage codegen with
  * zero shuffle; parity with the tree form is pinned in
  * QualityRulesSpec, and the t10 oracle crosses the same strings
  * against DuckDB's `list_filter`.
  */
object C4Util {
  private val Javascript = "javascript"

  private def isTerminal(c: Char): Boolean =
    c == '.' || c == '!' || c == '?' || c == '"'

  private def wordCount(line: String): Int = {
    var n = 0
    var inWord = false
    var i = 0
    while (i < line.length) {
      val ws = Character.isWhitespace(line.charAt(i))
      if (!ws && !inWord) { n += 1; inWord = true }
      else if (ws) inWord = false
      i += 1
    }
    n
  }

  private def containsJavascript(line: String): Boolean =
    line.toLowerCase(java.util.Locale.ROOT).contains(Javascript)

  def keepLine(line: String, minWords: Int): Boolean =
    line.nonEmpty && isTerminal(line.charAt(line.length - 1)) &&
      wordCount(line) >= minWords && !containsJavascript(line)

  def clean(text: UTF8String, minWords: Int): UTF8String = {
    val s = text.toString
    // -1: trailing empty lines survive the split, mirroring DuckDB's
    // string_split — they fail keepLine anyway, but the LINE COUNT the
    // fractions divide by must agree between engines.
    val lines = s.split("\n", -1)
    val kept = new StringBuilder
    var first = true
    var i = 0
    while (i < lines.length) {
      if (keepLine(lines(i), minWords)) {
        if (!first) kept.append('\n')
        kept.append(lines(i))
        first = false
      }
      i += 1
    }
    UTF8String.fromString(kept.toString)
  }
}

/** c4_line_clean(string) → string, with codegen. */
case class C4LineClean(child: Expression, minWords: Int)
    extends UnaryExpression {
  require(minWords > 0)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"c4_line_clean needs string, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    C4Util.clean(v.asInstanceOf[UTF8String], minWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.C4Util.clean($c, $minWords)")
  override protected def withNewChildInternal(newChild: Expression): C4LineClean =
    copy(child = newChild)
  override def prettyName: String = "c4_line_clean"
}

object C4Clean {
  /** Native codegen'd form — the production path. */
  def c4LineClean(text: Column, minWords: Int = 5): Column =
    ColumnBridge.column(C4LineClean(ColumnBridge.expression(text), minWords))

  /** The expression-tree formulation — parity reference for the spec
    * (interpreted: ArrayFilter + a per-line rlike). */
  def c4LineCleanFold(text: Column, minWords: Int = 5): Column =
    array_join(
      filter(split(text, "\n", -1), l =>
        l.rlike("[.!?\"]$") &&
          size(filter(split(trim(l), "\\s+"), w => w =!= "")) >= minWords &&
          !lower(l).contains("javascript")),
      "\n")
}
