package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Imperative n-gram shingle windows over a token array — the native
  * form of `transform(sequence(0, size-n), i -> concat_ws(" ",
  * slice(toks, i+1, n)))`, which is interpreted per row (higher-order
  * functions are CodegenFallback) and sits upstream of every MinHash
  * signature. Semantics are identical: documents shorter than `n`
  * tokens collapse to one whole-text shingle, and null tokens are
  * skipped the way concat_ws skips them. DedupSpec pins parity with the
  * expression-tree form; the d4 oracle crosses the same strings against
  * DuckDB.
  */
object ShingleUtil {
  private val Space = UTF8String.fromString(" ")

  private def joinRange(toks: ArrayData, from: Int, until: Int): UTF8String = {
    var parts = List.empty[UTF8String]
    var i = until - 1
    while (i >= from) {
      if (!toks.isNullAt(i)) parts = toks.getUTF8String(i) :: parts
      i -= 1
    }
    UTF8String.concatWs(Space, parts: _*)
  }

  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    if (cnt < n) {
      new GenericArrayData(Array[Any](joinRange(toks, 0, cnt)))
    } else {
      val out = new Array[Any](cnt - n + 1)
      var i = 0
      while (i <= cnt - n) {
        out(i) = joinRange(toks, i, i + n)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** ngram_shingles(array<string>, n) → array<string>, with codegen. */
case class NgramShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_shingles needs array<string>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    ShingleUtil.shingles(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ShingleUtil.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): NgramShingles =
    copy(child = newChild)
  override def prettyName: String = "ngram_shingles"
}

object Shingles {
  def ngramShingles(toks: Column, n: Int): Column =
    ColumnBridge.column(NgramShingles(ColumnBridge.expression(toks), n))
}

/** Token-membership occurrence counter — the native form of
  * `size(filter(toks, t -> array_contains(set, t)))`, whose ArrayFilter
  * is CodegenFallback. langId evaluates one of these per language per
  * row; this keeps the 4-way scoring inside whole-stage codegen with a
  * hash-set probe per token. */
object TokenSetUtil {
  def countHits(toks: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = toks.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i) && set.contains(toks.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }
}

/** token_set_hits(array<string>) → int, with codegen. */
case class TokenSetHits(child: Expression, words: Seq[String])
    extends UnaryExpression {
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_set_hits needs array<string>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    TokenSetUtil.countHits(v.asInstanceOf[ArrayData], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tokenSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenSetUtil.countHits($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): TokenSetHits =
    copy(child = newChild)
  override def prettyName: String = "token_set_hits"
}

object TokenSet {
  def tokenSetHits(toks: Column, words: Seq[String]): Column =
    ColumnBridge.column(TokenSetHits(ColumnBridge.expression(toks), words))
}
