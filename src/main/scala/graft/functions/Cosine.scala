package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Imperative cosine-similarity core, bit-identical to the
  * aggregate∘zip_with formulation in [[graft.operators.Similarity]]:
  * each of the three accumulators (a·b, a·a, b·b) is its own strict
  * left-to-right double sum — the same addition order as three separate
  * folds — and the final `dot / (sqrt·sqrt)` is the same expression, so
  * results (including the DuckDB-oracle-matched ones) do not move by a
  * single ulp. Mirrors zip_with's null semantics: unequal lengths or a
  * null element yield null. A zero-norm (or empty) vector also yields
  * null — the fold form's divisor is 0.0 there, which Spark's Divide
  * maps to null (non-ANSI) or a DIVIDE_BY_ZERO error (ANSI); null is
  * the one behavior that is safe and consistent under both modes, and
  * "no similarity defined" is the honest answer for a zero vector.
  *
  * Built as a native expression because Spark's higher-order functions
  * (ArrayAggregate/ZipWith) are CodegenFallback — interpreted per row,
  * with per-element closure dispatch — which puts an interpreter in the
  * innermost loop of every ANN operator. This loop stays inside
  * whole-stage codegen. Same preference order as MinHashSignature.
  */
object CosineUtil {
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dab = 0.0
    var daa = 0.0
    var dbb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dab += x * y
      daa += x * x
      dbb += y * y
      i += 1
    }
    val denom = math.sqrt(daa) * math.sqrt(dbb)
    if (denom == 0.0) null else dab / denom
  }
}

/** cosine_sim(array<double>, array<double>) → double, with codegen. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  // null for non-null inputs is possible (length mismatch, null element)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim needs two array<double>, got $other")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    CosineUtil.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.functions.CosineUtil.cosine($a, $b);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }""")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

object Cosine {
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** array<float> → array<double> widening — the native form of
  * `transform(c, _.cast("double"))`, whose ArrayTransform is
  * CodegenFallback and runs once per scanned embedding row. Bit-exact:
  * float→double widening is value-preserving in both forms. */
object FloatsToDoublesUtil {
  def widen(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) out(i) = a.getFloat(i).toDouble
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** to_double_array(array<float>|array<double>) → array<double>. */
case class FloatsToDoubles(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private def inputElem: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, n) => ArrayType(DoubleType, n)
    case other => other
  }
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) |
         ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"to_double_array needs array<float|double>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any = inputElem match {
    case DoubleType => v
    case _ => FloatsToDoublesUtil.widen(v.asInstanceOf[ArrayData])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    inputElem match {
      case DoubleType => defineCodeGen(ctx, ev, c => c)
      case _ => defineCodeGen(ctx, ev,
        c => s"graft.functions.FloatsToDoublesUtil.widen($c)")
    }
  override protected def withNewChildInternal(newChild: Expression): FloatsToDoubles =
    copy(child = newChild)
  override def prettyName: String = "to_double_array"
}

object VectorCast {
  def toDoubleArray(c: Column): Column =
    ColumnBridge.column(FloatsToDoubles(ColumnBridge.expression(c)))
}
