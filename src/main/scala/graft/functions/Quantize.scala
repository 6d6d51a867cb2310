package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Imperative int8-quantization kernels, bit-identical to the
  * higher-order-function trees in [[graft.operators.Similarity]]
  * (`int8ScaleFold` / `int8CodesFold` / `int8DequantizeFold`, the
  * parity references pinned in SimilaritySpec). Native because the HOF
  * forms (ArrayTransform/ArrayMax) are CodegenFallback — an interpreter
  * in a pass that touches EVERY embedding of the corpus at quantization
  * time. The scale convention at this layer: 0.0 means "undefined"
  * (the zero/empty vector) — the Column wrappers coalesce the nullable
  * scale to 0.0 so the expressions stay null-intolerant; a real scale
  * is 127/max|x| > 0 by construction, so the sentinel is unambiguous.
  */
object Int8QuantizeUtil {

  /** 127 / max|x| over non-null elements; null when the max is not a
    * positive number (empty, all-null, all-zero, or NaN-poisoned) —
    * mirroring `when(array_max(transform(v, abs)) > 0, 127/maxAbs)`. */
  def scaleOf(vec: ArrayData): java.lang.Double = {
    val n = vec.numElements()
    var max = 0.0
    var seen = false
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val v = math.abs(vec.getDouble(i))
        // Double.compare is Spark's max ordering (NaN greatest) —
        // array_max would surface a NaN max, and NaN > 0 is false
        if (!seen || java.lang.Double.compare(v, max) > 0) max = v
        seen = true
      }
      i += 1
    }
    if (seen && max > 0.0) 127.0 / max else null
  }

  /** floor(x·s + 0.5) per element as doubles; scale == 0.0 (undefined)
    * maps every element to 0.0; a null element stays null. The
    * floor→long→double round-trip replicates Spark's floor(double)
    * semantics exactly (including its NaN → 0 coercion). */
  def codes(vec: ArrayData, scale: Double): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        out(i) =
          if (scale == 0.0) 0.0
          else math.floor(vec.getDouble(i) * scale + 0.5).toLong.toDouble
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** q / s per element; scale == 0.0 (undefined) reconstructs zeros. */
  def dequantize(codes: ArrayData, scale: Double): ArrayData = {
    val n = codes.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!codes.isNullAt(i))
        out(i) = if (scale == 0.0) 0.0 else codes.getDouble(i) / scale
      i += 1
    }
    new GenericArrayData(out)
  }
}

private[functions] trait VecDoubleCheck { self: Expression =>
  /** Binary kernels: the scale child must be DOUBLE too — eval casts it
    * with asInstanceOf and codegen splices it into a double call site,
    * so a non-double scale would pass analysis and fail (or silently
    * diverge between eval and codegen) at runtime. */
  protected def checkVecAndScale(vecDt: DataType, scaleDt: DataType,
      name: String): TypeCheckResult = {
    val v = checkVec(vecDt, name)
    if (v != TypeCheckResult.TypeCheckSuccess) v
    else if (scaleDt != DoubleType) TypeCheckResult.TypeCheckFailure(
      s"$name scale must be DOUBLE, got ${scaleDt.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  protected def checkVec(dt: DataType, name: String): TypeCheckResult =
    dt match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name needs array<double>, got ${other.catalogString}")
    }
}

/** int8_scale(array<double>) → double (null = undefined). */
case class Int8Scale(child: Expression)
    extends UnaryExpression with VecDoubleCheck {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // zero vector → null scale
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child.dataType, prettyName)
  override def nullSafeEval(v: Any): Any =
    Int8QuantizeUtil.scaleOf(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Double ${ev.value}_r = graft.functions.Int8QuantizeUtil.scaleOf($c);
      if (${ev.value}_r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = ${ev.value}_r.doubleValue();
      }""")
  override protected def withNewChildInternal(newChild: Expression): Int8Scale =
    copy(child = newChild)
  override def prettyName: String = "int8_scale"
}

/** int8_codes(array<double>, scale) → array<double>. */
case class Int8Codes(left: Expression, right: Expression)
    extends BinaryExpression with VecDoubleCheck {
  override def dataType: DataType = left.dataType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    checkVecAndScale(left.dataType, right.dataType, prettyName)
  override def nullSafeEval(v: Any, s: Any): Any =
    Int8QuantizeUtil.codes(v.asInstanceOf[ArrayData], s.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, s) => s"graft.functions.Int8QuantizeUtil.codes($v, $s)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Int8Codes = copy(left = newLeft, right = newRight)
  override def prettyName: String = "int8_codes"
}

/** int8_dequantize(array<double>, scale) → array<double>. */
case class Int8Dequantize(left: Expression, right: Expression)
    extends BinaryExpression with VecDoubleCheck {
  override def dataType: DataType = left.dataType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    checkVecAndScale(left.dataType, right.dataType, prettyName)
  override def nullSafeEval(v: Any, s: Any): Any =
    Int8QuantizeUtil.dequantize(v.asInstanceOf[ArrayData], s.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, s) => s"graft.functions.Int8QuantizeUtil.dequantize($v, $s)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Int8Dequantize =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "int8_dequantize"
}

object Quantize {
  def int8Scale(vec: Column): Column =
    ColumnBridge.column(Int8Scale(ColumnBridge.expression(vec)))
  def int8Codes(vec: Column, scale: Column): Column =
    ColumnBridge.column(Int8Codes(
      ColumnBridge.expression(vec), ColumnBridge.expression(scale)))
  def int8Dequantize(codes: Column, scale: Column): Column =
    ColumnBridge.column(Int8Dequantize(
      ColumnBridge.expression(codes), ColumnBridge.expression(scale)))
}
