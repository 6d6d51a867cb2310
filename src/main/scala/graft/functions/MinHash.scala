package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Imperative MinHash core. Signature slot j is the minimum seeded
  * xxhash64 (seed = j) over the shingle set.
  *
  * Built as a native expression because the equivalent higher-order
  * expression tree (transform(sequence(k), s -> array_min(transform(
  * shingles, sh -> xxhash64(s, sh))))) is interpreted per row and costs
  * minutes at sf0.1 where this loop costs seconds — measured 357s → <2s
  * for the d2 pipeline. Same preference order as SURVEY §7.3: compose
  * built-ins first, drop to a custom Expression when they can't express
  * the semantics *efficiently*.
  */
object MinHashUtil {
  def signature(shingles: ArrayData, k: Int): ArrayData = {
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val s = shingles.getUTF8String(i)
        var j = 0
        while (j < k) {
          val h = XxHash64Function.hash(s, StringType, j.toLong)
          if (h < out(j)) out(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** minhash_signature(array<string>, k) → array<long>, with codegen. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature needs array<string>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    MinHashUtil.signature(v.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashUtil.signature($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

object MinHash {
  def minhashSignature(shingles: Column, numHashes: Int = 64): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(shingles), numHashes))

  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(
      BandKeys(ColumnBridge.expression(sig), bands, rowsPerBand))
}

/** LSH band keys — the native form of `transform(sequence(0, bands-1),
  * b -> xxhash64(b, slice(sig, b*rpb+1, rpb)))`: one 64-bit key per
  * band, the band index folded into the hash. The transform/slice tree
  * is CodegenFallback (16 interpreted closures + slice allocations per
  * row); this loop reproduces the exact xxhash64 fold — seed 42, hash
  * the int band index, then each signature slot of the band in order —
  * so keys are bit-identical (pinned in DedupSpec).
  */
object BandKeysUtil {
  def bandKeys(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      // xxhash64(b, slice): args fold left on seed 42; arrays fold
      // element-wise
      var h = XxHash64Function.hash(b, org.apache.spark.sql.types.IntegerType, 42L)
      var j = b * rowsPerBand
      val end = math.min(j + rowsPerBand, sig.numElements())
      while (j < end) {
        // Spark's XxHash64 skips null array slots (hash unchanged) —
        // mirror that so nullable signature arrays stay bit-identical
        if (!sig.isNullAt(j))
          h = XxHash64Function.hash(sig.getLong(j), LongType, h)
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** band_keys(array<long>, bands, rowsPerBand) → array<long>, codegen'd. */
case class BandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(bands > 0 && rowsPerBand > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"band_keys needs array<long>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    BandKeysUtil.bandKeys(v.asInstanceOf[ArrayData], bands, rowsPerBand)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BandKeysUtil.bandKeys($c, $bands, $rowsPerBand)")
  override protected def withNewChildInternal(newChild: Expression): BandKeys =
    copy(child = newChild)
  override def prettyName: String = "band_keys"
}
