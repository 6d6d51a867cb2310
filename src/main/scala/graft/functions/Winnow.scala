package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed window fingerprints — the native form of the
  * transform/slice/array_min tree in `Dedup.winnowedKeysFold` (HOFs are
  * CodegenFallback: interpreted per row, and this hashes every token
  * window — the per-token hot path of repeated-substring dedup at crawl
  * scale, the same reason MinHashSignature went native). Semantics are
  * identical to the expression-tree twin, pinned in DedupSpec:
  *
  *  - every `window`-token window is hashed as lowercase md5 hex of the
  *    space-joined tokens (byte-identical to
  *    `md5(cast(concat_ws(' ', slice(t, p, window)) as binary))` —
  *    UTF-8 bytes, null tokens skipped the way concat_ws skips them);
  *  - each hash is packed as 'md5hex:<10-digit pos>' so one
  *    lexicographic min picks (min fp, then min pos) — keys are pure
  *    ASCII, where Java string order and UTF8String byte order agree;
  *  - the min of each run of `guarantee` consecutive keys is kept
  *    (window starts 1..max(1, n_hashes-guarantee+1)), deduplicated.
  *
  * Sliding minima use a monotonic deque — O(n) total instead of the
  * tree's O(n·guarantee) — and duplicates of a minimum are always a
  * consecutive run (an element's reign over the sliding window is
  * contiguous, and keys are position-unique), so last-emitted dedupe
  * equals global distinct. Fewer than `window` tokens → empty array.
  */
object WinnowUtil {

  private val HexDigits = "0123456789abcdef".toCharArray

  def winnowedKeys(toks: ArrayData, window: Int, guarantee: Int): ArrayData = {
    val n = toks.numElements()
    val nh = n - window + 1
    if (nh <= 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    // window keys, 0-based index i = position (i+1)
    val keys = new Array[String](nh)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < nh) {
      sb.setLength(0)
      var j = i
      var first = true
      while (j < i + window) {
        if (!toks.isNullAt(j)) {
          if (!first) sb.append(' ')
          sb.append(toks.getUTF8String(j).toString)
          first = false
        }
        j += 1
      }
      val digest = md.digest(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      val key = new java.lang.StringBuilder(43)
      var d = 0
      while (d < 16) {
        key.append(HexDigits((digest(d) >> 4) & 0xf))
        key.append(HexDigits(digest(d) & 0xf))
        d += 1
      }
      key.append(':')
      val pos = java.lang.Integer.toString(i + 1)
      var pad = 10 - pos.length
      while (pad > 0) { key.append('0'); pad -= 1 }
      key.append(pos)
      keys(i) = key.toString
      i += 1
    }
    // sliding min over windows of `guarantee` keys via monotonic deque;
    // a single truncated window when nh < guarantee
    val out = new java.util.ArrayList[Any]()
    if (nh <= guarantee) {
      var best = keys(0)
      var k = 1
      while (k < nh) { if (keys(k).compareTo(best) < 0) best = keys(k); k += 1 }
      out.add(UTF8String.fromString(best))
    } else {
      val deque = new java.util.ArrayDeque[Int]()
      var last: String = null
      var k = 0
      while (k < nh) {
        while (!deque.isEmpty && keys(deque.peekLast()).compareTo(keys(k)) >= 0)
          deque.pollLast()
        deque.addLast(k)
        val q = k - guarantee + 1 // window [q, k] complete once q >= 0
        if (q >= 0) {
          if (deque.peekFirst() < q) deque.pollFirst()
          val m = keys(deque.peekFirst())
          if (last == null || m != last) {
            out.add(UTF8String.fromString(m))
            last = m
          }
        }
        k += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** winnowed_keys(array<string>, window, guarantee) → array<string>. */
case class WinnowedKeys(child: Expression, window: Int, guarantee: Int)
    extends UnaryExpression {
  require(window > 0 && guarantee > 0,
    s"window=$window guarantee=$guarantee")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnowed_keys needs array<string>, got ${other.catalogString}")
  }
  override def nullSafeEval(v: Any): Any =
    WinnowUtil.winnowedKeys(v.asInstanceOf[ArrayData], window, guarantee)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowUtil.winnowedKeys($c, $window, $guarantee)")
  override protected def withNewChildInternal(newChild: Expression): WinnowedKeys =
    copy(child = newChild)
  override def prettyName: String = "winnowed_keys"
}

object Winnow {
  def winnowedKeys(toks: Column, window: Int, guarantee: Int): Column =
    ColumnBridge.column(
      WinnowedKeys(ColumnBridge.expression(toks), window, guarantee))
}
