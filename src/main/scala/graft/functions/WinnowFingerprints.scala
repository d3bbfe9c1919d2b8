package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing kernel (Schleimer et al., SIGMOD 2003): token
  * array → md5-hex word `k`-grams → sliding-window (`w`) minima via a
  * monotonic deque → sorted distinct fingerprints, all in ONE pass.
  *
  * Replaces the interpreted
  * `array_sort(array_distinct(transform(seq, j -> array_min(slice(g, j, w)))))`
  * lambda chain: higher-order functions evaluate interpreted per
  * element, and the slice form re-compares O(G·w) strings where the
  * deque does O(G) amortized. Bit-parity with the chain (and the
  * oracle) is spec-pinned: md5 hex is identical everywhere, lowercase
  * hex lexicographic order equals unsigned digest order, and the
  * TreeSet's String ordering equals Spark's UTF8String binary order on
  * ASCII hex, so distinct + sort agree.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.WinnowFingerprints.compute($v, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {
  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val HexChars = "0123456789abcdef".toCharArray

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Static kernel shared by eval and generated code. */
  def compute(tokens: ArrayData, k: Int, w: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return Empty
    val g = n - k + 1
    if (g < w) return Empty
    val md = digestTL.get()
    val grams = new Array[String](g)
    var i = 0
    while (i < g) {
      val sb = new java.lang.StringBuilder()
      var j = i
      var first = true
      while (j < i + k) {
        // concat_ws skips NULL elements without a separator, but joins
        // EMPTY strings with one — a leading empty token must still
        // produce " b c", so "first non-null seen" drives the
        // separator, not sb.length()
        if (!tokens.isNullAt(j)) {
          if (!first) sb.append(' ')
          first = false
          sb.append(tokens.getUTF8String(j).toString)
        }
        j += 1
      }
      md.reset()
      val digest = md.digest(sb.toString.getBytes("UTF-8"))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HexChars((digest(b) >> 4) & 0xf)
        hex(2 * b + 1) = HexChars(digest(b) & 0xf)
        b += 1
      }
      grams(i) = new String(hex)
      i += 1
    }
    // sliding minimum: monotonic deque of candidate indices; TreeSet
    // gives distinct + sorted output in the same pass
    val out = new java.util.TreeSet[String]()
    val deque = new java.util.ArrayDeque[Integer]()
    i = 0
    while (i < g) {
      while (!deque.isEmpty && deque.peekFirst <= i - w) deque.pollFirst()
      while (!deque.isEmpty && grams(deque.peekLast).compareTo(grams(i)) >= 0)
        deque.pollLast()
      deque.addLast(i)
      if (i >= w - 1) out.add(grams(deque.peekFirst))
      i += 1
    }
    val arr = new Array[Any](out.size)
    var idx = 0
    val it = out.iterator()
    while (it.hasNext) { arr(idx) = UTF8String.fromString(it.next()); idx += 1 }
    new GenericArrayData(arr)
  }

  /** Column-level entry point. */
  def apply(tokens: Column, k: Int, w: Int): Column =
    GraftSqlShim.column(WinnowFingerprints(GraftSqlShim.expression(tokens), k, w))
}
