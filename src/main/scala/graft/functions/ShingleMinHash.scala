package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native rolling-shingle fingerprint: the lexicographic minimum md5
  * hex over a document's word-3-gram shingles (a 1-permutation
  * MinHash) in one pass — replacing the interpreted
  * `array_min(transform(sequence(...), i -> md5(concat_ws(...))))`
  * lambda chain (SQL higher-order functions run interpreted per
  * element).
  *
  * Exact parity with that chain and the oracle: shingle i joins
  * tokens [i, i+3) with single spaces (short docs produce one
  * shorter-than-3 shingle, mirroring `sequence(1, greatest(n-2, 1))`),
  * md5 hex is identical everywhere, and lowercase-hex lexicographic
  * order equals unsigned digest order, so the minimum matches.
  */
case class ShingleMinHash(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    ShingleMinHash.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ShingleMinHash.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

object ShingleMinHash {
  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val HexChars = "0123456789abcdef".toCharArray

  /** Static kernel shared by eval and generated code. */
  def compute(tokens: ArrayData): UTF8String = {
    val n = tokens.numElements()
    val shingles = math.max(n - 2, 1)
    val md = digestTL.get()
    var min: String = null
    var i = 0
    while (i < shingles) {
      val sb = new java.lang.StringBuilder()
      var j = i
      val end = math.min(i + 3, n)
      while (j < end) {
        // concat_ws skips null elements without emitting a separator
        if (!tokens.isNullAt(j)) {
          if (sb.length() > 0) sb.append(' ')
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
      val h = new String(hex)
      if (min == null || h.compareTo(min) < 0) min = h
      i += 1
    }
    UTF8String.fromString(min)
  }

  /** Column-level entry point. */
  def apply(tokens: Column): Column =
    GraftSqlShim.column(ShingleMinHash(GraftSqlShim.expression(tokens)))
}
