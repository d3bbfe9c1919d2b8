package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native token→pixel synthesis: one pass over the raw text producing
  * the `0xRRGGBB` int per non-empty space-separated token — replacing
  * the interpreted
  * `transform(filter(split(text,' '), t -> length(t)>0),
  *            t -> cast(cast(conv(substring(md5(t),1,6),16,10) as bigint) as int))`
  * chain the image queries fed [[graft.ops.Multimodal.synthBmpStats]]
  * with (per token: a token-array element alloc, an md5 HEX STRING
  * alloc, a substring alloc, and conv's string parse — the 1.7-2.2x
  * q_image_stats/q_image_dhash regression of round 12).
  *
  * Exact parity with that chain and the DuckDB oracle: tokens split on
  * single spaces (consecutive spaces produce empty tokens, removed by
  * the length filter exactly as `filter(..., length(t) > 0)` does),
  * md5 over each token's UTF-8 bytes, and the first 6 hex chars of the
  * digest ARE its first 3 bytes, so the pixel is
  * `(d0 << 16) | (d1 << 8) | d2` — always in [0, 2^24), no sign or
  * overflow cases. Null text yields null (the lambda chain's
  * null-propagation).
  */
case class TokenPixels(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TokenPixels.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TokenPixels.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): TokenPixels =
    copy(child = newChild)
}

object TokenPixels {
  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static kernel shared by eval and generated code. Walks the UTF-8
    * bytes directly: a space byte (0x20) never occurs inside a
    * multi-byte UTF-8 sequence, so byte-level splitting equals
    * character-level splitting on ' '.
    */
  def compute(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val md = digestTL.get()
    val out = new java.util.ArrayList[Integer](16)
    var start = 0
    var i = 0
    val n = bytes.length
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (i > start) { // non-empty token
          md.reset()
          md.update(bytes, start, i - start)
          val d = md.digest()
          out.add(((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff))
        }
        start = i + 1
      }
      i += 1
    }
    val arr = new Array[Any](out.size)
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j).intValue(); j += 1 }
    new GenericArrayData(arr)
  }

  /** Column-level entry point. */
  def apply(text: Column): Column =
    GraftSqlShim.column(TokenPixels(GraftSqlShim.expression(text)))
}
