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
  /** Static kernel shared by eval and generated code. */
  def compute(text: UTF8String): GenericArrayData =
    TokenMd5Ints.compute(text, d =>
      ((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff))

  /** Column-level entry point. */
  def apply(text: Column): Column =
    GraftSqlShim.column(TokenPixels(GraftSqlShim.expression(text)))
}

/** [[TokenPixels]]'s audio sibling: one pass producing the signed
  * 16-bit PCM sample per non-empty token — replacing the interpreted
  * `transform(filter(split(text,' '), t -> length(t)>0),
  *            t -> cast(cast(conv(substring(md5(t),1,4),16,10) as bigint)
  *                      - 32768 as int))`
  * chain the audio queries fed [[graft.ops.Multimodal.synthWavStats]]
  * with. The first 4 hex chars of the digest ARE its first 2 bytes, so
  * the sample is `((d0 << 8) | d1) - 32768` — always in
  * [-32768, 32767], the full 16-bit range, no clamp cases.
  */
case class TokenSamples(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    TokenSamples.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.TokenSamples.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): TokenSamples =
    copy(child = newChild)
}

object TokenSamples {
  /** Static kernel shared by eval and generated code. */
  def compute(text: UTF8String): GenericArrayData =
    TokenMd5Ints.compute(text, d =>
      (((d(0) & 0xff) << 8) | (d(1) & 0xff)) - 32768)

  /** Column-level entry point. */
  def apply(text: Column): Column =
    GraftSqlShim.column(TokenSamples(GraftSqlShim.expression(text)))
}

/** Shared one-pass walk for the token→md5→int family: split the raw
  * UTF-8 bytes on 0x20 (a space byte never occurs inside a multi-byte
  * UTF-8 sequence, so byte splitting equals character splitting on
  * ' '), drop empty tokens (the `length(t) > 0` filter), md5 each
  * token's bytes, and map the digest through `pick`.
  */
private[functions] object TokenMd5Ints {
  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def compute(text: UTF8String, pick: Array[Byte] => Int): GenericArrayData = {
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
          out.add(pick(md.digest()))
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
}
