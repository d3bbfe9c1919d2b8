package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native DSIR gram-bucket ids: for a token array, the md5 bucket of
  * every length-filtered unigram followed by every adjacent bigram —
  * replacing the `transform(concat(ts, bi), g ->
  * conv(substring(md5(g),1,4),16,10) % B)` lambda chain, whose cost is
  * dominated by per-gram hex-string materialization plus `conv`'s
  * string parse (the chain was the q_dsir memo's dominant cost: two
  * md5-hex round-trips per token).
  *
  * Exact parity with that chain (and therefore with the DuckDB oracle,
  * which mirrors the VALUES):
  *   - `conv(substring(md5(g),1,4),16,10)` is the first two digest
  *     bytes read as an unsigned big-endian 16-bit integer — computed
  *     here directly from the raw digest (`((d0&0xff)<<8 | d1&0xff) %
  *     buckets`), no hex string, no parse;
  *   - unigrams come first, bigrams (token + ' ' + next) second, both
  *     over the SAME length>0-filtered list — the chain's
  *     `concat(ts, bi)` order;
  *   - null or empty elements are dropped (the chain's
  *     `filter(length(t) > 0)` drops null predicates with them);
  *   - a NULL token array yields NULL (the chain's transform-of-null),
  *     and a no-surviving-tokens array yields an EMPTY array — both
  *     vanish identically under the explode every consumer applies.
  */
case class GramBucketIds(child: Expression, buckets: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(buckets >= 1, "buckets must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  def evalTokens(input: ArrayData): ArrayData = {
    val n = input.numElements()
    // collect the surviving tokens once (the chain's filtered ts)
    val kept = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i)) {
        val t = input.getUTF8String(i)
        if (t.numChars() > 0) kept.add(t)
      }
      i += 1
    }
    val k = kept.size()
    val nBi = if (k >= 2) k - 1 else 0
    val out = new Array[Any](k + nBi)
    val md = GramBucketIds.digestTL.get()
    def bucketOf(bytes: Array[Byte]): Long = {
      md.reset()
      val d = md.digest(bytes)
      (((d(0) & 0xff) << 8) | (d(1) & 0xff)).toLong % buckets
    }
    i = 0
    while (i < k) {
      out(i) = bucketOf(kept.get(i).getBytes)
      i += 1
    }
    i = 0
    while (i < nBi) {
      val a = kept.get(i).getBytes
      val b = kept.get(i + 1).getBytes
      val g = new Array[Byte](a.length + 1 + b.length)
      System.arraycopy(a, 0, g, 0, a.length)
      g(a.length) = ' '
      System.arraycopy(b, 0, g, a.length + 1, b.length)
      out(k + i) = bucketOf(g)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    evalTokens(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramBucketIds", this,
      classOf[GramBucketIds].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.evalTokens($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GramBucketIds =
    copy(child = newChild)
}

object GramBucketIds {
  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Column-level entry point over a token-array column. */
  def apply(tokens: Column, buckets: Int): Column =
    GraftSqlShim.column(
      GramBucketIds(GraftSqlShim.expression(tokens), buckets))
}
