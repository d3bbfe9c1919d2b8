package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass MinHash signature: for each k in 1..numHashes, the
  * lexicographic minimum of `md5("$k:$token")` hex over the token set —
  * replacing the `transform(sequence(...), k -> array_min(transform(
  * tokens, t -> md5(...))))` lambda chain, which SQL evaluates
  * interpreted per element (numHashes × tokens interpreted calls and
  * md5 Column evaluations per row; the chain was the minhash band
  * builder's dominant cost).
  *
  * Exact parity with that chain ([[graft.ops.Dedup.minhashSignature]])
  * and the oracle SQL:
  *   - md5 hex is identical everywhere, and ASCII lowercase-hex
  *     lexicographic order equals UTF8String binary order, so each
  *     minimum matches bit-for-bit;
  *   - a NULL tokens array yields an array of numHashes NULLs (the
  *     chain's outer transform runs over `sequence`, never null — each
  *     inner `array_min(null)` is null);
  *   - an empty array or all-null elements yield null minima
  *     (array_min skips nulls);
  *   - null ELEMENTS are skipped (the chain's md5(concat(..null)) is
  *     null, which array_min ignores).
  *
  * `vocab` (optional): tokens whose hashes are precomputed ONCE at plan
  * time — the same small-domain dictionary strategy as
  * [[graft.ops.Dedup.minhashSignatureDict]]. Unlike the dict chain's
  * `element_at` (null on a missing key), a token missing from the
  * dictionary is hashed on the fly, so a vocabulary probe that raced a
  * source mutation degrades to correctness, not to a dropped token.
  */
// vocab is a Seq (not Array) so case-class equality is VALUE equality —
// Catalyst semanticEquals / common-subexpression elimination then
// recognize two identical signatures as one computation
case class MinHashHex(child: Expression, numHashes: Int,
                      vocab: Seq[String] = Nil)
  extends UnaryExpression with ExpectsInputTypes {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  // null input maps to an array of null minima, never a null array
  override def nullable: Boolean = false

  // token -> its numHashes hex digests, built once per task from the
  // plan-shipped vocab (empty vocab = pure on-the-fly hashing)
  @transient private lazy val dict: java.util.HashMap[UTF8String, Array[UTF8String]] = {
    val m = new java.util.HashMap[UTF8String, Array[UTF8String]](vocab.length * 2)
    vocab.foreach { t =>
      m.put(UTF8String.fromString(t), MinHashHex.hashesOf(t, numHashes))
    }
    m
  }

  def nullResult(): ArrayData =
    new GenericArrayData(new Array[Any](numHashes))

  def evalTokens(input: ArrayData): ArrayData = {
    val mins = new Array[Any](numHashes)
    val n = input.numElements()
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i)) {
        val tok = input.getUTF8String(i)
        var hx = dict.get(tok)
        if (hx == null) hx = MinHashHex.hashesOf(tok.toString, numHashes)
        var k = 0
        while (k < numHashes) {
          val h = hx(k)
          val cur = mins(k).asInstanceOf[UTF8String]
          if (cur == null || h.compareTo(cur) < 0) mins(k) = h
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) nullResult() else evalTokens(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("minHashHex", this, classOf[MinHashHex].getName)
    ev.copy(
      code = code"""
        ${childGen.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          ${childGen.isNull} ? $ref.nullResult() : $ref.evalTokens(${childGen.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashHex =
    copy(child = newChild)
}

object MinHashHex {
  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val HexChars = "0123456789abcdef".toCharArray

  /** The numHashes md5-hex digests of one token: md5("1:t") .. md5("k:t"). */
  def hashesOf(token: String, numHashes: Int): Array[UTF8String] = {
    val md = digestTL.get()
    val out = new Array[UTF8String](numHashes)
    var k = 0
    while (k < numHashes) {
      md.reset()
      val digest = md.digest(s"${k + 1}:$token".getBytes("UTF-8"))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HexChars((digest(b) >> 4) & 0xf)
        hex(2 * b + 1) = HexChars(digest(b) & 0xf)
        b += 1
      }
      out(k) = UTF8String.fromString(new String(hex))
      k += 1
    }
    out
  }

  /** Column-level entry point. */
  def apply(tokens: Column, numHashes: Int, vocab: Array[String]): Column =
    GraftSqlShim.column(
      MinHashHex(GraftSqlShim.expression(tokens), numHashes, vocab.toSeq))
}
