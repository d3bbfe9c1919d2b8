package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native 32-bit SimHash over a (distinct) token array: one pass per
  * document — md5 each token, accumulate +/-1 per bit from the hash's
  * leading 32 bits, keep the sign — replacing the explode(token x 32
  * bits) + two hash-aggregate pipeline (4.8M intermediate rows and two
  * shuffles at sf0.1 for 5000 docs). The fingerprint becomes a pure
  * projection: zero exchanges.
  *
  * Value parity with the SQL form (and the DuckDB oracle, which still
  * computes the explode/aggregate formulation): bit b's weight there
  * is derived from hex digit b/4, bit (3 - b%4) — exactly bit b of the
  * digest's first 4 bytes MSB-first, which this loop reads directly;
  * the +/-1 sums are exact integers, so association order is
  * irrelevant. java.security MD5 produces the same digest as Spark's
  * and DuckDB's md5.
  */
case class SimHash32(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SimHash32.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static kernel shared by eval and generated code. Null tokens are
    * skipped (the SQL form's explode would drop them too).
    */
  def compute(tokens: ArrayData): Long = {
    val sums = new Array[Int](32)
    val md = digestTL.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        val digest = md.digest(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < 32) {
          val bit = (digest(b >> 3) >> (7 - (b & 7))) & 1
          sums(b) += (if (bit == 1) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (sums(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Column-level entry point. */
  def apply(tokens: Column): Column =
    GraftSqlShim.column(SimHash32(GraftSqlShim.expression(tokens)))
}
