package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** Native sliding-window hasher for the duplicated-span screen: token
  * array → one xxhash64 per `len`-token window (positions kept), in
  * one pass — replacing the interpreted
  * `transform(sequence(...), i -> xxhash64(concat_ws(" ", slice(t, i, len))))`
  * chain, which re-evaluates slice + concat + hash through the lambda
  * interpreter per window.
  *
  * Hash parity with Spark's `xxhash64` builtin (seed 42 over the
  * window text's UTF-8 bytes) is spec-pinned, so mixing this kernel
  * with the chain form in one pipeline cannot split hash identities.
  * Window bytes are assembled once per window in a reused buffer —
  * no intermediate UTF8String or String allocations.
  */
case class WindowHashes(child: Expression, len: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WindowHashes.compute(input.asInstanceOf[ArrayData], len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.WindowHashes.compute($v, $len);")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {
  private val Empty = new GenericArrayData(Array.empty[Any])
  private val Seed = 42L // Spark's xxhash64 default seed

  /** Static kernel shared by eval and generated code. */
  def compute(tokens: ArrayData, len: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < len) return Empty
    val g = n - len + 1
    // UTF-8 byte arrays once per token (concat_ws skips nulls)
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i).getBytes
      i += 1
    }
    var buf = new Array[Byte](64)
    val out = new Array[Any](g)
    i = 0
    while (i < g) {
      var pos = 0
      var j = i
      var first = true
      while (j < i + len) {
        val t = toks(j)
        if (t != null) {
          val need = pos + t.length + 1
          if (need > buf.length)
            buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
          // separator after any non-null element (empty strings join
          // WITH a separator under concat_ws) — pos>0 would drop it
          // when the leading token is empty
          if (!first) { buf(pos) = ' '.toByte; pos += 1 }
          first = false
          System.arraycopy(t, 0, buf, pos, t.length)
          pos += t.length
        }
        j += 1
      }
      out(i) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, Seed)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point. */
  def apply(tokens: Column, len: Int): Column =
    GraftSqlShim.column(WindowHashes(GraftSqlShim.expression(tokens), len))
}
