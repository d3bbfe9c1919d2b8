package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word n-gram builder: token array → one space-joined string
  * per `n`-token window (positions kept), in one pass — the shared
  * gram generator behind the n-gram statistics and repetition
  * operators, replacing the interpreted
  * `transform(sequence(...), i -> concat_ws(" ", slice(t, i, n)))`
  * chain (evaluated per gram through the lambda interpreter, re-slicing
  * the token array each time).
  *
  * Byte-parity with `concat_ws`: NULL elements are skipped without a
  * separator; EMPTY strings are joined WITH one (so multi-space text
  * produces identical gram strings either way — the same contract the
  * winnowing and window-hash kernels pin). Docs shorter than `n`
  * produce an empty array (no fabricated short grams).
  */
case class WordNgrams(child: Expression, n: Int)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.WordNgrams.compute($v, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Static kernel shared by eval and generated code. */
  def compute(tokens: ArrayData, n: Int): ArrayData = {
    val total = tokens.numElements()
    if (total < n) return Empty
    val g = total - n + 1
    val toks = new Array[UTF8String](total)
    var i = 0
    while (i < total) {
      toks(i) = if (tokens.isNullAt(i)) null else tokens.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](g)
    val sb = new java.lang.StringBuilder()
    i = 0
    while (i < g) {
      sb.setLength(0)
      var first = true
      var j = i
      while (j < i + n) {
        val t = toks(j)
        if (t != null) {
          if (!first) sb.append(' ')
          first = false
          sb.append(t.toString)
        }
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point. */
  def apply(tokens: Column, n: Int): Column =
    GraftSqlShim.column(WordNgrams(GraftSqlShim.expression(tokens), n))
}
