package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Hilbert-curve index (11th native kernel): map a point on a
  * 2^bits × 2^bits grid to its distance along the order-`bits`
  * Hilbert curve — the space-filling-curve alternative to the Morton
  * key in [[graft.ops.Layout]]. Hilbert keeps ADJACENT curve
  * positions ADJACENT in space at every scale (Morton has long
  * diagonal jumps at power-of-two boundaries), which makes file
  * envelopes tighter for the same file count — the standard layout
  * upgrade (Hilbert 1891; the xy2d bit algorithm is the classic
  * public-domain formulation).
  *
  * The per-level rotation state (x, y mutate each round) makes the
  * key SEQUENTIAL in the bit levels — composed as Column expressions
  * the tree would grow ~5^bits leaf references (each level reads the
  * previous x and y five times), which is exactly the case for a
  * native kernel: the generated code is one O(bits) loop, the
  * expression stays a pure projection inside whole-stage codegen,
  * and the DuckDB oracle reproduces the identical loop as `bits`
  * unrolled CTE rounds. The quadrant index uses the branch-free
  * arithmetic identity `(3·rx) xor ry = 3·rx + ry − 2·rx·ry` (rx, ry
  * ∈ {0,1}) so neither engine needs a bitwise xor.
  *
  * Inputs are grid coordinates (already min-max scaled, as
  * [[graft.ops.Layout.hilbertReport]] does); bits above `bits` are
  * masked off defensively.
  */
case class HilbertKey(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression with ExpectsInputTypes {

  require(bits >= 1 && bits <= 31, s"bits=$bits out of range")

  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertKey.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HilbertKey.compute($a, $b, $bits);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertKey =
    copy(left = newLeft, right = newRight)
}

object HilbertKey {

  /** Static kernel shared by eval and generated code: the canonical
    * xy2d loop (top bit level down; rotation reflects against the
    * FULL grid `n−1`, the orientation my spec pins as a bijection
    * with unit-step adjacency).
    */
  def compute(xIn: Long, yIn: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = xIn & (n - 1)
    var y = yIn & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * (3L * rx + ry - 2L * rx * ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column-level entry point over grid coordinates. */
  def apply(a: Column, b: Column, bits: Int = 8): Column =
    GraftSqlShim.column(HilbertKey(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b), bits))
}
