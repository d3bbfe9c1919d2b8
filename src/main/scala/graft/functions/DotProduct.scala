package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two double arrays: a single
  * generated `for` loop instead of the dim-term unrolled `a[1]*b[1] +
  * ...` expression chain the ops previously built.
  *
  * Why a custom Expression (revising SURVEY.md §7.3's "none needed"):
  * SQL higher-order functions (`zip_with`+`aggregate`) are interpreted
  * per element, and the unrolled-chain workaround generates O(dim)
  * Java source per call site — janino compilation costs seconds per
  * plan and a composite expression can cross the JVM's 64 KB method
  * limit, silently de-codegening the stage. The loop form generates a
  * few lines regardless of dim, stays inside whole-stage codegen, and
  * accumulates left-to-right exactly like the chain (and like the
  * oracle's `list_reduce`), so values are bit-identical.
  *
  * Null semantics match the baselines: a null INPUT array yields null
  * (BinaryExpression's null-safe wrapper); a null ELEMENT in either
  * array yields null (the chain's `element_at` null would poison the
  * sum); a LENGTH MISMATCH also yields null — `zip_with` pads the
  * shorter side with nulls, which nullifies its fold, and a
  * shorter-prefix sum would instead fabricate a plausible-looking
  * value from malformed vectors.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {

  // ImplicitCastInputTypes (not bare ExpectsInputTypes): array<float>
  // or array<int> inputs coerce to array<double> at analysis, matching
  // the per-element implicit casts of the old element_at chain form.
  // Seq[DataType] satisfies ExpectsInputTypes' Seq[AbstractDataType]
  // covariantly (AbstractDataType itself is private[sql])
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // null elements nullify the sum

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $a.numElements();
         |double $s = 0.0;
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Column-level entry point. */
  def apply(a: Column, b: Column): Column =
    GraftSqlShim.column(
      DotProduct(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
}
