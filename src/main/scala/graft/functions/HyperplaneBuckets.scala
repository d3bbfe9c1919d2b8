package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native multi-table hyperplane-LSH bucketing: ONE expression emits
  * every table's bucket id for a vector — `array[t] = bucket of table
  * t` — replacing the tables·planes separate plane-bit columns the
  * band builder previously projected (each an unrolled ±element chain;
  * collectively a janino-compile tax on every band-building plan).
  *
  * The sparse ±1 coefficient matrix ([[graft.ops.Similarity.planeCoeffs]])
  * ships with the expression as a reference object; generated code is
  * a three-level loop over (table, plane, dim) skipping zero
  * coefficients in ascending-dimension order — the same accumulation
  * order as the chain and the oracle SQL's term list, and bucket bits
  * depend only on `projection > 0`, which ±0.0 both fail, so bucket
  * values are identical to the chain form on every input.
  *
  * Null semantics: a null input vector yields null (the caller's
  * explode then drops the row); a null ELEMENT — or a dimension past
  * the end of a short vector — nullifies that plane's projection,
  * which contributes bit 0 — exactly the chain's
  * `when(null > 0, bit).otherwise(0)` over `element_at` (which is
  * NULL out of range).
  */
// ImplicitCastInputTypes: float/int element arrays coerce to
// array<double> at analysis, like the chain form's per-element casts
case class HyperplaneBuckets(child: Expression, tables: Int, planes: Int, dim: Int)
  extends UnaryExpression with ImplicitCastInputTypes {

  require(tables >= 1 && planes >= 1 && planes <= 63, "bad LSH geometry")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // [tables*planes][dim] matrix of -1/0/+1, derived once at plan time
  @transient private lazy val coeffs: Array[Array[Int]] =
    Array.tabulate(tables * planes)(gp =>
      graft.ops.Similarity.planeCoeffs(gp, dim).toArray)

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val row = coeffs(t * planes + p)
        val n = v.numElements()
        var s = 0.0
        var nullProj = false
        var d = 0
        while (d < row.length && !nullProj) {
          val c = row(d)
          if (c != 0) {
            // out-of-range dimension == null element: nullifies the
            // projection, matching the chain form's element_at → NULL
            if (d >= n || v.isNullAt(d)) nullProj = true
            else s += c * v.getDouble(d)
          }
          d += 1
        }
        if (!nullProj && s > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coeffRef = ctx.addReferenceObj("planeCoeffs", coeffs, "int[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val row = ctx.freshName("row")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val bucket = ctx.freshName("bucket")
      val nullProj = ctx.freshName("nullProj")
      s"""
         |long[] $out = new long[$tables];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $bucket = 0L;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    int[] $row = $coeffRef[$t * $planes + $p];
         |    int $n = $v.numElements();
         |    double $s = 0.0;
         |    boolean $nullProj = false;
         |    for (int $d = 0; $d < $row.length && !$nullProj; $d++) {
         |      int $c = $row[$d];
         |      if ($c != 0) {
         |        if ($d >= $n || $v.isNullAt($d)) { $nullProj = true; }
         |        else { $s += $c * $v.getDouble($d); }
         |      }
         |    }
         |    if (!$nullProj && $s > 0) $bucket |= (1L << $p);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  /** Column-level entry point: array of per-table bucket ids. */
  def apply(v: Column, tables: Int, planes: Int, dim: Int): Column =
    GraftSqlShim.column(
      HyperplaneBuckets(GraftSqlShim.expression(v), tables, planes, dim))
}
