package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression — the
  * text-canonicalization stage that MUST run before any
  * content-hash-based operator, because the same visible text can
  * arrive composed ("é" U+00E9) or decomposed ("e"+U+0301) from
  * different crawls, and every md5/xxhash identity in this engine
  * (exact dedup, corpus diff, minhash, winnowing) would otherwise see
  * two different documents. Spark has no built-in normalizer; DuckDB's
  * `nfc_normalize` is the oracle twin.
  *
  * Fast path: `Normalizer.isNormalized` on already-NFC input (all
  * ASCII trivially is) returns the INPUT UTF8String — no String
  * round-trip, no allocation — so the common case costs one scan.
  * NFC (not NFKC) on purpose: canonical equivalence only, no
  * compatibility folding (ligatures, superscripts stay distinct —
  * folding is a lossy modeling decision, not canonicalization).
  */
case class NfcNormalize(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** Static kernel shared by eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  def apply(text: Column): Column =
    GraftSqlShim.column(NfcNormalize(GraftSqlShim.expression(text)))
}
