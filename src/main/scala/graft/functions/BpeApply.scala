package graft.functions

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE merge application: given a symbol sequence (the
  * character split of one word, terminal marker included) and a RANKED
  * merge list, repeatedly merge the lowest-rank adjacent pair present
  * until none applies — the standard byte-pair-encoding tokenize loop
  * (Sennrich et al., ACL'16; the same greedy-by-rank procedure GPT-2's
  * public encoder uses). One native pass per word; the merge table
  * rides in the plan (a Seq on the case class, like [[MinHashHex]]'s
  * vocab — value equality keeps common-subexpression elimination
  * working), so encoding shuffles nothing and joins nothing.
  *
  * Pair keys are the two symbols space-joined — unambiguous because
  * symbols descend from whitespace-split words (no symbol ever
  * contains a space), and exactly the shape [[WordNgrams]](syms, 2)
  * emits, so the TRAINER's pair counts and this kernel's lookups use
  * identical keys by construction.
  *
  * Null array → null (standard unary null propagation); null ELEMENTS
  * are dropped (they cannot merge and a null symbol is not a token).
  */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // "l r" -> rank; built once per task from the plan-shipped merges
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      // first occurrence wins: the lowest rank of a duplicated pair
      m.putIfAbsent(l + " " + r, Integer.valueOf(i))
    }
    m
  }

  // Encoded-word cache — the dictionary GPT-2's public encoder keeps
  // for the same reason: word frequency is Zipf-distributed, so most
  // kernel calls repeat an already-merged word and the quadratic merge
  // loop runs only once per DISTINCT word per task. The expression
  // instance (and so this map) is task-private (plan references are
  // deserialized per task), so no synchronization; capped-and-cleared
  // to bound executor memory on adversarial all-distinct-word input.
  // Values hold immutable UTF8Strings shared across rows; each hit
  // returns a fresh GenericArrayData wrapper over the shared array.
  @transient private lazy val encoded =
    new java.util.HashMap[String, Array[Any]](1 << 12)
  private val CacheCap = 1 << 16

  def evalSymbols(input: ArrayData): ArrayData = {
    val n = input.numElements()
    var syms = new java.util.ArrayList[String](n)
    // space-joined symbols — unambiguous for the same reason the pair
    // keys are: no symbol ever contains a space
    val keyB = new java.lang.StringBuilder(n * 2)
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i)) {
        val s = input.getUTF8String(i).toString
        syms.add(s)
        if (keyB.length > 0) keyB.append(' ')
        keyB.append(s)
      }
      i += 1
    }
    val key = keyB.toString
    val hit = encoded.get(key)
    if (hit != null) return new GenericArrayData(hit)
    while (syms.size() >= 2) {
      // lowest-rank adjacent pair present in this word
      var best = -1
      var bestRank = Integer.MAX_VALUE
      i = 0
      while (i < syms.size() - 1) {
        val r = ranks.get(syms.get(i) + " " + syms.get(i + 1))
        if (r != null && r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0) {
        // no applicable merge left
        val out = new Array[Any](syms.size())
        i = 0
        while (i < syms.size()) { out(i) = UTF8String.fromString(syms.get(i)); i += 1 }
        return new GenericArrayData(cachePut(key, out))
      }
      // merge ALL non-overlapping occurrences of the winning pair,
      // left to right (the reference implementations' behavior)
      val l = merges(bestRank)._1
      val r = merges(bestRank)._2
      val next = new java.util.ArrayList[String](syms.size())
      i = 0
      while (i < syms.size()) {
        if (i < syms.size() - 1 && syms.get(i) == l && syms.get(i + 1) == r) {
          next.add(l + r); i += 2
        } else { next.add(syms.get(i)); i += 1 }
      }
      syms = next
    }
    val out = new Array[Any](syms.size())
    i = 0
    while (i < syms.size()) { out(i) = UTF8String.fromString(syms.get(i)); i += 1 }
    new GenericArrayData(cachePut(key, out))
  }

  private def cachePut(key: String, out: Array[Any]): Array[Any] = {
    if (encoded.size() >= CacheCap) encoded.clear() // hot words refill fast
    encoded.put(key, out)
    out
  }

  override protected def nullSafeEval(input: Any): Any =
    evalSymbols(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeApply", this, classOf[BpeApply].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.evalSymbols($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeApply =
    copy(child = newChild)
}

object BpeApply {
  /** Column-level entry point. */
  def apply(symbols: Column, merges: Seq[(String, String)]): Column =
    GraftSqlShim.column(BpeApply(GraftSqlShim.expression(symbols), merges))
}
