package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native multi-literal counter (kernel #12): ONE Aho–Corasick pass
  * over the document's UTF-8 bytes counts every pattern at once —
  * replacing the per-pattern replace-and-measure chain
  * (`(len(x) − len(replace(x, p, ''))) / len(p)` × N patterns), which
  * re-scans and re-allocates the full text once PER PATTERN. The
  * hygiene audits carry ~22 literals; at 100 TB that is 22 corpus
  * scans folded into one.
  *
  * Semantics are pinned to the replace identity: per pattern,
  * NON-OVERLAPPING occurrences taken greedily left-to-right (matches
  * arrive in increasing end position; a match counts iff it starts at
  * or after the previous counted match's end — for a fixed-length
  * pattern that IS the greedy left-to-right scan `replace` performs).
  * Distinct patterns count independently even where they overlap each
  * other (`â€` inside `â€™` counts for both) — exactly like N
  * independent replaces. Matching is over raw UTF-8 bytes: a literal
  * byte sequence matches at exactly the same positions as its
  * character sequence (UTF-8 is self-synchronizing), so byte counts
  * equal the char-based oracle's counts.
  *
  * Aho & Corasick, CACM 18(6) 1975; dense byte-indexed goto table
  * (automaton states × 256 ints — total pattern bytes bound the state
  * count, ~120 states for the hygiene lists), failure links resolved
  * at build time so the scan loop is two array reads per byte.
  */
case class MultiCountLiterals(child: Expression, patterns: Seq[String])
  extends UnaryExpression with ExpectsInputTypes {

  require(patterns.nonEmpty, "no patterns")
  require(patterns.distinct.length == patterns.length, "duplicate patterns")
  require(patterns.forall(_.nonEmpty), "empty pattern")

  @transient private lazy val ac = AhoCorasick.build(patterns)

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ac.countNonOverlapping(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("graftAc", ac,
      classOf[AhoCorasick].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $acRef.countNonOverlapping($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): MultiCountLiterals =
    copy(child = newChild)
}

object MultiCountLiterals {
  import org.apache.spark.sql.{Column, GraftSqlShim}
  def apply(text: Column, patterns: Seq[String]): Column =
    GraftSqlShim.column(
      MultiCountLiterals(GraftSqlShim.expression(text), patterns))
}

/** Built automaton: dense goto table + per-state output pattern lists.
  * Serializable (ships inside the expression to executors); the scan
  * method is shared verbatim by interpreted eval and generated code.
  */
final class AhoCorasick private (
    goto: Array[Array[Int]],       // state -> byte -> state
    outPatterns: Array[Array[Int]],// state -> pattern ids ending here
    patLen: Array[Int]             // pattern id -> byte length
) extends Serializable {

  def numPatterns: Int = patLen.length

  /** One pass; per-pattern greedy non-overlapping counts. */
  def countNonOverlapping(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val counts = new Array[Long](patLen.length)
    val lastEnd = new Array[Int](patLen.length) // 0 = nothing taken yet
    var state = 0
    var pos = 0
    while (pos < bytes.length) {
      state = goto(state)(bytes(pos) & 0xff)
      val out = outPatterns(state)
      if (out.length > 0) {
        var i = 0
        while (i < out.length) {
          val pid = out(i)
          val start = pos + 1 - patLen(pid)
          if (start >= lastEnd(pid)) {
            counts(pid) += 1
            lastEnd(pid) = pos + 1
          }
          i += 1
        }
      }
      pos += 1
    }
    new GenericArrayData(counts)
  }
}

object AhoCorasick {

  def build(patterns: Seq[String]): AhoCorasick = {
    val pats = patterns.map(_.getBytes("UTF-8")).toArray
    val patLen = pats.map(_.length)
    // trie
    val maxStates = 1 + pats.map(_.length).sum
    val next = Array.fill(maxStates, 256)(-1)
    val ends = Array.fill(maxStates)(List.empty[Int])
    var nStates = 1
    for (pid <- pats.indices) {
      var s = 0
      for (b <- pats(pid)) {
        val c = b & 0xff
        if (next(s)(c) == -1) { next(s)(c) = nStates; nStates += 1 }
        s = next(s)(c)
      }
      ends(s) ::= pid
    }
    // BFS: failure links; convert to dense goto; merge output sets
    val fail = new Array[Int](nStates)
    val goto = Array.tabulate(nStates)(s => next(s).clone())
    val queue = scala.collection.mutable.Queue.empty[Int]
    for (c <- 0 until 256) {
      if (goto(0)(c) == -1) goto(0)(c) = 0
      else { fail(goto(0)(c)) = 0; queue += goto(0)(c) }
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      ends(s) = ends(s) ++ ends(fail(s)) // suffix matches propagate
      for (c <- 0 until 256) {
        val t = goto(s)(c)
        if (t == -1) goto(s)(c) = goto(fail(s))(c)
        else { fail(t) = goto(fail(s))(c); queue += t }
      }
    }
    new AhoCorasick(goto.take(nStates), ends.take(nStates)
      .map(_.distinct.sorted.toArray), patLen)
  }
}
