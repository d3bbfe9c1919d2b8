package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{DotProduct, HilbertKey, HyperplaneBuckets, MinHashHex, MultiCountLiterals, NfcNormalize, ShingleMinHash, SimHash32, WindowHashes, WinnowFingerprints, WordNgrams}

/** SQL surface for the native graft expressions: registered through
  * `SparkSessionExtensions`, so a pure-SQL user gets the same codegen'd
  * kernels the Column API uses —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * SELECT graft_dot(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * or imperatively on a live session via [[GraftExtensions.register]].
  *
  * Functions (all null-propagating like their Column twins):
  *   - `graft_multicount(string, array<string>) -> array<bigint>`
  *   - `graft_dot(array<double>, array<double>) -> double`
  *   - `graft_simhash(array<string>) -> bigint`
  *   - `graft_shingle_minhash(array<string>) -> string`
  *   - `graft_minhash(array<string>, numHashes) -> array<string>`
  *   - `graft_hyperplane_buckets(array<double>, tables, planes, dim)
  *     -> array<bigint>`
  *
  * Shape arguments (numHashes/tables/planes/dim) must be foldable
  * integer literals — they parameterize generated code, exactly like
  * the Column API's Int parameters.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.BandedLevenshteinRule)
    ext.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}

object GraftExtensions {

  /** Register the graft functions into an ALREADY-RUNNING session's
    * function registry (tests, notebooks); `spark.sql.extensions` is
    * the config-driven equivalent for new sessions.
    */
  def register(spark: SparkSession): Unit = {
    registrations.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
    // a running session cannot gain injected optimizer rules; the
    // experimental hook is the documented live-session equivalent
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.BandedLevenshteinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.BandedLevenshteinRule
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.BinnedRangeJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.BinnedRangeJoinRule
    if (!spark.experimental.extraStrategies
        .contains(graft.plans.AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsofJoinStrategy
  }

  private def intArg(fn: String, arg: String, e: Expression): Int = e match {
    case lit: Literal if lit.foldable =>
      lit.eval() match {
        case i: Int => i
        case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
        case l: Long => throw new IllegalArgumentException(
          s"$fn: $arg out of integer range: $l")
        case other => throw new IllegalArgumentException(
          s"$fn: $arg must be an integer literal, got $other")
      }
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a foldable integer literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.length == n, s"$fn expects $n arguments, got ${args.length}")

  private def info(name: String, usage: String): ExpressionInfo =
    // the full (non-deprecated) constructor; empty strings for the
    // catalog fields that do not apply to library functions
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def strArrayArg(fn: String, arg: String, e: Expression): Seq[String] = e match {
    case lit if lit.foldable =>
      lit.eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData =>
          (0 until a.numElements()).map { i =>
            require(!a.isNullAt(i), s"$fn: $arg must not contain nulls")
            a.getUTF8String(i).toString
          }
        case other => throw new IllegalArgumentException(
          s"$fn: $arg must be an array literal, got $other")
      }
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a foldable array of string literals, got $other")
  }

  private[graft] val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_multicount",
      info("graft_multicount",
        "graft_multicount(text, array('p1', ...)) - one Aho-Corasick pass " +
          "counting non-overlapping occurrences of every literal pattern"),
      args => {
        arity("graft_multicount", args, 2)
        MultiCountLiterals(args(0),
          strArrayArg("graft_multicount", "patterns", args(1)))
      }),
    ("graft_dot",
      info("graft_dot",
        "graft_dot(a, b) - codegen'd loop dot product of two double arrays"),
      args => { arity("graft_dot", args, 2); DotProduct(args(0), args(1)) }),
    ("graft_simhash",
      info("graft_simhash",
        "graft_simhash(tokens) - one-pass 32-bit SimHash of a token array"),
      args => { arity("graft_simhash", args, 1); SimHash32(args(0)) }),
    ("graft_shingle_minhash",
      info("graft_shingle_minhash",
        "graft_shingle_minhash(tokens) - min md5 hex over word-3-gram shingles"),
      args => { arity("graft_shingle_minhash", args, 1); ShingleMinHash(args(0)) }),
    ("graft_minhash",
      info("graft_minhash",
        "graft_minhash(tokens, numHashes) - one-pass MinHash signature (md5 hex minima)"),
      args => {
        arity("graft_minhash", args, 2)
        MinHashHex(args(0), intArg("graft_minhash", "numHashes", args(1)))
      }),
    ("graft_hyperplane_buckets",
      info("graft_hyperplane_buckets",
        "graft_hyperplane_buckets(v, tables, planes, dim) - per-table LSH bucket ids"),
      args => {
        arity("graft_hyperplane_buckets", args, 4)
        HyperplaneBuckets(args(0),
          intArg("graft_hyperplane_buckets", "tables", args(1)),
          intArg("graft_hyperplane_buckets", "planes", args(2)),
          intArg("graft_hyperplane_buckets", "dim", args(3)))
      }),
    ("graft_winnow",
      info("graft_winnow",
        "graft_winnow(tokens, k, w) - sorted distinct winnowing fingerprints (md5 k-gram window minima)"),
      args => {
        arity("graft_winnow", args, 3)
        val k = intArg("graft_winnow", "k", args(1))
        val w = intArg("graft_winnow", "w", args(2))
        // same contract as TextStats.winnow — the kernel's deque
        // degenerates on w < 1 instead of erroring
        require(k >= 1 && w >= 1, s"graft_winnow: k and w must be >= 1 (got k=$k, w=$w)")
        WinnowFingerprints(args(0), k, w)
      }),
    ("graft_window_hashes",
      info("graft_window_hashes",
        "graft_window_hashes(tokens, len) - xxhash64 per len-token sliding window"),
      args => {
        arity("graft_window_hashes", args, 2)
        val len = intArg("graft_window_hashes", "len", args(1))
        require(len >= 1, s"graft_window_hashes: len must be >= 1 (got $len)")
        WindowHashes(args(0), len)
      }),
    ("graft_word_ngrams",
      info("graft_word_ngrams",
        "graft_word_ngrams(tokens, n) - space-joined n-token grams, one per window"),
      args => {
        arity("graft_word_ngrams", args, 2)
        val n = intArg("graft_word_ngrams", "n", args(1))
        require(n >= 1, s"graft_word_ngrams: n must be >= 1 (got $n)")
        WordNgrams(args(0), n)
      }),
    ("graft_nfc",
      info("graft_nfc",
        "graft_nfc(text) - Unicode NFC canonical normalization"),
      args => { arity("graft_nfc", args, 1); NfcNormalize(args(0)) }),
    ("graft_hilbert",
      info("graft_hilbert",
        "graft_hilbert(x, y, bits) - Hilbert-curve index of a grid point"),
      args => {
        arity("graft_hilbert", args, 3)
        HilbertKey(args(0), args(1), intArg("graft_hilbert", "bits", args(2)))
      }),
    // composed logic registers too: the catalyst chain is built from
    // the SAME ordered pattern list as the Column form
    // (TextStats.ScrubSteps) — replacement ORDER is the contract, and a
    // SQL user re-deriving it can get it subtly wrong
    ("graft_scrub",
      info("graft_scrub",
        "graft_scrub(text) - ordered PII redaction (emails, phones, id runs) + whitespace collapse"),
      args => {
        arity("graft_scrub", args, 1)
        import org.apache.spark.sql.catalyst.expressions.{RegExpReplace, StringTrim}
        StringTrim(graft.ops.TextStats.ScrubSteps.foldLeft(args(0)) {
          case (e, (p, r)) => RegExpReplace(e, Literal(p), Literal(r))
        })
      }))
}
