package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{DotProduct, HilbertKey, HyperplaneBuckets, MinHashHex, MultiCountLiterals, NfcNormalize, ShingleMinHash, SimHash32, SniffKind, TokenPixels, TokenSamples, WindowHashes, WinnowFingerprints, WordNgrams}

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
    GraftExtensions.tableRegistrations.foreach { case (name, info, builder) =>
      ext.injectTableFunction((FunctionIdentifier(name), info, builder))
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
    tableRegistrations.foreach { case (name, info, builder) =>
      spark.sessionState.tableFunctionRegistry
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
    ("graft_token_pixels",
      info("graft_token_pixels",
        "graft_token_pixels(text) - per-token 0xRRGGBB pixels (md5 top 3 bytes) in one pass"),
      args => { arity("graft_token_pixels", args, 1); TokenPixels(args(0)) }),
    ("graft_token_samples",
      info("graft_token_samples",
        "graft_token_samples(text) - per-token signed 16-bit PCM samples (md5 top 2 bytes - 32768) in one pass"),
      args => { arity("graft_token_samples", args, 1); TokenSamples(args(0)) }),
    ("graft_sniff_kind",
      info("graft_sniff_kind",
        "graft_sniff_kind(binary) - header-magic media kind (audio/video/image/unknown)"),
      args => { arity("graft_sniff_kind", args, 1); SniffKind(args(0)) }),
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

  // ---- table-valued functions: the SQL surface for the whole-operator
  // temporal joins (Spark has no ASOF JOIN syntax; DuckDB ships one and
  // the reference's consumers are SQL-first, so a FROM-clause TVF is
  // the closing piece: a pure-SQL user writes
  //   SELECT * FROM graft_asof_join('trades', 'quotes', 'sym',
  //                                 't', 't', 'price:q_price')
  // and gets the SAME AsofJoinExec plan the Column API builds). All
  // arguments are foldable string literals — table/view names resolve
  // through the session catalog at analysis time; the builder only
  // CONSTRUCTS the plan, no job runs.

  private def strArg(fn: String, arg: String, e: Expression): String = e match {
    case lit: Literal if lit.foldable && lit.dataType ==
        org.apache.spark.sql.types.StringType && lit.eval() != null =>
      lit.eval().toString
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a string literal, got $other")
  }

  private def boolStrArg(fn: String, arg: String, e: Expression): Boolean =
    strArg(fn, arg, e).trim.toLowerCase match {
      case "true"  => true
      case "false" => false
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be 'true' or 'false', got '$other'")
    }

  private def csv(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  private def activeSession: SparkSession =
    SparkSession.getActiveSession.getOrElse(
      throw new IllegalStateException(
        "graft table function: no active SparkSession"))

  /** Resolve a relation argument: a catalog table/view name, or an
    * inline subquery — `'(SELECT ...)'` (parens optional) — so a SQL
    * user composes the TVFs without a temp-view detour, the way
    * DuckDB's own ASOF JOIN composes with any relation. A spec whose
    * first token is `(`/`SELECT`/`WITH` parses as SQL (wrapped in a
    * derived-table alias, so both forms normalize); anything else
    * resolves through the catalog, and an unknown name fails with a
    * message that spells out both accepted forms.
    */
  private def relation(spark: SparkSession, fn: String, argName: String,
                       spec: String): org.apache.spark.sql.DataFrame = {
    val s = spec.trim
    val head = s.takeWhile(!_.isWhitespace).toUpperCase
    val isQuery = s.startsWith("(") || head == "SELECT" || head == "WITH"
    if (isQuery) {
      // strip outer parens ONLY when the opening paren closes at the
      // final character — '(SELECT ...) UNION ALL (SELECT ...)' is one
      // spec whose first paren closes mid-string, and stripping its
      // ends would mangle it into invalid SQL
      def outerParens: Boolean = {
        if (!(s.startsWith("(") && s.endsWith(")"))) return false
        var depth = 0
        var i = 0
        while (i < s.length - 1) {
          // depth scan only — quoted parens inside string literals can
          // miscount, but then depth hits 0 early and we fall back to
          // passing the spec through unmodified, which still parses
          if (s.charAt(i) == '(') depth += 1
          else if (s.charAt(i) == ')') { depth -= 1; if (depth == 0) return false }
          i += 1
        }
        depth == 1
      }
      val inner = if (outerParens) s.substring(1, s.length - 1) else s
      try spark.sql(s"SELECT * FROM ( $inner ) __graft_sub")
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"$fn: $argName subquery failed to parse/analyze: ${e.getMessage}", e)
      }
    } else {
      try spark.table(s)
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"$fn: $argName '$s' is neither a catalog table/view nor an " +
              s"inline subquery — pass a table name or '(SELECT ...)': " +
              s"${e.getMessage}", e)
      }
    }
  }

  /** Resolve a time argument against `df`: a bare column name is used
    * as-is; anything else is parsed as a SQL expression and projected
    * as a synthetic column (returned name), so `unix_micros(ts)` works
    * directly in the TVF call.
    */
  private def timeColumn(df: org.apache.spark.sql.DataFrame, spec: String,
                         synth: String): (org.apache.spark.sql.DataFrame, String) =
    if (df.columns.contains(spec)) (df, spec)
    else (df.withColumn(synth, org.apache.spark.sql.functions.expr(spec)), synth)

  private[graft] val tableRegistrations: Seq[(String, ExpressionInfo, Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = Seq(
    ("graft_asof_join",
      info("graft_asof_join",
        "graft_asof_join(left, right, keys, left_time, right_time, carry" +
          "[, direction, strict, tiebreak, bucket_width, tolerance]) - " +
          "native as-of " +
          "join. left/right: a catalog table/view name or an inline " +
          "subquery '(SELECT ...)'. keys: comma-separated equi-key columns " +
          "present in both sides; left_time/right_time: column name or SQL " +
          "expression; carry: comma-separated right columns, each " +
          "'col' or 'col:alias'; direction: backward|forward (default " +
          "backward); strict: true|false (default false); tiebreak: right " +
          "column ranking equal-(key,time) rows (default: the carried " +
          "values); tolerance: positive max |left_time - matched right " +
          "time| (time-column units) - a farther match nulls the carried " +
          "columns while the left row survives (pandas merge_asof " +
          "tolerance). Plans to AsofJoinExec — per-side-width shuffles, " +
          "O(1) merge state."),
      args => {
        val fn = "graft_asof_join"
        require(args.length >= 6 && args.length <= 11,
          s"$fn expects 6 to 11 arguments, got ${args.length}")
        val spark = activeSession
        val keys = csv(strArg(fn, "keys", args(2)))
        require(keys.nonEmpty, s"$fn: keys must name at least one column")
        val carry = csv(strArg(fn, "carry", args(5))).map { spec =>
          spec.split(":") match {
            case Array(o)    => (o.trim, o.trim)
            case Array(o, a) => (o.trim, a.trim)
            case _ => throw new IllegalArgumentException(
              s"$fn: carry entry '$spec' must be 'col' or 'col:alias'")
          }
        }
        require(carry.nonEmpty, s"$fn: carry must name at least one column")
        val direction =
          if (args.length >= 7) strArg(fn, "direction", args(6)) else "backward"
        val strict =
          if (args.length >= 8) boolStrArg(fn, "strict", args(7)) else false
        val tiebreak =
          if (args.length >= 9) Some(strArg(fn, "tiebreak", args(8))) else None
        // 10th arg: hot-key fallback — a positive bucket width (in the
        // time column's units) routes through the time-split salted
        // form (TemporalJoins.asOfJoinTimeSplit; both directions)
        val bucketWidth =
          if (args.length >= 10) {
            val raw = strArg(fn, "bucket_width", args(9)).trim
            // '' = not salted: the positional placeholder that makes the
            // 11th arg (tolerance) reachable without a bucket width
            if (raw.isEmpty) None
            else {
              val v = try raw.toLong catch {
                case _: NumberFormatException =>
                  throw new IllegalArgumentException(
                    s"$fn: bucket_width must be a positive long or '', got '$raw'")
              }
              require(v > 0, s"$fn: bucket_width must be positive, got $v")
              Some(v)
            }
          } else None
        // 11th arg: match-window bound (pandas merge_asof tolerance);
        // applied as a post-projection over EITHER join path — the
        // as-of winner is the nearest candidate, so if it violates the
        // window every candidate does
        val tolerance =
          if (args.length >= 11) {
            val raw = strArg(fn, "tolerance", args(10)).trim
            val v = try raw.toLong catch {
              case _: NumberFormatException =>
                throw new IllegalArgumentException(
                  s"$fn: tolerance must be a positive long, got '$raw'")
            }
            require(v > 0, s"$fn: tolerance must be positive, got $v")
            Some(v)
          } else None

        val (left, lt) = timeColumn(
          relation(spark, fn, "left", strArg(fn, "left", args(0))),
          strArg(fn, "left_time", args(3)), "__graft_ltime")
        val right0 = relation(spark, fn, "right", strArg(fn, "right", args(1)))
        val (right1, rt) = timeColumn(right0,
          strArg(fn, "right_time", args(4)), "__graft_rtime")
        // project the right side down to what the join consumes, with
        // carried columns already under their output aliases (distinct
        // aliases also make self-joins collision-free); keep the time,
        // key, and tiebreak columns alongside
        import org.apache.spark.sql.functions.col
        // a carry entry that emits a key/time/tiebreak column under its
        // OWN name already provides it (same source column, so the join
        // reads identical values); an alias that merely SHADOWS one of
        // those names with a different column would silently change the
        // join semantics — fail loudly instead
        val aliasByName = carry.map { case (o, a) => a -> o }.toMap
        val keep = (keys ++ Seq(rt) ++ tiebreak.toSeq).distinct.filterNot { n =>
          aliasByName.get(n) match {
            case Some(o) if o == n => true
            case Some(o) => throw new IllegalArgumentException(
              s"$fn: carry alias '$n' (of column '$o') collides with " +
                s"key/time/tiebreak column '$n' — pick another alias")
            case None => false
          }
        }
        // the tolerance check reads the matched right time through an
        // internal carry entry, so it composes with any carry list and
        // with BOTH join paths (native and salted) uniformly
        val tolName = "__graft_tvf_tolrt"
        require(tolerance.isEmpty ||
          !(left.columns ++ right1.columns).contains(tolName),
          s"$fn: $tolName is reserved by the tolerance arg — rename first")
        val carryAll =
          if (tolerance.isDefined) carry :+ (rt -> tolName) else carry
        val right = right1.select(
          keep.map(col) ++ carryAll.map { case (o, a) => col(o).as(a) }: _*)
        val joined = bucketWidth match {
          case Some(wdt) => graft.ops.TemporalJoins.asOfJoinTimeSplit(
            left, right, keys, lt, rt, carryAll.map(_._2),
            rightTiebreak = tiebreak, strict = strict, bucketWidth = wdt,
            direction = direction)
          case None => graft.ops.TemporalJoins.asOfJoinNative(
            left, right, keys, lt, rt, carryAll.map(_._2),
            rightTiebreak = tiebreak, strict = strict, direction = direction)
        }
        val bounded = tolerance match {
          case Some(tol) =>
            import org.apache.spark.sql.functions.{lit, when}
            val gap =
              if (direction == "forward") col(tolName) - col(lt)
              else col(lt) - col(tolName)
            val within = col(tolName).isNotNull && gap <= lit(tol)
            carry.map(_._2).foldLeft(joined) { (df, c) =>
              df.withColumn(c, when(within, col(c)))
            }.drop(tolName)
          case None => joined
        }
        // synthetic left-time projections are internal — drop from output
        val out =
          if (lt == "__graft_ltime") bounded.drop("__graft_ltime") else bounded
        out.queryExecution.analyzed
      }),
    ("graft_gap_fill",
      info("graft_gap_fill",
        "graft_gap_fill(table, key, time_us, id, value) - per-key daily " +
          "gap-fill (LOCF): every day of each key's [first,last] span gets " +
          "a row; silent days carry n=0, is_gap=true and the forward-" +
          "filled last reading. time_us: column name or SQL expression " +
          "yielding epoch microseconds."),
      args => {
        val fn = "graft_gap_fill"
        require(args.length == 5, s"$fn expects 5 arguments, got ${args.length}")
        val spark = activeSession
        val df = relation(spark, fn, "table", strArg(fn, "table", args(0)))
        val tsSpec = strArg(fn, "time_us", args(2))
        val tsUs =
          if (df.columns.contains(tsSpec)) org.apache.spark.sql.functions.col(tsSpec)
          else org.apache.spark.sql.functions.expr(tsSpec)
        graft.ops.TemporalJoins.gapFillDaily(df,
            strArg(fn, "key", args(1)), tsUs,
            strArg(fn, "id", args(3)), strArg(fn, "value", args(4)))
          .queryExecution.analyzed
      }),
    ("graft_cumsum",
      info("graft_cumsum",
        "graft_cumsum(table, keys, order, sums[, count_name]) - keyed " +
          "running count and sums in (keys, order) global sort order " +
          "WITHOUT a per-key total sort (the two-pass prefix discipline " +
          "for keys that are few and huge, where a window would " +
          "serialize each key). table: catalog name or '(SELECT ...)'; " +
          "keys/order: comma-separated columns ((keys, order) must be a " +
          "unique key); sums: comma-separated 'col' or 'col:out' entries " +
          "(cols must be non-null BIGINT; default out = <col>_sum); " +
          "count_name defaults to 'n'. NOTE: the prefix pass runs its " +
          "bounded per-partition-totals job at analysis time (the " +
          "operator is eager by construction)."),
      args => {
        val fn = "graft_cumsum"
        require(args.length == 4 || args.length == 5,
          s"$fn expects 4-5 arguments, got ${args.length}")
        val spark = activeSession
        val df = relation(spark, fn, "table", strArg(fn, "table", args(0)))
        val keys = csv(strArg(fn, "keys", args(1)))
        val order = csv(strArg(fn, "order", args(2)))
        val sums = csv(strArg(fn, "sums", args(3))).map { e =>
          e.split(":").map(_.trim).filter(_.nonEmpty) match {
            case Array(c)    => (c, c + "_sum")
            case Array(c, o) => (c, o)
            case _ => throw new IllegalArgumentException(
              s"$fn: sums entry '$e' must be 'col' or 'col:out'")
          }
        }
        require(sums.nonEmpty, s"$fn: sums must name at least one column")
        val countName =
          if (args.length >= 5) strArg(fn, "count_name", args(4)) else "n"
        graft.ops.KeyedPrefix.cumsum(df, keys, order, sums, countName)
          .queryExecution.analyzed
      }))
}
