package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** The SQL registration surface: every graft native function callable
  * from `spark.sql`, producing bit-identical values to its Column twin.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("graft_dot from SQL == DotProduct Column form") {
    assert(spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .as[Double].head() === 11.0)
    // null element nullifies, like the Column twin
    assert(spark.sql(
      "SELECT graft_dot(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 1.0d))")
      .head().isNullAt(0))
  }

  test("graft_simhash / graft_shingle_minhash / graft_minhash from SQL " +
    "match the Column forms on real rows") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon"),
                   (2L, "one two"),
                   (3L, "alpha alpha alpha"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("ext_docs")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_simhash(array_distinct(split(text, ' '))) AS sh,
        |  graft_shingle_minhash(split(text, ' ')) AS smh,
        |  graft_minhash(array_distinct(split(text, ' ')), 4) AS mh
        |FROM ext_docs""".stripMargin)
      .as[(Long, Long, String, Seq[String])].collect().sortBy(_._1)
    val viaCols = docs.select(col("doc_id"),
        graft.functions.SimHash32(Dedup.tokenSet(col("text"))).as("sh"),
        graft.functions.ShingleMinHash(split(col("text"), " ")).as("smh"),
        graft.functions.MinHashHex(Dedup.tokenSet(col("text")), 4,
          Array.empty[String]).as("mh"))
      .as[(Long, Long, String, Seq[String])].collect().sortBy(_._1)
    assert(viaSql.toSeq === viaCols.toSeq)
  }

  test("graft_token_pixels == the interpreted md5/conv lambda chain " +
    "it replaces, from SQL and Column forms") {
    val d = Seq((1L, "the cat  sat on the mat"),   // double space: empty token
                (2L, " leading and trailing "),
                (3L, "unicode żółć 北京 mixed"),
                (4L, ""),                          // no tokens -> empty array
                (5L, null.asInstanceOf[String]))   // null propagates
      .toDF("doc_id", "text")
    d.createOrReplaceTempView("ext_pix")
    val interpreted = d.select(col("doc_id"), transform(
        filter(split(col("text"), " "), t => length(t) > 0),
        t => conv(substring(md5(t), 1, 6), 16, 10).cast("long").cast("int"))
        .as("px"))
      .as[(Long, Seq[Int])].collect().toMap
    val native = d.select(col("doc_id"),
        graft.functions.TokenPixels(col("text")).as("px"))
      .as[(Long, Seq[Int])].collect().toMap
    val viaSql = spark.sql(
      "SELECT doc_id, graft_token_pixels(text) AS px FROM ext_pix")
      .as[(Long, Seq[Int])].collect().toMap
    assert(native === interpreted)
    assert(viaSql === interpreted)
    assert(native(4L) === Seq.empty)
    assert(native(5L) === null)
    // the audio sibling: signed 16-bit samples, same walk, full range
    val sInterpreted = d.select(col("doc_id"), transform(
        filter(split(col("text"), " "), t => length(t) > 0),
        t => (conv(substring(md5(t), 1, 4), 16, 10).cast("long") - 32768L)
          .cast("int")).as("sm"))
      .as[(Long, Seq[Int])].collect().toMap
    val sNative = d.select(col("doc_id"),
        graft.functions.TokenSamples(col("text")).as("sm"))
      .as[(Long, Seq[Int])].collect().toMap
    val sViaSql = spark.sql(
      "SELECT doc_id, graft_token_samples(text) AS sm FROM ext_pix")
      .as[(Long, Seq[Int])].collect().toMap
    assert(sNative === sInterpreted)
    assert(sViaSql === sInterpreted)
  }

  test("graft_sniff_kind: header-magic routing tier agrees with the " +
    "decode tier (sniffMedia) on every container this library writes, " +
    "and names JPEG/GIF/TIFF magics the ImageIO tier would also take") {
    import graft.ops.Multimodal
    val wav = Multimodal.wavBytes(Array(1, 2, 3))
    val bmp = Multimodal.bmpBytes(Array(0x112233), 1)
    val pngBuf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB), "png", pngBuf)
    val mp4 = {
      val b = java.nio.ByteBuffer.allocate(16)
      b.putInt(16).put("ftyp".getBytes("US-ASCII"))
        .put("isom".getBytes("US-ASCII")).putInt(0x200)
      b.array()
    }
    val rows = Seq(
      (1L, wav, "audio"), (2L, bmp, "image"),
      (3L, pngBuf.toByteArray, "image"), (4L, mp4, "video"),
      (5L, "plain words".getBytes, "unknown"),
      (6L, Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte), "image"), // JPEG
      (7L, "GIF89a tail".getBytes, "image"),
      (8L, Array[Byte]('I', 'I', 42, 0, 9), "image"),            // TIFF LE
      (9L, Array.empty[Byte], "unknown"),
      (10L, null: Array[Byte], null))
    val df = rows.map { case (id, bin, _) => (id, bin) }
      .toDF("doc_id", "payload")
    df.createOrReplaceTempView("ext_sniff")
    val viaSql = spark.sql(
      "SELECT doc_id, graft_sniff_kind(payload) FROM ext_sniff")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    val viaCol = df.select(col("doc_id"),
        graft.functions.SniffKind(col("payload")))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    for ((id, _, want) <- rows) {
      assert(viaSql(id) === want, s"sql kind for $id")
      assert(viaCol(id) === want, s"column kind for $id")
    }
    // routing/decoding agreement on the self-written containers
    for ((id, bin, want) <- rows.take(5)) {
      val decoded = Multimodal.sniffMedia(bin)
      val kind = if (decoded.isNullAt(0)) null else decoded.getString(0)
      assert(kind === want, s"decode-tier kind for $id")
    }
  }

  test("graft_hyperplane_buckets from SQL == HyperplaneBuckets Column form") {
    val vecs = (1 to 10).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 7 + d * 3) % 9 - 4) * 0.5))
    }.toDF("vec_id", "v")
    vecs.createOrReplaceTempView("ext_vecs")
    val viaSql = spark.sql(
      "SELECT vec_id, graft_hyperplane_buckets(v, 2, 4, 8) AS bk FROM ext_vecs")
      .as[(Long, Seq[Long])].collect().toMap
    val viaCol = vecs.select(col("vec_id"),
        graft.functions.HyperplaneBuckets(col("v"), 2, 4, 8).as("bk"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaSql === viaCol)
  }

  test("graft_scrub from SQL == TextStats.scrub Column chain on planted PII") {
    val d = Seq((1L, "mail bob@x.com  call 555-123-4567 id 123456789 end"))
      .toDF("doc_id", "text")
    d.createOrReplaceTempView("ext_scrub")
    val viaSql = spark.sql("SELECT graft_scrub(text) FROM ext_scrub")
      .as[String].head()
    val viaCol = d.select(graft.ops.TextStats.scrub(col("text")))
      .as[String].head()
    assert(viaSql === viaCol)
    assert(viaSql === "mail <EMAIL> call <PHONE> id <ID> end")
  }

  test("graft_nfc from SQL == NfcNormalize Column form on decomposed input") {
    val d = Seq((1L, "café"), (2L, "ascii")).toDF("doc_id", "text")
    d.createOrReplaceTempView("ext_nfc")
    val viaSql = spark.sql(
        "SELECT doc_id, graft_nfc(text) FROM ext_nfc ORDER BY doc_id")
      .as[(Long, String)].collect().toSeq
    val viaCol = d.select(col("doc_id"),
        graft.functions.NfcNormalize(col("text")))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(viaSql === viaCol)
    assert(viaSql.head._2 === "caf\u00e9")
  }

  test("shape arguments must be integer literals") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array('a'), 1 + 1)").collect()
    }
    // 1+1 folds to a literal only AFTER analysis; the builder sees the
    // unfolded Add and rejects it with the contract message
    assert(e.getMessage.contains("foldable integer literal") ||
      spark.sql("SELECT graft_minhash(array('a'), 2)").collect().nonEmpty)
  }

  test("register() is per-session: a cloned session needs its own call " +
    "(spark.sql.extensions is the config path that covers every session)") {
    val s2 = spark.newSession()
    intercept[Exception] {
      s2.sql("SELECT graft_dot(array(2.0d), array(3.0d))").collect()
    }
    GraftExtensions.register(s2)
    assert(s2.sql("SELECT graft_dot(array(2.0d), array(3.0d))")
      .collect().head.getDouble(0) === 6.0)
  }

  test("graft_winnow / graft_window_hashes from SQL match the Column " +
    "forms on real rows") {
    val docs = Seq((1L, "a b c d e f g h"), (2L, "x y"),
                   (3L, "m n o m n o m n"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("ext_docs2")
    val viaSql = spark.sql(
      """SELECT doc_id,
        |  graft_winnow(split(text, ' '), 3, 4) AS fps,
        |  graft_window_hashes(split(text, ' '), 3) AS whs
        |FROM ext_docs2""".stripMargin)
      .as[(Long, Seq[String], Seq[Long])].collect().sortBy(_._1)
    val viaCols = docs.select(col("doc_id"),
        graft.functions.WinnowFingerprints(split(col("text"), " "), 3, 4).as("fps"),
        graft.functions.WindowHashes(split(col("text"), " "), 3).as("whs"))
      .as[(Long, Seq[String], Seq[Long])].collect().sortBy(_._1)
    assert(viaSql.toSeq === viaCols.toSeq)
    // window hashes match the xxhash64 builtin per position
    val builtin = docs
      .select(col("doc_id"),
        org.apache.spark.sql.functions.expr(
          "xxhash64(concat_ws(' ', slice(split(text, ' '), 1, 3)))").as("h0"))
      .as[(Long, Long)].collect().sortBy(_._1)
    viaSql.foreach { case (id, _, whs) =>
      if (whs.nonEmpty)
        assert(whs.head === builtin.find(_._1 == id).get._2)
    }
  }

  test("graft_hilbert == HilbertKey column form == static kernel") {
    val pts = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y))
      .toDF("x", "y")
    pts.createOrReplaceTempView("ext_pts")
    val viaSql = spark.sql(
        "SELECT x, y, graft_hilbert(x, y, 3) AS d FROM ext_pts")
      .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2))
    val viaCol = pts.select(col("x"), col("y"),
        graft.functions.HilbertKey(col("x"), col("y"), 3).as("d"))
      .as[(Long, Long, Long)].collect().sortBy(t => (t._1, t._2))
    assert(viaSql.toSeq === viaCol.toSeq)
    viaSql.foreach { case (x, y, d) =>
      assert(d === graft.functions.HilbertKey.compute(x, y, 3))
    }
  }

  test("BandedLevenshteinRule rewrites thresholded full-DP levenshtein " +
    "filters and join conditions to the banded early-exit form, with " +
    "identical results; the 3-arg form is never touched") {
    val d = Seq((1L, "abc"), (2L, "abd"), (3L, "xyz"), (4L, "abcd"))
      .toDF("id", "nm")
    d.createOrReplaceTempView("lev_t")
    val q = spark.sql(
      """SELECT a.id AS ia, b.id AS ib FROM lev_t a JOIN lev_t b
        |ON a.id < b.id WHERE levenshtein(a.nm, b.nm) <= 1""".stripMargin)
    val opt = q.queryExecution.optimizedPlan.toString
    assert(opt.contains("Some(1)"), opt)          // banded form injected
    assert(!opt.contains("levenshtein(a") || !opt.contains(", None)"), opt)
    val got = q.as[(Long, Long)].collect().sorted.toSeq
    assert(got === Seq((1L, 2L), (1L, 4L), (2L, 4L)))
    // strict < : threshold becomes k-1
    val q2 = spark.sql(
      "SELECT count(*) FROM lev_t a JOIN lev_t b ON a.id < b.id " +
        "AND levenshtein(a.nm, b.nm) < 2")
    assert(q2.queryExecution.optimizedPlan.toString.contains("Some(1)"))
    assert(q2.as[Long].head() === 3L)
    // already-banded stays as written
    val q3 = spark.sql(
      "SELECT count(*) FROM lev_t a, lev_t b WHERE a.id < b.id " +
        "AND levenshtein(a.nm, b.nm, 3) >= 0")
    assert(q3.queryExecution.optimizedPlan.toString.contains("Some(3)"))
    // NULL propagation: null name drops the row under both forms
    val dn = Seq((1L, "abc"), (2L, null.asInstanceOf[String]))
      .toDF("id", "nm")
    dn.createOrReplaceTempView("lev_n")
    assert(spark.sql(
      "SELECT count(*) FROM lev_n a, lev_n b " +
        "WHERE levenshtein(a.nm, b.nm) <= 5").as[Long].head() === 1L)
  }

  test("graft_multicount from SQL == the kernel Column form; shape " +
    "errors are loud") {
    val got = spark.sql(
      "SELECT graft_multicount('aaa ab', array('aa', 'ab'))")
      .head().getSeq[Long](0)
    assert(got === Seq(1L, 1L))
    assert(intercept[Exception](spark.sql(
      "SELECT graft_multicount('x', array('a', NULL))").collect())
      .getMessage.contains("null"))
  }

  // ---- table-valued functions -------------------------------------

  private def asofFixture(): Unit = {
    Seq((1L, "u1", 100L), (2L, "u1", 250L), (3L, "u2", 50L))
      .toDF("eid", "uid", "t").createOrReplaceTempView("tvf_left")
    Seq(("u1", 10L, 90L, "a"), ("u1", 11L, 100L, "b"), ("u1", 12L, 240L, "c"),
        ("u2", 13L, 60L, "d"))
      .toDF("uid", "sid", "st", "tag").createOrReplaceTempView("tvf_right")
  }

  test("graft_asof_join TVF from pure SQL == asOfJoinNative Column " +
    "form, and the plan runs through AsofJoinExec") {
    asofFixture()
    val sql = spark.sql(
      """SELECT eid, uid, t, sid, tag FROM
        |graft_asof_join('tvf_left', 'tvf_right', 'uid', 't', 'st',
        |                'sid,tag', 'backward', 'false', 'sid')
        |ORDER BY eid""".stripMargin)
    assert(sql.queryExecution.executedPlan.toString.contains("AsofJoin"))
    val viaCols = graft.ops.TemporalJoins.asOfJoinNative(
        spark.table("tvf_left"), spark.table("tvf_right")
          .select(col("uid"), col("st"), col("sid"), col("tag")),
        Seq("uid"), "t", "st", Seq("sid", "tag"),
        rightTiebreak = Some("sid"))
      .select("eid", "uid", "t", "sid", "tag").orderBy("eid")
    assert(sql.collect().toSeq === viaCols.collect().toSeq)
    // equal-time row IS visible backward non-strict: eid=1 picks st=100
    val r1 = sql.head()
    assert(r1.getLong(3) === 11L && r1.getString(4) === "b")
  }

  test("graft_asof_join TVF: forward and strict variants, carry " +
    "aliases, and expression time args") {
    asofFixture()
    // forward: eid=1 (t=100) picks the earliest st >= 100 → st=100 (b);
    // strict forward skips the equal-time row → st=240 (c)
    val fwd = spark.sql(
      """SELECT eid, sid FROM
        |graft_asof_join('tvf_left', 'tvf_right', 'uid', 't', 'st',
        |                'sid', 'forward', 'false') ORDER BY eid""".stripMargin)
      .collect()
    assert(fwd(0).getLong(1) === 11L)
    val fwdStrict = spark.sql(
      """SELECT eid, sid FROM
        |graft_asof_join('tvf_left', 'tvf_right', 'uid', 't', 'st',
        |                'sid', 'forward', 'true') ORDER BY eid""".stripMargin)
      .collect()
    assert(fwdStrict(0).getLong(1) === 12L)
    // aliased carry + an expression time arg on both sides (the µs
    // scaling a SQL user would write inline)
    val aliased = spark.sql(
      """SELECT eid, src_tag FROM
        |graft_asof_join('tvf_left', 'tvf_right', 'uid',
        |                't * 1000', 'st * 1000', 'tag:src_tag')
        |ORDER BY eid""".stripMargin).collect()
    // u2's only right row (st=60) is AFTER t=50 — backward yields null
    assert(aliased.map(r => r.getString(1)).toSeq === Seq("b", "c", null))
  }

  test("graft_asof_join TVF error contract: shadowing carry alias, " +
    "bad direction, non-literal args all fail loudly") {
    asofFixture()
    assert(intercept[Exception](spark.sql(
      "SELECT * FROM graft_asof_join('tvf_left', 'tvf_right', 'uid', " +
        "'t', 'st', 'tag:st')").collect())
      .getMessage.contains("collides"))
    assert(intercept[Exception](spark.sql(
      "SELECT * FROM graft_asof_join('tvf_left', 'tvf_right', 'uid', " +
        "'t', 'st', 'sid', 'sideways')").collect())
      .getMessage.contains("backward or forward"))
    assert(intercept[Exception](spark.sql(
      "SELECT * FROM graft_asof_join(tvf_left, 'tvf_right', 'uid', " +
        "'t', 'st', 'sid')").collect()).getMessage.nonEmpty)
  }

  test("graft_asof_join TVF bucket_width arg routes through the " +
    "time-split salted form: same rows as the native path in BOTH " +
    "directions") {
    asofFixture()
    for (dir <- Seq("backward", "forward")) {
      val native = spark.sql(
        s"""SELECT eid, sid, tag FROM
           |graft_asof_join('tvf_left', 'tvf_right', 'uid', 't', 'st',
           |                'sid,tag', '$dir', 'false', 'sid')
           |ORDER BY eid""".stripMargin).collect().toSeq
      val salted = spark.sql(
        s"""SELECT eid, sid, tag FROM
           |graft_asof_join('tvf_left', 'tvf_right', 'uid', 't', 'st',
           |                'sid,tag', '$dir', 'false', 'sid', '50')
           |ORDER BY eid""".stripMargin).collect().toSeq
      assert(salted === native, s"direction=$dir")
    }
  }

  test("graft_asof_join TVF accepts inline subquery relations — " +
    "'(SELECT ...)' on either side == the temp-view form — and an " +
    "unknown name still fails with a message naming both forms") {
    asofFixture()
    val viaViews = spark.sql(
      """SELECT eid, sid, tag FROM
        |graft_asof_join('tvf_left', 'tvf_right', 'uid', 't', 'st',
        |                'sid,tag', 'backward', 'false', 'sid')
        |ORDER BY eid""".stripMargin).collect().toSeq
    val viaSub = spark.sql(
      """SELECT eid, sid, tag FROM
        |graft_asof_join('(SELECT * FROM tvf_left)',
        |                '(SELECT uid, st, sid, tag FROM tvf_right)',
        |                'uid', 't', 'st',
        |                'sid,tag', 'backward', 'false', 'sid')
        |ORDER BY eid""".stripMargin).collect().toSeq
    assert(viaSub === viaViews)
    // bare SELECT (no parens) parses too
    val bare = spark.sql(
      """SELECT eid, sid, tag FROM
        |graft_asof_join('SELECT * FROM tvf_left',
        |                'tvf_right', 'uid', 't', 'st',
        |                'sid,tag', 'backward', 'false', 'sid')
        |ORDER BY eid""".stripMargin).collect().toSeq
    assert(bare === viaViews)
    // a set-op spec wrapped in parens on BOTH sides: the first paren
    // closes mid-string, so the outer pair must NOT be stripped (a
    // naive strip would mangle it into ' SELECT...) UNION ALL (SELECT '
    // and fail with a confusing parse error)
    val viaUnion = spark.sql(
      """SELECT eid, sid, tag FROM
        |graft_asof_join('(SELECT * FROM tvf_left WHERE eid % 2 = 0)
        |                 UNION ALL
        |                 (SELECT * FROM tvf_left WHERE eid % 2 = 1)',
        |                'tvf_right', 'uid', 't', 'st',
        |                'sid,tag', 'backward', 'false', 'sid')
        |ORDER BY eid""".stripMargin).collect().toSeq
    assert(viaUnion === viaViews)
    // quoted parens inside string literals fall back to pass-through
    // (never a mangled strip)
    val quoted = spark.sql(
      """SELECT eid, sid, tag FROM
        |graft_asof_join('(SELECT eid, uid, t, '')'' AS junk FROM tvf_left)',
        |                'tvf_right', 'uid', 't', 'st',
        |                'sid,tag', 'backward', 'false', 'sid')
        |ORDER BY eid""".stripMargin).collect().toSeq
    assert(quoted === viaViews)
    val err = intercept[Exception](spark.sql(
      "SELECT * FROM graft_asof_join('no_such_table_xyz', 'tvf_right', " +
        "'uid', 't', 'st', 'sid')").collect()).getMessage
    assert(err.contains("(SELECT ...)"), err)
    val badSub = intercept[Exception](spark.sql(
      "SELECT * FROM graft_asof_join('(SELECT FROM nothing', 'tvf_right', " +
        "'uid', 't', 'st', 'sid')").collect()).getMessage
    assert(badSub.contains("subquery failed"), badSub)
    // gap-fill takes subqueries too
    val day = 86400000000L
    Seq(("k1", 0L * day + 5L, 1L, 10.0), ("k1", 2L * day + 7L, 2L, 30.0))
      .toDF("k", "tus", "id", "v").createOrReplaceTempView("tvf_gap_sub")
    val g = spark.sql(
      """SELECT * FROM graft_gap_fill('(SELECT * FROM tvf_gap_sub)',
        |'k', 'tus', 'id', 'v') ORDER BY key, day""".stripMargin)
    assert(g.count() === 3L)
  }

  test("graft_gap_fill TVF == gapFillDaily Column form on a gappy " +
    "fixture (LOCF across the silent day)") {
    val day = 86400000000L
    Seq(("k1", 0L * day + 5L, 1L, 10.0),
        ("k1", 2L * day + 7L, 2L, 30.0),
        ("k2", 1L * day, 3L, 7.0))
      .toDF("k", "tus", "id", "v").createOrReplaceTempView("tvf_gap")
    val sql = spark.sql(
      """SELECT key, day, n, filled_q, is_gap FROM
        |graft_gap_fill('tvf_gap', 'k', 'tus', 'id', 'v')
        |ORDER BY key, day""".stripMargin).collect()
    assert(sql.length === 4) // k1: days 0,1,2; k2: day 1
    val k1gap = sql(1)
    assert(k1gap.getLong(1) === 1L && k1gap.getLong(2) === 0L &&
      k1gap.getBoolean(4) && k1gap.getLong(3) === 10000L) // carried 10.0 → milli
    val viaCols = graft.ops.TemporalJoins.gapFillDaily(
        spark.table("tvf_gap"), "k", col("tus"), "id", "v")
      .select("key", "day", "n", "filled_q", "is_gap")
      .orderBy("key", "day").collect()
    assert(sql.toSeq === viaCols.toSeq)
  }

  test("graft_asof_join TVF tolerance arg == asOfJoinTolerance Column " +
    "form ('' bucket_width placeholder), composes with the salted " +
    "path, and rejects a non-positive tolerance") {
    asofFixture()
    val viaTvf = spark.sql(
      """SELECT eid, sid, tag FROM
        |graft_asof_join('tvf_left', 'tvf_right', 'uid', 't', 'st',
        |                'sid,tag', 'backward', 'false', 'sid', '', '20')
        |ORDER BY eid""".stripMargin).collect().toSeq
    val viaCols = graft.ops.TemporalJoins.asOfJoinTolerance(
        spark.table("tvf_left"), spark.table("tvf_right"), Seq("uid"),
        "t", "st", Seq("sid", "tag"), toleranceUs = 20L,
        rightTiebreak = Some("sid"))
      .select("eid", "sid", "tag").orderBy("eid").collect().toSeq
    assert(viaTvf === viaCols)
    // salted + tolerance: same rows as native + tolerance
    val salted = spark.sql(
      """SELECT eid, sid, tag FROM
        |graft_asof_join('tvf_left', 'tvf_right', 'uid', 't', 'st',
        |                'sid,tag', 'backward', 'false', 'sid', '50', '20')
        |ORDER BY eid""".stripMargin).collect().toSeq
    assert(salted === viaTvf)
    assert(intercept[Exception](spark.sql(
      "SELECT * FROM graft_asof_join('tvf_left', 'tvf_right', 'uid', " +
        "'t', 'st', 'sid', 'backward', 'false', 'sid', '', '0')").collect())
      .getMessage.contains("tolerance must be positive"))
  }

  test("graft_cumsum TVF == KeyedPrefix.cumsum Column form, accepts a " +
    "subquery relation, defaults out names and count_name, and " +
    "rejects a malformed sums entry") {
    val df = (1 to 200).map(i => (s"k${i % 2}", i.toLong, (i % 5).toLong))
      .toDF("k", "ord", "v")
    df.createOrReplaceTempView("tvf_cum")
    val sql = spark.sql(
      """SELECT k, ord, n, cumv FROM
        |graft_cumsum('tvf_cum', 'k', 'ord', 'v:cumv')
        |ORDER BY k, ord""".stripMargin).collect().toSeq
    val cols = graft.ops.KeyedPrefix.cumsum(df, Seq("k"), Seq("ord"),
        Seq("v" -> "cumv"))
      .select("k", "ord", "n", "cumv").orderBy("k", "ord").collect().toSeq
    assert(sql === cols)
    // subquery relation + default names: out = v_sum, count = n
    val sub = spark.sql(
      """SELECT k, ord, n, v_sum FROM
        |graft_cumsum('(SELECT * FROM tvf_cum WHERE ord <= 100)',
        |             'k', 'ord', 'v')
        |ORDER BY k, ord""".stripMargin).collect().toSeq
    val colsSub = graft.ops.KeyedPrefix.cumsum(
        df.filter(col("ord") <= 100), Seq("k"), Seq("ord"),
        Seq("v" -> "v_sum"))
      .select("k", "ord", "n", "v_sum").orderBy("k", "ord").collect().toSeq
    assert(sub === colsSub)
    val err = intercept[Exception](spark.sql(
      "SELECT * FROM graft_cumsum('tvf_cum', 'k', 'ord', 'v:a:b')")
      .collect()).getMessage
    assert(err.contains("must be 'col' or 'col:out'"), err)
  }
}
