package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Save/load for session index artifacts — the piece that turns the
  * [[graft.queries.FrameMemo]] registry from "rebuilt every session"
  * into a servable, build-once/serve-many index library. A deployed
  * 100 TB pipeline trains its quantizer, signs its MinHash corpus, and
  * computes its ANN ground truth ONCE per corpus version; every later
  * session (and every serving replica) loads the artifacts instead of
  * re-running hours of builds. The local equivalent measured here:
  * 47 s of sf0.1 memo builds become parquet reads.
  *
  * Every artifact directory carries a `_graft_manifest.json` with the
  * BUILD PARAMS (k, bands, strides, ...) and a CORPUS FINGERPRINT
  * (row count + order-free xxhash64 fold of the source table). Load
  * validates both and LOUD-FAILS on any mismatch — serving a stale or
  * differently-parameterized index is the silent-wrong-results failure
  * mode this store exists to prevent. The underscore prefix keeps the
  * manifest invisible to Spark's parquet FileIndex, so the data files
  * and their metadata travel as one directory.
  *
  * Bit-identity contract: parquet round-trips Spark's long / double /
  * string / array types exactly (IEEE doubles byte-for-byte), so a
  * loaded artifact serves results hash-identical to the live memo it
  * was saved from — ArtifactStoreSpec pins this end to end through a
  * fresh session, and the `q_trained_persist` oracle gates the loaded
  * trained index against the SAME DuckDB chain as `q_ivf_trained`.
  *
  * Publish discipline at scale: `save` overwrites in place, which is
  * atomic enough for a single-writer local run; a production lake
  * writes to a versioned path and repoints the reader (the
  * [[IndexStore]] scaladoc's swap rule). The posting-list-partitioned
  * layout (partition pruning at probe time) also stays with
  * [[IndexStore.saveIvf]]; this store is the generic whole-artifact
  * path.
  */
object ArtifactStore {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Order-free corpus fingerprint: `<rowcount>-<hex>` where the hex
    * is the exact DECIMAL(38,0) SUM of per-row xxhash64 over `cols`.
    * Addition is commutative (partitioning/order independent) and the
    * decimal sum is exact at any corpus size, so the same corpus
    * fingerprints identically on any cluster layout; any row edit,
    * insert, or delete moves it. A sum — not a bit-XOR — on purpose:
    * XOR cancels rows with even multiplicity (a double-loaded corpus
    * folds every pair to zero, and edits become invisible whenever the
    * row count is preserved), while the sum is MULTISET-sensitive —
    * duplicated rows contribute per copy. One scan, one tiny agg — the
    * cheapest integrity check that still catches "the corpus changed
    * under the index".
    */
  def fingerprint(df: DataFrame, cols: Seq[String]): String = {
    require(cols.nonEmpty, "fingerprint needs at least one column")
    val quoted = cols.map(c => "`" + c.replace("`", "``") + "`")
    val r = df.agg(
      count(lit(1)).as("n"),
      sum(expr(s"xxhash64(${quoted.mkString(", ")})")
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("x")).head()
    val n = r.getLong(0)
    val x = if (r.isNullAt(1)) "0"
      else r.getDecimal(1).toBigInteger.toString(16)
    s"$n-$x"
  }

  private def manifestPath(dir: String, artifact: String) =
    Paths.get(dir, artifact, "_graft_manifest.json")

  // ---------------------------------------------------------------------
  // Versioned publish: the multi-reader swap discipline. A single local
  // writer may save in place; a SERVED library writes each build into
  // its own vN directory and atomically repoints _LATEST afterwards, so
  // a reader resolving through latestDir never observes a half-written
  // library — per-artifact torn writes are already covered by the
  // manifest-last rule, _LATEST-last covers the library as a whole.
  // ---------------------------------------------------------------------

  private val LatestFile = "_LATEST"

  /** Directory of the most recently COMMITTED library version under
    * `root`, or None if nothing was ever published.
    */
  def latestDir(root: String): Option[String] = {
    val p = Paths.get(root, LatestFile)
    if (!Files.exists(p)) None
    else Some(Paths.get(root, Files.readString(p).trim).toString)
  }

  /** Allocate the next version directory (v1, v2, ...) under `root` —
    * write the library there, then [[commitVersion]] it. Uncommitted
    * versions are invisible to [[latestDir]] readers.
    */
  def newVersionDir(root: String): String = {
    Files.createDirectories(Paths.get(root))
    val vs = Option(new java.io.File(root).list()).getOrElse(Array.empty)
      .collect { case n if n.matches("v\\d+") => n.drop(1).toInt }
    s"$root/v${if (vs.isEmpty) 1 else vs.max + 1}"
  }

  /** Atomically repoint `root`'s readers at `versionName` (e.g. "v2"):
    * the pointer writes to a temp file and MOVEs into place, so a
    * concurrent [[latestDir]] sees either the old or the new version,
    * never a torn pointer.
    */
  def commitVersion(root: String, versionName: String): Unit = {
    require(versionName.matches("v\\d+"),
      s"versionName must look like v<N>, got '$versionName'")
    require(Files.isDirectory(Paths.get(root, versionName)),
      s"cannot commit $versionName: $root/$versionName does not exist — " +
        "write the library there first (newVersionDir)")
    val tmp = Paths.get(root, s".$LatestFile.tmp")
    Files.writeString(tmp, versionName)
    Files.move(tmp, Paths.get(root, LatestFile),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  def exists(dir: String, artifact: String): Boolean =
    Files.exists(manifestPath(dir, artifact))

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  /** Write `frame` as parquet under `dir/artifact` plus its manifest
    * (params + fingerprint + the column order `load` restores).
    * Overwrite mode: the manifest is written LAST, so a torn write
    * (killed mid-save) leaves no manifest and `exists`/`load` treat
    * the directory as absent rather than trusting partial data.
    */
  def save(frame: DataFrame, dir: String, artifact: String,
           params: Map[String, String], fp: String): Unit = {
    val path = s"$dir/$artifact"
    frame.write.mode("overwrite").parquet(path)
    val pjson = params.toSeq.sorted
      .map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString(",")
    val cjson = frame.columns.map(jstr).mkString(",")
    Files.writeString(manifestPath(dir, artifact),
      s"""{"artifact":${jstr(artifact)},"fingerprint":${jstr(fp)},""" +
        s""""params":{$pjson},"columns":[$cjson]}""")
    ()
  }

  /** Load `dir/artifact`, validating its manifest against the params
    * the consumer would build with and the CURRENT corpus fingerprint.
    * Throws [[IllegalStateException]] naming every mismatched field —
    * never silently serves a stale or misconfigured index. Returns the
    * frame with the saved column order restored (parquet preserves it,
    * the select pins it).
    */
  def load(spark: SparkSession, dir: String, artifact: String,
           expectedParams: Map[String, String], expectedFp: String): DataFrame = {
    val mf = manifestPath(dir, artifact)
    if (!Files.exists(mf))
      throw new IllegalStateException(
        s"artifact '$artifact': no manifest at $mf (not saved, or torn write)")
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(Files.readString(mf))
    def str(field: String): String = j \ field match {
      case JString(s) => s
      case _ => throw new IllegalStateException(
        s"artifact '$artifact': manifest missing '$field'")
    }
    val gotFp = str("fingerprint")
    val gotParams: Map[String, String] = j \ "params" match {
      case JObject(fields) =>
        fields.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty
    }
    val cols: Seq[String] = j \ "columns" match {
      case JArray(vs) => vs.collect { case JString(s) => s }
      case _          => Seq.empty
    }
    val problems = Seq.newBuilder[String]
    if (str("artifact") != artifact)
      problems += s"artifact name '${str("artifact")}' != '$artifact'"
    if (gotFp != expectedFp)
      problems += s"corpus fingerprint '$gotFp' != current '$expectedFp' " +
        "(corpus changed since the index was built — rebuild and re-save)"
    for (k <- (gotParams.keySet ++ expectedParams.keySet).toSeq.sorted
         if gotParams.get(k) != expectedParams.get(k))
      problems += s"param '$k': saved ${gotParams.get(k)} != " +
        s"expected ${expectedParams.get(k)}"
    val bad = problems.result()
    if (bad.nonEmpty)
      throw new IllegalStateException(
        s"artifact '$artifact' at $dir is STALE or mismatched; refusing " +
          s"to serve it: ${bad.mkString("; ")}")
    val df = spark.read.parquet(s"$dir/$artifact")
    if (cols.nonEmpty) df.select(cols.map(col): _*) else df
  }

  /** Delete old library versions, keeping the newest `keep` plus —
    * always — the committed one (readers mid-scan on _LATEST must
    * never lose their files, so the pointer's target survives even
    * when older than the keep window). Returns the deleted version
    * names. The GC a long-lived publish root needs: without it every
    * corpus version accumulates a full library copy forever (the
    * FrameMemo LRU bound's on-disk sibling).
    */
  def pruneVersions(root: String, keep: Int): Seq[String] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val committed = latestDir(root).map(d => Paths.get(d).getFileName.toString)
    val all = Option(new java.io.File(root).list()).getOrElse(Array.empty)
      .collect { case n if n.matches("v\\d+") => n }
      .sortBy(-_.drop(1).toInt)
    val doomed = all.drop(keep).filterNot(committed.contains).toSeq
    doomed.foreach { v =>
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(s"$root/$v"))
      log.warn(s"pruned library version $root/$v")
    }
    doomed
  }

  /** Names of all artifacts saved under `dir` (subdirectories holding
    * a committed manifest), sorted — the library's table of contents.
    */
  def artifacts(dir: String): Seq[String] =
    Option(new java.io.File(dir).list()).getOrElse(Array.empty)
      .filter(n => exists(dir, n)).sorted.toSeq

  private def manifestColumns(dir: String, artifact: String): Seq[String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(
      Files.readString(manifestPath(dir, artifact))) \ "columns" match {
      case JArray(vs) => vs.collect { case JString(s) => s }
      case _          => Seq.empty
    }
  }

  /** Right-to-be-forgotten audit over a PERSISTED library
    * ([[Profile.erasureAudit]] extended to the on-disk index): every
    * saved artifact whose manifest columns include one of `refCols` is
    * scanned for references to the `deleted` keys — a forgotten
    * document's MinHash signature living in a saved band index is
    * still that document's data, and an erasure pass that only scrubs
    * the corpus ships it anyway. Artifacts carrying none of the ref
    * columns hold aggregates (curves, centroids, gram cells), not row
    * references, and are skipped. One row per scanned artifact:
    * (artifact, n_rows, n_refs_deleted) — any nonzero count means the
    * library needs a rebuild from the scrubbed corpus (the
    * append-only refresh gate would refuse the drop anyway; this is
    * the audit that says WHY).
    */
  def erasureScan(spark: SparkSession, dir: String, deleted: DataFrame,
                  delKey: String, refCols: Seq[String]): DataFrame = {
    require(refCols.nonEmpty, "erasureScan needs at least one ref column")
    val scannable = artifacts(dir).flatMap { a =>
      val cols = manifestColumns(dir, a)
      val refs = refCols.filter(cols.contains)
      if (refs.isEmpty) None
      else Some((a, spark.read.parquet(s"$dir/$a"), refs))
    }
    // a library of aggregate-only artifacts legitimately holds no row
    // references: that is a CLEAN audit (zero rows reported), not an
    // error — an automated sweep over many libraries must not die here
    if (scannable.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("artifact",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_rows",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n_refs_deleted",
            org.apache.spark.sql.types.LongType))))
    else Profile.erasureAudit(deleted, delKey, scannable)
  }

  /** The saved corpus fingerprint from an artifact's manifest — what
    * the library was BUILT from (vs [[fingerprint]] of what exists
    * now). Refresh paths read it to gate against silent mutation.
    */
  def manifestFingerprint(dir: String, artifact: String): String = {
    val mf = manifestPath(dir, artifact)
    if (!Files.exists(mf))
      throw new IllegalStateException(
        s"artifact '$artifact': no manifest at $mf")
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    JsonMethods.parse(Files.readString(mf)) \ "fingerprint" match {
      case JString(s) => s
      case _ => throw new IllegalStateException(
        s"artifact '$artifact': manifest missing 'fingerprint'")
    }
  }

  /** Manifest marker distinguishing an INCREMENTALLY-GROWN library
    * from a trained-on-this-corpus build. The distinction is
    * load-bearing: a refreshed index keeps its FROZEN centroids, so
    * its search results differ from a retrain on the grown corpus —
    * valid to serve, but NOT interchangeable where a consumer (the
    * oracle-gated query surface) expects the retrained artifact. The
    * extra param makes a plain [[load]] with build params loud-fail on
    * a refreshed library; consumers opt in by expecting the marker.
    */
  val LineageKey = "lineage"
  val LineageIncremental = "incremental"

  /** Load for a REFRESH: params still validate (a k=16 library must
    * not grow under k=32 expectations) but the corpus fingerprint is
    * deliberately NOT checked — the corpus has grown, that is the
    * point. Accepts both fresh-built and previously-refreshed
    * libraries (the lineage marker rides along on re-refresh). Callers
    * MUST apply their own already-indexed-rows gate (see
    * [[incrementalIvfRefresh]]); serving paths use [[load]].
    */
  private def loadForRefresh(spark: SparkSession, dir: String,
      artifact: String, expectedParams: Map[String, String]): DataFrame = {
    val fp = manifestFingerprint(dir, artifact)
    try load(spark, dir, artifact, expectedParams, fp)
    catch {
      case _: IllegalStateException =>
        // the core params still fully validate on this path — only the
        // lineage marker from an earlier refresh is additionally allowed
        load(spark, dir, artifact,
          expectedParams + (LineageKey -> LineageIncremental), fp)
    }
  }

  /** Grow a PERSISTED trained-IVF library by O(new vectors), without
    * retraining and without re-scoring anything already indexed — the
    * storage half of the frozen-centroid contract
    * ([[Similarity.assignToCentroids]]'s `centroids` path /
    * `q_trained_incr`): new rows (present in `corpus`, absent from the
    * saved assignment) score against the FROZEN saved centroids and
    * append; both manifests re-stamp to the grown corpus's
    * fingerprint so subsequent [[load]]s validate against what now
    * exists.
    *
    * SAFETY GATE — the property that keeps "incremental" from meaning
    * "silently stale": growth must be APPEND-ONLY over the indexed
    * rows. The gate re-fingerprints `corpus` RESTRICTED to the
    * already-indexed ids and compares it to the fingerprint the
    * library was built from (XOR-fold over per-row hashes = set
    * equality); any mutated or dropped indexed row loud-fails the
    * refresh, because its saved assignment would no longer describe
    * the corpus. Cost: one scan-level semi join — no re-scoring.
    *
    * Work: O(corpus scan) for the gate + anti join, O(new · k) for
    * scoring — vs the full rebuild's O(corpus · k · (iters+1)).
    * Returns (rows already indexed, new rows appended).
    */
  /** The shared APPEND-ONLY GATE of the incremental refreshers: load
    * the library's per-row gate artifact, verify the grown corpus
    * restricted to the already-indexed ids still fingerprints to what
    * the library was built from (XOR-free multiset sum = set equality
    * on the indexed rows), and split out the new rows. One definition
    * of the safety rule, used by every refresh family. Skinny id
    * columns only; no broadcast hint — the indexed set is corpus-sized
    * at scale, these are shuffle semi/anti joins by design.
    */
  private def appendOnlyGate(spark: SparkSession, dir: String,
      gateArtifact: String, gateParams: Map[String, String],
      corpus: DataFrame, idCol: String, libIdCol: String,
      fpCols: Seq[String]): (DataFrame, DataFrame) = {
    val old = loadForRefresh(spark, dir, gateArtifact, gateParams)
    val oldFp = manifestFingerprint(dir, gateArtifact)
    val indexedIds = old.select(col(libIdCol))
    val indexedNow = corpus
      .join(indexedIds, corpus(idCol) === indexedIds(libIdCol), "left_semi")
    val fpIndexed = fingerprint(indexedNow, fpCols)
    if (fpIndexed != oldFp)
      throw new IllegalStateException(
        s"incremental refresh at $dir refused: the already-indexed rows " +
          s"are not byte-identical in the grown corpus (indexed-subset " +
          s"fingerprint '$fpIndexed' != library's '$oldFp') — a mutated " +
          "or dropped indexed row needs a REBUILD, not an append")
    val newRows = corpus
      .join(indexedIds, corpus(idCol) === indexedIds(libIdCol), "left_anti")
    (old, newRows)
  }

  def incrementalIvfRefresh(spark: SparkSession, dir: String,
      corpus: DataFrame, params: Map[String, String], newFp: String,
      dim: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): (Long, Long) = {
    // eager checkpoint: the re-stamp save() below overwrites the very
    // directory this frame reads (k rows — trivial to materialize)
    val cent = loadForRefresh(spark, dir, "kmeans_cent", params)
      .localCheckpoint()
    val (oldAssign, newRows) = appendOnlyGate(spark, dir, "kmeans_assign",
      params, corpus, idCol, "vec_id", Seq(idCol, vecCol))
    val newAssign = Similarity.assignToCentroids(newRows, dim = dim,
        idCol = idCol, vecCol = vecCol,
        centroids = Some(cent.select(col("centroid_id"), col("centv"))))
      .select(oldAssign.columns.map(col): _*)
    // eager checkpoint BEFORE the overwrite: `grown` reads the very
    // parquet files save() is about to delete
    val grown = oldAssign.unionByName(newAssign).localCheckpoint()
    val nOld = oldAssign.count()
    val nAll = grown.count()
    val stamped = params + (LineageKey -> LineageIncremental)
    save(grown, dir, "kmeans_assign", stamped, newFp)
    save(cent, dir, "kmeans_cent", stamped, newFp)
    log.info(s"incremental IVF refresh at $dir: $nOld indexed, " +
      s"${nAll - nOld} appended")
    (nOld, nAll - nOld)
  }

  /** The MinHash twin of [[incrementalIvfRefresh]]: grow a persisted
    * signature + band library by O(new documents). Signatures and band
    * keys are PER-ROW pure functions of the text (the property the
    * operator-level `minhashLshIncremental` already leans on), so new
    * docs' rows append and indexed docs' rows are untouched — same
    * append-only safety gate, same manifest re-stamp. `fpCols` names
    * the document columns the library's fingerprints were computed
    * over. Returns (docs already indexed, new docs appended).
    */
  def incrementalMinhashRefresh(spark: SparkSession, dir: String,
      docs: DataFrame, params: Map[String, String], newFp: String,
      fpCols: Seq[String], numHashes: Int = 16, bands: Int = 2,
      idCol: String = "doc_id", textCol: String = "text"): (Long, Long) = {
    val oldBands = loadForRefresh(spark, dir, "mh_bands", params)
    // one safety rule, one definition: the same gate the IVF family runs
    val (oldSigs, newDocs) = appendOnlyGate(spark, dir, "mh_sigs",
      Map("numHashes" -> numHashes.toString), docs, idCol, "doc_id", fpCols)
    val newSigs = Dedup.minhashSignatureFrame(newDocs, numHashes,
        idCol, textCol)
      .select(oldSigs.columns.map(col): _*)
    val newBands = Dedup.minhashBandsWithKeys(newDocs, numHashes, bands,
        idCol, textCol, sigIndex = Some(newSigs))
      .select(oldBands.columns.map(col): _*)
    val grownSigs = oldSigs.unionByName(newSigs).localCheckpoint()
    val grownBands = oldBands.unionByName(newBands).localCheckpoint()
    val nOld = oldSigs.count()
    val nAll = grownSigs.count()
    save(grownSigs, dir, "mh_sigs",
      Map("numHashes" -> numHashes.toString,
        LineageKey -> LineageIncremental), newFp)
    save(grownBands, dir, "mh_bands",
      params + (LineageKey -> LineageIncremental), newFp)
    log.info(s"incremental MinHash refresh at $dir: $nOld indexed, " +
      s"${nAll - nOld} appended")
    (nOld, nAll - nOld)
  }
}
