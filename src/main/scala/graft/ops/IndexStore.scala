package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ANN index as a LAKE ARTIFACT: the session memos
  * ([[graft.queries.ExtensionQueries]]'s shared frames) die with the
  * session, but a deployed service builds its index once and serves
  * it for days — so the index must round-trip through storage. The
  * posting-list layout IS the partitioning: writing the assignment
  * Hive-partitioned by `centroid_id` makes each posting list its own
  * directory, so a probe of `nprobe` lists plans PartitionFilters and
  * reads exactly `nprobe` directories out of thousands — the
  * file-skipping form of the in-memory equi-join, and the reason IVF
  * search cost stays independent of corpus size on disk too
  * (spec-pinned: the loaded index's probe plan carries the partition
  * filter, and search results are bit-identical to the live memo's).
  */
object IndexStore {

  /** Persist an [[Similarity.assignToCentroids]]-shaped assignment
    * (vec_id, centroid_id, cv, cn) with one directory per posting
    * list. Overwrites — index publish is an atomic swap at the
    * directory level (write to a versioned path, repoint the reader).
    */
  def saveIvf(assignment: DataFrame, dir: String): Unit =
    assignment.select("vec_id", "centroid_id", "cv", "cn")
      .write.mode("overwrite").partitionBy("centroid_id").parquet(dir)

  /** Load a saved index back into the [[Similarity.ivfTopK]]
    * `corpusAssigned` contract (column order normalized — the
    * partition column comes back last and typed by discovery).
    */
  def loadIvf(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .select(col("vec_id"), col("centroid_id").cast("long"),
        col("cv"), col("cn"))

  /** Persist trained PQ artifacts (codebooks + codes) next to the
    * coarse index — the other half of a served IVF-PQ index.
    */
  def savePq(codebooks: DataFrame, codes: DataFrame, dir: String): Unit = {
    codebooks.write.mode("overwrite").parquet(s"$dir/codebooks")
    codes.write.mode("overwrite").parquet(s"$dir/codes")
  }

  def loadPq(spark: SparkSession, dir: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/codebooks"),
      spark.read.parquet(s"$dir/codes"))

  /** File census of a saved posting-list store: rows and ACTUAL file
    * count per centroid directory. Streaming ingest
    * (`foreachBatch` → partitioned append, the stream-to-lake path)
    * writes one file per (micro-batch, posting list) — after a day of
    * 30 s triggers a list holds ~2,880 shards and every probe pays
    * 2,880 footer reads for one list's worth of rows. This audit is
    * the signal; [[compact]] is the response. One column-pruned scan
    * (centroid_id + file name), partial-agged map-side.
    */
  def fileAudit(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .select(col("centroid_id").cast("long").as("centroid_id"),
        input_file_name().as("f"))
      .groupBy("centroid_id")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("f")).as("n_files"))

  /** The compaction PLAN: per posting list, the file count the store
    * SHOULD have at `targetRowsPerFile` — exact integer ceiling, no
    * filesystem access (computable from the assignment alone, which
    * is what makes it oracle-checkable and lets a scheduler plan
    * compaction for an index it has not mounted).
    */
  def compactionPlan(assignment: DataFrame,
                     targetRowsPerFile: Long): DataFrame = {
    require(targetRowsPerFile >= 1, "targetRowsPerFile must be >= 1")
    assignment
      .groupBy(col("centroid_id").cast("long").as("centroid_id"))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("files_target",
        expr(s"(n_rows + ${targetRowsPerFile - 1L}) DIV $targetRowsPerFile"))
  }

  /** The maintenance DECISION surface: actual file census joined with
    * the compaction plan, one row per list with the action a
    * scheduler takes — `compact` when the list holds more files than
    * the plan allows, `ok` otherwise. This is the same predicate
    * [[compact]] applies internally, exposed so an operator can see
    * (and a spec can pin) WHAT a maintenance run would rewrite before
    * running it — the store-side sibling of the index advisor's
    * `index_action` column.
    */
  def maintenanceReport(spark: SparkSession, dir: String,
                        targetRowsPerFile: Long): DataFrame = {
    require(targetRowsPerFile >= 1, "targetRowsPerFile must be >= 1")
    fileAudit(spark, dir)
      .withColumn("files_target",
        expr(s"(n_rows + ${targetRowsPerFile - 1L}) DIV $targetRowsPerFile"))
      .withColumn("action",
        when(col("n_files") > col("files_target"), lit("compact"))
          .otherwise(lit("ok")))
  }

  /** Surgical right-to-be-forgotten on a saved posting-list store:
    * REMOVE the given vectors by rewriting only the lists that contain
    * them — the execution half of the erasure story
    * ([[ArtifactStore.erasureScan]] is the audit half; a derived
    * LIBRARY rebuilds from the scrubbed corpus, but the lake store is
    * per-row pure, so it can forget in place at O(affected lists)).
    * One column-pruned scan locates the affected lists; survivors
    * rewrite under dynamic partition overwrite (untouched directories
    * keep their files byte-for-byte, same discipline as [[compact]]);
    * a list whose every row is forgotten gets its DIRECTORY removed —
    * dynamic overwrite only replaces partitions present in the
    * written data, and an emptied list writes nothing, so without the
    * explicit delete its stale files would silently survive (the
    * exact failure an erasure pass exists to prevent). Same
    * single-writer contract as [[compact]].
    *
    * Returns (centroid_id, n_forgotten, n_left) per affected list.
    */
  def forget(spark: SparkSession, dir: String,
             deleted: Seq[Long]): DataFrame = {
    require(deleted.nonEmpty, "forget needs at least one id")
    import spark.implicits._
    val hits = spark.read.parquet(dir)
      .filter(col("vec_id").isin(deleted: _*))
      .groupBy(col("centroid_id").cast("long").as("centroid_id"))
      .agg(count(lit(1)).as("n_forgotten"))
      .as[(Long, Long)].collect()
    if (hits.isEmpty)
      return Seq.empty[(Long, Long, Long)]
        .toDF("centroid_id", "n_forgotten", "n_left")
    val lists = hits.map(_._1)
    val keep = spark.read.parquet(dir)
      .filter(col("centroid_id").isin(lists.toIndexedSeq: _*) &&
        !col("vec_id").isin(deleted: _*))
      .select("vec_id", "centroid_id", "cv", "cn")
      .localCheckpoint()
    val left = keep.groupBy(col("centroid_id").cast("long"))
      .count().as[(Long, Long)].collect().toMap
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      keep.repartition(lists.length, col("centroid_id"))
        .write.mode("overwrite").partitionBy("centroid_id").parquet(dir)
    } finally {
      prevMode match {
        case Some(m) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    // fully-forgotten lists wrote no replacement partition: their old
    // directories must go explicitly or the forgotten rows survive.
    // Delete through the Hadoop FileSystem (resolved from the path, so
    // hdfs:// and s3a:// stores work, matching how spark.read resolves
    // it) and FAIL LOUDLY on a false return — a silently-failed delete
    // here means the forgotten rows come back on the next scan, the
    // exact outcome an erasure pass must never report as success.
    lists.filterNot(left.contains).foreach { id =>
      val p = new org.apache.hadoop.fs.Path(s"$dir/centroid_id=$id")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p) && !fs.delete(p, true))
        throw new java.io.IOException(
          s"forget: failed to remove emptied posting list $p — " +
            "forgotten rows would survive; aborting so the failure is visible")
    }
    hits.toSeq
      .map { case (id, n) => (id, n, left.getOrElse(id, 0L)) }
      .toDF("centroid_id", "n_forgotten", "n_left")
  }

  /** Compact ONLY the fragmented posting lists of a saved store —
    * the OPTIMIZE pass the streaming-append layout needs. A list is
    * fragmented when its actual file count exceeds the
    * [[compactionPlan]] target; those lists (and only those) are
    * read back (partition-pruned scan), clustered one-task-per-list
    * (`repartition` on the partition column — every row of a list
    * lands in one task, so the rewrite emits exactly
    * ceil(rows/target) files via `maxRecordsPerFile`), and swapped in
    * with DYNAMIC partition overwrite: untouched directories keep
    * their files byte-for-byte, so compaction cost is
    * O(fragmented lists), never O(index). The rewrite set is
    * materialized before the overwrite (same read-then-replace
    * discipline as the FrameMemo checkpoints) because Spark refuses
    * to overwrite a path it is still lazily reading.
    *
    * Concurrency contract: the in-place rewrite is for the
    * SINGLE-WRITER loop (same stance as the flat artifact dirs) — a
    * reader scanning a list mid-swap could see its files vanish. A
    * multi-reader deployment runs compaction under the same versioned
    * publish discipline as the library ([[ArtifactStore.commitVersion]]):
    * compact into v(N+1) and repoint `_LATEST`, readers never observe
    * a half-state.
    *
    * Returns the per-list summary (centroid_id, n_rows, files_before,
    * files_after) of what was rewritten — empty means the store
    * already met the target.
    */
  def compact(spark: SparkSession, dir: String,
              targetRowsPerFile: Long): DataFrame =
    compact(spark, dir, targetRowsPerFile, clusterBy = None)

  /** [[compact]] with an optional CLUSTERING column: rows inside each
    * rewritten posting list are sorted by `clusterBy` before the
    * `maxRecordsPerFile` split, so consecutive files carry DISJOINT
    * min/max ranges of that column and a point lookup (`vec_id = ?`
    * inside a probed list) skips every file but one on parquet
    * footer stats — the OPTIMIZE-and-cluster maintenance shape.
    * Sorting is per-list and within one task (the list already fits a
    * task by the posting-list size bound); no extra shuffle.
    */
  def compact(spark: SparkSession, dir: String, targetRowsPerFile: Long,
              clusterBy: Option[String]): DataFrame = {
    require(targetRowsPerFile >= 1, "targetRowsPerFile must be >= 1")
    // posting-list ids are bounded by the quantizer's k (trained) or
    // the stride rule — the same broadcast-side bound every IVF
    // consumer relies on, so the driver-side collect is safe
    val frag = maintenanceReport(spark, dir, targetRowsPerFile)
      .filter(col("action") === "compact")
      .select("centroid_id", "n_rows", "n_files", "files_target")
      .collect()
    if (frag.isEmpty) {
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        new org.apache.spark.sql.types.StructType()
          .add("centroid_id", "long").add("n_rows", "long")
          .add("files_before", "long").add("files_after", "long"))
    }
    val fragIds = frag.map(_.getLong(0))
    val rewrite = spark.read.parquet(dir)
      .filter(col("centroid_id").isin(fragIds.toIndexedSeq: _*))
      .select("vec_id", "centroid_id", "cv", "cn")
      .localCheckpoint()
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val clustered = rewrite.repartition(fragIds.length, col("centroid_id"))
      clusterBy.fold(clustered) { c =>
          clustered.sortWithinPartitions(col("centroid_id"), col(c))
        }
        .write.mode("overwrite")
        .option("maxRecordsPerFile", targetRowsPerFile)
        .partitionBy("centroid_id")
        .parquet(dir)
    } finally {
      prevMode match {
        case Some(m) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    import spark.implicits._
    // files_after is RE-MEASURED from the rewritten store, not echoed
    // from the plan: if a writer config ever made maxRecordsPerFile
    // ineffective, the summary must report the real file count, not
    // claim the plan succeeded (the spec pins measured == plan today,
    // which is exactly what makes a future divergence loud). Bounded:
    // fragIds is posting-list-bounded, the audit scan partition-prunes.
    val after = fileAudit(spark, dir)
      .filter(col("centroid_id").isin(fragIds.toIndexedSeq: _*))
      .select("centroid_id", "n_files")
      .as[(Long, Long)].collect().toMap
    frag.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        after.getOrElse(r.getLong(0), 0L)))
      .toDF("centroid_id", "n_rows", "files_before", "files_after")
  }
}
