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
}
