package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming half of the ANN index lifecycle: a deployed IVF index is
  * built in batch ([[graft.ops.Similarity.assignToCentroids]] /
  * [[graft.ops.Similarity.kmeans]]), then LIVES under a vector
  * firehose — new embeddings must join posting lists without a
  * re-index, and the operator feeding the "when to rebuild" decision
  * ([[graft.queries.ExtensionQueries]]'s index-health report) must see
  * list loads as they drift, not at the next audit.
  *
  * Both ops keep the streaming side trivial on purpose: assignment is
  * a pure projection (frozen in-plan centroids — no stream-static
  * join to re-plan, no state), and load monitoring is one windowed
  * aggregation with watermark-bounded state. At 100 TB-scale ingest
  * the micro-batch work is embarrassingly parallel per arriving
  * partition.
  */
object VectorStreamOps {

  /** STREAMING IVF assignment: tag each arriving vector with its
    * nearest frozen centroid — the incremental posting-list append.
    * Downstream, `writeStream.partitionBy("centroid_id")` lands
    * arrivals directly into per-list files, so the batch searcher's
    * equi-join on centroid_id keeps reading the same layout it was
    * built on. Bit-identical to the batch incremental path
    * ([[graft.ops.Similarity.assignToCentroids]] with frozen
    * `centroids` — spec-pinned), because a vector must land in the
    * SAME list whether it arrived in the bootstrap corpus or on the
    * stream.
    */
  def streamingIvfAssign(vecs: DataFrame,
                         centroids: Seq[(Long, Seq[Double])],
                         dim: Int = 64,
                         idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame =
    graft.ops.Similarity.assignFrozen(vecs, centroids, dim, idCol, vecCol)

  /** Live posting-list load: tumbling-window arrival counts per
    * centroid list — the streaming feed of the index-health report's
    * size distribution. A list whose arrival share keeps exceeding
    * `alertPpm` (parts-per-million of `expectedPerWindow`, the
    * rebuild-trigger threshold the pipeline owner calibrates from the
    * batch health report) flags `hot` — the signal that the frozen
    * quantizer no longer fits the data distribution and a re-train
    * ([[graft.ops.Similarity.kmeans]]) is due.
    *
    * One stateful operator only (counts per window x list, state
    * bounded by the watermark); the cross-list share math that needs
    * window TOTALS is deliberately left to the batch report over the
    * sink table — chaining a second streaming aggregation would
    * double the state for a number the rebuild decision reads
    * off-line anyway.
    */
  def streamingListLoads(assigned: DataFrame,
                         expectedPerWindow: Long,
                         alertPpm: Long = 200000L,
                         window_ : String = "10 minutes",
                         lateness: String = "10 minutes",
                         tsCol: String = "ts"): DataFrame = {
    require(expectedPerWindow > 0, "expectedPerWindow must be > 0")
    assigned
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), window_), col("centroid_id"))
      .agg(count(lit(1)).as("n_items"))
      .withColumn("hot",
        col("n_items") * 1000000L > lit(alertPpm) * lit(expectedPerWindow))
  }

  /** LIVE rebuild decision — the streaming twin of
    * [[graft.ops.Profile.rebuildDecision]]: arriving assignments join
    * the BATCH index-health report's skew flags (a static, list-sized
    * frame — broadcast into every micro-batch), then the same windowed
    * count as [[streamingListLoads]] emits the per-(window, list)
    * action the moment a window closes: `split_now` for an oversized
    * list taking hot traffic, `rebalance` for oversized-but-cold,
    * `replicate` for hot-but-balanced, `ok` otherwise.
    *
    * Shape: the static join runs BEFORE the aggregation (skewed is a
    * per-list constant, so it rides the group key) — one stateful
    * operator total, state bounded by the watermark, and no
    * join-after-aggregation dependence. Hot uses the same calibrated
    * `alertPpm` x `expectedPerWindow` threshold as
    * [[streamingListLoads]] (cross-list window totals stay a batch
    * concern). Lists absent from the health frame (born after the
    * last audit) count as not-skewed: brand-new lists can flag
    * `replicate` at worst, and the next batch audit picks them up.
    */
  def streamingRebuildDecision(assigned: DataFrame, health: DataFrame,
                               expectedPerWindow: Long,
                               alertPpm: Long = 200000L,
                               window_ : String = "10 minutes",
                               lateness: String = "10 minutes",
                               tsCol: String = "ts"): DataFrame = {
    require(expectedPerWindow > 0, "expectedPerWindow must be > 0")
    val flags = broadcast(
      health.select(col("list_key"), col("skewed")))
    assigned
      .withColumn("list_key", col("centroid_id").cast("string"))
      .join(flags, Seq("list_key"), "left")
      .withColumn("skewed", coalesce(col("skewed"), lit(false)))
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), window_), col("list_key"), col("skewed"))
      .agg(count(lit(1)).as("n_arrivals"))
      .withColumn("hot",
        col("n_arrivals") * 1000000L > lit(alertPpm) * lit(expectedPerWindow))
      .withColumn("decision",
        when(col("skewed") && col("hot"), "split_now")
          .when(col("skewed"), "rebalance")
          .when(col("hot"), "replicate")
          .otherwise("ok"))
  }
}
