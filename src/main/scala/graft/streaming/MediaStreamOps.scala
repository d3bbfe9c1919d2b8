package graft.streaming

import graft.ops.Multimodal
import org.apache.spark.sql.Dataset

/** Streaming media ingestion — the live twin of the batch
  * `Multimodal.decode*Meta` attach path. The batch decoders ride
  * `df.rdd.mapPartitions`, which Structured Streaming cannot plan;
  * the TYPED `Dataset.mapPartitions` is stateless and
  * streaming-capable, so the same decode functions gate a live media
  * feed row-by-row with zero state and zero shuffle. Both paths call
  * the ONE decoder, so the live gate and the batch re-audit can never
  * disagree on a payload.
  */
object MediaStreamOps {

  /** Per-file audio audit row: decode stats (None where the payload
    * degraded) plus the gate verdict.
    */
  final case class AudioAudit(ts: java.sql.Timestamp, doc_id: Long,
                              n_samples: Option[Long],
                              peak: Option[Double],
                              rms: Option[Double],
                              dc_offset: Option[Double],
                              clip_ratio: Option[Double],
                              silence_ratio: Option[Double],
                              pass: Boolean)

  /** LIVE audio ingest gate: REAL PCM sample decode
    * ([[Multimodal.decodePcmStats]]) on every arriving payload, with
    * the accept/reject verdict a pipeline applies before a clip ever
    * lands in the lake — undecodable (compressed/foreign/truncated-
    * to-nothing) payloads fail closed, as do clips below the sample
    * floor, above the clipping ceiling, or above the silence ceiling.
    * Stateless per-row work: emits in the same micro-batch, no
    * watermark needed; downstream windowed monitors (e.g. reject-rate
    * per source) compose on top the usual way.
    */
  def streamingAudioGate(
      files: Dataset[(java.sql.Timestamp, Long, Array[Byte])],
      minSamples: Long = 1L,
      maxClipRatio: Double = 0.01,
      maxSilenceRatio: Double = 0.9): Dataset[AudioAudit] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      it.map { case (ts, id, bytes) =>
        val r = Multimodal.decodePcmStats(bytes)
        def optL(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        def optD(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
        // an empty-but-valid clip (n_samples = 0) carries null ratios:
        // the sample floor rejects it before the ratio tests can pass
        val pass = !r.isNullAt(0) && r.getLong(0) >= minSamples &&
          !r.isNullAt(4) && r.getDouble(4) <= maxClipRatio &&
          !r.isNullAt(5) && r.getDouble(5) <= maxSilenceRatio
        AudioAudit(ts, id, optL(0), optD(1), optD(2), optD(3), optD(4),
          optD(5), pass)
      }
    }
  }

  /** Per-file image audit row — [[AudioAudit]]'s image twin. */
  final case class ImageAudit(ts: java.sql.Timestamp, doc_id: Long,
                              width: Option[Int],
                              height: Option[Int],
                              n_pixels: Option[Long],
                              dark_ratio: Option[Double],
                              pass: Boolean)

  /** LIVE image ingest gate: REAL `ImageIO` pixel decode
    * ([[Multimodal.decodeImagePixels]]) per arriving payload —
    * unreadable payloads and degenerate or dark-dominated images fail
    * closed. Same stateless typed-mapPartitions shape as
    * [[streamingAudioGate]].
    */
  def streamingImageGate(
      files: Dataset[(java.sql.Timestamp, Long, Array[Byte])],
      minEdge: Int = 1,
      maxDarkRatio: Double = 0.95): Dataset[ImageAudit] = {
    import files.sparkSession.implicits._
    files.mapPartitions { it =>
      it.map { case (ts, id, bytes) =>
        val r = Multimodal.decodeImagePixels(bytes)
        def optI(i: Int) = if (r.isNullAt(i)) None else Some(r.getInt(i))
        def optL(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
        def optD(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
        val pass = !r.isNullAt(0) && r.getInt(0) >= minEdge &&
          r.getInt(1) >= minEdge &&
          !r.isNullAt(6) && r.getDouble(6) <= maxDarkRatio
        ImageAudit(ts, id, optI(0), optI(1), optL(2), optD(6), pass)
      }
    }
  }
}
