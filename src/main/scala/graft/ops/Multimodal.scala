package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing — north-star extension (BASELINE.json).
  *
  * Media (image/audio/video) travels as an opaque `binary` column plus
  * typed metadata. The Spark-side contract — schema, batched
  * per-partition processing, deterministic output — is real and
  * tested; the actual codec call is STUBBED (this container has no
  * image/audio libraries): [[decodeStub]] derives deterministic fake
  * "decoded" features from the bytes. Swap [[decodeStub]] for a real
  * decoder (JNI/javacpp ffmpeg, ImageIO, ...) without touching any
  * plumbing.
  *
  * Scale design: decode runs as an Iterator→Iterator `mapPartitions`
  * (the Scala analog of `mapInPandas` batching) so one task holds one
  * partition's codec context, never the whole partition materialized;
  * binary payloads stay columnar in parquet and are never shuffled —
  * repartition happens BEFORE attaching heavy decoded columns.
  */
object Multimodal {

  /** Declared schema of decoded media metadata (nullable: a null
    * payload decodes to null meta, matching the expression twin).
    */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true)
  ))

  /** STUB decode: deterministic fake features of a media payload.
    * A real implementation would be `??? // decode via codec lib`;
    * the fake keeps tests runnable and reproducible. Null payloads
    * yield null meta — same null semantics as [[metaColumns]].
    */
  def decodeStub(bytes: Array[Byte]): Row = {
    if (bytes == null) return Row(null, null, null, null)
    val n = bytes.length.toLong
    Row(n, (n % 640).toInt, ((n * 31) % 480).toInt, (n % 30 + 1).toInt)
  }

  /** Attach decoded-media metadata to a DataFrame with a binary
    * column. Batched per partition; output schema = input ++ meta.
    */
  def decodeMeta(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ mediaMetaSchema.fields)
    val binIdx = df.schema.fieldIndex(binCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // one codec context per partition would be opened here
      rows.map { r =>
        val meta = decodeStub(r.getAs[Array[Byte]](binIdx))
        Row.fromSeq(r.toSeq ++ meta.toSeq)
      }
    }
    df.sparkSession.createDataFrame(rdd, outSchema)
  }

  /** Pure-expression twin of [[decodeMeta]]'s stub — same fake
    * features computed in codegen'd SQL expressions, used by the
    * DuckDB-oracle query to validate the plumbing end-to-end.
    */
  def metaColumns(bin: Column): Seq[Column] = {
    val n = length(bin).cast("long")
    Seq(
      n.as("n_bytes"),
      (n % 640).cast("int").as("width"),
      ((n * 31) % 480).cast("int").as("height"),
      (n % 30 + 1).cast("int").as("n_frames"))
  }

  /** Resize plumbing: a metadata-level resize-to-fit (max edge) that
    * preserves the stubbed aspect ratio with integer arithmetic —
    * deterministic in any engine. A real implementation would resize
    * pixels in the per-partition decode pass; the dimension math here
    * is the part the pipeline schema depends on.
    */
  def resizeMeta(df: DataFrame, maxEdge: Int): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val scaleNum = lit(maxEdge)
    df.withColumn("out_width",
        when(longest <= maxEdge, col("width"))
          .otherwise((col("width") * scaleNum / longest).cast("int")))
      .withColumn("out_height",
        when(longest <= maxEdge, col("height"))
          .otherwise((col("height") * scaleNum / longest).cast("int")))
  }

  /** STUB feature extraction: a deterministic 4-dim feature vector
    * from the payload bytes (prime-modular arithmetic on the length —
    * a real extractor would run the model in the mapPartitions pass).
    * Expression form, so it composes with [[metaColumns]].
    */
  def featureColumns(bin: Column, dims: Int = 4): Seq[Column] = {
    val primes = Seq(31L, 37L, 41L, 43L, 47L, 53L, 59L, 61L)
    val n = length(bin).cast("long")
    (0 until dims).map(d =>
      (((n * primes(d % primes.length)) % 1000L).cast("double") / 1000.0)
        .as(s"f$d"))
  }

  /** RDD twin of [[featureColumns]] — same math in the per-partition
    * decode pass (where a real model would batch-infer).
    */
  def featureStub(bytes: Array[Byte], dims: Int = 4): Seq[Double] = {
    val primes = Seq(31L, 37L, 41L, 43L, 47L, 53L, 59L, 61L)
    val n = bytes.length.toLong
    (0 until dims).map(d => ((n * primes(d % primes.length)) % 1000L).toDouble / 1000.0)
  }

  /** Frame-sampling plumbing: explode a video-ish payload into
    * `n_frames` (stubbed) frame descriptors — demonstrates the
    * row-explosion path (sample every k-th frame) without a codec.
    */
  def sampleFrames(df: DataFrame, binCol: String, everyK: Int): DataFrame = {
    val withMeta = df.select(
      (df.columns.toIndexedSeq.map(col) ++ metaColumns(col(binCol))): _*)
    withMeta
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))))
      .withColumn("frame_hash",
        md5(concat(col(binCol).cast("string"), lit(":"), col("frame_idx"))))
  }
}
