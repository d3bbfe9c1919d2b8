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

  /** Declared schema of decoded media metadata. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)
  ))

  /** STUB decode: deterministic fake features of a media payload.
    * A real implementation would be `??? // decode via codec lib`;
    * the fake keeps tests runnable and reproducible.
    */
  def decodeStub(bytes: Array[Byte]): Row = {
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

  /** Frame-sampling plumbing: explode a video-ish payload into
    * `n_frames` (stubbed) frame descriptors — demonstrates the
    * row-explosion path (sample every k-th frame) without a codec.
    */
  def sampleFrames(df: DataFrame, binCol: String, everyK: Int): DataFrame = {
    val withMeta = df.select(
      (df.columns.map(col) ++ metaColumns(col(binCol))): _*)
    withMeta
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))))
      .withColumn("frame_hash",
        md5(concat(col(binCol).cast("string"), lit(":"), col("frame_idx"))))
  }
}
