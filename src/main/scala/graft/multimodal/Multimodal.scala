package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns next to typed metadata,
  * and per-item decode/feature ops run as partition-local batch functions.
  *
  * The actual codec step is STUBBED (this environment ships no image/audio
  * libraries): `decodeStub` derives deterministic fake pixel stats from the
  * bytes. Everything around it — schema, batching, partition-local
  * execution, frame sampling, metadata propagation — is the real Spark
  * plumbing a production decode would use; swapping the stub for a JNI/
  * library call changes only the function body.
  *
  * Scale: all ops are narrow (mapPartitions-shaped, no shuffle); payloads
  * never pass through a wide transformation, so 100 TB of media shards
  * stream through executors partition by partition.
  */
object Multimodal {

  /** Canonical media-record schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType), // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("sample_rate", IntegerType))))))

  /** Wrap any frame with a binary payload column into the media schema,
    * synthesizing deterministic metadata from the payload bytes.
    */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String): DataFrame =
    df.select(
      col(idCol).cast(LongType).as("media_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).cast(BinaryType).as("content"))
      .withColumn("meta", struct(
        (pmod(xxhash64(col("content")), lit(512L)) + 32).cast(IntegerType)
          .as("width"),
        (pmod(xxhash64(col("content"), lit(1L)), lit(512L)) + 32)
          .cast(IntegerType).as("height"),
        (pmod(xxhash64(col("content"), lit(2L)), lit(240L)) + 1)
          .cast(IntegerType).as("n_frames"),
        lit(16000).as("sample_rate")))

  /** STUB decode: deterministic per-item "pixel statistics" from payload
    * bytes — a real implementation would decode via an image library here;
    * the signature (bytes in, fixed-width numeric features out, executed
    * per partition batch) is what production code keeps.
    */
  final case class DecodedStats(
      n_bytes: Int, mean_byte: Double, checksum01: Double)

  /** The deterministic fake "pixel statistics" fold shared by the scalar
    * UDF and the batched decoder.
    */
  private def foldStats(content: Array[Byte]): DecodedStats = {
    var h = 1125899906842597L // FNV-ish deterministic fold
    var sum = 0L; var i = 0
    while (i < content.length) {
      h = h * 31 + content(i); sum += content(i) & 0xFF; i += 1
    }
    DecodedStats(content.length,
      if (content.length == 0) 0.0 else sum.toDouble / content.length,
      (h & Long.MaxValue).toDouble / Long.MaxValue)
  }

  val decodeStub: UserDefinedFunction =
    udf((content: Array[Byte]) =>
      if (content == null) null else foldStats(content))

  /** "Decode" every item: adds a `decoded` struct (stubbed stats). */
  def decode(media: DataFrame): DataFrame =
    media.withColumn("decoded", decodeStub(col("content")))

  /** One decoded batch row (see [[decodeBatched]]); stats are None for a
    * null payload, matching the scalar path's null decoded struct.
    */
  final case class DecodedRow(media_id: Long, media_type: String,
      n_bytes: Option[Int], mean_byte: Option[Double],
      checksum01: Option[Double])

  /** Batched decode via `mapPartitions` — the Scala analogue of the
    * `mapInPandas` batch shape: the codec sees an iterator of items per
    * partition and amortizes per-batch setup (model load, codec context)
    * across `batchSize` items instead of paying it per row. The stub's
    * "setup" is a no-op, but the batching skeleton (grouped iterator,
    * per-batch context, streaming output — never materializing a whole
    * partition) is exactly what a production decoder keeps.
    */
  def decodeBatched(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch context would be created here (codec, model, ...)
          batch.iterator.map { case (id, tpe, content) =>
            if (content == null) DecodedRow(id, tpe, None, None, None)
            else {
              val s = foldStats(content)
              DecodedRow(id, tpe, Some(s.n_bytes), Some(s.mean_byte),
                Some(s.checksum01))
            }
          }
        }
      }.toDF()
  }

  /** Deterministic fake embedding from the payload (stand-in for a model
    * forward pass), as Array[Float] matching the `embeddings` table shape.
    */
  def featureExtract(media: DataFrame, dim: Int = 64): DataFrame =
    media.withColumn("embedding",
      transform(sequence(lit(0), lit(dim - 1)),
        i => (pmod(xxhash64(col("content"), i), lit(2000001L)) - 1000000L)
          .cast(FloatType) / 1000000.0f))

  /** Resize: metadata-level transform (stub keeps payload; a real codec
    * would re-encode). Clamps to the target box preserving aspect ratio.
    */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("meta.width"),
      lit(maxH.toDouble) / col("meta.height"),
      lit(1.0))
    media.withColumn("meta", struct(
      floor(col("meta.width") * scale).cast(IntegerType).as("width"),
      floor(col("meta.height") * scale).cast(IntegerType).as("height"),
      col("meta.n_frames").as("n_frames"),
      col("meta.sample_rate").as("sample_rate")))
  }

  /** Frame sampling for video rows: one (media_id, frame_idx) row per
    * sampled frame at the given stride — explode is narrow, so sampling
    * scales with output rows, not source payload size.
    */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("media_id"), col("meta.n_frames").as("n_frames"),
        explode(sequence(lit(0), col("meta.n_frames") - 1,
          lit(stride))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"))
}
