package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: image/audio/
  * video payloads ride as opaque `binary` columns next to typed metadata,
  * and per-item decode/feature ops run as partition-local batch functions.
  *
  * The IMAGE codec is real: `decodeBatched` decodes PNG/BMP/GIF/JPEG
  * payloads through the JDK's `javax.imageio` and reports codec-derived
  * dimensions. The AUDIO codec is real too: WAV/AIFF/AU PCM headers and
  * frame counts parse through `javax.sound.sampled` (payloads no
  * installed reader accepts fall back to byte stats only). The VIDEO
  * path walks real multi-frame containers for the one format the JDK
  * covers (animated GIF: codec-derived frame count + dimensions); true
  * video codecs (mp4/webm) don't ship with the JDK, so those payloads
  * remain byte-stats-only stubs. The surrounding plumbing — schema,
  * batching, partition-local execution, frame sampling, metadata
  * propagation — is the production Spark shape either way.
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

  /** Deterministic per-item byte statistics of a payload — computed for
    * every media type (for images they sit alongside the codec output;
    * for the still-stubbed audio/video they stand in for decoded
    * features).
    */
  final case class DecodedStats(
      n_bytes: Int, mean_byte: Double, checksum01: Double)

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

  /** One decoded batch row (see [[decodeBatched]]); stats are None for a
    * null payload, width/height are Some only when the image codec
    * actually decoded the bytes, sample_rate/n_samples only when the
    * audio codec did.
    */
  final case class DecodedRow(media_id: Long, media_type: String,
      n_bytes: Option[Int], mean_byte: Option[Double],
      checksum01: Option[Double], width: Option[Int], height: Option[Int],
      sample_rate: Option[Int], n_samples: Option[Long],
      n_frames: Option[Int])

  /** Batched decode via `mapPartitions` — the Scala analogue of the
    * `mapInPandas` batch shape: the codec sees an iterator of items per
    * partition and amortizes per-batch setup (codec context, model load)
    * across `batchSize` items instead of paying it per row. Image rows go
    * through the real JDK codec (`javax.imageio`: PNG/BMP/GIF/JPEG);
    * bytes that no installed reader accepts — and all audio/video rows —
    * keep byte stats only. The batching skeleton (grouped iterator,
    * per-batch context, streaming output — never materializing a whole
    * partition) is exactly what a heavier production decoder keeps.
    */
  def decodeBatched(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("media_type"), col("content"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-batch codec context: no temp-file caching for byte streams
        ImageIO.setUseCache(false)
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { case (id, tpe, content) =>
            if (content == null)
              DecodedRow(id, tpe, None, None, None, None, None, None, None,
                None)
            else {
              val s = foldStats(content)
              val img = if (tpe == "image") readImageSafe(content) else None
              val aud = if (tpe == "audio") readAudioSafe(content) else None
              val vid = if (tpe == "video") readVideoSafe(content) else None
              DecodedRow(id, tpe, Some(s.n_bytes), Some(s.mean_byte),
                Some(s.checksum01),
                img.map(_.getWidth).orElse(vid.map(_._2)),
                img.map(_.getHeight).orElse(vid.map(_._3)),
                aud.map(_._1), aud.map(_._2), vid.map(_._1))
            }
          }
        }
      }.toDF()
  }

  /** Decode cap: 64M pixels (~256 MB ARGB). A poison payload whose
    * header declares absurd dimensions must fall back to byte stats, not
    * OOM the executor.
    */
  private val MaxDecodePixels = 64L << 20

  /** Decode an image payload defensively: probe the HEADER first (reader
    * discovery + declared dimensions — no pixel allocation), refuse
    * anything over [[MaxDecodePixels]], and treat every decode failure as
    * "not an image" rather than a task failure. One corrupt or crafted
    * record must never kill a 100 TB decode job.
    */
  private def readImageSafe(content: Array[Byte])
      : Option[java.awt.image.BufferedImage] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(content))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val w = r.getWidth(0).toLong
          val h = r.getHeight(0).toLong
          if (w <= 0 || h <= 0 || w * h > MaxDecodePixels) None
          else Option(r.read(0))
        } finally r.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (iis != null) iis.close()
  }

  /** Audio decode cap: 256M frames (~8 GB of PCM16 stereo) — same
    * poison-payload defense as [[MaxDecodePixels]].
    */
  private val MaxDecodeFrames = 256L << 20

  /** Container magic for the JDK audio readers (RIFF/WAVE, AIFF's FORM,
    * AU's .snd). Checked BEFORE invoking the codec: AudioSystem signals
    * "not audio" by THROWING, and paying an exception per non-audio row
    * turns a media-mixed decode scan into exception-as-control-flow
    * (measured: doubled q_mm_decode, whose payloads are all text).
    */
  private def looksLikeAudio(c: Array[Byte]): Boolean =
    c.length >= 12 &&
      ((c(0) == 'R' && c(1) == 'I' && c(2) == 'F' && c(3) == 'F') ||
        (c(0) == 'F' && c(1) == 'O' && c(2) == 'R' && c(3) == 'M') ||
        (c(0) == '.' && c(1) == 's' && c(2) == 'n' && c(3) == 'd'))

  /** Decode an audio payload defensively through the JDK codec
    * (`javax.sound.sampled`: WAV/AIFF/AU PCM). Returns
    * (sample_rate, n_frames) from the CODEC's parsed header, or None for
    * anything the installed readers reject — a corrupt record degrades
    * to byte stats, never a task failure.
    */
  private def readAudioSafe(content: Array[Byte]): Option[(Int, Long)] = {
    if (!looksLikeAudio(content)) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(content))
      try {
        val fmt = in.getFormat
        val frames = in.getFrameLength
        if (frames <= 0 || frames > MaxDecodeFrames ||
            fmt.getSampleRate <= 0) None
        else Some((fmt.getSampleRate.toInt, frames))
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Frame-count cap for multi-frame containers — counting is a
    * header/stream walk, so the cap bounds the walk, not memory.
    */
  private val MaxCountFrames = 1 << 20

  /** Parse a multi-frame container (animated GIF — the one video-like
    * format the JDK codec set covers) defensively: returns
    * (n_frames, width, height) from the codec's own stream walk, or None
    * for single-frame payloads and anything unreadable. The walk probes
    * frame headers one at a time and STOPS at [[MaxCountFrames]] — a
    * crafted payload packing millions of frames costs at most the capped
    * probes, never a full-container scan (getNumImages(true) would walk
    * everything before any cap could apply). True video containers
    * (mp4/webm) have no JDK codec and stay byte-stats-only.
    */
  private def readVideoSafe(content: Array[Byte])
      : Option[(Int, Int, Int)] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(content))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val w = r.getWidth(0); val h = r.getHeight(0)
          // incremental frame-header probe, capped
          var n = 0
          var more = true
          while (more && n <= MaxCountFrames) {
            try { r.getWidth(n); n += 1 }
            catch { case _: IndexOutOfBoundsException => more = false }
          }
          if (n < 2 || n > MaxCountFrames || w <= 0 || h <= 0 ||
              w.toLong * h > MaxDecodePixels) None
          else Some((n, w, h))
        } finally r.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (iis != null) iis.close()
  }

  /** Deterministic synthetic animated GIF: REAL multi-frame bytes via
    * the JDK's sequence writer, so the video path exercises an actual
    * container walk. Executor-safe.
    */
  def synthGif(width: Int, height: Int, nFrames: Int, seed: Long)
      : Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val w = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val v = (x * 31 + y * 17 + f * 7 + seed).toInt & 0xFF
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Deterministic synthetic WAV: REAL RIFF/PCM16 mono bytes (a seeded
    * sawtooth), so audio decode paths exercise an actual codec parse.
    * Executor-safe, like [[synthPng]].
    */
  def synthWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      buf.putShort((((i * 37 + seed) % 65536) - 32768).toShort)
      i += 1
    }
    buf.array()
  }

  /** Deterministic synthetic PNG: REAL encoded bytes (graylevel gradient
    * derived from the seed) so decode paths exercise an actual codec
    * round-trip. Executor-safe — used to mint demo/test payloads
    * distributed, not on the driver.
    */
  def synthPng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val v = (x * 31 + y * 17 + seed).toInt & 0xFF
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
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
