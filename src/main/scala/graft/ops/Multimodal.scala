package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing: media (image/audio/video) rides as an opaque
 * `binary` payload column with typed metadata; decode / feature-extract run
 * per-partition in batches.
 *
 * IMAGES, PCM AUDIO and AVI VIDEO are decoded FOR REAL without external
 * dependencies: `javax.imageio` ships PNG/JPEG/BMP/GIF/TIFF, so
 * [[decodeImages]] / [[resizeImages]] / [[sampleFrames]] do actual pixel
 * work — dimensions, frame counts, exact channel means, an 8×8 bilinear
 * luma thumbnail (the aHash basis), PNG re-encode, and every-Nth-frame
 * extraction from multi-frame containers; `javax.sound.sampled` reads
 * WAV/AIFF/AU, so [[decodeAudio]] extracts real sample rate / channels /
 * duration / RMS / peak from the PCM; and [[decodeVideo]] /
 * [[sampleVideoFrames]] parse RIFF/AVI natively ([[Riff]] — raw BGR24
 * frames byte-decoded, MJPEG via the JDK JPEG reader). Only codecs with no
 * JDK decoder (e.g. H.264) remain behind [[decodeFeatures]]'s clearly
 * marked deterministic stub, which keeps the real per-partition batch
 * shape where the codec call belongs.
 */
object Multimodal {

  /** Canonical media-table schema: one row per asset. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("declared_bytes", LongType, nullable = true))), nullable = true)))

  /**
   * Wrap any (id, string-payload) table as a media table — used by tests and
   * the gate to exercise the plumbing with the documents corpus standing in
   * for real image bytes.
   */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      sourceCol: String, mediaType: String = "image"): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).cast("binary").as("payload"),
      struct(col(sourceCol).as("source"),
        octet_length(col(payloadCol).cast("binary")).cast("long").as("declared_bytes"))
        .as("meta"))

  /** Output schema of [[decodeFeatures]]. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("frame_count", LongType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Rows decoded per batch inside a partition (the mapInPandas-batch analog). */
  val decodeBatchSize = 64

  /**
   * ===== STUB decode =====
   * A real deployment calls the codec here (e.g. JNI/FFI image decode) on
   * each batch of payloads. This environment has no media libraries, so the
   * "decode" is a DETERMINISTIC FAKE: n_bytes = payload length, frame_count
   * = 1 + n_bytes/1024, feature = 4 doubles derived from byte positions.
   * Everything around it — per-partition batching, schema, laziness — is the
   * real production shape.
   */
  private def decodeBatch(rows: Seq[Row]): Seq[Row] =
    rows.map { r =>
      val id = r.getLong(r.fieldIndex("media_id"))
      val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
      val n = payload.length.toLong
      val feature = (0 until 4).map { i =>
        if (n == 0) 0.0
        else payload(((n - 1) * i / 3).toInt & 0x7FFFFFFF).toDouble
      }.toArray
      Row(id, n, 1L + n / 1024L, feature)
    }

  /**
   * Decode/feature-extract every asset: per-partition, in fixed-size
   * batches, no driver involvement — the distributed shape a real decoder
   * needs (each executor touches only its partitions' payloads).
   */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = featureSchema
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(decodeBatch)
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ------------------------------------------------------ real image codec

  /** Output schema of [[decodeImages]]: `decoded = false` rows carry the
    * byte count and zeros/empties — an undecodable payload is data to
    * filter on, never an executor crash. */
  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("frame_count", LongType, nullable = false),
    StructField("mean_rgb", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("thumb_luma", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Thumbnail edge for the aHash-style luma feature (8×8 = 64 doubles). */
  val thumbEdge = 8

  /** Decompression-bomb guard: frames larger than this many PIXELS are
    * refused (`decoded = false`) BEFORE any pixel allocation — the
    * dimensions come from the container header, so a hostile 30k×30k PNG
    * whose pixel array would be gigabytes never expands on the executor.
    * 64M pixels ≈ a 256 MB ARGB frame, far above any legitimate training
    * image. The audio analog [[maxPcmBytes]] caps the decoded PCM size the
    * same way (frame count × frame size, known from the header). */
  val maxFramePixels: Long = 64L * 1024 * 1024
  val maxPcmBytes: Long = 256L * 1024 * 1024

  /** In-memory image input stream: `ImageIO.createImageInputStream` would
    * return a FileCacheImageInputStream (ImageIO's use-cache default),
    * round-tripping every payload through an executor temp FILE — pure
    * overhead on the decode hot path, where the payload is already a byte
    * array. Explicit memory-cache streams avoid both the disk I/O and the
    * JVM-global `ImageIO.setUseCache` mutation. */
  private def memIn(payload: Array[Byte]) =
    new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))

  /** PNG-encode fully in memory (see [[memIn]] for why not ImageIO's
    * default file cache). */
  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try { javax.imageio.ImageIO.write(img, "png", mos); mos.flush() }
    finally mos.close()
    bos.toByteArray
  }

  /** Exact per-channel means over row-major ARGB pixels. */
  private def meanRgbOf(px: Array[Int]): Array[Double] = {
    var (sr, sg, sb) = (0L, 0L, 0L)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
      i += 1
    }
    val cnt = px.length.toDouble
    Array(sr / cnt, sg / cnt, sb / cnt)
  }

  /** Exact per-channel means over the full frame: one bulk getRGB pass. */
  private def meanRgb(img: java.awt.image.BufferedImage): Array[Double] =
    meanRgbOf(img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth))

  private def fillConstant(img: java.awt.image.BufferedImage, rgb: Int): Unit = {
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
  }

  /** Decode one image payload with the JDK codecs; first frame drives the
    * pixel features, `frame_count` counts all frames (animated GIF). */
  private def decodeOneImage(id: Long, payload: Array[Byte]): Row = {
    val n = payload.length.toLong
    def fallback = Row(id, n, false, 0, 0, 0L,
      Array.empty[Double], Array.empty[Double])
    if (n == 0) return fallback
    try {
      val iis = memIn(payload)
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return fallback
        val reader = readers.next()
        reader.setInput(iis)
        try {
          val frames = try reader.getNumImages(true).toLong catch {
            case _: javax.imageio.IIOException => 1L
          }
          // Header-declared size check BEFORE decoding any pixels.
          if (reader.getWidth(0).toLong * reader.getHeight(0) > maxFramePixels)
            return fallback
          val img = reader.read(0)
          val (w, h) = (img.getWidth, img.getHeight)
          val mean = meanRgb(img)
          // 8×8 bilinear grayscale thumbnail (aHash basis). Integer luma
          // weights so an external check can reproduce values exactly.
          val thumb = new java.awt.image.BufferedImage(
            thumbEdge, thumbEdge, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = thumb.createGraphics()
          try {
            g2.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g2.drawImage(img, 0, 0, thumbEdge, thumbEdge, null)
          } finally g2.dispose()
          val tpx = thumb.getRGB(0, 0, thumbEdge, thumbEdge, null, 0, thumbEdge)
          val luma = tpx.map { p =>
            (299L * ((p >> 16) & 0xFF) + 587L * ((p >> 8) & 0xFF) +
              114L * (p & 0xFF)) / 1000.0
          }
          Row(id, n, true, w, h, frames, mean, luma)
        } finally reader.dispose()
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => fallback }
  }

  /**
   * REAL image decode + feature extraction over the media table — same
   * distributed shape as [[decodeFeatures]] (per-partition, batched, no
   * driver involvement), but the codec call is `javax.imageio` doing actual
   * pixel work. At 100 TB this is the dominant-cost map stage of an image
   * curation pipeline; it shuffles nothing.
   */
  def decodeImages(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = imageFeatureSchema
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(_.map { r =>
        decodeOneImage(r.getLong(0),
          Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray))
      })
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /**
   * Perceptual image dedup: group by DECODED features — dimensions plus the
   * 8×8 luma thumbnail — keeping the smallest id as canonical. Catches what
   * byte-level dedup cannot: the same picture stored as PNG vs BMP vs TIFF
   * (or with different metadata) decodes to identical pixels and collapses
   * into one group, while any visible difference keeps images apart. Scale
   * shape: decode is the map stage; the only shuffle is a groupBy on a
   * ~smaller-than-row feature key.
   *
   * The thumbnail is QUANTIZED to integer luma before grouping: the 8×8
   * raster comes out of Graphics2D bilinear drawImage, whose rounding is
   * not guaranteed bit-identical across JVM versions/platforms — raw-double
   * keys could put the same picture in different groups on heterogeneous
   * executors. Integer luma absorbs that sub-unit jitter while staying
   * strictly finer than a 64-bit aHash (whose luma-vs-mean bits degenerate
   * to all-zero for near-constant images, collapsing distinct gray levels).
   */
  def dedupImagesByThumb(media: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    decodeImages(media)
      .filter(col("decoded"))
      .groupBy(col("width"), col("height"),
        transform(col("thumb_luma"), v => round(v).cast("long")).as("thumb_luma"))
      .agg(min(col("media_id")).as("canonical_id"),
        count(lit(1)).as("n_dups"))
  }

  /** Output schema of [[resizeImages]]: resized payloads are PNG (lossless,
    * so constant regions survive re-decode bit-exactly). */
  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /**
   * REAL image resize: decode with the JDK codecs, bilinear-scale to
   * `width`×`height`, re-encode as PNG. Undecodable payloads pass through
   * with `decoded = false` and a NULL payload. Same per-partition batch
   * shape as the decode operators.
   */
  def resizeImages(media: DataFrame, width: Int, height: Int): DataFrame = {
    require(width > 0 && height > 0, "resize dimensions must be positive")
    val spark = media.sparkSession
    val outSchema = resizedSchema
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(_.map { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        try {
          val img = readFirstFrameCapped(payload)
          if (img == null) Row(id, false, null)
          else {
            val out = new java.awt.image.BufferedImage(
              width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g2 = out.createGraphics()
            try {
              g2.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g2.drawImage(img, 0, 0, width, height, null)
            } finally g2.dispose()
            Row(id, true, pngBytes(out))
          }
        } catch { case scala.util.control.NonFatal(_) => Row(id, false, null) }
      })
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ------------------------------------------------- real audio codec (WAV)

  /** Output schema of [[decodeAudio]]. `rms`/`peak` are in RAW sample units
    * (16-bit PCM counts, not normalized) so an external oracle over
    * synthesized audio reproduces them exactly. */
  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("sample_rate", DoubleType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_s", DoubleType, nullable = false),
    StructField("rms", DoubleType, nullable = false),
    StructField("peak", DoubleType, nullable = false)))

  /** Shared 16-bit-PCM extraction with the decode guards: container parse
    * via `javax.sound.sampled`, PCM_SIGNED/16-bit check (other encodings
    * must not be mis-read as sample bytes), and the header-declared size
    * bomb check BEFORE materializing samples (a header may also declare
    * UNKNOWN length, -1, for AU streams: then the payload's own byte count
    * is the bound — uncompressed PCM never inflates past its container).
    * Returns the format plus raw PCM bytes; None = treat as undecodable.
    * Throws on non-audio payloads (callers' NonFatal fallback). */
  private def readPcm16(payload: Array[Byte]): Option[
      (javax.sound.sampled.AudioFormat, Array[Byte])] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val fmt = ais.getFormat
      if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
        fmt.getSampleSizeInBits != 16) None
      else {
        val declared = ais.getFrameLength
        if (declared > 0 && fmt.getFrameSize > 0 &&
          declared * fmt.getFrameSize > maxPcmBytes) None
        else if (declared < 0 && payload.length > maxPcmBytes) None
        else Some((fmt, ais.readAllBytes()))
      }
    } finally ais.close()
  }

  /** Sample `i` (0-based, interleaved) of 16-bit PCM with the container's
    * endianness. */
  @inline private def pcm16Sample(pcm: Array[Byte], i: Int, big: Boolean): Int =
    (if (big) (pcm(2 * i) << 8) | (pcm(2 * i + 1) & 0xFF)
     else (pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xFF)).toShort.toInt

  private def decodeOneAudio(id: Long, payload: Array[Byte]): Row = {
    val n = payload.length.toLong
    def fallback = Row(id, n, false, 0.0, 0, 0L, 0.0, 0.0, 0.0)
    if (n == 0) return fallback
    try {
      readPcm16(payload) match {
        case None => fallback
        case Some((fmt, pcm)) =>
          val ch = fmt.getChannels
          val big = fmt.isBigEndian
          var (sumSq, peak) = (0.0, 0.0)
          val nSamples = pcm.length / 2
          var i = 0
          while (i < nSamples) {
            val s = pcm16Sample(pcm, i, big).toDouble
            sumSq += s * s
            val a = math.abs(s)
            if (a > peak) peak = a
            i += 1
          }
          val rms = if (nSamples == 0) 0.0 else math.sqrt(sumSq / nSamples)
          val rate = fmt.getSampleRate.toDouble
          // Frame count from the PCM ACTUALLY READ, never the header: a
          // truncated WAV's header can declare minutes of audio backed by a
          // handful of samples, and an unknown-length (-1) header has
          // nothing better to offer anyway — reporting header frames beside
          // actually-read rms/peak would hand downstream duration filters
          // mutually inconsistent fields.
          val frames = if (ch > 0) nSamples.toLong / ch else 0L
          Row(id, n, true, rate, ch, frames,
            if (rate > 0) frames / rate else 0.0, rms, peak)
      }
    } catch { case scala.util.control.NonFatal(_) => fallback }
  }

  /**
   * REAL audio decode over WAV/AIFF/AU payloads via the JDK's
   * `javax.sound.sampled` (no external dependency): container format,
   * channel count, frame count, duration, and RMS/peak over the raw PCM
   * samples. Same per-partition batch shape as the image operators;
   * undecodable payloads degrade to `decoded = false`.
   */
  def decodeAudio(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = audioFeatureSchema
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(_.map { r =>
        decodeOneAudio(r.getLong(0),
          Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray))
      })
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Output schema of [[audioEnvelopes]]: the perceptual grouping features
    * — format identity (rate, channels, frame count) plus a coarse
    * amplitude envelope, `segments` quantized mean-|sample| values on a
    * 0..256 full-scale-relative scale. Quantization makes the key exact
    * (integers survive any container round trip) and full-scale-relative
    * makes it bit-depth-agnostic by construction. */
  val audioEnvelopeSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("sample_rate", DoubleType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("envelope", ArrayType(IntegerType), nullable = true)))

  private def envelopeOneAudio(id: Long, payload: Array[Byte], segments: Int): Row = {
    def fallback = Row(id, false, 0.0, 0, 0L, null)
    if (payload.isEmpty) return fallback
    try {
      readPcm16(payload) match {
        case None => fallback
        case Some((fmt, pcm)) =>
          val ch = fmt.getChannels
          val big = fmt.isBigEndian
          val nSamples = pcm.length / 2
          val frames = if (ch > 0) nSamples / ch else 0
          if (frames == 0) return fallback
          val sums = new Array[Double](segments)
          val counts = new Array[Long](segments)
          // Iterate only whole frames: a trailing partial frame (nSamples %
          // ch != 0, e.g. a truncated unknown-length AU stream) would push
          // i/ch to `frames` and the segment index past the array — ignore
          // it instead of failing the whole clip into decoded=false.
          var i = 0
          val whole = frames * ch
          while (i < whole) {
            // Segment by FRAME so channel interleaving can't smear a
            // frame's samples across a segment boundary.
            val seg = (((i / ch).toLong * segments) / frames).toInt
            sums(seg) += math.abs(pcm16Sample(pcm, i, big))
            counts(seg) += 1
            i += 1
          }
          val env = Array.tabulate(segments) { s =>
            if (counts(s) == 0) 0
            else math.round(sums(s) / counts(s) * 256.0 / 32767.0).toInt
          }
          Row(id, true, fmt.getSampleRate.toDouble, ch, frames.toLong, env.toSeq)
      }
    } catch { case scala.util.control.NonFatal(_) => fallback }
  }

  /** Coarse PCM amplitude envelope per payload — the perceptual feature
    * behind [[dedupAudioByEnvelope]], same per-partition batch shape as the
    * other decode operators. */
  def audioEnvelopes(media: DataFrame, segments: Int = 8): DataFrame = {
    require(segments > 0, "segments must be positive")
    val spark = media.sparkSession
    val outSchema = audioEnvelopeSchema
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(_.map { r =>
        envelopeOneAudio(r.getLong(0),
          Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray), segments)
      })
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /**
   * Perceptual audio dedup — the audio analog of [[dedupImagesByThumb]]:
   * group by DECODED features (sample rate, channels, frame count, coarse
   * quantized amplitude envelope), keeping the smallest id as canonical.
   * The same clip stored as WAV vs AIFF vs AU (different containers,
   * endianness, metadata) decodes to the same samples and collapses into
   * one group — byte-level dedup cannot see that. Scale shape: decode is
   * the map stage; the only shuffle is a groupBy on a small feature key.
   */
  def dedupAudioByEnvelope(media: DataFrame, segments: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions._
    audioEnvelopes(media, segments)
      .filter(col("decoded"))
      .groupBy(col("sample_rate"), col("channels"), col("n_frames"), col("envelope"))
      .agg(min(col("media_id")).as("canonical_id"),
        count(lit(1)).as("n_dups"))
  }

  /** Deterministic mono 16-bit square wave (+amp/-amp alternating) in a
    * chosen container — WAV (little-endian PCM), AIFF or AU (big-endian):
    * every sample's square is amp², so RMS == peak == amp EXACTLY for any
    * frame count, and every segment's mean |sample| is amp — the audio
    * analog of [[constantPng]], with the container a free variable for
    * cross-container dedup oracles. */
  def squareAudio(nFrames: Int, sampleRate: Float, amplitude: Short,
      container: String): Array[Byte] = {
    import javax.sound.sampled._
    val big = container != "wav"
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val v: Short = if (i % 2 == 0) amplitude else (-amplitude).toShort
      val (lo, hi) = ((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
      if (big) { pcm(2 * i) = hi; pcm(2 * i + 1) = lo }
      else { pcm(2 * i) = lo; pcm(2 * i + 1) = hi }
      i += 1
    }
    val typ = container match {
      case "wav" => AudioFileFormat.Type.WAVE
      case "aiff" => AudioFileFormat.Type.AIFF
      case "au" => AudioFileFormat.Type.AU
      case other => throw new IllegalArgumentException(
        s"container must be wav|aiff|au, got $other")
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, big)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, typ, bos)
    bos.toByteArray
  }

  /** [[squareAudio]] in its original WAV-only form (gate-corpus synthesis). */
  def squareWav(nFrames: Int, sampleRate: Float, amplitude: Short): Array[Byte] =
    squareAudio(nFrames, sampleRate, amplitude, "wav")

  // ------------------------------------------- frame sampling (multi-frame)

  /** Output schema of [[sampleFrames]]: one row per SAMPLED frame, with the
    * frame's own dimensions, exact channel means, and a standalone PNG
    * re-encode of the frame for downstream per-frame processing. */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_index", IntegerType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_rgb", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("payload", BinaryType, nullable = true)))

  /**
   * REAL frame sampling over multi-frame containers (animated GIF,
   * multi-page TIFF — any format the JDK readers expose as an image
   * sequence): every `stride`-th frame is decoded, featurized, and
   * re-encoded as its own PNG. The 100 TB shape of video frame extraction:
   * a flatMap that multiplies rows without any shuffle.
   */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, "stride must be at least 1")
    val spark = media.sparkSession
    val outSchema = frameSchema
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(_.flatMap { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        def containerFailure = Seq(Row(id, -1, false, 0, 0, Array.empty[Double], null))
        try {
          val iis = memIn(payload)
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) containerFailure
            else {
              val reader = readers.next()
              reader.setInput(iis)
              try {
                val total = reader.getNumImages(true)
                (0 until total by stride).map { f =>
                  // PER-FRAME failure isolation: one truncated or over-cap
                  // frame becomes its own decoded=false row; the other
                  // sampled frames of the container still come through.
                  try {
                    if (reader.getWidth(f).toLong * reader.getHeight(f) > maxFramePixels)
                      Row(id, f, false, 0, 0, Array.empty[Double], null)
                    else {
                      val img = reader.read(f)
                      Row(id, f, true, img.getWidth, img.getHeight,
                        meanRgb(img), pngBytes(img))
                    }
                  } catch {
                    case scala.util.control.NonFatal(_) =>
                      Row(id, f, false, 0, 0, Array.empty[Double], null)
                  }
                }
              } finally reader.dispose()
            }
          } finally iis.close()
        } catch { case scala.util.control.NonFatal(_) => containerFailure }
      })
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** First frame via the reader API with the [[maxFramePixels]] header
    * check (the `ImageIO.read` convenience entry point cannot refuse a
    * decompression bomb before allocating its pixels). Null when
    * unreadable or over the cap. */
  private def readFirstFrameCapped(payload: Array[Byte]): java.awt.image.BufferedImage = {
    val iis = memIn(payload)
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return null
      val reader = readers.next()
      reader.setInput(iis)
      try {
        if (reader.getWidth(0).toLong * reader.getHeight(0) > maxFramePixels) null
        else reader.read(0)
      } finally reader.dispose()
    } finally iis.close()
  }

  // -------------------------------------------- real video container (AVI)

  /** Output schema of [[decodeVideo]]: stream geometry, frame rate,
    * duration, and exact channel means across ALL frames' pixels. */
  val videoFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("fps", DoubleType, nullable = false),
    StructField("duration_s", DoubleType, nullable = false),
    StructField("mean_rgb", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /**
   * REAL video decode over RIFF/AVI containers — uncompressed BGR24 DIB
   * frames decode by byte shuffling alone, MJPEG frames through the JDK's
   * JPEG reader (see [[Riff]]); no external codec. Geometry, frame count,
   * fps, duration, and exact channel means over every frame. Payloads that
   * are not AVI (or use a codec with no JDK decoder) degrade to
   * `decoded = false`, same contract as the image/audio paths.
   */
  def decodeVideo(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = videoFeatureSchema
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(_.map { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val n = payload.length.toLong
        try {
          val avi = Riff.parseAvi(payload, maxFramePixels)
          var (sr, sg, sb, cnt) = (0L, 0L, 0L, 0L)
          (0 until avi.nFrames).foreach { f =>
            val px = Riff.decodeFrame(avi, f, maxFramePixels).argb
            var i = 0
            while (i < px.length) {
              val p = px(i)
              sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
              i += 1
            }
            cnt += px.length
          }
          val mean =
            if (cnt == 0) Array.empty[Double]
            else Array(sr.toDouble / cnt, sg.toDouble / cnt, sb.toDouble / cnt)
          Row(id, n, true, avi.width, avi.height, avi.nFrames.toLong,
            avi.fps, avi.durationS, mean)
        } catch {
          case scala.util.control.NonFatal(_) =>
            Row(id, n, false, 0, 0, 0L, 0.0, 0.0, Array.empty[Double])
        }
      })
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /**
   * REAL video frame sampling: every `stride`-th AVI frame decoded,
   * featurized, and re-encoded as its own PNG — identical output shape to
   * the multi-frame image sampler ([[frameSchema]]), so downstream
   * per-frame processing is container-agnostic.
   */
  def sampleVideoFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride >= 1, "stride must be at least 1")
    val spark = media.sparkSession
    val outSchema = frameSchema
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(_.flatMap { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        try {
          val avi = Riff.parseAvi(payload, maxFramePixels)
          (0 until avi.nFrames by stride).map { f =>
            try {
              val fr = Riff.decodeFrame(avi, f, maxFramePixels)
              val img = new java.awt.image.BufferedImage(
                fr.width, fr.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
              img.setRGB(0, 0, fr.width, fr.height, fr.argb, 0, fr.width)
              Row(id, f, true, fr.width, fr.height, meanRgbOf(fr.argb), pngBytes(img))
            } catch {
              case scala.util.control.NonFatal(_) =>
                Row(id, f, false, 0, 0, Array.empty[Double], null)
            }
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            Seq(Row(id, -1, false, 0, 0, Array.empty[Double], null))
        }
      })
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Output schema of [[videoLumaSignatures]]: stream identity (geometry,
    * fps, frame count) plus the per-sampled-frame QUANTIZED mean luma — the
    * perceptual grouping key behind [[dedupVideoBySignature]]. */
  val videoSignatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("fps", DoubleType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("frame_sig", ArrayType(IntegerType), nullable = true)))

  /**
   * Per-payload video signature: every `stride`-th frame's mean luma,
   * quantized to `lumaQuant`-wide buckets (`round(mean / lumaQuant)`).
   * Quantization is what makes the key survive CODEC round trips, not just
   * container ones: a raw BGR24 frame decodes exactly, but the same frame
   * through MJPEG comes back with small DC-quantization error — a few luma
   * units — that an exact key would split on. Same per-partition batch
   * shape as the other decode operators.
   */
  def videoLumaSignatures(media: DataFrame, stride: Int = 1,
      lumaQuant: Int = 8): DataFrame = {
    require(stride >= 1, "stride must be at least 1")
    require(lumaQuant >= 1, "lumaQuant must be at least 1")
    val spark = media.sparkSession
    val outSchema = videoSignatureSchema
    val rdd = media.select("media_id", "payload").rdd.mapPartitions { it =>
      it.grouped(decodeBatchSize).flatMap(_.map { r =>
        val id = r.getLong(0)
        val payload = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        try {
          val avi = Riff.parseAvi(payload, maxFramePixels)
          val sig = (0 until avi.nFrames by stride).map { f =>
            val px = Riff.decodeFrame(avi, f, maxFramePixels).argb
            var luma = 0L
            var i = 0
            while (i < px.length) {
              val p = px(i)
              luma += 299L * ((p >> 16) & 0xFF) + 587L * ((p >> 8) & 0xFF) +
                114L * (p & 0xFF)
              i += 1
            }
            val mean = if (px.length == 0) 0.0 else luma / 1000.0 / px.length
            math.round(mean / lumaQuant).toInt
          }
          Row(id, true, avi.width, avi.height, avi.fps, avi.nFrames.toLong,
            sig.toSeq)
        } catch {
          case scala.util.control.NonFatal(_) =>
            Row(id, false, 0, 0, 0.0, 0L, null)
        }
      })
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /**
   * Perceptual video dedup — the video analog of [[dedupImagesByThumb]] /
   * [[dedupAudioByEnvelope]]: group by DECODED stream identity (geometry,
   * fps, frame count) plus the sampled-frame luma signature, keeping the
   * smallest id as canonical. The same clip stored as raw BGR24 vs MJPEG
   * (different containers AND codecs, byte-disjoint payloads) decodes to
   * the same quantized signature and collapses into one group — byte-level
   * dedup cannot see that. Scale shape: decode is the map stage; the only
   * shuffle is a groupBy on a small feature key.
   */
  def dedupVideoBySignature(media: DataFrame, stride: Int = 1,
      lumaQuant: Int = 8): DataFrame = {
    import org.apache.spark.sql.functions._
    videoLumaSignatures(media, stride, lumaQuant)
      .filter(col("decoded"))
      .groupBy(col("width"), col("height"), col("fps"), col("n_frames"),
        col("frame_sig"))
      .agg(min(col("media_id")).as("canonical_id"),
        count(lit(1)).as("n_dups"))
  }

  /** Deterministic constant-color uncompressed AVI — the video analog of
    * [[constantPng]]: raw BGR24 frames, so decode is exact. */
  def constantAvi(width: Int, height: Int, fps: Int,
      frameColors: Seq[(Int, Int, Int)]): Array[Byte] =
    Riff.writeUncompressedAvi(width, height, fps,
      frameColors.map { case (r, g, b) =>
        Array.fill(width * height)(
          0xFF000000 | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF))
      })

  /** Constant-gray MJPEG AVI: each frame is a real JDK-encoded JPEG inside
    * a `00dc` chunk. A constant image has zero AC energy, so JPEG returns a
    * constant frame whose gray differs from the painted level only by small
    * DC-quantization error — inside [[videoLumaSignatures]]'s quantization
    * bucket when the level sits on the `lumaQuant` lattice. The codec twin
    * of [[constantAvi]] for cross-codec dedup oracles. */
  def constantMjpegAvi(width: Int, height: Int, fps: Int,
      grayLevels: Seq[Int]): Array[Byte] = {
    val frames = grayLevels.map { l =>
      val img = new java.awt.image.BufferedImage(
        width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
      fillConstant(img, ((l & 0xFF) << 16) | ((l & 0xFF) << 8) | (l & 0xFF))
      // Memory-cached output stream, NOT ImageIO.write(img, fmt, rawStream):
      // the raw-OutputStream overload wraps it via createImageOutputStream,
      // which under the JVM-wide use-cache default is a
      // FileCacheImageOutputStream — one temp FILE created, written, and
      // deleted per frame. 32 concurrent synth tasks then contend on
      // temp-dir metadata instead of encoding (see [[memIn]]); measured on
      // m_video_dedup's corpus: the synth+decode stage's task time fell
      // 11.4 s -> 2.9 s with the in-memory stream (warm wave 1.0-2.0 s ->
      // 0.5-0.7 s).
      val bos = new java.io.ByteArrayOutputStream()
      val mos = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try { javax.imageio.ImageIO.write(img, "jpeg", mos); mos.flush() }
      finally mos.close()
      ("dc", bos.toByteArray)
    }
    Riff.writeAvi(width, height, fps, "MJPG", frames)
  }

  /** Deterministic multi-page TIFF, one constant color per frame — the
    * multi-frame analog of [[constantPng]] for frame-sampling oracles. */
  def multiFrameTiff(width: Int, height: Int,
      frameColors: Seq[(Int, Int, Int)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    // Memory-cached, not createImageOutputStream: the factory's use-cache
    // default round-trips the whole TIFF through an executor temp file per
    // document (same hazard as [[constantMjpegAvi]]'s per-frame encode).
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    try {
      w.setOutput(ios)
      w.prepareWriteSequence(null)
      frameColors.foreach { case (r, g, b) =>
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        fillConstant(img, ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF))
        w.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      w.endWriteSequence()
    } finally { w.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Deterministic constant-color PNG — the synthesis helper gates and
    * tests use to build image corpora whose decode results are analytic
    * (a constant image survives PNG round-trip and bilinear resize with
    * every pixel exactly the painted color). */
  def constantPng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    fillConstant(img, ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF))
    pngBytes(img)
  }
}
