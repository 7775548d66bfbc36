package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque binary payload + typed metadata. */
final case class MediaRecord(
    doc_id: Long,
    format: String,
    content: Array[Byte],
    byte_len: Long)

/** Decoded media features. `feature` is a fixed-width embedding-like vector;
  * `frames` counts sampled frames for video-like payloads. */
final case class MediaFeatures(
    doc_id: Long,
    format: String,
    byte_len: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    feature: Array[Float])

/** Decoded audio features: real header metadata plus an 8-bucket grid of
  * summed |PCM| amplitudes — exact integers, so a gate can pin them. */
final case class AudioFeatures(
    doc_id: Long,
    sample_rate: Int,
    n_channels: Int,
    bits: Int,
    n_samples: Long,
    energy: Array[Long])

/** Multimodal-column plumbing: images/audio/video as opaque `binary` columns
  * with typed metadata, decoded per-partition.
  *
  * The actual decode step is a STUB — image/audio codecs are not in this
  * container — replaced by a deterministic fake that derives metadata and a
  * feature vector from the bytes themselves. Everything around it is the
  * real Spark shape for this workload:
  *  - binary payloads stay columnar (parquet BYTE_ARRAY) and are never
  *    shuffled by the decode (mapPartitions is narrow);
  *  - the decode is batched per partition, exactly where a JNI/FFI decoder
  *    (or `mapInPandas` on the Python side) would sit;
  *  - feature output is `array<float>`, ready for the Similarity operators.
  */
object Multimodal {

  /** Build a binary media table from the documents fixture: the UTF-8 bytes
    * play the payload, the format rotates deterministically. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(typedLit(Seq("jpeg", "png", "webp")), (col("doc_id") % 3 + 1).cast("int")).as("format"),
      encode(col("text"), "UTF-8").as("content"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("byte_len"))

  /** STUB decoder: deterministic fake metadata/features from the payload.
    * Swap `decodeOne` for a real codec binding; the partition-batched shape
    * (one decoder instance per partition, streaming iterator) is the part
    * that matters at scale. */
  def decodeFeatures(media: Dataset[MediaRecord], featureDim: Int = 8)
                    (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { records =>
      // a real implementation would initialise the codec ONCE here
      records.map(decodeOne(_, featureDim))
    }
  }

  /** Deterministic fake decode (??? stand-in): metadata from a rolling
    * codepoint checksum of the decoded payload — fold (acc*31 + cp) mod
    * 1e9+7, acc₀ = 17, the same DuckDB-reproducible family as the text
    * fingerprint, so the full decode output is oracle-checkable (q32).
    * (BMP-safe: UTF-16 units equal codepoints for the fixture's charset.) */
  private[operators] def decodeOne(r: MediaRecord, featureDim: Int): MediaFeatures = {
    val bytes = r.content
    val text = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    var checksum = 17L
    var ci = 0
    while (ci < text.length) {
      checksum = (checksum * 31L + text.charAt(ci).toInt) % 1000000007L
      ci += 1
    }
    val width = 64 + (checksum % 1024).toInt
    val height = 64 + ((checksum / 1024) % 1024).toInt
    val nFrames = if (r.format == "webp") 1 + (checksum % 30).toInt else 1
    // single indexed pass: feature(i) sums bytes i, i+dim, i+2·dim, …
    // (no per-dimension array copies in the hot decode loop)
    val feature = new Array[Float](featureDim)
    var idx = 0
    while (idx < bytes.length) {
      feature(idx % featureDim) += (bytes(idx) & 0xff) / 255.0f
      idx += 1
    }
    MediaFeatures(r.doc_id, r.format, r.byte_len, width, height, nFrames, feature)
  }

  /** REAL decode path behind the same partition-batched interface: the
    * JDK's ImageIO decodes PNG/BMP/GIF with no native codecs, so this one
    * is not a stub — `read`s the actual raster and derives width/height,
    * frame count (GIF: real animation frames), and a luminance-grid
    * feature from the decoded pixels. Rows ImageIO has no reader for
    * (jpeg-less containers, corrupt payloads, or the synthetic text
    * fixtures) are DROPPED, not faked — the deterministic stub
    * ([[decodeFeatures]]) remains the oracle path for gate rows, and this
    * is the production shape: same `mapPartitions` batching, decoder
    * state per partition, narrow (no shuffle).
    *
    * Scale note: `getRGB` per pixel is the portable raster access; a
    * throughput-tuned decoder would grab the raster row-batch via
    * `Raster.getPixels` — same operator shape, local change inside the
    * partition loop. */
  def decodeFeaturesImageIO(media: Dataset[MediaRecord], featureDim: Int = 8)
                           (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { records =>
      records.flatMap(decodeOneImageIO(_, featureDim))
    }
  }

  /** Upper bound on declared raster size the real decoder will touch:
    * 64 Mpixel ≈ a 256 MB ARGB BufferedImage — anything larger is treated
    * as a decompression bomb and dropped before allocation. */
  private[operators] val MaxDecodePixels: Long = 64L * 1024 * 1024

  private[operators] def decodeOneImageIO(r: MediaRecord,
                                          featureDim: Int): Option[MediaFeatures] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(r.content))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          // decompression-bomb guard: the header's declared dimensions are
          // available BEFORE any pixel allocation; a tiny payload can claim
          // a multi-gigapixel raster and reader.read(0) would allocate it
          val declW = reader.getWidth(0)
          val declH = reader.getHeight(0)
          if (declW <= 0 || declH <= 0 || declW.toLong * declH > MaxDecodePixels) None
          else {
            // allowSearch=true is safe on an in-memory stream; for GIF this
            // counts the REAL animation frames
            val nFrames = reader.getNumImages(true)
            val img = reader.read(0)
            val w = img.getWidth
            val h = img.getHeight
            // integer-luminance grid feature: pixel (x,y) accumulates into
            // bucket (y*w+x) mod dim — deterministic for a given raster
            val feature = new Array[Float](featureDim)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
                  (rgb & 0xff) * 114) / 1000
                feature((y * w + x) % featureDim) += lum / 255.0f
                x += 1
              }
              y += 1
            }
            Some(MediaFeatures(r.doc_id, r.format, r.byte_len, w, h, nFrames, feature))
          }
        } catch {
          // corrupt payload: drop, don't fake — and not just IIOException:
          // buggy third-party readers surface malformed rasters as unwrapped
          // runtime exceptions, which must not kill the executor task
          case scala.util.control.NonFatal(_) => None
        } finally reader.dispose()
      }
    } finally iis.close()
  }

  /** Resize planning: aspect-preserving fit of each decoded asset into a
    * `boxW` × `boxH` box — the dimension math of a letterboxed resize as
    * pure integer column arithmetic (floor division on BIGINTs, exact in
    * any engine). The pixel resample itself belongs next to the codec in
    * `decodeOne`'s partition batch; what Spark owns is this plan: which
    * assets change size, to what, at what cost — e.g. feeding a
    * downstream "bytes to re-encode" estimate. Upscaling is clamped
    * (scale ≤ 1): thumbnails don't inflate small assets. */
  def resizeFit(features: DataFrame, boxW: Int, boxH: Int): DataFrame = {
    // widen BEFORE multiplying: INT×INT silently wraps in non-ANSI Spark,
    // so a very wide asset would misroute the limit test (and diverge from
    // an engine that raises on overflow instead)
    val w = col("width").cast("long")
    val h = col("height").cast("long")
    val heightLimited = w * boxH <= h * boxW
    val fitW = when(heightLimited, expr(s"(CAST(width AS BIGINT) * $boxH) div height"))
      .otherwise(lit(boxW.toLong))
    val fitH = when(heightLimited, lit(boxH.toLong))
      .otherwise(expr(s"(CAST(height AS BIGINT) * $boxW) div width"))
    features.select(
      col("doc_id"), col("width"), col("height"),
      when(w <= boxW && h <= boxH, w).otherwise(fitW).as("fit_width"),
      when(w <= boxW && h <= boxH, h).otherwise(fitH).as("fit_height"))
  }

  /** Frame sampling plumbing: explode video-like payloads into one row per
    * sampled frame index (every `everyN`-th frame). Zero-frame assets yield
    * ZERO rows — clamping to a phantom frame 0 would emit a frame that does
    * not exist (and diverge from the q46 oracle's stop-exclusive range). */
  def frameSample(features: DataFrame, everyN: Int = 5): DataFrame =
    features
      .filter(col("n_frames") >= 1)
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN))))
      .select(col("doc_id"), col("format"), col("frame_idx"))

  // --- deterministic REAL image payloads (gating the ImageIO decoder) -------

  /** `n` REAL image payloads — actual PNG/BMP/GIF containers written by
    * the JDK's ImageIO, encoded ON EXECUTORS inside `mapPartitions` (the
    * same partition-batched codec boundary as the decoder). Rasters are
    * fixed functions of the id, chosen to roundtrip EXACTLY through every
    * format: PNG/BMP carry truecolor gradients (both lossless); GIF
    * frames are strict black/white checkerboards, the one palette no GIF
    * quantizer can perturb. GIF ids carry 1–3 REAL animation frames.
    * Decoded (width, height, n_frames, luminance grid) is therefore a
    * pure integer function of the id — pinned as q161's VALUES oracle
    * ([[graft.queries.Extensions.imageioDecode]]); payload BYTES are not
    * pinned (container layout may differ across encoder versions — the
    * raster cannot). */
  def syntheticImageTable(n: Int)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions(_.map(encodeSynthetic))
  }

  private[operators] def encodeSynthetic(id: Long): MediaRecord = {
    val i = id.toInt
    val fmt = Seq("png", "bmp", "gif")(i % 3)
    val w = 4 + (i % 4) * 3
    val h = 3 + (i % 3) * 2
    val bytes = fmt match {
      case "gif" =>
        val frames = 1 + ((i / 3) % 3)
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          (0 until frames).foreach { f =>
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                img.setRGB(x, y, if ((x + y + f + i) % 2 == 0) 0xffffff else 0x000000)
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
          }
          writer.endWriteSequence()
        } finally { writer.dispose(); ios.close() }
        bos.toByteArray
      case _ =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val r = (x * 31 + y * 7 + i * 11) % 256
            val g = (x * 13 + y * 17 + i * 5) % 256
            val b = (x * 3 + y * 29 + i * 23) % 256
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, bos)
        bos.toByteArray
    }
    MediaRecord(id, fmt, bytes, bytes.length.toLong)
  }

  /** `n` REAL JPEG payloads — the DOMINANT real-corpus format, and the one
    * codec family PNG/BMP/GIF never touch: a full DCT encode (quantized
    * frequency coefficients, chroma subsampling) through the JDK's
    * built-in JPEGImageWriter, default quality. Rasters are SMOOTH
    * integer gradients — the payload class DCT represents compactly — so
    * the decoded pixels are a fixed function of (id, JDK codec): the
    * codec is lossy, not random. q218 pins the decoded luminance grid the
    * same way q161 pins the lossless formats (pins regenerate in-spec, so
    * a JDK codec change breaks the spec loudly, not silently). */
  def syntheticJpegTable(n: Int)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions(_.map(encodeSyntheticJpeg))
  }

  private[graft] def encodeSyntheticJpeg(id: Long): MediaRecord = {
    val i = id.toInt
    val w = 16 + (i % 3) * 8
    val h = 8 + (i % 2) * 8
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // smooth per-channel gradients with an id-dependent phase
        val r = (x * 255 / (w - 1) + i * 37) % 256
        val g = (y * 255 / (h - 1) + i * 53) % 256
        val b = ((x + y) * 255 / (w + h - 2) + i * 71) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    MediaRecord(id, "jpeg", bos.toByteArray, bos.size().toLong)
  }

  // --- audio: REAL RIFF/WAVE codec (pure JVM, zero deps) ---------------------

  /** Synthetic 16-bit PCM mono WAV table, encoded on executors — real
    * RIFF containers, no fixture bytes in git (the
    * [[syntheticImageTable]] discipline). Waveforms are integer
    * sawtooths: no transcendental ever touches a gated value. */
  def syntheticWavTable(n: Int)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.range(n).as[Long].mapPartitions(_.map(encodeSyntheticWav))
  }

  private[graft] def syntheticSamples(id: Long): Array[Short] = {
    val i = id.toInt
    val n = 320 + (i % 5) * 160
    Array.tabulate[Short](n)(k => ((((k * (7 + i)) % 4096) - 2048) * 8).toShort)
  }

  private[graft] def encodeSyntheticWav(id: Long): MediaRecord = {
    val rate = Seq(8000, 16000, 22050)(id.toInt % 3)
    val bytes = writeWav(syntheticSamples(id), rate)
    MediaRecord(id, "wav", bytes, bytes.length.toLong)
  }

  /** Canonical 44-byte-header PCM WAV encoder. */
  private[graft] def writeWav(samples: Array[Short], rate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")); bb.putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")); bb.putInt(16)
    bb.putShort(1); bb.putShort(1)                 // PCM, mono
    bb.putInt(rate); bb.putInt(rate * 2)           // byte rate
    bb.putShort(2); bb.putShort(16)                // block align, bits
    bb.put("data".getBytes("US-ASCII")); bb.putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Decompression-bomb guard: reject data chunks whose DECLARED size
    * exceeds this before allocating (the q161 lesson, audio edition). */
  private val maxWavDataBytes = 64 << 20

  /** REAL WAV decode: walk the RIFF chunk list, validate PCM/16-bit/mono,
    * and reduce the sample stream to an exact integer energy grid
    * (`buckets` equal spans of summed |amplitude|). Malformed, truncated,
    * or unsupported payloads are DROPPED, not faked — same contract as
    * [[decodeFeaturesImageIO]]. Row-local, narrow, one pass per payload. */
  def decodeFeaturesWav(media: Dataset[MediaRecord], buckets: Int = 8)
                       (implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.flatMap(r => decodeOneWav(r, buckets)))
  }

  private[graft] def decodeOneWav(r: MediaRecord,
                                      buckets: Int): Option[AudioFeatures] =
    try {
      val bb = java.nio.ByteBuffer.wrap(r.content)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def str4(): String = {
        val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
      }
      if (bb.remaining() < 12 || str4() != "RIFF") None
      else {
        bb.getInt()
        if (str4() != "WAVE") None
        else {
          var fmtCode = -1; var ch = -1; var rate = -1; var bits = -1
          var data: Array[Byte] = null
          while (bb.remaining() >= 8 && data == null) {
            val cid = str4(); val sz = bb.getInt()
            if (sz < 0 || sz > bb.remaining()) throw new java.io.EOFException
            // RIFF word alignment: an odd-sized chunk is followed by one
            // pad byte NOT counted in its size — skip it or the walk
            // derails on real-world files with odd metadata chunks
            val pad = sz & 1
            cid match {
              case "fmt " if sz >= 16 =>
                fmtCode = bb.getShort(); ch = bb.getShort()
                rate = bb.getInt(); bb.getInt(); bb.getShort()
                bits = bb.getShort()
                bb.position(math.min(bb.limit(), bb.position() + (sz - 16) + pad))
              case "data" =>
                if (sz > maxWavDataBytes) throw new java.io.EOFException
                data = new Array[Byte](sz); bb.get(data)
              case _ =>
                bb.position(math.min(bb.limit(), bb.position() + sz + pad))
            }
          }
          if (fmtCode != 1 || ch != 1 || bits != 16 || rate <= 0 ||
              data == null || data.length < 2) None
          else {
            val sb = java.nio.ByteBuffer.wrap(data)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN).asShortBuffer()
            val n = data.length / 2
            val energy = new Array[Long](buckets)
            var k = 0
            while (k < n) {
              energy((k.toLong * buckets / n).toInt) += math.abs(sb.get(k).toLong)
              k += 1
            }
            Some(AudioFeatures(r.doc_id, rate, ch, bits, n.toLong, energy))
          }
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}
