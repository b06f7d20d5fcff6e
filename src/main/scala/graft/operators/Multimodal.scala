package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads ride through the
  * relational engine as opaque `binary` columns with typed metadata, and
  * decode/feature steps run partition-parallel over the bytes.
  *
  * Two tiers live here. The REAL pure-JVM codecs (PNG decode + bilinear
  * resample via `javax.imageio`, animated-GIF frame sequences, WAV PCM
  * via `javax.sound.sampled`, RIFF/AVI video containers with
  * uncompressed 24-bit DIB frames parsed byte by byte, and MJPEG-in-AVI
  * whose frames run the JDK's full baseline-JPEG entropy decoder —
  * Huffman, dequantize, IDCT) decode genuine container bytes and are
  * oracle-certified down to per-pixel/per-sample checksums (the lossy
  * MJPEG tier certifies a decoder-independent per-frame tolerance bound
  * instead of a checksum). The remaining kernels are clearly-marked
  * DETERMINISTIC STUBS (inter-frame-predicted codecs — mp4/h264 — aren't
  * available in a pure JVM and aren't SQL-replayable) — they derive fake
  * dimensions/features from the payload bytes so the surrounding
  * plumbing (schema, batch shape, partition-parallel execution,
  * downstream joins) stays real and tested; swapping a stub for a
  * JNI/FFmpeg call changes one function body only.
  */
object Multimodal {

  /** Output schema of [[decodeStub]] — what a real image decoder yields. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** Wrap a text corpus as a fake media corpus: payload = utf-8 bytes,
    * media_type round-robined — the shape a real ingest would produce.
    */
  def attachPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast(LongType).as("doc_id"),
      element_at(
        array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
        (pmod(col(idCol), lit(3)) + 1).cast(IntegerType)).as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decode: partition-parallel over the binary payload; "width",
    * "height" and "n_frames" are deterministic functions of the bytes in
    * place of a real codec. Runs via mapPartitions so a real decoder's
    * per-partition init (codec contexts, GPU handles) has a home.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodedSchema)
    media
      .select(col("doc_id"), col("media_type"), col("payload"))
      // a NULL payload is an undecodable record: dropped here, exactly
      // where a real decoder would quarantine it (a null byte array
      // would otherwise NPE inside the codec kernel)
      .filter(col("payload").isNotNull && col("media_type").isNotNull)
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val mt = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          // STUB: a real implementation parses the container header here.
          // The fake dimensions are arithmetic in the byte count, so the
          // decode output stays predictable by an external oracle.
          val n = bytes.length.toLong
          Row(id, mt, n,
            (256 + n % 512).toInt, (256 + (n / 512) % 512).toInt,
            if (mt == "video/mp4") (1 + n % 240).toInt else 1)
        }
      }(enc)
  }

  /** STUB feature extraction: a unit-normalized 8-dim "embedding" from
    * byte statistics — stands in for a vision/audio encoder. Pure column
    * expressions, so it stays inside whole-stage codegen.
    */
  def featureStub(media: DataFrame, dim: Int = 8): DataFrame = {
    val feats = (0 until dim).map { i =>
      (pmod(xxhash64(col("payload"), lit(i)), lit(1000)).cast(DoubleType) / 500.0) - 1.0
    }
    media.select(
      col("doc_id"),
      array(feats: _*).as("features"))
  }

  /** Resize stage: target dimensions fitting `maxEdge` with the aspect
    * ratio preserved (integer floor arithmetic, portable to any ANSI
    * engine). This is the metadata half of an image resize — the pixel
    * resample itself belongs in the decode kernel ([[decodeStub]]) where
    * the codec lives; every downstream consumer only sees the typed
    * (out_w, out_h) the way it would from a real resizer.
    */
  def resizeStub(decoded: DataFrame, maxEdge: Int): DataFrame = {
    decoded.withColumns(Map(
      "out_w" -> expr(s"(width * $maxEdge) div greatest(width, height)")
        .cast(IntegerType),
      "out_h" -> expr(s"(height * $maxEdge) div greatest(width, height)")
        .cast(IntegerType)))
  }

  /** Frame sampling for video payloads: every `stride`-th frame index up
    * to the decoded frame count — the (doc_id, frame_no) explosion a
    * frame-level pipeline consumes.
    */
  def sampleFrames(decoded: DataFrame, stride: Int): DataFrame =
    decoded
      .filter(col("media_type") === "video/mp4")
      .select(
        col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride)))
          .as("frame_no"))

  // --- REAL image codec (pure-JVM javax.imageio) --------------------------
  //
  // The stub kernels above stay as the oracle-certifiable twins; the
  // functions below run an actual PNG/JPEG codec in the same
  // mapPartitions seam, so the engine demonstrably decodes real bytes,
  // not just arithmetic stand-ins. Certification scheme: the synthetic
  // corpus paints each pixel as a pure function of (doc_id, x, y), PNG is
  // lossless, and the decoder reports a full-pixel checksum — an external
  // SQL oracle predicts dimensions AND checksum arithmetically, so a
  // hash-match proves the encode→bytes→decode round trip touched every
  // pixel.

  /** Output schema of [[decodeImage]]: real codec outputs plus the
    * full-pixel checksum that certifies decoded CONTENT, not just
    * container metadata.
    */
  val imageDecodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("px_sum", LongType, nullable = false)))

  private val imagePayloadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Deterministic PNG corpus: one real encoded image per input id, with
    * dimensions `16 + id%32` × `16 + (id/32)%32` and pixel (x, y) =
    * RGB((id+x)%256, (id+y)%256, (id+x+y)%256) — every byte of the
    * payload is a pure function of the id, so an oracle can predict what
    * a correct decoder must read back. Encoding runs partition-parallel
    * (the codec-per-partition shape a real media ingest has).
    */
  def synthImages(docs: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(imagePayloadSchema)
    // spread before the codec map: PNG encode is per-row work a
    // single-row-group corpus must not serialize into a handful of tasks
    graft.sources.Tables.spread(docs.select(col(idCol).cast(LongType).as("doc_id")))
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file stream cache
        rows.map { r =>
          val id = r.getLong(0)
          val w = 16 + (((id % 32) + 32) % 32).toInt
          val h = 16 + (((id / 32 % 32) + 32) % 32).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var x = 0
          while (x < w) {
            var y = 0
            while (y < h) {
              val rr = ((id + x) % 256).toInt
              val gg = ((id + y) % 256).toInt
              val bb = ((id + x + y) % 256).toInt
              img.setRGB(x, y, (rr << 16) | (gg << 8) | bb)
              y += 1
            }
            x += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          Row(id, "image/png", bos.toByteArray)
        }
      }(enc)
  }

  /** REAL decode: `javax.imageio` PNG/JPEG in the mapPartitions seam.
    * Reports container dimensions and the sum over all pixels of
    * r+g+b. Undecodable payloads (null, truncated, wrong magic) are
    * quarantined — dropped here, exactly where [[decodeStub]] documents
    * the seam — instead of failing the stage.
    */
  def decodeImage(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(imageDecodedSchema)
    media
      .select(col("doc_id"), col("payload"))
      .filter(col("payload").isNotNull)
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file stream cache
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            // NonFatal, not just IOException: imageio readers throw
            // RuntimeExceptions (IllegalArgument, NegativeArraySize) on
            // magic-valid but corrupt containers — those are quarantine
            // cases too, not stage failures
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) Iterator.empty // quarantined: not a decodable image
          else {
            val w = img.getWidth
            val h = img.getHeight
            var s = 0L
            var x = 0
            while (x < w) {
              var y = 0
              while (y < h) {
                val p = img.getRGB(x, y)
                s += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
                y += 1
              }
              x += 1
            }
            Iterator.single(Row(id, bytes.length.toLong, w, h, s))
          }
        }
      }(enc)
  }

  /** REAL aspect-preserving resample: decode, bilinear-resample so the
    * long edge fits `maxEdge` (same integer floor arithmetic as
    * [[resizeStub]], so the dims are oracle-predictable), re-encode PNG.
    * Output carries the resized payload — a later [[decodeImage]] pass
    * proves the emitted bytes really are an image of the claimed size.
    */
  def resizeImage(media: DataFrame, maxEdge: Int): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(imagePayloadSchema)
    media
      .select(col("doc_id"), col("payload"))
      .filter(col("payload").isNotNull)
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file stream cache
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            // NonFatal, not just IOException: imageio readers throw
            // RuntimeExceptions (IllegalArgument, NegativeArraySize) on
            // magic-valid but corrupt containers — those are quarantine
            // cases too, not stage failures
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null) Iterator.empty
          else {
            val w = img.getWidth
            val h = img.getHeight
            val long = math.max(w, h)
            val ow = math.max(1, w * maxEdge / long)
            val oh = math.max(1, h * maxEdge / long)
            val dst = new java.awt.image.BufferedImage(
              ow, oh, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = dst.createGraphics()
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, ow, oh, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(dst, "png", bos)
            Iterator.single(Row(id, "image/png", bos.toByteArray))
          }
        }
      }(enc)
  }

  // --- REAL multi-frame codec (pure-JVM animated GIF via javax.imageio) ---
  //
  // The closest pure-JVM stand-in for video: a real container with a
  // frame SEQUENCE. Frames are painted as solid colors from an explicit
  // 8-entry indexed palette — GIF stores the palette verbatim (no
  // quantization of colors already in it), so the decode is lossless and
  // an oracle can predict frame count, dimensions and the all-frame
  // pixel checksum arithmetically.

  /** Output schema of [[decodeFrames]]. */
  val framesDecodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("px_sum", LongType, nullable = false)))

  /** Palette entry k (k in 0..7): RGB((37k)%256, (73k)%256, (109k)%256). */
  private def paletteRgb(k: Int): (Int, Int, Int) =
    ((37 * k) % 256, (73 * k) % 256, (109 * k) % 256)

  /** Deterministic animated-GIF corpus: `1 + id%8` frames of
    * `(8 + id%8) × (8 + (id/8)%8)` pixels, frame f filled with palette
    * color `(id + f) % 8`.
    */
  def synthGifs(docs: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(imagePayloadSchema)
    // spread before the codec map (see synthImages): per-row encode work
    graft.sources.Tables.spread(docs.select(col(idCol).cast(LongType).as("doc_id")))
      .mapPartitions { rows =>
        val (rs, gs, bs) = (new Array[Byte](8), new Array[Byte](8), new Array[Byte](8))
        (0 until 8).foreach { k =>
          val (r, g, b) = paletteRgb(k)
          rs(k) = r.toByte; gs(k) = g.toByte; bs(k) = b.toByte
        }
        val icm = new java.awt.image.IndexColorModel(3, 8, rs, gs, bs)
        // one writer per partition (registry scan + allocation are not
        // per-row costs); reset() detaches it between containers, and the
        // completion wrapper below disposes it once the partition drains —
        // writers can pin native resources on long-running executors
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("gif").next()
        val out = rows.map { r =>
          val id = r.getLong(0)
          val w = 8 + (((id % 8) + 8) % 8).toInt
          val h = 8 + (((id / 8 % 8) + 8) % 8).toInt
          val nf = 1 + (((id % 8) + 8) % 8).toInt
          val bos = new java.io.ByteArrayOutputStream()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
          writer.reset()
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
            val g2 = img.createGraphics()
            val (cr, cg, cb) = paletteRgb(((id + f) % 8).toInt)
            g2.setColor(new java.awt.Color(cr, cg, cb))
            g2.fillRect(0, 0, w, h)
            g2.dispose()
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
          ios.close()
          Row(id, "image/gif", bos.toByteArray)
        }
        new Iterator[Row] {
          def hasNext: Boolean = {
            val more = out.hasNext
            if (!more) writer.dispose()
            more
          }
          def next(): Row = out.next()
        }
      }(enc)
  }

  /** REAL frame-sequence decode: `javax.imageio`'s GIF reader in the
    * mapPartitions seam — frame count from the container, per-frame
    * pixels summed into one checksum. Undecodable payloads quarantine,
    * mirroring [[decodeImage]].
    */
  def decodeFrames(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(framesDecodedSchema)
    media
      .select(col("doc_id"), col("payload"))
      .filter(col("payload").isNotNull)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          var reader: javax.imageio.ImageReader = null
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) Iterator.empty
            else {
              reader = readers.next()
              reader.setInput(iis)
              val nf = reader.getNumImages(true)
              var s = 0L
              var w = 0
              var h = 0
              var f = 0
              while (f < nf) {
                val img = reader.read(f)
                w = img.getWidth
                h = img.getHeight
                var x = 0
                while (x < w) {
                  var y = 0
                  while (y < h) {
                    val p = img.getRGB(x, y)
                    s += ((p >> 16) & 0xFF) + ((p >> 8) & 0xFF) + (p & 0xFF)
                    y += 1
                  }
                  x += 1
                }
                f += 1
              }
              Iterator.single(Row(id, bytes.length.toLong, w, h, nf, s))
            }
          } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
          finally {
            if (reader != null) reader.dispose()
            iis.close()
          }
        }
      }(enc)
  }

  // --- REAL audio codec (pure-JVM javax.sound.sampled) --------------------
  //
  // Same certification scheme as the image path: every PCM sample of the
  // synthetic corpus is a pure function of (doc_id, t), the WAV container
  // is lossless PCM, and the decoder reports sample count, rate and a
  // full-sample checksum — so an external SQL oracle proves the
  // encode→bytes→decode round trip read every sample.

  /** Output schema of [[decodeAudio]]. */
  val audioDecodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("amp_sum", LongType, nullable = false)))

  /** Deterministic WAV corpus: one real RIFF/WAVE container per id —
    * 16-bit signed PCM mono at 8 kHz, `400 + id%800` samples, sample t =
    * `((id·31 + t·17) mod 65536) − 32768`. Every byte of the payload is
    * a pure function of the id.
    */
  def synthWavs(docs: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(imagePayloadSchema)
    // spread before the codec map (see synthImages): per-row encode work.
    // The container is assembled BYTE BY BYTE (canonical 44-byte RIFF/WAVE
    // PCM header — identical to what AudioSystem.write emits) instead of
    // through javax.sound's AudioSystem: its service-provider registry
    // serializes concurrent writers on a global lock, which made the
    // spread-out synth SLOWER than the old 2-task layout (0.50 s → 1.22 s
    // at sf0.1). The REAL codec certification lives on the decode side
    // ([[decodeAudio]]), which still parses these bytes via javax.sound.
    graft.sources.Tables.spread(docs.select(col(idCol).cast(LongType).as("doc_id")))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val n = 400 + (((id % 800) + 800) % 800).toInt
          val out = new Array[Byte](44 + n * 2)
          def le32(at: Int, v: Int): Unit = {
            out(at) = (v & 0xFF).toByte; out(at + 1) = ((v >> 8) & 0xFF).toByte
            out(at + 2) = ((v >> 16) & 0xFF).toByte; out(at + 3) = ((v >> 24) & 0xFF).toByte
          }
          def le16(at: Int, v: Int): Unit = {
            out(at) = (v & 0xFF).toByte; out(at + 1) = ((v >> 8) & 0xFF).toByte
          }
          def tag(at: Int, s: String): Unit =
            System.arraycopy(s.getBytes("US-ASCII"), 0, out, at, 4)
          tag(0, "RIFF"); le32(4, 36 + n * 2); tag(8, "WAVE")
          tag(12, "fmt "); le32(16, 16)
          le16(20, 1) /* PCM */; le16(22, 1) /* mono */
          le32(24, 8000); le32(28, 16000) /* byte rate */
          le16(32, 2) /* block align */; le16(34, 16) /* bits */
          tag(36, "data"); le32(40, n * 2)
          var t = 0
          while (t < n) {
            val v = ((id * 31 + t * 17) % 65536 - 32768).toInt
            out(44 + 2 * t) = (v & 0xFF).toByte // little-endian
            out(44 + 2 * t + 1) = ((v >> 8) & 0xFF).toByte
            t += 1
          }
          Row(id, "audio/wav", out)
        }
      }(enc)
  }

  /** Open an audio stream through the javax.sound SPI readers loaded
    * ONCE for this partition. `AudioSystem.getAudioInputStream` re-fetches
    * the provider list per call through a synchronized static
    * (JDK13Services.getProviders) — a global lock that serialized the
    * 32-task decode stage; loading the same providers per partition via
    * the public ServiceLoader API runs the identical WAV parser with no
    * shared lock.
    */
  private def openAudio(readers: List[javax.sound.sampled.spi.AudioFileReader],
      bytes: Array[Byte]): Option[javax.sound.sampled.AudioInputStream] =
    readers.iterator.flatMap { rd =>
      try Option(rd.getAudioInputStream(new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
    }.take(1).toList.headOption

  private def audioReaders(): List[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader]).asScala.toList
      // WAV reader first: every non-matching reader rejects a clip by
      // THROWING (a filled-in stack trace per clip per reader) — on a
      // 50k-clip corpus the misses cost more than the parses
      .sortBy(r => if (r.getClass.getName.toLowerCase.contains("wave")) 0 else 1)
  }

  /** REAL audio decode: `javax.sound.sampled` WAV parsing in the
    * mapPartitions seam — container header read by the codec (sample
    * rate, frame count), PCM frames decoded to signed samples, `amp_sum`
    * = the plain sum of all sample values. Undecodable payloads (null,
    * truncated, wrong magic, non-PCM) are quarantined, mirroring
    * [[decodeImage]].
    */
  def decodeAudio(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(audioDecodedSchema)
    media
      .select(col("doc_id"), col("payload"))
      .filter(col("payload").isNotNull)
      .mapPartitions { rows =>
        val readers = audioReaders()
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val decoded =
            try {
              openAudio(readers, bytes).flatMap { ais =>
                try decodeWav(id, bytes, ais)
                finally ais.close()
              }
            } catch { case scala.util.control.NonFatal(_) => None }
          decoded.iterator
        }
      }(enc)
  }

  private def decodeWav(id: Long, bytes: Array[Byte],
      ais: javax.sound.sampled.AudioInputStream): Option[Row] = {
    val fmt = ais.getFormat
    if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
      fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
      None
    else {
      val pcm = ais.readAllBytes()
      val n = pcm.length / 2
      var s = 0L
      var t = 0
      if (fmt.isBigEndian) {
        while (t < n) {
          s += ((pcm(2 * t) << 8) | (pcm(2 * t + 1) & 0xFF)).toShort.toLong
          t += 1
        }
      } else {
        while (t < n) {
          s += (((pcm(2 * t + 1) << 8) | (pcm(2 * t) & 0xFF)).toShort).toLong
          t += 1
        }
      }
      Some(Row(id, bytes.length.toLong, fmt.getSampleRate.toInt, n.toLong, s))
    }
  }

  // --- Audio frame features (energy + zero-crossing rate) ---------------
  //
  // The first real signal-processing stage over the decoded PCM: frame
  // the sample stream (non-overlapping windows) and emit each frame's
  // energy (Σ s²) and zero-crossing count — the classic cheap features
  // for voice-activity detection and silence trimming in audio curation
  // pipelines. Both are INTEGER functions of the samples, so unlike
  // FFT-based features (whose float last-ulp behavior is
  // engine-specific) every output value is oracle-replayable from the
  // synthetic corpus's sample formula.

  /** Output schema of [[audioFrameFeatures]]. */
  val audioFramesSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("n_samp", LongType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("zcr", LongType, nullable = false)))

  /** Decode each WAV and emit per non-overlapping `frameLen`-sample
    * frame: sample count (the tail frame may be short), energy Σ s², and
    * the zero-crossing count (sign flips between CONSECUTIVE samples
    * inside the frame; sign(s) = s ≥ 0). Undecodable payloads are
    * quarantined, mirroring [[decodeAudio]].
    */
  def audioFrameFeatures(media: DataFrame, frameLen: Int = 256): DataFrame = {
    require(frameLen > 0, s"frameLen must be positive, got $frameLen")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(audioFramesSchema)
    media
      .select(col("doc_id"), col("payload"))
      .filter(col("payload").isNotNull)
      .mapPartitions { rows =>
        val readers = audioReaders() // once per partition — see openAudio
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val samples: Option[Array[Int]] =
            try {
              openAudio(readers, bytes).flatMap { ais =>
                try {
                val fmt = ais.getFormat
                if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
                  fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
                  None
                else {
                  val pcm = ais.readAllBytes()
                  val n = pcm.length / 2
                  val out = new Array[Int](n)
                  var t = 0
                  if (fmt.isBigEndian)
                    while (t < n) {
                      out(t) = ((pcm(2 * t) << 8) | (pcm(2 * t + 1) & 0xFF)).toShort.toInt
                      t += 1
                    }
                  else
                    while (t < n) {
                      out(t) = ((pcm(2 * t + 1) << 8) | (pcm(2 * t) & 0xFF)).toShort.toInt
                      t += 1
                    }
                  Some(out)
                }
                } finally ais.close()
              }
            } catch { case scala.util.control.NonFatal(_) => None }
          samples match {
            case None => Iterator.empty
            case Some(s) =>
              (0 until (s.length + frameLen - 1) / frameLen).iterator.map { f =>
                val from = f * frameLen
                val until = math.min(from + frameLen, s.length)
                var energy = 0L; var zcr = 0L
                var t = from
                while (t < until) {
                  energy += s(t).toLong * s(t)
                  if (t > from && ((s(t) >= 0) != (s(t - 1) >= 0))) zcr += 1
                  t += 1
                }
                Row(id, f.toLong, (until - from).toLong, energy, zcr)
              }
          }
        }
      }(enc)
  }

  // --- REAL video container codec (RIFF/AVI, uncompressed 24-bit DIB) ----
  //
  // A TRUE video container, parsed byte by byte: RIFF('AVI ') with the
  // standard hdrl (avih + strl{strh 'vids'/'DIB ', strf BITMAPINFOHEADER})
  // and a movi list of '00db' frames — uncompressed bottom-up BGR rows
  // padded to 4 bytes, the BI_RGB AVI any media player opens. Unlike
  // DCT-based codecs, raw DIB frames are LOSSLESS, so an oracle predicts
  // the all-frame pixel checksum arithmetically — the same certification
  // the PNG/GIF/WAV codecs carry, now over a real video container. (The
  // mp4/h264 tier stays behind the documented stub seam: entropy-coded
  // codecs aren't replayable in SQL and aren't available pure-JVM.)

  private def leInt(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
  }
  private def leShort(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
  }
  private def fourcc(out: java.io.ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"))

  /** Deterministic AVI corpus: `1 + id%6` uncompressed 24-bit frames of
    * `(8 + id%8) × (8 + (id/8)%8)` pixels; pixel (x, y) of frame f has
    * r = (id+x)%256, g = (id+y)%256, b = (id+x+y+f)%256. Every byte of
    * the container is a pure function of the id.
    */
  def synthAvis(docs: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(imagePayloadSchema)
    // spread before the codec map (see synthImages): per-row encode work
    graft.sources.Tables.spread(docs.select(col(idCol).cast(LongType).as("doc_id")))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val w = 8 + (((id % 8) + 8) % 8).toInt
          val h = 8 + (((id / 8 % 8) + 8) % 8).toInt
          val nf = 1 + (((id % 6) + 6) % 6).toInt
          val rowBytes = (w * 3 + 3) / 4 * 4
          val frameBytes = rowBytes * h
          val frames = (0 until nf).map { f =>
            val buf = new Array[Byte](frameBytes)
            var y = 0
            while (y < h) {
              val base = (h - 1 - y) * rowBytes // bottom-up rows
              var x = 0
              while (x < w) {
                buf(base + 3 * x) = ((id + x + y + f) % 256).toByte // B
                buf(base + 3 * x + 1) = ((id + y) % 256).toByte // G
                buf(base + 3 * x + 2) = ((id + x) % 256).toByte // R
                x += 1
              }
              y += 1
            }
            buf
          }
          // strf: BITMAPINFOHEADER (40 bytes)
          val strf = new java.io.ByteArrayOutputStream()
          leInt(strf, 40); leInt(strf, w); leInt(strf, h)
          leShort(strf, 1); leShort(strf, 24)
          leInt(strf, 0) // BI_RGB
          leInt(strf, frameBytes); leInt(strf, 0); leInt(strf, 0)
          leInt(strf, 0); leInt(strf, 0)
          // strh: AVIStreamHeader (56 bytes)
          val strh = new java.io.ByteArrayOutputStream()
          fourcc(strh, "vids"); fourcc(strh, "DIB ")
          leInt(strh, 0); leShort(strh, 0); leShort(strh, 0); leInt(strh, 0)
          leInt(strh, 1); leInt(strh, 10) // scale/rate: 10 fps
          leInt(strh, 0); leInt(strh, nf)
          leInt(strh, frameBytes); leInt(strh, -1); leInt(strh, 0)
          leShort(strh, 0); leShort(strh, 0); leShort(strh, w.toShort)
          leShort(strh, h.toShort)
          // avih: MainAVIHeader (56 bytes)
          val avih = new java.io.ByteArrayOutputStream()
          leInt(avih, 100000); leInt(avih, frameBytes * 10)
          leInt(avih, 0); leInt(avih, 0x10) // AVIF_HASINDEX
          leInt(avih, nf); leInt(avih, 0); leInt(avih, 1)
          leInt(avih, frameBytes); leInt(avih, w); leInt(avih, h)
          (0 until 4).foreach(_ => leInt(avih, 0))
          def chunk(id4: String, body: Array[Byte]): Array[Byte] = {
            val o = new java.io.ByteArrayOutputStream()
            fourcc(o, id4); leInt(o, body.length); o.write(body)
            if (body.length % 2 == 1) o.write(0) // RIFF chunks pad to even
            o.toByteArray
          }
          def list(kind: String, body: Array[Byte]): Array[Byte] = {
            val o = new java.io.ByteArrayOutputStream()
            fourcc(o, "LIST"); leInt(o, body.length + 4); fourcc(o, kind)
            o.write(body)
            o.toByteArray
          }
          val strl = list("strl",
            chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray))
          val hdrl = list("hdrl", chunk("avih", avih.toByteArray) ++ strl)
          val moviBody = frames.map(f => chunk("00db", f))
            .foldLeft(Array.emptyByteArray)(_ ++ _)
          val movi = list("movi", moviBody)
          // idx1: one entry per frame (offset relative to movi list body)
          val idx = new java.io.ByteArrayOutputStream()
          var off = 4 // past the 'movi' kind fourcc
          frames.foreach { f =>
            fourcc(idx, "00db"); leInt(idx, 0x10) // AVIIF_KEYFRAME
            leInt(idx, off); leInt(idx, f.length)
            off += 8 + f.length + (f.length % 2)
          }
          val riffBody = hdrl ++ movi ++ chunk("idx1", idx.toByteArray)
          val out = new java.io.ByteArrayOutputStream()
          fourcc(out, "RIFF"); leInt(out, riffBody.length + 4)
          fourcc(out, "AVI "); out.write(riffBody)
          Row(id, "video/avi", out.toByteArray)
        }
      }(enc)
  }

  /** REAL video decode: byte-level RIFF/AVI parsing — container magic,
    * hdrl→strl→strf BITMAPINFOHEADER (only BI_RGB 24-bit accepted), then
    * every movi '00db'/'00dc' frame chunk summed pixel by pixel honoring
    * the DIB 4-byte row padding. Malformed containers (bad magic,
    * truncated lists, non-DIB streams, frame size ≠ geometry) are
    * quarantined, mirroring [[decodeImage]]. Output matches
    * [[framesDecodedSchema]].
    */
  def decodeVideo(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(framesDecodedSchema)
    media
      .select(col("doc_id"), col("payload"))
      .filter(col("payload").isNotNull)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          try decodeAviBytes(id, b).iterator
          catch { case scala.util.control.NonFatal(_) => Iterator.empty }
        }
      }(enc)
  }

  private def decodeAviBytes(id: Long, b: Array[Byte]): Option[Row] = {
    def str4(at: Int): String =
      new String(b, at, 4, "US-ASCII")
    def int4(at: Int): Int =
      (b(at) & 0xFF) | ((b(at + 1) & 0xFF) << 8) |
        ((b(at + 2) & 0xFF) << 16) | ((b(at + 3) & 0xFF) << 24)
    if (b.length < 12 || str4(0) != "RIFF" || str4(8) != "AVI ") return None
    var w = -1; var h = -1
    var nFrames = 0; var pxSum = 0L
    // walk chunks in [from, until); LIST bodies recurse
    def walk(from: Int, until: Int): Boolean = {
      var at = from
      while (at + 8 <= until) {
        val cid = str4(at)
        val size = int4(at + 4)
        val body = at + 8
        if (size < 0 || body + size > until) return false
        cid match {
          case "LIST" =>
            if (size < 4) return false
            if (!walk(body + 4, body + size)) return false
          case "strf" =>
            // BITMAPINFOHEADER: only uncompressed 24-bit BI_RGB accepted
            if (size < 40) return false
            val bw = int4(body + 4); val bh = int4(body + 8)
            val planes = (b(body + 12) & 0xFF) | ((b(body + 13) & 0xFF) << 8)
            val bpp = (b(body + 14) & 0xFF) | ((b(body + 15) & 0xFF) << 8)
            val comp = int4(body + 16)
            if (planes != 1 || bpp != 24 || comp != 0 || bw <= 0 || bh <= 0)
              return false
            w = bw; h = bh
          case "00db" | "00dc" =>
            if (w < 0) return false // frame before the format header
            val rowBytes = (w * 3 + 3) / 4 * 4
            if (size != rowBytes * h) return false
            var y = 0
            while (y < h) {
              val base = body + y * rowBytes
              var x = 0
              while (x < w * 3) {
                pxSum += b(base + x) & 0xFF
                x += 1
              }
              y += 1
            }
            nFrames += 1
          case _ => () // avih/strh/idx1/junk: geometry comes from strf
        }
        at = body + size + (size % 2) // RIFF even-byte alignment
      }
      true
    }
    if (!walk(12, b.length) || w < 0 || nFrames == 0) None
    else Some(Row(id, b.length.toLong, w, h, nFrames, pxSum))
  }

  // --- REAL entropy-coded video (MJPEG-in-AVI via javax.imageio) --------
  //
  // The DIB AVI above proves container parsing; this tier adds a REAL
  // entropy decoder in the frame path: each '00dc' chunk is a complete
  // baseline-JPEG image (Huffman tables, DCT coefficients, quantization),
  // decoded through the JDK's javax.imageio JPEG plugin — no native deps.
  // JPEG is lossy, so an oracle cannot predict pixel checksums the way it
  // does for PNG/GIF/DIB; instead the corpus is SOLID-COLOR per frame
  // (DC-only blocks, exact under chroma subsampling), and the certified
  // invariant is decoder-independent: every frame must decode to within a
  // small tolerance of its synthesized color, else the consuming query's
  // ok_frames < n_frames and the hash mismatches. That bounds the whole
  // chain — container walk, chunk extraction, Huffman decode, dequantize,
  // IDCT, color conversion — without depending on any IDCT's exact
  // rounding. (Inter-frame-predicted codecs, mp4/h264, remain behind the
  // documented stub seam at the top of this file.)

  /** One row per decoded JPEG frame: geometry from the DECODED image (not
    * the container header) plus per-channel min/max — for a solid frame
    * min = max = the decoded color, and any decode corruption widens the
    * range past the consumer's tolerance.
    */
  val mjpegFramesSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("r_min", IntegerType, nullable = false),
    StructField("r_max", IntegerType, nullable = false),
    StructField("g_min", IntegerType, nullable = false),
    StructField("g_max", IntegerType, nullable = false),
    StructField("b_min", IntegerType, nullable = false),
    StructField("b_max", IntegerType, nullable = false)))

  /** Deterministic MJPEG corpus: `1 + id%3` frames of
    * `(16 + (id%4)*8) × (16 + (id/4%4)*8)` pixels, frame f a SOLID color
    * r=(5·id+31·f)%256, g=(7·id+37·f)%256, b=(11·id+41·f)%256 — encoded
    * per frame as a real baseline JPEG (quality 1.0) inside a standard
    * RIFF/AVI 'MJPG' container. Geometry and colors are pure functions of
    * the id, so the oracle replays them in SQL.
    */
  def synthMjpegAvis(docs: DataFrame, idCol: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(imagePayloadSchema)
    // spread before the codec map: JPEG encode is the one synth whose
    // per-row cost dwarfs the scan, so a single-row-group corpus must not
    // serialize it into a handful of tasks (same rationale as the dedup
    // block's shingle explode)
    graft.sources.Tables.spread(docs.select(col(idCol).cast(LongType).as("doc_id")))
      .mapPartitions { rows =>
        // memory-backed imageio streams: the default ImageIO stream cache
        // writes a TEMP FILE per encoded/decoded image — measured as the
        // dominant cost of this codec at sf1
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { r =>
          val id = r.getLong(0)
          val w = 16 + (((id % 4) + 4) % 4).toInt * 8
          val h = 16 + (((id / 4 % 4) + 4) % 4).toInt * 8
          val nf = 1 + (((id % 3) + 3) % 3).toInt
          // one writer per clip, reused across its frames (registry scan +
          // writer construction cost a large fraction of a small encode)
          val writer = javax.imageio.ImageIO
            .getImageWritersByFormatName("jpeg").next()
          val frames =
            try (0 until nf).map { f =>
              val rr = (((5 * id + 31 * f) % 256) + 256) % 256
              val gg = (((7 * id + 37 * f) % 256) + 256) % 256
              val bb = (((11 * id + 41 * f) % 256) + 256) % 256
              val img = new java.awt.image.BufferedImage(
                w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val rgb = (rr.toInt << 16) | (gg.toInt << 8) | bb.toInt
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) { img.setRGB(x, y, rgb); x += 1 }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
              try {
                writer.setOutput(ios)
                val p = writer.getDefaultWriteParam
                p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
                p.setCompressionQuality(1.0f)
                writer.write(null,
                  new javax.imageio.IIOImage(img, null, null), p)
              } finally ios.close()
              bos.toByteArray
            } finally writer.dispose()
          def chunk(id4: String, body: Array[Byte]): Array[Byte] = {
            val o = new java.io.ByteArrayOutputStream()
            fourcc(o, id4); leInt(o, body.length); o.write(body)
            if (body.length % 2 == 1) o.write(0)
            o.toByteArray
          }
          def list(kind: String, body: Array[Byte]): Array[Byte] = {
            val o = new java.io.ByteArrayOutputStream()
            fourcc(o, "LIST"); leInt(o, body.length + 4); fourcc(o, kind)
            o.write(body)
            o.toByteArray
          }
          val maxFrame = frames.map(_.length).max
          // strf: BITMAPINFOHEADER with biCompression = 'MJPG'
          val strf = new java.io.ByteArrayOutputStream()
          leInt(strf, 40); leInt(strf, w); leInt(strf, h)
          leShort(strf, 1); leShort(strf, 24)
          fourcc(strf, "MJPG")
          leInt(strf, 0); leInt(strf, 0); leInt(strf, 0)
          leInt(strf, 0); leInt(strf, 0)
          // strh: 'vids'/'MJPG'
          val strh = new java.io.ByteArrayOutputStream()
          fourcc(strh, "vids"); fourcc(strh, "MJPG")
          leInt(strh, 0); leShort(strh, 0); leShort(strh, 0); leInt(strh, 0)
          leInt(strh, 1); leInt(strh, 10)
          leInt(strh, 0); leInt(strh, nf)
          leInt(strh, maxFrame); leInt(strh, -1); leInt(strh, 0)
          leShort(strh, 0); leShort(strh, 0); leShort(strh, w.toShort)
          leShort(strh, h.toShort)
          val avih = new java.io.ByteArrayOutputStream()
          leInt(avih, 100000); leInt(avih, maxFrame * 10)
          leInt(avih, 0); leInt(avih, 0x10)
          leInt(avih, nf); leInt(avih, 0); leInt(avih, 1)
          leInt(avih, maxFrame); leInt(avih, w); leInt(avih, h)
          (0 until 4).foreach(_ => leInt(avih, 0))
          val strl = list("strl",
            chunk("strh", strh.toByteArray) ++ chunk("strf", strf.toByteArray))
          val hdrl = list("hdrl", chunk("avih", avih.toByteArray) ++ strl)
          val moviBody = frames.map(f => chunk("00dc", f))
            .foldLeft(Array.emptyByteArray)(_ ++ _)
          val movi = list("movi", moviBody)
          val idx = new java.io.ByteArrayOutputStream()
          var off = 4
          frames.foreach { f =>
            fourcc(idx, "00dc"); leInt(idx, 0x10)
            leInt(idx, off); leInt(idx, f.length)
            off += 8 + f.length + (f.length % 2)
          }
          val riffBody = hdrl ++ movi ++ chunk("idx1", idx.toByteArray)
          val out = new java.io.ByteArrayOutputStream()
          fourcc(out, "RIFF"); leInt(out, riffBody.length + 4)
          fourcc(out, "AVI "); out.write(riffBody)
          Row(id, "video/x-mjpeg-avi", out.toByteArray)
        }
      }(enc)
  }

  /** REAL MJPEG decode: RIFF/AVI walk (strf must declare 'MJPG'), then
    * every '00dc' chunk body through the JDK JPEG reader — a true
    * Huffman + dequantize + IDCT path. One output row per frame with the
    * decoded geometry and per-channel extrema; malformed containers and
    * frames the JPEG reader rejects are quarantined, mirroring
    * [[decodeVideo]].
    */
  def decodeMjpegFrames(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mjpegFramesSchema)
    media
      .select(col("doc_id"), col("payload"))
      .filter(col("payload").isNotNull)
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file stream cache
        rows.flatMap { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          try decodeMjpegBytes(id, b)
          catch { case scala.util.control.NonFatal(_) => Seq.empty }
        }
      }(enc)
  }

  // --- Perceptual image hash (aHash) for image near-dup dedup -----------
  //
  // The standard cheap image-dedup signature: decode, average-pool to an
  // 8x8 grid, threshold each cell against the global mean, pack 64 bits.
  // Visually identical images (re-encodes, exact copies) collide on the
  // hash, so dedup is ONE shuffle on the hash value — the image analog of
  // the text pipeline's exact-dup groupBy, with the real PNG codec in the
  // loop. All arithmetic is integer cross-multiplication (cell mean >
  // global mean ⇔ cell_sum·w·h > total·cell_count — no divisions, no
  // doubles), so the oracle replays every bit from the painted corpus's
  // pixel formula. The hash is emitted as two 32-bit halves (ahash_hi =
  // grid rows 4-7, ahash_lo = rows 0-3): a single 64-bit value would set
  // the sign bit, which SQL engines overflow-check differently on the
  // HUGEINT->BIGINT cast; two halves keep every value positive and the
  // (hi, lo) pair joins exactly like one key. Near-dup (Hamming<=k) over
  // these halves composes with the pigeonhole machinery the way
  // dedup_hamming_pairs does; equality is the production fast path.

  /** Output schema of [[imageAHash]]. */
  val imageAHashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("ahash_hi", LongType, nullable = false),
    StructField("ahash_lo", LongType, nullable = false)))

  /** Decode each payload with the real codec and compute its 8x8 average
    * aHash over the luminance sum r+g+b. Pixel x maps to grid column
    * (8·x) div w (the standard cell assignment; cells of a non-multiple
    * width differ by one pixel). Undecodable payloads are quarantined.
    */
  def imageAHash(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(imageAHashSchema)
    media
      .select(col("doc_id"), col("payload"))
      .filter(col("payload").isNotNull)
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file stream cache
        rows.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null || img.getWidth < 8 || img.getHeight < 8) None
          else {
            val w = img.getWidth; val h = img.getHeight
            val cellSum = Array.ofDim[Long](8, 8)
            val cellN = Array.ofDim[Long](8, 8)
            var total = 0L
            var y = 0
            while (y < h) {
              val cy = (8 * y) / h
              var x = 0
              while (x < w) {
                val cx = (8 * x) / w
                val px = img.getRGB(x, y)
                val lum =
                  (((px >> 16) & 0xFF) + ((px >> 8) & 0xFF) + (px & 0xFF)).toLong
                cellSum(cy)(cx) += lum
                cellN(cy)(cx) += 1
                total += lum
                x += 1
              }
              y += 1
            }
            val area = w.toLong * h
            var hi = 0L; var lo = 0L
            var cy = 0
            while (cy < 8) {
              var cx = 0
              while (cx < 8) {
                // strict >: cell mean above the global mean sets the bit
                if (cellSum(cy)(cx) * area > total * cellN(cy)(cx)) {
                  if (cy >= 4) hi |= 1L << ((cy - 4) * 8 + cx)
                  else lo |= 1L << (cy * 8 + cx)
                }
                cx += 1
              }
              cy += 1
            }
            Some(Row(id, w, h, hi, lo))
          }
        }
      }(enc)
  }

  private def decodeMjpegBytes(id: Long, b: Array[Byte]): Seq[Row] = {
    def str4(at: Int): String = new String(b, at, 4, "US-ASCII")
    def int4(at: Int): Int =
      (b(at) & 0xFF) | ((b(at + 1) & 0xFF) << 8) |
        ((b(at + 2) & 0xFF) << 16) | ((b(at + 3) & 0xFF) << 24)
    if (b.length < 12 || str4(0) != "RIFF" || str4(8) != "AVI ") return Seq.empty
    var isMjpeg = false
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    def walk(from: Int, until: Int): Boolean = {
      var at = from
      while (at + 8 <= until) {
        val cid = str4(at)
        val size = int4(at + 4)
        val body = at + 8
        if (size < 0 || body + size > until) return false
        cid match {
          case "LIST" =>
            if (size < 4) return false
            if (!walk(body + 4, body + size)) return false
          case "strf" =>
            if (size < 40) return false
            if (str4(body + 16) != "MJPG") return false
            isMjpeg = true
          case "00dc" | "00db" =>
            if (!isMjpeg) return false // frame before the format header
            val img = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(b.slice(body, body + size)))
            if (img == null) return false
            val w = img.getWidth; val h = img.getHeight
            var rMin = 255; var rMax = 0; var gMin = 255; var gMax = 0
            var bMin = 255; var bMax = 0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val px = img.getRGB(x, y)
                val rr = (px >> 16) & 0xFF
                val gg = (px >> 8) & 0xFF
                val bb = px & 0xFF
                if (rr < rMin) rMin = rr; if (rr > rMax) rMax = rr
                if (gg < gMin) gMin = gg; if (gg > gMax) gMax = gg
                if (bb < bMin) bMin = bb; if (bb > bMax) bMax = bb
                x += 1
              }
              y += 1
            }
            out += Row(id, out.length, w, h, rMin, rMax, gMin, gMax, bMin, bMax)
          case _ => ()
        }
        at = body + size + (size % 2)
      }
      true
    }
    if (!walk(12, b.length) || out.isEmpty) Seq.empty else out.toSeq
  }
}
