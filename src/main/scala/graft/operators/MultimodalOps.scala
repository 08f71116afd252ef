package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: media travel as opaque `BINARY` payloads plus a typed
  * metadata struct; decode / feature-extraction runs as batched
  * per-partition compute over the binary column; resize and
  * frame-sampling are metadata-plan operations that never touch the
  * payload bytes.
  *
  * Decode kernels:
  *  - a REAL PNG codec path ([[encodePng]]/[[decodePngStats]]) through
  *    `javax.imageio` (in the JDK — no external codec needed): images
  *    are encoded to genuine PNG bytes and decoded back, with exact
  *    per-channel pixel sums proving the round trip lossless;
  *  - a REAL lossy JPEG path ([[encodeJpeg]]/[[jpegFidelityStats]]) —
  *    exact sums plus a mean-fidelity certificate (lossy by design);
  *  - a REAL WAV/PCM audio path ([[encodeWav]]/[[decodeWavStats]])
  *    through `javax.sound.sampled` (also JDK-bundled), same
  *    construction: exact per-channel sample sums prove the encode →
  *    decode round trip bit-lossless through a real audio container;
  *  - a REAL VIDEO path ([[encodeGif]]/[[decodeGifFrameStats]]):
  *    multi-frame animated GIF through `javax.imageio`'s sequence API,
  *    per-frame exact luminance sums proving every frame of the
  *    animation round-trips losslessly;
  *  - a deterministic md5 STUB ([[stubDecodeFeature]]), clearly named,
  *    standing in for external codecs not in this container (libjpeg-
  *    turbo, ffmpeg, …). It gates the BATCH SHAPE — the schema, the
  *    `Dataset[MediaRow]` encoder, the mapPartitions state reuse, the
  *    partitioning and the downstream feature plumbing a production
  *    decoder drops into (exactly as the four real tiers demonstrate).
  *
  * Scale notes:
  *  - Payloads never pass through a wide operator here: decode is a
  *    narrow mapPartitions (CPU-bound, scan-parallel); resize/frame
  *    plans are pure projections. The one rule at 100 TB: filter and
  *    frame-sample on METADATA first, decode last, so the expensive
  *    kernel sees the fewest bytes.
  *  - Feature output is `array<float>` — compact, columnar-friendly,
  *    and directly consumable by [[SimilarityOps]] (ANN, near-dup).
  */
object MultimodalOps {

  /** Typed view of one media row crossing the decode boundary. */
  case class MediaRow(media_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, payload: Array[Byte])

  /** Decoded features for one media item. */
  case class MediaFeatures(media_id: Long, n_bytes: Long, features: Array[Float])

  /** Derive a media table from `documents`: the text bytes stand in for
    * an encoded payload; kind/width/height/n_frames are deterministic
    * functions of (doc_id, n_chars) so every engine derives the same
    * metadata. Schema: (media_id, kind, width, height, n_frames,
    * payload BINARY).
    */
  def asMedia(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(lit(Array("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3L)) + 1).cast("int")).as("kind"),
      (lit(16L) + pmod(col("n_chars"), lit(241L))).cast("int").as("width"),
      (lit(16L) + pmod(col("n_chars") * 7L, lit(241L))).cast("int").as("height"),
      (lit(1L) + pmod(col("doc_id") * 13L, lit(120L))).cast("int").as("n_frames"),
      col(textCol).cast("binary").as("payload"))

  /** STUB decode kernel — stands in for a real image/audio decoder.
    * Deterministic and engine-portable: feature d of a payload is the
    * first 24 bits of md5(payload ++ ":" ++ d) scaled to [0, 1).
    * 24 bits so the value is EXACT in float32 (and its /2^24 scaling is
    * a power of two) — the oracle's double-precision recomputation
    * matches bit-for-bit. A real deployment replaces ONLY this function
    * (e.g. JNI to libjpeg / ffmpeg); the batch plumbing is unchanged.
    */
  def stubDecodeFeature(payload: Array[Byte], dim: Int): Float = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(payload)
    md.update(s":$dim".getBytes("UTF-8"))
    val h = md.digest()
    val u = ((h(0) & 0xff) << 16) | ((h(1) & 0xff) << 8) | (h(2) & 0xff)
    (u.toDouble / 16777216.0).toFloat
  }

  /** Batched decode + feature extraction: one pass per partition over
    * the binary payloads (the Scala analogue of a pandas-batch UDF —
    * the MessageDigest instance and any decoder state are allocated
    * once per PARTITION, then reused row by row). Output:
    * (media_id, n_bytes, features array<float>[nDims]).
    */
  def decodeFeatures(media: DataFrame, nDims: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "width", "height", "n_frames", "payload")
      .as[MediaRow]
      .mapPartitions { rows =>
        // per-partition (per-batch) state — where a real decoder would
        // initialize its codec context once
        rows.map { r =>
          val feats = Array.tabulate(nDims)(d => stubDecodeFeature(r.payload, d))
          MediaFeatures(r.media_id, r.payload.length.toLong, feats)
        }
      }
  }

  // -------------------------------------------------------------------
  // Real codec path: PNG through javax.imageio (JDK-bundled).

  /** One image crossing the real-codec boundary: genuine PNG bytes. */
  case class EncodedImage(media_id: Long, width: Int, height: Int, png: Array[Byte])

  /** Exact per-channel pixel sums of one decoded image. */
  case class ImageStats(media_id: Long, n_px: Long, r_sum: Long, g_sum: Long, b_sum: Long)

  /** Deterministic pixel content: channel values are fixed integer
    * functions of (media_id, x, y), so an oracle can recompute the
    * decoded stats WITHOUT any codec — which is what makes the real
    * encode→decode round trip gateable (the engine path goes formula →
    * PNG encode → `ImageIO.read` → sums; the oracle goes formula →
    * sums; PNG being lossless, they must agree exactly).
    */
  def pixelChannels(mediaId: Long, x: Int, y: Int): (Int, Int, Int) = {
    val m = (mediaId % 256).toInt
    ((7 * x + 3 * y + m) % 256,
     (5 * x + 11 * y + 2 * m) % 256,
     (13 * x + 17 * y + 3 * m) % 256)
  }

  /** Image metadata plan: small deterministic dimensions (8–32 px per
    * side) keyed off doc ids. Small because the gate proves codec
    * FIDELITY, not throughput — the per-pixel loops are O(w·h) per row
    * and scan-parallel regardless of size. [[graft.PlanUtils.spread]]
    * pins an exchange below the codec chain: the single-split test
    * parquet would otherwise feed the CPU-bound encode/decode to ONE
    * core (measured 7.0 → 0.7 s at sf0.1 on 32; a real multi-split
    * lake makes it a no-op).
    */
  def syntheticImageMeta(docs: DataFrame): DataFrame =
    graft.PlanUtils.spread(
      docs.select(col("doc_id").as("media_id"),
        (lit(8) + pmod(col("doc_id"), lit(25L))).cast("int").as("width"),
        (lit(8) + pmod(col("doc_id") * 7L, lit(25L))).cast("int").as("height")))

  /** ENCODE through the real codec: renders each row's deterministic
    * pixel pattern into a `BufferedImage` and writes genuine PNG bytes
    * with `javax.imageio`. Narrow mapPartitions — CPU-bound,
    * scan-parallel, no shuffle.
    */
  def encodePng(meta: DataFrame): Dataset[EncodedImage] = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.select("media_id", "width", "height").as[(Long, Int, Int)]
      .mapPartitions { rows =>
        // per-PARTITION codec state (the batch-shape contract): one PNG
        // writer reused row by row — per-image writer lookup + stream
        // scaffolding is the dominant cost at thumbnail sizes. Disk
        // cache OFF: createImageOutputStream would otherwise back every
        // image with its own temp FILE.
        javax.imageio.ImageIO.setUseCache(false)
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
        rows.map { case (id, w, h) =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          // bulk raster fill (one array store per pixel, one setRGB call
          // per image instead of w·h synchronized ones)
          val px = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val (r, g, b) = pixelChannels(id, x, y)
              px(y * w + x) = (r << 16) | (g << 8) | b
              x += 1
            }
            y += 1
          }
          img.setRGB(0, 0, w, h, px, 0, w)
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(img)
          ios.close()
          EncodedImage(id, w, h, bos.toByteArray)
        }
      }
  }

  /** DECODE through the real codec: `ImageIO.read` on the PNG bytes,
    * then exact integer per-channel sums over every pixel — the
    * feature-extraction shape (decode once, reduce per row) a real
    * pipeline uses, with integer sums so no float parity questions.
    */
  def decodePngStats(imgs: Dataset[EncodedImage]): Dataset[ImageStats] = {
    val spark = imgs.sparkSession
    import spark.implicits._
    imgs.mapPartitions { rows =>
      // one PNG reader per partition, reused; disk cache OFF (a
      // file-backed ImageInputStream per image dominated the decode
      // cost — temp-file create/delete per row)
      javax.imageio.ImageIO.setUseCache(false)
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("png").next()
      rows.map { e =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(e.png))
        reader.setInput(iis)
        val img = reader.read(0)
        iis.close()
        val (w, h) = (img.getWidth, img.getHeight)
        var rs = 0L; var gs = 0L; var bs = 0L
        img.getRaster.getDataBuffer match {
          // PNG truecolor decodes to TYPE_3BYTE_BGR: read the backing
          // byte array directly — no per-pixel ColorModel conversion
          case db: java.awt.image.DataBufferByte
              if img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR =>
            val data = db.getData
            var i = 0
            while (i < data.length) {
              bs += data(i) & 0xff; gs += data(i + 1) & 0xff; rs += data(i + 2) & 0xff
              i += 3
            }
          case _ => // any other layout: bulk sRGB conversion path
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            var i = 0
            while (i < px.length) {
              val p = px(i)
              rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
              i += 1
            }
        }
        ImageStats(e.media_id, w.toLong * h, rs, gs, bs)
      }
    }
  }

  // -------------------------------------------------------------------
  // Real codec path #1b: JPEG — the LOSSY tier. PNG/WAV prove
  // bit-lossless round trips; a production corpus's dominant image
  // format is JPEG, where exact-sum equality is impossible by design.
  // The gate becomes an ERROR CERTIFICATE (the SketchOps construction):
  // the engine runs formula → real JPEG encode (explicit quality) →
  // real decode → per-channel means, asserts |decoded mean − exact
  // mean| ≤ tol per channel, and publishes the EXACT sums plus the
  // boolean; the oracle recomputes the exact sums codec-free and emits
  // TRUE — hash equality proves the decoded image is a faithful
  // rendition without demanding byte equality of a lossy codec.

  /** One image crossing the lossy-codec boundary: genuine baseline
    * JPEG bytes at an explicit quality factor.
    */
  case class EncodedJpeg(media_id: Long, width: Int, height: Int, jpg: Array[Byte])

  /** [[ImageStats]] plus the decoded-vs-exact certificate. */
  case class JpegFidelity(media_id: Long, n_px: Long, r_sum: Long,
    g_sum: Long, b_sum: Long, within_tol: Boolean)

  /** ENCODE through the real lossy codec: the same deterministic pixel
    * pattern as the PNG tier, written as baseline JPEG via the
    * JDK-bundled writer with MODE_EXPLICIT quality (deterministic —
    * pure software, no platform codec). Narrow mapPartitions, one
    * writer per partition, disk cache off — the PNG tier's batch-shape
    * contract unchanged.
    */
  def encodeJpeg(meta: DataFrame, quality: Float = 0.9f): Dataset[EncodedJpeg] = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.select("media_id", "width", "height").as[(Long, Int, Int)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(quality)
        rows.map { case (id, w, h) =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val px = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val (r, g, b) = pixelChannels(id, x, y)
              px(y * w + x) = (r << 16) | (g << 8) | b
              x += 1
            }
            y += 1
          }
          img.setRGB(0, 0, w, h, px, 0, w)
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
          ios.close()
          EncodedJpeg(id, w, h, bos.toByteArray)
        }
      }
  }

  /** DECODE the lossy bytes and certify fidelity: per-channel decoded
    * sums vs the EXACT formula sums (recomputed in the same pass —
    * integer loops, no second scan), certificate = every channel's
    * |decoded mean − exact mean| ≤ `tol` (on the 0-255 scale). The
    * PUBLISHED sums are the exact ones — engine-recomputable by the
    * oracle — so the hash gate stays integer-exact while the boolean
    * carries the codec-fidelity proof.
    *
    * Default tol: the worst image over the ENTIRE (dims × pattern)
    * cycle of [[syntheticImageMeta]] (6400 ids — every combination any
    * scale factor can produce) measures 4.22 at quality 0.9, on an 8×8
    * thumbnail where block-DCT edge effects dominate; 6.0 keeps a
    * 1.4× margin. Spec-pinned at the known worst id.
    */
  def jpegFidelityStats(imgs: Dataset[EncodedJpeg],
      tol: Double = 6.0): Dataset[JpegFidelity] = {
    val spark = imgs.sparkSession
    import spark.implicits._
    imgs.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("jpeg").next()
      rows.map { e =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(e.jpg))
        reader.setInput(iis)
        val img = reader.read(0)
        iis.close()
        val (w, h) = (img.getWidth, img.getHeight)
        var rs = 0L; var gs = 0L; var bs = 0L
        img.getRaster.getDataBuffer match {
          case db: java.awt.image.DataBufferByte
              if img.getType == java.awt.image.BufferedImage.TYPE_3BYTE_BGR =>
            val data = db.getData
            var i = 0
            while (i < data.length) {
              bs += data(i) & 0xff; gs += data(i + 1) & 0xff; rs += data(i + 2) & 0xff
              i += 3
            }
          case _ =>
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            var i = 0
            while (i < px.length) {
              val p = px(i)
              rs += (p >> 16) & 0xff; gs += (p >> 8) & 0xff; bs += p & 0xff
              i += 1
            }
        }
        // exact sums straight from the formula — same integers the
        // oracle recomputes
        var er = 0L; var eg = 0L; var eb = 0L
        var y = 0
        while (y < e.height) {
          var x = 0
          while (x < e.width) {
            val (r, g, b) = pixelChannels(e.media_id, x, y)
            er += r; eg += g; eb += b
            x += 1
          }
          y += 1
        }
        val n = e.width.toLong * e.height
        val ok = w == e.width && h == e.height &&
          math.abs(rs.toDouble / n - er.toDouble / n) <= tol &&
          math.abs(gs.toDouble / n - eg.toDouble / n) <= tol &&
          math.abs(bs.toDouble / n - eb.toDouble / n) <= tol
        JpegFidelity(e.media_id, n, er, eg, eb, ok)
      }
    }
  }

  // -------------------------------------------------------------------
  // Real codec path #2: WAV/PCM audio through javax.sound.sampled
  // (JDK-bundled, like imageio — file-format I/O needs no audio device,
  // so it runs headless). Same gate construction as the PNG tier:
  // deterministic sample formula → real encode → real decode → exact
  // integer reductions, with the oracle recomputing the reductions
  // codec-free so a green row proves the round trip bit-lossless.

  /** One audio clip crossing the real-codec boundary: genuine WAV bytes
    * (RIFF header + 16-bit signed little-endian stereo PCM).
    */
  case class EncodedAudio(media_id: Long, n_frames: Int, wav: Array[Byte])

  /** Exact per-channel sample sums of one decoded clip. */
  case class AudioStats(media_id: Long, n_frames: Long, l_sum: Long, r_sum: Long)

  /** Deterministic sample content: the 16-bit signed sample of frame i,
    * channel ch (0 = left, 1 = right) of clip `mediaId`. Integer-only —
    * all addends non-negative before the mod, so `%` agrees across
    * engines — and it sweeps the full 16-bit range as i grows (31 is
    * coprime to 65536), so the codec sees every byte pattern class.
    */
  def sampleValue(mediaId: Long, i: Int, ch: Int): Int =
    ((31L * i + 7L * ch + (mediaId % 65536L)) % 65536L).toInt - 32768

  /** Audio metadata plan: small deterministic frame counts (64–504
    * stereo frames) keyed off doc ids — fidelity-gate sizing, same
    * rationale (and same [[graft.PlanUtils.spread]] barrier) as
    * [[syntheticImageMeta]].
    */
  def syntheticAudioMeta(docs: DataFrame): DataFrame =
    graft.PlanUtils.spread(
      docs.select(col("doc_id").as("media_id"),
        (lit(64) + pmod(col("doc_id"), lit(441L))).cast("int").as("n_frames")))

  private val wavFormat = new javax.sound.sampled.AudioFormat(
    /* sampleRate */ 8000f, /* bits */ 16, /* channels */ 2,
    /* signed */ true, /* bigEndian */ false)

  /** ENCODE through the real codec: renders each row's deterministic
    * PCM samples and writes a genuine WAV file through the platform
    * `javax.sound.sampled` WAVE provider. Narrow mapPartitions —
    * CPU-bound, scan-parallel, no shuffle (the multimodal decode
    * contract).
    *
    * Per-PARTITION provider resolution (the PNG lesson, audio edition):
    * `AudioSystem.write` re-resolves the SPI provider list on EVERY
    * call (the JDK's sound services are not cached), which dominates
    * the cost at clip sizes of a few KB. The public
    * `javax.sound.sampled.spi.AudioFileWriter` SPI lets us resolve the
    * WAVE writer once per partition and call it directly — identical
    * bytes, none of the per-row registry scan.
    */
  def encodeWav(meta: DataFrame): Dataset[EncodedAudio] = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.select("media_id", "n_frames").as[(Long, Int)]
      .mapPartitions { rows =>
        import scala.jdk.CollectionConverters._
        val writer = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).asScala
          .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
          .getOrElse(throw new IllegalStateException("no WAVE AudioFileWriter provider"))
        rows.map { case (id, n) =>
          // 2 channels × 2 bytes, little-endian, frame-interleaved
          val pcm = new Array[Byte](n * 4)
          var i = 0
          while (i < n) {
            var ch = 0
            while (ch < 2) {
              val v = sampleValue(id, i, ch)
              pcm(i * 4 + ch * 2) = (v & 0xff).toByte
              pcm(i * 4 + ch * 2 + 1) = ((v >> 8) & 0xff).toByte
              ch += 1
            }
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), wavFormat, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          writer.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          EncodedAudio(id, n, bos.toByteArray)
        }
      }
  }

  /** DECODE through the real codec: the WAV container (RIFF chunks,
    * format negotiation) is parsed by the platform
    * `javax.sound.sampled.spi.AudioFileReader` provider, which hands
    * back raw PCM; exact per-channel integer sums over every frame
    * prove fidelity. The decoded format is asserted, not assumed — a
    * codec that silently resampled or widened would fail loudly here
    * rather than hash-mismatch downstream.
    *
    * Provider resolution happens ONCE per partition, lazily: the SPI
    * has no "supports this format" query (`AudioSystem` probes readers
    * by exception per call), so the first clip elects the reader that
    * accepts WAV and the rest of the partition reuses it.
    */
  def decodeWavStats(clips: Dataset[EncodedAudio]): Dataset[AudioStats] = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.mapPartitions { rows =>
      import scala.jdk.CollectionConverters._
      lazy val readers = java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader]).asScala.toList
      var elected: javax.sound.sampled.spi.AudioFileReader = null
      def open(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
        val in = new java.io.ByteArrayInputStream(bytes)
        if (elected != null) elected.getAudioInputStream(in)
        else {
          val (r, ais) = readers.view.flatMap { r =>
            try Some(r -> r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes)))
            catch { case _: javax.sound.sampled.UnsupportedAudioFileException => None }
          }.headOption.getOrElse(throw new IllegalStateException("no WAV AudioFileReader provider"))
          elected = r
          ais
        }
      }
      rows.map { e =>
        val ais = open(e.wav)
        val f = ais.getFormat
        require(f.getSampleSizeInBits == 16 && f.getChannels == 2 && !f.isBigEndian &&
          f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
          s"decoded format diverged: $f")
        val pcm = ais.readAllBytes()
        ais.close()
        val nFrames = pcm.length / 4
        var ls = 0L; var rs = 0L
        var i = 0
        while (i < nFrames) {
          ls += ((pcm(i * 4 + 1) << 8) | (pcm(i * 4) & 0xff)).toShort
          rs += ((pcm(i * 4 + 3) << 8) | (pcm(i * 4 + 2) & 0xff)).toShort
          i += 1
        }
        AudioStats(e.media_id, nFrames.toLong, ls, rs)
      }
    }
  }

  // -------------------------------------------------------------------
  // Real codec path #3: VIDEO as multi-frame animated GIF through
  // javax.imageio (the JDK's GIF plugin reads AND writes image
  // sequences). Same gate construction as the PNG tier, one level up:
  // deterministic per-frame pixel patterns → real multi-frame encode →
  // real per-frame decode → exact integer sums PER FRAME, with the
  // oracle recomputing every frame's sum codec-free. GIF stores
  // 8-bit-indexed pixels losslessly, so rendering through a fixed
  // 256-entry grayscale palette makes the whole animation round-trip
  // bit-exact — the decoded frame index IS the luminance.

  /** One clip crossing the real-codec boundary: a genuine animated GIF
    * (every frame full-size, fixed 256-gray global palette).
    */
  case class EncodedVideo(media_id: Long, width: Int, height: Int,
      n_frames: Int, gif: Array[Byte])

  /** Exact luminance sum of ONE decoded frame. */
  case class FrameStats(media_id: Long, frame_no: Int, n_px: Long, lum_sum: Long)

  /** Deterministic frame content: the 8-bit luminance of pixel (x, y)
    * in frame `frame` of clip `mediaId`. All addends non-negative
    * before the mod, so `%` agrees across engines; the frame term makes
    * every frame distinct, so a decoder that returned frame 0 for every
    * index would fail the gate.
    */
  def framePixel(mediaId: Long, x: Int, y: Int, frame: Int): Int =
    ((7L * x + 3L * y + 11L * frame + (mediaId % 256L)) % 256L).toInt

  /** Video metadata plan: small deterministic dimensions (8–24 px per
    * side) and frame counts (2–6) keyed off doc ids — fidelity-gate
    * sizing, same rationale (and same [[graft.PlanUtils.spread]]
    * barrier) as [[syntheticImageMeta]].
    */
  def syntheticVideoMeta(docs: DataFrame): DataFrame =
    graft.PlanUtils.spread(
      docs.select(col("doc_id").as("media_id"),
        (lit(8) + pmod(col("doc_id"), lit(17L))).cast("int").as("width"),
        (lit(8) + pmod(col("doc_id") * 7L, lit(17L))).cast("int").as("height"),
        (lit(2) + pmod(col("doc_id") * 13L, lit(5L))).cast("int").as("n_frames")))

  /** 256-entry grayscale palette: index i ↦ (i, i, i). Shared by encode
    * (render target) and the oracle argument (decoded RGB channel ==
    * stored index == formula value).
    */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val v = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, v, v, v)
  }

  /** ENCODE through the real codec: renders each clip's frames into
    * indexed-gray `BufferedImage`s and writes ONE genuine animated GIF
    * via the JDK writer's sequence API (`prepareWriteSequence` /
    * `writeToSequence`). Narrow mapPartitions, one writer per
    * partition, disk cache off — the PNG tier's batch-shape contract.
    */
  def encodeGif(meta: DataFrame): Dataset[EncodedVideo] = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.select("media_id", "width", "height", "n_frames")
      .as[(Long, Int, Int, Int)]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val icm = grayPalette
        rows.map { case (id, w, h, nf) =>
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
            val data = img.getRaster.getDataBuffer
              .asInstanceOf[java.awt.image.DataBufferByte].getData
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                data(y * w + x) = framePixel(id, x, y, f).toByte
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
          ios.close()
          EncodedVideo(id, w, h, nf, bos.toByteArray)
        }
      }
  }

  /** DECODE through the real codec: the GIF reader walks the frame
    * sequence (`getNumImages` / `read(i)`) and each frame reduces to
    * its exact integer luminance sum — one output row PER FRAME (the
    * frame-extraction shape of a video pipeline). Frame count and
    * dimensions are asserted against the clip's metadata, so a reader
    * that dropped or merged frames fails loudly rather than
    * hash-mismatching downstream.
    */
  def decodeGifFrameStats(clips: Dataset[EncodedVideo]): Dataset[FrameStats] = {
    val spark = clips.sparkSession
    import spark.implicits._
    clips.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      rows.flatMap { e =>
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(e.gif))
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        require(n == e.n_frames,
          s"decoded frame count $n != encoded ${e.n_frames} (media ${e.media_id})")
        val out = (0 until n).map { f =>
          val img = reader.read(f)
          require(img.getWidth == e.width && img.getHeight == e.height,
            s"decoded frame $f dims diverged (media ${e.media_id})")
          var lum = 0L
          (img.getRaster.getDataBuffer, img.getColorModel) match {
            // indexed GIF decodes to a byte raster of palette indices;
            // map each index through the DECODED frame's own palette
            // (gray ⇒ red == luminance) — color-true even if the codec
            // reordered the color table
            case (db: java.awt.image.DataBufferByte,
                icm: java.awt.image.IndexColorModel)
                if icm.getPixelSize == 8 =>
              val lut = new Array[Int](icm.getMapSize)
              var j = 0
              while (j < lut.length) { lut(j) = icm.getRed(j); j += 1 }
              val data = db.getData
              var i = 0
              while (i < data.length) { lum += lut(data(i) & 0xff); i += 1 }
            case _ => // any other layout: bulk sRGB path, gray ⇒ b channel
              val px = img.getRGB(0, 0, e.width, e.height, null, 0, e.width)
              var i = 0
              while (i < px.length) { lum += px(i) & 0xff; i += 1 }
          }
          FrameStats(e.media_id, f, e.width.toLong * e.height, lum)
        }
        iis.close()
        out
      }
    }
  }

  /** Resize plan: metadata-only. Scales (width, height) to fit inside
    * `maxSide` preserving aspect ratio — floor(side·maxSide/longest),
    * exact in double for any realistic pixel count (< 2^53), so every
    * engine agrees bit-for-bit. Payload untouched — a real pipeline
    * would fuse this target size into the decode kernel rather than
    * decode-then-resize.
    */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val needs = longest > maxSide
    media.select(
      col("media_id"), col("kind"), col("width"), col("height"),
      when(needs, floor(col("width") * lit(maxSide.toLong) / longest).cast("int"))
        .otherwise(col("width")).as("out_w"),
      when(needs, floor(col("height") * lit(maxSide.toLong) / longest).cast("int"))
        .otherwise(col("height")).as("out_h"))
  }

  /** Frame sampling for video rows: every `step`-th frame index
    * (0, step, 2·step, …) up to n_frames−1. Explodes metadata only —
    * at scale, the sampled (media_id, frame_no) list drives a decoder
    * that seeks to exactly those frames, never materializing the rest.
    */
  def sampleFrames(media: DataFrame, step: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("media_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_no"))
}
