package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque BINARY
  * columns with a typed metadata struct, plus batch feature-extraction
  * plumbing.
  *
  * The Spark-side plumbing (schema, partition sizing, batch shape,
  * deterministic output contract) is real and tested. IMAGE decode is
  * real too: [[ImageDecoder]] reads PNG/JPEG via the JDK's built-in
  * `javax.imageio` (no external codec) and produces genuine pHash DCT
  * features. Audio/video decode remains STUBBED — the container ships
  * no codecs for those — as a clearly-marked deterministic fake
  * deriving pseudo-features from a sha256 of the payload
  * ([[StubDecoder]]). Swap it for a real JNI/FFI codec without
  * touching the plumbing.
  */
object Multimodal {

  /** media table schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType)
    )))
  ))

  final case class MediaMeta(mime: String, width: Int, height: Int, duration_ms: Long)
  final case class MediaRecord(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, mime: String, n_bytes: Long, features: Array[Float])

  /** Decode/feature-extract contract: bytes+meta → fixed-width feature
    * vector. Implementations must be deterministic per payload.
    */
  trait Decoder extends Serializable {
    def dim: Int
    def decode(payload: Array[Byte], meta: MediaMeta): Array[Float]
  }

  /** STUB — deterministic fake: features are derived from sha256 of the
    * payload (`???`-grade placeholder for a real image/audio codec; the
    * container ships none). Keeps tests meaningful: same bytes → same
    * features, different bytes → different features.
    */
  final class StubDecoder(val dim: Int = 16) extends Decoder {
    def decode(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
      val d = java.security.MessageDigest.getInstance("SHA-256").digest(payload)
      Array.tabulate(dim)(i => ((d(i % d.length) & 0xff) / 255.0f))
    }
  }

  /** REAL image decoder — JDK `javax.imageio` (PNG/JPEG/GIF/BMP, zero
    * external dependencies): decode → 32×32 grayscale downsample
    * (nearest-neighbor over BT.601 luma) → 2-D DCT-II → the top-left
    * 8×8 low-frequency block as 64 features. Exactly the classic pHash
    * front end: feeding these through [[featureMean]] +
    * [[thresholdBits]] yields a perceptual hash under which identical
    * pixels hash identically and lightly perturbed / re-encoded copies
    * land within a few bits (MultimodalSpec pins both). Non-image or
    * undecodable payloads yield the zero vector — metadata-filter on
    * mime BEFORE paying decode cost (see [[mediaStats]]).
    */
  final class ImageDecoder extends Decoder {
    val dim = 64
    def decode(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      if (img == null || img.getWidth == 0 || img.getHeight == 0) new Array[Float](dim)
      else dctFeatures(img)
    }
  }

  /** The shared pHash front end: 32×32 BT.601-luma downsample →
    * 2-D DCT-II → top-left 8×8 low-frequency block as 64 features.
    * [[ImageDecoder]] (whole images) and [[decodeGifFrames]]
    * (per-frame) both feed through here, so a single-frame GIF and
    * the same image decoded whole hash identically.
    */
  private[graft] def dctFeatures(img: java.awt.image.BufferedImage): Array[Float] = {
    val N    = 32
    val gray = Array.ofDim[Double](N, N)
    var y = 0
    while (y < N) {
      var x = 0
      while (x < N) {
        val px = img.getRGB(x * img.getWidth / N, y * img.getHeight / N)
        gray(y)(x) = 0.299 * ((px >> 16) & 0xff) + 0.587 * ((px >> 8) & 0xff) + 0.114 * (px & 0xff)
        x += 1
      }
      y += 1
    }
    val out = new Array[Float](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s  = 0.0
        var yy = 0
        while (yy < N) {
          var xx = 0
          while (xx < N) {
            s += gray(yy)(xx) *
              math.cos((2 * yy + 1) * u * math.Pi / (2 * N)) *
              math.cos((2 * xx + 1) * v * math.Pi / (2 * N))
            xx += 1
          }
          yy += 1
        }
        val cu = if (u == 0) math.sqrt(1.0 / N) else math.sqrt(2.0 / N)
        val cv = if (v == 0) math.sqrt(1.0 / N) else math.sqrt(2.0 / N)
        out(u * 8 + v) = (cu * cv * s).toFloat
        v += 1
      }
      u += 1
    }
    out
  }

  /** REAL multi-frame container decode — animated GIF via the JDK's
    * `javax.imageio` GIF reader (zero external dependencies): every
    * frame is decoded and COMPOSITED onto the logical screen per the
    * GIF89a disposal model, and every `everyNth`-th composite runs
    * through [[dctFeatures]], yielding (frame_idx, 64 DCT features)
    * rows — the frame-sampling path [[sampleFrameIndexes]] only STUBS
    * for codec-less containers, made real for the one animated
    * container the JDK ships a decoder for. Undecodable or non-GIF
    * payloads yield no rows (filter on mime before paying decode
    * cost, as everywhere in this module).
    *
    * Compositing, concretely: each frame's raster draws at its
    * (imageLeftPosition, imageTopPosition) offset over the current
    * canvas; after the frame is emitted, its disposal method applies
    * — `restoreToBackgroundColor` clears the frame's rectangle,
    * `restoreToPrevious` restores the pre-draw canvas, `none`/
    * `doNotDispose` leave the canvas. A size-optimized re-encode
    * (frames stored as partial-raster deltas over the previous frame)
    * therefore hashes identically to its full-frame original —
    * spec-pinned in MultimodalSpec on a hand-built delta GIF. A frame
    * that fails mid-sequence ends the decode at the frames composited
    * so far: a later delta without its base must not emit a corrupt
    * composite.
    */
  def decodeGifFrames(payload: Array[Byte], everyNth: Int = 1): Seq[(Int, Array[Float])] = {
    require(everyNth >= 1, "everyNth must be >= 1")
    val iis =
      try javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (iis == null) return Seq.empty
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) { iis.close(); return Seq.empty }
    val reader = readers.next()
    try {
      reader.setInput(iis)
      if (!reader.getFormatName.equalsIgnoreCase("gif")) return Seq.empty
      val n = reader.getNumImages(true)

      def attr(root: org.w3c.dom.Element, tag: String, a: String): Option[String] = {
        val nl = root.getElementsByTagName(tag)
        if (nl.getLength == 0) None
        else Option(nl.item(0).asInstanceOf[org.w3c.dom.Element].getAttribute(a))
          .filter(_.nonEmpty)
      }
      // logical screen from the stream metadata; first frame's extent
      // as the fallback for encoders that omit the descriptor
      val screen: Option[(Int, Int)] =
        try for {
          sm   <- Option(reader.getStreamMetadata)
          tree  = sm.getAsTree("javax_imageio_gif_stream_1.0")
                    .asInstanceOf[org.w3c.dom.Element]
          w    <- attr(tree, "LogicalScreenDescriptor", "logicalScreenWidth").map(_.toInt)
          h    <- attr(tree, "LogicalScreenDescriptor", "logicalScreenHeight").map(_.toInt)
          if w > 0 && h > 0
        } yield (w, h)
        catch { case _: java.io.IOException => None }

      def argbCopy(src: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
        val c = new java.awt.image.BufferedImage(
          src.getWidth, src.getHeight, java.awt.image.BufferedImage.TYPE_INT_ARGB)
        val g = c.createGraphics()
        g.drawImage(src, 0, 0, null)
        g.dispose()
        c
      }

      var canvas: java.awt.image.BufferedImage = null
      var saved: java.awt.image.BufferedImage  = null
      val out = Seq.newBuilder[(Int, Array[Float])]
      var i = 0
      var failed = false
      while (i < n && !failed) {
        try {
          val img = reader.read(i)
          if (img == null || img.getWidth == 0 || img.getHeight == 0) failed = true
          else {
            val md = reader.getImageMetadata(i)
              .getAsTree("javax_imageio_gif_image_1.0")
              .asInstanceOf[org.w3c.dom.Element]
            val left     = attr(md, "ImageDescriptor", "imageLeftPosition").map(_.toInt).getOrElse(0)
            val top      = attr(md, "ImageDescriptor", "imageTopPosition").map(_.toInt).getOrElse(0)
            val disposal = attr(md, "GraphicControlExtension", "disposalMethod").getOrElse("none")
            if (canvas == null) {
              val (w, h) = screen.getOrElse((left + img.getWidth, top + img.getHeight))
              canvas = new java.awt.image.BufferedImage(
                math.max(w, left + img.getWidth), math.max(h, top + img.getHeight),
                java.awt.image.BufferedImage.TYPE_INT_ARGB)
            }
            if (disposal == "restoreToPrevious") saved = argbCopy(canvas)
            val g = canvas.createGraphics()
            g.drawImage(img, left, top, null)
            g.dispose()
            if (i % everyNth == 0) out += ((i, dctFeatures(canvas)))
            disposal match {
              case "restoreToBackgroundColor" =>
                val g2 = canvas.createGraphics()
                g2.setComposite(java.awt.AlphaComposite.Clear)
                g2.fillRect(left, top, img.getWidth, img.getHeight)
                g2.dispose()
              case "restoreToPrevious" if saved != null =>
                canvas = saved
              case _ => ()
            }
          }
        } catch { case _: java.io.IOException => failed = true }
        i += 1
      }
      out.result()
    } catch {
      case _: java.io.IOException => Seq.empty
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Distributed frame-feature extraction over a media DataFrame
    * (media_id, payload): one row per sampled GIF frame with its
    * [[dctFeatures]] vector, via mapPartitions so a heavier codec can
    * amortize init per partition (the [[extractFeatures]] batch
    * shape). Feed the result through [[featureMean]] +
    * [[thresholdBits]] for per-frame pHashes and
    * [[Dedup.bitSigPairs]] for banded frame-level dedup.
    */
  def gifFrameFeatures(media: DataFrame, everyNth: Int = 1): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          decodeGifFrames(Option(payload).getOrElse(Array.emptyByteArray), everyNth)
            .map { case (idx, f) => (id, idx, f) }
        }
      }
      .toDF("media_id", "frame_idx", "features")
  }

  /** REAL audio decoder — JDK `javax.sound.sampled` (WAV/AIFF/AU PCM,
    * zero external dependencies): decode to PCM samples (first
    * channel, 8/16-bit, any endianness the JDK parser reports) →
    * `dim` equal-length frames → per-frame RMS energy in [0,1]. The
    * energy envelope is the standard cheap audio fingerprint front
    * end: identical audio matches exactly, re-encoded/requantized
    * copies land near each other, and the same [[featureMean]] +
    * [[thresholdBits]] pipeline that serves images turns it into a
    * banded-index-ready bit signature. Non-audio or undecodable
    * payloads yield the zero vector — metadata-filter on mime before
    * paying decode cost, exactly like images. MP3/AAC/Opus need
    * codecs this container doesn't ship; the WAV path proves the
    * plumbing with a real decoder.
    */
  final class AudioDecoder(val dim: Int = 64) extends Decoder {
    def decode(payload: Array[Byte], meta: MediaMeta): Array[Float] = {
      val zero = new Array[Float](dim)
      val ais =
        try javax.sound.sampled.AudioSystem
          .getAudioInputStream(new java.io.ByteArrayInputStream(payload))
        catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException => null
          case _: java.io.IOException                               => null
        }
      if (ais == null) return zero
      try {
        val fmt = ais.getFormat
        // only linear PCM is decodable here: ULAW/ALAW (8-bit, common
        // in AU/telephony WAV) are companded, and misreading them as
        // PCM yields a garbage envelope instead of the documented
        // "undecodable → zero vector" contract
        val enc      = fmt.getEncoding
        val signed   = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
        val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
        if (!signed && !unsigned) return zero
        if (fmt.getSampleSizeInBits != 8 && fmt.getSampleSizeInBits != 16) return zero
        val bytes = ais.readAllBytes()
        val frame = fmt.getFrameSize
        val n     = if (frame > 0) bytes.length / frame else 0
        if (n < dim) return zero
        val samples = new Array[Double](n)
        var i = 0
        while (i < n) {
          val off = i * frame // first channel only
          samples(i) =
            if (fmt.getSampleSizeInBits == 8)
              // signedness decides the midpoint: 8-bit WAV is unsigned
              // (0..255, bias 128), 8-bit AIFF is signed two's-complement
              (if (signed) bytes(off).toDouble else (bytes(off) & 0xff) - 128.0) / 128.0
            else {
              val (lo, hi) = if (fmt.isBigEndian) (off + 1, off) else (off, off + 1)
              val raw      = (bytes(hi) << 8) | (bytes(lo) & 0xff)
              (if (signed) raw.toDouble
               else ((raw & 0xffff) - 32768).toDouble) / 32768.0
            }
          i += 1
        }
        val out = new Array[Float](dim)
        var f = 0
        while (f < dim) {
          val start = f * n / dim
          val end   = (f + 1) * n / dim
          var s = 0.0
          var j = start
          while (j < end) { s += samples(j) * samples(j); j += 1 }
          out(f) = math.sqrt(s / math.max(1, end - start)).toFloat
          f += 1
        }
        out
      } finally ais.close()
    }
  }

  /** Batch feature extraction: mapPartitions so a real codec can
    * amortize per-batch init (model load, codec context) across the
    * partition — the Scala analogue of mapInPandas' batch shape.
    * Repartitions to `parallelism` so payload-heavy partitions stay
    * within executor memory at scale (payloads never shuffle more than
    * once).
    */
  def extractFeatures(
      media: Dataset[MediaRecord],
      decoder: Decoder,
      parallelism: Int
  ): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media
      .repartition(parallelism, col("media_id"))
      .mapPartitions { it =>
        // per-partition init happens here (codec context, model weights)
        it.map { r =>
          MediaFeatures(
            r.media_id,
            Option(r.meta).map(_.mime).getOrElse("application/octet-stream"),
            Option(r.payload).map(_.length.toLong).getOrElse(0L),
            decoder.decode(Option(r.payload).getOrElse(Array.emptyByteArray), r.meta)
          )
        }
      }
  }

  /** Expression-only metadata ops (no decode needed): payload size,
    * content hash, resolution bucket — stay in codegen, used for
    * filtering/partitioning BEFORE paying any decode cost at 100 TB.
    */
  def mediaStats(df: DataFrame): DataFrame =
    df.select(
      col("media_id"),
      col("meta.mime").as("mime"),
      length(col("payload")).as("n_bytes"),
      sha2(col("payload"), 256).as("content_key"),
      (col("meta.width") * col("meta.height")).as("n_pixels"),
      when(col("meta.width") >= 1920, "hd")
        .when(col("meta.width") >= 640, "sd")
        .otherwise("thumb")
        .as("res_bucket")
    )

  /** Perceptual-hash (pHash) family: a real pHash thresholds a
    * decoded-feature vector (DCT coefficients for images, spectral
    * bands for audio) against its own mean — near-identical media
    * produce near-identical bits, so Hamming distance measures
    * perceptual similarity and the SimHash pair machinery
    * ([[Dedup.bitSigPairs]]) finds duplicate media without any n²
    * scan. The THRESHOLDING below is that real logic and works over
    * any decoder's features; only the feature EXTRACTION is stubbed in
    * this container (no codecs), via [[stubFeatures]] — a
    * deterministic sha256-hex-digit fake, the relational twin of
    * [[StubDecoder]] and (unlike a real decoder) reproducible in pure
    * SQL, which is what lets the DuckDB oracle check the whole
    * pipeline bit-for-bit (q51/q52).
    *
    * [[featureMean]] must sit in its OWN projection with
    * [[thresholdBits]] consuming the attribute — the same
    * CollapseProject discipline as MinHash signatures (see
    * [[Dedup.minhashFromHashesHof]]): inlined, Catalyst would
    * re-evaluate the mean aggregate once per output bit.
    */
  def stubFeatures(payload: Column): Column = {
    val hx = sha2(payload, 256) // 64 lowercase hex chars
    transform(
      sequence(lit(0), lit(63)),
      j => (instr(lit("0123456789abcdef"), hx.substr(j + 1, lit(1))) - lit(1)).cast("double")
    )
  }

  /** Mean of a feature vector (integer-valued doubles stay exact, so
    * the q51/q52 oracle comparison has no float-order ambiguity).
    */
  def featureMean(features: Column): Column =
    aggregate(features, lit(0.0), (acc, x) => acc + x) / size(features)

  /** Threshold each feature against the (separately projected) mean:
    * '1' when >= mean — the pHash bit rule. The null guard doubles as
    * the CollapseProject defense: it references `mean` a second time,
    * which keeps the mean's producing projection from being merged
    * into (and re-evaluated inside) the per-bit lambda.
    */
  def thresholdBits(features: Column, mean: Column): Column =
    when(mean.isNull, lit(null).cast("string"))
      .otherwise(concat_ws("", transform(features, x => when(x >= mean, lit("1")).otherwise(lit("0")))))

  /** Frame-sample stub for video: emit every nth frame index as a
    * (media_id, frame_idx) row — the explode pattern a real frame
    * extractor feeds; frame decode itself is the stubbed step.
    */
  def sampleFrameIndexes(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("meta.duration_ms").isNotNull && col("meta.duration_ms") > 0)
      .select(
        col("media_id"),
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))).as("frame_ms")
      )
}
