package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaMeta, MediaRecord}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    Seq(
      MediaRecord(1L, "fakejpegbytes-1".getBytes, MediaMeta("image/jpeg", 1920, 1080, 0L)),
      MediaRecord(2L, "fakejpegbytes-2".getBytes, MediaMeta("image/jpeg", 640, 480, 0L)),
      MediaRecord(3L, "fakewavbytes-333".getBytes, MediaMeta("audio/wav", 0, 0, 2500L)),
      MediaRecord(4L, "fakejpegbytes-1".getBytes, MediaMeta("image/jpeg", 320, 240, 0L)) // dup payload of 1
    ).toDS()
  }

  test("feature extraction is deterministic per payload and batch-shaped") {
    val feats = Multimodal
      .extractFeatures(media, new Multimodal.StubDecoder(16), parallelism = 2)
      .collect()
      .map(f => f.media_id -> f)
      .toMap
    assert(feats.size == 4)
    assert(feats(1L).features.length == 16)
    assert(feats(1L).features.sameElements(feats(4L).features), "same payload → same features")
    assert(!feats(1L).features.sameElements(feats(2L).features))
    assert(feats(3L).mime == "audio/wav")
    assert(feats(1L).n_bytes == 15L)
  }

  test("mediaStats stays expression-only and dedups by content hash") {
    val stats = Multimodal.mediaStats(media.toDF())
    assert(stats.filter(col("res_bucket") === "hd").count() == 1)
    // payload dup 1 vs 4 share the content key
    assert(stats.select("content_key").distinct().count() == 3)
    // plan must be a single projection over the scan — no shuffle
    val plan = stats.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("frame sampling explodes indexes from duration metadata") {
    val frames = Multimodal.sampleFrameIndexes(media.toDF(), everyMs = 1000L)
    val got = frames.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((3L, 0L), (3L, 1000L), (3L, 2000L)))
  }

  test("pHash is perceptually local over decoder features: small drift → small hamming") {
    import spark.implicits._
    // hand-planted feature vectors standing in for a real decoder's DCT
    // coefficients: 2 is a slightly-degraded copy of 1 (2 coefficients
    // drift across the mean), 3 is unrelated. The thresholding path is
    // the REAL pHash logic — only decode is stubbed elsewhere.
    val base = Array.tabulate(64)(i => if (i % 2 == 0) 10.0 else 2.0) // mean 6
    val nearDup = base.clone(); nearDup(0) = 3.0; nearDup(7) = 11.0   // 2 bits flip
    val other = Array.tabulate(64)(i => if (i % 3 == 0) 9.0 else 1.0)
    val sigs = Seq((1L, base.toSeq), (2L, nearDup.toSeq), (3L, other.toSeq))
      .toDF("media_id", "f")
      .select($"media_id", $"f", Multimodal.featureMean($"f").as("mu"))
      .select($"media_id", Multimodal.thresholdBits($"f", $"mu").as("phash"))
    val byId = sigs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.values.forall(_.length == 64))
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(hamming(byId(1L), byId(2L)) == 2, "near-dup features → hamming 2")
    assert(hamming(byId(1L), byId(3L)) > 10, "unrelated features → far apart")
    // and the shared banded pair machinery finds exactly the near-dup pair
    val pairs = graft.operators.Dedup
      .bitSigPairs(sigs, "media_id", "phash", maxHamming = 3, chunks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 2)))
  }

  test("REAL image decode: javax.imageio → DCT pHash clusters re-encoded JPEG copies of each PNG") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    // six deterministic 64×64 block mosaics (seeded 8×8 grid of solid
    // 8-px blocks): rich, pattern-specific low-frequency content so
    // pHashes of DIFFERENT patterns are far apart, while the
    // block-aligned structure means a lossy JPEG re-encode of the SAME
    // pattern only nudges DCT coefficients
    def pattern(seed: Int): BufferedImage = {
      val rnd  = new scala.util.Random(1000 + seed)
      val grid = Array.fill(8, 8)(32 + rnd.nextInt(192))
      val img  = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) {
        val c = grid(y / 8)(x / 8)
        img.setRGB(x, y, (c << 16) | (c << 8) | c)
      }
      img
    }
    def encode(img: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK must ship a $fmt writer")
      bos.toByteArray
    }
    val bases = (0 until 6).map(i => i.toLong -> pattern(i))
    val records = bases.flatMap { case (id, img) =>
      Seq(
        Multimodal.MediaRecord(id, encode(img, "png"), Multimodal.MediaMeta("image/png", 64, 64, 0L)),
        Multimodal.MediaRecord(id + 100L, encode(img, "jpg"), Multimodal.MediaMeta("image/jpeg", 64, 64, 0L))
      )
    }
    val sigs = Multimodal
      .extractFeatures(records.toDS(), new Multimodal.ImageDecoder, parallelism = 2)
      .toDF()
      .select($"media_id", $"features".as("f"))
      .select($"media_id", $"f", Multimodal.featureMean($"f").as("mu"))
      .select($"media_id", Multimodal.thresholdBits($"f", $"mu").as("phash"))
    val byId = sigs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.size == 12 && byId.values.forall(s => s.length == 64 && s.forall(c => c == '0' || c == '1')))
    def hamming(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    for (i <- 0L until 6L) {
      assert(hamming(byId(i), byId(i + 100L)) <= 6,
        s"JPEG re-encode of pattern $i must stay within 6 bits, got ${hamming(byId(i), byId(i + 100L))}")
      for (j <- 0L until i)
        assert(hamming(byId(i), byId(j)) > 10,
          s"distinct patterns $i/$j too close: ${hamming(byId(i), byId(j))}")
    }
    // the shared banded pair index clusters exactly the re-encoded copies
    val pairs = graft.operators.Dedup
      .bitSigPairs(sigs, "media_id", "phash", maxHamming = 6, chunks = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0L until 6L).map(i => (i, i + 100L)).toSet,
      s"expected exactly the six png↔jpeg copy pairs, got $pairs")
  }

  test("stubFeatures (relational) matches StubDecoder's determinism contract: same payload, same phash") {
    import spark.implicits._
    val df = media.toDF().select($"media_id", $"payload")
      .select($"media_id", Multimodal.stubFeatures($"payload").as("f"))
      .select($"media_id", $"f", Multimodal.featureMean($"f").as("mu"))
      .select($"media_id", Multimodal.thresholdBits($"f", $"mu").as("phash"))
    val byId = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId(1L) == byId(4L), "identical payloads → identical pHash")
    assert(byId(1L) != byId(2L))
    assert(byId(1L).length == 64 && byId(1L).forall(c => c == '0' || c == '1'))
  }

  test("REAL audio decode: javax.sound.sampled WAV → energy envelope; requantized copies cluster") {
    import javax.sound.sampled._
    def wav(freqHz: Double, bits: Int, loudSecondHalf: Boolean): Array[Byte] = {
      val rate = 8000f
      val n    = 8000
      val fmt  = new AudioFormat(rate, bits, 1, bits == 16, false)
      val bytesPerSample = bits / 8
      val data = new Array[Byte](n * bytesPerSample)
      var i = 0
      while (i < n) {
        val amp = if (loudSecondHalf && i >= n / 2) 0.9 else 0.3
        val s   = amp * math.sin(2 * math.Pi * freqHz * i / rate)
        if (bits == 16) {
          val v = (s * 32767).toInt
          data(2 * i) = (v & 0xff).toByte
          data(2 * i + 1) = ((v >> 8) & 0xff).toByte
        } else data(i) = ((s * 127).toInt + 128).toByte
        i += 1
      }
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val dec  = new Multimodal.AudioDecoder(dim = 16)
    val meta = Multimodal.MediaMeta("audio/wav", 0, 0, 1000L)
    val a16  = dec.decode(wav(440, 16, loudSecondHalf = true), meta)
    val a16b = dec.decode(wav(440, 16, loudSecondHalf = true), meta)
    val a8   = dec.decode(wav(440, 8, loudSecondHalf = true), meta)
    val flat = dec.decode(wav(440, 16, loudSecondHalf = false), meta)
    assert(a16.toSeq == a16b.toSeq, "identical audio → identical features")
    // the envelope is real: second-half frames carry ~3x the RMS
    assert(a16.take(8).forall(_ < 0.4) && a16.drop(8).forall(_ > 0.5), a16.mkString(","))
    // 8-bit requantization of the same signal lands nearby, not equal
    assert(a16.toSeq != a8.toSeq)
    assert(a16.zip(a8).map { case (x, y) => math.abs(x - y) }.max < 0.05)
    // constant-amplitude signal has a flat envelope distinct from the ramped one
    assert(flat.drop(8).toSeq != a16.drop(8).toSeq)
    // non-audio payloads yield the zero vector (metadata-filter first)
    assert(dec.decode("not audio".getBytes, meta).forall(_ == 0f))
  }

  // --- animated GIF: the real multi-frame container path -------------

  private def mosaic(seed: Int): java.awt.image.BufferedImage = {
    val rnd  = new scala.util.Random(1000 + seed)
    val grid = Array.fill(8, 8)(32 + rnd.nextInt(192))
    val img  = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val c = grid(y / 8)(x / 8)
      img.setRGB(x, y, (c << 16) | (c << 8) | c)
    }
    img
  }

  /** Pure-JDK animated-GIF encode: the gif ImageWriter's sequence API. */
  private def animatedGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val bos    = new java.io.ByteArrayOutputStream()
    val ios    = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f => writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  /** Pure-JDK multi-frame decode back to images (for the re-encode arm). */
  private def gifImages(payload: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
    val iis    = javax.imageio.ImageIO.createImageInputStream(new java.io.ByteArrayInputStream(payload))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    try (0 until reader.getNumImages(true)).map(reader.read)
    finally { reader.dispose(); iis.close() }
  }

  test("REAL animated-GIF decode: frame enumeration, sampling, single-frame ≡ whole-image hash") {
    val frames = (0 until 5).map(mosaic)
    val gif    = animatedGif(frames)
    val all    = Multimodal.decodeGifFrames(gif)
    assert(all.map(_._1) == (0 until 5), s"frame indexes: ${all.map(_._1)}")
    // every-2nd sampling keeps exactly the even frames
    assert(Multimodal.decodeGifFrames(gif, everyNth = 2).map(_._1) == Seq(0, 2, 4))
    // a single-frame GIF hashes identically to the same image decoded
    // whole (both run the shared dctFeatures front end)
    val one     = animatedGif(Seq(frames.head))
    val whole   = new Multimodal.ImageDecoder()
      .decode(one, Multimodal.MediaMeta("image/gif", 64, 64, 0L))
    val sampled = Multimodal.decodeGifFrames(one)
    assert(sampled.size == 1 && sampled.head._2.toSeq == whole.toSeq)
    // non-GIF / undecodable payloads yield no rows, not a throw
    assert(Multimodal.decodeGifFrames("not a gif".getBytes).isEmpty)
    val png = { // real image, wrong container: filtered, not mis-hashed
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(frames.head, "png", bos); bos.toByteArray
    }
    assert(Multimodal.decodeGifFrames(png).isEmpty)
  }

  test("REAL animated-GIF frame dedup: re-encoded copy matches on every aligned frame") {
    import spark.implicits._
    import graft.operators.Dedup
    // three distinct 4-frame "videos"; 100 is a decode→re-encode copy
    // of 0 (fresh palette quantization pass — the GIF analogue of the
    // JPEG re-encode arm in the image test)
    val vids: Seq[(Long, Array[Byte])] = (0 until 3).map { v =>
      v.toLong -> animatedGif((0 until 4).map(f => mosaic(v * 10 + f)))
    }
    val reenc   = 100L -> animatedGif(gifImages(vids.head._2))
    val mediaDf = (vids :+ reenc).toDF("media_id", "payload")
    val sigs = Multimodal
      .gifFrameFeatures(mediaDf)
      .select($"media_id", $"frame_idx", $"features".as("f"))
      .select($"media_id", $"frame_idx", $"f", Multimodal.featureMean($"f").as("mu"))
      .select(($"media_id" * 1000L + $"frame_idx").as("fid"),
        Multimodal.thresholdBits($"f", $"mu").as("phash"))
    val aligned = Dedup
      .bitSigPairs(sigs, "fid", "phash", maxHamming = 6, chunks = 8)
      .filter(pmod($"id_a", lit(1000L)) === pmod($"id_b", lit(1000L)))
      .select(expr("id_a div 1000").as("ma"), expr("id_b div 1000").as("mb"))
      .groupBy($"ma", $"mb").agg(count(lit(1)).as("matched"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the copy matches its source on ALL 4 aligned frames; distinct
    // videos share none
    assert(aligned == Map((0L, 100L) -> 4L), s"aligned matches: $aligned")
  }

  /** Animated-GIF encode where every frame after the first is stored as
    * a PARTIAL raster (the changed region only) at an (x, y) offset
    * with doNotDispose disposal — the size-optimized delta encoding
    * real GIF optimizers emit.
    */
  private def deltaGif(
      first: java.awt.image.BufferedImage,
      deltas: Seq[(java.awt.image.BufferedImage, Int, Int)]
  ): Array[Byte] = {
    import javax.imageio.metadata.IIOMetadataNode
    val bos    = new java.io.ByteArrayOutputStream()
    val ios    = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    def write(img: java.awt.image.BufferedImage, left: Int, top: Int): Unit = {
      val itype = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
      val meta  = writer.getDefaultImageMetadata(itype, writer.getDefaultWriteParam)
      val fmt   = "javax_imageio_gif_image_1.0"
      val root  = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
      def node(tag: String): IIOMetadataNode = {
        val nl = root.getElementsByTagName(tag)
        if (nl.getLength > 0) nl.item(0).asInstanceOf[IIOMetadataNode]
        else { val n = new IIOMetadataNode(tag); root.appendChild(n); n }
      }
      val desc = node("ImageDescriptor")
      desc.setAttribute("imageLeftPosition", left.toString)
      desc.setAttribute("imageTopPosition", top.toString)
      val gce = node("GraphicControlExtension")
      gce.setAttribute("disposalMethod", "doNotDispose")
      if (gce.getAttribute("userInputFlag").isEmpty) gce.setAttribute("userInputFlag", "FALSE")
      if (gce.getAttribute("transparentColorFlag").isEmpty)
        gce.setAttribute("transparentColorFlag", "FALSE")
      if (gce.getAttribute("delayTime").isEmpty) gce.setAttribute("delayTime", "10")
      if (gce.getAttribute("transparentColorIndex").isEmpty)
        gce.setAttribute("transparentColorIndex", "0")
      meta.setFromTree(fmt, root)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta), null)
    }
    write(first, 0, 0)
    deltas.foreach { case (img, l, t) => write(img, l, t) }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  test("GIF partial-frame compositing: size-optimized delta re-encode hashes equal to full-frame") {
    // frame 0 = a mosaic; frames 1/2 change ONE 8x8 tile each. The
    // full-frame arm stores each frame whole; the optimized arm stores
    // frames 1/2 as the changed 8x8 raster at its offset with
    // doNotDispose — the size-optimized encoding. Grayscale tiles
    // palette losslessly, so the composites must be pixel-identical
    // and the per-frame DCT features EXACTLY equal.
    def withTile(src: java.awt.image.BufferedImage, tx: Int, ty: Int, gray: Int) = {
      val c = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = c.createGraphics(); g.drawImage(src, 0, 0, null); g.dispose()
      for (y <- ty * 8 until ty * 8 + 8; x <- tx * 8 until tx * 8 + 8)
        c.setRGB(x, y, (gray << 16) | (gray << 8) | gray)
      c
    }
    def tileOnly(gray: Int) = {
      val c = new java.awt.image.BufferedImage(8, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 8)
        c.setRGB(x, y, (gray << 16) | (gray << 8) | gray)
      c
    }
    val f0 = mosaic(7)
    val f1 = withTile(f0, 3, 2, 250)
    val f2 = withTile(f1, 1, 5, 17)
    val full  = animatedGif(Seq(f0, f1, f2))
    val delta = deltaGif(f0, Seq((tileOnly(250), 24, 16), (tileOnly(17), 8, 40)))
    val a = Multimodal.decodeGifFrames(full)
    val b = Multimodal.decodeGifFrames(delta)
    assert(a.map(_._1) == Seq(0, 1, 2) && b.map(_._1) == Seq(0, 1, 2))
    a.zip(b).foreach { case ((i, fa), (_, fb)) =>
      assert(fa.toSeq == fb.toSeq, s"frame $i features diverge")
    }
    // and the compositing is real, not a no-op: the delta arm's stored
    // frame 1 is an 8x8 raster, yet its composite hashes as the full
    // 64x64 frame — equal to the full-frame arm's, different from frame 0
    assert(a(1)._2.toSeq != a(0)._2.toSeq)
  }
}
