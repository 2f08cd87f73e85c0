package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{IIOImage, ImageIO}
import javax.sound.sampled.AudioSystem

/** JDK-only image/audio codecs for the multimodal column family — the same
  * "no external codec needed" move as [[BinaryText]]: the JDK ships real
  * PNG/GIF/BMP/JPEG readers (`javax.imageio`) and a real WAV reader
  * (`javax.sound.sampled`), all of which work headless. Lossless formats
  * (PNG, GIF with ≤256 colors, 16-bit PCM WAV) round-trip bit-exactly, so
  * decoded-pixel statistics are deterministic and oracle-replayable — the
  * decode step of the multimodal pipeline is REAL, not a stub
  * (reference keeps image handling behind its embedding service;
  * src/server/app/embed/document.py:192-222 is the closest analogue).
  *
  * Decode failures (truncated bytes, unknown format, non-PCM audio) yield
  * `None`; callers surface a typed marker row, mirroring
  * [[DocumentSource]]'s skip_reason accounting.
  */
object BinaryMedia {

  // ImageIO's stream factories default to FILE-backed caches: every
  // encode/decode call creates (and deletes) a temp file even when the
  // source/sink is an in-memory byte array. All call sites here are
  // byte-array round-trips, so memory-cached streams are strictly
  // cheaper and bit-identical — the codec itself (the real JDK
  // PNG/GIF/JPEG reader/writer) is untouched. Measured r12: the temp
  // file dance dominated per-image cost for 16×16 rasters.
  ImageIO.setUseCache(false)

  /** A decoded raster reduced to one grayscale sample per pixel, row-major.
    * Single-band rasters read the raw sample (lossless for gray PNG/GIF);
    * color rasters reduce via integer ITU-R 601 luma
    * `(299·R + 587·G + 114·B) / 1000` — all-integer, engine-replayable. */
  final case class GrayImage(width: Int, height: Int, gray: Array[Int])

  /** 16-bit PCM mono/stereo audio: raw samples in file order (interleaved
    * when stereo), plus the container-declared rate. */
  final case class PcmAudio(sampleRate: Int, channels: Int, samples: Array[Short])

  // ---- encoders (fixture/ingest side; also what a sink would use) -------

  /** Gray 8-bit PNG from row-major samples in [0,255]. Lossless. */
  def encodeGrayPng(width: Int, height: Int, gray: Array[Int]): Array[Byte] =
    encodeGray(width, height, gray, "png")

  /** Gray 8-bit single-frame GIF. Lossless for ≤256 gray levels. */
  def encodeGrayGif(width: Int, height: Int, gray: Array[Int]): Array[Byte] =
    encodeGray(width, height, gray, "gif")

  private def encodeGray(width: Int, height: Int, gray: Array[Int],
                         fmt: String): Array[Byte] = {
    val img = grayImage(width, height, gray)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  private def grayImage(width: Int, height: Int, gray: Array[Int]): BufferedImage = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    // TYPE_BYTE_GRAY is one byte bank, scanline stride == width: fill the
    // backing array directly instead of a setSample call per pixel (the
    // cast matches setSample's own (byte)v store bit-for-bit)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var i = 0
    val n = width * height
    while (i < n) { data(i) = gray(i).toByte; i += 1 }
    img
  }

  /** Multi-frame (animated) GIF from per-frame gray rasters — the fixture
    * side of real video-style frame sampling. */
  def encodeAnimatedGif(width: Int, height: Int,
                        frames: Seq[Array[Int]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        writer.writeToSequence(new IIOImage(grayImage(width, height, f), null, null),
          writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** 16-bit PCM mono WAV (RIFF little-endian) from raw samples. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  // ---- decoders (the operator side) -------------------------------------

  /** Decode any ImageIO-supported format (PNG/GIF/BMP/JPEG in a stock JDK)
    * to a [[GrayImage]]. None on undecodable bytes. */
  def decodeGrayImage(bytes: Array[Byte]): Option[GrayImage] =
    try {
      Option(ImageIO.read(new ByteArrayInputStream(bytes))).map(toGray)
    } catch { case _: Exception => None }

  private def toGray(img: BufferedImage): GrayImage = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Int](w * h)
    val raster = img.getRaster
    if (raster.getNumBands == 1) {
      // bulk band read — same samples as the per-pixel getSample loop,
      // one bounds-checked call instead of w·h megamorphic ones
      raster.getSamples(0, 0, w, h, 0, out)
    } else {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          out(y * w + x) =
            (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
          x += 1
        }
        y += 1
      }
    }
    GrayImage(w, h, out)
  }

  /** All frames of a (possibly animated) GIF as gray rasters, in stored
    * order. Empty on undecodable bytes. */
  def decodeGifFrames(bytes: Array[Byte]): Seq[GrayImage] =
    try {
      val readers = ImageIO.getImageReadersByFormatName("gif")
      if (!readers.hasNext) return Seq.empty
      val reader = readers.next()
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        (0 until n).map(i => toGray(reader.read(i)))
      } finally { reader.dispose(); iis.close() }
    } catch { case _: Exception => Seq.empty }

  /** Decode WAV via the JDK's real audio stack. Only 16-bit PCM survives
    * (the fixture format and the overwhelmingly common corpus format);
    * anything else is None rather than a lossy approximation. */
  def decodeWavPcm16(bytes: Array[Byte]): Option[PcmAudio] =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 16) None
        else {
          val pcm = ais.readAllBytes()
          val n = pcm.length / 2
          val out = new Array[Short](n)
          var i = 0
          if (f.isBigEndian)
            while (i < n) { out(i) = (((pcm(2 * i) & 0xff) << 8) | (pcm(2 * i + 1) & 0xff)).toShort; i += 1 }
          else
            while (i < n) { out(i) = ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort; i += 1 }
          Some(PcmAudio(f.getSampleRate.toInt, f.getChannels, out))
        }
      } finally ais.close()
    } catch { case _: Exception => None }

  /** Integer 8×8 average-pool of a gray raster whose sides are multiples of
    * 8: block value = floor(mean of its pixels). All-integer → replayable
    * as `sum // blockArea` in any engine. Returns the 64 block values
    * row-major, or None if the raster shape doesn't pool evenly. */
  def avgPool8(img: GrayImage): Option[Array[Int]] = {
    val bw = img.width / 8
    val bh = img.height / 8
    if (bw == 0 || bh == 0 || img.width % 8 != 0 || img.height % 8 != 0) None
    else {
      val out = new Array[Int](64)
      var by = 0
      while (by < 8) {
        var bx = 0
        while (bx < 8) {
          var sum = 0
          var dy = 0
          while (dy < bh) {
            var dx = 0
            while (dx < bw) {
              sum += img.gray((by * bh + dy) * img.width + (bx * bw + dx))
              dx += 1
            }
            dy += 1
          }
          out(by * 8 + bx) = sum / (bw * bh)
          bx += 1
        }
        by += 1
      }
      Some(out)
    }
  }

  /** 63-bit aHash over 64 pooled blocks: bit j (0..62) set iff
    * block(j) > mean(all 64 blocks). Same 63-bit/strict-`>` design as
    * [[graft.operators.Multimodal.perceptualHashStub]], so the result feeds
    * the existing band-blocked Hamming machinery unchanged. */
  def aHash63(blocks: Array[Int]): Long = {
    var sum = 0L
    var i = 0
    while (i < 64) { sum += blocks(i); i += 1 }
    val mean = sum / 64.0
    var h = 0L
    i = 0
    while (i < 63) {
      if (blocks(i).toDouble > mean) h |= (1L << i)
      i += 1
    }
    h
  }
}
