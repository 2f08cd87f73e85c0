package graft

import graft.operators.Multimodal
import graft.sources.BinaryMedia
import org.apache.spark.sql.functions._

/** Real JDK media codecs (BinaryMedia) + the decode operators over them. */
class MediaCodecSpec extends SparkSpec {

  private def pattern(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h)(i => ((i % w) * 7 + (i / w) * 13 + seed * 31) % 256)

  test("gray PNG round-trips bit-exactly through the JDK codec") {
    val pix = pattern(16, 16, 5)
    val bytes = BinaryMedia.encodeGrayPng(16, 16, pix)
    val img = BinaryMedia.decodeGrayImage(bytes).get
    assert(img.width == 16 && img.height == 16)
    assert(img.gray.toSeq == pix.toSeq)
  }

  test("gray GIF round-trips bit-exactly and matches the PNG path") {
    val pix = pattern(16, 16, 9)
    val viaGif = BinaryMedia.decodeGrayImage(BinaryMedia.encodeGrayGif(16, 16, pix)).get
    val viaPng = BinaryMedia.decodeGrayImage(BinaryMedia.encodeGrayPng(16, 16, pix)).get
    assert(viaGif.gray.toSeq == pix.toSeq)
    assert(viaGif.gray.toSeq == viaPng.gray.toSeq)
  }

  test("animated GIF preserves every frame in order") {
    val frames = (0 until 5).map(f => pattern(8, 8, f))
    val bytes = BinaryMedia.encodeAnimatedGif(8, 8, frames)
    val back = BinaryMedia.decodeGifFrames(bytes)
    assert(back.length == 5)
    back.zip(frames).foreach { case (img, want) =>
      assert(img.width == 8 && img.gray.toSeq == want.toSeq)
    }
  }

  test("WAV PCM16 round-trips samples and rate through javax.sound") {
    val samples = Array.tabulate(300)(i => (((i * 17 + 31) % 4096) - 2048).toShort)
    val a = BinaryMedia.decodeWavPcm16(BinaryMedia.encodeWavPcm16(samples, 8000)).get
    assert(a.sampleRate == 8000 && a.channels == 1)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("undecodable bytes yield None, never throw") {
    val junk = Array.tabulate(64)(i => (i * 37 % 256).toByte)
    assert(BinaryMedia.decodeGrayImage(junk).isEmpty)
    assert(BinaryMedia.decodeWavPcm16(junk).isEmpty)
    assert(BinaryMedia.decodeGifFrames(junk).isEmpty)
    assert(BinaryMedia.decodeGrayImage(Array.emptyByteArray).isEmpty)
  }

  test("avgPool8 is the integer block mean; odd shapes pool to None") {
    val flat = Array.fill(256)(10)
    flat(0) = 14 // block (0,0) sum = 14+10+10+10 = 44 -> 11
    val pooled = BinaryMedia.avgPool8(BinaryMedia.GrayImage(16, 16, flat)).get
    assert(pooled(0) == 11 && pooled.drop(1).forall(_ == 10))
    assert(BinaryMedia.avgPool8(BinaryMedia.GrayImage(12, 16, new Array[Int](192))).isEmpty)
  }

  test("aHash63 votes strict-> against the 64-block mean, bit 63 clear") {
    val blocks = Array.tabulate(64)(i => if (i % 2 == 0) 200 else 10)
    val h = BinaryMedia.aHash63(blocks)
    assert(h >= 0L) // bit 63 never set
    (0 until 63).foreach { j =>
      assert((((h >> j) & 1L) == 1L) == (blocks(j) > 105.0), s"bit $j")
    }
    // block 63 (odd -> 10, below mean) carries no bit either way
    assert(BinaryMedia.aHash63(blocks.updated(63, 255)) >= 0L)
  }

  test("decodeImageStats emits exact pooled stats and typed failure rows") {
    val pix = pattern(16, 16, 3)
    val good = BinaryMedia.encodeGrayPng(16, 16, pix)
    val df = spark.createDataFrame(Seq(
      (1L, good), (2L, Array.tabulate(32)(_.toByte)))).toDF("id", "img")
    val out = Multimodal.decodeImageStats(df, "id", "img")
      .orderBy("id").collect()
    val blocks = BinaryMedia.avgPool8(BinaryMedia.GrayImage(16, 16, pix)).get
    val wantMean = blocks.map(_.toLong).sum / 64.0
    assert(out(0).getBoolean(1) && out(0).getInt(2) == 16 && out(0).getInt(3) == 16)
    assert(out(0).getDouble(4) == wantMean)
    assert(out(0).getLong(5) == BinaryMedia.aHash63(blocks))
    assert(!out(1).getBoolean(1) && out(1).isNullAt(2) && out(1).isNullAt(5))
  }

  test("decodeWavStats: count, peak and mean-square match the samples") {
    val samples = Array[Short](100, -200, 300, -400)
    val df = spark.createDataFrame(Seq(
      (7L, BinaryMedia.encodeWavPcm16(samples, 8000)),
      (8L, Array[Byte](1, 2, 3)))).toDF("id", "wav")
    val out = Multimodal.decodeWavStats(df, "id", "wav").orderBy("id").collect()
    assert(out(0).getBoolean(1) && out(0).getLong(2) == 4L)
    assert(out(0).getInt(3) == 8000 && out(0).getLong(4) == 400L)
    assert(out(0).getDouble(5) == (100.0 * 100 + 200 * 200 + 300 * 300 + 400 * 400) / 4)
    assert(!out(1).getBoolean(1) && out(1).isNullAt(2))
  }

  test("gifFrameMeans samples every Nth frame with exact means") {
    val frames = (0 until 5).map(f => Array.fill(64)(f * 10))
    val df = spark.createDataFrame(Seq(
      (1L, BinaryMedia.encodeAnimatedGif(8, 8, frames)))).toDF("id", "gif")
    val out = Multimodal.gifFrameMeans(df, "id", "gif", everyN = 2)
      .orderBy("frame_index").collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(0, 2, 4))
    assert(out.map(_.getDouble(2)).toSeq == Seq(0.0, 20.0, 40.0))
  }

  test("JPEG (lossy) still decodes: dims exact, pixels near the original") {
    val pix = pattern(16, 16, 4)
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16)
      img.getRaster.setSample(x, y, 0, pix(y * 16 + x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val g = BinaryMedia.decodeGrayImage(bos.toByteArray).get
    assert(g.width == 16 && g.height == 16)
    // lossy but bounded: JPEG at default quality stays within ~25 levels
    val maxErr = g.gray.zip(pix).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr < 64, s"JPEG drifted $maxErr levels")
    // the operator marks it decoded (stats real, just not replay-exact)
    val df = spark.createDataFrame(Seq((1L, bos.toByteArray))).toDF("id", "img")
    val row = graft.operators.Multimodal.decodeImageStats(df, "id", "img").head()
    assert(row.getBoolean(1) && row.getInt(2) == 16)
  }

  test("applyMerges-style symbol guard rejects non [a-z]+ symbols") {
    import spark.implicits._
    val words = Seq(("ab", 1L)).toDF("word", "freq")
    intercept[IllegalArgumentException] {
      graft.operators.Bpe.applyMerges(words, Seq(("a", "b', chr(31)) --")))
    }
  }

  test("color rasters reduce via integer ITU-R 601 luma") {
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000) // pure red -> 299*255/1000 = 76
    img.setRGB(1, 0, 0x00ff00) // pure green -> 587*255/1000 = 149
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val g = BinaryMedia.decodeGrayImage(bos.toByteArray).get
    assert(g.gray.toSeq == Seq(76, 149))
  }

  test("vadSegments: islands merge, quiet frames split, partial frame drops") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // frames of 2: [0,0]=0, [100,100]=20k, [100,100]=20k, [0,0]=0,
    // [100,100]=20k; the final lone sample is a partial frame — dropped
    val samples = Array[Short](0, 0, 100, 100, 100, 100, 0, 0, 100, 100, 7)
    val df = Seq((1L, BinaryMedia.encodeWavPcm16(samples, 8000)))
      .toDF("doc_id", "wav")
    val segs = graft.operators.Multimodal
      .vadSegments(df, "doc_id", "wav", frameLen = 2, energyThreshold = 1L)
      .orderBy("start_frame")
      .select("start_frame", "end_frame", "n_frames", "energy")
      .as[(Int, Int, Long, Long)].collect().toSeq
    assert(segs == Seq((1, 2, 2L, 40000L), (4, 4, 1L, 20000L)))
  }

  test("goertzelTone: one period of the bin tone — hand recurrence; silence is null-share") {
    import spark.implicits._
    // x = [1,1,0,−1,−1,0]: s5 = −2, s4 = −4 → P = 4+16−8 = 12, E = 4,
    // Parseval share = 12/(6·4) = 0.5
    val tone = Array[Short](1, 1, 0, -1, -1, 0)
    val df = Seq((1L, BinaryMedia.encodeWavPcm16(tone, 8000)),
      (2L, BinaryMedia.encodeWavPcm16(Array[Short](0, 0, 0), 8000)))
      .toDF("doc_id", "wav")
    val out = Multimodal.goertzelTone(df, "doc_id", "wav")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getAs[Long]("s1") == -2L && r1.getAs[Long]("s2") == -4L)
    assert(r1.getAs[Long]("p_tone") == 12L &&
      r1.getAs[Long]("energy") == 4L)
    assert(r1.getAs[Double]("tone_share") == 0.5)
    // all-zero clip: energy 0 → share null (no division by zero)
    assert(out(2L).isNullAt(out(2L).fieldIndex("tone_share")))
  }

  test("imageGradientStats: flat image has zero energy; x-ramp has Sobel 8 per pixel") {
    import spark.implicits._
    val flat = Array.fill(16)(100)
    val ramp = Array.tabulate(16)(i => 10 * (i % 4)) // pixel = 10·x on 4×4
    val df = Seq((1L, BinaryMedia.encodeGrayPng(4, 4, flat)),
      (2L, BinaryMedia.encodeGrayPng(4, 4, ramp)))
      .toDF("doc_id", "img")
    val out = Multimodal.imageGradientStats(df, "doc_id", "img")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("edge_energy") == 0L &&
      out(1L).getAs[Long]("lap_sq") == 0L)
    // gx = 4·(step) = 80 per interior pixel, gy = 0, laplacian = 0
    assert(out(2L).getAs[Long]("n_interior") == 4L)
    assert(out(2L).getAs[Long]("edge_energy") == 4L * 80 * 80)
    assert(out(2L).getAs[Long]("lap_sq") == 0L)
  }
}
