package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, batch-decoded per partition.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub; everything Spark-side — schema, batch
  * shape, partition-local batching, metadata extraction — is real. In
  * production, swap [[decodeStub]] for a real codec call; the
  * `mapPartitions`-with-batching shape is exactly what a vectorized
  * (Arrow/pandas-style) decode UDF compiles to, and parallelism is purely
  * input-partition driven — no shuffle anywhere in this operator.
  */
object Multimodal {

  /** Decoded-asset metadata: what a real decoder would yield alongside the
    * tensor. The fake "features" are the first `featDim` bytes scaled to
    * [0,1] — deterministic, shape-correct. */
  case class AssetMeta(byteLen: Long, sha256: String, features: Array[Float])

  /** STUB — deterministic fake decode. Real implementation would decode the
    * codec here (JPEG/PNG/WAV frame extraction). */
  def decodeStub(bytes: Array[Byte], featDim: Int): AssetMeta = {
    val digest = java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).map("%02x".format(_)).mkString
    val feats = Array.tabulate(featDim)(i =>
      if (i < bytes.length) (bytes(i) & 0xff) / 255.0f else 0.0f)
    AssetMeta(bytes.length.toLong, digest, feats)
  }

  /** Batch feature extraction over a binary column: appends
    * (byte_len BIGINT, sha256 STRING, features ARRAY<FLOAT>).
    * Batches of `batchSize` rows per call mirror how a vectorized decoder
    * amortizes per-call overhead. */
  def extractFeatures(df: DataFrame, binCol: String, featDim: Int = 8,
                      batchSize: Int = 256): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("byte_len", LongType, nullable = false),
      StructField("sha256", StringType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val idx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.emptyByteArray)
          val m = decodeStub(bytes, featDim)
          Row.fromSeq(r.toSeq ++ Seq(m.byteLen, m.sha256, m.features.toSeq))
        }
      }
    }(enc)
  }

  /** Mean of a float-features array, accumulated in double (exact float→
    * double widening, fixed left fold — oracle-replayable). MATERIALIZE the
    * result as a column before passing it to [[aHash64]]: Catalyst does not
    * CSE interpreted HOFs, so inlining would recompute the mean per pixel. */
  def featureMean(featCol: Column): Column =
    aggregate(featCol, lit(0.0), (a, v) => a + v) / size(featCol)

  /** 63-bit average-hash (aHash — the classic perceptual image hash) over a
    * decoded pixel/feature array: bit j set iff pixel_{j+1} exceeds the
    * mean (mean still over ALL pixels). On real decoders the array is the
    * 8×8 grayscale downsample; here it is the stub's byte features — the
    * hash→band→Hamming pipeline ([[Dedup.hammingPairs64]]) is identical
    * either way. Bit 63 stays clear so the value is positive in engines
    * with checked 64-bit shifts — the same design as the 62-bit SimHash. */
  def aHash64(featCol: Column, meanCol: Column): Column =
    aggregate(
      zip_with(slice(featCol, 1, 63), sequence(lit(0), lit(62)), (v, j) =>
        when(v.cast("double") > meanCol,
          call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (a, x) => a + x)

  /** JVM twin of decode-stub → [[featureMean]] → [[aHash64]] in ONE tight
    * loop per row (no 64-element array materialization, no interpreted
    * lambdas — the HOF composition costs ~64 boxed lambda evals per stage
    * per row and dominated the q113 bench). Bit-identical to the
    * declarative pipeline: float pixel division, double mean fold, strict
    * `>` vote, 63-bit result (pinned by DedupSpec). */
  def perceptualHashStub(bytes: Array[Byte], nPixels: Int): Long = {
    var sum = 0.0
    var i = 0
    while (i < nPixels) {
      val px = if (i < bytes.length) (bytes(i) & 0xff) / 255.0f else 0.0f
      sum += px
      i += 1
    }
    val mean = sum / nPixels
    var h = 0L
    i = 0
    while (i < 63) {
      val px = if (i < bytes.length) (bytes(i) & 0xff) / 255.0f else 0.0f
      if (px.toDouble > mean) h |= (1L << i)
      i += 1
    }
    h
  }

  /** Perceptual-hash column for a corpus: (id, ph) via [[perceptualHashStub]]
    * over the binary column — the production shape (real decoders run here
    * too; the per-row loop is where a JPEG downsample would go).
    *
    * Oracle-parity precondition: the stub reads raw BYTES (`b & 0xff`). A
    * SQL replay over a text column sees per-character CODE POINTS, which
    * agree with UTF-8 bytes only for ASCII — callers gating text-derived
    * binaries must exclude non-ASCII rows on BOTH sides (as q113 does).
    * Real image bytes have no such caveat. */
  def perceptualHashes(df: DataFrame, idCol: String, binCol: String,
                       nPixels: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        (id, perceptualHashStub(
          Option(bytes).getOrElse(Array.emptyByteArray), nPixels))
      }
      .toDF(idCol, "ph")
  }

  /** Deterministic frame sampling plan for a (stub) video column: emits one
    * row per sampled frame index — the explode-side plumbing of a real
    * frame sampler. */
  def sampleFrames(df: DataFrame, binCol: String, everyNBytes: Int): DataFrame =
    df.withColumn("frame_index",
        explode(sequence(lit(0),
          greatest(ceil(length(col(binCol)) / everyNBytes) - 1, lit(0)))))
      .withColumn("frame_offset", col("frame_index") * everyNBytes)

  // ---- REAL decoders (JDK codecs via sources.BinaryMedia) ----------------

  /** REAL image decode over a binary column — `javax.imageio` (PNG/GIF/BMP/
    * JPEG), not the stub: per row, decode → integer 8×8 average-pool →
    * mean + 63-bit aHash ([[graft.sources.BinaryMedia.aHash63]]). Purely
    * map-side (one Dataset.map, no shuffle); parallelism is input-partition
    * driven, which is exactly how a 100 TB image corpus scans — the codec
    * cost rides inside the scan stage. Undecodable or non-8-divisible
    * rasters yield a `decode_ok = false` marker row (nulls for stats), the
    * same typed-skip accounting as [[graft.sources.DocumentSource]]. */
  def decodeImageStats(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val decoded = graft.sources.BinaryMedia
          .decodeGrayImage(Option(bytes).getOrElse(Array.emptyByteArray))
        val pooled = decoded.flatMap(graft.sources.BinaryMedia.avgPool8)
        (pooled, decoded) match {
          case (Some(blocks), Some(img)) =>
            var sum = 0L; var i = 0
            while (i < 64) { sum += blocks(i); i += 1 }
            (id, true, Some(img.width), Some(img.height),
              Some(sum / 64.0), Some(graft.sources.BinaryMedia.aHash63(blocks)))
          case _ => (id, false, None, None, None, None)
        }
      }
      .toDF(idCol, "decode_ok", "width", "height", "mean_gray", "ahash")
  }

  /** REAL WAV decode over a binary column — `javax.sound.sampled`, 16-bit
    * PCM: per row emits sample count, container rate, peak |amplitude| and
    * the mean-square energy (integer sum of squares ÷ n — exact in double
    * far past any real clip length). Map-side only, like
    * [[decodeImageStats]]. */
  def decodeWavStats(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        graft.sources.BinaryMedia
          .decodeWavPcm16(Option(bytes).getOrElse(Array.emptyByteArray)) match {
          case Some(a) =>
            var peak = 0L; var sq = 0.0; var i = 0
            while (i < a.samples.length) {
              val s = a.samples(i).toLong
              if (math.abs(s) > peak) peak = math.abs(s)
              sq += (s * s).toDouble
              i += 1
            }
            val n = a.samples.length
            (id, true, Some(n.toLong), Some(a.sampleRate),
              Some(peak), Some(if (n == 0) 0.0 else sq / n))
          case None => (id, false, None, None, None, None)
        }
      }
      .toDF(idCol, "decode_ok", "n_samples", "sample_rate", "peak", "mean_square")
  }

  /** Goertzel tone detection at f = sampleRate/6 over a WAV binary
    * column — REAL decode ([[decodeWavStats]]'s codec), then the
    * Goertzel recurrence s_i = x_i + s_{i−1} − s_{i−2} (the coefficient
    * 2·cos(2π/6) = 1 EXACTLY, so the whole filter is integer
    * arithmetic — no libm, no rounding, and the recurrence telescopes
    * to the period-6 weight pattern u = [1,1,0,−1,−1,0]). Emits the
    * final-state pair (s1, s2), the bin power P = s1² + s2² − s1·s2,
    * the total energy Σx², and P's Parseval share P/(N·Σx²) — the
    * "is there a tone at this frequency" detector (dial-tone/DTMF-style
    * screening, beep detection in call audio) as exact BIGINTs.
    * Map-side only: codec + O(N) integer fold per row. */
  def goertzelTone(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val u = Array(1L, 1L, 0L, -1L, -1L, 0L)
    val folded = df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        graft.sources.BinaryMedia
          .decodeWavPcm16(Option(bytes).getOrElse(Array.emptyByteArray)) match {
          case Some(a) if a.samples.nonEmpty =>
            val n = a.samples.length
            var s1 = 0L; var s2 = 0L; var e = 0L; var i = 0
            while (i < n) {
              val x = a.samples(i).toLong
              s1 += x * u(((n - 1 - i) % 6 + 6) % 6)
              if (i <= n - 2) s2 += x * u(((n - 2 - i) % 6 + 6) % 6)
              e += x * x
              i += 1
            }
            (id, true, Some(n.toLong), Some(s1), Some(s2),
              Some(s1 * s1 + s2 * s2 - s1 * s2), Some(e))
          case _ => (id, false, None, None, None, None, None)
        }
      }
      .toDF(idCol, "decode_ok", "n_samples", "s1", "s2", "p_tone",
        "energy")
    folded.withColumn("tone_share",
      when(col("energy") > 0, round(col("p_tone").cast("double") /
        (col("n_samples") * col("energy")).cast("double"), 6)))
  }

  /** Integer Sobel + Laplacian sharpness audit over an image binary
    * column — REAL decode ([[decodeImageStats]]'s codec), then over the
    * INTERIOR pixels the exact integer sums of Sobel gradient energy
    * Σ(Gx²+Gy²) and the 4-neighbor Laplacian's first two moments. The
    * classic variance-of-Laplacian blur score and edge-density screen a
    * vision-data pipeline runs to drop blank/blurry frames before
    * captioning — emitted as exact BIGINTs so the derived variance is
    * ONE fixed double tree in the caller. Map-side only. */
  def imageGradientStats(df: DataFrame, idCol: String,
                         binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        graft.sources.BinaryMedia
          .decodeGrayImage(Option(bytes).getOrElse(Array.emptyByteArray)) match {
          case Some(img) if img.width >= 3 && img.height >= 3 =>
            val w = img.width; val h = img.height
            def p(x: Int, y: Int): Long = img.gray(y * w + x).toLong
            var ee = 0L; var ls = 0L; var lq = 0L
            var y = 1
            while (y < h - 1) {
              var x = 1
              while (x < w - 1) {
                val gx = (p(x + 1, y - 1) + 2 * p(x + 1, y) +
                  p(x + 1, y + 1)) - (p(x - 1, y - 1) +
                  2 * p(x - 1, y) + p(x - 1, y + 1))
                val gy = (p(x - 1, y + 1) + 2 * p(x, y + 1) +
                  p(x + 1, y + 1)) - (p(x - 1, y - 1) +
                  2 * p(x, y - 1) + p(x + 1, y - 1))
                val l = 4 * p(x, y) - p(x - 1, y) - p(x + 1, y) -
                  p(x, y - 1) - p(x, y + 1)
                ee += gx * gx + gy * gy
                ls += l; lq += l * l
                x += 1
              }
              y += 1
            }
            val nI = (w - 2).toLong * (h - 2)
            (id, true, Some(w), Some(h), Some(nI), Some(ee), Some(ls),
              Some(lq))
          case _ => (id, false, None, None, None, None, None, None)
        }
      }
      .toDF(idCol, "decode_ok", "width", "height", "n_interior",
        "edge_energy", "lap_sum", "lap_sq")
  }

  /** REAL frame sampling over an animated-GIF binary column: decode all
    * frames (`javax.imageio` GIF reader), keep every `everyN`-th, emit
    * (frame_index, mean gray). The row-explode shape of [[sampleFrames]]
    * with an actual codec in the loop — still zero shuffle. */
  def gifFrameMeans(df: DataFrame, idCol: String, binCol: String,
                    everyN: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        graft.sources.BinaryMedia
          .decodeGifFrames(Option(bytes).getOrElse(Array.emptyByteArray))
          .zipWithIndex
          .collect { case (img, fIdx) if fIdx % everyN == 0 =>
            var sum = 0L; var i = 0
            while (i < img.gray.length) { sum += img.gray(i); i += 1 }
            (id, fIdx, sum / math.max(img.gray.length, 1).toDouble)
          }
      }
      .toDF(idCol, "frame_index", "frame_mean")
  }

  /** Energy-threshold voice-activity segmentation over a WAV binary
    * column: decode (REAL `javax.sound.sampled` PCM16), frame into
    * `frameLen`-sample windows (trailing partial frame dropped), keep
    * frames with integer sum-of-squares energy ≥ `energyThreshold`, and
    * merge consecutive kept frames into segments (gaps-and-islands:
    * frame − row_number is constant within a run). The decode+energy pass
    * is map-side; the only shuffle is the per-clip island window — one
    * exchange keyed by clip id, exactly the q221 clean-block shape on
    * audio. Energies are exact BIGINTs, so the oracle replays the
    * segmentation arithmetically. */
  def vadSegments(df: DataFrame, idCol: String, binCol: String,
                  frameLen: Int, energyThreshold: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val frames = df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        graft.sources.BinaryMedia
          .decodeWavPcm16(Option(bytes).getOrElse(Array.emptyByteArray)) match {
          case Some(a) =>
            val nFrames = a.samples.length / frameLen
            (0 until nFrames).map { f =>
              var e = 0L; var i = f * frameLen
              while (i < (f + 1) * frameLen) {
                val s = a.samples(i).toLong; e += s * s; i += 1
              }
              (id, f, e)
            }
          case None => Nil
        }
      }.toDF("id", "frame", "energy")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy("frame")
    frames.filter(col("energy") >= energyThreshold)
      .withColumn("_isl", col("frame") - row_number().over(w))
      .groupBy(col("id"), col("_isl"))
      .agg(min("frame").as("start_frame"), max("frame").as("end_frame"),
        count(lit(1)).as("n_frames"), sum("energy").as("energy"))
      .select("id", "start_frame", "end_frame", "n_frames", "energy")
  }

  /** Render a text column to scanned-page PNGs with the fixed 5×7 OCR
    * font ([[graft.sources.Ocr]]): appends `page_png BINARY` holding the
    * first `chars` normalized characters laid out `cols` per line. Pure
    * map-side — the render (like any codec) rides the scan stage. */
  def renderTextPages(df: DataFrame, textCol: String, chars: Int,
                      cols: Int): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("page_png", BinaryType))
    val idx = df.schema.fieldIndex(textCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val text = Option(r.getString(idx)).getOrElse("")
        Row.fromSeq(r.toSeq :+
          graft.sources.Ocr.renderPagePng(text.take(chars), cols))
      }
    }(enc)
  }

  /** OCR a binary image column with the deterministic fixed-font
    * recognizer: appends `ocr_text STRING` — the full recognized grid
    * with line pad KEPT (so `replace(ocr_text, '\n', '')` reconstructs
    * the page's character stream exactly) — NULL when the bytes don't
    * decode or don't honor the page layout contract. Map-side like every
    * codec; decode + segment + template match per row. */
  def ocrColumn(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("ocr_text", StringType))
    val idx = df.schema.fieldIndex(binCol)
    val enc = RowEncoder.encoderFor(schema)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = Option(r.getAs[Array[Byte]](idx)).getOrElse(Array.emptyByteArray)
        val ocr = graft.sources.BinaryMedia.decodeGrayImage(bytes)
          .flatMap(graft.sources.Ocr.ocrImage).orNull
        Row.fromSeq(r.toSeq :+ ocr)
      }
    }(enc)
  }
}
