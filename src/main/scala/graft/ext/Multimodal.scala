package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-star extension): image/audio/video
  * as opaque `BinaryType` columns + a typed metadata struct, with
  * decode / feature-extract / frame-sample stages.
  *
  * IMAGE, AUDIO and VIDEO decode are REAL, on JDK built-ins with no
  * native deps: `javax.imageio` (PNG, JPEG, BMP, GIF → pixel
  * statistics, [[decodeImage]]), `javax.sound.sampled` (WAV/AIFF/AU
  * PCM → amplitude statistics, [[decodeAudio]]), and for video an
  * animated-GIF multi-frame read plus an MJPEG-in-AVI RIFF walk
  * ([[decodeVideo]] → frame-count/luma-motion statistics). Codecs the
  * JVM genuinely lacks (H.264-class video, compressed audio) — and any
  * payload the readers cannot parse — ride the clearly-marked
  * deterministic STUB ([[stubDecode]]), fenced by `decode = "stub"` in
  * the output. Everything Spark-side is real and tested either way:
  * schema, binary packing, batched per-partition processing shape
  * (`mapPartitions` over row batches — the JVM analogue of
  * `mapInPandas` batch processing), and the 1→N frame-sampling
  * generator (`posexplode` over a computed frame index).
  *
  * Scale notes: binary payloads ride normal parquet pages; metadata-only
  * queries never touch the blob column (column pruning); frame sampling
  * fans out via a generator, not a collect.
  */
object Multimodal {

  /** Width of every feature vector both kernels emit. */
  val featureWidth = 8

  val metaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("content_md5", StringType),
    StructField("modality", StringType)))

  /** Pack a source column into (binary payload, metadata struct). */
  def pack(df: DataFrame, idCol: String, payload: org.apache.spark.sql.Column,
           modality: String): DataFrame =
    df.select(
      col(idCol).alias("media_id"),
      payload.cast("binary").alias("content"),
      struct(
        length(payload.cast("binary")).cast("long").alias("byte_len"),
        md5(payload.cast("binary")).alias("content_md5"),
        lit(modality).alias("modality")).alias("meta"))

  /** REAL image decode via `javax.imageio` (JDK built-in readers: PNG,
    * JPEG, BMP, GIF). Feature vector ([[featureWidth]] wide):
    * `[width, height, bands, mean_r, mean_g, mean_b, mean_luma,
    * stddev_luma]` (BT.601 luma) — deterministic pixel statistics, the
    * shape a quality filter or near-dup pre-pass consumes. Returns None
    * when the payload is not a parseable image (caller falls back to
    * [[stubDecode]]). Decompression-bomb guard: the header-declared
    * `width*height` is checked BEFORE the raster is materialized (a
    * tiny PNG can declare a multi-GiB raster; `ImageIO.read` would
    * allocate it all) — oversized images reject cheaply instead of
    * OOMing the executor. Pixel access uses `getRGB` per pixel — fine
    * for thumbnail/fixture scale; a production kernel on large images
    * would read the raster's data buffer directly, same feature math. */
  val maxImagePixels: Long = 64L * 1024 * 1024 // 64 MP ≈ 256 MiB ARGB raster

  /** Container-signature sniff: the JDK image readers only parse
    * payloads opening with one of these magics, so anything else can
    * skip reader probing entirely (`createImageInputStream` + the
    * service-registry scan cost ~0.4 ms/row — at corpus scale the
    * overwhelmingly common case is "not an image", and it must cost a
    * few byte compares, not a codec probe). */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) ||
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'B' && b(1) == 'M') ||
      (b(0) == 'I' && b(1) == 'I' && b(2) == 0x2A && b(3) == 0) || // TIFF LE
      (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 0x2A))   // TIFF BE

  /** WAV (`RIFF`), AIFF (`FORM`), AU (`.snd`) — the
    * `javax.sound.sampled` container set. */
  private def looksLikeAudio(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') ||
      (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M') ||
      (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd'))

  /** Per-executor-thread reader cache, keyed by container magic: the
    * `getImageReaders` service-registry scan costs ~0.1-0.4 ms per call
    * — at corpus scale that's the dominant per-image cost for small
    * thumbnails (a 24×24 BMP decodes in ~10 µs). JDK `ImageReader`s are
    * reusable via `setInput`; the cache holds one reader per format per
    * thread (bounded: 5 formats × pool threads), reset implicitly when
    * the executor thread dies. A reader that fails on a payload is
    * evicted so a corrupt-state reader cannot poison later rows. */
  private val readerCache =
    new ThreadLocal[scala.collection.mutable.Map[String, javax.imageio.ImageReader]] {
      override def initialValue() = scala.collection.mutable.Map.empty
    }

  private def magicKey(b: Array[Byte]): String =
    if (b(0) == 0x89.toByte) "png"
    else if (b(0) == 0xFF.toByte) "jpg"
    else if (b(0) == 'G') "gif"
    else if (b(0) == 'B') "bmp"
    else "tif"

  /** The one guarded ImageIO entry point (sniff → header-dimension bomb
    * check → raster read); every image kernel routes through it. */
  private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try {
      if (!looksLikeImage(bytes)) return None
      val key = magicKey(bytes)
      val cache = readerCache.get()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val reader = cache.getOrElse(key, {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); return None }
        val r = readers.next()
        cache.update(key, r)
        r
      })
      val img =
        try {
          reader.setInput(iis)
          // dimensions come from the header — no raster allocated yet
          val (w0, h0) = (reader.getWidth(0), reader.getHeight(0))
          if (w0 <= 0 || h0 <= 0 || w0.toLong * h0 > maxImagePixels) null
          else reader.read(0)
        } catch { case scala.util.control.NonFatal(e) =>
          // failed mid-decode: evict and dispose — reader state unknown
          cache.remove(key); reader.dispose(); throw e
        } finally iis.close()
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
      else Some(img)
      // NonFatal only: malformed payloads degrade to the stub fallback,
      // but fatal JVM errors (OOM, stack overflow) must fail the task
    } catch { case scala.util.control.NonFatal(_) => None }

  def decodeImage(bytes: Array[Byte]): Option[Array[Double]] =
    readImage(bytes).map { img =>
      val w = img.getWidth; val h = img.getHeight
      var sr = 0.0; var sg = 0.0; var sb = 0.0; var sl = 0.0; var sl2 = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xFF; val g = (rgb >> 8) & 0xFF; val b = rgb & 0xFF
          val l = 0.299 * r + 0.587 * g + 0.114 * b
          sr += r; sg += g; sb += b; sl += l; sl2 += l * l
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toDouble
      val meanL = sl / n
      Array(w.toDouble, h.toDouble, img.getRaster.getNumBands.toDouble,
        sr / n, sg / n, sb / n, meanL,
        math.sqrt(math.max(0.0, sl2 / n - meanL * meanL)))
    }

  /** REAL audio decode via `javax.sound.sampled` (JDK built-in readers:
    * WAV/AIFF/AU, PCM). Feature vector ([[featureWidth]] wide):
    * `[sample_rate, channels, frames, bits, mean, rms, peak,
    * zero_crossing_rate]` over amplitude-normalized samples (all
    * channels interleaved). Returns None when the payload is not a
    * parseable PCM audio container (caller falls back to
    * [[stubDecode]]). 8-bit (unsigned) and 16-bit (signed, either
    * endianness) PCM are handled — the formats the JDK writers emit. */
  def decodeAudio(bytes: Array[Byte]): Option[Array[Double]] =
    try {
      if (!looksLikeAudio(bytes)) return None
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = in.getFormat
      val enc = fmt.getEncoding
      val bits = fmt.getSampleSizeInBits
      val pcmSigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
      val pcmUnsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
      if (!(pcmSigned || pcmUnsigned) || (bits != 8 && bits != 16)) None
      else {
        val raw = in.readAllBytes()
        val n = raw.length / (bits / 8)
        if (n == 0) None
        else {
          var sum = 0.0; var sum2 = 0.0; var peak = 0.0; var zc = 0L
          var prevSign = 0; var i = 0
          while (i < n) {
            val v =
              if (bits == 8) {
                val b = raw(i) & 0xFF
                (if (pcmUnsigned) b - 128 else raw(i).toInt) / 128.0
              } else {
                val (lo, hi) = if (fmt.isBigEndian) (raw(2 * i + 1), raw(2 * i))
                               else (raw(2 * i), raw(2 * i + 1))
                // unsigned 16-bit: midpoint 0x8000 is silence, shift it
                // to 0 before normalizing (signed: plain sign extension)
                if (pcmUnsigned)
                  ((((hi & 0xFF) << 8) | (lo & 0xFF)) - 32768) / 32768.0
                else ((hi.toInt << 8) | (lo & 0xFF)).toShort / 32768.0
              }
            sum += v; sum2 += v * v
            if (math.abs(v) > peak) peak = math.abs(v)
            // sign change against the last NON-zero sample: a crossing
            // that lands exactly on 0 still counts once
            val s = java.lang.Math.signum(v).toInt
            if (s != 0) {
              if (prevSign != 0 && s != prevSign) zc += 1
              prevSign = s
            }
            i += 1
          }
          Some(Array(fmt.getSampleRate.toDouble, fmt.getChannels.toDouble,
            (n / fmt.getChannels).toDouble, bits.toDouble, sum / n,
            math.sqrt(sum2 / n), peak, zc.toDouble / n))
        }
      }
      // NonFatal only (see decodeImage): parse failures → None, JVM
      // errors propagate and fail the task
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Cap on frames DECODED per video payload: frames beyond the cap are
    * sampled evenly, never all materialized (a pathological million-
    * frame GIF costs 32 raster decodes, not a million). */
  val maxVideoFramesDecoded: Int = 32

  /** Animated GIF (`GIF87a`/`GIF89a`) or AVI (`RIFF....AVI `) — the
    * containers [[decodeVideo]] parses with JDK built-ins only. */
  private def looksLikeVideo(b: Array[Byte]): Boolean =
    b.length >= 12 && (
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||
      (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '))

  /** Mean luma (BT.601) of one frame — the per-frame statistic the
    * video features aggregate. */
  private def frameLuma(img: java.awt.image.BufferedImage): Double = {
    val w = img.getWidth; val h = img.getHeight
    var sl = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sl += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)
        x += 1
      }
      y += 1
    }
    sl / (w.toLong * h).toDouble
  }

  /** Evenly-spaced sample of `k` indices from `[0, n)` (all of them when
    * `n <= k`), first and last always included. */
  private def sampleIdx(n: Int, k: Int): Array[Int] =
    if (n <= k) Array.range(0, n)
    else Array.tabulate(k)(i => ((i.toLong * (n - 1)) / (k - 1)).toInt)

  /** Shared tail of both video decoders: frame-count + per-frame luma
    * statistics → the 8-wide feature vector `[n_frames, width, height,
    * n_decoded, mean_luma, stddev_luma, mean_abs_frame_delta,
    * container_tag]` (tag 1 = GIF, 2 = AVI). */
  private def videoFeatures(nTotal: Int, w: Int, h: Int,
                            lumas: Array[Double], tag: Double)
      : Option[Array[Double]] =
    if (lumas.isEmpty) None
    else {
      val n = lumas.length
      val mean = lumas.sum / n
      val variance = lumas.map(l => (l - mean) * (l - mean)).sum / n
      val delta =
        if (n < 2) 0.0
        else lumas.sliding(2).map(p => math.abs(p(1) - p(0))).sum / (n - 1)
      Some(Array(nTotal.toDouble, w.toDouble, h.toDouble, n.toDouble,
        mean, math.sqrt(math.max(0.0, variance)), delta, tag))
    }

  /** Animated-GIF decode: the JDK GIF reader exposes every frame via
    * `getNumImages(true)` + `read(i)`. Frames are raw coded rasters
    * (no disposal compositing — deterministic and cheap, which is what
    * a curation signal needs). */
  private def decodeGifVideo(bytes: Array[Byte]): Option[Array[Double]] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) return None
    val reader = readers.next()
    try {
      reader.setInput(iis)
      val (w0, h0) = (reader.getWidth(0), reader.getHeight(0))
      if (w0 <= 0 || h0 <= 0 || w0.toLong * h0 > maxImagePixels) return None
      val n = reader.getNumImages(true)
      if (n < 1) return None
      val lumas = sampleIdx(n, maxVideoFramesDecoded)
        .map(i => frameLuma(reader.read(i)))
      videoFeatures(n, w0, h0, lumas, tag = 1.0)
    } finally { reader.dispose(); iis.close() }
  }

  /** MJPEG-in-AVI decode via a pure-JVM RIFF walk: AVI is `RIFF` chunks
    * (fourcc + LE32 size, even-padded); frames live in the `movi` LIST
    * as `##dc`/`##db` chunks (optionally nested in `rec ` LISTs), each
    * holding one JPEG the JDK reader decodes. Chunk offsets are indexed
    * first, then [[maxVideoFramesDecoded]] frames are sampled evenly —
    * the scan is O(payload), the decode is O(cap). */
  private def decodeAviVideo(bytes: Array[Byte]): Option[Array[Double]] = {
    def le32(o: Int): Long =
      (bytes(o) & 0xFFL) | ((bytes(o + 1) & 0xFFL) << 8) |
        ((bytes(o + 2) & 0xFFL) << 16) | ((bytes(o + 3) & 0xFFL) << 24)
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def isFrameChunk(o: Int): Boolean =
      bytes(o) >= '0' && bytes(o) <= '9' && bytes(o + 1) >= '0' &&
        bytes(o + 1) <= '9' && bytes(o + 2) == 'd' &&
        (bytes(o + 3) == 'c' || bytes(o + 3) == 'b')
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var p = start
      while (p + 8 <= end) {
        val size = le32(p + 4)
        val body = p + 8
        if (size < 0 || body + size > end) return // malformed: stop scan
        val isList = bytes(p) == 'L' && bytes(p + 1) == 'I' &&
          bytes(p + 2) == 'S' && bytes(p + 3) == 'T'
        if (isList && size >= 4) {
          val lt = new String(bytes, body, 4, "US-ASCII")
          walk(body + 4, body + size.toInt, inMovi || lt == "movi")
        } else if (inMovi && isFrameChunk(p) && size > 0) {
          frames += ((body, size.toInt))
        }
        p = body + size.toInt + (size.toInt & 1) // chunks are even-padded
      }
    }
    walk(12, bytes.length, inMovi = false)
    if (frames.isEmpty) return None
    var w0 = 0; var h0 = 0
    val lumas = sampleIdx(frames.length, maxVideoFramesDecoded).flatMap { i =>
      val (off, len) = frames(i)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes, off, len))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0 ||
          img.getWidth.toLong * img.getHeight > maxImagePixels) None
      else {
        if (w0 == 0) { w0 = img.getWidth; h0 = img.getHeight }
        Some(frameLuma(img))
      }
    }
    videoFeatures(frames.length, w0, h0, lumas, tag = 2.0)
  }

  /** REAL video decode on JDK built-ins: animated GIF (multi-frame
    * `javax.imageio`) and MJPEG-in-AVI (RIFF container walk + per-frame
    * JPEG decode). Returns None for containers the JVM cannot parse
    * (H.264/VP9/compressed audio — no JDK codec exists; those payloads
    * ride [[stubDecode]] and are FENCED by `decode = "stub"`). */
  def decodeVideo(bytes: Array[Byte]): Option[Array[Double]] =
    try {
      if (!looksLikeVideo(bytes)) None
      else if (bytes(0) == 'G') decodeGifVideo(bytes)
      else decodeAviVideo(bytes)
      // NonFatal only (see decodeImage): parse failures → None, JVM
      // errors propagate and fail the task
    } catch { case scala.util.control.NonFatal(_) => None }

  /** STUB decode kernel for payloads with no JVM codec (H.264-class
    * video, compressed audio). Derives a deterministic fixed-width
    * "feature" from the payload bytes so the distributed plumbing
    * (batching, schema, shuffle) is fully exercised; downstream output
    * carries `decode = "stub"` so curation never mistakes these for
    * perceptual features. Swap the body for a native codec on a cluster
    * with the libs installed. */
  def stubDecode(bytes: Array[Byte]): Array[Double] = {
    val w = featureWidth
    val out = new Array[Double](w)
    var i = 0
    while (i < bytes.length) { out(i % w) += (bytes(i) & 0xFF).toDouble; i += 1 }
    out
  }

  /** Batched feature extraction over the binary column: `mapPartitions`
    * with an explicit batch shape (the `mapInPandas` analogue — one
    * buffer of `batchSize` rows decoded per iteration, amortizing any
    * per-batch codec setup). Kernel routing is per ROW on
    * `meta.modality` (a union of packed frames can mix modalities):
    * `"image"` → [[decodeImage]], `"audio"` → [[decodeAudio]],
    * `"video"` → [[decodeVideo]], each falling back to [[stubDecode]]
    * when the payload is not parseable; any other modality →
    * [[stubDecode]]. Output: (media_id, feature array, decode).
    *
    * The `decode` column FENCES the stub: `"image"`/`"audio"`/`"video"`
    * mark a real codec decode, `"stub"` marks the deterministic fake
    * (no-JVM-codec container / unparseable payload). Downstream curation must
    * filter `decode != 'stub'` before trusting features as perceptual —
    * silent fake features in a quality-filter pipeline would be a
    * correctness bug at 100 TB, not a convenience. */
  def extractFeatures(packed: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = packed.sparkSession
    // the id column keeps its INPUT type: pack() accepts any id, and a
    // cast("long") on string ids would null them and NPE in the kernel
    val outSchema = StructType(Seq(
      StructField("media_id", packed.schema("media_id").dataType),
      StructField("feature", ArrayType(DoubleType)),
      StructField("decode", StringType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    packed.select(col("media_id"), col("content"), col("meta.modality"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // per-batch setup would happen here (codec init, model load)
          batch.iterator.map { r =>
            val bytes = r.getAs[Array[Byte]](1)
            val (feats, how) = r.getString(2) match {
              case "image" => decodeImage(bytes).map((_, "image"))
                .getOrElse((stubDecode(bytes), "stub"))
              case "audio" => decodeAudio(bytes).map((_, "audio"))
                .getOrElse((stubDecode(bytes), "stub"))
              case "video" => decodeVideo(bytes).map((_, "video"))
                .getOrElse((stubDecode(bytes), "stub"))
              case _ => (stubDecode(bytes), "stub")
            }
            Row(r.get(0), feats.toSeq, how)
          }
        }
      }(enc)
  }

  /** Area-average (box-filter) resample of an image's BT.601 luma plane
    * to a fixed `tw`×`th` grid, row-major, values in [0, 255]. Each
    * target cell averages the source pixels whose centers fall in its
    * footprint — the correct filter for downscale (every source pixel
    * contributes exactly once, no aliasing); on upscale a cell's
    * footprint rounds up to ≥1 source pixel, degenerating to nearest
    * sampling. Deterministic: pure integer box boundaries
    * (`floor(i·src/dst)`), no AWT rescale ops (whose interpolation is
    * platform-varying). */
  def resizeLuma(img: java.awt.image.BufferedImage, tw: Int, th: Int): Array[Double] = {
    val w = img.getWidth; val h = img.getHeight
    // ONE bulk sRGB fetch: per-pixel getRGB(x, y) routes every sample
    // through ColorModel.getRGB and the raster's per-call bounds checks
    // — measured ~4× the whole-kernel cost on the fixture thumbnails.
    // The bulk overload converts the full plane in one raster pass with
    // identical values (same ColorModel conversion), so the box-filter
    // output is bit-identical to the per-pixel spelling.
    val rgbs = img.getRGB(0, 0, w, h, null, 0, w)
    val out = new Array[Double](tw * th)
    var ty = 0
    while (ty < th) {
      val y0 = (ty.toLong * h / th).toInt
      val y1 = math.max((((ty + 1).toLong * h) / th).toInt, y0 + 1)
      var tx = 0
      while (tx < tw) {
        val x0 = (tx.toLong * w / tw).toInt
        val x1 = math.max((((tx + 1).toLong * w) / tw).toInt, x0 + 1)
        var s = 0.0
        var y = y0
        while (y < y1) {
          val rowOff = y * w
          var x = x0
          while (x < x1) {
            val rgb = rgbs(rowOff + x)
            s += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
              0.114 * (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
        out(ty * tw + tx) = s / ((y1 - y0).toDouble * (x1 - x0))
        tx += 1
      }
      ty += 1
    }
    out
  }

  /** Deterministic stand-in grid for payloads the resize kernel cannot
    * decode (same role as [[stubDecode]], sized to the target grid). */
  def stubGrid(bytes: Array[Byte], tw: Int, th: Int): Array[Double] = {
    val out = new Array[Double](tw * th)
    var i = 0
    while (i < bytes.length) { out(i % out.length) += (bytes(i) & 0xFF).toDouble; i += 1 }
    out
  }

  /** Batched image RESIZE over the packed binary column — the
    * thumbnail / fixed-shape-tensor prep step of a multimodal training
    * pipeline (every image normalized to one `gridW`×`gridH` luma grid
    * before feature hashing or model ingest). Same `mapPartitions`
    * batch shape as [[extractFeatures]]; decode routing and the
    * `decode = "stub"` fence follow the same contract (non-image
    * modalities and unparseable payloads get a deterministic
    * byte-derived grid, marked so curation filters them out).
    * Output: (media_id, width, height, grid: gridH·gridW row-major
    * luma, decode) — width/height are the SOURCE dimensions, the grid
    * is the fixed target shape. */
  def resizeImages(packed: DataFrame, gridW: Int = 8, gridH: Int = 8,
                   batchSize: Int = 64): DataFrame = {
    require(gridW > 0 && gridH > 0, s"grid must be positive, got ${gridW}x$gridH")
    val outSchema = StructType(Seq(
      StructField("media_id", packed.schema("media_id").dataType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("grid", ArrayType(DoubleType)),
      StructField("decode", StringType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    packed.select(col("media_id"), col("content"), col("meta.modality"))
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val bytes = r.getAs[Array[Byte]](1)
            val decoded =
              if (r.getString(2) == "image") readImage(bytes) else None
            decoded match {
              case Some(img) =>
                Row(r.get(0), img.getWidth, img.getHeight,
                  resizeLuma(img, gridW, gridH).toSeq, "image")
              case None =>
                Row(r.get(0), 0, 0, stubGrid(bytes, gridW, gridH).toSeq, "stub")
            }
          }
        }
      }(enc)
  }

  /** Difference-hash (dHash) over a row-major luma grid: bit
    * `y·(gridW−1)+x` is set when cell (y, x+1) is brighter than cell
    * (y, x) — the classic perceptual fingerprint (gradient SIGNS survive
    * resize/re-encode/brightness shifts; absolute values don't). On the
    * default 8×8 grid that's 56 bits, deliberately ≤ 63 so the hash
    * stays a non-negative long on every engine (a 64th bit would flip
    * the sign and make cross-engine integer replay fragile). Pure
    * codegen'd column arithmetic — 56 `when` terms OR-folded, no UDF. */
  def dHash(grid: Column, gridW: Int = 8, gridH: Int = 8): Column = {
    require(gridW >= 2 && gridH >= 1 && gridH * (gridW - 1) <= 63,
      s"dHash needs 2 <= gridW and gridH*(gridW-1) <= 63 bits, got ${gridW}x$gridH")
    val bits = for (y <- 0 until gridH; x <- 0 until gridW - 1) yield {
      val k = y * (gridW - 1) + x
      when(element_at(grid, y * gridW + x + 2) >
             element_at(grid, y * gridW + x + 1),
        lit(1L << k)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Perceptual image fingerprints: decode + box-filter resize
    * ([[resizeImages]]) then [[dHash]] the luma grid. Output
    * `(media_id, simhash, decode)` — `simhash` named for direct feed
    * into [[graft.ext.Dedup.simhashPairsFromSigs]], which bands 64-bit
    * signatures by hamming distance; BYTE-level near-duplicate image
    * detection (re-encodes, brightness shifts, small crops) without any
    * embedding model. The `decode = "stub"` fence carries through —
    * filter it before trusting hashes as perceptual. */
  def imageHash(packed: DataFrame, gridW: Int = 8, gridH: Int = 8): DataFrame =
    resizeImages(packed, gridW, gridH)
      .select(col("media_id"),
        dHash(col("grid"), gridW, gridH).alias("simhash"), col("decode"))

  /** Deterministic grayscale 24-bit BMP fixture: pixel (x, y) (top-left
    * origin) holds gray `g = (id + y·w + x) mod 256` in all three
    * channels. Uncompressed BMP is the one container whose decode is
    * pure arithmetic — no entropy coding, no color management — so an
    * external oracle can replay the decoded pixels (and anything
    * computed from them, e.g. [[resizeLuma]]'s box averages) from the
    * formula alone, without parsing bytes. Rows are stored bottom-up
    * and 4-byte padded per the BMP spec; `javax.imageio`'s BMP reader
    * returns the planted values exactly. */
  def syntheticBmp(id: Long, w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"BMP dims must be positive, got ${w}x$h")
    val rowSize = ((w * 3 + 3) / 4) * 4
    val imageSize = rowSize * h
    val fileSize = 54 + imageSize
    val b = java.nio.ByteBuffer.allocate(fileSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(fileSize).putInt(0).putInt(54)
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24).putInt(0)
      .putInt(imageSize).putInt(0).putInt(0).putInt(0).putInt(0)
    var y = h - 1 // bottom-up row order
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val g = (((id + y.toLong * w + x) % 256 + 256) % 256).toByte
        b.put(g).put(g).put(g)
        x += 1
      }
      var pad = rowSize - w * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** [[syntheticBmp]]'s near-duplicate sibling: a `cells·block`-square
    * grayscale BMP whose (cy, cx) cell is a constant `block`×`block`
    * square of gray `md5_15("seed:cell") mod 256` (the suite's md5
    * hash-draw convention — first 15 hex digits as a long, exactly
    * DuckDB's `CAST(('0x' || substr(md5(...), 1, 15)) AS BIGINT)`).
    * Constant cells make the box-average replay EXACT: [[resizeLuma]]
    * to a `cells`×`cells` grid averages identical pixels, so the oracle
    * re-derives every grid value (and every [[dHash]] bit) from the
    * formula without decoding bytes. `perturbCell >= 0` brightens that
    * one cell by 128 (mod 256) — a planted near-duplicate whose dHash
    * differs in at most 2 bits (the flipped cell's two horizontal
    * comparisons). */
  def syntheticCellBmp(seed: Long, cells: Int = 8, block: Int = 2,
                       perturbCell: Int = -1): Array[Byte] = {
    require(cells > 0 && block > 0, s"bad cell geometry: ${cells}x$block")
    val side = cells * block
    val rowSize = ((side * 3 + 3) / 4) * 4
    val b = java.nio.ByteBuffer.allocate(54 + rowSize * side)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(54 + rowSize * side)
      .putInt(0).putInt(54)
    b.putInt(40).putInt(side).putInt(side).putShort(1).putShort(24).putInt(0)
      .putInt(rowSize * side).putInt(0).putInt(0).putInt(0).putInt(0)
    val md = java.security.MessageDigest.getInstance("MD5")
    val gray = Array.tabulate(cells * cells) { cell =>
      // first 15 hex digits of the md5 as a long == the big-endian
      // first 8 bytes >>> 4 — computed arithmetically: the hex-string
      // spelling (format every byte, parseLong a substring) cost 56M
      // String.format calls per sf1 corpus (measured 30 s of the
      // dedup_images fixture generation). Identical draw values.
      val d = md.digest(s"$seed:$cell".getBytes("UTF-8"))
      val be = java.nio.ByteBuffer.wrap(d).getLong
      val g = ((be >>> 4) % 256).toInt
      if (cell == perturbCell) (g + 128) % 256 else g
    }
    var y = side - 1 // bottom-up row order
    while (y >= 0) {
      var x = 0
      while (x < side) {
        val g = gray((y / block) * cells + (x / block)).toByte
        b.put(g).put(g).put(g)
        x += 1
      }
      var pad = rowSize - side * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      y -= 1
    }
    b.array()
  }

  /** 1→N frame sampling: every `strideBytes` of payload is one "frame";
    * emits (media_id, frame_idx, frame_md5). Generator-based fan-out —
    * `posexplode` over a computed index sequence, no driver loop. */
  def sampleFrames(packed: DataFrame, strideBytes: Int = 32): DataFrame = {
    val nFrames = greatest(ceil(col("meta.byte_len") / lit(strideBytes.toDouble)), lit(1L))
    packed
      .select(col("media_id"), col("content"),
        // posexplode_outer: an inner posexplode makes Catalyst infer a
        // size>0 filter that re-materializes the sequence() array twice
        // per row just to check non-emptiness (see Dedup.hashedShingles)
        posexplode_outer(sequence(lit(0L), nFrames.cast("long") - 1)))
      .filter(col("col").isNotNull)
      .withColumnRenamed("col", "frame_idx")
      .select(col("media_id"), col("frame_idx"),
        md5(col("content").substr((col("frame_idx") * strideBytes + 1).cast("int"),
          lit(strideBytes))).alias("frame_md5"))
  }
}
