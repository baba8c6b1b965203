package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline plumbing (SURVEY §2.D): image/audio/
  * video payloads travel as opaque `binary` columns with typed
  * metadata structs; decode / feature-extract / frame-sample run as
  * partition-batched functions over `Dataset[(id, bytes)]` — the
  * Scala analogue of an Arrow-batched UDF: one JVM call per
  * partition, columnar parquet scan feeding it, no per-row overhead.
  *
  * ALL THREE MODALITIES now carry a REAL format parse: audio =
  * [[wavify]]/[[decodeWav]] (RIFF/PCM, r13), image =
  * [[bmpify]]/[[decodeBmp]] (BITMAPFILEHEADER/-INFOHEADER, r14),
  * video = [[avify]]/[[decodeAvi]] (RIFF/AVI container with '00db'
  * frame chunks, r14) — each a canonical encoder + spec-driven
  * decoder with malformed-header rejection. What stays honestly out
  * of scope is COMPRESSED-codec decode (no codec libs in the
  * container); the legacy pseudo-metadata path (`decodeMeta`, marked
  * below) remains only as the documented stub slot a production
  * JPEG/H.264 call would fill. Everything AROUND
  * the stubs —
  * binary column schema, metadata struct, partition-batched map,
  * array-of-binary frame output, explode back to rows — is the real
  * Spark plumbing a production decoder would drop into: replace the
  * arithmetic inside [[decodeMeta]]/[[sampleFrames]] with a codec
  * call and nothing else changes.
  *
  * Scale: payload bytes stay columnar end-to-end (parquet binary →
  * Tungsten rows → per-partition iterator); metadata-only queries
  * prune the payload column entirely at the scan.
  */
object Multimodal {

  final case class Media(doc_id: Long, media_type: String, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, media_type: String, byte_len: Long,
      width: Long, height: Long, channels: Long)
  final case class Frame(doc_id: Long, frame_idx: Long, frame_md5: String)

  /** Attach a synthetic binary payload + media-type column to the
    * documents table (the harness ships no real media; payload =
    * UTF-8 bytes of the text, media type assigned round-robin).
    */
  def withBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      to_binary(col("text"), lit("utf-8")).as("payload"))

  /** Partition-batched "decode": bytes → typed metadata.
    * STUB decode arithmetic (deterministic pseudo-dimensions from the
    * byte length and id); a real implementation calls the codec here.
    */
  def decodeMeta(media: Dataset[Media]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val n = m.payload.length.toLong
        MediaMeta(m.doc_id, m.media_type, n,
          width = 64 + (n * 7 + m.doc_id) % 1217,
          height = 64 + (n * 13) % 689,
          channels = 1 + m.doc_id % 3)
      }
    }
  }

  /** Resize planning: target box → output dims preserving aspect
    * ratio (pure metadata math — the real pixel work happens in the
    * decoder slot).
    */
  def resizePlan(meta: Dataset[MediaMeta], maxDim: Long): DataFrame = {
    val m = meta.toDF()
    val scale = least(lit(maxDim) / col("width"), lit(maxDim) / col("height"), lit(1.0))
    m.select(col("doc_id"),
      floor(col("width") * scale).cast("long").as("out_width"),
      floor(col("height") * scale).cast("long").as("out_height"))
  }

  /** ViT-style patch-grid plan: ceil-division tiling of the frame
    * into `patch`×`patch` squares plus the padding needed to fill the
    * last row/column, and the resulting transformer token count
    * (+1 CLS). Pure integer metadata math (the real pixel unfold
    * happens in the decoder slot); map-only, payload column pruned.
    */
  def patchGrid(meta: Dataset[MediaMeta], patch: Long = 16): DataFrame = {
    val m = meta.toDF()
    val gx = ((col("width") + (patch - 1)) / patch).cast("long")
    val gy = ((col("height") + (patch - 1)) / patch).cast("long")
    m.select(col("doc_id"), col("width"), col("height"),
      gx.as("grid_x"), gy.as("grid_y"),
      (gx * gy).as("n_patches"),
      (gx * patch - col("width")).as("pad_x"),
      (gy * patch - col("height")).as("pad_y"),
      (gx * gy + 1).as("n_tokens"))
  }

  /** Audio segmentation plan (Whisper-style 30 s windows with 5 s
    * overlap): pseudo-duration derived from the byte length at the
    * 16 kHz/16-bit-mono stub rate (a real decoder reads the header in
    * this slot), then ceil-division window starts — the same
    * integer-exact schedule as [[graft.ext.TextAnalysis.chunkWindows]]
    * applied to time. Map-only explode; only the payload's byte
    * LENGTH is consumed (the header-read of a real decoder) — no
    * shuffle touches the bytes themselves.
    */
  def audioSegments(media: Dataset[Media], segMs: Long = 30000,
      strideMs: Long = 25000): DataFrame = {
    val m = media.toDF()
    m.filter(col("media_type") === "audio")
      .select(col("doc_id"),
        (length(col("payload")).cast("long") * 1000L / 32000L)
          .cast("long").as("dur_ms"))
      .withColumn("k", greatest(lit(0L),
        ((col("dur_ms") - segMs + strideMs - 1) / strideMs).cast("long")))
      .select(col("doc_id"), col("dur_ms"),
        posexplode(sequence(lit(0L), col("k") * strideMs, lit(strideMs))))
      .select(col("doc_id"), col("pos").cast("long").as("seg_idx"),
        col("col").as("start_ms"),
        least(lit(segMs), col("dur_ms") - col("col")).as("seg_ms"))
  }

  final case class WavMeta(doc_id: Long, fmt: Long, channels: Long,
      sample_rate: Long, bits: Long, n_samples: Long, dur_ms: Long,
      peak: Long, sum_abs: Long, valid: Boolean)

  /** REAL encoder half of the promoted codec slot: wrap the payload
    * bytes as a canonical 44-byte RIFF/PCM WAV — 16-bit mono
    * little-endian samples `(byte − 128) << 8` at an 8/12/16 kHz rate
    * chosen per doc. Every field sits at its format-spec offset
    * (chunk size 36+data, fmt chunk length 16, audio format 1, block
    * align 2), so [[decodeWav]] — or any standard WAV reader — parses
    * it. Map-only; the payload grows 2×+44 bytes and never shuffles.
    */
  def wavify(media: Dataset[Media]): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val n = m.payload.length
      val dataLen = 2 * n
      val sr = 8000 + (m.doc_id % 3).toInt * 4000
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII"))
      bb.putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII"))
      bb.putInt(16)                 // PCM fmt chunk length
      bb.putShort(1)                // audio format 1 = PCM
      bb.putShort(1)                // channels
      bb.putInt(sr)
      bb.putInt(sr * 2)             // byte rate = sr * channels * 2
      bb.putShort(2)                // block align
      bb.putShort(16)               // bits per sample
      bb.put("data".getBytes("US-ASCII"))
      bb.putInt(dataLen)
      m.payload.foreach { b =>
        bb.putShort((((b & 0xff) - 128) << 8).toShort)
      }
      Media(m.doc_id, "audio", bb.array())
    }
  }

  /** REAL decoder half: parse the WAV byte stream BY THE FORMAT SPEC —
    * validate the four magics ('RIFF' @0, 'WAVE' @8, 'fmt ' @12,
    * 'data' @36), read the little-endian header fields at their
    * offsets, then fold the 16-bit PCM data section in one pass
    * (peak = max |sample|, sum_abs — the integer loudness stats a
    * real audio-quality filter starts from). A malformed header
    * yields `valid = false` with zeroed stats rather than garbage.
    * Map-only; this is the codec-call slot [[decodeMeta]] documents,
    * filled with a real parser.
    */
  def decodeWav(media: Dataset[Media]): Dataset[WavMeta] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val p = m.payload
      def magic(off: Int, s: String): Boolean =
        p.length >= off + 4 && s.getBytes("US-ASCII").zipWithIndex
          .forall { case (b, i) => p(off + i) == b }
      def le16(off: Int): Long =
        (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8)
      def le32(off: Int): Long =
        le16(off) | (le16(off + 2) << 16)
      val valid = p.length >= 44 &&
        magic(0, "RIFF") && magic(8, "WAVE") &&
        magic(12, "fmt ") && magic(36, "data") &&
        le32(16) == 16L && le16(32) > 0 &&
        // zero sample-rate would divide-by-zero in dur_ms below; the
        // malformed-header contract is valid=false, never a throw
        le32(24) > 0
      if (!valid) WavMeta(m.doc_id, 0, 0, 0, 0, 0, 0, 0, 0, valid = false)
      else {
        val sr = le32(24)
        val blockAlign = le16(32)
        val dataLen = math.min(le32(40), (p.length - 44).toLong)
        val nSamples = dataLen / blockAlign
        var peak = 0L; var sumAbs = 0L
        var off = 44
        val end = 44 + dataLen.toInt
        while (off + 1 < end) {
          val u = le16(off)
          val s = if (u >= 32768L) u - 65536L else u
          val a = math.abs(s)
          if (a > peak) peak = a
          sumAbs += a
          off += 2
        }
        WavMeta(m.doc_id, le16(20), le16(22), sr, le16(34), nSamples,
          nSamples * 1000L / sr, peak, sumAbs, valid = true)
      }
    }
  }

  /** Segment schedule over the PARSED duration: [[audioSegments]]'s
    * ceil-division windows, but the duration comes from a REAL
    * [[decodeWav]] header parse (n_samples / sample_rate) instead of
    * the stub byte-length rate — the honest end of the decode →
    * schedule pipeline. Invalid payloads drop (a production pipeline
    * routes them to quarantine, not into the schedule). Map-only
    * explode; the payload column prunes after the header fold.
    */
  def wavSegments(media: Dataset[Media], segMs: Long = 30000,
      strideMs: Long = 25000): DataFrame = {
    decodeWav(media).toDF()
      .filter(col("valid"))
      .withColumn("k", greatest(lit(0L),
        ((col("dur_ms") - segMs + strideMs - 1) / strideMs).cast("long")))
      .select(col("doc_id"), col("dur_ms"),
        posexplode(sequence(lit(0L), col("k") * strideMs, lit(strideMs))))
      .select(col("doc_id"), col("pos").cast("long").as("seg_idx"),
        col("col").as("start_ms"),
        least(lit(segMs), col("dur_ms") - col("col")).as("seg_ms"))
  }

  final case class BmpMeta(doc_id: Long, width: Long, height: Long,
      bpp: Long, stride: Long, img_size: Long, n_px: Long,
      lum3_sum: Long, peak3: Long, valid: Boolean)

  /** REAL image-codec encoder half (r14 — the BMP sibling of
    * [[wavify]], closing the image side of the stub slot): wrap the
    * payload bytes as a canonical 24-bit BMP — each byte becomes one
    * GRAY pixel (r=g=b), rows of width `8 + doc_id % 25` stored
    * BOTTOM-UP with the spec's 4-byte stride padding, every header
    * field at its BITMAPFILEHEADER/BITMAPINFOHEADER offset ('BM' @0,
    * file size @2, pixel offset 54 @10, header size 40 @14, planes 1,
    * 24 bpp, BI_RGB, 72 DPI). Docs with `doc_id % 97 == 0` get their
    * first magic byte corrupted — the deterministic rejection rows
    * the decode gate checks. Map-only.
    */
  def bmpify(media: Dataset[Media]): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val n = m.payload.length
      val w = 8 + (m.doc_id % 25).toInt
      val h = math.max(1, (n + w - 1) / w)
      val stride = ((3 * w + 3) / 4) * 4
      val imgSize = stride * h
      val bb = java.nio.ByteBuffer.allocate(54 + imgSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte)
      bb.putInt(54 + imgSize)
      bb.putInt(0) // reserved
      bb.putInt(54) // pixel-data offset
      bb.putInt(40) // BITMAPINFOHEADER size
      bb.putInt(w)
      bb.putInt(h)
      bb.putShort(1) // planes
      bb.putShort(24) // bits per pixel
      bb.putInt(0) // compression = BI_RGB
      bb.putInt(imgSize)
      bb.putInt(2835) // 72 DPI in px/m
      bb.putInt(2835)
      bb.putInt(0) // colors used
      bb.putInt(0) // colors important
      var y = h - 1
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val i = y * w + x
          val b: Byte = if (i < n) m.payload(i) else 0
          bb.put(b).put(b).put(b)
          x += 1
        }
        var pad = stride - 3 * w
        while (pad > 0) { bb.put(0.toByte); pad -= 1 }
        y -= 1
      }
      val out = bb.array()
      if (m.doc_id % 97 == 0) out(0) = 'X'.toByte
      Media(m.doc_id, "image", out)
    }
  }

  /** Spec-driven BMP header validation shared by the decode family:
    * Some((w, h, stride)) when every BITMAPFILEHEADER /
    * BITMAPINFOHEADER field checks out — 'BM' magic, exact file
    * size, pixel offset 54, header size 40, planes 1, 24 bpp,
    * BI_RGB, positive bounded dimensions, enough bytes for
    * stride × height — None otherwise.
    */
  private def parseBmpDims(p: Array[Byte]): Option[(Long, Long, Long)] = {
    def u8(off: Int): Long = p(off) & 0xffL
    def le16(off: Int): Long = u8(off) | (u8(off + 1) << 8)
    def le32(off: Int): Long = le16(off) | (le16(off + 2) << 16)
    if (p.length < 54 || p(0) != 'B'.toByte || p(1) != 'M'.toByte) None
    else {
      val w = le32(18)
      val h = le32(22)
      val stride = ((3 * w + 3) / 4) * 4
      val ok = le32(2) == p.length && le32(10) == 54 &&
        le32(14) == 40 && le16(26) == 1 && le16(28) == 24 &&
        le32(30) == 0 && w > 0 && h > 0 &&
        w <= 1000000 && h <= 1000000 &&
        p.length >= 54 + stride * h
      if (ok) Some((w, h, stride)) else None
    }
  }

  /** REAL image-codec decoder half: validate the BMP header BY THE
    * FORMAT SPEC ([[parseBmpDims]]) and fold the pixel rows (at the
    * spec's padded stride, whatever order they were stored in) into
    * integer luminance stats: `lum3_sum` = Σ(r+g+b), `peak3` =
    * max(r+g+b) — the brightness/contrast prefilter a real
    * image-quality gate starts from. A malformed header (including
    * the planted corrupt-magic rows) yields `valid = false` with
    * zeroed stats, never garbage and never a throw. Map-only; this
    * is the codec-call slot [[decodeMeta]] documents, filled with a
    * real parser.
    */
  def decodeBmp(media: Dataset[Media]): Dataset[BmpMeta] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val p = m.payload
      def u8(off: Int): Long = p(off) & 0xffL
      parseBmpDims(p) match {
        case None =>
          BmpMeta(m.doc_id, 0, 0, 0, 0, 0, 0, 0, 0, valid = false)
        case Some((w, h, stride)) =>
          var lum = 0L; var peak = 0L
          var y = 0L
          while (y < h) {
            var x = 0L
            while (x < w) {
              val base = (54 + y * stride + 3 * x).toInt
              val s = u8(base) + u8(base + 1) + u8(base + 2)
              lum += s
              if (s > peak) peak = s
              x += 1
            }
            y += 1
          }
          // bpp is pinned to 24 by the header validation
          BmpMeta(m.doc_id, w, h, 24L, stride, stride * h, w * h,
            lum, peak, valid = true)
      }
    }
  }

  final case class BmpHist(doc_id: Long, b0: Long, b1: Long, b2: Long, b3: Long)

  /** Luminance histogram over DECODED pixels (r14): the
    * exposure/contrast prefilter of an image-quality gate — 4 equal
    * bins over s = r+g+b ∈ [0, 765], bin = min(3, s div 192). Parses
    * by the spec exactly like [[decodeBmp]] (shared
    * [[parseBmpDims]]); malformed streams are DROPPED (flatMap) so
    * the output is the valid-image histogram table. Map-only; 4
    * longs per image shuffle onward, never pixels — the shape that
    * lets a 100 TB media corpus be exposure-profiled with a scan.
    */
  def bmpLumHistogram(media: Dataset[Media]): Dataset[BmpHist] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val p = m.payload
      def u8(off: Int): Long = p(off) & 0xffL
      parseBmpDims(p).map { case (w, h, stride) =>
        val bins = new Array[Long](4)
        var y = 0L
        while (y < h) {
          var x = 0L
          while (x < w) {
            val base = (54 + y * stride + 3 * x).toInt
            val s = u8(base) + u8(base + 1) + u8(base + 2)
            bins(math.min(3L, s / 192).toInt) += 1
            x += 1
          }
          y += 1
        }
        BmpHist(m.doc_id, bins(0), bins(1), bins(2), bins(3))
      }
    }
  }

  final case class BmpDs(doc_id: Long, w: Long, h: Long, wo: Long,
      ho: Long, lum_ds: Long, peak_ds: Long)

  /** NEAREST-NEIGHBOR downsample over the PARSED pixel grid (r16, the
    * r15 candidate list's image item): out(x,y) = in(x·k, y·k) with
    * output dims ⌈w/k⌉ × ⌈h/k⌉ — the thumbnail/pyramid prep pass of an
    * image pipeline, reading the file BY THE SPEC (bottom-up rows at
    * the padded stride, logical row y = file row h−1−y; the gray
    * channels are equal so one byte is the pixel). Emits per-image
    * integer summaries of the downsampled plane (sum + peak), never
    * pixels — the decode is map-only and the shuffle carries 7 longs
    * per image. Malformed streams drop (shared [[parseBmpDims]]).
    */
  def bmpDownsample(media: Dataset[Media], k: Int = 2): Dataset[BmpDs] = {
    require(k >= 1, s"bmpDownsample: factor must be >= 1 (got $k)")
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val p = m.payload
      def u8(off: Long): Long = p(off.toInt) & 0xffL
      parseBmpDims(p).map { case (w, h, stride) =>
        val wo = (w + k - 1) / k
        val ho = (h + k - 1) / k
        var lum = 0L; var peak = 0L
        var yo = 0L
        while (yo < ho) {
          val y = yo * k
          var xo = 0L
          while (xo < wo) {
            val x = xo * k
            val v = u8(54 + (h - 1 - y) * stride + 3 * x)
            lum += v
            if (v > peak) peak = v
            xo += 1
          }
          yo += 1
        }
        BmpDs(m.doc_id, w, h, wo, ho, lum, peak)
      }
    }
  }

  final case class AviMeta(doc_id: Long, width: Long, height: Long,
      n_frames: Long, us_per_frame: Long, dur_ms: Long,
      lum_sum: Long, frame_peak_sum: Long, valid: Boolean)

  /** REAL video-container encoder half (r14 — the AVI sibling of
    * [[wavify]]/[[bmpify]], closing the VIDEO side of the stub slot):
    * wrap the payload as a canonical RIFF/AVI — 'RIFF' size 'AVI ',
    * a 'hdrl' LIST holding the 56-byte 'avih' MainAVIHeader with
    * every field at its spec offset (µs/frame, total frames, streams
    * = 1, width, height), then a 'movi' LIST of '00db' chunks — one
    * uncompressed 8×8 gray frame per 64 payload bytes (the
    * compressed-codec slot stays honestly out of scope: no codec
    * libs in the container — container parse and frame plumbing are
    * the real part). Frame rate varies by doc (µs/frame = 33333 +
    * 8334·(doc_id mod 3)). Docs with `doc_id % 89 == 0` get their
    * first magic byte corrupted — the deterministic rejection rows.
    * Map-only.
    */
  def avify(media: Dataset[Media]): Dataset[Media] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val n = m.payload.length
      val w = 8; val h = 8
      val fsz = w * h
      val frames = math.max(1, (n + fsz - 1) / fsz)
      val upf = 33333 + (m.doc_id % 3).toInt * 8334
      val moviSize = 4 + frames * (8 + fsz)
      val total = 100 + frames * (8 + fsz)
      val bb = java.nio.ByteBuffer.allocate(total)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII"))
      bb.putInt(total - 8)
      bb.put("AVI ".getBytes("US-ASCII"))
      bb.put("LIST".getBytes("US-ASCII"))
      bb.putInt(68)                  // hdrl list: 'hdrl' + avih chunk
      bb.put("hdrl".getBytes("US-ASCII"))
      bb.put("avih".getBytes("US-ASCII"))
      bb.putInt(56)                  // MainAVIHeader cb
      bb.putInt(upf)                 // dwMicroSecPerFrame
      bb.putInt(0)                   // dwMaxBytesPerSec
      bb.putInt(0)                   // dwPaddingGranularity
      bb.putInt(0)                   // dwFlags
      bb.putInt(frames)              // dwTotalFrames
      bb.putInt(0)                   // dwInitialFrames
      bb.putInt(1)                   // dwStreams
      bb.putInt(8 + fsz)             // dwSuggestedBufferSize
      bb.putInt(w)
      bb.putInt(h)
      bb.putInt(0); bb.putInt(0); bb.putInt(0); bb.putInt(0) // dwReserved
      bb.put("LIST".getBytes("US-ASCII"))
      bb.putInt(moviSize)
      bb.put("movi".getBytes("US-ASCII"))
      var f = 0
      while (f < frames) {
        bb.put("00db".getBytes("US-ASCII"))
        bb.putInt(fsz)
        var i = 0
        while (i < fsz) {
          val k = f * fsz + i
          bb.put(if (k < n) m.payload(k) else 0.toByte)
          i += 1
        }
        f += 1
      }
      val out = bb.array()
      if (m.doc_id % 89 == 0) out(0) = 'X'.toByte
      Media(m.doc_id, "video", out)
    }
  }

  /** REAL video-container decoder half: parse the AVI stream BY THE
    * SPEC — RIFF/'AVI '/LIST/'hdrl'/'avih'/'movi' magics at their
    * offsets, exact file-size and list-size fields, cb = 56, one
    * stream, bounded positive dimensions, per-frame '00db' chunk
    * magics and sizes, total length = header + frames·chunk — then
    * fold the frame bytes into integer stats: `lum_sum` = Σ bytes,
    * `frame_peak_sum` = max per-frame byte sum (the scene-activity
    * prefilter a sampling scheduler starts from), `dur_ms` =
    * frames·µsPerFrame div 1000. A malformed stream (including the
    * planted corrupt-magic rows) yields `valid = false` with zeroed
    * stats, never garbage and never a throw. Map-only.
    */
  /** Spec-driven AVI parse shared by [[decodeAvi]] and
    * [[aviSceneCuts]]: full RIFF/'AVI '/hdrl/avih/movi/'00db'
    * validation, returning (w, h, µs-per-frame, per-frame luminance
    * sums) — None on any violated invariant (the decode gate's
    * corrupt-magic rejection class).
    */
  private def parseAviFrames(m: Media): Option[(Long, Long, Long, Array[Long])] = {
    val p = m.payload
    def u8(off: Int): Long = p(off) & 0xffL
    def le32(off: Int): Long =
      u8(off) | (u8(off + 1) << 8) | (u8(off + 2) << 16) | (u8(off + 3) << 24)
    def magic(off: Int, s: String): Boolean =
      p.length >= off + 4 && s.getBytes("US-ASCII").zipWithIndex
        .forall { case (b, i) => p(off + i) == b }
    if (p.length < 100 || !magic(0, "RIFF") || !magic(8, "AVI ") ||
      !magic(12, "LIST") || !magic(20, "hdrl") || !magic(24, "avih") ||
      !magic(88, "LIST") || !magic(96, "movi")) None
    else {
      val w = le32(64); val h = le32(68)
      val frames = le32(48)
      val upf = le32(32)
      val fsz = w * h
      val headerOk = le32(4) == p.length - 8 && le32(16) == 68 &&
        le32(28) == 56 && le32(56) == 1 &&
        w > 0 && h > 0 && w <= 4096 && h <= 4096 &&
        upf > 0 && frames > 0 && frames <= 1000000 &&
        le32(92) == 4 + frames * (8 + fsz) &&
        p.length == 100 + frames * (8 + fsz)
      if (!headerOk) None
      else {
        val sums = new Array[Long](frames.toInt)
        var framesOk = true
        var f = 0L
        while (f < frames && framesOk) {
          val base = (100 + f * (8 + fsz)).toInt
          if (!magic(base, "00db") || le32(base + 4) != fsz) framesOk = false
          else {
            var s = 0L
            var i = 0
            while (i < fsz) { s += u8(base + 8 + i); i += 1 }
            sums(f.toInt) = s
          }
          f += 1
        }
        if (!framesOk) None else Some((w, h, upf, sums))
      }
    }
  }

  def decodeAvi(media: Dataset[Media]): Dataset[AviMeta] = {
    import media.sparkSession.implicits._
    media.map { m =>
      parseAviFrames(m) match {
        case None => AviMeta(m.doc_id, 0, 0, 0, 0, 0, 0, 0, valid = false)
        case Some((w, h, upf, sums)) =>
          AviMeta(m.doc_id, w, h, sums.length.toLong, upf,
            sums.length.toLong * upf / 1000, sums.sum, sums.max,
            valid = true)
      }
    }
  }

  final case class AviCut(doc_id: Long, frame_idx: Long, lum: Long,
      prev_lum: Long, is_cut: Boolean)

  /** SCENE-CUT detection over the PARSED frames (r15): per frame
    * k ≥ 1, emit its luminance sum, the previous frame's, and the
    * cut verdict `|lum_k − lum_{k−1}| > threshold` — the shot-
    * boundary prefilter every video curation pipeline runs before
    * sampling keyframes. All-integer; map-only (each video's frame
    * walk happens inside one task, frames bounded by payload/fsz);
    * invalid containers drop, as in the decode gate.
    */
  def aviSceneCuts(media: Dataset[Media],
      threshold: Long = 1024L): Dataset[AviCut] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      parseAviFrames(m) match {
        case None => Iterator.empty
        case Some((_, _, _, sums)) =>
          (1 until sums.length).iterator.map { k =>
            AviCut(m.doc_id, k.toLong, sums(k), sums(k - 1),
              math.abs(sums(k) - sums(k - 1)) > threshold)
          }
      }
    }
  }

  final case class PHash(doc_id: Long, phash: Long)

  /** Full 64-bit perceptual fingerprint: resample the payload to 64
    * equal byte windows (the fixed-grid resize step of a real pHash),
    * then take the SIGN BITS of the 64-point Walsh–Hadamard transform
    * of the window sums — the integer-exact decorrelating transform
    * standing in for the DCT (coefficient i = Σⱼ (−1)^popcount(i∧j)
    * ·wⱼ, pure ±1 weights, so the hash is bit-identical across
    * engines with no float math; bit 0 takes the window-0-vs-mean
    * rule since the DC coefficient has a constant sign). Map-only;
    * the 8-byte hash is what shuffles in a media dedup, never the
    * payload.
    *
    * Robustness envelope (honest, since the payload is the ENCODED
    * byte stream — the decode step is the stubbed part): exact
    * payload duplicates hash identically; substitution-class edits
    * (same length — the re-encode/noise analogue) flip only
    * coefficients near zero, landing within a few Hamming bits;
    * insertions shift the positional grid like any resample of an
    * undecoded stream. A production pipeline decodes to pixels first
    * and feeds THIS same plumbing.
    */
  def pHash(media: Dataset[Media]): Dataset[PHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      batch.map { m =>
        val bs = m.payload.map(b => (b & 0xff).toLong)
        val n = bs.length
        val total = bs.sum
        val w = new Array[Long](64)
        var i = 0
        while (i < 64) {
          val start = i * n / 64
          val end = (i + 1) * n / 64
          var si = 0L
          var j = start
          while (j < end) { si += bs(j); j += 1 }
          w(i) = si
          i += 1
        }
        var hash = 0L
        if (w(0) * n > total * (n / 64)) hash |= 1L
        i = 1
        while (i < 64) {
          var c = 0L
          var j = 0
          while (j < 64) {
            if (java.lang.Integer.bitCount(i & j) % 2 == 0) c += w(j)
            else c -= w(j)
            j += 1
          }
          if (c > 0) hash |= 1L << i
          i += 1
        }
        PHash(m.doc_id, hash)
      }
    }
  }

  /** Deterministic substitution-class near-duplicate variants: for
    * every tenth doc, add a copy (doc_id + 1,000,000) whose payload
    * XORs the low three bits of every 4th byte — a SAME-LENGTH edit,
    * the re-encode/noise analogue in [[pHash]]'s documented
    * robustness envelope. Measured on the test fixtures, the variants
    * land at WHT Hamming 0–8 from their originals (most ≤ 3, some
    * above), so a `maxHamming = 3` near-dup gate over the union
    * exercises BOTH sides of the threshold, while the closest pair of
    * distinct originals sits at Hamming 14 — no spurious crosses.
    * Fixture-plumbing only (gates/specs); map-only, length-preserving.
    */
  def withNearDupVariants(media: Dataset[Media]): Dataset[Media] = {
    import media.sparkSession.implicits._
    val variants = media.filter(_.doc_id % 10 == 0).map { m =>
      val p = m.payload.clone()
      var i = 0
      while (i < p.length) { p(i) = (p(i) ^ 7).toByte; i += 4 }
      Media(m.doc_id + 1000000L, m.media_type, p)
    }
    media.union(variants)
  }

  /** Banded-Hamming near-duplicate pairs over [[pHash]] fingerprints:
    * split the 64-bit hash into 4 SIXTEEN-BIT bands, equi-join per
    * band, verify by popcount of the xor — by pigeonhole every pair
    * within `maxHamming = 3` of each other has at least one of the 4
    * bands intact, so the candidate generator is EXACT while never
    * going all-pairs. The join carries (band, doc_id, hash) — 8-byte
    * rows, never payloads.
    */
  def phashNearDupPairs(hashes: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3,
      "4 sixteen-bit bands guarantee candidates only up to hamming 3")
    val banded0 = hashes.select(col("doc_id"), col("phash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("phash"), 16 * b).bitwiseAND(lit(65535L))): _*)))
      .toDF("doc_id", "phash", "band_id", "band_val")
    // bucket cap (the minHashPairs guard): a hot band value — all-dark
    // thumbnails — would go quadratic in its bucket; over-cap buckets
    // drop BEFORE the self-join (mirrored by the oracle, inactive at
    // gate scale)
    val okBuckets = banded0.groupBy("band_id", "band_val")
      .agg(count(lit(1)).as("__b")).filter(col("__b") <= 10000)
      .select("band_id", "band_val")
    val banded = banded0.join(okBuckets, Seq("band_id", "band_val"),
      "left_semi")
    val l = banded.select(col("band_id"), col("band_val"),
      col("doc_id").as("doc_a"), col("phash").as("ph_a"))
    val r = banded.select(col("band_id"), col("band_val"),
      col("doc_id").as("doc_b"), col("phash").as("ph_b"))
    l.join(r, Seq("band_id", "band_val"))
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "ph_a", "ph_b").distinct()
      .select(col("doc_a"), col("doc_b"),
        expr("bit_count(ph_a ^ ph_b)").cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Frame sampling: slice `nFrames = 1 + len % 7` fixed-stride
    * 32-byte windows from the payload (STUB for keyframe extraction)
    * and fingerprint each — array-of-binary → explode, the shape a
    * video pipeline needs.
    */
  def sampleFrames(media: Dataset[Media]): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val n = m.payload.length
      val nFrames = (1 + n % 7).toInt
      (0 until nFrames).iterator.map { i =>
        val start = (i.toLong * 17 % math.max(n - 32, 1)).toInt
        val slice = m.payload.slice(start, math.min(start + 32, n))
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(slice).map("%02x".format(_)).mkString
        Frame(m.doc_id, i.toLong, hex)
      }
    }
  }
}
