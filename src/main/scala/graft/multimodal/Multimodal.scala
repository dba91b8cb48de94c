package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 L13): image/audio/video
  * treated as opaque `binary` payload columns plus a typed metadata
  * struct, with decode / feature-extraction / resize / frame-sampling as
  * partition-local typed transforms.
  *
  * The IMAGE path is real: `ImageCodec` decodes PNG/JPEG/BMP/GIF/TIFF
  * payloads with the JDK's `javax.imageio.ImageIO` (no extra
  * dependencies), extracts true dimensions + pixel statistics, and
  * resizes via `BufferedImage`/`Graphics2D`. The AUDIO path is real for
  * WAV/AIFF/AU: `AudioCodec` decodes via the JDK's
  * `javax.sound.sampled.AudioSystem` — true sample rate, frame count,
  * duration, amplitude stats. Only VIDEO (and compressed audio —
  * MP3/FLAC) remains a DETERMINISTIC STUB (`FakeCodec`): the JDK ships
  * no codecs for those. Undecodable payloads of any kind fall back to
  * byte statistics, with the `decoded` flag recording which path ran.
  * Swapping `FakeCodec` for a javacv decoder changes no plan shape: the
  * codec seam is the only non-Spark code.
  *
  * Scale notes: payloads never pass through a shuffle — every transform
  * below is scan-local (`mapPartitions`), so 100 TB of media streams
  * through executors at parquet-split granularity; only the small feature
  * rows continue into joins/aggregations. Size
  * `spark.sql.files.maxPartitionBytes` so a task's payload batch fits in
  * memory next to the decoder's working set.
  */
object Multimodal {

  /** One media asset: opaque payload + typed metadata (RAW-style record). */
  case class Asset(asset_id: Long, kind: String, payload: Array[Byte],
                   width: Int, height: Int, sample_rate: Int, duration_ms: Long)

  case class ImageFeatures(asset_id: Long, width: Int, height: Int,
                           n_bytes: Long, mean_byte: Double, checksum: Long,
                           decoded: Boolean)

  case class Frame(asset_id: Long, frame_idx: Int, t_ms: Long, checksum: Long)

  case class AudioFeatures(asset_id: Long, sample_rate: Int, channels: Int,
                           n_frames: Long, duration_ms: Long, rms: Double,
                           peak: Double, n_bytes: Long, decoded: Boolean)

  /** ---- REAL IMAGE CODEC (JDK ImageIO) -------------------------------
    * Decode/stats/resize over PNG/JPEG/BMP/GIF/TIFF using only
    * `javax.imageio` + `java.awt.image` — both ship in the JDK. All
    * methods are static + allocation-local: safe to call from executor
    * task threads (ImageIO's plugin registry is thread-safe for reads;
    * `ImageIO.setUseCache(false)` avoids temp-file spooling per decode).
    */
  object ImageCodec {
    javax.imageio.ImageIO.setUseCache(false)

    /** Decode a payload; None when the bytes are not a readable image
      * (wrong format, truncated, or not an image at all). */
    def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: Exception => None }

    /** Mean channel value (0–255, average of R,G,B over all pixels) —
      * the real-pixel analogue of FakeCodec's mean byte. */
    def meanPixel(img: java.awt.image.BufferedImage): Double = {
      val w = img.getWidth; val h = img.getHeight
      if (w == 0 || h == 0) return 0.0
      var sum = 0L
      var y = 0
      // row-batched getRGB: one int[] per row, not per-pixel calls
      val row = new Array[Int](w)
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          val p = row(x)
          sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          x += 1
        }
        y += 1
      }
      sum.toDouble / (3.0 * w * h)
    }

    /** FNV-1a over the decoded ARGB pixels — identical pixels hash equal
      * regardless of the container format that carried them. */
    def pixelChecksum(img: java.awt.image.BufferedImage): Long = {
      val w = img.getWidth; val h = img.getHeight
      var crc = 1469598103934665603L
      var y = 0
      val row = new Array[Int](w)
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var x = 0
        while (x < w) {
          var p = row(x); var i = 0
          while (i < 4) { crc = (crc ^ (p & 0xff)) * 1099511628211L; p >>>= 8; i += 1 }
          x += 1
        }
        y += 1
      }
      crc
    }

    /** Real resize: bilinear `Graphics2D.drawImage` into a fresh RGB
      * canvas. Deterministic for a given JDK (pure Java2D software path —
      * no GPU/platform rasterizer variance for drawImage scaling). */
    def resize(img: java.awt.image.BufferedImage, w: Int, h: Int): java.awt.image.BufferedImage = {
      val out = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      out
    }

    /** 64-bit average perceptual hash (aHash): bilinear-resize to 8×8,
      * per-pixel gray (R+G+B), bit i set where pixel i ≥ the 64-pixel
      * mean. Near-duplicate images (recompressed, lightly noised,
      * rescaled) differ in a few bits — Hamming distance on the hash is
      * the image analogue of SimHash on text (L3), and the 8-byte hash
      * is what a 100 TB image-dedup pass shuffles instead of pixels. */
    def aHash(img: java.awt.image.BufferedImage): Long = {
      val small = resize(img, 8, 8)
      val gray = new Array[Int](64)
      val row = new Array[Int](8)
      var y = 0; var idx = 0; var sum = 0L
      while (y < 8) {
        small.getRGB(0, y, 8, 1, row, 0, 8)
        var x = 0
        while (x < 8) {
          val p = row(x)
          val g = ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
          gray(idx) = g; sum += g; idx += 1; x += 1
        }
        y += 1
      }
      val mean = sum.toDouble / 64.0
      var h = 0L; var i = 0
      while (i < 64) { if (gray(i) >= mean) h |= (1L << i); i += 1 }
      h
    }

    /** Re-encode as PNG (lossless, always-available writer). */
    def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Deterministic 8×8-cell block pattern for fixtures: each 8 px cell
      * is dark/bright by an LCG bit of `seed`, and the first `flipCells`
      * cells are inverted — a cell-aligned "edit" that moves the aHash
      * by ≤ flipCells bits, while different seeds produce far-apart
      * hashes. Executor-safe (pure allocation-local drawing). */
    def syntheticPattern(seed: Long, flipCells: Int = 0): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var cell = 0
      while (cell < 64) {
        // splitmix64 finalizer: full avalanche, so seeds that differ in
        // ANY bit give uncorrelated cell patterns (a bare LCG bit has
        // visible period structure across nearby seeds)
        var z = seed * 64 + cell + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        val bright0 = (z & 1L) == 1L
        val bright = if (cell < flipCells) !bright0 else bright0
        val rgb = if (bright) 0xe8e8e8 else 0x181818
        val cx = (cell % 8) * 8; val cy = (cell / 8) * 8
        var dy = 0
        while (dy < 8) {
          var dx = 0
          while (dx < 8) { img.setRGB(cx + dx, cy + dy, rgb); dx += 1 }
          dy += 1
        }
        cell += 1
      }
      img
    }
  }

  /** ---- REAL AUDIO CODEC (JDK javax.sound.sampled) -------------------
    * WAV/AIFF/AU decode via `AudioSystem` — ships in the JDK's
    * `java.desktop` module, zero new dependencies (same rationale as
    * [[ImageCodec]]). Non-PCM encodings (µ-law, a-law) are converted to
    * 16-bit signed PCM through `AudioSystem.getAudioInputStream(target,
    * src)`; amplitude stats are computed over normalized [-1, 1]
    * samples. Compressed formats (MP3/FLAC/OGG) have no JDK service
    * provider and fall back to the stub like any undecodable payload.
    */
  object AudioCodec {
    import javax.sound.sampled.{AudioFormat, AudioSystem}

    /** (sampleRate, channels, nFrames, durationMs, rms, peak) for a
      * decodable WAV/AIFF/AU payload; None otherwise. */
    def decode(payload: Array[Byte]): Option[(Int, Int, Long, Long, Double, Double)] =
      try {
        val src = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(payload))
        try {
          val f = src.getFormat
          val target = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
            f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
            f.getSampleRate, false)
          val pcm = AudioSystem.getAudioInputStream(target, src)
          try {
            val bytes = pcm.readAllBytes()
            val n = bytes.length / 2
            var sumSq = 0.0; var peak = 0.0
            var i = 0
            while (i < n) {
              // little-endian 16-bit signed, normalized to [-1, 1]
              val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort / 32768.0
              sumSq += s * s
              val a = math.abs(s); if (a > peak) peak = a
              i += 1
            }
            val frames = n / f.getChannels
            val durMs = (frames * 1000.0 / f.getSampleRate).toLong
            Some((f.getSampleRate.toInt, f.getChannels, frames.toLong, durMs,
              if (n == 0) 0.0 else math.sqrt(sumSq / n), peak))
          } finally pcm.close()
        } finally src.close()
      } catch { case _: Exception => None }
  }

  /** ---- REAL video CONTAINER metadata (ISO-BMFF / MP4) ---------------
    * The JDK ships no video CODEC, but the MP4 container is a plain
    * length-prefixed box tree — duration, timescale, track count and
    * the video track's pixel dimensions live in `moov/mvhd` and
    * `moov/trak/tkhd` and need zero frame decoding. Parsing them here
    * narrows the video stub to FRAME decode only: a 100 TB media
    * catalog (dims, duration, per-format counts) is buildable from this
    * without ffmpeg. Handles version-0 and version-1 headers, 64-bit
    * largesize boxes, and truncated/corrupt payloads (None — callers
    * fall back, never abort).
    */
  object VideoContainer {
    case class Mp4Meta(brand: String, timescaleHz: Long, durationMs: Long,
                       nTracks: Int, width: Int, height: Int)

    def parseMp4(b: Array[Byte]): Option[Mp4Meta] =
      try {
        def u32(o: Int): Long =
          ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
            ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
        def typ(o: Int): String = new String(b, o + 4, 4, "ISO-8859-1")
        def boxes(start: Int, end: Int)(f: (String, Int, Int) => Unit): Unit = {
          var o = start
          var ok = true
          while (ok && o + 8 <= end) {
            var size = u32(o); var hdr = 8
            if (size == 1 && o + 16 <= end) { size = (u32(o + 8) << 32) | u32(o + 12); hdr = 16 }
            else if (size == 0) size = end - o
            if (size < hdr || o + size > end) ok = false
            else { f(typ(o), o + hdr, (o + size).toInt); o += size.toInt }
          }
        }
        if (b.length < 12 || typ(0) != "ftyp") return None
        val brand = new String(b, 8, 4, "ISO-8859-1")
        var timescale = 0L; var duration = 0L; var nTracks = 0
        var w = 0; var h = 0
        boxes(0, b.length) { (t, s, e) =>
          if (t == "moov") boxes(s, e) { (t2, s2, e2) =>
            if (t2 == "mvhd") {
              if ((b(s2) & 0xff) == 0) { timescale = u32(s2 + 12); duration = u32(s2 + 16) }
              else { timescale = u32(s2 + 20); duration = (u32(s2 + 24) << 32) | u32(s2 + 28) }
            } else if (t2 == "trak") {
              nTracks += 1
              boxes(s2, e2) { (t3, s3, _) =>
                if (t3 == "tkhd") {
                  val off = if ((b(s3) & 0xff) == 0) s3 + 76 else s3 + 88
                  // 16.16 fixed point; audio tracks carry 0×0 — keep the
                  // first track with real pixel dimensions
                  val tw = (u32(off) >> 16).toInt; val th = (u32(off + 4) >> 16).toInt
                  if (tw > 0 && th > 0 && w == 0) { w = tw; h = th }
                }
              }
            }
          }
        }
        if (timescale <= 0) None
        else Some(Mp4Meta(brand, timescale, duration * 1000L / timescale,
          nTracks, w, h))
      } catch { case _: Exception => None }
  }

  /** ---- REAL image EXIF metadata (JPEG APP1 / TIFF IFD) --------------
    * The metadata side of the image path: orientation, camera
    * make/model, capture datetime and the declared pixel dimensions
    * live in the JPEG's APP1 segment as a little TIFF file — a plain
    * byte-level walk, no codec needed (the [[VideoContainer]] move for
    * stills). Handles both byte orders ("II"/"MM"), inline vs
    * offset-stored ASCII values, SHORT and LONG dimension types, and
    * truncated/corrupt payloads (None — callers fall back, never
    * abort). A 100 TB image catalog (rotation fix-up, per-camera
    * counts, capture-time partitioning) is buildable from this without
    * decoding a single pixel.
    */
  object ExifParser {
    case class ExifMeta(orientation: Int, make: String, model: String,
                        dateTime: String, pxWidth: Int, pxHeight: Int)

    def parseJpegExif(b: Array[Byte]): Option[ExifMeta] =
      try {
        if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
          return None
        // walk JPEG segments for APP1 "Exif\0\0"
        var o = 2
        var tiff = -1
        var tiffEnd = -1
        while (tiff < 0 && o + 4 <= b.length && (b(o) & 0xff) == 0xff) {
          val marker = b(o + 1) & 0xff
          if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS: no EXIF
          val len = ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
          if (len < 2 || o + 2 + len > b.length) return None
          if (marker == 0xe1 && len >= 8 &&
              new String(b, o + 4, 4, "ISO-8859-1") == "Exif") {
            tiff = o + 10; tiffEnd = o + 2 + len
          }
          o += 2 + len
        }
        if (tiff < 0) return None
        parseTiff(b, tiff, tiffEnd)
      } catch { case _: Exception => None }

    /** Parse the TIFF blob at [base, end): IFD0 tags + the EXIF sub-IFD
      * dimension tags. */
    def parseTiff(b: Array[Byte], base: Int, end: Int): Option[ExifMeta] =
      try {
        val little = b(base) == 'I'.toByte && b(base + 1) == 'I'.toByte
        val big = b(base) == 'M'.toByte && b(base + 1) == 'M'.toByte
        if (!little && !big) return None
        def u16(o: Int): Int =
          if (little) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
          else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
        def u32(o: Int): Long =
          if (little) (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
            ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
          else ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
            ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
        if (u16(base + 2) != 42) return None
        var orientation = 0; var make = ""; var model = ""; var dt = ""
        var w = 0; var h = 0
        def ascii(count: Int, valOff: Int): String = {
          val start = if (count <= 4) valOff else (base + u32(valOff)).toInt
          if (start + count > end) "" else
            new String(b, start, count, "ISO-8859-1").takeWhile(_ != '\u0000')
        }
        def numeric(tpe: Int, valOff: Int): Int =
          if (tpe == 3) u16(valOff) else u32(valOff).toInt // SHORT vs LONG
        def walk(ifdOff: Int, inExif: Boolean): Unit = {
          if (ifdOff + 2 > end) return
          val n = u16(ifdOff)
          for (i <- 0 until n) {
            val e = ifdOff + 2 + i * 12
            if (e + 12 <= end) {
              // entry layout: tag(2) type(2) count(4) value-or-offset(4)
              val tag = u16(e); val tpe = u16(e + 2)
              val count = u32(e + 4).toInt
              val valOff = e + 8
              tag match {
                case 0x0112 if !inExif => orientation = numeric(tpe, valOff)
                case 0x010f if !inExif => make = ascii(count, valOff)
                case 0x0110 if !inExif => model = ascii(count, valOff)
                case 0x0132 if !inExif => dt = ascii(count, valOff)
                case 0x8769 if !inExif => walk((base + u32(valOff)).toInt, inExif = true)
                case 0xa002 if inExif => w = numeric(tpe, valOff)
                case 0xa003 if inExif => h = numeric(tpe, valOff)
                case _ => ()
              }
            }
          }
        }
        walk((base + u32(base + 4)).toInt, inExif = false)
        if (orientation == 0 && make.isEmpty && dt.isEmpty && w == 0) None
        else Some(ExifMeta(orientation, make, model, dt, w, h))
      } catch { case _: Exception => None }

    // ---- deterministic EXIF writer (fixtures + the mm6 entry) --------

    /** Little-endian TIFF blob with IFD0 {orientation, make, datetime,
      * →ExifIFD} and ExifIFD {pixel dims as LONGs}. */
    def buildTiffExif(orientation: Int, make: String, dateTime: String,
                      pxW: Int, pxH: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
      val makeB = (make + "\u0000").getBytes("ISO-8859-1")
      val dtB = (dateTime + "\u0000").getBytes("ISO-8859-1")
      // TIFF value rule: payloads ≤ 4 bytes live INLINE in the value
      // field (padded), longer ones at an offset — the parser honors
      // the rule, so the builder must too (a 3-char make is inline)
      def asciiEntry(tag: Int, bytes: Array[Byte], off: Int): Unit = {
        w16(tag); w16(2); w32(bytes.length)
        if (bytes.length <= 4) {
          bytes.foreach(x => out.write(x & 0xff))
          (bytes.length until 4).foreach(_ => out.write(0))
        } else w32(off)
      }
      def tailLen(bytes: Array[Byte]): Int = if (bytes.length <= 4) 0 else bytes.length
      // layout: hdr(8) IFD0(2+4*12+4) exifIFD(2+2*12+4) [make] [dt]
      val ifd0 = 8
      val exifIfd = ifd0 + 2 + 4 * 12 + 4
      val makeOff = exifIfd + 2 + 2 * 12 + 4
      val dtOff = makeOff + tailLen(makeB)
      out.write('I'); out.write('I'); w16(42); w32(ifd0)
      w16(4) // IFD0 entries
      w16(0x0112); w16(3); w32(1); w16(orientation); w16(0)
      asciiEntry(0x010f, makeB, makeOff)
      asciiEntry(0x0132, dtB, dtOff)
      w16(0x8769); w16(4); w32(1); w32(exifIfd)
      w32(0) // next IFD
      w16(2) // Exif IFD entries
      w16(0xa002); w16(4); w32(1); w32(pxW)
      w16(0xa003); w16(4); w32(1); w32(pxH)
      w32(0)
      if (makeB.length > 4) out.write(makeB)
      if (dtB.length > 4) out.write(dtB)
      out.toByteArray
    }

    /** Wrap `tiff` in a JPEG APP1 segment spliced after `jpeg`'s SOI —
      * the output still decodes wherever `jpeg` did (decoders skip
      * unknown APP segments). */
    def spliceExifApp1(jpeg: Array[Byte], tiff: Array[Byte]): Array[Byte] = {
      require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff
        && (jpeg(1) & 0xff) == 0xd8, "not a JPEG")
      require(tiff.length <= 65527,
        s"EXIF TIFF blob ${tiff.length} B exceeds the 16-bit APP1 segment " +
          "limit (65527) — a wrapped length would emit a corrupt JPEG")
      val out = new java.io.ByteArrayOutputStream()
      out.write(0xff); out.write(0xd8)
      out.write(0xff); out.write(0xe1)
      val len = 2 + 6 + tiff.length
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
      out.write("Exif".getBytes("ISO-8859-1")); out.write(0); out.write(0)
      out.write(tiff)
      out.write(jpeg, 2, jpeg.length - 2)
      out.toByteArray
    }
  }

  /** ---- STUB CODEC (video FRAMES only) -------------------------------
    * Deterministic fake decode: byte statistics standing in for
    * video-frame decode. Images ([[ImageCodec]]) and WAV/AIFF/AU audio
    * ([[AudioCodec]]) are REAL via in-JDK codecs, and MP4 container
    * METADATA is real via [[VideoContainer]]; the JDK ships no video
    * (or compressed-audio) codecs, so frame/sample decode remains the
    * stub — replace with a javacv/ffmpeg decoder here; signature and
    * batch shape are what production code would keep. Also the fallback
    * for payloads that claim a decodable kind but don't parse.
    */
  object FakeCodec {
    def decodeStats(payload: Array[Byte]): (Double, Long) = {
      var sum = 0L; var crc = 1469598103934665603L // FNV-1a
      var i = 0
      while (i < payload.length) {
        sum += payload(i) & 0xff
        crc = (crc ^ (payload(i) & 0xff)) * 1099511628211L
        i += 1
      }
      (if (payload.length == 0) 0.0 else sum.toDouble / payload.length, crc)
    }

    /** "Resize": deterministic payload re-sampling to w*h bytes. Index
      * math in Long — `i * payload.length` overflows Int for outputs
      * beyond ~2GB/len. */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](math.multiplyExact(w, h))
      if (payload.nonEmpty) {
        var i = 0
        while (i < out.length) {
          out(i) = payload(((i.toLong * payload.length / out.length) min (payload.length - 1)).toInt)
          i += 1
        }
      }
      out
    }
  }

  /** Deterministic synthetic asset table derived from `documents` (text
    * bytes as payload) — stands in for a real media lake while exercising
    * the exact schema and column shapes production would use. */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        col("text").cast("binary").as("payload"),
        (col("n_chars") % 640 + 16).cast("int").as("width"),
        (col("n_chars") % 480 + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (col("n_chars") * 10).cast("long").as("duration_ms"))
      .as[Asset]
  }

  /** Real media-lake ingestion seam: `binaryFile` source over a directory
    * tree — one row per file with `(path, modificationTime, length,
    * content)` — mapped onto the same [[Asset]] schema the rest of the
    * pipeline consumes. This is how an actual image/audio/video lake
    * enters the engine (payloads stay scan-local; the source supports
    * pathGlobFilter + recursive lookup, and partition sizing is governed
    * by `spark.sql.files.maxPartitionBytes` exactly like parquet scans).
    * The asset id is the path hash — deterministic under re-ingestion;
    * kind comes from the file extension.
    */
  def ingestBinaryDir(spark: SparkSession, dir: String,
                      glob: String = "*"): Dataset[Asset] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(
        xxhash64(col("path")).as("asset_id"),
        // (?i): camera/encoder output is routinely uppercase (.JPG, .MP4);
        // a case-sensitive match would silently route those to "binary"
        when(col("path").rlike("(?i)\\.(png|jpe?g|bmp)$"), "image")
          .when(col("path").rlike("(?i)\\.(wav|mp3|flac)$"), "audio")
          .when(col("path").rlike("(?i)\\.(mp4|mkv|webm)$"), "video")
          .otherwise("binary").as("kind"),
        col("content").as("payload"),
        lit(0).as("width"), lit(0).as("height"),
        lit(0).as("sample_rate"),
        col("length").as("duration_ms"))
      .as[Asset]
  }

  /** Decode + feature-extract, partition-local. Image payloads that
    * ImageIO can read get REAL features — true pixel dimensions (not the
    * carried metadata), mean channel value, pixel-space checksum — with
    * `decoded = true`; everything else (audio/video kinds, corrupt or
    * non-image bytes) falls back to deterministic byte statistics with
    * `decoded = false`, so a 100 TB ingest never aborts on one bad file
    * and the flag makes the fallback rows filterable downstream. */
  def imageFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val real = if (a.kind == "image") ImageCodec.decode(a.payload) else None
      real match {
        case Some(img) =>
          ImageFeatures(a.asset_id, img.getWidth, img.getHeight,
            a.payload.length.toLong, ImageCodec.meanPixel(img),
            ImageCodec.pixelChecksum(img), decoded = true)
        case None =>
          val (mean, crc) = FakeCodec.decodeStats(a.payload)
          ImageFeatures(a.asset_id, a.width, a.height, a.payload.length.toLong,
            mean, crc, decoded = false)
      }
    })
  }

  /** Decode + feature-extract audio payloads, partition-local — the
    * audio twin of [[imageFeatures]]: WAV/AIFF/AU payloads get REAL
    * sample rate / frame count / duration / amplitude stats with
    * `decoded = true`; everything else falls back to deterministic byte
    * statistics (byte-mean standing in for rms on a 0–1 scale, carried
    * metadata for rate/duration) with `decoded = false`. */
  def audioFeatures(assets: Dataset[Asset]): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val real = if (a.kind == "audio") AudioCodec.decode(a.payload) else None
      real match {
        case Some((rate, ch, frames, durMs, rms, peak)) =>
          AudioFeatures(a.asset_id, rate, ch, frames, durMs, rms, peak,
            a.payload.length.toLong, decoded = true)
        case None =>
          val (mean, _) = FakeCodec.decodeStats(a.payload)
          AudioFeatures(a.asset_id, a.sample_rate, 1,
            a.sample_rate.toLong * a.duration_ms / 1000, a.duration_ms,
            mean / 255.0, mean / 255.0, a.payload.length.toLong, decoded = false)
      }
    })
  }

  case class PHash(asset_id: Long, phash: Long, decoded: Boolean)

  /** Perceptual hashes for image dedup, partition-local: decodable
    * images get the REAL pixel-space aHash; everything else falls back
    * to the byte-checksum (decoded=false, filterable). Downstream,
    * near-dup clustering over these 8-byte hashes is exactly the dd3
    * SimHash machinery: Hamming-ball candidate pairs via chunk buckets,
    * never pixels×pixels. */
  def perceptualHashes(assets: Dataset[Asset]): Dataset[PHash] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val real = if (a.kind == "image") ImageCodec.decode(a.payload) else None
      real match {
        case Some(img) => PHash(a.asset_id, ImageCodec.aHash(img), decoded = true)
        case None =>
          PHash(a.asset_id, FakeCodec.decodeStats(a.payload)._2, decoded = false)
      }
    })
  }

  case class VideoMeta(asset_id: Long, brand: String, duration_ms: Long,
                       n_tracks: Int, width: Int, height: Int,
                       n_bytes: Long, parsed: Boolean)

  /** Container-metadata extraction for video payloads, partition-local —
    * the catalog-building pass a media lake runs BEFORE any transcode
    * job: MP4 payloads get REAL brand/duration/track-count/dimensions
    * from the box tree ([[VideoContainer]], no codec involved);
    * non-MP4 or corrupt payloads fall back to carried metadata with
    * `parsed = false`, so the ingest never aborts and fallback rows are
    * filterable. */
  def videoMetadata(assets: Dataset[Asset]): Dataset[VideoMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val real = if (a.kind == "video") VideoContainer.parseMp4(a.payload) else None
      real match {
        case Some(m) =>
          VideoMeta(a.asset_id, m.brand, m.durationMs, m.nTracks,
            m.width, m.height, a.payload.length.toLong, parsed = true)
        case None =>
          VideoMeta(a.asset_id, "none", a.duration_ms, 0, a.width, a.height,
            a.payload.length.toLong, parsed = false)
      }
    })
  }

  /** Resize pipeline: payload-in, payload-out, metadata updated — the
    * write side of a media-preprocessing job. Decodable image payloads
    * are REALLY resized (bilinear) and re-encoded as PNG; everything
    * else keeps the deterministic byte-resampling stub. */
  def resized(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val realPayload =
        if (a.kind == "image")
          ImageCodec.decode(a.payload)
            .map(img => ImageCodec.encodePng(ImageCodec.resize(img, w, h)))
        else None
      a.copy(payload = realPayload.getOrElse(FakeCodec.resize(a.payload, w, h)),
        width = w, height = h)
    })
  }

  /** Frame sampling for video assets: one row per sampled frame at
    * `everyMs` spacing — the fan-out is bounded by duration, computed
    * partition-locally, and only small frame rows leave the scan. */
  def sampleFrames(assets: Dataset[Asset], everyMs: Long): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    assets.filter(_.kind == "video").mapPartitions(_.flatMap { a =>
      val n = ((a.duration_ms / everyMs) min 32L).toInt max 1
      (0 until n).iterator.map { i =>
        val (_, crc) = FakeCodec.decodeStats(
          FakeCodec.resize(a.payload, 8, 8 + i % 8))
        Frame(a.asset_id, i, i * everyMs, crc)
      }
    })
  }
}
