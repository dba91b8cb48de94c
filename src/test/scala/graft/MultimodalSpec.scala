package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Asset, FakeCodec}

class MultimodalSpec extends SparkSpecBase {
  import spark.implicits._

  private def asset(id: Long, kind: String, payload: String, durMs: Long = 60000L) =
    Asset(id, kind, payload.getBytes("UTF-8"), 64, 48, 16000, durMs)

  test("imageFeatures falls back to deterministic byte stats for non-decodable payloads") {
    val ds = Seq(asset(1L, "image", "abcd"), asset(2L, "image", "")).toDS()
    val f = Multimodal.imageFeatures(ds).collect().map(x => x.asset_id -> x).toMap
    assert(f(1L).n_bytes === 4L)
    assert(f(1L).mean_byte === ('a' + 'b' + 'c' + 'd') / 4.0)
    assert(!f(1L).decoded, "text bytes are not a decodable image")
    assert(f(2L).n_bytes === 0L && f(2L).mean_byte === 0.0)
    // determinism: same payload → same checksum
    val again = Multimodal.imageFeatures(ds).collect().map(x => x.asset_id -> x.checksum).toMap
    assert(again(1L) === f(1L).checksum)
  }

  // ---- real-image path (JDK ImageIO — no stub involved) ----

  /** A w×h image filled with a constant RGB color. */
  private def flatImage(w: Int, h: Int, r: Int, g: Int, b: Int) = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val gr = img.createGraphics()
    try { gr.setColor(new java.awt.Color(r, g, b)); gr.fillRect(0, 0, w, h) }
    finally gr.dispose()
    img
  }

  test("real PNG/JPEG decode: true pixel dimensions and stats, end-to-end from a binary lake") {
    import Multimodal.ImageCodec
    val dir = java.nio.file.Files.createTempDirectory("imagelake")
    // 20×10 PNG of constant RGB(10,20,30) → mean channel (10+20+30)/3 = 20
    java.nio.file.Files.write(dir.resolve("flat.png"),
      ImageCodec.encodePng(flatImage(20, 10, 10, 20, 30)))
    // a JPEG too (lossy — only dims asserted)
    val jb = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(flatImage(33, 17, 200, 100, 50), "jpg", jb)
    java.nio.file.Files.write(dir.resolve("photo.jpg"), jb.toByteArray)
    val feats = Multimodal.imageFeatures(Multimodal.ingestBinaryDir(spark, dir.toString))
      .collect().map(f => f.n_bytes -> f)
    val byDims = feats.map(_._2).map(f => (f.width, f.height) -> f).toMap
    assert(byDims.keySet === Set((20, 10), (33, 17)),
      "ImageIO must report TRUE pixel dimensions (binaryFile ingestion carries width=0)")
    val png = byDims((20, 10))
    assert(png.decoded && png.mean_byte === 20.0)
    assert(byDims((33, 17)).decoded)
  }

  test("pixel checksum is pixel-space: PNG and BMP of identical pixels hash equal") {
    import Multimodal.ImageCodec
    val img = flatImage(7, 5, 1, 2, 3)
    val bmp = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bmp), "JDK BMP writer present")
    val fromPng = ImageCodec.decode(ImageCodec.encodePng(img)).get
    val fromBmp = ImageCodec.decode(bmp.toByteArray).get
    assert(ImageCodec.pixelChecksum(fromPng) === ImageCodec.pixelChecksum(fromBmp))
    assert(ImageCodec.pixelChecksum(fromPng) !==
      ImageCodec.pixelChecksum(flatImage(7, 5, 1, 2, 4)))
  }

  private def patternImage(w: Int, h: Int, noise: Int = 0): java.awt.image.BufferedImage = {
    // left half dark, right half bright — structured enough that aHash
    // has both 0 and 1 bits; `noise` flips that many left-edge pixels
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, if (x < w / 2) 0x202020 else 0xe0e0e0)
        x += 1
      }
      y += 1
    }
    (0 until noise).foreach(i => img.setRGB(i % w, i / w, 0xffffff))
    img
  }

  test("aHash: container-independent, noise-tolerant, pattern-sensitive") {
    import Multimodal.ImageCodec
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = patternImage(64, 64)
    // identical pixels through different containers hash equal
    val bmp = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(base, "bmp", bmp))
    assert(ImageCodec.aHash(ImageCodec.decode(ImageCodec.encodePng(base)).get)
      === ImageCodec.aHash(ImageCodec.decode(bmp.toByteArray).get))
    // a lightly-noised near-duplicate lands within a small Hamming ball
    val near = ImageCodec.aHash(patternImage(64, 64, noise = 12))
    assert(hamming(ImageCodec.aHash(base), near) <= 8,
      s"near-dup distance ${hamming(ImageCodec.aHash(base), near)}")
    // the mirrored pattern is far away
    val mirrored = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 64).foreach(y => (0 until 64).foreach(x =>
      mirrored.setRGB(x, y, base.getRGB(63 - x, y))))
    assert(hamming(ImageCodec.aHash(base), ImageCodec.aHash(mirrored)) >= 24)
    // a RESCALED copy of the same image hashes identically (aHash's
    // whole point: the 8×8 reduction absorbs resolution)
    val scaled = ImageCodec.resize(base, 128, 128)
    assert(hamming(ImageCodec.aHash(base), ImageCodec.aHash(scaled)) <= 4)
  }

  test("perceptualHashes: real aHash for decodable images, byte-checksum fallback otherwise") {
    import spark.implicits._
    val png = Multimodal.ImageCodec.encodePng(patternImage(32, 32))
    val ds = Seq(
      Asset(1L, "image", png, 32, 32, 0, 0L),
      Asset(2L, "image", "notanimage".getBytes("UTF-8"), 0, 0, 0, 0L),
      Asset(3L, "audio", "audio".getBytes("UTF-8"), 0, 0, 16000, 0L)).toDS()
    val out = Multimodal.perceptualHashes(ds).collect().sortBy(_.asset_id)
    assert(out.map(_.decoded).toSeq === Seq(true, false, false))
    assert(out(0).phash === Multimodal.ImageCodec.aHash(
      Multimodal.ImageCodec.decode(png).get))
  }

  test("real resize: decodable images resize in pixel space and re-encode as PNG") {
    import Multimodal.ImageCodec
    val payload = ImageCodec.encodePng(flatImage(16, 16, 40, 80, 120))
    val ds = Seq(Asset(9L, "image", payload, 16, 16, 0, 0L)).toDS()
    val out = Multimodal.resized(ds, 4, 6).head()
    assert(out.width === 4 && out.height === 6)
    val img = ImageCodec.decode(out.payload).get
    assert(img.getWidth === 4 && img.getHeight === 6, "payload is a real resized image")
    // constant image stays constant under bilinear resampling
    assert(ImageCodec.meanPixel(img) === (40 + 80 + 120) / 3.0)
  }

  test("resize produces exactly w*h bytes and updates metadata") {
    val ds = Seq(asset(1L, "image", "hello world")).toDS()
    val r = Multimodal.resized(ds, 8, 4).head()
    assert(r.payload.length === 32 && r.width === 8 && r.height === 4)
  }

  test("frame sampling emits only video assets with bounded fan-out") {
    val ds = Seq(asset(1L, "video", "vid", durMs = 20000L),
      asset(2L, "image", "img")).toDS()
    val frames = Multimodal.sampleFrames(ds, everyMs = 5000L).collect()
    assert(frames.forall(_.asset_id == 1L))
    assert(frames.length === 4) // 20000/5000
    assert(frames.map(_.t_ms).sorted === Array(0L, 5000L, 10000L, 15000L))
  }

  test("binaryFile ingestion maps a real directory tree onto the Asset pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("medialake")
    val sub = java.nio.file.Files.createDirectory(dir.resolve("shard0"))
    java.nio.file.Files.write(dir.resolve("a.png"), "PNGBYTES".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("b.wav"), "WAVDATA".getBytes("UTF-8"))
    java.nio.file.Files.write(sub.resolve("c.mp4"), "MP4!".getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("notes.txt"), "x".getBytes("UTF-8"))
    // camera-style uppercase extension must still route by kind
    java.nio.file.Files.write(dir.resolve("IMG_0042.JPG"), "JPGDATA".getBytes("UTF-8"))
    val assets = Multimodal.ingestBinaryDir(spark, dir.toString).collect()
    assert(assets.length === 5, "recursive lookup must find all files")
    val byKind = assets.groupBy(_.kind).view.mapValues(_.length).toMap
    assert(byKind === Map("image" -> 2, "audio" -> 1, "video" -> 1, "binary" -> 1))
    // payload bytes survive ingestion intact and feed the feature pipeline
    val imgs = assets.filter(_.kind == "image")
      .map(a => new String(a.payload, "UTF-8") -> a.duration_ms).toMap
    assert(imgs === Map("PNGBYTES" -> 8L, "JPGDATA" -> 7L),
      "payloads intact, binaryFile `length` carried through")
    val feats = Multimodal.imageFeatures(
      Multimodal.ingestBinaryDir(spark, dir.toString, glob = "*.png")).collect()
    assert(feats.length === 1 && feats.head.n_bytes === 8L)
    // deterministic ids under re-ingestion (path hash, not monotonic id)
    val again = Multimodal.ingestBinaryDir(spark, dir.toString).collect()
    assert(again.map(_.asset_id).sorted.sameElements(assets.map(_.asset_id).sorted))
  }

  test("assets table from documents has the real binary+metadata schema") {
    val ds = Multimodal.assets(spark, sf0001)
    val sch = ds.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(sch("payload") === "binary")
    assert(sch("kind") === "string" && sch("duration_ms") === "bigint")
    assert(ds.count() > 0)
  }

  // ---- real-audio path (JDK javax.sound.sampled — no stub involved) ----

  /** 16-bit little-endian mono PCM WAV of a sine wave. */
  private def sineWav(rate: Int, frames: Int, freqHz: Double, amp: Double): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val data = new Array[Byte](frames * 2)
    (0 until frames).foreach { i =>
      val s = (amp * math.sin(2 * math.Pi * freqHz * i / rate) * 32767).toInt.toShort
      data(2 * i) = (s & 0xff).toByte
      data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV decode: true sample rate, frames, duration, and amplitude stats from a binary lake") {
    val dir = java.nio.file.Files.createTempDirectory("audiolake")
    // 0.5 s of a 440 Hz sine at amplitude 0.5, 8 kHz mono
    java.nio.file.Files.write(dir.resolve("tone.wav"), sineWav(8000, 4000, 440.0, 0.5))
    val feats = Multimodal.audioFeatures(
      Multimodal.ingestBinaryDir(spark, dir.toString)).collect()
    assert(feats.length === 1)
    val f = feats.head
    assert(f.decoded, "WAV must take the real AudioSystem path")
    assert(f.sample_rate === 8000 && f.channels === 1,
      "TRUE rate/channels from the WAV header (binaryFile ingestion carries sample_rate=0)")
    assert(f.n_frames === 4000L && f.duration_ms === 500L)
    // sine RMS = amp/√2; peak = amp (16-bit quantization tolerance)
    assert(math.abs(f.rms - 0.5 / math.sqrt(2)) < 1e-3, s"rms=${f.rms}")
    assert(math.abs(f.peak - 0.5) < 0.01, s"peak=${f.peak}")
  }

  test("audioFeatures falls back to byte stats for non-audio payloads, with carried metadata") {
    val ds = Seq(asset(1L, "audio", "abcd", durMs = 2000L),
      asset(2L, "video", "efgh")).toDS()
    val f = Multimodal.audioFeatures(ds).collect().map(x => x.asset_id -> x).toMap
    assert(!f(1L).decoded && !f(2L).decoded)
    assert(f(1L).sample_rate === 16000 && f(1L).duration_ms === 2000L)
    assert(f(1L).n_frames === 16000L * 2000L / 1000L)
    assert(f(1L).rms === (('a' + 'b' + 'c' + 'd') / 4.0) / 255.0)
  }

  /** Minimal valid MP4: ftyp + moov(mvhd v0 + trak(tkhd v0)). Built box
    * by box so the parser is tested against the real wire format. */
  private def tinyMp4(timescale: Int, duration: Int, w: Int, h: Int): Array[Byte] = {
    def u32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      u32(payload.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ payload
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1") ++ u32(0) ++
      "isom".getBytes("ISO-8859-1"))
    // mvhd v0: ver/flags, ctime, mtime, timescale, duration, rest zeroed
    val mvhd = box("mvhd", u32(0) ++ u32(0) ++ u32(0) ++
      u32(timescale.toLong) ++ u32(duration.toLong) ++ Array.fill[Byte](80)(0))
    // tkhd v0: ver/flags..duration (24 B) + reserved/layer/matrix (52 B)
    // + width/height as 16.16 fixed point
    val tkhd = box("tkhd", Array.fill[Byte](76)(0) ++
      u32(w.toLong << 16) ++ u32(h.toLong << 16))
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd))
  }

  test("MP4 container metadata parses for real: duration, dims, tracks — no codec") {
    val mp4 = tinyMp4(timescale = 1000, duration = 5000, w = 320, h = 240)
    val meta = Multimodal.VideoContainer.parseMp4(mp4)
    assert(meta.isDefined, "hand-built MP4 must parse")
    val m = meta.get
    assert(m.brand === "isom" && m.timescaleHz === 1000L)
    assert(m.durationMs === 5000L && m.nTracks === 1)
    assert(m.width === 320 && m.height === 240)
    // corrupt/truncated payloads must return None, never throw
    assert(Multimodal.VideoContainer.parseMp4(mp4.take(20)).isEmpty)
    assert(Multimodal.VideoContainer.parseMp4("junkdata".getBytes).isEmpty)
    assert(Multimodal.VideoContainer.parseMp4(Array.emptyByteArray).isEmpty)
  }

  test("videoMetadata: real MP4 rows parse through the binary lake; others fall back flagged") {
    val dir = java.nio.file.Files.createTempDirectory("videolake")
    java.nio.file.Files.write(dir.resolve("clip.mp4"),
      tinyMp4(timescale = 600, duration = 1200, w = 640, h = 360))
    java.nio.file.Files.write(dir.resolve("bogus.mp4"), "nonsense".getBytes("UTF-8"))
    val metas = Multimodal.videoMetadata(Multimodal.ingestBinaryDir(spark, dir.toString))
      .collect().map(m => m.n_bytes -> m)
    val real = metas.find(_._2.parsed).map(_._2)
    val fake = metas.find(!_._2.parsed).map(_._2)
    assert(real.isDefined && fake.isDefined)
    assert(real.get.duration_ms === 2000L, "1200 ticks at 600 Hz = 2 s")
    assert(real.get.width === 640 && real.get.height === 360 && real.get.n_tracks === 1)
    assert(fake.get.brand === "none")
  }

  test("mm5: image near-dup finds exactly the 20 original-edit pairs at Hamming 2") {
    // fixture contract (see MediaOps): asset f and f+20 share a pattern
    // family differing by a 2-cell edit; f+40 is an unrelated reshoot
    val got = SparkEntry.queries("mm5_image_neardup")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (0L until 20L).map(f => (f, f + 20L, 2L)).toArray
    assert(got === want,
      s"got ${got.toSeq}") // any cross-family pair here = fixture collision
  }

  test("syntheticPattern: the 2-cell edit moves aHash by exactly 2 bits, reshoots are far") {
    import Multimodal.ImageCodec
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    (0L until 20L).foreach { fam =>
      val base = ImageCodec.aHash(ImageCodec.syntheticPattern(fam))
      val edit = ImageCodec.aHash(ImageCodec.syntheticPattern(fam, flipCells = 2))
      val other = ImageCodec.aHash(ImageCodec.syntheticPattern(fam + 1000L))
      assert(hamming(base, edit) === 2, s"fam $fam edit distance")
      assert(hamming(base, other) > 3, s"fam $fam reshoot too close")
    }
  }
}
