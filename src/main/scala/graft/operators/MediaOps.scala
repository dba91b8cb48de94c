package graft.operators

import graft.{Q, Tables}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal catalog entries (SURVEY.md §2 L13): binary-payload assets
  * derived deterministically from `documents`, decoded/feature-extracted
  * partition-locally (stub codec, real plumbing — see
  * [[graft.multimodal.Multimodal]]). Rows-only checks: byte-level codec
  * stats have no DuckDB twin; the spec pins exact expected values.
  */
object MediaOps {

  val catalog: Seq[Q] = Seq(
    // L13 — decode + feature extraction over binary payloads.
    Q.rowsOnly("mm1_media_features", "binary-codec") { (s, d) =>
      Multimodal.imageFeatures(Multimodal.assets(s, d)).toDF()
        .orderBy("asset_id")
    },

    // L13 — audio decode + feature extraction: the synthetic assets carry
    // text bytes (not WAV), so every row exercises the declared fallback
    // path here; the REAL decode (generated PCM WAV → true rate/frames/
    // rms) is pinned by MultimodalSpec.
    Q.rowsOnly("mm4_audio_features", "binary-codec") { (s, d) =>
      Multimodal.audioFeatures(Multimodal.assets(s, d)).toDF()
        .orderBy("asset_id")
    },

    // L13 — video frame sampling: bounded fan-out, scan-local.
    Q.rowsOnly("mm2_frame_sample", "binary-codec") { (s, d) =>
      Multimodal.sampleFrames(Multimodal.assets(s, d), everyMs = 5000L).toDF()
        .orderBy("asset_id", "frame_idx")
    },

    // L13b — binary-column SQL surface, oracle-checked: payload length,
    // content hash, and byte-slice inspection run relationally over the
    // same opaque `binary` columns the codec path consumes (only the
    // codec itself is engine-specific; the column algebra is portable).
    Q(
      "mm3_binary_sql",
      """SELECT doc_id AS asset_id,
        |  CAST(octet_length(payload) AS BIGINT) AS n_bytes,
        |  md5(CAST(payload AS VARCHAR)) AS content_md5,
        |  substring(CAST(payload AS VARCHAR), 1, 8) AS head
        |FROM (SELECT doc_id, encode(text) AS payload FROM documents)
        |ORDER BY asset_id""".stripMargin
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id").as("asset_id"), col("text").cast("binary").as("payload"))
        .select(col("asset_id"),
          length(col("payload")).cast("long").as("n_bytes"),
          md5(col("payload")).as("content_md5"),
          substring(col("payload").cast("string"), 1, 8).as("head"))
        .orderBy("asset_id")
    },

    // L52 — image near-duplicate detection END TO END on real pixels:
    // 60 deterministic PNGs (20 pattern families × {original, 2-cell
    // edit, unrelated reshoot}) decode through the REAL ImageIO path,
    // hash to 64-bit aHashes partition-locally, and near-dup pairs come
    // from dd3's SimHash machinery — 4×16-bit chunk buckets (pigeonhole:
    // any pair within Hamming 3 shares a chunk; the fixture's edits land
    // ≤ 2 bits) then bit_count verify on candidates only. Pixels never
    // shuffle; after the hash pass everything is 8 bytes/asset. The
    // expected pair set (exactly the 20 original↔edit pairs) is pinned
    // by MultimodalSpec; rows-only here (no DuckDB image decode).
    // L64 — REAL EXIF metadata extraction over a JPEG lake: ten
    // generated JPEGs (real ImageIO encode) each get a spliced APP1/TIFF
    // EXIF segment, land on disk, ingest through the binaryFile lake
    // path, and the byte-level TIFF-IFD parser recovers orientation/
    // make/datetime/declared dims WITHOUT decoding a pixel — the stills
    // analogue of the MP4 box parser, and the rotation-fixup/capture-
    // time-partitioning input a 100 TB image catalog needs. Output keys
    // on the EXIF fields themselves (asset ids hash the temp path —
    // unstable across runs by design). Rows-only; ExifSpec pins the
    // parser on round-trip, golden big-endian bytes, interop (spliced
    // files still decode), and corrupt fallbacks.
    Q.rowsOnly("mm6_exif_metadata", "binary-codec") { (s, d) =>
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("exif_lake")
      for (i <- 0 until 10) {
        val img = Multimodal.ImageCodec.syntheticPattern(i.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        val bytes = Multimodal.ExifParser.spliceExifApp1(bos.toByteArray,
          Multimodal.ExifParser.buildTiffExif(i % 8 + 1, "graftcam",
            f"2026:08:${i + 1}%02d 00:00:00", 640 + i, 480 + i))
        java.nio.file.Files.write(dir.resolve(f"img$i%02d.jpg"), bytes)
      }
      Multimodal.ingestBinaryDir(s, dir.toString, "*.jpg")
        .mapPartitions(_.flatMap(a =>
          Multimodal.ExifParser.parseJpegExif(a.payload)))
        .toDF()
        .select(col("make"), col("orientation").cast("long").as("orientation"),
          col("pxWidth").cast("long").as("px_w"),
          col("pxHeight").cast("long").as("px_h"), col("dateTime").as("taken"))
        .orderBy("px_w")
    },

    Q.rowsOnly("mm5_image_neardup", "binary-codec") { (s, d) =>
      import s.implicits._
      val assets: org.apache.spark.sql.Dataset[Multimodal.Asset] =
        s.range(60).mapPartitions(_.map { i =>
          val fam = i % 20
          val seed = if (i / 20 == 2) fam + 1000L else fam
          val flips = if (i / 20 == 1) 2 else 0
          Multimodal.Asset(i, "image",
            Multimodal.ImageCodec.encodePng(
              Multimodal.ImageCodec.syntheticPattern(seed, flips)),
            64, 64, 0, 0L)
        })
      val ph = Multimodal.perceptualHashes(assets).toDF()
        .filter(col("decoded"))
        .select(col("asset_id"), col("phash"))
        .localCheckpoint(true) // both sides of the candidate self-join
      val chunked = ph.select(col("asset_id"), col("phash"),
        posexplode(array((0 until 4).map(i =>
          expr(s"(phash >> ${i * 16}) & 65535")): _*)).as(Seq("chunk", "cv")))
      val a = chunked.select(col("chunk"), col("cv"),
        col("asset_id").as("id_a"), col("phash").as("h_a"))
      val b = chunked.select(col("chunk"), col("cv"),
        col("asset_id").as("id_b"), col("phash").as("h_b"))
      a.join(b, Seq("chunk", "cv"))
        .filter(col("id_a") < col("id_b"))
        .dropDuplicates("id_a", "id_b")
        .withColumn("hamming", expr("bit_count(h_a ^ h_b)").cast("long"))
        .filter(col("hamming") <= 3)
        .select("id_a", "id_b", "hamming")
        .orderBy("id_a", "id_b")
    },

    // ---- r9: CERTIFICATE SIBLINGS for the mm rows-only family --------
    // (VERDICT r8 item 3 — the tx59 recipe: the codec byte-walks have
    // no DuckDB twin, but their STRUCTURAL CONTRACTS do. Each entry runs
    // the REAL codec path on executors over corpus-derived fixtures and
    // emits violation counts + totals; the oracle recomputes the totals
    // from `documents` arithmetic and pins the violations at literal 0 —
    // a hash match certifies the contract corpus-wide each round.)

    // mm1's sibling — PNG pixel-checksum ROUND-TRIP: pattern → encode →
    // decode must preserve every ARGB pixel (PNG lossless), re-encoding
    // the decoded image must be a fixpoint, true dims must be 64×64,
    // and the mean channel value must sit inside the pattern's two cell
    // shades [24, 232]. One 64×64 image per doc_id % 5 == 0 doc, built
    // and checked partition-locally (payloads never shuffle).
    Q(
      "mm7_pixel_roundtrip",
      """SELECT CAST(count(*) AS BIGINT) AS n_images,
        |  CAST(0 AS BIGINT) AS encode_bad,
        |  CAST(0 AS BIGINT) AS reencode_bad,
        |  CAST(0 AS BIGINT) AS dims_bad,
        |  CAST(0 AS BIGINT) AS mean_bad
        |FROM documents WHERE doc_id % 5 = 0""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val img0 = Multimodal.ImageCodec.syntheticPattern(id)
          val c0 = Multimodal.ImageCodec.pixelChecksum(img0)
          Multimodal.ImageCodec.decode(Multimodal.ImageCodec.encodePng(img0)) match {
            case Some(i1) =>
              val c1 = Multimodal.ImageCodec.pixelChecksum(i1)
              val c2 = Multimodal.ImageCodec
                .decode(Multimodal.ImageCodec.encodePng(i1))
                .map(Multimodal.ImageCodec.pixelChecksum).getOrElse(-1L)
              val m = Multimodal.ImageCodec.meanPixel(i1)
              (1L, if (c1 == c0) 0L else 1L, if (c2 == c1) 0L else 1L,
                if (i1.getWidth == 64 && i1.getHeight == 64) 0L else 1L,
                if (m >= 24.0 && m <= 232.0) 0L else 1L)
            case None => (1L, 1L, 1L, 1L, 1L)
          }
        }).toDF("one", "eb", "rb", "db", "mb")
        .agg(sum("one").as("n_images"), sum("eb").as("encode_bad"),
          sum("rb").as("reencode_bad"), sum("db").as("dims_bad"),
          sum("mb").as("mean_bad"))
    },

    // mm2's sibling — frame-count ARITHMETIC: sampleFrames' per-asset
    // fan-out (min(duration/step, 32) max 1), index contiguity
    // (n == max_idx + 1), and the timestamp sum n(n−1)/2·step are all
    // integer-derivable from `documents` (video assets are doc_id%3==2
    // with duration = n_chars·10) — the oracle recomputes every total
    // independently while Spark MEASURES them off the real fan-out.
    Q(
      "mm8_frame_arith",
      """WITH v AS (SELECT GREATEST(LEAST(CAST(n_chars AS BIGINT) * 10 // 5000,
        |                              32), 1) AS n
        |           FROM documents WHERE doc_id % 3 = 2)
        |SELECT CAST(count(*) AS BIGINT) AS n_assets,
        |  CAST(sum(n) AS BIGINT) AS n_frames,
        |  CAST(sum(5000 * n * (n - 1) // 2) AS BIGINT) AS sum_t_ms,
        |  CAST(0 AS BIGINT) AS idx_bad
        |FROM v""".stripMargin
    ) { (s, d) =>
      val per = Multimodal
        .sampleFrames(Multimodal.assets(s, d), everyMs = 5000L).toDF()
        .groupBy("asset_id")
        .agg(count(lit(1)).as("n"), max("frame_idx").as("mx"),
          sum("t_ms").as("st"))
      per.agg(count(lit(1)).as("n_assets"), sum("n").as("n_frames"),
        sum("st").as("sum_t_ms"),
        sum(when(col("n") =!= col("mx") + 1, 1L).otherwise(0L)).as("idx_bad"))
    },

    // mm4's sibling — WAV DECODE INVARIANTS on planted PCM: a square
    // wave at amplitude 16384 decodes to rms = peak = 0.5 BIT-EXACTLY
    // (16384/32768 = 0.5, mean of 0.25 terms and its sqrt are exact
    // IEEE), and rate/frame-count/duration must equal the planted
    // header values. One WAV per doc_id % 5 == 0 doc with frames =
    // 400 + doc_id % 97 — the oracle recomputes the planted frame total.
    Q(
      "mm9_wav_invariants",
      """SELECT CAST(count(*) AS BIGINT) AS n_wavs,
        |  CAST(sum(400 + doc_id % 97) AS BIGINT) AS frames_total,
        |  CAST(0 AS BIGINT) AS rate_bad,
        |  CAST(0 AS BIGINT) AS frames_bad,
        |  CAST(0 AS BIGINT) AS dur_bad,
        |  CAST(0 AS BIGINT) AS rms_bad
        |FROM documents WHERE doc_id % 5 = 0""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
        .select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
          it.map { id =>
            val frames = 400 + (id % 97).toInt
            val rate = 8000
            val pcm = new Array[Byte](frames * 2)
            var i = 0
            while (i < frames) {
              val v: Short = if (i % 2 == 0) 16384 else -16384
              pcm(2 * i) = (v & 0xff).toByte
              pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
              i += 1
            }
            val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
            val bos = new java.io.ByteArrayOutputStream()
            AudioSystem.write(new AudioInputStream(
              new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
              AudioFileFormat.Type.WAVE, bos)
            Multimodal.AudioCodec.decode(bos.toByteArray) match {
              case Some((r, ch, fr, dur, rms, peak)) =>
                (1L, frames.toLong,
                  if (r == rate && ch == 1) 0L else 1L,
                  if (fr == frames.toLong) 0L else 1L,
                  if (dur == frames.toLong * 1000L / rate) 0L else 1L,
                  if (rms == 0.5 && peak == 0.5) 0L else 1L)
              case None => (1L, frames.toLong, 1L, 1L, 1L, 1L)
            }
          }
        }.toDF("one", "fr", "rb", "fb", "db", "ab")
        .agg(sum("one").as("n_wavs"), sum("fr").as("frames_total"),
          sum("rb").as("rate_bad"), sum("fb").as("frames_bad"),
          sum("db").as("dur_bad"), sum("ab").as("rms_bad"))
    },

    // mm5's sibling — aHash SEPARATION: for every family (the 20
    // distinct doc_id % 20 values), the 2-cell edit stays within
    // Hamming 3 of the original's aHash while the reshoot (seed+1000)
    // lands beyond 3 — the exact separation mm5's bucket join exploits,
    // re-proven through the REAL PNG encode → ImageIO decode → resize →
    // aHash path every round. Same seeds as mm5's fixture.
    Q(
      "mm10_ahash_separation",
      """SELECT CAST(count(DISTINCT doc_id % 20) AS BIGINT) AS n_families,
        |  CAST(count(DISTINCT doc_id % 20) AS BIGINT) AS edit_within_3,
        |  CAST(count(DISTINCT doc_id % 20) AS BIGINT) AS reshoot_beyond_3
        |FROM documents""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).select((col("doc_id") % 20).as("fam"))
        .distinct().as[Long]
        .mapPartitions(_.map { f =>
          def h(seed: Long, flips: Int): Long = {
            val img = Multimodal.ImageCodec.decode(
              Multimodal.ImageCodec.encodePng(
                Multimodal.ImageCodec.syntheticPattern(seed, flips))).get
            Multimodal.ImageCodec.aHash(img)
          }
          val o = h(f, 0)
          (1L,
            if (java.lang.Long.bitCount(o ^ h(f, 2)) <= 3) 1L else 0L,
            if (java.lang.Long.bitCount(o ^ h(f + 1000L, 0)) > 3) 1L else 0L)
        }).toDF("one", "ew", "rb")
        .agg(sum("one").as("n_families"), sum("ew").as("edit_within_3"),
          sum("rb").as("reshoot_beyond_3"))
    },

    // mm6's sibling — EXIF ROUND-TRIP vs planted values: per doc
    // (doc_id % 5 == 0) a real ImageIO JPEG gets a spliced APP1/TIFF
    // segment built from doc-derived values; the parser must recover
    // orientation/make/datetime/dims exactly, the spliced file must
    // still DECODE (interop), and the oracle recomputes the planted
    // orientation and width sums from the same doc arithmetic.
    Q(
      "mm11_exif_roundtrip",
      """SELECT CAST(count(*) AS BIGINT) AS n_jpegs,
        |  CAST(sum(doc_id % 8 + 1) AS BIGINT) AS sum_orientation,
        |  CAST(sum(640 + doc_id % 97) AS BIGINT) AS sum_px_w,
        |  CAST(0 AS BIGINT) AS parse_bad,
        |  CAST(0 AS BIGINT) AS mismatch_bad,
        |  CAST(0 AS BIGINT) AS decode_bad
        |FROM documents WHERE doc_id % 5 = 0""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
        .select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val orient = (id % 8 + 1).toInt
          val pxw = (640 + id % 97).toInt
          val pxh = (480 + id % 89).toInt
          val dt = f"2026:08:${(id % 28 + 1).toInt}%02d 12:00:00"
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(
            Multimodal.ImageCodec.syntheticPattern(id), "jpg", bos)
          val spliced = Multimodal.ExifParser.spliceExifApp1(bos.toByteArray,
            Multimodal.ExifParser.buildTiffExif(orient, "graftcam", dt, pxw, pxh))
          val decodeBad =
            if (Multimodal.ImageCodec.decode(spliced).isDefined) 0L else 1L
          Multimodal.ExifParser.parseJpegExif(spliced) match {
            case Some(m) =>
              (1L, m.orientation.toLong, m.pxWidth.toLong, 0L,
                if (m.orientation == orient && m.make == "graftcam"
                  && m.dateTime == dt && m.pxWidth == pxw
                  && m.pxHeight == pxh) 0L else 1L,
                decodeBad)
            case None => (1L, 0L, 0L, 1L, 1L, decodeBad)
          }
        }).toDF("one", "so", "sw", "pb", "mb", "db")
        .agg(sum("one").as("n_jpegs"), sum("so").as("sum_orientation"),
          sum("sw").as("sum_px_w"), sum("pb").as("parse_bad"),
          sum("mb").as("mismatch_bad"), sum("db").as("decode_bad"))
    }
  )
}
