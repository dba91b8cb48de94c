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
    }
  )
}
