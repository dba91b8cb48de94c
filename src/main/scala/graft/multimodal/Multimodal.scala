package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 L13): image/audio/video
  * treated as opaque `binary` payload columns plus a typed metadata
  * struct, with decode / feature-extraction / resize / frame-sampling as
  * partition-local typed transforms.
  *
  * The Spark-side plumbing is real — schema, encoders, `mapPartitions`
  * batch shape, partition sizing — while the codec itself is a
  * DETERMINISTIC STUB (`FakeCodec`): the container ships no image/audio
  * libraries, so "decoding" derives stable pseudo-features from the
  * payload bytes. Swapping `FakeCodec` for a JNI/javacv decoder changes
  * no plan shape: the stub is the only non-Spark seam.
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
                           n_bytes: Long, mean_byte: Double, checksum: Long)

  case class Frame(asset_id: Long, frame_idx: Int, t_ms: Long, checksum: Long)

  /** ---- STUB CODEC ---------------------------------------------------
    * Deterministic fake decode: byte statistics standing in for pixel
    * decode. Replace with a real codec (e.g. TwelveMonkeys/javacv) here —
    * signature and batch shape are what production code would keep.
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

  /** Decode + feature-extract, partition-local. */
  def imageFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map { a =>
      val (mean, crc) = FakeCodec.decodeStats(a.payload)
      ImageFeatures(a.asset_id, a.width, a.height, a.payload.length.toLong, mean, crc)
    })
  }

  /** Resize pipeline: payload-in, payload-out, metadata updated — the
    * write side of a media-preprocessing job. */
  def resized(assets: Dataset[Asset], w: Int, h: Int): Dataset[Asset] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions(_.map(a =>
      a.copy(payload = FakeCodec.resize(a.payload, w, h), width = w, height = h)))
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
