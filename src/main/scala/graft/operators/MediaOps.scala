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
    Q.rowsOnly("mm1_media_features") { (s, d) =>
      Multimodal.imageFeatures(Multimodal.assets(s, d)).toDF()
        .orderBy("asset_id")
    },

    // L13 — audio decode + feature extraction: the synthetic assets carry
    // text bytes (not WAV), so every row exercises the declared fallback
    // path here; the REAL decode (generated PCM WAV → true rate/frames/
    // rms) is pinned by MultimodalSpec.
    Q.rowsOnly("mm4_audio_features") { (s, d) =>
      Multimodal.audioFeatures(Multimodal.assets(s, d)).toDF()
        .orderBy("asset_id")
    },

    // L13 — video frame sampling: bounded fan-out, scan-local.
    Q.rowsOnly("mm2_frame_sample") { (s, d) =>
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
    }
  )
}
