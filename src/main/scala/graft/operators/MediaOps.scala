package graft.operators

import graft.Q
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

    // L13 — video frame sampling: bounded fan-out, scan-local.
    Q.rowsOnly("mm2_frame_sample") { (s, d) =>
      Multimodal.sampleFrames(Multimodal.assets(s, d), everyMs = 5000L).toDF()
        .orderBy("asset_id", "frame_idx")
    }
  )
}
