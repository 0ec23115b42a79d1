package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal-pipeline queries: binary payload columns + decode /
  * feature-extract / frame-sample plumbing (decode itself is the
  * documented STUB seam — deterministic fake, so row counts and shapes
  * are stable; no DuckDB oracle, rows-only checks). */
object MediaQueries {

  val all: Seq[GraftQuery] = Seq(

    // decode + feature-extract over a binary media column (mapPartitions
    // batch shape, narrow plan — no shuffle)
    GraftQuery(
      "m01_media_decode",
      (s, d) =>
        Multimodal.decodeFeatures(Multimodal.syntheticMedia(Tables.documents(s, d)))
          .toDF()
          .select(col("media_id"), col("kind"), col("width"), col("height"),
            col("n_frames")),
      None),

    // frame sampling: videos explode to strided frame indices
    GraftQuery(
      "m02_frame_sample",
      (s, d) =>
        Multimodal.sampleFrames(
          Multimodal.decodeFeatures(Multimodal.syntheticMedia(Tables.documents(s, d))),
          every = 4),
      None),
  )
}
