package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Incremental corpus ingestion — the streaming form of the batch
  * training-data gate (d14) composed with bounded-state exact dedup: a
  * continuous crawl lands document micro-batches, each doc is scored and
  * filtered by the same quality signals as the batch path, and documents
  * whose NORMALIZED fingerprint was already admitted within the watermark
  * horizon are dropped (cross-batch, not just per-batch — the same
  * upgrade over the reference's `duplicated()` as
  * [[StatefulOps.dedupWithinWatermark]], main.R:105).
  *
  * Scale contract: the quality signals are narrow per-row expressions
  * fused into the source scan; the only state is the dedup map, keyed by
  * a 32-byte fingerprint and bounded by the watermark horizon (O(docs
  * admitted per horizon), not O(corpus)). At 100 TB/day the horizon is
  * the dedup-recall knob: a longer horizon catches more re-crawls at
  * proportionally more state; full-history dedup belongs to the batch
  * path (d05/d23) over the accumulated bronze zone.
  */
object CorpusIngest {

  /** Quality-gate + dedup a (possibly streaming) document frame carrying
    * `doc_id`, `text`, and an event-time column `tsCol`. Emits the
    * admitted docs with their signals (append-mode capable). */
  def qualityDedupStream(docs: DataFrame, tsCol: String = "ingest_ts",
      watermark: String = "1 hour"): DataFrame =
    qualityGate(docs.select(col("doc_id"), col(tsCol), col("text")))
      .withColumn("fingerprint", fingerprint(col("text")))
      .drop("text")
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
}
