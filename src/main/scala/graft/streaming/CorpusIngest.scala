package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TextFunctions._
import graft.functions.{MinHashExprs, MinHashOps}

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

  final case class NearDupIn(bucket: String, doc_id: Long,
      ts: Timestamp, hs: Array[Long], src: String)
  final case class Admitted(docId: Long, hs: Array[Long], tsMs: Long)
  final case class BucketState(members: List[Admitted])
  final case class NearDupAdmit(doc_id: Long, ingest_ts: Timestamp,
      source: String)

  /** Streaming NEAR-dup admission — the cross-batch streaming form of
    * d09's verified near-dup: an incoming doc is dropped when a doc
    * admitted within the state horizon is jaccard-similar to it; the rest
    * are admitted and remembered.
    *
    * Same candidate model as the batch path, so recall matches d09
    * exactly: candidates share the single md5-minhash bucket (the native
    * [[MinHashExprs.minMd5Shingle]]; unsignable docs get per-doc `solo:`
    * buckets and are always admitted), verification is exact Jaccard over
    * the hashed shingle sets ([[MinHashOps.jaccardSorted]]). One
    * `flatMapGroupsWithState` keyed by bucket; within a batch, docs are
    * processed in (ts, doc_id) order so admission is deterministic.
    *
    * State at scale: per live bucket, the admitted members' shingle-hash
    * arrays, pruned two ways — members older than `horizonMs` age out on
    * every visit and the whole group times out (event-time) once the
    * watermark passes its newest member + horizon, so state is O(docs
    * admitted per horizon), never O(corpus); `maxBucket` caps the
    * per-group verify cost and member list, and entrants to a full
    * bucket are DROPPED (a 64-deep near-identical cluster is boilerplate
    * — same cap, same policy as the batch `lshMaxBucket`). Full-history
    * near-dup belongs to the batch path (d09/d27) over the accumulated
    * bronze zone. */
  def nearDupAdmitStream(docs: DataFrame, tsCol: String = "ingest_ts",
      watermark: String = "1 hour", horizonMs: Long = 3600 * 1000L,
      minJaccard: Double = 0.5, maxBucket: Int = 64): DataFrame = {
    implicit val inEnc = Encoders.product[NearDupIn]
    implicit val stEnc = Encoders.product[BucketState]
    implicit val outEnc = Encoders.product[NearDupAdmit]
    // `source` rides through to the admitted output when the input has it
    // (the retentionStream rollup groups on it); absent → empty string.
    val srcCol =
      if (docs.columns.contains("source")) coalesce(col("source"), lit(""))
      else lit("")
    docs
      // Null event time or null id can't be stated against (withWatermark
      // KEEPS null-ts rows — the late-data predicate is null ⇒ not late —
      // and they'd NPE the in-batch ordering); both are source columns,
      // so the filter pushes to the scan without the computed-alias trap.
      .filter(col(tsCol).isNotNull && col("doc_id").isNotNull)
      .withColumn("toks", tokens(col("text")))
      .select(
        coalesce(MinHashExprs.minMd5Shingle(col("toks")),
          concat(lit("solo:"), col("doc_id"))).as("bucket"),
        col("doc_id"),
        col(tsCol).as("ts"),
        // empty (never null) for unsignable docs: a null-text doc whose
        // doc_id recurs lands in the SAME solo bucket, and the verify
        // below must compare values, not NPE (empty∩empty ⇒ jaccard 0 ⇒
        // unsignable docs always admit, matching the batch solo policy)
        coalesce(MinHashExprs.shingleHashes(col("toks")),
          array().cast("array<bigint>")).as("hs"),
        srcCol.as("src"))
      .withWatermark("ts", watermark)
      .as[NearDupIn]
      .groupByKey(_.bucket)(Encoders.STRING)
      .flatMapGroupsWithState[BucketState, NearDupAdmit](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, batch: Iterator[NearDupIn], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val horizonFloor = state.getCurrentWatermarkMs() - horizonMs
            var members = state.getOption.map(_.members).getOrElse(Nil)
              .filter(_.tsMs >= horizonFloor)
            val admitted = List.newBuilder[NearDupAdmit]
            batch.toSeq.sortBy(d => (d.ts.getTime, d.doc_id)).foreach { d =>
              val dup = members.size >= maxBucket ||
                members.exists(m =>
                  MinHashOps.jaccardSorted(m.hs, d.hs) >= minJaccard)
              if (!dup) {
                members = Admitted(d.doc_id, d.hs, d.ts.getTime) :: members
                admitted += NearDupAdmit(d.doc_id, d.ts, d.src)
              }
            }
            if (members.isEmpty) state.remove()
            else {
              state.update(BucketState(members))
              state.setTimeoutTimestamp(
                members.map(_.tsMs).max + horizonMs)
            }
            admitted.result().iterator
          }
      }.toDF()
  }

  /** Streaming CAPSTONE — the retention pipeline d52 runs in batch, as
    * one continuous query over a bronze document stream:
    *
    *   Gopher gate → cross-batch near-dup admission → per-source
    *   admitted counts, UPDATE mode.
    *
    * The gate is the SAME definition as the batch path (TextQueries
    * .gopherMetrics / gopherAdmit — narrow per-row expressions, so they
    * fuse into the streaming scan exactly as into the batch scan);
    * admission is [[nearDupAdmitStream]] (bounded state, watermark
    * horizon); the rollup is a watermarked streaming aggregation whose
    * state is one counter per source. Three stateful operators chained —
    * dedup state, then agg state — each bounded, each keyed small.
    *
    * Semantics vs d52: on exact-duplicate clusters arriving in id order
    * the two answers COINCIDE (batch keeps the component's min id; the
    * stream admits the first arrival — the same document), which is what
    * the capstone equality test pins. They diverge exactly where the
    * designs differ on purpose: d52's 4-band LSH catches near-dups the
    * single min-hash bucket misses, and the stream's horizon forgets
    * what batch CC remembers forever — the documented recall/state
    * trade; full-history dedup stays a batch job over the bronze zone.
    *
    * REQUIRES `spark.sql.streaming.statefulOperator.checkCorrectness
    * .enabled=false`: Spark rejects any aggregation downstream of
    * flatMapGroupsWithState because a user function COULD emit rows
    * older than the watermark (late for the agg and silently dropped).
    * This one provably cannot: [[nearDupAdmitStream]] emits only rows of
    * the CURRENT batch carrying their own unmodified event times, and
    * those rows already passed the same-delay upstream watermark — so no
    * emitted row is ever late downstream. The conservative analyzer
    * cannot see through the lambda; the config is the sanctioned
    * declaration that a human verified it.
    */
  def retentionStream(docs: DataFrame, tsCol: String = "ingest_ts",
      watermark: String = "1 hour", horizonMs: Long = 3600 * 1000L,
      minJaccard: Double = 0.5, maxBucket: Int = 64): DataFrame = {
    val gated = graft.queries.TextQueries
      .gopherMetrics(docs.withColumn("toks", tokens(col("text"))))
      .filter(graft.queries.TextQueries.gopherAdmit)
      .select(col("doc_id"), col("source"), col(tsCol), col("text"))
    nearDupAdmitStream(gated, tsCol, watermark, horizonMs, minJaccard,
        maxBucket)
      .withWatermark("ingest_ts", watermark)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"))
  }
}
