package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.CorpusIngest

class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // Passes every d14-style gate: ≥30 en tokens, no punct/upper (quality
  // ≈ min(len/200, 1)), stopword-dense.
  private val good =
    "the cat sat on the mat and then the dog ran to the park with a ball " * 3
  private val goodB =
    "it was the best of times and it was the worst of times for all of us " * 3

  test("streaming ingest: quality gate + cross-batch fingerprint dedup") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val out = CorpusIngest.qualityDedupStream(
      in.toDF().toDF("doc_id", "ingest_ts", "text"), watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("ingest")
      .outputMode("append").start()
    try {
      // batch 1: one admit, one quality reject
      in.addData((1L, ts("2024-01-01 10:00:00"), good),
        (2L, ts("2024-01-01 10:00:10"), "xx too short"))
      q.processAllAvailable()
      // batch 2: a re-crawl of doc 1 — same text modulo whitespace, so it
      // PASSES the quality gate (unlike e.g. an uppercased variant, which
      // the gate would reject before dedup ever saw it) and is dropped
      // only by the cross-batch fingerprint state — plus a fresh admit
      in.addData((3L, ts("2024-01-01 10:05:00"), good.replace(" ", "  ")),
        (4L, ts("2024-01-01 10:05:30"), goodB))
      q.processAllAvailable()
      val admitted = spark.table("ingest").select($"doc_id")
        .as[Long].collect().toSet
      assert(admitted == Set(1L, 4L))
    } finally q.stop()
  }

  test("streaming near-dup admit: verified cross-batch LSH dedup with " +
      "horizon expiry") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val out = CorpusIngest.nearDupAdmitStream(
      in.toDF().toDF("doc_id", "ingest_ts", "text"),
      watermark = "10 minutes", horizonMs = 3600 * 1000L)
    val q = out.writeStream.format("memory").queryName("neardup")
      .outputMode("append").start()
    try {
      // `nearA` replaces one middle word of `good` — shares the min-md5
      // bucket (deterministic, fixed hash family; verified) and has
      // jaccard ≈ 0.9 to it. `goodB` is disjoint vocabulary.
      val nearA = good.replaceFirst("dog", "fox")
      // batch 1: original admitted; same-batch near-dup dropped;
      // distinct doc admitted; short unsignable doc admitted (solo)
      in.addData((1L, ts("2024-01-01 10:00:00"), good),
        (2L, ts("2024-01-01 10:00:10"), nearA),
        (3L, ts("2024-01-01 10:00:20"), goodB),
        (4L, ts("2024-01-01 10:00:30"), "tiny doc"))
      q.processAllAvailable()
      // batch 2: a later re-crawl near-dup of doc 1 within the horizon is
      // dropped by STATE (cross-batch), a fresh doc is admitted
      in.addData((5L, ts("2024-01-01 10:30:00"), nearA),
        (6L, ts("2024-01-01 10:30:10"),
          "completely different subject matter about spark joins " * 5))
      q.processAllAvailable()
      // batch 3: doc 7 is 2.5 h later, but the watermark (which trails
      // one batch: still 10:20) hasn't aged doc 1's member out of the
      // horizon yet — still dropped. Its event time then ADVANCES the
      // watermark to 12:20.
      in.addData((7L, ts("2024-01-01 12:30:00"), nearA))
      q.processAllAvailable()
      // batch 4: with the watermark past member(10:00) + horizon(1 h),
      // the bucket state has aged out — the same near-dup is admitted
      // again (the documented recall/state trade: full-history dedup is
      // the batch path's job)
      in.addData((8L, ts("2024-01-01 12:45:00"), nearA))
      q.processAllAvailable()
      val admitted = spark.table("neardup").select($"doc_id")
        .as[Long].collect().toSet
      assert(admitted == Set(1L, 3L, 4L, 6L, 8L))
    } finally q.stop()
  }

  test("nearDupAdmitStream survives dirty rows: null event time dropped, " +
      "null-text docs admit (and re-admit) without crashing") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.lang.Long, Timestamp, String)]
    val out = CorpusIngest.nearDupAdmitStream(
      in.toDF().toDF("doc_id", "ingest_ts", "text"),
      watermark = "10 minutes", horizonMs = 3600 * 1000L)
    val q = out.writeStream.format("memory").queryName("neardup_dirty")
      .outputMode("append").start()
    try {
      // null ingest_ts: withWatermark KEEPS it (late-predicate is null),
      // so the op must drop it itself or the in-batch sort NPEs
      in.addData(
        (java.lang.Long.valueOf(1L), null: Timestamp,
          "some perfectly fine document text here"),
        (java.lang.Long.valueOf(2L), ts("2024-01-01 10:00:00"),
          null: String), // null text → solo bucket
        (java.lang.Long.valueOf(3L), ts("2024-01-01 10:00:10"),
          "ok"))  // unsignable (short) solo
      q.processAllAvailable()
      // doc 2 re-crawled within the horizon, same null text: same solo
      // bucket, state holds an EMPTY (not null) signature — the verify
      // must compare values, not NPE; unsignable docs always admit
      in.addData(
        (java.lang.Long.valueOf(2L), ts("2024-01-01 10:05:00"),
          null: String))
      q.processAllAvailable()
      val admitted = spark.table("neardup_dirty")
        .select($"doc_id").as[Long].collect().toSeq.sorted
      assert(admitted == Seq(2L, 2L, 3L))
    } finally q.stop()
  }
}
