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
}
