package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.streaming.CorpusIngest

/** The streaming capstone (round-16 advice #7): d52's batch lineage exists
  * end to end; this drives its STREAMING form — real bronze json chunk
  * files → Gopher gate → cross-batch near-dup admission → per-source
  * retention counts in update mode — and asserts the final counts equal
  * the registered d52 batch query's n_kept on the same corpus.
  *
  * The corpus is built so the two paths provably coincide (see
  * CorpusIngest.retentionStream's semantics note): duplicate clusters are
  * EXACT-text (identical min-hash bucket, jaccard 1 pairwise, one CC
  * component) and ids arrive in timestamp order (batch keeps the
  * component min id; the stream admits the first arrival — the same doc,
  * same source). Clusters span chunk files and sources, so the equality
  * exercises cross-BATCH admission state and cross-source attribution,
  * not just per-batch dedup.
  */
class StreamingCapstoneSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  // Gate-passing text: 60 distinct letter-bearing tokens (n_tokens ≥ 50,
  // mean word len ~6, alpha ratio 1.0, all trigrams distinct → rep_ratio
  // ≈ 0). The salt makes distinct docs vocabulary-disjoint so nothing
  // shares a min-hash bucket by accident.
  private def goodText(salt: String): String =
    (0 until 60).map(i => s"word$i$salt").mkString(" ")

  test("streaming retention counts equal d52's batch n_kept per source") {
    val bronze = tmpDir("capstone-bronze")
    val batchDir = tmpDir("capstone-batch")

    // (doc_id, chunk, source, text): ids ascend with event time (ts =
    // 10:00 + doc_id minutes). Clusters:
    //   docs 1,4,8   exact dup, source s1, spans chunks 1/2/3 → keep 1
    //   docs 2,9     exact dup, sources s1 THEN s2, chunks 1/3 → keep 2
    //                (cross-source: batch attributes the kept doc to the
    //                min id's source = s1; stream admits doc 2 first = s1)
    //   doc 3        unique, s2 → kept
    //   doc 5        gate reject (too short), s2
    //   doc 6        unique, s2 → kept
    //   doc 7        gate reject (one token repeated: rep_ratio ≈ 1), s1
    val rows = Seq(
      (1L, 1, "s1", goodText("a")),
      (2L, 1, "s1", goodText("b")),
      (3L, 1, "s2", goodText("c")),
      (4L, 2, "s1", goodText("a")),
      (5L, 2, "s2", "too short to pass"),
      (6L, 2, "s2", goodText("d")),
      (7L, 3, "s1", ("lorem " * 60).trim),
      (8L, 3, "s1", goodText("a")),
      (9L, 3, "s2", goodText("b")))
    // expected retention: s1 keeps {1, 2}, s2 keeps {3, 6}

    // -- bronze chunk files for the stream (ascending mtimes = batch order)
    def jsonLine(id: Long, src: String, text: String): String = {
      val ts = f"2024-01-01T10:${id}%02d:00Z"
      s"""{"doc_id":$id,"ingest_ts":"$ts","source":"$src","text":"$text"}"""
    }
    rows.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (chunk, rs) =>
      val f = bronze.resolve(f"chunk$chunk%02d.json")
      Files.writeString(f,
        rs.sortBy(_._1).map(r => jsonLine(r._1, r._3, r._4))
          .mkString("", "\n", "\n"))
      f.toFile.setLastModified(1000000L * chunk)
    }

    // -- the same corpus as a documents.parquet dir for the batch query
    rows.map { case (id, _, src, text) =>
        (id, text, "en", src, text.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(batchDir.resolve("documents.parquet").toString)
    val batchKept = graft.queries.GraftQuery.all
      .find(_.name == "d52_neardup_capstone").get
      .run(spark, batchDir.toString)
      .select(col("source"), col("n_kept"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(batchKept == Map("s1" -> 2L, "s2" -> 2L),
      s"batch d52 baseline unexpected: $batchKept")

    // -- drive the streaming capstone over the real file source
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ingest_ts", TimestampType),
      StructField("source", StringType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // one bronze file == one batch
      .json(bronze.toString)
    val out = CorpusIngest.retentionStream(stream, watermark = "10 minutes")
    // See retentionStream's scaladoc: the admission op emits only
    // current-batch rows with their own event times, so the downstream
    // agg can never see a late row — the blanket fMGWS-before-agg check
    // is safely waived for this query (and restored after).
    val checkKey = "spark.sql.streaming.statefulOperator.checkCorrectness.enabled"
    spark.conf.set(checkKey, "false")
    val q = out.writeStream.format("memory").queryName("capstone_retention")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination()
    finally { q.stop(); spark.conf.set(checkKey, "true") }

    // update mode emits every revision of a source's counter; the final
    // value per source is the max (admitted counts only grow)
    val streamKept = spark.table("capstone_retention")
      .groupBy($"source").agg(max($"n_kept").as("n_kept"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamKept == batchKept,
      s"stream retention $streamKept != batch d52 n_kept $batchKept")
  }
}
