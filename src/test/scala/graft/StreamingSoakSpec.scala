package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.sinks.ParquetTweetSink
import graft.streaming.{CorpusIngest, TweetStream}

/** Bronze-dir FILE-SOURCE replay soak (round-16 advice #5): the
  * MemoryStream suites pin the transform semantics, but MemoryStream
  * bypasses the file source entirely — batch boundaries, mtime ordering,
  * schema-on-read, and the S4 empty-batch seam only exist on the real
  * `spark.readStream.json(bronzeDir)` path. Here N real NDJSON chunk
  * files (including interleaved EMPTY chunks) drain through the actual
  * file source under Trigger.AvailableNow, asserting the cross-batch
  * behaviors end to end:
  *   - C1/D1: dedup scope is PER BATCH — a recurring tweet survives every
  *     chunk, an in-chunk clean-content dup collapses to its first row;
  *   - S4: empty chunk files append nothing through the S7 sink;
  *   - S7: sink ids stay unique across the whole multi-batch run;
  *   - CorpusIngest: the same gate+dedup that MemoryStream tests pin
  *     drops a cross-BATCH re-crawl when batches come from distinct
  *     bronze files (dropDuplicatesWithinWatermark state spanning real
  *     file-source batches).
  */
class StreamingSoakSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p
  }

  private def tweetLine(user: String, text: String): String =
    s"""{"created_at":"Wed Oct 23 03:15:02 +0000 2019","screen_name":"$user","text":"$text","source":"s","location":null,"quoted_screen_name":null,"quoted_text":null,"is_retweet":false,"lang":"es"}"""

  test("soak: 12 bronze chunk files (2 empty) through the real file source") {
    val bronze = tmpDir("bronze-soak")
    val dbDir = tmpDir("db-soak")
    val chunks = 10
    // content chunk k gets file index fi(k) with two empties spliced in at
    // positions 3 and 7; distinct ascending mtimes pin the batch order
    // (FileStreamSource sorts by modification time)
    var fileIdx = 0
    def writeChunk(name: String, body: String): Unit = {
      val f = bronze.resolve(name)
      Files.writeString(f, body)
      f.toFile.setLastModified(1000000L * (fileIdx + 1))
      fileIdx += 1
    }
    (0 until chunks).foreach { k =>
      if (k == 3 || k == 7)
        writeChunk(f"stream_20191023_10$k%02d.json", "") // S4 empty chunk
      val uniq = tweetLine(s"u$k", s"texto original numero $k de este lote")
      // same CLEANED content (urls stripped, whitespace squished) →
      // in-chunk dup, first row (user a_k) wins
      val dupA = tweetLine(s"a$k",
        s"frase duplicada numero $k dentro del lote https://t.co/a$k")
      val dupB = tweetLine(s"b$k",
        s"frase  duplicada   numero $k dentro del lote https://t.co/b$k")
      // identical in EVERY chunk — per-batch dedup scope must let it
      // through once per chunk (the reference never dedups across chunks)
      val rec = tweetLine("rec", "siempre el mismo tuit recurrente")
      writeChunk(f"stream_20191023_11$k%02d.json",
        Seq(uniq, dupA, dupB, rec).mkString("", "\n", "\n"))
    }

    val table = dbDir.resolve("tweet_data.db").toString
    val sink = new ParquetTweetSink(spark, table)
    TweetStream.runAvailableNow(spark, bronze.toString, sink, keys = None,
      checkpointDir = dbDir.resolve("ckpt").toString)

    val out = spark.read.parquet(table)
    // 3 per content chunk: uniq + one of the dup pair + the recurring row
    assert(out.count() == 3L * chunks,
      s"expected ${3 * chunks} rows, got ${out.count()}")
    assert(out.filter($"user" === "rec").count() == chunks.toLong,
      "recurring tweet must survive every chunk (per-batch dedup scope)")
    val users = out.select("user").as[String].collect().toSeq
    (0 until chunks).foreach { k =>
      assert(users.contains(s"u$k"), s"unique tweet of chunk $k missing")
      assert(users.count(u => u == s"a$k" || u == s"b$k") == 1,
        s"chunk $k in-chunk dup pair must collapse to one row")
    }
    val ids = out.select("tweet_id").as[Long].collect()
    assert(ids.distinct.length == ids.length && ids.forall(_ >= 1L),
      "sink ids must stay unique across the multi-batch run")
  }

  test("soak: CorpusIngest gate + cross-batch dedup over a real json file source") {
    val docsDir = tmpDir("docs-soak")
    val good =
      "the cat sat on the mat and then the dog ran to the park with a ball " * 3
    val goodB =
      "it was the best of times and it was the worst of times for all of us " * 3
    def docLine(id: Long, ts: String, text: String): String =
      s"""{"doc_id":$id,"ingest_ts":"$ts","text":"${text.trim}"}"""
    val f1 = docsDir.resolve("chunk1.json")
    Files.writeString(f1, Seq(
      docLine(1L, "2024-01-01T10:00:00Z", good),
      docLine(2L, "2024-01-01T10:00:10Z", "xx too short")) // gate reject
      .mkString("", "\n", "\n"))
    f1.toFile.setLastModified(1000000L)
    val f2 = docsDir.resolve("chunk2.json")
    Files.writeString(f2, Seq(
      // re-crawl of doc 1: same text modulo whitespace — passes the gate,
      // dropped ONLY by fingerprint state spanning file-source batches
      docLine(3L, "2024-01-01T10:05:00Z", good.replace(" ", "  ")),
      docLine(4L, "2024-01-01T10:05:30Z", goodB))
      .mkString("", "\n", "\n"))
    f2.toFile.setLastModified(2000000L)

    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("ingest_ts", TimestampType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // one bronze file == one batch
      .json(docsDir.toString)
    val out = CorpusIngest.qualityDedupStream(stream, watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("soak_ingest")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try q.awaitTermination() finally q.stop()
    val admitted = spark.table("soak_ingest").select($"doc_id")
      .as[Long].collect().toSet
    assert(admitted == Set(1L, 4L),
      s"expected gate reject of 2, cross-batch dedup of 3; got $admitted")
  }
}
