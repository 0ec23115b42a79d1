package graft

import java.nio.file.Files


/** Every documents/embeddings query must run — to zero, guard, or partial
  * rows, never a crash — on a DEGENERATE corpus: null/empty/whitespace
  * text, null source/lang, unicode, a pathological single 10k-char token,
  * plus null/empty/short embedding vectors. At 100 TB dirty rows are not
  * an edge case, they are a statistical certainty, and Spark 4's default
  * ANSI mode turns sloppy expressions into task failures (throwing CAST,
  * out-of-range element_at, …) where DuckDB-style semantics yield NULL.
  * Complements EmptyCorpusSpec (zero rows) with the dirty-rows axis. */
class DegenerateCorpusSpec extends SparkSpec {
  import spark.implicits._

  test("d/e/m queries survive null, empty, unicode, and ragged rows") {
    val dir = Files.createTempDirectory("graft-degen").toString
    val longTok = "x" * 10000
    Seq[(Long, String, String, String, java.lang.Long)](
      (1L, null, null, null, null),
      (2L, "", "es", "", 0L),
      (3L, "   \t  \n ", "es", "ab", 8L),
      (4L, "a", "en", "wiki", 1L),
      (5L, "☃ 🙂 héllo wörld", "de", "src2", 14L),
      (6L, longTok, "en", "src3", 10000L),
      (7L, "hello world foo bar baz qux", "en", "src4", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Seq[(Long, Array[Float], java.lang.Integer)](
      (1L, null, null),
      (2L, Array.empty[Float], 0),
      (3L, Array(0.5f), 1),
      (4L, Array.tabulate(64)(i => (i % 7 - 3).toFloat / 4f), 2),
      (5L, Array.fill(64)(0f), 3), // zero vector: cosine 0/0 guard
      (6L, Array.tabulate(64)(i => (i % 5 - 2).toFloat / 3f), 1),
      // null label on a VALID 64-dim vector: survives the dimension
      // guard, so every label-consuming query (e18/e23/e41/e42 grouping
      // and polarity logic) must handle it — a null riding a null
      // vector (row 1) never reaches them
      (7L, Array.tabulate(64)(i => ((i + 3) % 9 - 4).toFloat / 5f), null))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val failures = sweepFailures(dir, q => "dem".contains(q.name.head))
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("event queries survive dirty props JSON, non-numeric k, and null " +
      "user/type/value") {
    val dir = Files.createTempDirectory("graft-degen-ev").toString
    // The event queries join nothing outside events; the star tables are
    // copied clean so the shared-dir contract holds if that ever changes.
    graft.sources.Tables.names.filter(_ != "events").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // The fixture's timestamp[ns] column arrives as a plain ns LONG via
    // the nanosAsLong read path, so the dirty fixture writes a long ts
    // directly; everything else gets adversarial values.
    Seq[(Long, Long, java.lang.Long, String, java.lang.Double, String)](
      (1L, 1700000000000000000L, 7L, "click", 1.5, """{"k": 3}"""),
      (2L, 1700000001000000000L, null, null, null, null),
      (3L, 1700000002000000000L, 7L, "view", 0.0, "not json at all"),
      (4L, 1700003600000000000L, 8L, "click", 2.5, """{"k": "abc"}"""),
      (5L, 1700003700000000000L, 8L, "buy", -1.0, """{"j": 9}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val eventQueries = Set("q30_value_percentiles", "q31_value_mode",
      "q15_events_hourly", "q16_events_json_props",
      "q17_events_approx_users", "q18_events_sessions",
      "q19_asof_attribution", "q20_range_click_counts")
    val failures = sweepFailures(dir, q => eventQueries(q.name))
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("star queries survive null, zero, sub-1, and negative order rows") {
    // The dirty-ORDERS axis the first two sweeps don't cover: null
    // custkey/price/date, a zero price, a sub-1 price (leading digit 0,
    // outside the Benford law domain), and a negative price (whose
    // leading CHARACTER is '-' — an ANSI cast task-killer unless the
    // digit key takes abs() first, the bug this sweep was written to
    // catch). Other tables are copied clean: dirty rows arrive in one
    // feed at a time in practice, and the join behavior under a null
    // key is exactly what this pins.
    val dir = Files.createTempDirectory("graft-degen-ord").toString
    graft.sources.Tables.names.filter(_ != "orders").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val ordSchema = graft.sources.Tables.orders(spark, sfDir).schema
    val isNtz = ordSchema("o_orderdate").dataType ==
      org.apache.spark.sql.types.TimestampNTZType
    def ts(day: Int): Any = {
      val t = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
        .plusDays(day.toLong)
      if (isNtz) t else java.sql.Timestamp.valueOf(t)
    }
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      org.apache.spark.sql.Row(1L, 7L, "F", 111.0, ts(0), "1-URGENT"),
      org.apache.spark.sql.Row(2L, null, "O", null, null, null),
      org.apache.spark.sql.Row(3L, 8L, "", 0.0, ts(1), ""),
      org.apache.spark.sql.Row(4L, 8L, "F", 0.49, ts(1), "2-HIGH"),
      org.apache.spark.sql.Row(5L, 9L, "F", -50.25, ts(2), "3-MEDIUM"),
      org.apache.spark.sql.Row(6L, 9L, "F", 9.9e12, ts(3), "4-LOW"))
    spark.createDataFrame(rows.asJava, ordSchema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val failures = sweepFailures(dir, q => q.name.head == 'q')
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
