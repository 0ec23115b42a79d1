package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StatefulOps

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling window + watermark: closed windows emit in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val out = StatefulOps.tumblingCounts(
      in.toDF().toDF("ts", "k"), "ts", "k", "10 minutes", "5 minutes")
    val q = out.writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    try {
      in.addData((ts("2024-01-01 10:01:00"), "a"), (ts("2024-01-01 10:02:00"), "a"),
        (ts("2024-01-01 10:03:00"), "b"))
      q.processAllAvailable()
      // watermark still at 10:03-5m → nothing closed yet
      assert(spark.table("tumbling").count() == 0)
      // event at 10:21 → watermark advances past 10:10 → first window closes
      in.addData((ts("2024-01-01 10:21:00"), "a"))
      q.processAllAvailable()
      in.addData((ts("2024-01-01 10:40:00"), "a"))
      q.processAllAvailable()
      val rows = spark.table("tumbling")
        .select($"window_start".cast("string"), $"k", $"n")
        .as[(String, String, Long)].collect().toSet
      assert(rows.contains(("2024-01-01 10:00:00", "a", 2L)))
      assert(rows.contains(("2024-01-01 10:00:00", "b", 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: cross-batch dup dropped within horizon") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val out = StatefulOps.dedupWithinWatermark(
      in.toDF().toDF("ts", "content"), "ts", "10 minutes", "content")
    val q = out.writeStream.format("memory").queryName("wmdedup")
      .outputMode("append").start()
    try {
      in.addData((ts("2024-01-01 10:00:00"), "x"), (ts("2024-01-01 10:00:30"), "x"))
      q.processAllAvailable() // in-batch dup collapses
      in.addData((ts("2024-01-01 10:01:00"), "x")) // cross-batch dup, within horizon
      q.processAllAvailable()
      assert(spark.table("wmdedup").count() == 1)
      // the reference's per-batch dedup would emit this row again —
      // bounded-state streaming dedup is the strict improvement (SURVEY §2.5)
    } finally q.stop()
  }

  test("session_window (batch semantics): 30-min gap splits sessions") {
    val df = Seq(
      (ts("2024-01-01 10:00:00"), "u1"), (ts("2024-01-01 10:10:00"), "u1"),
      (ts("2024-01-01 11:30:00"), "u1"), // > 30 min gap → new session
      (ts("2024-01-01 10:05:00"), "u2"),
    ).toDF("ts", "user")
    val sessions = df.groupBy(session_window($"ts", "30 minutes"), $"user")
      .agg(count(lit(1)).as("n"))
    val rows = sessions.select($"user", $"n").as[(String, Long)].collect()
    assert(rows.count(_._1 == "u1") == 2)
    assert(rows.filter(_._1 == "u1").map(_._2).sorted.toSeq == Seq(1L, 2L))
    assert(rows.count(_._1 == "u2") == 1)
  }

  test("flatMapGroupsWithState sessionizer: closes on event-time gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StatefulOps.Event]
    val out = StatefulOps.sessionize(in.toDS(), gapMs = 60000L)
    val q = out.writeStream.format("memory").queryName("fmgs")
      .outputMode("append").start()
    try {
      in.addData(StatefulOps.Event("u1", ts("2024-01-01 10:00:00")),
        StatefulOps.Event("u1", ts("2024-01-01 10:00:10")))
      q.processAllAvailable()
      assert(spark.table("fmgs").count() == 0) // session open, watermark at 10:00:10
      // u2 event far past u1's gap → watermark jumps past 10:01:10
      in.addData(StatefulOps.Event("u2", ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // timeout fires on the NEXT batch after the watermark advanced
      in.addData(StatefulOps.Event("u2", ts("2024-01-01 10:05:30")))
      q.processAllAvailable()
      val closed = spark.table("fmgs").as[StatefulOps.ClosedSession].collect()
      assert(closed.map(c => (c.user, c.events)).toSet == Set(("u1", 2L)))
    } finally q.stop()
  }

  test("stream-stream interval join: clicks attribute to views within " +
      "the window, per user") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(String, Timestamp)]
    val clicks = MemoryStream[(String, Timestamp)]
    val out = StatefulOps.intervalAttribution(
      views.toDF().toDF("v_user", "v_ts"),
      clicks.toDF().toDF("c_user", "c_ts"),
      within = "10 minutes")
    val q = out.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      views.addData(("u1", ts("2024-01-01 10:00:00")),
        ("u2", ts("2024-01-01 10:00:00")))
      // u1 clicks 5 min after the view (inside the window); u2 clicks 20
      // min after (outside); u3 clicks with no view at all
      clicks.addData(("u1", ts("2024-01-01 10:05:00")),
        ("u2", ts("2024-01-01 10:20:00")),
        ("u3", ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      val got = spark.table("ssjoin")
        .select($"user", $"v_ts".cast("string"), $"c_ts".cast("string"))
        .as[(String, String, String)].collect().toSet
      assert(got == Set(
        ("u1", "2024-01-01 10:00:00", "2024-01-01 10:05:00")))
      // a later u1 click matches only the view within ITS window: the
      // 10:15 click is 15 min past the 10:00 view (outside) but 3 min
      // past the buffered 10:12 view (inside) — cross-batch state works
      views.addData(("u1", ts("2024-01-01 10:12:00")))
      clicks.addData(("u1", ts("2024-01-01 10:15:00")))
      q.processAllAvailable()
      val all = spark.table("ssjoin")
        .select($"user", $"v_ts".cast("string"), $"c_ts".cast("string"))
        .as[(String, String, String)].collect().toSet
      assert(all == Set(
        ("u1", "2024-01-01 10:00:00", "2024-01-01 10:05:00"),
        ("u1", "2024-01-01 10:12:00", "2024-01-01 10:15:00")))
    } finally q.stop()
  }

  test("streaming HLL registers: sketch maintenance equals the batch " +
      "build, state bounded, duplicate ids across batches absorbed") {
    // q34's substrate (Sketches.hllRegisters) run as a streaming
    // aggregation: a pure groupBy-max, so state is the register table
    // itself — ≤ |keys| × 256 rows however long the stream runs. An exact
    // streaming COUNT(DISTINCT) would instead hold every id in state;
    // this is the streaming-safe distinct counter.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val regs = graft.operators.Sketches.hllRegisters(
      in.toDF().toDF("k", "uid"), "k", "uid")
    val q = regs.writeStream.format("memory").queryName("hllregs")
      .outputMode("complete").start()
    try {
      in.addData(("a", 1L), ("a", 2L), ("b", 1L), ("b", 7L))
      q.processAllAvailable()
      // second batch re-sends id 2 (must be absorbed — registers are a
      // DISTINCT sketch) and adds new ids
      in.addData(("a", 2L), ("a", 3L), ("b", 9L))
      q.processAllAvailable()
      val streamed = spark.table("hllregs")
        .as[(String, Long, Long)].collect().toSet
      val batch = graft.operators.Sketches.hllRegisters(
        Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 7L),
          ("a", 3L), ("b", 9L)).toDF("k", "uid"), "k", "uid")
        .as[(String, Long, Long)].collect().toSet
      assert(streamed == batch,
        "streamed registers diverge from the batch-built sketch")
      assert(streamed.size <= 2 * graft.operators.Sketches.HllRegisters)
    } finally q.stop()
  }

  test("streaming CMS cells: sketch maintenance equals the batch build, " +
      "state bounded by the 192-cell domain") {
    // d54's substrate (Sketches.cmsCells) as a streaming aggregation: a
    // pure groupBy-sum onto the fixed depth×width domain, so state is the
    // cell table itself — ≤192 rows however long the stream runs, and
    // cell-wise addition IS the sketch merge (the same property batch
    // map-side partials exploit).
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val cells = graft.operators.Sketches.cmsCells(
      in.toDF().toDF("term"), "term")
    val q = cells.writeStream.format("memory").queryName("cmscells")
      .outputMode("complete").start()
    try {
      in.addData("the", "cat", "sat", "the")
      q.processAllAvailable()
      in.addData("the", "mat", "cat")
      q.processAllAvailable()
      val streamed = spark.table("cmscells")
        .as[(Long, Long, Long)].collect().toSet
      val batch = graft.operators.Sketches.cmsCells(
        Seq("the", "cat", "sat", "the", "the", "mat", "cat").toDF("term"),
        "term").as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch,
        "streamed CMS cells diverge from the batch-built sketch")
      assert(streamed.size <=
        graft.operators.Sketches.CmsDepth * graft.operators.Sketches.CmsWidth)
      // total mass check: Σcnt per row j == total tokens seen (7)
      val perRow = spark.table("cmscells").groupBy("j").sum("cnt")
        .as[(Long, Long)].collect().toMap
      assert(perRow.values.forall(_ == 7L))
    } finally q.stop()
  }

  test("streaming quality histogram: maintenance equals the batch build, " +
      "state bounded by the 10-bin domain") {
    // d64's PSI substrate (Sketches.qualityHistogram) as a streaming
    // aggregation — the fourth bounded-state sketch next to HLL
    // (max-merge), CMS (sum-merge), and Bloom (union): a pure
    // groupBy-count onto the FIXED bin domain, so state is ≤10 rows
    // however long the ingest runs. This is the live half of a PSI
    // monitor: maintain this frame on the stream, compare against a
    // frozen baseline histogram with d64's share/term math.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Double]
    val hist = graft.operators.Sketches.qualityHistogram(
      in.toDF().toDF("q"), "q")
    val q = hist.writeStream.format("memory").queryName("qhist")
      .outputMode("complete").start()
    try {
      in.addData(0.05, 0.12, 0.95, 1.0) // 1.0 must clamp into bin 9
      q.processAllAvailable()
      in.addData(0.12, 0.55)
      q.processAllAvailable()
      val streamed = spark.table("qhist").as[(Long, Long)].collect().toSet
      val batch = graft.operators.Sketches.qualityHistogram(
        Seq(0.05, 0.12, 0.95, 1.0, 0.12, 0.55).toDF("q"), "q")
        .as[(Long, Long)].collect().toSet
      assert(streamed == batch,
        "streamed histogram diverges from the batch build")
      assert(streamed.size <= graft.operators.Sketches.QualityBins)
      assert(streamed.exists { case (bin, n) => bin == 9L && n == 2L },
        "q = 1.0 must clamp into the top bin alongside 0.95")
    } finally q.stop()
  }

  test("streaming Bloom bit table: maintenance equals the batch build, " +
      "state bounded at m, re-sent fingerprints absorbed") {
    // d56's substrate (Sketches.bloomBits) as a streaming aggregation —
    // the third bounded-state sketch next to HLL (max-merge) and CMS
    // (sum-merge): position-set union is the merge, state ≤ 2^16 rows
    // however long the ingest stream runs. The n_set counts make it a
    // counting Bloom (deletion-capable); membership reads positions only.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val fps = in.toDF().toDF("raw")
      .select(org.apache.spark.sql.functions.md5(
        org.apache.spark.sql.functions.col("raw")).as("fp"))
    val bits = graft.operators.Sketches.bloomBits(fps, "fp")
    val q = bits.writeStream.format("memory").queryName("bloombits")
      .outputMode("complete").start()
    try {
      in.addData("doc one", "doc two")
      q.processAllAvailable()
      in.addData("doc two", "doc three") // re-sent fp accumulates n_set
      q.processAllAvailable()
      val streamed = spark.table("bloombits")
        .as[(Long, Long)].collect().toSet
      val batch = graft.operators.Sketches.bloomBits(
        Seq("doc one", "doc two", "doc two", "doc three").toDF("raw")
          .select(org.apache.spark.sql.functions.md5(
            org.apache.spark.sql.functions.col("raw")).as("fp")), "fp")
        .as[(Long, Long)].collect().toSet
      assert(streamed == batch,
        "streamed bloom bits diverge from the batch-built filter")
      assert(streamed.size <= graft.operators.Sketches.BloomBits)
      // every distinct doc sets <= k positions; 3 distinct docs here
      assert(streamed.size <= 3 * graft.operators.Sketches.BloomHashes)
    } finally q.stop()
  }

  test("streaming source-token counts: maintenance equals the batch " +
      "build, state bounded by the source domain") {
    // d67's substrate (Sketches.sourceTokenCounts) as a streaming
    // aggregation — the fifth bounded-state sketch (sum-merge onto the
    // source domain): state is one row per source however long the
    // ingest runs. This is the live half of the mixture-diversity
    // monitor: maintain this frame on the stream, read entropy /
    // effective-source-count off the ≤|sources|-row table at alarm time.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val counts = graft.operators.Sketches.sourceTokenCounts(
      in.toDF().toDF("src", "n_toks"), "src", "n_toks")
    val q = counts.writeStream.format("memory").queryName("srctoks")
      .outputMode("complete").start()
    try {
      in.addData(("web", 120L), ("books", 400L), ("web", 80L))
      q.processAllAvailable()
      in.addData(("code", 50L), ("web", 100L))
      q.processAllAvailable()
      val streamed = spark.table("srctoks")
        .as[(String, Long)].collect().toSet
      val batch = graft.operators.Sketches.sourceTokenCounts(
        Seq(("web", 120L), ("books", 400L), ("web", 80L),
          ("code", 50L), ("web", 100L)).toDF("src", "n_toks"),
        "src", "n_toks").as[(String, Long)].collect().toSet
      assert(streamed == batch,
        "streamed source-token counts diverge from the batch build")
      assert(streamed.size == 3, "state must be one row per source")
      assert(streamed.contains(("web", 300L)))
    } finally q.stop()
  }

  test("streaming per-dim moments: maintenance equals the batch build, " +
      "state bounded by the dim domain") {
    // e29's substrate (Sketches.dimMoments) as a streaming aggregation —
    // the sixth bounded-state sketch (sum-merge of count/Σx/Σx² onto the
    // fixed dim domain): state is one row per dim however long the
    // embedding stream runs. The live half of a drift monitor: freeze a
    // baseline copy of this frame, and e29's z math compares two
    // ≤64-row tables at alarm time.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val moments = graft.operators.Sketches.dimMoments(
      in.toDF().toDF("pos", "x"), Seq("pos"), "x")
    val q = moments.writeStream.format("memory").queryName("dimmom")
      .outputMode("complete").start()
    try {
      in.addData((0L, 0.5), (1L, -0.25), (0L, 0.75))
      q.processAllAvailable()
      in.addData((1L, 0.125), (0L, -0.5))
      q.processAllAvailable()
      val streamed = spark.table("dimmom")
        .selectExpr("pos", "n", "cast(s as double)", "cast(ss as double)")
        .as[(Long, Long, Double, Double)].collect().toSet
      val batch = graft.operators.Sketches.dimMoments(
        Seq((0L, 0.5), (1L, -0.25), (0L, 0.75), (1L, 0.125), (0L, -0.5))
          .toDF("pos", "x"), Seq("pos"), "x")
        .selectExpr("pos", "n", "cast(s as double)", "cast(ss as double)")
        .as[(Long, Long, Double, Double)].collect().toSet
      assert(streamed == batch,
        "streamed moments diverge from the batch build")
      assert(streamed.size == 2, "state must be one row per dim")
      assert(streamed.contains((0L, 3L, 0.75, 1.0625)))
    } finally q.stop()
  }

  test("streaming Benford digit counts: maintenance equals the batch " +
      "build, state bounded by the 9-digit domain") {
    // q54's substrate (Sketches.benfordDigits) as a streaming
    // aggregation — the seventh bounded-state sketch (sum-merge onto the
    // fixed 1-9 leading-digit domain): state is ≤9 rows however long the
    // amount feed runs. The live half of a Benford ingest monitor: keep
    // this frame on the stream, evaluate q54's χ²-against-Benford alarm
    // off the 9-row table.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Double]
    val digits = graft.operators.Sketches.benfordDigits(
      in.toDF().toDF("amt"), "amt")
    val q = digits.writeStream.format("memory").queryName("benford")
      .outputMode("complete").start()
    try {
      in.addData(12.34, 19.99, 250.0, 3.5)
      q.processAllAvailable()
      in.addData(111.0, 95000.25, 1.01)
      q.processAllAvailable()
      val streamed = spark.table("benford").as[(Long, Long)].collect().toSet
      val batch = graft.operators.Sketches.benfordDigits(
        Seq(12.34, 19.99, 250.0, 3.5, 111.0, 95000.25, 1.01).toDF("amt"),
        "amt").as[(Long, Long)].collect().toSet
      assert(streamed == batch,
        "streamed Benford digits diverge from the batch build")
      assert(streamed.size <= 9, "state must stay on the 1-9 digit domain")
      assert(streamed.contains((1L, 4L)), // 12.34, 19.99, 111.0, 1.01
        "digit-1 count must fold all four leading-1 amounts")
    } finally q.stop()
  }

  test("streaming language-mix totals: maintenance equals the batch " +
      "build, state bounded by the 4-language domain") {
    // d83's substrate (Sketches.langHitTotals) as a streaming
    // aggregation — the eighth bounded-state sketch (sum-merge onto the
    // fixed language domain): state is ≤4 rows however long the text
    // feed runs. The live half of a language-mix monitor.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val totals = graft.operators.Sketches.langHitTotals(
      in.toDF().toDF("text"), "text")
    val q = totals.writeStream.format("memory").queryName("langmix")
      .outputMode("complete").start()
    try {
      in.addData("the of and", "de la el")
      q.processAllAvailable()
      in.addData("the the the", "zz yy")
      q.processAllAvailable()
      val streamed = spark.table("langmix").as[(String, Long)].collect().toSet
      val batch = graft.operators.Sketches.langHitTotals(
        Seq("the of and", "de la el", "the the the", "zz yy").toDF("text"),
        "text").as[(String, Long)].collect().toSet
      assert(streamed == batch,
        "streamed language totals diverge from the batch build")
      assert(streamed.size <= 4, "state must stay on the language domain")
      assert(streamed.contains(("en", 6L)), // the×4, of, and
        "en total must fold hits across batches")
    } finally q.stop()
  }

  test("streaming month x category counts: maintenance equals the batch " +
      "build, state one category stripe per month") {
    // q65's substrate (Sketches.categoryMonthCounts) as a streaming
    // aggregation — the ninth bounded-state sketch (sum-merge onto the
    // month × category grid): state grows one ≤|categories|-row stripe
    // per calendar month, the watermark-horizon growth. The live half
    // of the mix-drift monitor: keep this grid on the stream, evaluate
    // q65's PSI-vs-prior-month alarm off it.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(java.sql.Timestamp, String)]
    def ts(m: Int, d: Int) =
      java.sql.Timestamp.valueOf(f"2024-$m%02d-$d%02d 00:00:00")
    val counts = graft.operators.Sketches.categoryMonthCounts(
      in.toDF().toDF("d", "cat"), "d", "cat")
    val q = counts.writeStream.format("memory").queryName("mixgrid")
      .outputMode("complete").start()
    try {
      in.addData((ts(1, 5), "A"), (ts(1, 9), "B"), (ts(2, 1), "A"))
      q.processAllAvailable()
      in.addData((ts(1, 20), "A"), (ts(2, 2), "B"), (ts(2, 3), "B"))
      q.processAllAvailable()
      val streamed = spark.table("mixgrid")
        .as[(Long, String, Long)].collect().toSet
      val batch = graft.operators.Sketches.categoryMonthCounts(
        Seq((ts(1, 5), "A"), (ts(1, 9), "B"), (ts(2, 1), "A"),
          (ts(1, 20), "A"), (ts(2, 2), "B"), (ts(2, 3), "B"))
          .toDF("d", "cat"), "d", "cat")
        .as[(Long, String, Long)].collect().toSet
      assert(streamed == batch,
        "streamed month x category counts diverge from the batch build")
      // 2024-01 = month_idx 2024*12 + 1 - 1 = 24288
      assert(streamed.contains((24288L, "A", 2L)),
        "January's A stripe must fold across micro-batches")
      assert(streamed.size <= 4, "two months x two categories")
    } finally q.stop()
  }

  test("streaming ANN cell live/tombstone counts: maintenance equals the " +
      "batch build, state bounded by the cell domain") {
    // e27's compaction trigger as a streaming aggregation
    // (Sketches.cellLiveCounts) — the tenth bounded-state sketch
    // (sum-merge onto the IVF cell domain): state is one row per cell
    // however long the index mutation feed runs. e27 audits tombstone
    // pollution by rescanning the index in batch; the deployed index
    // maintains this frame on its insert/delete stream and reads
    // per-cell staleness off the bounded table at compaction time.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Boolean)] // (cell, deleted)
    val counts = graft.operators.Sketches.cellLiveCounts(
      in.toDF().toDF("cell", "deleted"), "cell", "deleted")
    val q = counts.writeStream.format("memory").queryName("cellstale")
      .outputMode("complete").start()
    try {
      in.addData((0L, false), (0L, false), (1L, false), (2L, false))
      q.processAllAvailable()
      in.addData((0L, true), (1L, false), (2L, true), (2L, true))
      q.processAllAvailable()
      val streamed = spark.table("cellstale")
        .as[(Long, Long, Long)].collect().toSet
      val batch = graft.operators.Sketches.cellLiveCounts(
        Seq((0L, false), (0L, false), (1L, false), (2L, false),
          (0L, true), (1L, false), (2L, true), (2L, true))
          .toDF("cell", "deleted"), "cell", "deleted")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch,
        "streamed cell counts diverge from the batch build")
      assert(streamed == Set((0L, 3L, 1L), (1L, 2L, 0L), (2L, 3L, 2L)),
        s"per-cell (total, tomb) must fold across micro-batches: $streamed")
      assert(streamed.size <= 3, "state must stay on the cell domain")
      // the compaction readout: staleness = n_tomb / n_total at alarm
      // time — cell 2 is 2/3 stale and crosses a 0.5 trigger, cell 1 is
      // clean
      val stale = streamed.map { case (c, n, t) => c -> t.toDouble / n }
        .toMap
      assert(stale(2L) > 0.5 && stale(1L) == 0.0)
    } finally q.stop()
  }

  test("streaming per-source gate-pass counts: maintenance equals the " +
      "batch build, state bounded by the source domain") {
    // d75's admission substrate (Sketches.gatePassCounts) as a streaming
    // aggregation — the eleventh bounded-state sketch (sum-merge onto
    // the source domain): state is one row per source however long the
    // crawl runs. The live half of the source-admission monitor: keep
    // these counts on the stream, read pass rates / Wilson bounds off
    // the bounded table whenever the admission policy re-evaluates.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Boolean)] // (source, gate verdict)
    val counts = graft.operators.Sketches.gatePassCounts(
      in.toDF().toDF("source", "pass"), "source", "pass")
    val q = counts.writeStream.format("memory").queryName("gatepass")
      .outputMode("complete").start()
    try {
      in.addData(("a", true), ("a", false), ("b", true))
      q.processAllAvailable()
      in.addData(("a", true), ("b", true), ("c", false))
      q.processAllAvailable()
      val streamed = spark.table("gatepass")
        .as[(String, Long, Long)].collect().toSet
      val batch = graft.operators.Sketches.gatePassCounts(
        Seq(("a", true), ("a", false), ("b", true), ("a", true),
          ("b", true), ("c", false)).toDF("source", "pass"),
        "source", "pass")
        .as[(String, Long, Long)].collect().toSet
      assert(streamed == batch,
        "streamed gate-pass counts diverge from the batch build")
      assert(streamed == Set(("a", 3L, 2L), ("b", 2L, 2L), ("c", 1L, 0L)),
        s"per-source (n_docs, n_pass) must fold across micro-batches: " +
          s"$streamed")
      assert(streamed.size <= 3, "state must stay on the source domain")
    } finally q.stop()
  }

  test("streaming per-source quality-bin counts: maintenance equals the " +
      "batch build, state bounded by the source x bin domain") {
    // d101's calibration substrate (Sketches.sourceQualityBins) as a
    // streaming aggregation — the twelfth bounded-state sketch
    // (sum-merge onto the source × percentile-bin domain): state is
    // ≤ |sources|·101 rows however long the crawl runs. The live half
    // of the calibration gate: batch d101 elects per-source percentile
    // thresholds from exactly this frame; the deployed gate maintains
    // it on the stream and re-elects thresholds off the bounded table
    // at policy time. Null scores drop (no signal).
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Option[Double])] // (source, score)
    val counts = graft.operators.Sketches.sourceQualityBins(
      in.toDF().toDF("source", "q"), "source", "q")
    val q = counts.writeStream.format("memory").queryName("srcqbins")
      .outputMode("complete").start()
    try {
      in.addData(("a", Some(0.42)), ("a", Some(0.429)), ("b", Some(0.99)),
        ("a", None))
      q.processAllAvailable()
      in.addData(("a", Some(0.43)), ("b", Some(1.0)), ("a", Some(0.0)))
      q.processAllAvailable()
      val streamed = spark.table("srcqbins")
        .as[(String, Long, Long)].collect().toSet
      val batch = graft.operators.Sketches.sourceQualityBins(
        Seq(("a", Some(0.42)), ("a", Some(0.429)), ("b", Some(0.99)),
          ("a", None), ("a", Some(0.43)), ("b", Some(1.0)),
          ("a", Some(0.0)))
          .toDF("source", "q"), "source", "q")
        .as[(String, Long, Long)].collect().toSet
      assert(streamed == batch,
        "streamed source-quality bins diverge from the batch build")
      // floor(q·100): 0.42 and 0.429 share bin 42, 0.43 is bin 43,
      // score 1.0 lands in bin 100 (the top edge the domain includes),
      // null carries no row.
      assert(streamed == Set(("a", 42L, 2L), ("a", 43L, 1L),
        ("a", 0L, 1L), ("b", 99L, 1L), ("b", 100L, 1L)),
        s"per-(source, bin) counts must fold across micro-batches: " +
          s"$streamed")
      assert(streamed.size <= 5, "state must stay on the source x bin grid")
    } finally q.stop()
  }

  test("streaming aspect-bucket counts: maintenance equals the batch " +
      "build, state bounded by the 5-bucket domain") {
    // m20's batch-shape substrate (Sketches.aspectBucketCounts) as a
    // streaming aggregation — the thirteenth bounded-state sketch
    // (sum-merge onto the fixed aspect-bucket domain): the argmin
    // election is a SCALAR array_min (a rank window couldn't run inside
    // a streaming agg), so state is ≤5 rows however long the media
    // ingest runs. The live half of the m20 batching policy: maintain
    // populations on the stream, re-check bucket balance off the
    // bounded table. Null/zero geometry drops.
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Long)] // (width, height)
    val counts = graft.operators.Sketches.aspectBucketCounts(
      in.toDF().toDF("width", "height"), "width", "height")
    val q = counts.writeStream.format("memory").queryName("aspectbuckets")
      .outputMode("complete").start()
    try {
      // 64×64 → bucket 0 exactly; 120×64 (1.875) → bucket 3 (2.0);
      // 64×120 → bucket 4; 0-height row drops
      in.addData((64L, 64L), (120L, 64L), (64L, 64L), (64L, 0L))
      q.processAllAvailable()
      in.addData((64L, 120L), (120L, 64L))
      q.processAllAvailable()
      val streamed = spark.table("aspectbuckets")
        .as[(Long, Long)].collect().toSet
      val batch = graft.operators.Sketches.aspectBucketCounts(
        Seq((64L, 64L), (120L, 64L), (64L, 64L), (64L, 0L),
          (64L, 120L), (120L, 64L)).toDF("width", "height"),
        "width", "height")
        .as[(Long, Long)].collect().toSet
      assert(streamed == batch,
        "streamed bucket counts diverge from the batch build")
      assert(streamed == Set((0L, 2L), (3L, 2L), (4L, 1L)),
        s"bucket populations must fold across micro-batches: $streamed")
      assert(streamed.size <= 5, "state must stay on the bucket domain")
    } finally q.stop()
  }
}
