package graft

import graft.operators.TweetPipeline
import graft.sources.TweetSource
import org.apache.spark.sql.functions._

class TweetPipelineSpec extends SparkSpec {
  import spark.implicits._

  lazy val raw = TweetSource.read(spark, fixture("stream_basic.json"))
  lazy val out = TweetPipeline.transform(raw).orderBy("date_created").cache()

  test("F1: retweets, non-es, null-lang rows dropped") {
    val users = out.select("user").as[String].collect().toSet
    assert(!users.contains("bob"))   // lang=en
    assert(!users.contains("carla")) // is_retweet
    assert(!users.contains("dani"))  // lang null → NA predicate drops
  }

  test("P1: exactly the 7 sink columns, renamed") {
    assert(out.columns.toSeq == Seq(
      "date_created", "user", "content", "source", "location",
      "quoted_user", "quoted_content"))
  }

  test("P1: created_at parsed to timestamp") {
    val ts = out.filter($"user" === "ana").select($"date_created".cast("string")).as[String].head()
    assert(ts == "2019-10-23 03:15:02")
  }

  test("T1-T5 applied to content: url/mention/stopwords gone, squished") {
    val c = out.filter($"user" === "ana").select("content").as[String].head()
    assert(c == "marcha grande chile #chile")
  }

  test("P2 applied to quoted_content too") {
    val qc = out.filter($"user" === "fede").select("quoted_content").as[String].head()
    assert(qc == "histórico seguimos")
  }

  test("D1: keep-first dedup on cleaned content") {
    // ana and eva clean to the same content; ana (earlier) survives
    val survivors = out.select("user").as[String].collect().toSet
    assert(survivors.contains("ana") && !survivors.contains("eva"))
  }

  test("corrupt/blank lines don't produce rows") {
    // fixture has an empty line; filter on is_retweet drops the all-null row
    assert(out.count() == 3) // ana, fede, hugo
  }

  test("P1: malformed created_at yields NULL date_created, never a task " +
      "failure (ANSI to_timestamp throws; try_to_timestamp is the lubridate-" +
      "NA parity)") {
    import org.apache.spark.sql.Row
    val row = spark.createDataFrame(
      java.util.List.of(Row("not a real timestamp", "zoe", "hola mundo",
        "s", null, null, null, java.lang.Boolean.FALSE, "es", null)),
      TweetSource.rawSchema)
    val r = TweetPipeline.transform(row).collect()
    assert(r.length == 1 && r.head.isNullAt(0))
  }

  test("S4: empty input short-circuits to empty output") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], TweetSource.rawSchema)
    assert(TweetPipeline.transform(empty).isEmpty)
  }

  test("plan quality: two bounded shuffles, pushed filters, partial dedup before exchange") {
    val df = TweetPipeline.transform(raw)
    df.collect() // finalize the adaptive plan
    // AQE toString repeats the initial plan below the final one — keep final only
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // stage-1 exchange on (content, salt) over the full input; stage-2
    // exchange on content over per-salt winners only (≈ distinct keys).
    // F1/P1/P2 stay narrow — no other exchange may appear.
    assert("Exchange".r.findAllIn(plan).size == 2, s"expected 2 exchanges:\n$plan")
    // both filter conjuncts reach the JSON scan
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(lang,es)"))
    // map-side keep-first (WindowGroupLimit Partial) bounds shuffle volume
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"))
  }

  test("D1: dedup output is stable under input row/partition reordering") {
    val base = TweetPipeline.clean(TweetPipeline.filterProject(raw))
    val shuffled = base.orderBy($"user".desc).repartition(7)
    val a = TweetPipeline.dedupKeepFirst(base).collect().toSet
    val b = TweetPipeline.dedupKeepFirst(shuffled).collect().toSet
    assert(a == b)
  }

  test("D1: null key — exactly one survivor, picked by data order") {
    val df = Seq(
      (null.asInstanceOf[String], "2020-01-02", "u2"),
      (null.asInstanceOf[String], "2020-01-01", "u1"),
      ("x", "2020-01-03", "u3"),
    ).toDF("content", "date_created", "user")
    val out = TweetPipeline.dedupKeepFirst(df).collect()
    assert(out.length == 2)
    val nullRow = out.find(_.isNullAt(0)).get
    assert(nullRow.getString(2) == "u1") // earliest (date, user) wins
  }
}
