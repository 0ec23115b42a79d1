package graft

import org.apache.spark.sql.functions._

import graft.functions.{ScrubWords, TextExprs}

/** SparkSessionExtensions surface: the native expressions as SQL functions
  * plus the CombineScrubWords optimizer rule. */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("SQL functions: scrub_words / count_words_in / simhash64") {
    val r = spark.sql(
      """SELECT scrub_words('la casa de los perros', 'de,la,los') AS s,
        |  count_words_in('la casa de los perros', 'de,la,los') AS n,
        |  simhash64('a b c') AS h""".stripMargin).head()
    assert(r.getString(0) == " casa   perros") // 3 words removed, gaps remain
    assert(r.getInt(1) == 3)
    // must equal the Scala-API expression value
    val h = Seq("a b c").toDF("t")
      .select(TextExprs.simhash64($"t")).as[Long].head()
    assert(r.getLong(2) == h)
  }

  test("SQL functions: cosine_sim / shingle_hashes / minhash_sigs") {
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
        |  size(shingle_hashes(array('a','b','c','d'))) AS nsh,
        |  size(minhash_sigs(array('a','b','c'), 4)) AS nmh""".stripMargin).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getInt(1) == 2) // 4 tokens → 2 trigram shingles
    assert(r.getInt(2) == 4)
  }

  test("SQL function: dot_product matches the fold form; null on length " +
      "mismatch") {
    val r = spark.sql(
      """SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d,
        |  dot_product(array(1.0d), array(1.0d, 2.0d)) AS mism,
        |  aggregate(zip_with(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d),
        |    (x, y) -> x * y), 0.0d, (a, x) -> a + x) AS fold""".stripMargin)
      .head()
    assert(r.getDouble(0) == 32.0 && r.getDouble(0) == r.getDouble(2))
    assert(r.isNullAt(1))
  }

  test("SQL function: min_md5_shingle matches md5 of the single shingle") {
    val r = spark.sql(
      """SELECT min_md5_shingle(array('a','b','c')) AS m, md5('a b c') AS ref,
        |  min_md5_shingle(array('a','b')) AS short""".stripMargin).head()
    assert(r.getString(0) == r.getString(1))
    assert(r.isNullAt(2)) // <3 tokens → null, same as the HOF formulation
  }

  test("SQL function: jaccard_sorted on sorted-distinct long arrays") {
    val r = spark.sql(
      """SELECT jaccard_sorted(array(1L, 2L, 3L, 4L), array(2L, 4L)) AS j,
        |  jaccard_sorted(array(1L), array(2L)) AS disjoint""".stripMargin)
      .head()
    assert(r.getDouble(0) == 0.5)
    assert(r.getDouble(1) == 0.0)
  }

  test("SQL function: winnow_fingerprints matches the Scala-API column") {
    val text = "a b c d e f g a b c"
    val sql = spark.sql(
      s"SELECT winnow_fingerprints('$text', 3, 4) AS f").head().getSeq[Long](0)
    val api = Seq(text).toDF("t")
      .select(graft.functions.WinnowExprs.winnowFingerprints($"t", 3, 4))
      .head().getSeq[Long](0)
    assert(sql == api)
    assert(sql.nonEmpty)
  }

  test("scrub_words SQL rejects a non-literal word list") {
    val e = intercept[Exception] {
      spark.sql("SELECT scrub_words('x', concat('a', rand())) ").collect()
    }
    assert(e.getMessage.contains("word list") ||
      e.getCause != null && e.getCause.getMessage.contains("word list"))
  }

  test("CombineScrubWords fuses nested scrubs and preserves semantics") {
    // file-backed source: a LocalRelation would be pre-evaluated by
    // ConvertToLocalRelation before the plan can be inspected
    val df = graft.sources.Tables.documents(spark, sfDir)
      .limit(1).select($"text".as("t"))
    // rule fires: optimized plan contains exactly one ScrubWords
    val scrubs = nested.queryExecution.optimizedPlan
      .flatMap(_.expressions.flatMap(_.collect { case s: ScrubWords => s }))
    assert(scrubs.size == 1, s"expected fused scrub, got $scrubs")
    assert(scrubs.head.words.toSet == Set("de", "la", "el", "y"))
    // and the result equals the one-set form
    val direct = df.select(
      TextExprs.scrubWords($"t", Seq("de", "la", "el", "y")).as("s"))
    assert(nested.as[String].head() == direct.as[String].head())
  }

  private lazy val nested = {
    val df = graft.sources.Tables.documents(spark, sfDir)
      .limit(1).select($"text".as("t"))
    df.select(TextExprs.scrubWords(
      TextExprs.scrubWords($"t", Seq("de", "la")), Seq("el", "y")).as("s"))
  }
}
