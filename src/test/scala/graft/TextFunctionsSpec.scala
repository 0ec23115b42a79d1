package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def cleanOne(s: String): String =
    Seq(s).toDF("t").select(TextFunctions.cleanText($"t")).as[String].head()

  test("T1 lowercase") {
    assert(cleanOne("HOLA Mundo") == "hola mundo")
  }

  test("T2 URL strip (reference pattern main.R:99)") {
    assert(cleanOne("mira esto https://t.co/abc123 increible") == "mira increible")
    assert(cleanOne("ftp://files.example.com/x listo") == "listo")
  }

  test("T3 mention strip") {
    assert(cleanOne("hola @pinera chao") == "hola chao")
  }

  test("T4 accented Spanish stopwords removed ((?U) word boundaries)") {
    // él, más, también are in the Snowball list — the regex dialect trap
    assert(cleanOne("también él dijo vamos por más fuerza") == "dijo vamos fuerza")
  }

  test("T4 stopwords only match whole words") {
    // "la" is a stopword but "lado" / "chile" must survive
    assert(cleanOne("la lado chile") == "lado chile")
  }

  test("T5 squish: trim + collapse runs") {
    assert(cleanOne("  hola    mundo  ") == "hola mundo")
  }

  test("clean is idempotent") {
    val texts = Seq(
      "La marcha MÁS grande https://t.co/x @user también   aquí",
      "", "   ", "sin cambios")
    val once = texts.toDF("t").select(TextFunctions.cleanText($"t").as("c")).as[String].collect()
    val twice = once.toSeq.toDF("t").select(TextFunctions.cleanText($"t").as("c")).as[String].collect()
    assert(once.toSeq == twice.toSeq)
  }

  test("null propagates") {
    val r = Seq[Option[String]](None).toDF("t")
      .select(TextFunctions.cleanText($"t")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("tokenCount: empty and blank strings are 0") {
    val df = Seq("", "   ", "one two  three").toDF("t")
      .select(TextFunctions.tokenCount($"t").as("n")).as[Int].collect()
    assert(df.toSeq == Seq(0, 0, 3))
  }

  test("bpeish token count splits words/digits/punct") {
    val n = Seq("hola, mundo 42!").toDF("t")
      .select(TextFunctions.bpeishTokenCount($"t")).as[Int].head()
    assert(n == 5) // hola , mundo 42 !
  }

  test("fingerprint is normalization-invariant") {
    val fps = Seq("Hola  Mundo", "hola mundo", "  HOLA MUNDO  ").toDF("t")
      .select(TextFunctions.fingerprint($"t")).as[String].collect()
    assert(fps.distinct.length == 1)
  }

  test("langId picks dominant marker language") {
    val df = Seq(
      "the cat is on the mat and it is happy",
      "la casa de la madre es grande y el perro",
      "zzzz qqqq xxxx").toDF("t")
      .select(TextFunctions.langId($"t").as("l")).as[String].collect()
    assert(df.toSeq == Seq("en", "es", "und"))
  }

  test("qualityScore in [0,1] and penalizes punctuation soup") {
    val rows = Seq(
      "A reasonable length sentence about data engineering and query plans.",
      "!!!###$$$%%%^^^&&&***((()))").toDF("t")
      .select(TextFunctions.qualityScore($"t").as("q")).as[Double].collect()
    assert(rows.forall(q => q >= 0.0 && q <= 1.0))
    assert(rows(0) > rows(1))
  }

  test("stopword list loads fully") {
    assert(TextFunctions.spanishStopwords.size > 300)
    assert(TextFunctions.spanishStopwords.contains("él"))
  }
}
