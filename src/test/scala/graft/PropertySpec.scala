package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.TextFunctions
import graft.operators.TweetPipeline

/** Property-based invariants (SURVEY.md §5.2) — ScalaCheck generators
  * drive Spark through the public operator surface. Samples are drawn
  * from fixed seeds so failures are reproducible. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  // tweet-ish text: words (some accented/stopwords), URLs, mentions, messy
  // whitespace
  private val wordGen: Gen[String] = Gen.oneOf(
    "la", "marcha", "más", "grande", "de", "chile", "también", "él",
    "fuerza", "HOY", "Que", "viva", "x123", "qué", "a_b")
  private val tokenGen: Gen[String] = Gen.frequency(
    8 -> wordGen,
    1 -> Gen.const("https://t.co/abc123"),
    1 -> Gen.const("@usuario"),
    1 -> Gen.const("ftp://files.example.com/x"))
  private val wsGen: Gen[String] = Gen.oneOf(" ", "  ", "\t", " \n ")
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 12)
    toks <- Gen.listOfN(n, tokenGen)
    seps <- Gen.listOfN(n + 1, wsGen)
  } yield seps.zipAll(toks, " ", "").map { case (s, t) => s + t }.mkString

  test("property: cleanText is idempotent") {
    val texts = samples(textGen, 150)
    val once = texts.toDF("t")
      .select(TextFunctions.cleanText($"t").as("c")).as[String].collect()
    val twice = once.toSeq.toDF("t")
      .select(TextFunctions.cleanText($"t").as("c")).as[String].collect()
    assert(once.toSeq == twice.toSeq)
  }

  test("property: cleaned output is squished (no edge/double whitespace)") {
    val cleaned = samples(textGen, 150).toDF("t")
      .select(TextFunctions.cleanText($"t").as("c")).as[String].collect()
    cleaned.foreach { s =>
      assert(s == s.trim, s"edge whitespace in '$s'")
      assert(!s.exists(c => c.isWhitespace && c != ' '), s"non-space ws in '$s'")
      assert(!s.contains("  "), s"double space in '$s'")
    }
  }

  test("property: fingerprint is whitespace/case-normalization invariant") {
    val texts = samples(textGen, 60).filter(_.trim.nonEmpty)
    val variants = texts.flatMap(t => Seq(
      (t, t.toUpperCase),
      (t, "  " + t.replace(" ", "   ") + "\t")))
    val df = variants.toDF("a", "b").select(
      TextFunctions.fingerprint($"a").as("fa"),
      TextFunctions.fingerprint($"b").as("fb"))
    df.collect().foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("property: dedupKeepFirst — one survivor per key, global ord-min, null==null") {
    val keyGen = Gen.frequency(
      6 -> Gen.oneOf("k1", "k2", "k3", "k4"),
      1 -> Gen.const(null: String))
    val rowGen = for {
      k <- keyGen
      v <- Gen.choose(0L, 50L)
    } yield (k, v)
    (1 to 3).foreach { seed =>
      val rows = (1 to 400).flatMap(i =>
        rowGen.apply(Gen.Parameters.default, Seed(seed * 1000L + i)))
      val df = rows.toDF("content", "v").repartition(7)
      val out = TweetPipeline.dedupKeepFirst(df, "content")
        .as[(String, Long)].collect()
      val expected = rows.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).min }
      assert(out.length == expected.size) // one row per key, null included once
      out.foreach { case (k, v) => assert(expected(k) == v,
        s"key $k: survivor $v != ord-min ${expected(k)} (seed $seed)") }
    }
  }

  test("property: native CosineSim is bit-identical to the aggregate-fold form") {
    import graft.functions.{VectorExprs, VectorFunctions}
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-5.0, 5.0))
    val pairs = samples(Gen.zip(vecGen, vecGen), 120)
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      VectorExprs.cosine($"a", $"b").as("native"),
      (VectorFunctions.dot($"a", $"b") /
        (VectorFunctions.norm($"a") * VectorFunctions.norm($"b"))).as("fold"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, f) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(f))
    }
  }

  test("property: dedupKeepFirst is partitioning-invariant") {
    val rows = samples(Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(0, 99)), 200)
    def run(parts: Int) =
      TweetPipeline.dedupKeepFirst(
        rows.toDF("content", "v").repartition(parts), "content")
        .as[(String, Int)].collect().toSet
    assert(run(1) == run(13))
  }
}
