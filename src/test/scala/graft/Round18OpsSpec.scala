package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-18 additions: semantic anchors on constructed datasets for the
  * forensic-stats (q54-q57), dedup-audit (d74-d78), embedding-health
  * (e30/e31), and media-budget (m13/m14) queries — closed-form inputs
  * whose expected outputs are hand-computable, independent of the
  * fixture corpus (the fixture side is pinned by the DuckDB oracles). */
class Round18OpsSpec extends SparkSpec {
  import spark.implicits._

  private def query(name: String) =
    graft.queries.GraftQuery.all.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))

  /** Constructed orders table: (orderkey, custkey, totalprice, day
    * offset from 2024-01-01). */
  private def ordersDir(rows: Seq[(Long, Long, Double, Int)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-r18o").toString
    val schema = Tables.orders(spark, sfDir).schema
    val base = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    val isNtz = schema("o_orderdate").dataType ==
      org.apache.spark.sql.types.TimestampNTZType
    val rws = rows.map { case (ok, ck, price, off) =>
      val ts: Any =
        if (isNtz) base.plusDays(off.toLong)
        else java.sql.Timestamp.valueOf(base.plusDays(off.toLong))
      Row(ok, ck, "F", price, ts, "1-URGENT")
    }
    spark.createDataFrame(rws.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  /** Constructed documents table in `dir` (doc_id, text, lang, source). */
  private def docsDir(rows: Seq[(Long, String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-r18d").toString
    val schema = Tables.documents(spark, sfDir).schema
    val rws = rows.map { case (id, text, lang, src) =>
      Row(id, text, lang, src, text.length.toLong)
    }
    spark.createDataFrame(rws.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q54 Benford: digit counts, the log10 expectation row, and a " +
      "shared chi-square") {
    // Digits {1:1, 2:2, 3:1} over 4 orders; benford_share(1) = log10(2).
    val dir = ordersDir(Seq(
      (1L, 1L, 111.00, 0), (2L, 1L, 222.00, 0),
      (3L, 1L, 29.99, 0), (4L, 1L, 3.50, 0)))
    val got = query("q54_benford_digits").run(spark, dir).collect()
      .map(r => r.getAs[Long]("digit") -> r).toMap
    // the FULL 1-9 domain must be present: an absent digit is the
    // loudest Benford violation and owes its (0-E)^2/E term
    assert(got.keySet == (1L to 9L).toSet)
    assert(got(1L).getAs[Long]("n_orders") == 1L)
    assert(got(2L).getAs[Long]("n_orders") == 2L)
    assert(got(2L).getAs[Double]("share") == 0.5)
    assert((4L to 9L).forall(d => got(d).getAs[Long]("n_orders") == 0L))
    // a zero-observation digit contributes exactly its expectation
    // (0 - E)^2 / E = E = total * benford_share
    assert(math.abs(got(9L).getAs[Double]("chi2_term")
      - 4.0 * got(9L).getAs[Double]("benford_share")) < 1e-5)
    assert(math.abs(got(1L).getAs[Double]("benford_share")
      - math.log10(2.0)) < 1e-6)
    val chi2s = got.values.map(_.getAs[Double]("chi2")).toSet
    assert(chi2s.size == 1 && chi2s.head > 0.0,
      "chi2 must be one shared positive scalar")
  }

  test("q55 CUSUM peaks exactly at a constructed level shift") {
    // 10 days at 100 then 10 days at 200 (mean 150): CUSUM after k low
    // days is -50k — the unique |peak| of 500 sits on day 10, the last
    // day of the old level.
    val dir = ordersDir(
      (0 until 10).map(i => (i.toLong, 1L, 100.0, i)) ++
      (10 until 20).map(i => (i.toLong, 1L, 200.0, i)))
    val got = query("q55_cusum_changepoint").run(spark, dir).collect()
    assert(got.length == 20)
    val peaks = got.filter(_.getAs[Int]("is_peak") == 1)
    assert(peaks.length == 1, "the constructed shift has a unique peak")
    assert(peaks.head.getAs[String]("order_date") == "2024-01-10")
    assert(peaks.head.getAs[Double]("cusum") == -500.0)
  }

  test("q56 survival: closed forms on a two-gap ledger") {
    // One customer, orders on days 0/3/21: gaps 3 d (week 0) and 18 d
    // (week 2). S(0) = 1/2, S(2) = 0; hazards 1/2 and 1.
    val dir = ordersDir(Seq(
      (1L, 7L, 100.0, 0), (2L, 7L, 100.0, 3), (3L, 7L, 100.0, 21)))
    val got = query("q56_order_gap_survival").run(spark, dir).collect()
      .map(r => r.getAs[Long]("wk") -> r).toMap
    assert(got.keySet == Set(0L, 2L))
    assert(got(0L).getAs[Long]("n_events") == 1L)
    assert(got(0L).getAs[Long]("n_at_risk") == 2L)
    assert(got(0L).getAs[Double]("hazard") == 0.5)
    assert(got(0L).getAs[Double]("survival") == 0.5)
    assert(got(2L).getAs[Double]("hazard") == 1.0)
    assert(got(2L).getAs[Double]("survival") == 0.0)
  }

  test("q57 Theil is exactly 0 for equal spenders") {
    val dir = ordersDir(Seq(
      (1L, 1L, 100.0, 0), (2L, 2L, 100.0, 0), (3L, 3L, 100.0, 0)))
    val custSchema = Tables.customer(spark, sfDir).schema
    val natSchema = Tables.nation(spark, sfDir).schema
    spark.createDataFrame(
      (1 to 3).map(i => Row(i.toLong, s"c$i", 0, 0.0, "SEG")).asJava,
      custSchema).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    spark.createDataFrame(Seq(Row(0, "AAA", 0)).asJava, natSchema)
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val got = query("q57_theil_index").run(spark, dir).collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("n_name") == "AAA")
    assert(got.head.getAs[Long]("n_customers") == 3L)
    assert(got.head.getAs[Double]("mean_spend") == 100.0)
    assert(got.head.getAs[Double]("theil") == 0.0)
  }

  test("d74 bag-of-words dedup catches a token reorder that exact " +
      "fingerprinting misses") {
    val dir = docsDir(Seq(
      (1L, "alpha beta gamma", "en", "s1"),
      (2L, "gamma beta alpha", "en", "s1"), // reorder of 1
      (3L, "alpha beta gamma", "en", "s1"), // exact dup of 1
      (4L, "delta eps", "en", "s1")))
    val got = query("d74_bow_fingerprint_dedup").run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Long]("group_n") == 3L)
    assert(got(1L).getAs[Int]("kept") == 1)
    assert(got(2L).getAs[Int]("kept") == 0)
    assert(got(3L).getAs[Int]("kept") == 0)
    // docs 1/3 share the exact group (n=2) inside a bag group of 3; doc 2
    // is the reorder the bag canonicalization uniquely catches
    assert(Seq(1L, 2L, 3L).forall(got(_).getAs[Int]("reorder_caught") == 1))
    assert(got(4L).getAs[Long]("group_n") == 1L)
    assert(got(4L).getAs[Int]("reorder_caught") == 0)
  }

  test("d75 Wilson ranking: big-n evidence outranks a perfect tiny source") {
    // A: 2/2 pass (raw rate 1.0, Wilson lb ≈ 0.342); B: 49/50 (raw 0.98,
    // lb ≈ 0.894) — the ranking must invert the raw-rate order.
    val pass = ("word " * 30).trim // 149 lowercase chars → quality 0.745
    val fail = "xy"                // len 2 → quality ≈ 0.01
    val rows =
      Seq((1L, pass, "en", "srcA"), (2L, pass, "en", "srcA")) ++
      (10L until 59L).map(i => (i, pass, "en", "srcB")) :+
      (59L, fail, "en", "srcB")
    val got = query("d75_source_quality_wilson").run(spark, docsDir(rows))
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(got("srcA").getAs[Double]("pass_rate") == 1.0)
    assert(got("srcB").getAs[Double]("pass_rate") == 0.98)
    assert(got("srcB").getAs[Double]("wilson_lb")
      > got("srcA").getAs[Double]("wilson_lb"))
    assert(got("srcB").getAs[Long]("admission_rank") == 1L)
    assert(got("srcA").getAs[Long]("admission_rank") == 2L)
  }

  test("d76 confusion matrix: diagonal row_share is recall, col_share " +
      "is precision") {
    // 3 en-labeled docs predicted en; 1 fr-labeled doc whose text is
    // English → cell (fr, en). Recall(en) = 1.0; precision(en) = 3/4.
    val enText = "the of and to in"
    val dir = docsDir(Seq(
      (1L, enText, "en", "s1"), (2L, enText, "en", "s1"),
      (3L, enText, "en", "s1"), (4L, enText, "fr", "s1")))
    val got = query("d76_lang_confusion").run(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("lang_pred")) -> r)
      .toMap
    assert(got.keySet == Set(("en", "en"), ("fr", "en")))
    assert(got(("en", "en")).getAs[Long]("n_docs") == 3L)
    assert(got(("en", "en")).getAs[Double]("row_share") == 1.0)
    assert(got(("en", "en")).getAs[Double]("col_share") == 0.75)
    assert(got(("fr", "en")).getAs[Double]("row_share") == 1.0)
    assert(got(("fr", "en")).getAs[Double]("col_share") == 0.25)
  }

  test("d77 bias audit: an all-unique corpus keeps everything and NULLs " +
      "the dropped side") {
    val dir = docsDir(Seq(
      (1L, "one unique doc here", "en", "s1"),
      (2L, "another very different text", "en", "s1"),
      (3L, "third completely distinct words", "en", "s2")))
    val got = query("d77_dedup_bias_audit").run(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(got("s1").getAs[Long]("n_kept") == 2L)
    assert(got("s1").getAs[Long]("n_dropped") == 0L)
    assert(got("s1").isNullAt(got("s1").fieldIndex("mean_dropped_q")))
    assert(got("s1").isNullAt(got("s1").fieldIndex("quality_delta")))
    assert(!got("s1").isNullAt(got("s1").fieldIndex("mean_kept_q")))
  }

  test("d78 vocab growth: new terms attribute to their FIRST chunk only") {
    // ids 0-19 → chunk = id div 2. Docs 0-9 say "aa bb", 10-19 say
    // "aa bb cc dd": chunk 0 coins {aa, bb}, chunk 5 coins {cc, dd}.
    val rows = (0L until 10L).map(i => (i, "aa bb", "en", "s1")) ++
      (10L until 20L).map(i => (i, "aa bb cc dd", "en", "s1"))
    val got = query("d78_vocab_growth").run(spark, docsDir(rows)).collect()
      .map(r => r.getAs[Long]("chunk") -> r).toMap
    assert(got.size == 10)
    assert(got(0L).getAs[Long]("new_terms") == 2L)
    assert(got(5L).getAs[Long]("new_terms") == 2L)
    assert((1L to 4L).forall(got(_).getAs[Long]("new_terms") == 0L))
    assert(got(9L).getAs[Long]("cum_vocab") == 4L)
    assert(got(9L).getAs[Long]("cum_tokens") == 60L)
    assert(got(4L).getAs[Long]("cum_tokens") == 20L)
    val betas = got.values.map(_.getAs[Double]("heaps_beta")).toSet
    assert(betas.size == 1, "one corpus-wide Heaps beta")
  }

  /** Constructed embeddings dir: `n` copies of the all-ones 64-dim
    * vector (every pairwise cosine is exactly 1.0). */
  private def onesEmbDir(n: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-r18e").toString
    val schema = Tables.embeddings(spark, sfDir).schema
    val ones = Seq.fill(Tables.EmbeddingDim)(1.0f)
    spark.createDataFrame(
      (0 until n).map(i => Row(i.toLong, ones, i % 3)).asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("e30 isotropy histogram: identical vectors land every pair in the " +
      "top bin at cosine exactly 1") {
    // 100 ids × offsets {1,7,49} → 99 + 93 + 51 = 243 pairs, all cos 1.0.
    val got = query("e30_pair_cos_histogram").run(spark, onesEmbDir(100))
      .collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("bin") == 19L)
    assert(got.head.getAs[Long]("n_pairs") == 243L)
    assert(got.head.getAs[Double]("share") == 1.0)
    assert(got.head.getAs[Double]("mean_cos") == 1.0)
  }

  test("e31 hubness: on an all-ties corpus the id tiebreak makes the " +
      "lowest ids the hubs") {
    // 100 identical vectors → 5 probes (ids 0,20,40,60,80), each probe's
    // top-10 = the 10 smallest non-self ids. Only ids 0-10 are ever
    // retrieved (11 hubs, an extreme concentration); ids 1-9 hit all 5
    // lists, id 0 misses only probe 0's own.
    val got = query("e31_hubness_audit").run(spark, onesEmbDir(100))
      .collect().map(r => r.getAs[Long]("vec_id") -> r).toMap
    assert(got.size == 11, "the tie corpus concentrates ALL hits on 11 ids")
    assert(got(1L).getAs[Long]("n_hits") == 5L)
    assert(got(1L).getAs[Long]("hub_rank") == 1L)
    assert(got(0L).getAs[Long]("n_hits") == 4L)
    assert(got.values.map(_.getAs[Long]("n_hits")).sum == 50L)
    assert(math.abs(got.values.map(_.getAs[Double]("hit_share")).sum
      - 1.0) < 1e-5, "11 hubs absorb every one of the 50 retrievals")
  }

  test("e32 bucket balance: a degenerate one-orthant corpus is ONE " +
      "bucket at imbalance exactly 1") {
    // 100 identical all-positive vectors hash to a single sign bucket:
    // the histogram is one row (size 100 → log2 bin 6), and max/mean
    // imbalance collapses to 1.0 — the audit's lower bound.
    val got = query("e32_bucket_balance").run(spark, onesEmbDir(100))
      .collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("size_log2") == 6L)
    assert(got.head.getAs[Long]("n_buckets") == 1L)
    assert(got.head.getAs[Long]("n_vectors") == 100L)
    assert(got.head.getAs[Double]("vector_share") == 1.0)
    assert(got.head.getAs[Long]("max_size") == 100L)
    assert(got.head.getAs[Double]("imbalance") == 1.0)
  }

  test("q58 new vs returning: a customer's first month is new, the next " +
      "is returning") {
    // Cust 1 orders in Jan and Feb 2024; cust 2 only in Feb: Jan = 1
    // active/1 new, Feb = 2 active / 1 new / 1 returning.
    val dir = ordersDir(Seq(
      (1L, 1L, 100.0, 0),   // Jan 2024
      (2L, 1L, 100.0, 40),  // Feb 2024
      (3L, 2L, 100.0, 41))) // Feb 2024
    val got = query("q58_new_vs_returning").run(spark, dir).collect()
      .map(r => r.getAs[Long]("month_idx") -> r).toMap
    val jan = 2024L * 12
    assert(got.keySet == Set(jan, jan + 1))
    assert(got(jan).getAs[Long]("n_active") == 1L)
    assert(got(jan).getAs[Long]("n_new") == 1L)
    assert(got(jan + 1).getAs[Long]("n_active") == 2L)
    assert(got(jan + 1).getAs[Long]("n_new") == 1L)
    assert(got(jan + 1).getAs[Long]("n_returning") == 1L)
    assert(got(jan + 1).getAs[Double]("new_share") == 0.5)
  }

  test("d79 boilerplate: a chunk shared by every doc of a source tops " +
      "its worklist at full coverage") {
    val banner = (1 to 10).map(i => s"b$i").mkString(" ")
    val dir = docsDir(Seq(
      (1L, banner + " " + (1 to 10).map(i => s"x$i").mkString(" "), "en", "s1"),
      (2L, banner + " " + (1 to 10).map(i => s"y$i").mkString(" "), "en", "s1"),
      (3L, banner + " " + (1 to 10).map(i => s"z$i").mkString(" "), "en", "s1")))
    val got = query("d79_boilerplate_chunks").run(spark, dir).collect()
    val top = got.filter(_.getAs[Long]("rank") == 1L)
    assert(top.length == 1)
    assert(top.head.getAs[String]("source") == "s1")
    assert(top.head.getAs[Long]("n_docs") == 3L)
    assert(top.head.getAs[Double]("doc_coverage") == 1.0)
    // the tails are unique chunks — every other row covers exactly 1 doc
    assert(got.filter(_.getAs[Long]("rank") > 1L)
      .forall(_.getAs[Long]("n_docs") == 1L))
  }

  test("q59 robust outliers: a lone spike is flagged, normal days are not") {
    // Nine days drifting 100..108 plus one 1000-spike: median 104.5,
    // MAD 2.5 → the spike's robust z ≈ 241.6; every normal day |z| < 2.
    val dir = ordersDir(
      (0 until 9).map(i => (i.toLong, 1L, 100.0 + i, i)) :+
      (9L, 1L, 1000.0, 9))
    val got = query("q59_daily_robust_outliers").run(spark, dir).collect()
    val outliers = got.filter(_.getAs[Int]("is_outlier") == 1)
    assert(outliers.length == 1)
    assert(outliers.head.getAs[String]("order_date") == "2024-01-10")
    assert(outliers.head.getAs[Double]("robust_z") > 200.0)
    assert(got.head.getAs[Double]("median_rev") == 104.5)
    assert(got.filter(_.getAs[Int]("is_outlier") == 0)
      .forall(r => math.abs(r.getAs[Double]("robust_z")) < 2.0))
  }

  test("q59 NULL-guards the z when MAD is zero (constant series)") {
    val dir = ordersDir((0 until 5).map(i => (i.toLong, 1L, 100.0, i)))
    val got = query("q59_daily_robust_outliers").run(spark, dir).collect()
    assert(got.forall(_.isNullAt(got.head.fieldIndex("robust_z"))))
    assert(got.forall(_.getAs[Int]("is_outlier") == 0))
  }

  test("d81 code-switch: pure docs score purity 1, a 50/50 mix flags " +
      "with entropy ln 2") {
    val dir = docsDir(Seq(
      (1L, "the of and to in", "en", "s1"),               // pure en
      // 5 en + 5 es markers, chosen OUTSIDE the fr/de lists ("que" is
      // in both the es and fr marker sets and would double-count)
      (2L, "the of and to in de la el los por", "en", "s1"),
      (3L, "zz yy xx", "en", "s1")))                      // no markers
    val got = query("d81_code_switch").run(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Double]("purity") == 1.0)
    assert(got(1L).getAs[Double]("mix_entropy") == 0.0)
    assert(got(1L).getAs[Int]("is_mixed") == 0)
    assert(got(2L).getAs[Long]("n_hits") == 10L)
    assert(got(2L).getAs[Double]("purity") == 0.5)
    assert(math.abs(got(2L).getAs[Double]("mix_entropy")
      - math.log(2.0)) < 1e-5)
    assert(got(2L).getAs[Int]("is_mixed") == 1)
    assert(got(3L).isNullAt(got(3L).fieldIndex("purity")))
    assert(got(3L).getAs[Int]("is_mixed") == 0)
  }

  test("d82 threshold sweep: kept counts are a reverse-cumulative of the " +
      "quality bins") {
    // Four 149-char clean docs (quality 0.745 → bin 7) + one junk doc
    // (bin 0): the t=0.7 cut keeps 4/5, the t=0.0 cut keeps everything.
    val pass = ("word " * 30).trim
    val dir = docsDir(
      (1L to 4L).map(i => (i, pass, "en", "s1")) :+
      (5L, "xy", "en", "s1"))
    val got = query("d82_gate_threshold_sweep").run(spark, dir).collect()
      .map(r => r.getAs[Double]("threshold") -> r).toMap
    assert(got.keySet == Set(0.0, 0.7))
    assert(got(0.7).getAs[Long]("n_kept") == 4L)
    assert(got(0.7).getAs[Double]("kept_frac") == 0.8)
    assert(got(0.0).getAs[Long]("n_kept") == 5L)
    assert(got(0.0).getAs[Double]("kept_frac") == 1.0)
    assert(got(0.7).getAs[Double]("mean_quality_kept") == 0.745)
  }

  test("d83 language-mix totals: hits land per language and shares sum " +
      "to one") {
    val dir = docsDir(Seq(
      (1L, "the of and to in", "en", "s1"),  // 5 en hits
      (2L, "de la el", "es", "s1"),          // 3 es hits
      (3L, "zz yy", "en", "s1")))            // no evidence
    val got = query("d83_lang_mix_totals").run(spark, dir).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    assert(got.keySet == Set("es", "en", "fr", "de"))
    assert(got("en").getAs[Long]("hits") == 5L)
    assert(got("es").getAs[Long]("hits") == 3L)
    assert(got("fr").getAs[Long]("hits") == 0L)
    assert(got("en").getAs[Double]("hit_share") == 0.625)
    assert(math.abs(got.values.map(_.getAs[Double]("hit_share")).sum
      - 1.0) < 1e-6)
  }

  test("e33 norm audit: identical all-ones vectors land in one bin at " +
      "norm exactly 8, zero zero-norms") {
    // ||1⃗||₂ over 64 dims = 8 exactly (sum of ones = 64, sqrt exact).
    val got = query("e33_norm_audit").run(spark, onesEmbDir(50)).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("norm_bin") == 8L)
    assert(got.head.getAs[Long]("n_vectors") == 50L)
    assert(got.head.getAs[Double]("share") == 1.0)
    assert(got.head.getAs[Double]("mean_norm") == 8.0)
    assert(got.head.getAs[Long]("zero_norm_total") == 0L)
  }

  test("q60 dispersion: closed form on constructed baskets of 1,1,2,4") {
    // mean 2, variance 1.5 → dispersion index 0.75 (under-dispersed).
    val dir = java.nio.file.Files.createTempDirectory("graft-r18l").toString
    val schema = Tables.lineitem(spark, sfDir).schema
    val isNtz = schema("l_shipdate").dataType ==
      org.apache.spark.sql.types.TimestampNTZType
    val ts: Any =
      if (isNtz) java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
      else java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rows = Seq(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 4).flatMap {
      case (ok, n) => (1 to n).map(i => Row(ok, 1L, 1L, i, 1.0, 10.0,
        0.0, 0.0, "N", "O", ts))
    }
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = query("q60_basket_dispersion").run(spark, dir).collect()
      .map(r => r.getAs[Long]("basket_size") -> r).toMap
    assert(got.keySet == Set(1L, 2L, 4L))
    assert(got(1L).getAs[Long]("n_orders") == 2L)
    assert(got(1L).getAs[Double]("share") == 0.5)
    assert(got(1L).getAs[Double]("mean_size") == 2.0)
    assert(got(1L).getAs[Double]("dispersion_index") == 0.75)
  }

  test("e34 metric agreement: identical vectors make cosine and dot " +
      "rankings coincide exactly") {
    // every pairwise cosine is 1 and every dot is 64 — both rankings
    // fall back to the b_id tiebreak, so the top-10s are identical.
    val got = query("e34_metric_agreement").run(spark, onesEmbDir(100))
      .collect()
    assert(got.length == 5) // probes 0,20,40,60,80
    got.foreach { r =>
      assert(r.getAs[Long]("n_overlap") == 10L)
      assert(r.getAs[Double]("jaccard10") == 1.0)
      assert(r.getAs[Double]("mean_overlap") == 10.0)
    }
  }

  test("d80 BPE reproduces the Sennrich merge sequence exactly, with " +
      "non-increasing pair counts") {
    // The classic corpus: low×5, lower×2, newest×6, widest×3. Hand-run:
    //   (e,s) 9  →  (es,t) 9  →  (l,o) 7  →  (lo,w) 7  →  (e,w) 6
    // with every tie broken lexicographically ((e,s) over (s,t);
    // (l,o) over (o,w); (e,w) over (n,e)/(w,est)).
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val got = query("d80_bpe_train")
      .run(spark, docsDir(Seq((1L, text, "en", "s1")))).collect()
      .map(r => (r.getAs[Long]("step"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count")))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, "e", "s", 9L), (2L, "es", "t", 9L),
      (3L, "l", "o", 7L), (4L, "lo", "w", 7L),
      (5L, "e", "w", 6L)))
    // the greedy-max law: no later merge can beat an earlier one
    assert(got.map(_._4).toSeq == got.map(_._4).sortBy(-_).toSeq)
  }

  test("BPE mergePair fold is greedy left-to-right non-overlapping") {
    import graft.operators.Bpe
    val df = Seq(Seq("a", "a", "a", "a"), Seq("b", "a", "a", "b"))
      .toDF("syms")
    val got = df.select(Bpe.mergePair(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList).toSet
    assert(got == Set(List("aa", "aa"), List("b", "aa", "b")))
  }

  test("m13 Hamming merge: canon is within 1 bit, counts conserve, and " +
      "merged groups dominate their members") {
    val got = query("m13_phash_hamming_merge").run(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val ph = r.getAs[Long]("phash"); val cn = r.getAs[Long]("canon_phash")
      assert(cn <= ph, "canon is the MIN of the neighborhood")
      assert(java.lang.Long.bitCount(ph ^ cn) <= 1,
        s"canon $cn not within Hamming 1 of $ph")
      assert(r.getAs[Long]("n_merged") >= r.getAs[Long]("n_media"))
      assert((r.getAs[Int]("merged") == 1) == (cn != ph))
    }
    val media = got.map(r => r.getAs[Long]("n_media")).sum
    val m04 = query("m04_phash_groups").run(spark, sfDir).count()
    assert(media == m04, "hash-group counts must cover every media row")
  }

  test("m15 coverage reconciles exactly with m08's per-frame alignment") {
    val m08 = query("m08_caption_align").run(spark, sfDir)
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("cap_idx").isNotNull, 1L).otherwise(0L)).as("c"))
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n"), r.getAs[Long]("c"))).toMap
    val m15 = query("m15_caption_coverage").run(spark, sfDir).collect()
    assert(m15.nonEmpty)
    m15.foreach { r =>
      val (n, c) = m08(r.getAs[Long]("media_id"))
      assert(r.getAs[Long]("n_frames") == n)
      assert(r.getAs[Long]("n_captioned") == c,
        "m15 and m08 must agree on the alignment (shared definition)")
      val cov = r.getAs[Double]("coverage")
      assert(cov >= 0.0 && cov <= 1.0)
      if (c == 0L)
        assert(r.isNullAt(r.fieldIndex("first_caption_ms")))
    }
  }

  test("m14 token budget reconciles exactly with m07's per-sample costs") {
    val m14 = query("m14_modality_token_budget").run(spark, sfDir).collect()
    assert(m14.map(_.getAs[String]("kind")).toSet ==
      Set("image", "audio", "video"))
    val m07 = query("m07_multimodal_pack").run(spark, sfDir)
      .groupBy(col("kind")).agg(
        count(lit(1)).as("n"), sum(col("n_media")).as("tot"))
      .collect().map(r => r.getAs[String]("kind") ->
        (r.getAs[Long]("n"), r.getAs[Long]("tot"))).toMap
    m14.foreach { r =>
      val (n, tot) = m07(r.getAs[String]("kind"))
      assert(r.getAs[Long]("n_samples") == n)
      assert(r.getAs[Long]("total_tokens") == tot,
        "m14 and m07 must price a sample identically (shared cost model)")
    }
    val shares = m14.map(_.getAs[Double]("token_share")).sum
    assert(math.abs(shares - 1.0) < 1e-5)
  }
}
