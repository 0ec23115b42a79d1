package graft

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.DataFrame

import graft.queries.GraftQuery

/** Semantic pins for the corpus-level training-data queries (d21/d22/e07)
  * on synthetic mini-corpora with known answers. The DuckDB oracle proves
  * engine parity on the fixture tables; these prove the operators compute
  * the INTENDED quantity (contamination hits, duplicated-chunk fractions,
  * recall) on inputs constructed to exercise each branch.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private def run(name: String, dir: String): DataFrame =
    GraftQuery.all.find(_.name == name).get.run(spark, dir)

  /** Writes `documents`/`embeddings` parquet into a fresh temp dir. */
  private def corpus(docs: Seq[(Long, String)],
      embs: Seq[(Long, Array[Float])] = Nil): String =
    sourcedCorpus(docs.map { case (id, t) => (id, t, "src0") }, embs)

  private def sourcedCorpus(docs: Seq[(Long, String, String)],
      embs: Seq[(Long, Array[Float])] = Nil): String = {
    val dir = Files.createTempDirectory("graft-corpus").toString
    if (docs.nonEmpty)
      docs.toDF("doc_id", "text", "source")
        .withColumn("lang", org.apache.spark.sql.functions.lit("und"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    if (embs.nonEmpty)
      embs.toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** doc_ids partitioned by d21's benchmark rule md5(id) LIKE '0%'. */
  private lazy val (benchIds, corpusIds) =
    (0L until 200L).partition(i => md5Hex(i.toString).startsWith("0"))

  test("d21: docs sharing a 3-gram with the benchmark slice are flagged") {
    val bench = benchIds.head          // in the held-out slice
    val hit = corpusIds.head           // shares a full 3-gram with bench
    val clean = corpusIds(1)           // no shared gram
    val short0 = corpusIds(2)          // < 3 tokens: no grams at all
    val dir = corpus(Seq(
      bench -> "alpha beta gamma delta",
      hit -> "zz alpha beta gamma yy",
      clean -> "one two three four five",
      short0 -> "alpha beta"))
    val out = run("d21_decontaminate", dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hit shares exactly "alpha beta gamma" (distinct grams counted once)
    assert(out == Map(hit -> 1L))
  }

  test("d21: benchmark docs themselves are excluded from the output") {
    val dir = corpus(Seq(
      benchIds.head -> "alpha beta gamma",
      benchIds(1) -> "alpha beta gamma"))  // identical, both held out
    assert(run("d21_decontaminate", dir).isEmpty)
  }

  test("d22: duplicated-chunk fraction per doc, short docs yield zero") {
    val shared = (1 to 10).map(i => s"w$i").mkString(" ")   // one full chunk
    val uniqA = (11 to 20).map(i => s"a$i").mkString(" ")
    val uniqB = (21 to 30).map(i => s"b$i").mkString(" ")
    val dir = corpus(Seq(
      1L -> s"$shared $uniqA",  // 2 chunks, 1 duplicated
      2L -> s"$shared $uniqB",  // 2 chunks, 1 duplicated
      3L -> uniqA.take(29),     // < 10 tokens: 0 chunks, frac 0.0
      4L -> ((1 to 13).map(i => s"c$i").mkString(" ")))) // 1 chunk, 3 spare toks
    val out = run("d22_chunk_dedup", dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((0L, 0L, 0.0)))
    assert(out(4L) == ((1L, 0L, 0.0)))
    // intra-doc repeats don't count: the chunk must span >= 2 DISTINCT docs
    val intra = corpus(Seq(5L -> s"$shared $shared"))
    val r5 = run("d22_chunk_dedup", intra).collect().head
    assert((r5.getLong(1), r5.getLong(2)) == ((2L, 0L)))
  }

  test("d23: new-crawl docs drop iff their NORMALIZED fingerprint exists " +
      "in the prior snapshot") {
    val dir = sourcedCorpus(Seq(
      (1L, "Hello   World", "src0"),  // prior dump (even source)
      (2L, "hello world", "src1"),    // dup after lower+squish → dropped
      (3L, "hello world!", "src3"),   // differs by one char → survives
      (4L, "fresh content here", "src19"))) // survives
    val out = run("d23_cross_snapshot_dedup", dir).collect()
      .map(_.getLong(0)).toSet
    assert(out == Set(3L, 4L))
  }

  test("d19/d23: non-'src<N>' sources parse to a NULL snapshot, never a " +
      "cast error (Spark 4 ANSI mode makes plain CAST throwing — try_cast " +
      "regression)") {
    val docs = Seq(
      (1L, "hello world", "src0"),      // prior snapshot (even)
      (2L, "hello world", "src1"),      // new crawl, dup of prior
      (3L, "hello world", "wiki"),      // non-numeric suffix → NULL snap
      (4L, "unique text four", "web"),  // non-numeric suffix → NULL snap
      (5L, "unique text five", "ab"),   // substr('ab', 4) = '' → NULL snap
      (6L, "brand new text", "src3"))   // new crawl, novel → survives
    val dir = sourcedCorpus(docs)
    // d23: NULL-snap docs are in NEITHER the prior dump nor the new crawl.
    val d23 = run("d23_cross_snapshot_dedup", dir).collect()
      .map(_.getLong(0)).toSet
    assert(d23 == Set(6L))
    // d19: NULL snap falls to the otherwise-branch (25% stratum), matching
    // the oracle's TRY_CAST semantics.
    val half = "80000000000000000000000000000000"
    val quarter = "40000000000000000000000000000000"
    val expected = docs.collect { case (id, _, src)
        if md5Hex(id.toString) <
          (if (src == "src0") half else quarter) => id }.toSet
    val d19 = run("d19_stratified_sample", dir).collect()
      .map(_.getLong(0)).toSet
    assert(d19 == expected)
  }

  test("d24: cumulative vocab coverage over frequency-ranked terms") {
    // corpus tokens: aa ×4, bb ×2, cc ×1, dd ×1 → total 8
    val dir = corpus(Seq(
      1L -> "aa aa bb cc",
      2L -> "aa aa bb dd"))
    val out = run("d24_vocab_coverage", dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out(1L) == (("aa", 4L, 0.5)))
    assert(out(2L) == (("bb", 2L, 0.75)))
    assert(out(3L) == (("cc", 1L, 0.875))) // freq tie → lexicographic order
    assert(out(4L) == (("dd", 1L, 1.0)))
  }

  test("d25: gate-then-dedup — a gate-rejected copy never shadows its " +
      "admissible duplicate") {
    val good =
      "the cat sat on the mat and then the dog ran to the park with a ball " * 3
    val dir = corpus(Seq(
      5L -> good.toUpperCase, // same fingerprint (lower-normalized), LOWER
                              // id, but gate-rejected (upper ratio) — must
                              // not consume the keeper slot
      7L -> good,             // admissible original → keeper
      8L -> good.replace(" ", "  "), // admissible dup → dropped
      9L -> "xx"))            // gate reject
    val out = run("d25_corpus_pipeline", dir).collect().map(_.getLong(0)).toSet
    assert(out == Set(7L))
  }

  test("d26: emails, IPv4s, and phones are masked and counted") {
    val dir = corpus(Seq(
      1L -> "contact me at john.doe+spam@example.co.uk or 192.168.0.1",
      2L -> "call +14155550123 or 415-555-0123 now",
      3L -> "no pii here at all, just 12 plain numbers 345"))
    val out = run("d26_pii_scrub", dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) == (("contact me at <EMAIL> or <IP>", 1L, 1L, 0L)))
    assert(out(2L) == (("call <PHONE> or <PHONE> now", 0L, 0L, 2L)))
    assert(out(3L) ==
      (("no pii here at all, just 12 plain numbers 345", 0L, 0L, 0L)))
  }

  test("d28: greedy packing — packs start below budget, overrun < one " +
      "doc, ids contiguous per source, sources independent") {
    // 6 docs of 1000 tokens each (budget 2048): running starts are 0,
    // 1000, 2000, 3000, 4000, 5000 → pack_ids 0, 0, 0, 1, 1, 2 — the
    // 3rd doc STARTS at 2000 < 2048 so it stays in pack 0 (overrun 952
    // < one doc). A second source restarts at pack 0.
    val text = Seq.fill(1000)("w").mkString(" ")
    val dir = sourcedCorpus(
      (0L to 5L).map(i => (i, text, "srcA")) :+ ((10L, text, "srcB")))
    val got = run("d28_sequence_pack", dir)
      .select("source", "doc_id", "pack_id")
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(
      ("srcA", 0L, 0L), ("srcA", 1L, 0L), ("srcA", 2L, 0L),
      ("srcA", 3L, 1L), ("srcA", 4L, 1L), ("srcA", 5L, 2L),
      ("srcB", 10L, 0L)))
  }

  test("d36: temperature mixing keeps the smallest lang stratum whole and " +
      "downsamples the biggest near its sqrt rate") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = run("d36_temperature_mix", sfDir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = total.values.min
    // rate-1.0 strata (the smallest) keep every doc
    total.filter(_._2 == nMin).keys
      .foreach(l => assert(kept(l) == total(l), s"smallest stratum $l"))
    // every stratum's kept count sits near its Bernoulli mean n·r_s with
    // r_s = sqrt(nMin/n) — 5σ envelope, so the assertion is about the
    // mechanism (threshold admission at the right rate), not the exact
    // hash draw
    total.foreach { case (l, n) =>
      val rate = math.sqrt(nMin.toDouble / n)
      val mean = rate * n
      val sd = math.sqrt(n * rate * (1 - rate))
      assert(math.abs(kept(l) - mean) <= 5 * sd + 1,
        s"$l: kept=${kept(l)} expected≈$mean σ=$sd")
    }
    // the fixture's dominant stratum is genuinely downsampled
    val maxLang = total.maxBy(_._2)._1
    assert(kept(maxLang) < total(maxLang))
  }

  test("e07: recall is 1.0 when LSH buckets hold the true neighbors, " +
      "0.0 when they don't") {
    // All vectors share sign pattern on dims 1-4 (bits = MinBits at this
    // corpus size) → one bucket → ANN == brute force → recall 1.0.
    // Vectors must honor the corpus dimension contract (Tables.EmbeddingDim)
    // or the loader's ragged-row guard drops them.
    def v(seed: Int): Array[Float] =
      Array.tabulate(graft.sources.Tables.EmbeddingDim)(j =>
        if (j < 4) 1.0f else (seed * (j % 8 + 1)).toFloat)
    val sameBucket = (0L to 5L).map(i => i -> v(i.toInt + 1))
    val r1 = run("e07_ann_recall", corpus(Nil, sameBucket)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(r1 == Map(0L -> 1.0)) // only vec_id 0 is a probe (% 20)
    // Probe alone in its bucket (negative dim-1 sign) → no candidates →
    // zero ANN answers → recall 0.0, probe still present in the output.
    val lone = (0L -> Array.tabulate(graft.sources.Tables.EmbeddingDim)(j =>
        if (j == 0) -1.0f else if (j < 4) 1.0f else 5.0f)) +:
      (1L to 5L).map(i => i -> v(i.toInt + 1))
    val r0 = run("e07_ann_recall", corpus(Nil, lone)).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(r0 == Map(0L -> 0.0))
  }

  test("e11: Hamming coarse pass finds the sign-identical clones; rerank " +
      "orders them by exact cosine") {
    val dim = graft.sources.Tables.EmbeddingDim
    // probe: +/- split halfway; no zero elements (0 is not > 0)
    def base(j: Int): Float = if (j < 32) 0.5f else -0.5f
    def flip(v: Array[Float], idxs: Int*): Array[Float] = {
      val c = v.clone(); idxs.foreach(i => c(i) = -c(i)); c
    }
    val v0 = Array.tabulate(dim)(base)
    val embs: Seq[(Long, Array[Float])] =
      Seq(0L -> v0,
        1L -> v0.map(_ * 0.9f),       // hamming 0, cosine 1.0
        2L -> flip(v0, 0),            // hamming 1
        3L -> flip(v0, 0, 1)) ++      // hamming 2
        (4L to 19L).map(i => i -> v0.map(x => -x)) // hamming 64
    val out = run("e11_hamming_rerank", corpus(Nil, embs)).collect()
      .filter(_.getLong(0) == 0L) // probe set = vec_id % 20 == 0
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))) // (rn, b_id, hamming)
      .sortBy(_._1)
    // coarse top-8 keeps {1,2,3} (hamming 0/1/2) + 5 far vectors; the
    // cosine rerank puts the three near-clones first, in flip order
    assert(out.take(3).toSeq == Seq((1L, 1L, 0L), (2L, 2L, 1L), (3L, 3L, 2L)),
      s"unexpected rerank: ${out.mkString(", ")}")
  }

  test("d40: interpolated bigram logprob — hand-computed corpus, and " +
      "sub-2-token docs score NULL with zero bigrams") {
    // docA "a b a b a": bigrams (a,b)x2, (b,a)x2; with docB's single
    // token contributing nothing, N=4. For every bigram: p_bi = 1,
    // p_uni(cur) = 2/4 => s = 0.5*1 + 0.5*0.5 = 0.75.
    val dir = corpus(Seq(10L -> "a b a b a", 11L -> "x", 12L -> ""))
    val rows = run("d40_bigram_logprob", dir).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2))).toMap
    val lp = BigDecimal(math.log(0.75)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(10L) == (Some(lp), 4L))
    assert(rows(11L) == (None, 0L))
    assert(rows(12L) == (None, 0L))
  }

  test("d41: epoch shards are balanced round-robin over the md5 " +
      "permutation, deterministically") {
    val dir = corpus((0L until 20L).map(i => i -> s"doc $i"))
    def runOnce(): Seq[(Long, Long, Long)] =
      run("d41_epoch_shards", dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val out = runOnce()
    assert(out.map(_._1).toSet == (0L until 20L).toSet)
    // expected permutation: sort by (md5("epoch0:" || id), id)
    val perm = (0L until 20L).sortBy(i => (md5Hex(s"epoch0:$i"), i))
    val expected = perm.zipWithIndex.map { case (id, r) =>
      (id, (r % 8).toLong, (r / 8).toLong)
    }
    assert(out.toSet == expected.toSet)
    // balance: every shard holds ceil(20/8)=3 or floor=2 docs
    val sizes = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(sizes.values.forall(n => n == 2 || n == 3) && sizes.size == 8)
    assert(runOnce().toSet == out.toSet) // stable across runs
  }

  test("d42: only semantically-near pairs WITHOUT a lexical near-dup " +
      "match survive the subtraction") {
    val dim = graft.sources.Tables.EmbeddingDim
    // all four vectors share the dim-1..4 sign prefix (one LSH bucket);
    // A-pattern (docs 0,1) ⊥ B-pattern (docs 2,3) beyond it, so the only
    // cos ≥ 0.4 pairs are (0,1) and (2,3)
    def vec(hot: Int): Array[Float] =
      Array.tabulate(dim)(j => if (j < 4) 1.0f else if (j == hot) 10.0f else 0.0f)
    val docs = Seq(             // 0,1: lexical dups too; 2,3: no shared 3-gram
      0L -> "alpha beta gamma delta epsilon",
      1L -> "alpha beta gamma delta epsilon",
      2L -> "one two three four five",
      3L -> "six seven eight nine ten")
    val embs = Seq(0L -> vec(5), 1L -> vec(5), 2L -> vec(9), 3L -> vec(9))
    val out = run("d42_paraphrase_pairs", corpus(docs, embs)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((2L, 3L)),
      s"expected only the paraphrase pair (2,3), got $out")
  }

  test("d43: token entropy — hand-computed distributions, degenerate and " +
      "empty docs") {
    val dir = corpus(Seq(
      20L -> "a a b b",      // H = ln 2
      21L -> "x x x",        // H = 0 (degenerate)
      22L -> "a b c d",      // H = ln 4 (max: all unique)
      23L -> ""))            // no tokens -> NULL entropy
    val rows = run("d43_token_entropy", dir).collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]), r.getLong(2))).toMap
    def h(probs: Seq[(Long, Long)]): Double = { // (count, n) pairs
      val s = probs.map { case (c, n) =>
        c * BigDecimal(math.log(c.toDouble / n.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.sum
      -s / probs.map(_._1).sum.toDouble
    }
    assert(rows(20L) == (Some(h(Seq(2L -> 4L, 2L -> 4L))), 4L))
    assert(rows(21L) == (Some(-0.0), 3L) || rows(21L) == (Some(0.0), 3L))
    assert(rows(22L) == (Some(h(Seq(1L -> 4L, 1L -> 4L, 1L -> 4L, 1L -> 4L))), 4L))
    assert(rows(23L) == (None, 0L))
  }

  test("d44: duplicated windows merge into maximal spans; within-doc " +
      "repeats count; a gap > W splits islands; short docs emit nothing") {
    def toks(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    val sharedA = toks("a", 10)
    val run = toks("s", 8)
    val dir = corpus(Seq(
      0L -> s"$sharedA ${toks("u", 10)}",   // shares a1..a10 with doc 1
      1L -> s"$sharedA ${toks("v", 10)}",
      2L -> s"$run ${toks("x", 9)} $run",   // repeats its own 8-token run
      3L -> "tiny doc"))                    // < 8 tokens: no windows
    val out = run4("d44_dup_span_merge", dir)
    // docs 0/1: dup window positions {1,2,3} (the windows fully inside
    // a1..a10) merge into ONE span covering exactly the shared 10 tokens
    assert(out(0L) == Seq((1L, 1L, 10L, 10L)))
    assert(out(1L) == Seq((1L, 1L, 10L, 10L)))
    // doc 2: dup positions {1, 18} are 17 > W apart -> two spans, each
    // exactly the repeated run
    assert(out(2L) == Seq((1L, 1L, 8L, 8L), (2L, 18L, 25L, 8L)))
    assert(!out.contains(3L))
  }

  private def run4(name: String, dir: String): Map[Long, Seq[(Long, Long, Long, Long)]] =
    run(name, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sorted).toMap

  test("e12: when every nonzero coordinate lies in the 16 top-variance " +
      "dims, variance-masked search recalls the full-dim truth exactly") {
    val dim = graft.sources.Tables.EmbeddingDim
    val hot = (17 to 32).toSet // 1-based; 16 dims, zero elsewhere
    // integer-valued coordinates: all dots/norms are exact integer sums in
    // double, so cos over the gathered subvector == cos over the full
    // vector bit-for-bit and the two rankings must agree everywhere
    def vec(i: Int): Array[Float] = Array.tabulate(dim) { j0 =>
      val j = j0 + 1
      if (hot(j)) ((i * 7 + j * 3) % 11 + 1).toFloat else 0.0f
    }
    val embs = (0 to 20).map(i => i.toLong -> vec(i))
    val out = run("e12_topvar_recall", corpus(Seq(0L -> "stub doc"), embs))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(0L, 20L)) // probes: vec_id % 20 == 0
    assert(out.values.forall(_ == 1.0),
      s"variance-masked recall must be exact on hot-dim-only vectors: $out")
  }

  test("m09: a phash group with two distinct captions is flagged " +
      "multi_caption; exact-dup captions are not; singletons are dropped") {
    def aHash(text: String): Long = {
      val bytes = MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).take(8).map(b => b & 0xff)
      val tot = bytes.sum
      bytes.zipWithIndex
        .map { case (b, j) => if (b * 8 > tot) 1L << j else 0L }.sum
    }
    val tC = "stable shared caption"
    // search the synthetic seam for two DIFFERENT captions whose md5-byte
    // aHash collides (8-bit hash: a pair appears within a few dozen
    // candidates) and doesn't collide with the control groups
    val cands = Iterator.from(0).map(i => s"caption variant $i")
      .filter(t => aHash(t) != aHash(tC)).take(200).toSeq
    val (tA, tB) = cands.groupBy(aHash).values.find(_.size >= 2)
      .map(g => (g(0), g(1)))
      .getOrElse(fail("no aHash collision in 200 candidates"))
    val tD = Iterator.from(0).map(i => s"solo caption $i")
      .find(t => aHash(t) != aHash(tC) && aHash(t) != aHash(tA))
      .get
    // all ids ≡ 0 (mod 3) -> every row is kind 'image'
    val dir = corpus(Seq(0L -> tA, 3L -> tB, 6L -> tC, 9L -> tC, 12L -> tD))
    val out = run("m09_caption_reuse", dir).collect()
      .map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(out == Map(
      aHash(tA) -> (2L, 2L, true),   // same visual, two captions
      aHash(tC) -> (2L, 1L, false))) // honest exact dup
  }

  test("m08: every sampled frame aligns to the latest caption at or " +
      "before it; cold-open frames align to NULL") {
    // doc_id 2 -> video (id % 3); text long enough for 3 captions
    val text2 = (1 to 20).map(i => s"w$i").mkString(" ")
    val dir = corpus(Seq(0L -> "img doc words here", 2L -> text2))
    def byteAt(hex: String, i: Int): Int =
      Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16)
    def capStarts(text: String): Seq[(Long, Long)] = {
      val hx = md5Hex(text)
      val n = text.trim.split("\\s+").count(_.nonEmpty)
      (0 to (n - 1) / 8).map(k =>
        k.toLong -> (k * 900L + byteAt(hx, k % 16) * 3L))
    }
    def expectedFor(id: Long, text: String, kind: String): Set[(Long, String, Long, Long, Option[Long], Option[Long])] = {
      val caps = capStarts(text)
      val hx = md5Hex(text)
      val frames: Seq[Int] =
        if (kind == "video") 0 until (1 + byteAt(hx, 8) % 16) by 4
        else Seq(0)
      frames.map { fi =>
        val ts = fi * 250L
        val hit = caps.filter(_._2 <= ts).lastOption
        (id, kind, fi.toLong, ts, hit.map(_._1), hit.map(_._2))
      }.toSet
    }
    val out = run("m08_caption_align", dir).collect().map { r =>
      (r.getLong(0), r.getString(1), r.getInt(2).toLong, r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long]))
    }.toSet
    assert(out == expectedFor(0L, "img doc words here", "image") ++
      expectedFor(2L, text2, "video"))
  }
}
