package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Document fingerprinting by winnowing (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every token k-gram with a
  * rolling polynomial hash, then keep the minimum hash of each sliding
  * window of `w` consecutive k-gram hashes. The guarantee: any token run
  * of length ≥ w + k - 1 shared by two documents yields at least one
  * shared fingerprint, while only ~2/(w+1) of all k-gram hashes are kept.
  *
  * The reference's dedup is exact-content only (/root/reference/main.R:105);
  * this is the partial-overlap upgrade a training-data pipeline needs
  * (contained copies, boilerplate, quote plagiarism — cases where whole-doc
  * hashes like md5/minhash/simhash all miss because the containing doc
  * differs globally).
  *
  * The fingerprint pipeline is ONE native codegen expression
  * ([[graft.functions.WinnowFingerprints]]) — no UDF, no shuffle; the only
  * shuffles are in [[sharedFingerprintPairs]], keyed by fingerprint value.
  * Cross-engine parity: the char fold is `(acc*131 + ascii(c)) % 2^31`
  * (DuckDB `list_reduce(list_prepend(0, …))` mirrors it with a zero init),
  * and all intermediates stay below 2^52 so BIGINT arithmetic never
  * overflows in either engine.
  *
  * Round-5 post-mortem (why native, not `functions._`): the original
  * th → kh → fps alias-chain formulation (kept below as the test-only
  * reference) was hash-identical but non-terminating at sf0.1 —
  * `InferFiltersFromGenerate` + predicate pushdown inlined the whole chain
  * into a `size(fps) > 0` filter, re-evaluating the char fold per lambda
  * iteration (O(windows × k-grams × chars) interpreted steps per row). The
  * native expression is opaque to that rewrite. See WinnowExprs scaladoc.
  */
object Winnowing {

  val K = 3      // tokens per k-gram
  val W = 4      // k-gram hashes per winnowing window
  val MOD = 2147483648L  // 2^31 — keeps th*1009*1009 + th < 2^52
  val BASE = 1009L

  /** SQL-expr forms — RETAINED ONLY as the independent reference
    * formulation for WinnowingSpec's parity test (never registered in a
    * query; see the round-5 post-mortem above). Per-token polynomial char
    * hash in [0, 2^31): a fold of ascii codes with a zero init. */
  private def thExpr(toks: String): String =
    s"transform($toks, t -> aggregate(split(t, ''), 0L, (a, c) -> (a * 131 + ascii(c)) % $MOD))"

  /** k-gram rolling hashes from token hashes: one value per window of K
    * consecutive tokens. Empty when fewer than K tokens. */
  private def khExpr(th: String): String =
    s"""CASE WHEN size($th) >= $K THEN
          transform(sequence(0, size($th) - $K),
            i -> ((element_at($th, i + 1) * $BASE + element_at($th, i + 2)) * $BASE
                  + element_at($th, i + 3)) % $MOD)
        ELSE cast(array() as array<bigint>) END"""

  /** Winnowed fingerprint set: distinct minima of each W-wide sliding
    * window over the k-gram hash sequence (positions collapse — the value
    * set is what dedup joins on). Fewer than W k-grams → the single global
    * min. */
  private def winnowExpr(kh: String): String =
    s"""CASE WHEN size($kh) = 0 THEN cast(array() as array<bigint>)
        ELSE array_distinct(transform(
          sequence(0, greatest(size($kh) - $W, 0)),
          i -> array_min(slice($kh, i + 1, $W)))) END"""

  /** doc_id + `fps`: the winnowed fingerprint array (empty for docs with
    * fewer than K tokens). One narrow O(chars) codegen'd pass, fused into
    * the scan stage. */
  def fingerprintSets(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      graft.functions.WinnowExprs.winnowFingerprints(col(textCol), K, W).as("fps"))

  /** The original SQL-expression formulation — test-only parity reference
    * (WinnowingSpec asserts it computes the same fingerprint sets as the
    * native expression; the DuckDB oracle CTE transliterates this form). */
  private[graft] def fingerprintSetsReference(docs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("toks"))
      .withColumn("th", expr(thExpr("toks")))
      .withColumn("kh", expr(khExpr("th")))
    // null text → null fps, matching the native expression's null-in/
    // null-out contract (the CASE chain alone would yield [] instead).
    base.select(col(idCol),
      when(col("toks").isNull, lit(null).cast("array<bigint>"))
        .otherwise(expr(winnowExpr("kh"))).as("fps"))
  }

  /** Exploded form: one row per (doc, fingerprint). */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    fingerprintSets(docs, idCol, textCol)
      .select(col(idCol), explode(col("fps")).as("fp"))

  /** Candidate containment/overlap pairs: docs sharing ≥ `minShared`
    * winnowed fingerprints, with the shared count. Scale shape: group by
    * fingerprint value (bounded buckets — a fingerprint is a 31-bit hash
    * of a K-token run; ubiquitous boilerplate runs are the one skew risk,
    * capped via `maxBucket`), expand pairs within buckets, then count per
    * pair. Output is (a_id, b_id, n_shared), a_id < b_id. */
  def sharedFingerprintPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minShared: Int = 2,
      maxBucket: Int = 64): DataFrame = {
    // a fingerprint shared by more than maxBucket docs is boilerplate —
    // quadratic pair expansion on it would dominate the stage; drop it
    // (same cap must be applied in any oracle). cappedBuckets bounds the
    // drop itself at O(cap) memory: a ubiquitous licence-header run's
    // fingerprint can collect millions of doc ids on a web crawl, and a
    // collect_list buffer holding them never spills per group.
    val grouped = NearDup.cappedBuckets(
      fingerprints(docs, idCol, textCol),
      Seq("fp"), struct(col(idCol).as("id")), col(idCol), maxBucket)
    NearDup.pairsWithinBuckets(grouped)
      .groupBy(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Containment-scored overlap pairs — the ASYMMETRIC upgrade of
    * [[sharedFingerprintPairs]]: for each candidate pair, score the full
    * fingerprint sets with containment = |A∩B| / min(|A|,|B|) (and the
    * symmetric Jaccard for contrast). Containment is the quote/subset
    * detector: a short doc copied verbatim into a much longer one scores
    * containment ≈ 1 while its Jaccard ≈ |short|/|long| ≈ 0 — whole-doc
    * near-dup (d08-d12) and symmetric overlap both miss it.
    *
    * Scale shape: candidate generation is the capped shared-fingerprint
    * bucket expansion (never all-pairs); the full sets are then attached
    * by joining the PAIR table back against the RAW docs — two joins whose
    * small side is the verified-candidate pair list, which the boilerplate
    * caps keep far below the corpus size, so AQE broadcasts it and the
    * big doc side never shuffles (plan-asserted at test scale). The join
    * strategy is deliberately NOT hinted: a forced broadcast() of a
    * pair table whose second join-back side carries per-pair fingerprint
    * arrays OOMs the driver on dup-heavy corpora (the d39 stress lesson —
    * pair output is quadratic in dup-group size); unhinted, AQE flips the
    * oversized case to a shuffle join with identical semantics. Crucially
    * the winnow projection sits ABOVE each join-back, so the O(chars)
    * fingerprint pass runs only for the few rows the join keeps — joining
    * pre-fingerprinted frames instead would recompute the full-corpus
    * winnow pass once per side (measured 2.8 s → 2.1 s at sf0.1 for d35,
    * leaving ~candidate-gen cost only).
    *
    * Cross-engine exactness: intersection/min-size are exact integers on
    * distinct fingerprint sets; the one double division is bit-stable. */
  def containmentPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minShared: Int = 2, maxBucket: Int = 64,
      minContainment: Double = 0.5): DataFrame = {
    val pairs = sharedFingerprintPairs(docs, idCol, textCol, minShared, maxBucket)
      .select(col("a_id"), col("b_id"))
    val fpOf = (t: org.apache.spark.sql.Column) =>
      graft.functions.WinnowExprs.winnowFingerprints(t, K, W)
    // Join raw docs first, fingerprint after: the winnow pass runs only on
    // the (few) rows the broadcast pair probe keeps.
    val withA = docs.select(col(idCol).as("a_id"), col(textCol).as("ta"))
      .join(pairs, "a_id")
      .select(col("a_id"), col("b_id"), fpOf(col("ta")).as("fa"))
    val both = docs.select(col(idCol).as("b_id"), col(textCol).as("tb"))
      .join(withA, "b_id")
      .select(col("a_id"), col("b_id"), col("fa"), fpOf(col("tb")).as("fb"))
    both
      .withColumn("inter", size(array_intersect(col("fa"), col("fb"))).cast("bigint"))
      .select(col("a_id"), col("b_id"),
        (col("inter").cast("double") /
          least(size(col("fa")), size(col("fb"))).cast("double"))
          .as("containment"),
        (col("inter").cast("double") /
          size(array_union(col("fa"), col("fb"))).cast("double"))
          .as("jaccard"))
      .filter(col("containment") >= minContainment)
  }
}
