package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextExprs, TextFunctions}

/** Near-duplicate detection at scale — the three standard families, each
  * bucketed so candidate generation never goes all-pairs:
  *
  *   1. md5-minhash on word-3-grams (TextQueries.d08/d09 — oracle-checked)
  *   2. banded MinHash (`minhashLshPairs`) — `numTables` independent minhash
  *     functions (xxhash64 salted by table index); candidates = docs sharing
  *     any per-table signature; verified by exact Jaccard on candidates only
  *   3. SimHash-64 (`simhashOf`) — one 64-bit signature per doc; near-dups
  *     share a 16-bit band; verification = Hamming distance on candidates
  *
  * Candidate generation is a groupBy on the bucket key + within-bucket pair
  * expansion ([[pairsWithinBuckets]]) rather than a bucket self-join: the
  * self-join form computes the signature pipeline once per side (Catalyst
  * does not reuse the exchange across differently-aliased sides) and — worse
  * — inlines the whole signature expression into the join's pushed-down
  * `isnotnull` filter, evaluating it twice more per row. The groupBy form
  * computes signatures exactly once and shuffles them exactly once.
  *
  * At 100 TB: signatures are narrow per-row codegen'd expressions; the
  * shuffle key is the band/bucket value whose group sizes are bounded by
  * design (band width picks the precision/recall point), so no hot keys.
  * Docs too short to sign get a per-doc unique bucket (`coalesce` with
  * doc_id) instead of a shared null bucket — a null hot-key would send
  * every short doc to one task.
  */
object NearDup {

  /** Bounded-buffer bucket collection — the ONE way every pair-emitting
    * family builds its `docs` arrays. Groups `rows` by `keyCols` and
    * collects `payload` into a sorted `docs` array, keeping only buckets
    * with 2..cap members, with per-group memory bounded at `cap + 1`
    * payload rows end to end:
    *
    * A `row_number() <= cap + 1` slice runs BEFORE the collect. Spark's
    * `InferWindowGroupLimit` rewrites the filter-over-rank pattern into a
    * `WindowGroupLimit`, inserting a PARTIAL group-limit ahead of the
    * shuffle — an over-cap boilerplate mega-bucket (empty pages, licence
    * headers; g can reach 10⁵–10⁷ in a web crawl) is truncated to cap + 1
    * members per map task, so neither the exchange nor any aggregation
    * buffer ever sees the full bucket. The old collect-then-filter form
    * materialized all g members in ONE `collect_list` buffer first —
    * `collect_list` buffers never spill per group, so a single hot key
    * could OOM its task even though its output is defined to be empty.
    *
    * Semantics are IDENTICAL to collect-then-filter: under-cap buckets
    * keep every member (the slice passes them through untouched, and
    * `sort_array` canonicalizes order), while a truncated bucket carries
    * exactly cap + 1 members and the `size <= cap` filter drops it — the
    * same all-or-nothing over-cap drop as before, at O(cap) memory. The
    * groupBy reuses the window's hash partitioning (same keys), so the
    * slice costs one in-partition sort, not an extra exchange.
    *
    * `order` breaks ranking ties within a bucket; every caller passes its
    * unique-per-bucket doc id. Determinism does not actually depend on
    * it: under-cap buckets keep all rows and over-cap buckets are dropped
    * whole, so WHICH cap + 1 rows survive truncation is unobservable. */
  def cappedBuckets(rows: DataFrame, keyCols: Seq[String], payload: Column,
      order: Column, cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order)
    rows
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap + 1)
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(payload)).as("docs"))
      .filter(size(col("docs")).between(2, cap))
  }

  /** doc_id + distinct word-3-gram shingle set. */
  def shingled(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("toks", TextFunctions.tokens(col(textCol)))
      .withColumn("shingle_set",
        when(size(col("toks")) >= 3,
          array_distinct(expr(
            "transform(sequence(0, size(toks)-3), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))")))
          .otherwise(expr("cast(array() as array<string>)")))
      .drop("toks")

  /** The in-bucket i<j pair expansion over a `docs` array<struct> column:
    * one generator row per unordered pair, as struct(a, b). ONE definition
    * for every bucketed pair family (md5-minhash, banded LSH, simhash) —
    * the expansion's range arithmetic (sequence(0, -1) is a DESCENDING
    * range, not empty, hence the size > 1 guard at every call site) lives
    * in one place instead of drifting across copies. */
  private val pairExpansion: Column = explode(expr(
    """flatten(transform(sequence(0, size(docs)-2),
      |  i -> transform(sequence(i+1, size(docs)-1),
      |    j -> struct(docs[i] AS a, docs[j] AS b))))""".stripMargin))

  /** All unordered (i<j) pairs within each group of `grouped`, where
    * `grouped` has a `docs` column holding the group's sorted
    * array<struct<...>>; emits one row per pair with columns `a`/`b` (the
    * two structs). Groups of size 1 produce nothing. The expansion is a
    * generator expression — no join, no second pass over the input. */
  def pairsWithinBuckets(grouped: DataFrame): DataFrame =
    grouped
      .filter(size(col("docs")) > 1)
      .select(pairExpansion.as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))

  /** Banded MinHash near-dup pairs, natively: hashed 3-gram shingles →
    * `numTables` independent minhash values (one codegen'd expression, see
    * MinHashExprs) → group docs by (table, minhash) → within-bucket
    * candidate pairs → dedup pairs seen in several tables → exact Jaccard
    * distance filter on the hashed shingle sets (equal to string-shingle
    * Jaccard up to 2^-64 hash collisions). Deterministic (fixed hash
    * family). Returns (a_id, b_id, jaccard_dist) with a_id < b_id and
    * jaccard_dist <= maxDistance.
    *
    * Recall at Jaccard similarity j with T tables: 1-(1-j)^T — e.g. 8
    * tables catch a j=0.6 pair with p≈0.9993. Precision comes free from
    * the exact verify step. The shuffled payload per doc is one long
    * array (8 B/shingle), not the shingle strings.
    *
    * Multi-table pair dedup is SHUFFLE-FREE: each doc carries its full
    * signature vector into the bucket, and a candidate pair is kept only
    * in the FIRST table where the two signatures agree — every later
    * collision of the same pair is dropped by a narrow filter. (The
    * earlier groupBy(a_id, b_id) dedup re-shuffled the shingle-hash
    * arrays a second time; measured 5.0 s → ~2 s at sf0.1.)
    *
    * `maxBucket` caps the quadratic in-bucket expansion (same guard as
    * Winnowing.sharedFingerprintPairs): a bucket larger than `maxBucket`
    * is a near-identical boilerplate cluster — g²/2 struct pairs each
    * carrying two full `hs` arrays inside one generator row would OOM the
    * task on a dup-heavy corpus. The cap is enforced by [[cappedBuckets]]
    * (window-group-limit slice BEFORE the collect), so even detecting the
    * over-cap bucket costs O(cap) memory per task, never O(g); the old
    * collect-then-filter form buffered all g members' signature structs
    * in one non-spilling aggregation buffer first. Dropped-bucket policy: the over-cap
    * bucket's pairs are dropped ENTIRELY, even if the same pair also
    * collides in a later table — the first-collision filter tests
    * signature equality only, so a pair whose first-colliding table is
    * capped never survives anywhere. Deterministic, and errs toward
    * dropping exactly the boilerplate clusters the cap targets; use
    * [[minhashLshRepresentatives]] (linear output, uncapped) when giant
    * dup groups must still collapse. */
  def minhashLshPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxDistance: Double = 0.5,
      numTables: Int = 8, maxBucket: Int = 64): DataFrame = {
    import graft.functions.MinHashExprs
    val sh = docs
      .withColumn("toks", TextFunctions.tokens(col(textCol)))
      .select(col(idCol),
        MinHashExprs.shingleHashes(col("toks")).as("hs"),
        MinHashExprs.minhashSigs(col("toks"), numTables).as("sigs"))
    // One row per (table, per-table minhash) — the LSH bucket key. Docs
    // too short to sign (null sigs — MinHash needs ≥1 shingle) emit no
    // bucket rows via the null-guard inside the generator; a
    // filter(size(toks) >= 3) would be pushed to the scan with the token
    // chain substituted into it, tokenizing every row twice.
    val banded = sh.select(col(idCol), col("hs"), col("sigs"),
      explode(when(col("sigs").isNotNull, expr(
        s"transform(sequence(0, ${numTables - 1}), t -> struct(t AS t, sigs[t] AS mh))")))
        .as("bk"))
    val grouped = cappedBuckets(
      banded.select(col("bk.t").as("t"), col("bk.mh").as("mh"),
        col(idCol), col("hs"), col("sigs")),
      Seq("t", "mh"),
      struct(col(idCol).as("id"), col("hs"), col("sigs")),
      col(idCol), maxBucket)
    grouped
      .select(col("t"), pairExpansion.as("p"))
      // first-collision dedup (guard t = 0: sequence(0, -1) would be the
      // DESCENDING range [0, -1], not empty)
      .filter(expr("t = 0 OR NOT exists(sequence(0, t-1), i -> p.a.sigs[i] = p.b.sigs[i])"))
      .select(col("p.a.id").as("a_id"), col("p.b.id").as("b_id"),
        // hs is sorted-distinct (shingleHashes contract) → merge-scan
        // jaccard, no per-pair hash sets
        (lit(1.0) - MinHashExprs.jaccardSorted(col("p.a.hs"), col("p.b.hs")))
          .as("jaccard_dist"))
      .filter(col("jaccard_dist") <= maxDistance)
  }

  /** Near-dup CLUSTERING (the 100 TB dedup shape): every doc maps to a
    * representative — the minimum doc id sharing any LSH band bucket with
    * it (itself if nothing collides; unsignable short docs are their own
    * representative). Output (doc_id, rep_id), one row per input row.
    *
    * This is the scale-safe alternative to emitting candidate PAIRS: a
    * duplicate group of size g produces g² pairs but only g cluster rows —
    * measured on an 8×-replicated corpus, the pair form degrades
    * super-linearly (1.4 s → 48 s for 8× rows at sf0.1) while this form
    * stays linear. Training-data dedup (keep one per cluster:
    * `filter(doc_id = rep_id)`) never needs the pairs.
    *
    * One-pass approximation of connected components: transitive chains
    * (A~B~C without A~C sharing a bucket) may land in different clusters;
    * near-exact duplicates share all/most buckets, so real dup groups
    * collapse correctly. Iterate the mapping if full transitivity is
    * required. */
  def minhashLshRepresentatives(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", numTables: Int = 8): DataFrame = {
    import graft.functions.MinHashExprs
    import org.apache.spark.sql.expressions.Window
    val sigs = docs
      .withColumn("toks", TextFunctions.tokens(col(textCol)))
      .select(col(idCol),
        MinHashExprs.minhashSigs(col("toks"), numTables).as("sigs"))
    // Short docs (null sigs) emit no bucket rows via a null-guard INSIDE
    // the generator — explode(null) produces zero rows. A
    // filter(sigs.isNotNull) here would be pushed below the select with
    // the whole sig chain substituted into the condition, evaluating it
    // twice per row (the d27/round-11 pushdown trap, in miniature).
    val banded = sigs.select(col(idCol), explode(when(col("sigs").isNotNull,
      expr(s"transform(sequence(0, ${numTables - 1}), t -> struct(t AS t, sigs[t] AS mh))")))
      .as("bk"))
    val bucketMin = banded.withColumn("bucket_rep",
      min(col(idCol)).over(Window.partitionBy(col("bk.t"), col("bk.mh"))))
    val reps = bucketMin.groupBy(col(idCol))
      .agg(min(col("bucket_rep")).as("rep_id"))
    // short docs (no signature) are their own representative
    docs.select(col(idCol)).join(reps, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("rep_id"), col(idCol)).as("rep_id"))
  }

  /** SimHash-64 of a whitespace-tokenized string column — a native codegen
    * Catalyst expression (one xxhash64 per token, 64 scalar counters; see
    * TextExprs.SimHash64). No shuffle, fuses into the scan stage. */
  def simhashOf(colName: String): Column = TextExprs.simhash64(col(colName))

  /** SimHash near-dup pairs: band each 64-bit signature into four 16-bit
    * keys, group docs by (band index, band value), expand within-bucket
    * candidate pairs, verify by Hamming distance. Returns
    * (a_id, b_id, hamming) with a_id < b_id. */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 8,
      maxBucket: Int = 64): DataFrame =
    simhashPairsFromSigs(
      docs.select(col(idCol), simhashOf(textCol).as("simhash")),
      idCol, maxHamming, maxBucket)

  /** Same, from precomputed signatures: `sig` has (idCol, simhash: long).
    *
    * Multi-band pair dedup is SHUFFLE-FREE, same trick as
    * [[minhashLshPairs]]: each doc's full signature rides into the
    * bucket, and a candidate pair is kept only in the FIRST band where
    * the two signatures' band values agree — every later collision of
    * the same pair drops in a narrow filter instead of a second
    * all-pairs `distinct` exchange.
    *
    * `maxBucket` (same policy as [[minhashLshPairs]]): a 16-bit band
    * shared by more than `maxBucket` docs is a boilerplate cluster whose
    * g²/2 pair expansion would dominate the stage — the whole bucket is
    * dropped, via [[cappedBuckets]] so the drop costs O(cap) memory. */
  def simhashPairsFromSigs(sig: DataFrame, idCol: String = "doc_id",
      maxHamming: Int = 8, maxBucket: Int = 64): DataFrame = {
    val banded = sig.select(col(idCol), col("simhash"),
      explode(expr(
        // band key must be the UNSIGNED 16-bit value: arithmetic shiftright +
        // signed % follows the signature's sign bit, so identical band bits
        // with different bit-63 values would bucket apart (missed pairs).
        "transform(sequence(0, 3), b -> struct(b AS band, (shiftrightunsigned(simhash, b*16) & 65535) AS v))"))
        .as("bk"))
    val grouped = cappedBuckets(
      banded.select(col("bk.band").as("band"), col("bk.v").as("v"),
        col(idCol), col("simhash")),
      Seq("band", "v"),
      struct(col(idCol).as("id"), col("simhash")),
      col(idCol), maxBucket)
    grouped
      .select(col("band"), pairExpansion.as("p"))
      // first-collision dedup (guard band = 0: sequence(0, -1) would be
      // the DESCENDING range [0, -1], not empty)
      .filter(expr("""band = 0 OR NOT exists(sequence(0, band-1),
        |  i -> (shiftrightunsigned(p.a.simhash, i*16) & 65535)
        |     = (shiftrightunsigned(p.b.simhash, i*16) & 65535))""".stripMargin))
      .select(col("p.a.id").as("a_id"), col("p.b.id").as("b_id"),
        bit_count(col("p.a.simhash").bitwiseXOR(col("p.b.simhash"))).cast("bigint").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
