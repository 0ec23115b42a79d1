package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared sketch substrates. ONE definition per sketch derivation — the
  * batch queries (q34/q35), their DuckDB oracles, and the streaming
  * maintenance path must all agree bit-for-bit, and a drifted copy of the
  * bucket/rank derivation would silently decouple them.
  */
object Sketches {

  /** Number of HLL registers (p = 8 ⇒ m = 256). */
  val HllRegisters = 256

  /** md5-keyed HLL register frame over (keyCol, idCol): bucket = first
    * hash byte, rank = leading zeros of the next 32 hash bits + 1
    * (∈ 1..33), register = grouped max rank. Output columns:
    * (keyCol, bucket, max_rank).
    *
    * Works identically over BATCH and STREAMING inputs: it is a pure
    * groupBy-max, so Structured Streaming maintains it incrementally in
    * update/complete mode with state bounded at |keys| × 256 rows
    * REGARDLESS of stream length — the streaming-safe distinct counter
    * (an exact streaming COUNT(DISTINCT) would hold every id in state).
    * The same max-merge is what batch map-side partial aggregation runs
    * per partition; mergeability is the one property doing the work in
    * both topologies. Null ids are dropped (they carry no identity).
    */
  def hllRegisters(df: DataFrame, keyCol: String, idCol: String): DataFrame = {
    df.filter(col(idCol).isNotNull)
      .select(col(keyCol),
        expr(s"""cast(conv(substr(md5(cast($idCol as string)), 1, 2),
          16, 10) as bigint)""").as("bucket"),
        expr(s"""cast(conv(substr(md5(cast($idCol as string)), 3, 8),
          16, 10) as bigint)""").as("w"))
      .withColumn("rank", when(col("w") === 0, lit(33L))
        .otherwise(lit(33L) - length(bin(col("w"))).cast("bigint")))
      .groupBy(col(keyCol), col("bucket"))
      .agg(max(col("rank")).as("max_rank"))
  }

  /** CMS depth (rows of independent hash functions) and width (counters
    * per row): a fixed 3 × 64 = 192-cell sketch. */
  val CmsDepth = 3
  val CmsWidth = 64

  /** The (j, b) bucket list expression for a term column — bucket b of
    * row j is 16 md5 bits of "j:term" mod width. One definition shared by
    * the cell BUILD and every PROBE (d54's estimator and the streaming
    * maintenance path): a drifted copy would silently probe cells the
    * build never incremented. */
  def cmsBuckets(termCol: String): String =
    s"""transform(sequence(0, ${CmsDepth - 1}), j -> struct(j AS j,
         cast(conv(substr(md5(concat(j, ':', $termCol)), 1, 4), 16, 10)
           as bigint) % $CmsWidth AS b))"""

  /** md5-keyed count-min cell counts over `termCol`: the 192-cell sketch
    * as a DataFrame. Like [[hllRegisters]] this is topology-agnostic —
    * a pure groupBy-sum onto a FIXED key domain, so batch map-side
    * partials and Structured Streaming state both hold ≤ depth × width
    * rows regardless of stream length (the mergeable-sketch property:
    * cell-wise sum IS the merge). */
  def cmsCells(df: DataFrame, termCol: String): DataFrame =
    df.select(explode(expr(cmsBuckets(termCol))).as("c"))
      .groupBy(col("c.j").as("j"), col("c.b").as("b"))
      .agg(count(lit(1)).as("cnt"))

  /** Bloom filter bits (m = 2^16) and hashes (k = 3). */
  val BloomBits = 65536
  val BloomHashes = 3

  /** The k bit positions of an md5-hex fingerprint column: disjoint
    * 16-bit slices of the fingerprint itself (it is already a uniform
    * hash — no second hash family needed). One definition shared by the
    * filter BUILD and the PROBE (d56 and the streaming maintenance path):
    * a drifted copy would probe bits the build never set. */
  def bloomPositions(fpCol: String): String =
    s"""transform(sequence(0, ${BloomHashes - 1}),
         j -> cast(conv(substr($fpCol, j*4 + 1, 4), 16, 10) as bigint))"""

  /** The set-bit table of a Bloom filter over `fpCol`: ≤ [[BloomBits]]
    * rows whatever the input size. Third member of the bounded-state
    * sketch family ([[hllRegisters]] max-merge, [[cmsCells]] sum-merge):
    * position-set UNION is the merge, expressed as a groupBy-distinct
    * onto the fixed bit domain — batch map-side partials and streaming
    * state both collapse to ≤ m rows. */
  def bloomBits(df: DataFrame, fpCol: String): DataFrame =
    df.select(explode(expr(bloomPositions(fpCol))).as("pos"))
      .groupBy(col("pos")).agg(count(lit(1)).as("n_set"))

  /** Fixed-edge quality-histogram bins (d64's PSI substrate). */
  val QualityBins = 10

  /** The bin of a [0,1] score under the FIXED-edge rule — one definition
    * shared by d64's PSI (both snapshots) and the streaming histogram
    * maintenance below; a drifted copy of the clamp or the edge count
    * would silently decouple the monitored distribution from the
    * baseline it's compared against. */
  def qualityBin(q: Column): Column =
    least(lit(QualityBins - 1L), floor(q * QualityBins).cast("long"))

  /** Quality-score histogram over `qCol`: ≤ [[QualityBins]] rows
    * whatever the input size. Fourth member of the bounded-state sketch
    * family (sum-merge, like [[cmsCells]]): a pure groupBy-count onto
    * the fixed bin domain, so batch map-side partials and Structured
    * Streaming state both hold ≤ 10 rows however long the stream runs —
    * the live side of a PSI monitor maintains exactly this frame and
    * compares it against a frozen baseline histogram. FIXED edges (not
    * quantiles) are what make it mergeable across a fleet and
    * comparable across dumps. Null scores carry no signal and drop. */
  def qualityHistogram(df: DataFrame, qCol: String): DataFrame =
    df.filter(col(qCol).isNotNull)
      .groupBy(qualityBin(col(qCol)).as("bin"))
      .agg(count(lit(1)).as("n"))

  /** Per-source token-count table over rows carrying (source, token
    * count): ≤ |sources| rows whatever the corpus size. Fifth member of
    * the bounded-state sketch family (sum-merge, like [[cmsCells]] /
    * [[qualityHistogram]]): a pure groupBy-sum onto the source domain,
    * so batch map-side partials and Structured Streaming state both
    * hold one row per source however long the ingest runs. This is the
    * live half of the d67 mixture-diversity monitor: maintain this
    * frame on the stream and read entropy / effective-source-count off
    * the ≤20-row table whenever the alarm evaluates. */
  def sourceTokenCounts(df: DataFrame, srcCol: String,
      nToksCol: String): DataFrame =
    df.groupBy(col(srcCol).as("source"))
      .agg(sum(col(nToksCol)).as("n_tokens"))

  /** Per-key first/second decimal-exact moments of a 6-dp-rounded value
    * column: (n, s = Σx as DECIMAL(18,6), ss = Σx² as DECIMAL(28,12))
    * per key tuple. Sixth member of the bounded-state sketch family
    * (sum-merge): when the keys span a FIXED domain (e29 keys on
    * (snapshot, dim) — ≤128 rows), batch map-side partials and
    * Structured Streaming state are both domain-sized however much data
    * flows through. This is the live half of the e29 drift monitor:
    * maintain the stream's per-dim moments, freeze a baseline copy, and
    * the z math reads two ≤64-row tables. The x² double→decimal cast is
    * deterministic cross-engine because the true product of two 6-dp
    * values is exactly a 12-dp decimal ≥ 5e-13 away from any half-ulp
    * boundary, while the double error is ~1e-16. Callers must pass x
    * ALREADY rounded to 6 dp (one definition of the rounding point —
    * here — keeps batch, stream, and oracle in lockstep). */
  def dimMoments(df: DataFrame, keyCols: Seq[String],
      xCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(xCol).cast("decimal(18,6)")).as("s"),
        sum((col(xCol) * col(xCol)).cast("decimal(28,12)")).as("ss"))

  /** Leading significant digit of a measure column — the Benford key,
    * taken on the ABSOLUTE value (the Benford convention, and the
    * dirty-data guard: a negative amount's leading character is '-',
    * which an ANSI cast turns into a task failure). floor of a 2-dp
    * double < 2^53 is exact, so the string round-trip is deterministic
    * in both engines; sub-1 amounts floor to digit 0, outside the 1-9
    * law domain (q54 carries them as rows, excluded from χ²); NULL
    * amounts yield a NULL digit. ONE definition shared by q54's batch
    * audit, its DuckDB oracle's structure, and the streaming
    * maintenance below. */
  def leadingDigit(amount: Column): Column =
    substring(floor(abs(amount)).cast("bigint").cast("string"), 1, 1)
      .cast("bigint")

  /** Leading-digit counts of a measure column: ≤9 rows whatever the
    * input size. Seventh member of the bounded-state sketch family
    * (sum-merge, like [[cmsCells]] / [[qualityHistogram]]): a pure
    * groupBy-count onto the fixed 1-9 digit domain, so batch map-side
    * partials and Structured Streaming state both hold ≤9 rows however
    * long the feed runs. This is the live half of a Benford ingest
    * monitor (q54's audit): maintain digit counts on the stream, read
    * the χ²-against-Benford alarm off the 9-row table whenever it
    * evaluates. */
  def benfordDigits(df: DataFrame, amountCol: String): DataFrame =
    df.select(leadingDigit(col(amountCol)).as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))

  /** Per-language marker-hit totals over a text column: ≤ |langs| rows
    * (4) whatever the corpus size. Eighth member of the bounded-state
    * sketch family (sum-merge): each text contributes one fixed-width
    * hit vector (native CountWordsIn per language, one codegen'd
    * projection), exploded onto the fixed language domain and folded
    * with map-side partials — so batch partials and Structured
    * Streaming state both hold ≤4 rows however long the ingest runs.
    * This is the live half of a language-mix monitor (d83's readout):
    * maintain these totals on the stream, read the mix shares off the
    * 4-row table whenever the alarm evaluates. */
  def langHitTotals(df: DataFrame, textCol: String): DataFrame = {
    import graft.functions.{TextExprs, TextFunctions}
    val lowered = lower(col(textCol))
    val pairs = TextFunctions.langMarkerWords.map { case (code, ws) =>
      struct(lit(code).as("lang"),
        coalesce(TextExprs.countWordsIn(lowered, ws).cast("bigint"),
          lit(0L)).as("hits"))
    }
    df.select(explode(array(pairs: _*)).as("p"))
      .groupBy(col("p.lang").as("lang"))
      .agg(sum(col("p.hits")).as("hits"))
  }

  /** Per-(month, category) counts of a dated categorical column: ninth
    * member of the bounded-state sketch family (sum-merge). State grows
    * one ≤|categories|-row stripe per calendar month — the same
    * calendar-horizon growth q55's day grid rides; a watermarked
    * monitor retains only its horizon's stripes. The live half of the
    * q65 mix-drift monitor: maintain these counts on the stream, read
    * the PSI-vs-prior-month alarm off the bounded grid whenever it
    * evaluates. The month key is ARITHMETIC (year·12 + month − 1, the
    * q58 convention) — never an engine-specific month id. */
  def categoryMonthCounts(df: DataFrame, dateCol: String,
      catCol: String): DataFrame =
    df.filter(col(dateCol).isNotNull)
      .groupBy((year(col(dateCol)) * 12 + month(col(dateCol)) - 1)
        .cast("bigint").as("month_idx"), col(catCol).as("category"))
      .agg(count(lit(1)).as("n"))

  /** Per-cell total/tombstone counts of an ANN index over rows carrying
    * (cell assignment, deleted flag): ≤ |cells| rows whatever the index
    * size. Tenth member of the bounded-state sketch family (sum-merge,
    * like [[cmsCells]]): a pure conditional-count groupBy onto the cell
    * domain, so batch map-side partials and Structured Streaming state
    * both hold one row per cell however long the insert/delete feed
    * runs. This is the LIVE half of the e27 compaction trigger: e27
    * audits tombstone pollution in batch by rescanning the index; a
    * deployed index instead maintains this frame on its mutation stream
    * and reads per-cell staleness (n_tomb / n_total — compute at alarm
    * time, never stored: only the two sums are mergeable) off the
    * bounded table whenever the compaction policy evaluates. Null cells
    * (unassigned rows) carry no signal and drop. */
  def cellLiveCounts(df: DataFrame, cellCol: String,
      delCol: String): DataFrame =
    df.filter(col(cellCol).isNotNull)
      .groupBy(col(cellCol).as("cell"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col(delCol), 1L).otherwise(0L)).as("n_tomb"))

  /** Per-source seen/passed counts of a boolean gate signal: ≤ |sources|
    * rows whatever the corpus size. Eleventh member of the bounded-state
    * sketch family (sum-merge, like [[cellLiveCounts]]): a pure
    * conditional-count groupBy onto the source domain, so batch map-side
    * partials and Structured Streaming state both hold one row per
    * source however long the ingest runs. This is the LIVE half of the
    * d75 source-admission monitor: maintain these counts on the crawl
    * stream and read each source's pass rate / Wilson lower bound off
    * the bounded table whenever the admission policy re-evaluates —
    * batch d75 computes the same substrate by rescanning the corpus.
    * `passCol` must be a non-null boolean (callers gate on concrete
    * signals; a null gate verdict is a scoring bug, not a state). */
  def gatePassCounts(df: DataFrame, srcCol: String,
      passCol: String): DataFrame =
    df.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col(passCol), 1L).otherwise(0L)).as("n_pass"))

  /** The percentile-resolution bin of a [0,1] quality score:
    * floor(score·100) ∈ 0..100. Finer than [[qualityBin]]'s 10 monitor
    * bins because a percentile THRESHOLD needs percentile resolution.
    * Both engines compute bit-identical score doubles (the d03-pinned
    * formula), so the floor lands in the same bin everywhere. ONE
    * definition shared by d101's calibration gate and the streaming
    * maintenance below. */
  def calibrationBin(q: Column): Column =
    floor(q * lit(100.0)).cast("bigint")

  /** Per-(source, percentile-bin) counts of a [0,1] quality score:
    * ≤ |sources|·101 rows whatever the corpus size. Twelfth member of
    * the bounded-state sketch family (sum-merge, like [[cmsCells]] /
    * [[qualityHistogram]]): a pure groupBy-count onto the
    * source × bin domain, so batch map-side partials and Structured
    * Streaming state both hold a domain-sized table however long the
    * crawl runs. This is the LIVE half of the d101 calibration gate:
    * batch d101 derives its histogram through this function and elects
    * per-source/global percentile thresholds from it; a deployed gate
    * instead maintains this frame on the ingest stream and re-elects
    * the thresholds off the bounded table whenever the calibration
    * policy re-evaluates — re-calibrating a 100 TB gate never rescans
    * the corpus. Null scores carry no signal and drop (mirrored as
    * `bin IS NOT NULL` in the d101 oracle). */
  def sourceQualityBins(df: DataFrame, srcCol: String,
      qCol: String): DataFrame =
    df.filter(col(qCol).isNotNull)
      .groupBy(col(srcCol).as("source"),
        calibrationBin(col(qCol)).as("bin"))
      .agg(count(lit(1)).as("n"))

  /** m20's fixed aspect-bucket set: (bucket id, target width, target
    * height). ONE definition shared by the batch plan, its oracle
    * structure, and the streaming maintenance below. */
  val AspectBuckets: Seq[(Long, Int, Int)] = Seq(
    (0L, 64, 64), (1L, 80, 56), (2L, 56, 80), (3L, 96, 48), (4L, 48, 96))

  /** The elected aspect bucket of a (width, height) pair — argmin over
    * [[AspectBuckets]] by |aspect − bucket aspect|, ties to the lower
    * bucket id — as a SCALAR (dist, b_idx, bw, bh) struct: array_min's
    * lexicographic struct order IS the tie-break, so election is a pure
    * codegen'd projection (no explode, no window — the reason this
    * sketch can stream at all: a per-key rank election can't run inside
    * a streaming aggregation, a scalar can). */
  def aspectBucket(w: Column, h: Column): Column = {
    val dw = w.cast("double")
    val dh = h.cast("double")
    array_min(array(AspectBuckets.map { case (i, bw, bh) =>
      struct(abs(dw / dh
          - lit(bw).cast("double") / lit(bh).cast("double")).as("dist"),
        lit(i).as("b_idx"), lit(bw).as("bw"), lit(bh).as("bh"))
    }: _*))
  }

  /** Per-aspect-bucket image counts over rows carrying (width, height):
    * ≤ |[[AspectBuckets]]| rows whatever the corpus size. Thirteenth
    * member of the bounded-state sketch family (sum-merge, like
    * [[cmsCells]]): the scalar [[aspectBucket]] election folds straight
    * into a groupBy-count onto the 5-bucket domain, so batch map-side
    * partials and Structured Streaming state both hold ≤5 rows however
    * long the media ingest runs. This is the LIVE half of the m20
    * batch-shape planner: batch m20 derives its populations through
    * this election and reads crop-loss stats off the same grid; a
    * deployed trainer maintains these counts on the ingest stream and
    * re-checks bucket balance (a starving bucket wastes a fleet's batch
    * slots) off the bounded table whenever the batching policy
    * re-evaluates. Null/zero geometry carries no signal and drops. */
  def aspectBucketCounts(df: DataFrame, wCol: String,
      hCol: String): DataFrame =
    df.filter(col(wCol).isNotNull && col(hCol).isNotNull
        && col(wCol) > 0 && col(hCol) > 0)
      .groupBy(aspectBucket(col(wCol), col(hCol)).getField("b_idx")
        .as("b_idx"))
      .agg(count(lit(1)).as("n_images"))
}
