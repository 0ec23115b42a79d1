package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training (Sennrich et al. 2016) — the
  * iterative flagship of the tokenizer pipeline; d68 pins its step 0
  * (the first pair-count table) under the oracle hash.
  *
  * Runs at the WORD-FREQUENCY-TABLE grain, which is both the paper's
  * formulation and the scale-correct shape: the corpus collapses ONCE to
  * (word, count) — a map-side-combinable domain fold, vocabulary-sized
  * regardless of corpus rows — and every merge step then scans only that
  * bounded table. k steps = k bounded scans + k one-row argmax actions;
  * the corpus itself is never rescanned.
  *
  * Each step is greedy BPE exactly: count symbol pairs weighted by word
  * frequency, take the most frequent pair (ties broken lexicographically
  * — a fixed, engine-independent rule), and rewrite every word's symbol
  * sequence by merging that pair left-to-right non-overlapping. The
  * rewrite is a native `aggregate` lambda (append-or-replace-last fold),
  * so greedy overlap semantics ("aaaa" + (a,a) → [aa, aa]) hold by
  * construction and the whole step stays inside codegen'd column ops.
  *
  * The per-step argmax is a driver-side `.head()` on a 1-row frame — a
  * contractually bounded action of the same class as the IVF centroid
  * seeds (VectorSearch.scala): the merge RULE is driver-resident by
  * algorithm design (it must be broadcast into the next step's fold),
  * never per-row data.
  */
object Bpe {

  /** One merge step's outcome. */
  final case class Merge(step: Int, left: String, right: String,
      pairCount: Long)

  /** Greedy left-to-right merge of adjacent (l, r) symbol pairs in a
    * symbol array — the BPE rewrite. Append-or-replace-last fold: a
    * just-merged symbol is `l || r` (strictly longer than `l`), so it
    * can never immediately re-match as the left side of the same rule —
    * greedy non-overlap comes free of extra state. */
  def mergePair(syms: Column, l: String, r: String): Column =
    aggregate(syms,
      expr("cast(array() as array<string>)"),
      (out, x) => when(
        size(out) > 0 &&
          element_at(out, -1) === lit(l) && x === lit(r),
        concat(slice(out, lit(1), size(out) - 1),
          array(lit(l + r))))
        .otherwise(concat(out, array(x))))

  /** Weighted adjacent-pair counts over (syms, cnt) rows — d68's shape
    * generalized to arbitrary symbol sequences. */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(expr(
        """transform(sequence(0, size(syms) - 2),
             i -> struct(syms[i] AS l, syms[i+1] AS r))""")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("n"))

  /** Train `k` merges over a (word, cnt) frequency table. Returns the
    * merge table in step order. Each step's top pair count is
    * non-increasing (a new pair (x, lr) only occurs where (x, l) did, so
    * no count can exceed the maximum just consumed) — spec-asserted. */
  def train(wordCounts: DataFrame, k: Int): Seq[Merge] = {
    var words = wordCounts.select(
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        .as("syms"),
      col("cnt"))
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val top = pairCounts(words)
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) {
        // no adjacent pair left (tiny or fully merged vocabulary):
        // every later step would rerun the same provably empty
        // pair-count job — stop instead
        exhausted = true
      } else {
        val row = top.head
        val (l, r, n) = (row.getString(0), row.getString(1), row.getLong(2))
        merges += Merge(step, l, r, n)
        // keep the fold lineage flat across steps: the table is
        // vocabulary-sized, so a local checkpoint is one tiny write
        words = Checkpoints.barrier(
          words.select(mergePair(col("syms"), l, r).as("syms"), col("cnt")))
      }
      step += 1
    }
    merges.result()
  }
}
