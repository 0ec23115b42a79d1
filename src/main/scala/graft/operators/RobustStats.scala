package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact grouped order statistics in histogram form — the scale-right way
  * to compute an EXACT median per group when groups are few but huge.
  *
  * A naive per-group median sorts each group's rows inside one window
  * partition: with a 5-value grouping key over a 100 TB fact table that is
  * five straggler tasks sorting 20 TB each. This operator instead reduces
  * the data to its VALUE HISTOGRAM first — `groupBy(key, value).count()`
  * gets full map-side partial aggregation, so what reaches the exchange is
  * bounded by the (key × distinct-value) domain, not the row count — and
  * then runs the rank arithmetic on histogram rows. The in-partition
  * window sorts |distinct values per key| rows, which for bounded-domain
  * measures (prices in cents, scores, durations) is orders of magnitude
  * smaller than the group.
  *
  * Median definition: the LOWER median — the element with 1-based rank
  * ⌈n/2⌉ in the group's sorted multiset. Always an element of the data
  * (never an interpolated midpoint), so results are engine-exact with no
  * float arithmetic; ties need no break because equal values share a
  * histogram bucket.
  */
object RobustStats {

  /** Exact lower median of `valCol` per `keyCol`, in one histogram pass.
    *
    * Returns one row per key: (keyCol, median). `valCol` should be an
    * exact type (integral / decimal) — pass doubles through
    * `GraftQuery.dec` first so equal values genuinely collide into one
    * histogram bucket.
    *
    * Plan shape: one map-side-combinable groupBy, then ONE exchange on
    * keyCol feeding both window functions (cumulative count and group
    * total share the partitioning), then a filter that keeps exactly the
    * bucket whose cumulative range covers rank ⌈n/2⌉.
    */
  def groupedMedian(df: DataFrame, keyCol: String, valCol: String,
      outCol: String = "median"): DataFrame =
    medianOfHistogram(valueHistogram(df, keyCol, valCol),
      keyCol, valCol, "c", outCol)

  /** `groupBy(key, value).count()` — the map-side-combinable reduction
    * every order statistic here runs on. Exposed so a caller computing
    * SEVERAL statistics of the same (or a derived) value can build the
    * histogram ONCE and stay in histogram space: q29 derives its
    * deviation histogram from the price histogram (weights re-summed
    * under the |price − med| mapping), so the fact table is scanned once
    * for the whole median + MAD + outlier-count chain. */
  def valueHistogram(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy(col(keyCol), col(valCol)).agg(count(lit(1)).as("c"))

  /** Histogram rows augmented with `cum` (cumulative count in value
    * order) and `n` (group total): the shared substrate for every rank
    * statistic here. ONE exchange on keyCol feeds both window functions
    * (the unordered total shares the ordered window's partitioning), and
    * callers fold arbitrary rank predicates on top — medianOfHistogram
    * filters one bucket, q30 folds three percentiles in a single agg. */
  def rankedHistogram(hist: DataFrame, keyCol: String, valCol: String,
      cntCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol))
    hist
      .withColumn("cum", sum(col(cntCol)).over(byKey.orderBy(col(valCol))))
      .withColumn("n", sum(col(cntCol)).over(byKey))
  }

  /** Rank arithmetic over an existing histogram (keyCol, valCol, cntCol):
    * the ranked histogram plus a filter that keeps exactly the bucket
    * whose cumulative range covers rank ⌈n/2⌉. */
  def medianOfHistogram(hist: DataFrame, keyCol: String, valCol: String,
      cntCol: String, outCol: String = "median"): DataFrame =
    rankedHistogram(hist, keyCol, valCol, cntCol)
      // target rank ⌈n/2⌉ = (n+1) div 2 (n ≥ 1, so plain div is floor
      // div); the median bucket is the one whose cumulative rank range
      // [cum-c+1, cum] contains the target
      .withColumn("tgt", call_function("div", col("n") + 1, lit(2L)))
      .filter(col("cum") >= col("tgt") &&
        (col("cum") - col(cntCol)) < col("tgt"))
      .select(col(keyCol), col(valCol).as(outCol))
}
