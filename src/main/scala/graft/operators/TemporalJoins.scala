package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of and range (interval) joins — two join shapes Spark has no native
  * operator for, composed scale-safely from built-ins (SURVEY.md §2.7
  * joins row; the brief's named custom-operator examples).
  *
  * Both avoid the naive inequality-join formulation, which Spark can only
  * plan as a broadcast-nested-loop (O(n·m) comparisons and a broadcast
  * requirement) — at 100 TB neither is an option:
  *
  *   - [[asOfJoin]]: union both sides tagged, one shuffle on the key, one
  *     window pass carrying the most recent right row forward — O(n log n)
  *     per key group, no join at all.
  *   - [[rangeJoin]]: quantize the right timestamp into interval-width
  *     buckets, explode each left row to the (at most two, for window ≤
  *     bucket width) candidate buckets, equi-join on (key, bucket), then
  *     apply the exact range predicate — a hash join whose key bounds the
  *     candidate set, never all-pairs.
  */
object TemporalJoins {

  /** For each left row, attach the right row with the greatest `ts` ≤ the
    * left row's `ts`, matching on equality of `key` (a left as-of join —
    * unmatched left rows get a null `asof`). Output: all left columns plus
    * an `asof` struct of the matched right row (null if none).
    *
    * Right rows must be unique per (key, ts) — pre-dedup with a window if
    * not (ties would make the match nondeterministic). Ties between a left
    * and a right row at the same ts match (inclusive, like `>=`).
    *
    * One shuffle (on `key`) + one in-partition sort — the distributed
    * as-of shape; never an inequality join. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String): DataFrame = {
    val lu = left.select(col(key).as("_k"), col(ts).as("_ts"), lit(1).as("_side"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("_l"),
      lit(null).cast(StructType(right.schema)).as("_r"))
    val ru = right.select(col(key).as("_k"), col(ts).as("_ts"), lit(0).as("_side"),
      lit(null).cast(StructType(left.schema)).as("_l"),
      struct(right.columns.map(col).toIndexedSeq: _*).as("_r"))
    // right rows (_side=0) sort before left rows at equal ts, so an
    // equal-ts right row is visible to the left row's running `last`
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lu.unionByName(ru)
      .withColumn("asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_l.*"), col("asof"))
  }

  /** All (left, right) pairs with equal `key` and
    * `right.rTs` ∈ [left.lTs + lowOffset, left.lTs + highOffset]
    * (inclusive both ends; offsets in the timestamp's own unit, e.g.
    * nanos). Output columns: `l` and `r` structs of the two rows.
    *
    * Timestamps are assumed non-negative (integer `div` quantization).
    * Right rows land in one bucket of width = the window span; left rows
    * explode to the candidate bucket range (two buckets when the window
    * equals the bucket width), so the equi-join key (key, bucket) bounds
    * candidates and the exact predicate filters the rest. */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      lTs: String, rTs: String, lowOffset: Long, highOffset: Long): DataFrame = {
    require(highOffset >= lowOffset, "highOffset must be >= lowOffset")
    val w = math.max(highOffset - lowOffset, 1L)
    val l = left.select(struct(left.columns.map(col).toIndexedSeq: _*).as("l"),
        col(key).as("_lk"), col(lTs).as("_lts"))
      .withColumn("_bucket", explode(sequence(
        expr(s"(_lts + (${lowOffset}L)) div ${w}L"),
        expr(s"(_lts + (${highOffset}L)) div ${w}L"))))
    val r = right.select(struct(right.columns.map(col).toIndexedSeq: _*).as("r"),
        col(key).as("_rk"), col(rTs).as("_rts"))
      .withColumn("_rbucket", expr(s"_rts div ${w}L"))
    l.join(r, col("_lk") === col("_rk") && col("_bucket") === col("_rbucket") &&
        col("_rts") >= col("_lts") + lowOffset &&
        col("_rts") <= col("_lts") + highOffset)
      .select(col("l"), col("r"))
  }
}
