package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered engine query plus its DuckDB oracle.
  *
  * `run` builds the DataFrame against the star-schema dir; `oracle` is the
  * equivalent ANSI SQL the driver executes in DuckDB over the same parquet
  * tables (registered by bare table name). `oracle = None` → the driver
  * records a weaker rows-only check (used for ops DuckDB can't replicate,
  * e.g. HLL sketches).
  *
  * Cross-engine determinism rules used throughout (the oracle compare is a
  * value-hash, so results must match bit-for-bit):
  *   - Sums/averages over double columns go through exact DECIMAL(18,2)
  *     arithmetic and are cast to double only at the end — double summation
  *     order is nondeterministic under parallelism, decimal is exact.
  *   - Window/top-k orderings always carry a unique tie-break key.
  *   - Counts / row_numbers / array sizes are cast to bigint to match
  *     DuckDB's BIGINT results.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  /** Every registered query: star-schema coverage matrix (§2.7), text
    * analysis / dedup, similarity search. SparkEntry derives its maps from
    * this single list. */
  lazy val all: Seq[GraftQuery] =
    StarQueries.all ++ TextQueries.all ++ SimQueries.all ++ MediaQueries.all

  /** Exact decimal view of a 2-decimal double measure column. */
  def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Order-insensitive exact sum of a 2-decimal double column, as double. */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** The same expression in DuckDB SQL. */
  def dsumSql(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"

  /** Exact int64 FLOOR division — matches DuckDB's `//` on the whole
    * int64 domain. Spark's `div` truncates toward zero, so the two
    * diverge on negative dividends (pre-1970 nanos timestamps);
    * subtracting `pmod` (always-non-negative remainder) first makes
    * plain `div` exact floor, with no double-precision detour. */
  def floorDiv(c: Column, divisor: Long): Column =
    call_function("div", c - pmod(c, lit(divisor)), lit(divisor))
}
