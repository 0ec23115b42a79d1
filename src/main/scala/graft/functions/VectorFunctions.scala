package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over ArrayType columns.
  *
  * All folds are strict left-to-right (`aggregate`), so double results are
  * deterministic under any partitioning AND bit-identical to DuckDB's
  * list_sum in the oracle (verified empirically at sf0.01). Everything is
  * codegen-friendly builtin higher-order functions — no UDFs.
  */
object VectorFunctions {

  /** Widen a float array to double (float→double is exact). */
  def asDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Dot product of two equal-length double arrays — the native one-pass
    * expression (VectorExprs.DotProduct); bit-identical to the fold form
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` (strict left-to-right
    * accumulation) but fused into one codegen'd loop — the interpreted
    * fold dominated e13's ADC scan (probes × corpus dots). */
  def dot(a: Column, b: Column): Column = VectorExprs.dot(a, b)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity — the native one-pass expression (VectorExprs);
    * bit-identical to `dot(a,b)/(norm(a)*norm(b))` (strict left-to-right
    * accumulation, see CosineSim's scaladoc) but ~an order of magnitude
    * faster in the candidate-pair hot loops. */
  def cosine(a: Column, b: Column): Column = VectorExprs.cosine(a, b)

  /** DuckDB mirrors of the above, for oracle SQL generation. */
  def sqlDot(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> p[1] * p[2]))"
  def sqlNorm(a: String): String =
    s"sqrt(list_sum(list_transform($a, x -> x * x)))"
  def sqlCos(a: String, b: String): String =
    s"${sqlDot(a, b)} / (${sqlNorm(a)} * ${sqlNorm(b)})"
}
