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

  /** Left-fold dot product of two equal-length double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

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
