package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen expression for cosine similarity over two array<double>
  * columns.
  *
  * The `functions._` formulation (three `aggregate`/`zip_with`/`transform`
  * folds) evaluates interpreted lambdas per element — ~6 closure dispatches
  * and several array allocations per 64-dim pair, which dominates the
  * bucketed-ANN queries (the per-pair cosine is the inner loop of every
  * candidate join). This expression is one fused primitive loop.
  *
  * Value parity with the fold form (and with the DuckDB oracle's
  * `list_sum(list_transform(...))`): all three accumulations (dot, |a|²,
  * |b|²) run strictly left-to-right in element order, so the doubles are
  * bit-identical to the previous formulation — each accumulator's sequence
  * of additions is unchanged. Verified by VectorSearchSpec and the e01-e04
  * oracle rows.
  *
  * Null semantics match the fold form: null array, mismatched lengths, or
  * any null element → null; zero denominator → null (Spark's `Divide`
  * yields null on zero divisor in non-ANSI mode).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}_r = graft.functions.VectorOps.cosine($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Native codegen dot product over two array<double> columns — the same
  * fused-loop upgrade as [[CosineSim]] for the folds that DON'T normalize
  * (PQ's ADC score is the hot caller: probes × corpus interpreted
  * `aggregate(zip_with(...))` folds dominated e13's scan). Accumulation is
  * strictly left-to-right in element order, so values are bit-identical to
  * the `aggregate`/`zip_with` formulation and to DuckDB's
  * `list_sum(list_transform(list_zip(...)))`. Null semantics match the
  * fold form: null array, length mismatch, or any null element → null. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}_r = graft.functions.VectorOps.dot($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** One-pass dot; see [[DotProduct]] for the exact-parity contract. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var d = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      d += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(d)
  }

  /** One-pass cosine; see [[CosineSim]] for the exact-parity contract.
    * Returns a boxed Double or null. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null else java.lang.Double.valueOf(dot / denom)
  }
}

object VectorExprs {
  /** Cosine similarity of two array<double> columns (native expression). */
  def cosine(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSim(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Dot product of two array<double> columns (native expression). */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotProduct(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
