package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Exact global row numbering over a total order — WITHOUT the
  * single-partition window that `row_number().over(Window.orderBy(...))`
  * plans (Spark moves every row to one task when the window has no
  * partitionBy; a non-starter past a few million rows).
  *
  * Shape: the classic two-pass distributed ranking. `orderBy` produces a
  * RANGE-partitioned total sort (each partition holds a contiguous key
  * range, sorted); `zipWithIndex` then runs one lightweight count job
  * over the sorted partitions and assigns each row its partition-prefix
  * offset + local index — exact, deterministic given a total order (the
  * caller must include a unique tie-break key), and never concentrates
  * rows. This is the one legitimate RDD drop-down in the codebase: the
  * offset scheme needs per-partition imperative indexing that no
  * DataFrame operator expresses (SPARK-24561's unbounded-window gap).
  *
  * Cost: one extra count job over the sorted output (zipWithIndex's
  * first pass) — the sort itself is the dominant term and is the same
  * sort any exact ranking needs. Rows leave codegen for the zip pass;
  * rank consumers downstream re-enter it.
  */
object GlobalRank {

  /** `df` plus a 1-based `rankCol` long column following `sort`'s total
    * order. `sort` MUST be a total order (include a unique key last).
    *
    * EAGER: `zipWithIndex` submits its count job at *call* time, so
    * constructing the returned DataFrame already runs the full sort —
    * this is not a lazily-planned operator like the rest of the API. */
  def withRowNumber(df: DataFrame, sort: Seq[Column],
      rankCol: String = "rn"): DataFrame = {
    require(!df.columns.contains(rankCol),
      s"rank column '$rankCol' collides with an existing column")
    val sorted = df.orderBy(sort: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    sorted.sparkSession.createDataFrame(ranked, schema)
  }
}
