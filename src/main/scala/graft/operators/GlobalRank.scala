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

  /** `df` plus a 1-based `rankCol` AND an exact running total `cumCol`
    * of a LongType `valueCol` (integer units — cents, tokens, bytes —
    * so the prefix sums stay exact) following `sort`'s total order: the
    * distributed CUMULATIVE SUM the Pareto/ABC family needs, which a
    * bare `sum().over(Window.orderBy(...))` plans as a single-partition
    * window. Same two-pass scheme as [[withRowNumber]]: range-sort,
    * then ONE light stats job collecting each partition's (row count,
    * value sum), whose scan-left prefixes seed a per-partition
    * imperative pass. The sorted RDD is PERSISTED (MEMORY_AND_DISK)
    * across the two jobs: without it the output pass re-runs the range
    * sort (doubling sort cost), and — worse — correctness would rest on
    * the recomputed range partitioning being bitwise-identical across
    * jobs, which a nondeterministically ordered upstream source breaks.
    * The cache is released by Spark's ContextCleaner once the returned
    * frame (whose lineage holds the only reference) becomes unreachable
    * — an explicit unpersist here would race the consuming job, and one
    * deferred to "after consumption" is not expressible from inside the
    * operator. NULL values count as 0. EAGER like [[withRowNumber]]
    * (the stats job runs at call time). */
  def withRunningTotal(df: DataFrame, sort: Seq[Column], valueCol: String,
      rankCol: String = "rn", cumCol: String = "cum"): DataFrame = {
    require(!df.columns.contains(rankCol) && !df.columns.contains(cumCol),
      s"'$rankCol'/'$cumCol' collides with an existing column")
    val sorted = df.orderBy(sort: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    require(sorted.schema(vIdx).dataType == LongType,
      s"'$valueCol' must be LongType (exact integer units)")
    val rdd = sorted.rdd.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val stats = rdd.mapPartitionsWithIndex { (i, it) =>
      var n = 0L; var s = 0L
      it.foreach { r =>
        n += 1L; if (!r.isNullAt(vIdx)) s += r.getLong(vIdx)
      }
      Iterator((i, n, s))
    }.collect().sortBy(_._1)
    val nOff = stats.scanLeft(0L)(_ + _._2).init
    val sOff = stats.scanLeft(0L)(_ + _._3).init
    val schema = sorted.schema
      .add(rankCol, LongType, nullable = false)
      .add(cumCol, LongType, nullable = false)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var rn = nOff(i); var cum = sOff(i)
      it.map { r =>
        rn += 1L
        if (!r.isNullAt(vIdx)) cum += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ rn :+ cum)
      }
    }
    sorted.sparkSession.createDataFrame(out, schema)
  }
}
