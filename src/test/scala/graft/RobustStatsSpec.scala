package graft

import graft.operators.RobustStats

/** Semantic pins for the value-histogram exact grouped median (q29's
  * engine): lower-median definition on odd/even counts, histogram
  * collapsing of tied values, and single-row groups.
  */
class RobustStatsSpec extends SparkSpec {
  import spark.implicits._

  private def medians(rows: Seq[(String, Long)]): Map[String, Long] =
    RobustStats.groupedMedian(rows.toDF("k", "v"), "k", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("lower median: odd count picks the middle, even count the lower " +
      "of the two middles") {
    val m = medians(Seq(
      "odd" -> 1L, "odd" -> 3L, "odd" -> 5L,
      "even" -> 1L, "even" -> 2L, "even" -> 3L, "even" -> 4L))
    assert(m == Map("odd" -> 3L, "even" -> 2L))
  }

  test("tied values collapse into one histogram bucket and still rank " +
      "correctly") {
    // sorted multiset {1, 7, 7}: rank ⌈3/2⌉ = 2 → 7; the 7-bucket's
    // cumulative range [2, 3] must cover the target even though the
    // histogram has only two rows
    val m = medians(Seq("t" -> 7L, "t" -> 7L, "t" -> 1L))
    assert(m == Map("t" -> 7L))
  }

  test("a single-row group is its own median; groups don't leak into " +
      "each other") {
    val m = medians(Seq("solo" -> 42L, "pair" -> 10L, "pair" -> 20L))
    assert(m == Map("solo" -> 42L, "pair" -> 10L))
  }

  test("insertion order never changes the result (histogram is " +
      "order-free)") {
    val rows = Seq("k" -> 5L, "k" -> 1L, "k" -> 9L, "k" -> 1L, "k" -> 9L)
    assert(medians(rows) == medians(rows.reverse))
    assert(medians(rows) == Map("k" -> 5L))
  }

  test("q33 sketch percentiles honor the GK rank-error bound against the " +
      "real value multiset (the q30-exact anchor)") {
    // The rows-only anchor for q33: for every group and percentile p, the
    // sketch's answer must be an actual data value whose rank in the
    // sorted multiset is within n/accuracy (+1 for boundary definitions)
    // of the target rank — the Greenwald-Khanna contract. At fixture
    // scale n << accuracy, so this effectively pins the sketch to the
    // exact order statistics q30 computes.
    import org.apache.spark.sql.functions._
    val q33 = graft.queries.GraftQuery.all
      .find(_.name == "q33_percentiles_sketch").get
    val out = q33.run(spark, sfDir).collect()
    assert(out.nonEmpty)
    val vals = graft.sources.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value").cast("double"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    out.foreach { r =>
      val k = r.getString(0)
      val sorted = vals(k)
      val n = sorted.length
      assert(r.getLong(1) == n.toLong, s"$k: n_values mismatch")
      Seq(2 -> 0.5, 3 -> 0.9, 4 -> 0.99).foreach { case (i, p) =>
        val got = r.getDouble(i)
        assert(sorted.contains(got), s"$k p$p: $got is not a data value")
        // rank range of `got` in the sorted multiset (1-based, ties span)
        val lo = sorted.indexWhere(_ == got) + 1
        val hi = sorted.lastIndexWhere(_ == got) + 1
        val target = p * n
        val tol = n / 10000.0 + 1.0
        assert(lo - tol <= target && target <= hi + tol,
          s"$k p$p: value $got rank [$lo,$hi] vs target $target (n=$n)")
      }
    }
  }
}
