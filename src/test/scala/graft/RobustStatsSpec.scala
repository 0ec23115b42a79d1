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
}
