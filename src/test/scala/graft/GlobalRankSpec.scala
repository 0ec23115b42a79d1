package graft

import org.apache.spark.sql.functions._

import graft.operators.GlobalRank

class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  test("assigns exact 1..N ranks following the total order") {
    val df = Seq((3L, "c"), (1L, "a"), (2L, "b"), (5L, "e"), (4L, "d"))
      .toDF("k", "v")
    val ranked = GlobalRank.withRowNumber(df, Seq(col("k").asc))
      .select("k", "rn").as[(Long, Long)].collect().toMap
    assert(ranked == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("rank is independent of input partitioning (the offset scheme is " +
      "exact, not per-partition)") {
    val df = spark.range(0, 1000).select(
      (col("id") * 37 % 1000).as("k"), col("id").as("payload"))
    val r1 = GlobalRank.withRowNumber(df.repartition(1), Seq(col("k").asc))
    val r7 = GlobalRank.withRowNumber(df.repartition(7), Seq(col("k").asc))
    val m1 = r1.select("k", "rn").as[(Long, Long)].collect().sorted
    val m7 = r7.select("k", "rn").as[(Long, Long)].collect().sorted
    assert(m1.sameElements(m7))
    // k = id*37 mod 1000 is a bijection on [0,1000): rank must equal k+1
    assert(m1.forall { case (k, rn) => rn == k + 1 })
  }

  test("ties broken by the caller's tie-break key, descending order " +
      "supported") {
    val df = Seq((10.0, 2L), (10.0, 1L), (20.0, 3L)).toDF("spend", "id")
    val out = GlobalRank
      .withRowNumber(df, Seq(col("spend").desc, col("id").asc))
      .select("id", "rn").as[(Long, Long)].collect().toMap
    assert(out == Map(3L -> 1L, 1L -> 2L, 2L -> 3L))
  }
}
