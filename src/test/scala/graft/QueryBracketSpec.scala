package graft

import org.apache.spark.sql.functions._

import graft.queries.GraftQuery
import graft.sources.Tables

/** Quantified bounds for queries whose outputs can't hash-match a DuckDB
  * oracle (sketches): the rows-only driver check is upgraded here to a
  * numeric bracket against the exact answer. */
class QueryBracketSpec extends SparkSpec {

  test("q17: HLL approx_count_distinct within 5% of exact per event_type") {
    // Spark's approx_count_distinct default rsd is 5%; the per-group
    // cardinalities here (hundreds-thousands) sit where HLL++'s sparse /
    // bias-corrected estimators hold that bound comfortably.
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")) {
      val approx = GraftQuery.all.find(_.name == "q17_events_approx_users").get
        .run(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = Tables.events(spark, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("exact_users"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(approx.keySet == exact.keySet)
      for ((et, ex) <- exact) {
        val ap = approx(et)
        val relErr = math.abs(ap - ex).toDouble / ex
        assert(relErr <= 0.05,
          s"$dir/$et: approx=$ap exact=$ex relative error $relErr > 5%")
      }
    }
  }
}
