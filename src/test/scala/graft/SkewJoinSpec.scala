package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Pins the skew seam of the 100 TB join story: GraftSession enables
  * `spark.sql.adaptive.skewJoin`, and this spec proves the machinery
  * actually ENGAGES — a sort-merge join with one hot key must come out of
  * AQE with its skewed partition split (the `isSkewJoin` marker on the
  * final plan), not as one straggler task. The skew thresholds are
  * lowered for the test because the defaults (256 MB partitions) are
  * sized for real clusters, not fixtures; what's under test is that the
  * engine's session wiring lets AQE re-plan skew at runtime, which no
  * static plan assertion can show.
  *
  * Mutates session confs (broadcast threshold must be off to force SMJ);
  * restores them in `finally` — safe because ScalaTest runs suites'
  * tests sequentially on the shared session.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits the hot key of a skewed sort-merge join at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      // 200k fact rows, 80% on key 0 (the hot shuffle partition), the
      // rest uniform over 1..999; a 1000-row dim side.
      val fact = spark.range(200000).select(
        when(col("id") % 5 === 0, col("id") % 999 + 1).otherwise(lit(0L))
          .as("k"),
        col("id").as("v"))
      val dim = spark.range(1000).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("name"))
      val joined = fact.join(dim, "k")
      assert(joined.collect().length == 200000)
      val adaptive = joined.queryExecution.executedPlan.collectFirst {
        case a: AdaptiveSparkPlanExec => a
      }.getOrElse(fail("expected an AdaptiveSparkPlanExec root"))
      val finalPlan = adaptive.executedPlan.toString
      assert(finalPlan.contains("SortMergeJoin"),
        s"test setup drifted — expected a sort-merge join:\n$finalPlan")
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join split:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
