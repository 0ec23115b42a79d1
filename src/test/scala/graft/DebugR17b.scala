package graft

/** Dev harness: print executed plans of the round-17 batch-2 queries
  * (q43/q44/d62/e22) for shuffle/exchange auditing. Run:
  * `sbt "Test/runMain graft.DebugR17b"` (SCALING.md cites the output). */
object DebugR17b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate("graft-debug-r17b")
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q43_session_stats", "q44_daily_gapfill", "d62_zipf_fit",
        "e22_sq8_recall")
    names.foreach { n =>
      val q = graft.queries.GraftQuery.all.find(_.name == n).get
      val df = q.run(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val p = df.queryExecution.executedPlan.toString
      val nEx = "Exchange".r.findAllIn(p).length
      println(s"==== $n  exchanges=$nEx ====")
      println(df.queryExecution.executedPlan.treeString.take(4000))
    }
    spark.stop()
  }
}
