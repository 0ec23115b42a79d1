package graft

/** Benchmark main: times every registered query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line for the driver (BENCH_r{N}.json).
  *
  * Timing uses a full materialization through the noop sink — a `.count()`
  * would let Catalyst prune every column and bench a near-empty scan
  * instead of the real query (round-3 verdict, What's wrong #2).
  *
  * One untimed warmup pass runs first: a cold JVM charges the first few
  * queries seconds of one-time cost (JIT, codegen compiler, parquet reader
  * init — measured ~4.7 s for a trivial first scan) that has nothing to do
  * with the query being timed. The timed pass then measures steady-state
  * per-query cost, which is what a long-lived cluster session sees.
  * Disable with SPARK_GRAFT_BENCH_WARMUP=0. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-bench")
    // Dev loop: SPARK_GRAFT_BENCH_ONLY=q01,d12 times just those queries.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    if (sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1") != "0") {
      selected.foreach { case (_, fn) =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () } // failures reported in the timed pass
      }
    }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getClass.getName}: ${e.getMessage}")
            false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // failed queries report null (not their time-to-failure) so the driver
    // can't mistake a crash for a fast run; they're excluded from total.
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v.toString else "null") }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, true) => v }.sum
    val failures = results.count(!_._3)
    println(s"""{"metric":"total","value":$total,"unit":"sec","failures":$failures,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
