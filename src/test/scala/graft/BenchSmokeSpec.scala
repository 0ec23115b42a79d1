package graft

import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._
import scala.concurrent.{Await, Future}

import graft.queries.GraftQuery

/** Every registered query must materialize through the noop sink at
  * sf0.001 inside a per-query time budget. This is the in-`sbt test`
  * tripwire for planner pathologies — round 5 shipped a query whose plan
  * was fine at unit-test row counts but non-terminating at bench scale
  * (InferFiltersFromGenerate inlining, see Winnowing's post-mortem), and
  * nothing before the driver's sf0.1 bench exercised full materialization
  * of every registered query. A budget violation here is a plan-shape bug,
  * not a slow machine: at sf0.001 every query runs in well under a second
  * when the plan is right.
  *
  * (This catches crashes and gross blowups; the procedural rule from the
  * round-5 verdict still applies — every NEW query gets a recorded sf0.1
  * spot-bench via SPARK_GRAFT_BENCH_ONLY before the round closes.) */
class BenchSmokeSpec extends SparkSpec {

  private val budget = 90.seconds

  test(s"every registered query materializes at sf0.001 within $budget") {
    val failures = Seq.newBuilder[String]
    GraftQuery.all.foreach { q =>
      val f = Future {
        // Scope every job this query submits to a cancellable group, so a
        // budget overrun kills ONLY this query's jobs — cancelAllJobs on
        // the shared session would also kill any other suite's in-flight
        // jobs if suite-level parallelism is ever enabled.
        spark.sparkContext.setJobGroup(s"smoke-${q.name}", q.name, true)
        try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        finally spark.sparkContext.clearJobGroup()
      }
      try Await.result(f, budget)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(s"smoke-${q.name}")
          // Wait (bounded) for the hung action to actually die — an
          // orphaned save() would keep competing for cores and make the
          // NEXT queries blow their budgets too, smearing one pathology
          // into a misleading multi-query failure. Repeat the cancel:
          // a job submitted between the first cancel and the action
          // noticing is not covered by it.
          var drained = false
          val deadline = System.nanoTime() + 30.seconds.toNanos
          while (!drained && System.nanoTime() < deadline) {
            try { Await.ready(f, 1.second); drained = true }
            catch { case _: java.util.concurrent.TimeoutException =>
              spark.sparkContext.cancelJobGroup(s"smoke-${q.name}") }
          }
          // Last resort for an action that ignored its group cancel: a
          // session-wide kill. Only reached when the test is already
          // failing, so the cross-suite blast radius is acceptable —
          // better than the orphan competing for cores across every
          // remaining query.
          if (!drained) spark.sparkContext.cancelAllJobs()
          failures += s"${q.name}: exceeded $budget at sf0.001 — plan-shape pathology" +
            (if (drained) "" else " (action did not terminate after cancel)")
        case e: Throwable =>
          failures += s"${q.name}: ${e.getClass.getSimpleName}: ${e.getMessage}"
      }
    }
    val fs = failures.result()
    assert(fs.isEmpty, fs.mkString("\n"))
  }
}
