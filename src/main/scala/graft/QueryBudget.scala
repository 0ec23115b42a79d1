package graft

import java.util.concurrent.{SynchronousQueue, TimeUnit}

import org.apache.spark.sql.SparkSession

/** Per-query wall-clock budget shared by the Verify and Bench mains.
  *
  * One hung or runaway query must cost ONE artifact entry, not the whole
  * round: the driver gives each round a global budget, so before this
  * guard a single stuck job silently forfeited every query after it.
  * `run` executes the body on a daemon worker under a Spark job group
  * with `interruptOnCancel = true`; on timeout the group's jobs are
  * cancelled (freeing the executor threads) and the caller gets an error
  * string to record. The worker thread is a daemon, so even a body stuck
  * OUTSIDE Spark (driver-side loop) cannot keep the JVM alive after main
  * exits.
  */
object QueryBudget {

  /** Runs `body` with the given budget. Returns None on success, or
    * Some(errorMessage) on failure or timeout. */
  def run(spark: SparkSession, name: String, timeoutSec: Int)
      (body: => Unit): Option[String] = {
    val outcome = new SynchronousQueue[Option[String]]()
    val worker = new Thread(() => {
      val r =
        try { spark.sparkContext.setJobGroup(name, name, interruptOnCancel = true)
          body; None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getName}: ${String.valueOf(e.getMessage)}") }
        finally spark.sparkContext.clearJobGroup()
      // offer, not put: nobody is left waiting if the caller timed out.
      // The caller's post-timeout interrupt() can land HERE (body already
      // done, outcome abandoned) — swallow it rather than dying with an
      // uncaught-exception stack trace on the stderr tail.
      try outcome.offer(r, 60, TimeUnit.SECONDS)
      catch { case _: InterruptedException => () }
      ()
    }, s"graft-query-$name")
    worker.setDaemon(true)
    worker.start()
    Option(outcome.poll(timeoutSec.toLong, TimeUnit.SECONDS)) match {
      case Some(r) => r
      case None =>
        spark.sparkContext.cancelJobGroup(name)
        // Also interrupt the worker: cancelJobGroup only stops Spark jobs,
        // not driver-side loops (e.g. a local quantizer-training loop), and
        // a still-running body would contaminate the next query's timing
        // and share mutable session state with it. Grace-join before the
        // liveness probe — interrupt() is async, so an immediate isAlive
        // is true for every prompt exit too and the flag would carry no
        // information about the swallowed-interrupt case it exists for.
        worker.interrupt()
        try worker.join(2000L) catch { case _: InterruptedException => () }
        val alive = if (worker.isAlive) "; worker thread still alive" else ""
        Some(s"TIMEOUT after ${timeoutSec}s (job group cancelled, worker interrupted$alive)")
    }
  }
}
