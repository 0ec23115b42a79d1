package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one local SparkSession for the whole test JVM. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("graft-test", 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sfDir: String = TestSpark.sfDir
  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath

  /** Shuffle-exchange count in a plan string: node-name anchored on the
    * tree-art prefix so 'BroadcastExchange'/'ReusedExchange' (different
    * node names) and truncated arg lists can't skew the count. Shared by
    * every plan-shape assertion — the anchoring convention is subtle
    * enough that a second copy would drift. */
  protected def shuffles(plan: String): Int =
    "[+:]- Exchange ".r.findAllIn(plan).length

  /** Runs each selected registered query against `dir` through the noop
    * sink; returns "<name>: <root-cause>" per failure. Shared by the
    * robustness sweeps (EmptyCorpusSpec, DegenerateCorpusSpec) so both
    * report the ROOT exception, not Spark's stage-failure wrapper. */
  protected def sweepFailures(dir: String,
      pick: graft.queries.GraftQuery => Boolean): Seq[String] =
    graft.queries.GraftQuery.all.filter(pick).flatMap { q =>
      try {
        q.run(spark, dir).write.format("noop").mode("overwrite").save()
        None
      } catch {
        case e: Throwable =>
          val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
            .toSeq.last
          Some(s"${q.name}: ${root.getClass.getSimpleName}: " +
            s"${Option(root.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ")}")
      }
    }
}
