package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.GraftQuery

/** Bench's stdout line uses the short-prefix key form (q01, d45, …) so the
  * whole JSON object fits the driver's ~2000-char captured tail. That form
  * only holds while prefixes stay unique: a collision (two q3_* names)
  * would silently flip the map back to full names, changing the consumer
  * contract and re-triggering the tail truncation. Pin uniqueness here so
  * a colliding registration fails at build time, not in the artifact. */
class BenchKeySpec extends AnyFunSuite {

  test("query-name short prefixes are unique (Bench stdout key contract)") {
    val names = GraftQuery.all.map(_.name)
    val dupes = names.groupBy(_.split("_").head).filter(_._2.size > 1)
    assert(dupes.isEmpty,
      s"short-prefix collisions would flip Bench stdout to full-name keys: " +
        dupes.map { case (p, ns) => s"$p -> ${ns.mkString(",")}" }.mkString("; "))
  }
}
