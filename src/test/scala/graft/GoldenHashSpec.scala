package graft

/** Regression pins for the rows-only queries (see [[GoldenHash]]): the
  * driver's oracle gate cannot hash-check them, so this suite freezes
  * their sf0.01 results against the committed GOLDEN.json. Any silent
  * output drift of a native path (hash-function change, seed change,
  * iteration-order change in a quantizer loop) fails HERE instead of
  * shipping unnoticed behind a rows>0 check.
  *
  * Also asserts the pin LIST is complete: a newly registered query
  * without an oracle must be added to GoldenHash.pinned (and GOLDEN.json
  * regenerated via `sbt "Test/runMain graft.GoldenGen"`) before it can
  * land.
  */
class GoldenHashSpec extends SparkSpec {

  test("every rows-only query (no oracle) is golden-pinned") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == GoldenHash.pinned.toSet,
      s"rows-only queries and GoldenHash.pinned diverge: " +
        s"unpinned=${(rowsOnly -- GoldenHash.pinned).toSeq.sorted}, " +
        s"stale pins=${(GoldenHash.pinned.toSet -- rowsOnly).toSeq.sorted}")
  }

  test("rows-only query results match GOLDEN.json at sf0.01") {
    val golden = GoldenHash.load()
    val drifted = GoldenHash.pinned.flatMap { name =>
      val (rows, hash) = GoldenHash.resultHash(
        SparkEntry.queries(name)(spark, GoldenHash.sfDir))
      golden.get(name) match {
        case Some((gRows, gHash)) if gRows == rows && gHash == hash => None
        case Some((gRows, gHash)) =>
          Some(s"$name: rows $gRows->$rows, hash $gHash->$hash")
        case None => Some(s"$name: missing from GOLDEN.json")
      }
    }
    assert(drifted.isEmpty,
      "golden drift (if DELIBERATE, regenerate via Test/runMain " +
        s"graft.GoldenGen and say so in the commit):\n${drifted.mkString("\n")}")
  }
}
