package graft

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  // (id, key, ts)
  private lazy val lefts = Seq(
    (100L, "u1", 1000L), // matches r at 900 (not 1100)
    (101L, "u1", 900L),  // equal-ts match (inclusive)
    (102L, "u1", 50L),   // before all rights → null
    (103L, "u2", 500L),  // other key: matches u2's r at 400
    (104L, "u3", 500L)   // key with no rights → null
  ).toDF("id", "key", "ts")

  private lazy val rights = Seq(
    (1L, "u1", 900L),
    (2L, "u1", 1100L),
    (3L, "u2", 400L)
  ).toDF("rid", "key", "ts")

  test("asOfJoin: greatest right ts <= left ts per key; unmatched → null") {
    val out = TemporalJoins.asOfJoin(lefts, rights, "key", "ts")
      .select($"id", $"asof.rid".as("rid")).as[(Long, Option[Long])]
      .collect().toMap
    assert(out == Map(
      100L -> Some(1L), 101L -> Some(1L), 102L -> None,
      103L -> Some(3L), 104L -> None))
  }

  test("asOfJoin keeps every left row exactly once") {
    val out = TemporalJoins.asOfJoin(lefts, rights, "key", "ts")
    assert(out.count() == 5)
    assert(out.select("id").distinct().count() == 5)
  }

  test("rangeJoin: inclusive bounds, bucket-crossing windows, key isolation") {
    // window [lts-100, lts] — right at exactly lts-100 and lts must match
    val l = Seq((1L, "k", 1000L)).toDF("lid", "key", "ts")
    val r = Seq(
      (10L, "k", 900L),  // == lts-100 → in (inclusive low)
      (11L, "k", 1000L), // == lts → in (inclusive high)
      (12L, "k", 899L),  // just outside
      (13L, "k", 1001L), // just outside
      (14L, "x", 950L)   // wrong key
    ).toDF("rid", "key", "ts")
    val got = TemporalJoins.rangeJoin(l, r, "key", "ts", "ts", -100L, 0L)
      .select($"r.rid").as[Long].collect().toSet
    assert(got == Set(10L, 11L))
  }

  test("rangeJoin matches a plain inequality join on random data") {
    val rnd = new scala.util.Random(11)
    val l = (1 to 60).map(i => (i.toLong, s"k${rnd.nextInt(4)}",
      rnd.nextInt(10000).toLong)).toDF("lid", "key", "ts")
    val r = (1 to 60).map(i => (i.toLong, s"k${rnd.nextInt(4)}",
      rnd.nextInt(10000).toLong)).toDF("rid", "key", "ts")
    val got = TemporalJoins.rangeJoin(l, r, "key", "ts", "ts", -500L, 250L)
      .select($"l.lid", $"r.rid").as[(Long, Long)].collect().toSet
    val naive = l.as("a").join(r.as("b"),
        $"a.key" === $"b.key" &&
          $"b.ts" >= $"a.ts" - 500L && $"b.ts" <= $"a.ts" + 250L)
      .select($"a.lid", $"b.rid").as[(Long, Long)].collect().toSet
    assert(got == naive)
  }
}
