package graft

import org.apache.spark.sql.functions._

import graft.operators.Winnowing
import graft.sources.Tables

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  test("fingerprints: deterministic, bounded, empty for short docs") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup
      (3L, "one two"),                                       // < K tokens
      (4L, ""),
    ).toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(1L) == byDoc(2L))                   // identical text → identical set
    assert(!byDoc.contains(3L) && !byDoc.contains(4L)) // unsignable → no rows
    assert(byDoc(1L).forall(h => h >= 0 && h < Winnowing.MOD))
    // 8 tokens → 6 k-grams → 3 windows → ≤ 3 distinct fingerprints, ≥ 1
    assert(byDoc(1L).size >= 1 && byDoc(1L).size <= 3)
  }

  test("winnowing guarantee: a shared run of ≥ W+K-1 tokens shares a fingerprint") {
    // Docs share a 6-token run (W+K-1 = 6) embedded in different contexts.
    val shared = "lorem ipsum dolor sit amet consectetur"
    val df = Seq(
      (1L, s"unrelated prefix words here $shared and a suffix tail"),
      (2L, s"$shared totally different continuation text follows now"),
    ).toDF("doc_id", "text")
    val byDoc = Winnowing.fingerprints(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(1L).intersect(byDoc(2L)).nonEmpty,
      "overlapping docs must share at least one winnowed fingerprint")
  }

  test("sharedFingerprintPairs finds the contained copy, a_id < b_id") {
    val copied = "the quick brown fox jumps over the lazy dog near the river bank"
    val df = Seq(
      (10L, s"intro paragraph before $copied closing remark"),
      (20L, s"$copied"),
      (30L, "completely disjoint vocabulary nothing in common whatsoever at all today"),
    ).toDF("doc_id", "text")
    val pairs = Winnowing.sharedFingerprintPairs(df)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs.contains((10L, 20L)))
    assert(pairs.forall { case (a, b) => a < b })
    assert(!pairs.exists { case (a, b) => a == 30L || b == 30L })
  }

  test("native expression matches the SQL-expr reference formulation") {
    // The DuckDB oracle transliterates the reference form; the native
    // codegen expression (round-6 rewrite, see WinnowExprs scaladoc) must
    // produce identical fingerprint SETS per doc (element order is free —
    // native emits sorted, reference first-occurrence).
    val edge = Seq(
      (100L, "  leading and \t tab\nnewline   runs collapse  "),
      (101L, "exactly three toks"),
      (102L, "four tokens right here"),          // kn=2 < W → global min
      (103L, "one two"),                         // < K → empty
      (104L, ""),
      (105L, "rep rep rep rep rep rep rep rep"), // identical k-grams
      (106L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
      (107L, null.asInstanceOf[String]),         // null in → null out (both)
    ).toDF("doc_id", "text")
    def sets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Long](1)).map(_.toSet)).toMap
    for (df <- Seq(edge, Tables.documents(spark, sfDir).limit(100))) {
      val native = sets(Winnowing.fingerprintSets(df))
      val ref = sets(Winnowing.fingerprintSetsReference(df))
      assert(native == ref)
      if (df eq edge) assert(native(107L).isEmpty) // None: null fps
    }
  }

  test("containmentPairs: verbatim-contained doc scores 1.0 where jaccard " +
      "under-reports; unrelated docs emit nothing") {
    // B is a contiguous 12-token run of A: every W-window of B's k-gram
    // sequence is also a window of A's, so fps(B) ⊆ fps(A) and
    // containment is EXACTLY 1.0 — while jaccard ≈ |fps(B)|/|fps(A)| is
    // small. This is the quote-detection case symmetric scores miss.
    val long = (1 to 100).map(i => s"tok$i").mkString(" ")
    val short = (41 to 52).map(i => s"tok$i").mkString(" ")
    val other = (1 to 80).map(i => s"zzz$i").mkString(" ")
    val df = Seq((1L, long), (2L, short), (3L, other)).toDF("doc_id", "text")
    val got = Winnowing.containmentPairs(df).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.contains((1L, 2L)), s"expected the contained pair, got $got")
    val (cont, jac) = got((1L, 2L))
    assert(cont == 1.0)
    assert(jac < 0.5, s"jaccard should under-report containment, got $jac")
    assert(!got.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("fingerprints are partitioning-invariant and plan is shuffle-free") {
    val base = Tables.documents(spark, sfDir).limit(40)
    def run(parts: Int) = Winnowing.fingerprints(base.repartition(parts))
      .as[(Long, Long)].collect().toSet
    assert(run(1) == run(5))
    val plan = Winnowing.fingerprints(Tables.documents(spark, sfDir))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
  }
}
