package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Pins ConnectedComponents.labelPropagate: the chain-collapse behavior
  * that distinguishes it from NearDup's one-pass approximation, plus the
  * edge cases (isolated vertices, edgeless graph, maxIter truncation). */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(vertices: Seq[Long], edges: Seq[(Long, Long)],
      maxIter: Int = 20, pointerJumping: Boolean = false): Map[Long, Long] =
    ConnectedComponents.labelPropagate(
        vertices.toDF("id"), edges.toDF("src", "dst"), maxIter, pointerJumping)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain collapses to one component labeled by its min id") {
    // 1-2-3-4-5: ends never share an edge, only transitivity links them
    val got = labelsOf(Seq(1L, 2L, 3L, 4L, 5L),
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("isolated vertices keep their own label alongside a component") {
    val got = labelsOf(Seq(1L, 2L, 3L, 7L, 9L), Seq((2L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 7L -> 7L, 9L -> 9L))
  }

  test("edgeless graph: every vertex is its own component") {
    val got = labelsOf(Seq(4L, 8L, 15L), Seq.empty)
    assert(got == Map(4L -> 4L, 8L -> 8L, 15L -> 15L))
  }

  test("two components don't bleed into each other") {
    val got = labelsOf(Seq(1L, 2L, 3L, 10L, 11L, 12L),
      Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("edge orientation is irrelevant (undirected semantics)") {
    val fwd = labelsOf(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L)))
    val rev = labelsOf(Seq(1L, 2L, 3L), Seq((2L, 1L), (3L, 2L)))
    assert(fwd == rev)
  }

  test("reliable checkpoint engages when a checkpoint dir is configured") {
    // The cluster seam: with sc.setCheckpointDir set (HDFS on a real
    // cluster), the loop's per-round materialization must switch from
    // executor-local blocks to reliable checkpoint files — same labels,
    // and files actually written under the configured dir. Mutates shared
    // SparkContext state (checkpoint dir), which is safe only because
    // ScalaTest runs this suite's tests sequentially.
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val got = labelsOf(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L)))
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
      val walk = java.nio.file.Files.walk(dir)
      val wrote = try walk.filter(java.nio.file.Files.isRegularFile(_)).count()
      finally walk.close()
      assert(wrote > 0, "no reliable-checkpoint files were written")
    } finally {
      spark.sparkContext.setCheckpointDir(null)
      // don't leak checkpoint files across runs
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
    }
  }

  test("per-round reliable checkpoints are cleaned up as rounds complete") {
    // The loop deletes each round's checkpoint files once the next round
    // is materialized — only the RETURNED frame's files survive the call.
    // A diameter-4 chain needs several rounds; if cleanup were a no-op,
    // every round's labels (plus the edge frames) would still be on disk.
    val dir = java.nio.file.Files.createTempDirectory("cc-ckpt-gc")
    spark.sparkContext.setCheckpointDir(dir.toString)
    try {
      val got = labelsOf(Seq(1L, 2L, 3L, 4L, 5L),
        Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
      assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
      val walk = java.nio.file.Files.walk(dir)
      // rdd-* checkpoint dirs: exactly one should remain (final labels)
      val rddDirs = try walk
        .filter(p => p.getFileName.toString.startsWith("rdd-")).count()
      finally walk.close()
      // <= 1, not == 1: with cleanCheckpoints=true (GraftSession) the
      // ContextCleaner may ALSO have deleted the final frame's dir by now
      // if a GC ran after labelsOf dropped the frame — zero is the same
      // no-leak property, one round earlier.
      assert(rddDirs <= 1,
        s"expected at most the final frame's checkpoint dir, found $rddDirs")
    } finally {
      spark.sparkContext.setCheckpointDir(null)
      val walk = java.nio.file.Files.walk(dir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
    }
  }

  test("local-mode loop frees intermediate blocks; only the final " +
      "frame's stay persistent") {
    // The ADVICE-r10 finding: Dataset.unpersist is a no-op on
    // (local)checkpointed frames, so the old loop leaked every round's
    // label blocks. Release now unpersists the underlying RDD — after a
    // multi-round run, exactly one new persistent RDD (the returned
    // labels) may remain.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val labels = ConnectedComponents.labelPropagate(
      Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id"),
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L)).toDF("src", "dst"))
    assert(labels.count() == 6)
    val added = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(added.size <= 1,
      s"loop leaked ${added.size} persistent RDDs (expected only the " +
        "returned frame's blocks)")
  }

  test("pointer jumping reaches the fixpoint in O(log diameter) rounds " +
      "on a long path graph") {
    // Path 0-1-...-30 (diameter 30). Plain min-propagation moves the min
    // one hop per round, so maxIter=8 strands the far end; with the jump
    // (comp(u) := comp(comp(u))) the reach roughly doubles per round —
    // ceil(log2(30)) + a couple of propagation rounds ≤ 8 — so the SAME
    // budget must fully converge. This pins both the correctness of the
    // self-join round (labels right, inner join preserved every row) and
    // the advertised round-count contraction.
    val vs = (0L to 30L).toSeq
    val es = (0L until 30L).map(i => (i, i + 1))
    val jumped = labelsOf(vs, es, maxIter = 8, pointerJumping = true)
    assert(jumped.keySet == vs.toSet, "jump round dropped/duplicated rows")
    assert(jumped.values.toSet == Set(0L),
      s"expected every vertex labeled 0, got ${jumped.filterNot(_._2 == 0L)}")
    val plain = labelsOf(vs, es, maxIter = 8)
    assert(plain(30L) != 0L,
      "plain propagation converged in 8 rounds on a diameter-30 path — " +
        "the jump test would no longer demonstrate the contraction")
  }

  test("pointer jumping agrees with plain propagation on a mixed graph") {
    // Two components (one chain, one triangle+pendant) plus isolated
    // vertices: the jump must be a pure accelerator — identical labels.
    val vs = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L, 13L, 99L)
    val es = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (12L, 10L), (12L, 13L))
    assert(labelsOf(vs, es, pointerJumping = true) == labelsOf(vs, es))
  }

  test("maxIter truncation returns partially propagated labels") {
    // Diameter-4 chain with the min at one end: one round moves each
    // label at most one hop, so maxIter=1 cannot reach the far end.
    val got = labelsOf(Seq(1L, 2L, 3L, 4L, 5L),
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), maxIter = 1)
    assert(got(2L) == 1L)      // one hop: propagated
    assert(got(5L) != 1L)      // four hops: not reached yet
  }
}
