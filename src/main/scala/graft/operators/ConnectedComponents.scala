package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.slf4j.LoggerFactory

/** Distributed connected components by iterative min-label propagation —
  * the exact-transitive upgrade of [[NearDup.minhashLshRepresentatives]]'s
  * one-pass approximation: chains A~B~C where A and C never share a bucket
  * still collapse into one cluster.
  *
  * Algorithm: every vertex starts labeled with its own id; each round every
  * vertex takes the min of its label and its neighbors' labels; stop when no
  * label changed. Labels are monotonically non-increasing and bounded below
  * by the component minimum, so the sum of labels strictly decreases until
  * the fixpoint — convergence is detected by one cheap aggregate per round
  * (an exact decimal sum: a bigint sum of 10^12 ids over 10^12 rows would
  * overflow, and under Spark 4's default ANSI mode overflow THROWS).
  *
  * Scale contract (100 TB): each round is one shuffle of (edge ∪ label)
  * rows hash-partitioned on vertex id — map-side `min` partial-aggregation
  * collapses duplicate messages before the exchange. Rounds needed =
  * graph diameter; near-dup graphs are unions of small dense clusters
  * (diameter ≲ 3), so 3-4 rounds in practice, `maxIter` bounds the worst
  * case. Checkpointing cuts each round's lineage — without it the plan
  * doubles per iteration and the job dies re-executing round 1 at round 10.
  * The flavor is chosen at runtime: when the SparkContext has a checkpoint
  * directory configured (`sc.setCheckpointDir` — HDFS/object store on a
  * real cluster), reliable `checkpoint` is used, surviving executor loss
  * across the long-lived loop; otherwise `localCheckpoint` (executor-local
  * blocks — fine for local mode and short-lived jobs). For billion-edge
  * general graphs with long chains, the large-star/small-star variant
  * (Kiveris et al., "Connected Components in MapReduce and Beyond")
  * converges in O(log n) rounds — near-dup graphs never need it.
  */
object ConnectedComponents {

  private val log = LoggerFactory.getLogger(getClass)

  /** Component label (= min vertex id in the component) for every vertex.
    *
    * @param vertices one column `id`; every vertex, including isolated ones
    * @param edges    columns `src`, `dst`; undirected (one orientation per
    *                 edge suffices — both are generated internally), ids
    *                 must appear in `vertices`
    * @return (id, comp) — comp is the minimum id reachable from `id`
    */
  def labelPropagate(vertices: DataFrame, edges: DataFrame,
      maxIter: Int = 20): DataFrame = {
    // Materialize the caller's edge frame BEFORE flipping it: `edges` is
    // typically an expensive lazy pipeline (d27's is minhash → bucket →
    // pair-expand → Jaccard-verify), and a lazy union evaluates that
    // pipeline once per branch inside the distinct's single
    // materialization — the self-join recompute trap in union form
    // (Catalyst does not reuse a subtree across union branches).
    val e = materialize(edges.select(col("src"), col("dst")))
    // Both orientations, deduped, materialized once — the loop re-reads
    // this frame every round.
    val und = materialize(
      e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    e.unpersist() // und is eager; the one-orientation blocks are dead
    var labels = materialize(vertices.select(col("id"), col("id").as("comp")))
    var prev = checksum(labels)
    var iter = 0
    var converged = und.isEmpty // edgeless graph: everyone is their own comp
    while (!converged && iter < maxIter) {
      // neighbor labels flow along edges; keep the per-vertex min of
      // (own label ∪ incoming labels)
      val msgs = und.join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("comp"))
      val next = materialize(labels.union(msgs)
        .groupBy(col("id")).agg(min(col("comp")).as("comp")))
      val cur = checksum(next)
      // `next` is fully materialized (eager checkpoint + checksum), so the
      // previous round's blocks are dead — drop them now, or maxIter+1
      // copies of the label table pile up in executor storage.
      labels.unpersist()
      converged = cur == prev
      prev = cur
      labels = next
      iter += 1
    }
    und.unpersist()
    if (!converged && iter >= maxIter)
      log.warn(s"labelPropagate stopped at maxIter=$maxIter without " +
        "reaching the fixpoint — labels are only partially propagated " +
        "(graph diameter exceeds maxIter); raise maxIter or use a " +
        "star-contraction variant for long-chain graphs")
    labels
  }

  /** Eagerly materialize `df` with the lineage cut, reliable when the
    * context allows it: with a checkpoint directory configured (cluster —
    * HDFS/object store), `checkpoint` survives executor loss across the
    * iterative loop; without one (local mode), `localCheckpoint` keeps
    * blocks executor-local and avoids requiring any directory setup. */
  private def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** Exact (overflow-proof) sum of labels — the convergence witness. */
  private def checksum(labels: DataFrame): java.math.BigDecimal = {
    val v = labels.agg(sum(col("comp").cast("decimal(38,0)"))).head.get(0)
    if (v == null) java.math.BigDecimal.ZERO
    else v.asInstanceOf[java.math.BigDecimal]
  }
}
