package graft

import org.apache.spark.sql.functions._

import graft.queries.GraftQuery

/** Semantic anchors for the round-16 additions, beyond their oracle
  * hash-matches: the properties that must hold by CONSTRUCTION, asserted
  * on the sf0.001 fixtures so a refactor that keeps some hash accidentally
  * matching still can't break the math.
  */
class Round16OpsSpec extends SparkSpec {

  private def run(name: String) =
    GraftQuery.all.find(_.name == name)
      .getOrElse(fail(s"unknown query $name"))
      .run(spark, sfDir)

  test("d56: a Bloom filter has NO false negatives — every exact dup " +
      "passes the bloom probe") {
    // The entire correctness contract of the pre-pass: it may over-admit
    // (false_pos measures that) but must never drop a true duplicate. A
    // violation means the probe's position derivation drifted from the
    // build's.
    val bad = run("d56_bloom_probe")
      .filter(col("exact_dup") === 1 && col("bloom_pass") === 0).count()
    assert(bad === 0L, s"$bad exact dups failed the bloom probe")
  }

  test("d56: false_pos is exactly bloom_pass minus exact membership") {
    val n = run("d56_bloom_probe")
      .filter(col("false_pos") =!=
        when(col("bloom_pass") === 1 && col("exact_dup") === 0, 1)
          .otherwise(0)).count()
    assert(n === 0L)
  }

  test("q39: closed-form moments agree with Spark's builtin " +
      "skewness/kurtosis aggregates") {
    // Spark's skewness/kurtosis are the same population definitions
    // (m3/m2^1.5, m4/m2²−3) computed by streaming central-moment updates;
    // the raw-power-sum form must land within double noise of them. This
    // anchors q39 against an INDEPENDENT implementation — the oracle only
    // proves both engines ran the same formula.
    val ours = run("q39_qty_shape_stats")
      .select(col("l_returnflag"), col("skewness"), col("excess_kurtosis"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val ref = graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(skewness(col("l_quantity")).as("sk"),
        kurtosis(col("l_quantity")).as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(ours.keySet === ref.keySet)
    ours.foreach { case (k, (sk, ku)) =>
      assert(math.abs(sk - ref(k)._1) < 1e-6, s"skewness($k)")
      assert(math.abs(ku - ref(k)._2) < 1e-6, s"kurtosis($k)")
    }
  }

  test("q40: transition probabilities are a stochastic matrix — each " +
      "prev_type row sums to 1") {
    val rows = run("q40_event_transitions")
      .groupBy(col("prev_type")).agg(sum(col("p")).as("s"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // 6-decimal rounding of ≤|types| addends: row sums stay within
      // |types| × 5e-7 of exactly 1
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-5,
        s"row ${r.getString(0)} sums to ${r.getDouble(1)}")
    }
  }

  test("q41: the merged sketch IS the union sketch (zero register " +
      "mismatches) and the estimate is within HLL's error envelope") {
    val r = run("q41_hll_merge_rollup").collect().head
    assert(r.getAs[Long]("n_register_mismatch") === 0L)
    // 1.04/√256 = 6.5% standard error; 5σ envelope catches a broken
    // estimator without flaking on fixture randomness
    assert(math.abs(r.getAs[Double]("rel_err")) < 0.325,
      s"rel_err ${r.getAs[Double]("rel_err")} outside the HLL envelope")
  }

  test("d58: ablation identities — n_fail_alone <= n_fail, and the " +
      "union of rule kills is exactly n_docs - n_pass >= any single kill") {
    val rows = run("d58_gate_ablation").collect()
    assert(rows.length === 4)
    val nDocs = rows.head.getAs[Long]("n_docs")
    val nPass = rows.head.getAs[Long]("n_pass")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_fail_alone") <= r.getAs[Long]("n_fail"))
      assert(r.getAs[Long]("n_fail") <= nDocs - nPass,
        s"rule ${r.getString(0)}: single kill exceeds the union of kills")
    }
  }

  test("e17: recall is monotone non-decreasing in nprobe (probed cell " +
      "sets are nested)") {
    val byN = run("e17_nprobe_sweep").collect()
      .map(r => r.getAs[Int]("nprobe") -> r.getAs[Double]("recall_at_10"))
      .toMap
    assert(byN.keySet === Set(1, 2, 4))
    assert(byN(1) <= byN(2) && byN(2) <= byN(4),
      s"recall not monotone: $byN")
  }

  test("d59: candidate sets are nested — fewer rows per band can only " +
      "ADD candidates (8x2 ⊇ 4x4 ⊇ 2x8 on the fixtures)") {
    // The S-curve theorem for partitioned index sets: agreement on an
    // 8-sig band implies agreement on its 4-sig and 2-sig sub-bands, so
    // coarser configs' collisions are a superset. (Bucket caps could in
    // principle drop a hot bucket from one config only; the fixtures
    // don't hit the cap, so the clean nesting must hold here.)
    val byCfg = run("d59_lsh_band_sweep").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_candidates")).toMap
    assert(byCfg.keySet === Set("8x2", "4x4", "2x8"))
    assert(byCfg("2x8") <= byCfg("4x4") && byCfg("4x4") <= byCfg("8x2"),
      s"candidate counts not nested: $byCfg")
  }

  test("d57: overlap pairs are canonical (src_a < src_b) with positive " +
      "shared-chunk counts") {
    val rows = run("d57_source_overlap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1),
        s"pair not canonical: ${r.getString(0)} / ${r.getString(1)}")
      assert(r.getAs[Long]("n_shared_chunks") > 0L)
    }
  }

  test("d60: JS divergence lands in [0, ln 2] for every source") {
    val rows = run("d60_source_divergence").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val js = r.getAs[Double]("js_divergence")
      // small negative epsilon tolerated: per-term 6-decimal rounding can
      // dip an exactly-zero divergence a hair below 0
      assert(js >= -1e-4 && js <= math.log(2.0) + 1e-4,
        s"source ${r.getString(0)}: js=$js outside [0, ln 2]")
    }
  }

  test("e16: every probe reports a recall_at_3 in [0,1] and the probe " +
      "set is non-empty") {
    val recalls = run("e16_randproj_recall").collect()
    assert(recalls.nonEmpty)
    recalls.foreach { r =>
      val v = r.getAs[Double]("recall_at_3")
      assert(v >= 0.0 && v <= 1.0)
    }
  }
}
