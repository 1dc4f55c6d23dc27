package graft

import org.apache.spark.sql.functions._

import graft.queries.Similarity

/** Algebraic contract of the OPQ rotation audit (sim_opq_code_gain): the
  * snake allocation is a tier-balanced permutation, the rotation preserves
  * energy (orthogonal invariance), and the audit emits one exact-integer
  * row per rung.
  */
class OpqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("snake allocation is a permutation with one rank per tier per bucket") {
    val order = Similarity.opqSnakeOrder(64, 8)
    assert(order.sorted.toSeq === (0 until 64))
    // subspace b holds new dims b*8..b*8+7; each must draw exactly one
    // eigen rank from each variance tier {0..7}, {8..15}, …, {56..63}
    for (b <- 0 until 8) {
      val tiers = (0 until 8).map(slot => order(b * 8 + slot) / 8)
      assert(tiers.sorted === (0 until 8), s"bucket $b draws tiers $tiers")
    }
    // snake direction: tier 0 deals rank b to bucket b, tier 1 deals
    // rank 8 + (7 - b) — adjacent tiers reverse, balancing Σλ
    assert(order(0 * 8 + 0) === 0 && order(7 * 8 + 0) === 7)
    assert(order(0 * 8 + 1) === 15 && order(7 * 8 + 1) === 8)
  }

  test("rotation preserves per-corpus energy (orthogonal invariance)") {
    val (basis, mean) = Similarity.opqBasis(spark, sf)
    // orthonormality of the allocated basis, checked directly
    for (j <- basis.indices) {
      val nrm = basis(j).map(x => x * x).sum
      assert(math.abs(nrm - 1.0) < 1e-9, s"row $j norm $nrm")
    }
    val d01 = basis(0).zip(basis(1)).map { case (a, b) => a * b }.sum
    assert(math.abs(d01) < 1e-9, s"rows 0,1 not orthogonal: $d01")
    // Σ xu² over the corpus must agree between the centered and rotated
    // coordinate tables up to micro-unit rounding (~1e-6 relative)
    def energy(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(sum(col("xu") * col("xu"))).head().getLong(0).toDouble
    val eCen = energy(Similarity.centeredXu(spark, sf, mean))
    val eOpq = energy(Similarity.opqXu(spark, sf, basis, mean))
    assert(math.abs(eCen - eOpq) / eCen < 1e-4,
      s"energy drifted: centered $eCen vs rotated $eOpq")
  }

  test("recall audit: raw leg reproduces sim_pq_recall's hit total exactly") {
    val byScheme = graft.SparkEntry.queries("sim_opq_recall")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byScheme.keySet === Set("raw", "opq"))
    byScheme.values.foreach { case (hits, rec) =>
      assert(hits >= 0 && hits <= 50)
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // the raw ADC ranking is sim_pq_adc's (shared codebook/code table) —
    // its hit total must equal sim_pq_recall's per-probe hits summed
    val pqHits = graft.SparkEntry.queries("sim_pq_recall")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_hits")).head().getLong(0)
    assert(byScheme("raw")._1 === pqHits,
      s"raw leg ${byScheme("raw")._1} vs sim_pq_recall total $pqHits")
  }

  test("training curve: iteration 1 is the family codebook; totals exact") {
    val curve = graft.SparkEntry.queries("sim_pq_train_curve")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(curve.map(_._1).toSeq === Seq(1, 2, 3, 4))
    curve.foreach { case (_, tot, _) => assert(tot > 0) }
    // iteration 1 = seed-assign + one Lloyd update = exactly the codebook
    // every PQ query trains — its error must equal the code-gain audit's
    // raw rung
    val rawTotal = graft.SparkEntry.queries("sim_opq_code_gain")(spark, sf)
      .filter("scheme = 'raw'").head().getLong(1)
    assert(curve.head._2 === rawTotal,
      s"curve iter1 ${curve.head._2} vs code-gain raw $rawTotal")
  }

  test("rotated training curve: iteration 1 is the shared OPQ codebook") {
    val curve = graft.SparkEntry.queries("sim_opq_train_curve")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(curve.map(_._1).toSeq === Seq(1, 2, 3, 4))
    curve.foreach { case (_, tot, _) => assert(tot > 0) }
    // iteration 1 = trainCents over the rotated coordinates = exactly the
    // session-shared OPQ codebook — its error must equal the code-gain
    // audit's opq rung
    val opqTotal = graft.SparkEntry.queries("sim_opq_code_gain")(spark, sf)
      .filter("scheme = 'opq'").head().getLong(1)
    assert(curve.head._2 === opqTotal,
      s"curve iter1 ${curve.head._2} vs code-gain opq $opqTotal")
  }

  test("RRF k sweep: the k=60 row reproduces the fusion audit's rrf row") {
    val sweep = graft.SparkEntry.queries("pipeline_hybrid_ksweep")(spark, sf)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(sweep.keySet === Set(5, 20, 60, 240))
    sweep.values.foreach { case (hits, rec) =>
      assert(hits >= 0 && hits <= 50)
      assert(rec >= 0.0 && rec <= 1.0)
    }
    val rrf = graft.SparkEntry.queries("pipeline_hybrid_gain")(spark, sf)
      .filter("scheme = 'rrf'").head().getLong(1)
    assert(sweep(60)._1 === rrf, s"k=60 ${sweep(60)._1} vs gain rrf $rrf")
  }

  test("IVF-PQ gain audit: raw leg reproduces the code-gain raw row") {
    val gain = graft.SparkEntry.queries("sim_opq_ivfpq_gain")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gain.keySet === Set("raw", "opq"))
    gain.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    // identical candidates + identical raw codes/LUT ⇒ the raw leg must
    // equal sim_ivfpq_code_gain's raw row exactly
    val cg = graft.SparkEntry.queries("sim_ivfpq_code_gain")(spark, sf)
      .filter("scheme = 'raw'").head().getDouble(1)
    assert(gain("raw") === cg, s"gain raw ${gain("raw")} vs code-gain raw $cg")
  }

  test("re-rank gain audit: two schemes, recall bounded, raw consistent " +
      "with the depth-recall curve shape") {
    val gain = graft.SparkEntry.queries("sim_opq_rerank_gain")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(gain.keySet === Set("raw", "opq"))
    gain.values.foreach(v => assert(v >= 0.0 && v <= 1.0))
    // depth-50 re-rank can never do worse than the direct ADC top-5 —
    // the shortlist contains the ADC top-5 by construction
    val adc5 = graft.SparkEntry.queries("sim_opq_recall")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(gain("raw") >= adc5("raw"), s"${gain("raw")} < ${adc5("raw")}")
    assert(gain("opq") >= adc5("opq"), s"${gain("opq")} < ${adc5("opq")}")
  }

  test("seed audit: fixture leg is the family codebook's error") {
    val rows = graft.SparkEntry.queries("sim_pq_seed_audit")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet === Set("fixture", "md5"))
    rows.values.foreach(v => assert(v > 0))
    val rawTotal = graft.SparkEntry.queries("sim_opq_code_gain")(spark, sf)
      .filter("scheme = 'raw'").head().getLong(1)
    assert(rows("fixture") === rawTotal)
  }

  test("audit emits one exact row per rung with consistent mse") {
    val rows = graft.SparkEntry.queries("sim_opq_code_gain")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.map(_._1).toSet === Set("raw", "centered", "opq"))
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    rows.foreach { case (scheme, tot, mse) =>
      assert(tot > 0, s"$scheme total")
      val expected = BigDecimal(tot.toDouble / n / 64.0 / 1e12)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(mse - expected) < 1e-9, s"$scheme mse $mse vs $expected")
    }
  }
}
