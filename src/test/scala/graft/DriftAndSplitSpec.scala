package graft

import org.apache.spark.sql.functions._

/** Round-11 additions: the quantile-sketch merge audit (a13c), embedding
  * drift between ingest slices (emb_drift), the leakage-safe cluster-level
  * split (pipeline_split_leakage_safe), and the streamed Count-Min twin
  * (stream_countmin). Each query is hash-oracled in Verify; these pins
  * assert the CLAIMS the oracles can't state directly — which dims drift,
  * that the naive split actually leaks, that the streamed counters equal
  * the batch sketch counter-for-counter with bounded state.
  */
class DriftAndSplitSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("a13c: slice sketches merge exactly; estimates honor the 2W contract") {
    val rows = SparkEntry.queries("a13c_quantile_merge")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("merged_eq_onepass")),
      "per-slice histograms must merge (by addition) to the one-pass sketch")
    assert(rows.forall(r => r.getAs[Boolean]("p50_within_2w") &&
      r.getAs[Boolean]("p95_within_2w")))
    // the estimator reads a real value range, not a degenerate one bucket:
    // p95 strictly above p50 in every group at this data
    assert(rows.forall(r =>
      r.getAs[Long]("p95_micro") > r.getAs[Long]("p50_micro")))
  }

  test("emb_drift: exactly the four planted dims alarm") {
    val rows = SparkEntry.queries("emb_drift")(spark, sf).collect()
    val drifted = rows.filter(_.getAs[Boolean]("drifted"))
      .map(_.getAs[Int]("dim")).sorted.toSeq
    assert(drifted == Seq(0, 1, 2, 3),
      s"planted +0.25 shift sits on dims 0-3; alarms: $drifted")
    assert(rows.forall(_.getAs[Long]("n_drifted_dims") == 4L))
    // the planted shift is visible in the readable means too
    val d0 = rows.find(_.getAs[Int]("dim") == 0).get
    assert(math.abs(d0.getAs[Double]("mean_b") - d0.getAs[Double]("mean_a") - 0.25) < 0.05)
  }

  test("leakage-safe split: cluster-level assignment cannot straddle; doc-level does") {
    val rows = SparkEntry.queries("pipeline_split_leakage_safe")(spark, sf).collect()
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs,
      "every document lands in exactly one split")
    assert(rows.forall(_.getAs[Long]("cluster_straddle_pairs") == 0L),
      "both endpoints of a near-dup pair share a component, hence a split")
    // the audit's reason to exist: the naive md5(doc_id) split DOES leak
    // near-dup pairs across the boundary on this corpus
    assert(rows.head.getAs[Long]("doc_straddle_pairs") > 0L)
  }

  test("diag_psi_drift: only the planted 1.5x purchase scale-up alarms") {
    // at the GATE scale (sf0.01, ~1000 events per type per slice): the
    // 20-bin Laplace-smoothed PSI's sampling noise floor sits near
    // 0.7/sqrt(n), so the 0.1 rule-of-thumb threshold needs ~1000-row
    // slices to separate signal from noise — at sf0.001 every type trips
    // it (measured), which is a statement about sample size, not drift
    val rows = SparkEntry.queries("diag_psi_drift")(spark, "/root/testdata/sf0.01")
      .collect()
    val drifted = rows.filter(_.getAs[Boolean]("drifted"))
      .map(_.getAs[String]("event_type")).toSeq
    assert(drifted == Seq("purchase"),
      s"PSI > 0.1 must fire on the planted purchase shift only: $drifted")
    assert(rows.filter(!_.getAs[Boolean]("drifted"))
      .forall(_.getAs[Double]("psi") < 0.1))
  }

  test("dedup_containment: planted supersets classify a_in_b with full containment") {
    val rows = SparkEntry.queries("dedup_containment")(spark, sf).collect()
    val aInB = rows.filter(_.getAs[String]("relation") == "a_in_b")
    assert(aInB.nonEmpty, "the planted doc_id % 41 supersets must surface")
    // a_in_b means sub-threshold Jaccard by the CASE construction
    assert(aInB.forall(_.getAs[Double]("jaccard") <= 0.8))
    // the DIRECT planted pairs (original, its own +20M superset): every
    // original 4-gram survives verbatim — containment is exactly 1.
    // (Other a_in_b rows are originals contained in a NEAR-DUP's planted
    // superset — genuine asymmetric findings, c_a just under 1.)
    val direct = aInB.filter(r =>
      r.getAs[Long]("db") == r.getAs[Long]("da") + 20000000L &&
        r.getAs[Long]("da") % 41 == 0)
    assert(direct.nonEmpty)
    assert(direct.forall(_.getAs[Double]("c_a") == 1.0))
    // the symmetric class still surfaces the corpus's natural near-dups
    assert(rows.exists(_.getAs[String]("relation") == "near_duplicate"))
  }

  test("stream_psi_gate: both planted drifts alarm in EVERY arriving batch, nothing else does") {
    val rows = SparkEntry.queries("stream_psi_gate")(spark, "/root/testdata/sf0.01")
      .collect()
    val batches = rows.map(_.getAs[Int]("batch_ord")).distinct.sorted.toSeq
    assert(batches == Seq(0, 1), s"two deterministic arrival batches: $batches")
    for (b <- batches) {
      val inBatch = rows.filter(_.getAs[Int]("batch_ord") == b)
      val alarmed = inBatch.filter(_.getAs[Boolean]("drifted"))
        .map(_.getAs[String]("event_type")).sorted.toSeq
      // two planted drifts: the 1.5× purchase scale-up AND the novel
      // 'launch' type the reference has never seen (the full-outer spine
      // scores it against the all-smoothing uniform — the strongest
      // drift signal, r11 ADVICE); stable types stay quiet
      assert(alarmed == Seq("launch", "purchase"),
        s"batch $b: exactly the two planted drifts may alarm, got $alarmed")
      // the novel type carries n_ref = 0 — it alarms BECAUSE it is new
      val launch = inBatch.find(_.getAs[String]("event_type") == "launch").get
      assert(launch.getAs[Long]("n_ref") == 0L && launch.getAs[Long]("n_cur") > 0L)
    }
  }

  test("sim_ivf_filtered_sweep: post-filtering never beats pre-filtering and loses in aggregate") {
    val rows = SparkEntry.queries("sim_ivf_filtered_sweep")(spark, sf).collect()
    // per probe: the post-filter survivors are a subset of the pre-filter
    // candidates ranked the same way, so post hits can never exceed pre
    assert(rows.forall(r =>
      r.getAs[Long]("post_hits") <= r.getAs[Long]("pre_hits")))
    // and the starvation is real, not a tie: strictly fewer hits overall
    assert(rows.map(_.getAs[Long]("post_hits")).sum <
      rows.map(_.getAs[Long]("pre_hits")).sum,
      "the sweep exists to measure post-filter starvation; none measured")
  }

  test("agg_incremental_retract: both maintenance paths fire; an extremum actually retracts") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("agg_incremental_retract")(spark, sf)
    val rows = out.collect()
    assert(rows.forall(_.getAs[Long]("n") > 0L))
    assert(rows.exists(_.getAs[Boolean]("recomputed")) &&
      rows.exists(!_.getAs[Boolean]("recomputed")),
      "both the verbatim-kept and the recomputed group classes must appear")
    // the non-invertible path must MATTER: at least one touched group's
    // min/max moved because the retracted row WAS the extremum (otherwise
    // the bounded re-scan is untested dead weight)
    val ev = spark.read.parquet(s"$sf/events.parquet").select(
      date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
      col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    val standing = ev.groupBy(col("day"), col("event_type"))
      .agg(min(col("cents")).as("min0"), max(col("cents")).as("max0"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val moved = rows.filter(_.getAs[Boolean]("recomputed")).exists { r =>
      val (mn0, mx0) = standing((r.getAs[String]("day"), r.getAs[String]("event_type")))
      r.getAs[Long]("min_cents") != mn0 || r.getAs[Long]("max_cents") != mx0
    }
    assert(moved, "no retracted extremum at this scale — the min/max rescan path never fired")
  }

  test("stream_countmin: streamed counters equal the batch sketch; state is sketch-bounded") {
    val streamed = SparkEntry.queries("stream_countmin")(spark, sf)
      .collect().map(r => (r.getAs[String]("token"),
        r.getAs[Long]("exact_n"), r.getAs[Long]("cms_n"))).toSet
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val tok = docs.select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    val probes = tok.groupBy(col("token")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("token")).limit(10)
    val batch = graft.queries.TextOps.cmsEstimates(tok, probes, 1024)
      .collect().map(r => (r.getAs[String]("token"),
        r.getAs[Long]("exact_n"), r.getAs[Long]("cms_n"))).toSet
    assert(streamed == batch,
      "arrival batching must not change a single counter read")
    // the one-sided error contract holds through the streamed build too
    assert(streamed.forall { case (_, exact, est) => est >= exact })
  }
}
