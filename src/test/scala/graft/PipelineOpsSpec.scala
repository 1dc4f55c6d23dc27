package graft

import org.apache.spark.sql.functions._

/** Cross-operator mathematical invariants of the second round-4 operator
  * batch — properties the DuckDB hash-match cannot express because they
  * relate DIFFERENT queries (or assert inequalities, not values).
  */
class PipelineOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("emb_covariance diagonal equals emb_dim_stats variance") {
    // cov(i,i) is the variance of dimension i — two independently derived
    // pipelines (pair expansion vs per-dim moments) must agree to rounding
    val stats = q("emb_dim_stats").select(col("dim"), col("std_x")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val diag = q("emb_covariance").filter(col("i") === col("j"))
      .select(col("i"), col("cov")).collect()
    assert(diag.nonEmpty)
    diag.foreach { r =>
      val v = math.sqrt(math.max(r.getDouble(1), 0.0))
      assert(math.abs(v - stats(r.getInt(0))) < 1e-4,
        s"dim ${r.getInt(0)}: sqrt(cov)=$v vs std=${stats(r.getInt(0))}")
    }
  }

  test("emb_quantize_int8 saturates exactly at ±127 and never beyond") {
    val q8 = q("emb_quantize_int8")
    val mx = q8.agg(max(abs(col("q8")))).head().getInt(0)
    assert(mx == 127, s"max |q8| = $mx (the per-dim extreme must hit ±127)")
  }

  test("pack_sequences conserves documents and tokens per source") {
    import graft.tables.Tables._
    val packed = q("pack_sequences")
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("docs"), sum(col("n_tokens")).as("toks"))
    val direct = documents(spark, sf)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("toks"))
    assert(packed.exceptAll(direct).isEmpty && direct.exceptAll(packed).isEmpty)
  }

  test("a15_corr lands in [-1, 1]") {
    val bad = q("a15_corr")
      .filter(abs(col("corr_qty_price")) > 1.0).count()
    assert(bad == 0)
  }

  test("w5_retention: offset-0 cohort sizes dominate every later offset") {
    // retention can only lose users: n_users(cohort, k) ≤ n_users(cohort, 0),
    // and offset 0 exists for every cohort
    val r = q("w5_retention")
    val base = r.filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users").as("n0"))
    val joined = r.join(base, "cohort_day")
    assert(joined.filter(col("n_users") > col("n0")).count() == 0)
    assert(base.count() == r.select(col("cohort_day")).distinct().count())
  }

  test("text_unigram_logprob scores are positive and vocab-consistent") {
    // -ln p > 0 for every token of a >1-token corpus, and a doc of maximally
    // common tokens must score below one of rare tokens
    val s = q("text_unigram_logprob")
    assert(s.filter(col("avg_neg_logprob") <= 0).count() == 0)
  }

  test("sample_balanced_pairs: triplet contract — same-source positive, " +
      "cross-source negative, no self pairs") {
    val t = q("sample_balanced_pairs").collect()
    assert(t.nonEmpty)
    t.foreach { r =>
      assert(r.getAs[Long]("anchor_id") != r.getAs[Long]("positive_id"), r.toString)
      assert(r.getAs[String]("anchor_source") != r.getAs[String]("negative_source"), r.toString)
    }
    // positives really share the anchor's source
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    t.foreach { r =>
      assert(docs(r.getAs[Long]("positive_id")) == r.getAs[String]("anchor_source"), r.toString)
      assert(docs(r.getAs[Long]("negative_id")) == r.getAs[String]("negative_source"), r.toString)
    }
  }

  test("sim_mmr_topk: 5 distinct picks per probe, and diversification bites") {
    val m = q("sim_mmr_topk").collect()
    val byQ = m.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2, 3, 4, 5), s"q $qid")
      assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 5, s"q $qid")
    }
    // NOTE: later scores may EXCEED rank 1's (a negative max-dot penalty
    // raises rel − pen above a plain relevance), so no monotonicity claim.
    // Instead assert the operator actually diversifies: at least one probe's
    // pick set differs from its plain relevance top-5 (sim_mips-less: the
    // relevance order is rank of score at step 1 only).
    val plain = q("sim_cosine_topk").collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (k, v) => k -> v.map(_.getAs[Long]("vec_id")).toSet }
    val diverged = byQ.exists { case (qid, rows) =>
      plain.get(qid).exists(_ != rows.map(_.getAs[Long]("vec_id")).toSet)
    }
    assert(diverged, "MMR picked exactly the plain top-5 for every probe")
  }

  test("text_dsir_weights: target-domain docs really score higher") {
    // the whole point of importance weighting: the 'en' (target) slice
    // must average a higher weight than the rest — if it doesn't, the
    // target/raw ratio is wired backwards
    val w = q("text_dsir_weights")
      .join(graft.tables.Tables.documents(spark, sf).select(col("doc_id"), col("lang")),
        "doc_id")
    val en = w.filter(col("lang") === "en").agg(avg(col("dsir_weight"))).head().getDouble(0)
    val rest = w.filter(col("lang") =!= "en").agg(avg(col("dsir_weight"))).head().getDouble(0)
    assert(en > rest, s"en avg $en vs rest avg $rest")
  }

  test("dedup_bloom_probe: Bloom never false-negatives and the leaks exist") {
    val df = q("dedup_bloom_probe")
    // the defining Bloom guarantee: an exact dup can never be missed
    assert(df.filter(col("exact_dup") && !col("bloom_hit")).count() == 0)
    // the planted-leak probes really exercise the positive branch
    assert(df.filter(col("exact_dup")).count() > 0)
  }

  test("text_token_count_bpe: piece count bounds the whitespace count below") {
    // every whitespace token splits into ≥1 BPE piece, so pieces ≥ words
    val t = q("text_token_count_bpe")
    assert(t.filter(col("n_bpe_pieces") < col("n_ws_tokens")).count() == 0)
  }

  test("diag_key_skew: shares are a prefix of a valid distribution") {
    val d = q("diag_key_skew").collect()
    assert(d.length == 10)
    val shares = d.map(r => r.getDouble(r.fieldIndex("share")))
    assert(shares.sum <= 1.0 + 1e-9)
    assert(shares.forall(s => s > 0 && s <= 1.0))
  }

  test("graph_pagerank: teleport floor, full node coverage") {
    val pr = q("graph_pagerank")
    // every rank carries at least the teleport mass
    assert(pr.filter(col("pagerank") < 0.15).count() == 0)
    // every endpoint of the pair graph is ranked (undirected edges:
    // nothing can dangle)
    val pairs = q("dedup_minhash_lsh")
    val nodes = pairs.select(col("da").as("n"))
      .union(pairs.select(col("db").as("n"))).distinct().count()
    assert(pr.count() == nodes, s"ranked ${pr.count()} of $nodes nodes")
  }

  test("Eigen.symmetric: orthonormal basis, A·v = λ·v, descending, deterministic") {
    import graft.functions.Eigen
    // a fixed symmetric matrix with distinct eigenvalues
    val a = Array(
      Array(4.0, 1.0, 0.5, 0.0),
      Array(1.0, 3.0, 0.25, 0.1),
      Array(0.5, 0.25, 2.0, 0.3),
      Array(0.0, 0.1, 0.3, 1.0))
    val (vals, vecs) = Eigen.symmetric(a)
    assert(vals.sliding(2).forall(p => p(0) >= p(1)), "eigenvalues must descend")
    assert(math.abs(vals.sum - (4.0 + 3.0 + 2.0 + 1.0)) < 1e-9, "trace preserved")
    for (i <- vecs.indices; j <- vecs.indices) {
      val dot = vecs(i).zip(vecs(j)).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"v${i}.v${j} = $dot (basis must be orthonormal)")
    }
    for (i <- vecs.indices) {
      val av = a.map(row => row.zip(vecs(i)).map { case (x, y) => x * y }.sum)
      av.zip(vecs(i)).foreach { case (x, y) =>
        assert(math.abs(x - vals(i) * y) < 1e-9, s"A.v${i} must equal lambda${i}.v${i}")
      }
    }
    val (vals2, vecs2) = Eigen.symmetric(a)
    assert(vals.sameElements(vals2) &&
      vecs.zip(vecs2).forall { case (x, y) => x.sameElements(y) },
      "repeated runs must be bit-identical")
  }

  test("emb_pca_topk: Var(pc1) equals the top eigenvalue of the covariance") {
    // the defining property of PCA: the first component captures the
    // largest-variance direction, and its sample variance IS λ1
    import graft.functions.Eigen
    // the SAME matrix assembly the builder uses — one shared code path
    val (cov, _) = graft.queries.Similarity.covarianceMatrix(spark, sf)
    val (vals, _) = Eigen.symmetric(cov)
    val pca = q("emb_pca_topk")
    assert(pca.columns.toSeq == Seq("vec_id", "pc1", "pc2", "pc3", "pc4"))
    val (n, s1, sq1) = pca.agg(count(lit(1)), sum(col("pc1")),
      sum(col("pc1") * col("pc1"))).head() match {
      case r => (r.getLong(0).toDouble, r.getDouble(1), r.getDouble(2))
    }
    val varPc1 = sq1 / n - (s1 / n) * (s1 / n)
    // population variance vs λ1 of the 6dp-rounded covariance: agree to ~1e-3
    assert(math.abs(varPc1 - vals(0)) < 1e-3 * math.max(1.0, vals(0)),
      s"Var(pc1)=$varPc1 vs λ1=${vals(0)}")
    // components are uncorrelated: |corr(pc1, pc2)| ≈ 0
    val r2 = pca.agg(corr(col("pc1"), col("pc2"))).head().getDouble(0)
    assert(math.abs(r2) < 1e-2, s"corr(pc1,pc2)=$r2 (components must be uncorrelated)")
  }

  /** A planted corpus for the fingerprint/estimator contracts: 20 seeded
    * random docs, one exact-duplicate pair (100, 101), one partial-overlap
    * pair (102, 103) sharing a 12-token run.
    */
  private lazy val plantedDir: String = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = ('a' to 'z').flatMap(c1 => ('a' to 'z').map(c2 => s"$c1$c2")).take(120)
    def doc(n: Int): String = Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
    val shared = doc(12)
    val sharedA = doc(12)
    val sharedB = doc(12)
    val dup = doc(25)
    val rows =
      (0 until 20).map(i => (i.toLong, doc(30 + rnd.nextInt(50)))) ++
        Seq(100L -> dup, 101L -> dup,
          102L -> s"${doc(15)} $shared ${doc(15)}",
          103L -> s"${doc(10)} $shared ${doc(20)}",
          104L -> doc(5), // under 7 tokens: no full winnowing window
          // two SEPARATE shared runs at equal offsets → same diagonal,
          // split by >2w of differing middle: the island-segmentation case
          // (fresh doc() calls give each side different random context of
          // identical length, so both runs sit at the same positions)
          105L -> s"${doc(5)} $sharedA ${doc(12)} $sharedB ${doc(5)}",
          106L -> s"${doc(5)} $sharedA ${doc(12)} $sharedB ${doc(5)}")
    val dir = java.nio.file.Files.createTempDirectory("planted-docs")
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("web").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir.toString
  }

  test("text_winnowing: identical docs share fingerprints; density near 2/(w+1); " +
      "short docs yield none") {
    val win = SparkEntry.queries("text_winnowing")(spark, plantedDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // equal text → equal k-gram sequence → equal selections, counts, xor
    assert(win(100L) === win(101L))
    // winnowing's expected density is 2/(w+1) = 0.4; on ≥30-k-gram docs the
    // realized density stays in a loose band around it
    win.filter(_._2._1 >= 30).foreach { case (id, (_, _, _, dens)) =>
      assert(dens > 0.25 && dens < 0.6, s"doc $id density $dens")
    }
    // the partial-overlap pair fingerprints are NOT identical (different
    // context) but both docs have selections
    assert(win(102L) != win(103L) && win(102L)._2 > 0 && win(103L)._2 > 0)
    // fewer than 7 tokens → fewer than w=4 k-grams → no window, no selection
    assert(win(104L)._2 == 0L && win(104L)._3 == 0L)
  }

  test("dedup_winnowing_pairs: the winnowing guarantee transfers to the match step") {
    val pairs = SparkEntry.queries("dedup_winnowing_pairs")(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    // identical docs: every fingerprint shared
    val dup = pairs((100L, 101L))
    assert(dup._2 === 1.0 && dup._3 === 1.0, s"duplicate pair read $dup")
    // the planted 12-token shared run has 6 interior windows; one position
    // can serve at most w=4 of them, so ≥ 2 shared selections are
    // GUARANTEED — the pair cannot be missed
    val overlap = pairs.get((102L, 103L))
    assert(overlap.exists(_._1 >= 2L), s"overlap pair read $overlap")
    pairs.foreach { case (p, (n, c, j)) =>
      assert(n >= 2 && c > 0.0 && c <= 1.0 && j > 0.0 && j <= c + 1e-9, s"$p: ($n, $c, $j)")
    }
  }

  test("dedup_winnowing_spans: the planted overlap locates on its true diagonal") {
    val spans = SparkEntry.queries("dedup_winnowing_spans")(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // doc 102 = 15 tokens + shared(12) + 15; doc 103 = 10 + shared + 20:
    // interior k-grams of the shared run sit at pa ∈ [16, 24], pb ∈ [11, 19]
    // → every true anchor lies on diagonal pa − pb = 5, and the located
    // span must sit inside the planted run (tokens 16..27 of doc 102)
    val hit = spans.get((102L, 103L, 5L))
    assert(hit.isDefined, s"no diag-5 span for the planted pair: ${spans.keys}")
    val (n, aStart, aEnd, bStart) = hit.get
    assert(n >= 2 && aStart >= 16 && aEnd <= 27 && bStart >= 11,
      s"span ($n, $aStart, $aEnd, $bStart) outside the planted run")
    // identical docs: everything on diagonal 0, spanning from the first
    // selection
    assert(spans.contains((100L, 101L, 0L)))
  }

  test("dedup_winnowing_islands: two separate runs on one diagonal split into " +
      "two islands with true bounds") {
    val isl = SparkEntry.queries("dedup_winnowing_islands")(spark, plantedDir)
      .collect()
      .filter(r => r.getLong(0) == 105L && r.getLong(1) == 106L && r.getLong(2) == 0L)
      .map(r => (r.getLong(3), r.getLong(5), r.getLong(6))) // (island, a_start, a_end)
      .sortBy(_._1)
    // doc 105/106: pad(5) + runA(12) + mid(12) + runB(12) + pad(5) at the
    // SAME offsets → one diagonal (0) carrying two runs; interior k-grams
    // sit at [6, 14] and [30, 38], a ≥16-anchor gap no 2w tolerance welds
    assert(isl.length == 2, s"expected 2 islands, got ${isl.toSeq}")
    val Seq((_, a1s, a1e), (_, a2s, a2e)) = isl.toSeq
    assert(a1s >= 6 && a1e <= 17, s"island 1 ($a1s, $a1e) outside run A (6..17)")
    assert(a2s >= 30 && a2e <= 41, s"island 2 ($a2s, $a2e) outside run B (30..41)")
    // the coarse span query welds the same pair into ONE over-extended
    // diagonal span — the exact over-extension islands exist to fix
    val coarse = SparkEntry.queries("dedup_winnowing_spans")(spark, plantedDir)
      .collect().filter(r => r.getLong(0) == 105L && r.getLong(1) == 106L)
      .map(r => (r.getLong(2), r.getLong(4), r.getLong(5)))
    assert(coarse.exists { case (diag, s0, e0) => diag == 0L && s0 <= 14 && e0 >= 30 },
      s"coarse span should bridge both runs: ${coarse.toSeq}")
  }

  test("dedup_minhash_estimate: exact duplicates read est=1, exact=1, err=0; " +
      "estimates are 1/16-quantized") {
    val est = SparkEntry.queries("dedup_minhash_estimate")(spark, plantedDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val dup = est((100L, 101L))
    assert(dup === ((16, 1.0, 1.0, 0.0)), s"duplicate pair read $dup")
    est.foreach { case (pair, (nAgree, estJ, exactJ, err)) =>
      assert(nAgree >= 0 && nAgree <= 16, s"$pair n_agree $nAgree")
      assert(math.abs(estJ * 16 - math.round(estJ * 16)) < 1e-9,
        s"$pair est $estJ not 1/16-quantized")
      assert(exactJ >= 0.0 && exactJ <= 1.0 && math.abs(err - (estJ - exactJ)) < 1e-5)
    }
  }

  test("text_cross_contamination: planted slices read their closed-form " +
      "truth and the eval table is genuinely separate") {
    // the staged second corpus must exist as its own parquet table
    val dir = graft.queries.TextOps.evalCorpusDir(spark, sf)
    val ev = spark.read.parquet(dir)
    assert(ev.columns.toSet == Set("eval_id", "source", "text"))
    val nDup = ev.filter(col("eval_id") < 20000000L).count()
    val nClean = ev.filter(col("eval_id") >= 20000000L).count()
    assert(nDup > 0 && nClean > 0, s"planted slices empty: dup=$nDup clean=$nClean")

    val rows = q("text_cross_contamination").collect().map(r =>
      (r.getAs[Long]("eval_id"), r.getAs[Long]("n_shingles"),
        r.getAs[Long]("n_contaminated"), r.getAs[Double]("contamination"),
        r.getAs[Boolean]("contaminated")))
    assert(rows.nonEmpty, "no eval docs shingled — test is vacuous")
    // verbatim re-ingests: every shingle is a train shingle by identity
    val dup = rows.filter(_._1 < 20000000L)
    assert(dup.nonEmpty, "no planted positives survived shingling")
    dup.foreach { case (id, n, nc, frac, verdict) =>
      assert(nc == n && frac == 1.0 && verdict,
        s"verbatim eval doc $id read $nc/$n contaminated ($frac)")
    }
    // uppercased re-ingests: the train corpus is all-lowercase, so no
    // shingle hash can match — if this fires, the corpus assumption broke
    val clean = rows.filter(_._1 >= 20000000L)
    assert(clean.nonEmpty, "no planted negatives survived shingling")
    clean.foreach { case (id, n, nc, frac, verdict) =>
      assert(nc == 0L && frac == 0.0 && !verdict,
        s"uppercased eval doc $id read $nc/$n contaminated ($frac)")
    }
  }

  test("dedup_cross_minhash: verbatim re-ingests sign identically and hit " +
      "their source; uppercased ones never reach the band index") {
    val rows = q("dedup_cross_minhash").collect().map(r =>
      (r.getAs[Long]("eval_id"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("n_agree"), r.getAs[Boolean]("is_source")))
    assert(rows.nonEmpty, "no cross-corpus candidates — probe is vacuous")
    // a verbatim copy has the IDENTICAL 16-hash signature, so all 4 bands
    // collide with its source and agreement is exact
    val sources = rows.filter(_._4)
    assert(sources.nonEmpty, "no planted source pair surfaced")
    sources.foreach { case (ev, doc, agree, _) =>
      assert(agree == 16 && doc == ev - 10000000L,
        s"planted pair ($ev, $doc) agreed only $agree/16")
    }
    // every verbatim eval doc that shingled at all must surface its source
    val ev = spark.read.parquet(
      graft.queries.TextOps.evalCorpusDir(spark, sf))
    val nDup = ev.filter(col("eval_id") < 20000000L)
      .filter(size(split(trim(col("text")), "\\s+")) >= 4).count()
    assert(sources.map(_._1).distinct.length.toLong == nDup,
      s"${nDup} verbatim docs but ${sources.map(_._1).distinct.length} source hits")
    // the uppercased slice shares no shingle hash with the all-lowercase
    // train corpus: no band key can collide, so it is absent entirely
    assert(rows.forall(_._1 < 20000000L),
      "an uppercased eval doc produced a band collision against the train index")
  }

  test("pipeline_mix_incremental: the merged histogram reproduces the full " +
      "mix exactly, and the slice split is real") {
    val full = q("pipeline_train_mix")
    val inc = q("pipeline_mix_incremental")
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "incremental mix diverges from the full recompute")
    // vacuity: both slices carry survivors, otherwise the merge is a no-op
    val isNew = conv(substring(
      md5(concat(lit("mi"), col("doc_id").cast("string"))), 1, 15), 16, 10)
      .cast("long") % 10 === 0
    val surv = graft.tables.Tables.documents(spark, sf)
      .join(graft.queries.TextOps.filterSurvivorsShared(spark, sf), Seq("doc_id"))
    assert(surv.filter(isNew).head(1).nonEmpty, "delta slice empty — vacuous")
    assert(surv.filter(!isNew).head(1).nonEmpty, "state slice empty — vacuous")
  }

  test("a23_countmin: one-sided error, collisions fire at tiny width, " +
      "and slice sketches merge counter-wise") {
    import graft.queries.TextOps
    val tok = graft.tables.Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
    // production width: never underestimates
    q("a23_countmin").collect().foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: cms ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    // width 8 over a many-hundred-token vocabulary: collisions are
    // guaranteed, the estimate must stay one-sided and STRICTLY
    // overestimate somewhere — the error path the production width never
    // shows at fixture scale
    val counts = tok.groupBy(col("token")).agg(count(lit(1)).as("exact_n"))
    val probes = counts.orderBy(col("exact_n").desc, col("token")).limit(10)
    val tiny = TextOps.cmsEstimates(tok, probes, 8).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(tiny.forall { case (_, ex, cm) => cm >= ex }, s"underestimate: ${tiny.mkString}")
    assert(tiny.exists { case (_, ex, cm) => cm > ex },
      "no collision at width 8 — the overestimation path is unexercised")
    // merge algebra: even-docs sketch + odd-docs sketch == whole sketch
    val docs = graft.tables.Tables.documents(spark, sf)
    def tokOf(p: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      docs.filter(p(col("doc_id")))
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .filter(length(col("token")) > 0)
    val whole = TextOps.cmsSketch(tok, 64)
    val merged = TextOps.cmsSketch(tokOf(_ % 2 === 0), 64)
      .withColumnRenamed("c", "ce")
      .join(TextOps.cmsSketch(tokOf(_ % 2 =!= 0), 64)
        .withColumnRenamed("c", "co"), Seq("r", "pos"), "full")
      .select(col("r"), col("pos"),
        (coalesce(col("ce"), lit(0L)) + coalesce(col("co"), lit(0L))).as("c"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty,
      "slice sketches do not merge to the one-pass sketch")
  }

  test("pipeline_retrieval_metrics: bounded, depth-monotone vs the gain " +
      "audit, and the noise leg loses on every graded metric") {
    val m = q("pipeline_retrieval_metrics").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(m.keySet == Set("dense", "lex", "rrf"))
    m.foreach { case (s, (ndcg, mrr, found)) =>
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"$s ndcg $ndcg out of [0,1]")
      assert(mrr >= 0.0 && mrr <= 1.0, s"$s mrr $mrr out of [0,1]")
      assert(found >= 0L && found <= 50L, s"$s found $found of 50 relevant")
    }
    // the modalities are independent on this corpus: the lexical leg is
    // noise, so dense must dominate it on every metric and fusion can
    // only sit at-or-below dense (the dilution the depth curve measures)
    assert(m("dense")._1 > m("lex")._1 && m("dense")._2 >= m("lex")._2 &&
      m("dense")._3 > m("lex")._3, s"dense does not dominate lex: $m")
    assert(m("rrf")._1 <= m("dense")._1, s"fusion beats dense on noise legs: $m")
    // depth monotonicity against the recall audit: relevant found in the
    // dense top-10 can only exceed the same leg's top-5 hits
    val gain = q("pipeline_hybrid_gain").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("dense")._3 >= gain("dense"),
      s"dense found@10 ${m("dense")._3} < hits@5 ${gain("dense")}")
    assert(m("rrf")._3 >= gain("rrf"),
      s"rrf found@10 ${m("rrf")._3} < hits@5 ${gain("rrf")}")
  }

  test("pipeline_mix_decontaminated: drops exactly the gated survivors whose " +
      "content the eval corpus carries, and the mix re-balances over the rest") {
    val gated = q("pipeline_train_mix_gated").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_docs")).toMap
    val dec = q("pipeline_mix_decontaminated").collect()
    assert(dec.nonEmpty)
    // the decontaminated mix partitions each source's gated survivors
    dec.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_docs") + r.getAs[Long]("n_contam") == gated(src),
        s"source $src: ${r.getAs[Long]("n_docs")} kept + " +
          s"${r.getAs[Long]("n_contam")} dropped != gated ${gated(src)}")
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
    }
    // every gated survivor whose text was verbatim-copied into the eval
    // corpus (the md5-ev < 10 slice) is 100% covered and MUST drop; extra
    // drops beyond that can only be docs whose content reached the eval
    // corpus via a near-dup copy, so per source n_contam >= the planted
    // floor and the total must actually fire
    val planted = graft.tables.Tables.documents(spark, sf)
      .join(graft.queries.TextOps.filterSurvivorsShared(spark, sf), Seq("doc_id"))
      .filter(col("n_chars") >= 60)
      .filter(conv(substring(md5(concat(lit("ev"), col("doc_id").cast("string"))),
        1, 15), 16, 10).cast("long") % 100 < 10)
      .groupBy(col("source")).count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    assert(planted.values.sum > 0, "no planted survivor — the pin is vacuous")
    dec.foreach { r =>
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_contam") >= planted.getOrElse(src, 0L),
        s"source $src dropped ${r.getAs[Long]("n_contam")} < planted floor " +
          s"${planted.getOrElse(src, 0L)}")
    }
  }
}
