package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.VectorExpressions
import graft.tables.Tables._

/** Vector similarity over the `embeddings` table (array<float> column).
  *
  * Brute-force cosine top-k is the correctness baseline: broadcast the probe
  * set, stream the candidate side, no shuffle until the final per-probe top-k
  * aggregation. The LSH variant (random-hyperplane signs) is the scale path:
  * candidates are generated per bucket, so the pairwise work drops from
  * |probes|·N to |probes|·bucket size.
  *
  * All arithmetic runs on array<double> (cast once) with sequential
  * higher-order-function folds — same element order as the oracle, so doubles
  * match exactly.
  */
object Similarity {

  type Q = (SparkSession, String) => DataFrame

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Native codegen'd dot product (graft.expressions.DotProduct): identical
    * sequential fold semantics to the HOF formulation, compiled to a
    * primitive loop.
    */
  private def dot(a: Column, b: Column): Column =
    VectorExpressions.dot(a, b)

  /** The corpus with vectors cast to double and the L2 norm precomputed —
    * the common scan every IVF participant starts from.
    */
  private def ivfBase(s: SparkSession, d: String): DataFrame =
    fanOut(embeddings(s, d), s)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))

  /** The raw covariance moments (i, j, Σxy, Σx, Σy, n) over the upper
    * triangle — ONE corpus scan, one shuffle, d(d+1)/2 output cells. The
    * pair struct carries the two FACTORS next to the product, so the
    * E[x]E[y] term's Σx and Σy aggregate in the SAME pass as Σxy — no
    * separate means table joined back (which would re-scan and re-explode
    * the corpus, verified in the plan). Feeds the oracled emb_covariance
    * cells AND the driver-side [[covarianceMatrix]] assembly.
    */
  private def covMoments(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val vu = fanOut(embeddings(s, d), s).select(
      transform(asDouble(col("embedding")), x => round(x * 1000000).cast("long"))
        .as("vu"))
    vu.select(explode(expr(
      "flatten(transform(vu, (x, i) -> transform(slice(vu, i + 1, size(vu) - i), " +
        "(y, j) -> struct(i AS i, i + j AS j, x * y AS p, x AS xa, y AS xb))))")).as("q"))
      .groupBy(col("q.i").as("i"), col("q.j").as("j"))
      .agg(
        sum(col("q.p").cast(dec)).as("sp"),
        sum(col("q.xa")).as("sua"), sum(col("q.xb")).as("sub"),
        count(lit(1)).as("n"))
  }

  /** The rounded covariance cell over [[covMoments]] columns. + 0.0
    * canonicalizes IEEE negative zero (a near-zero covariance rounds to
    * -0.0 in one engine and 0.0 in the other otherwise).
    */
  private def covCol: Column =
    (round(
      col("sp").cast("double") / 1000000000000.0 / col("n") -
        (col("sua").cast("double") / 1000000.0 / col("n")) *
          (col("sub").cast("double") / 1000000.0 / col("n")), 6) + 0.0).as("cov")

  /** Driver-side assembly of the full symmetric covariance matrix (6dp
    * cells, identical to the oracled emb_covariance output) plus per-dim
    * means — both read from the moments of ONE corpus pass (the diagonal
    * cell's Σx over n is the mean of dimension i). d(d+1)/2 cells: bounded
    * by embedding dimensionality, independent of N — the same bounded
    * driver-collect class as the freqItems sketch. Shared by the
    * emb_pca_topk builder and its spec so both assemble the matrix the
    * same way.
    */
  /** Driver-side memo of [[computeCovarianceMatrix]] keyed by
    * (dir, content stamp): the moments pass is a full-corpus d²/2 HOF
    * expansion, and FOUR queries (pca, whitening, both OPQ audits) plus
    * four Verify-time oracle generators each start from this matrix.
    * The value is a d×d + d array of doubles — kilobytes — so a small
    * LRU map (no Spark blocks, nothing for releaseAll to drop) is the
    * right residency; the content stamp gives the same staleness rule as
    * the frame caches.
    */
  /** Per-key once-only holder: the map monitor covers only the
    * lookup/insert (never a Spark job), while the holder's `lazy val`
    * guarantees exactly ONE thread runs the full-corpus moments pass per
    * (dir, stamp) key — concurrent first callers (parallel prewarm +
    * query threads) block on the holder, not on a duplicated compute.
    */
  private final class CovHolder(compute: () => (Array[Array[Double]], Array[Double])) {
    lazy val value: (Array[Array[Double]], Array[Double]) = compute()
  }
  private val covMemo =
    new java.util.LinkedHashMap[String, CovHolder](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, CovHolder]): Boolean = size() > 8
    }
  private[graft] def covarianceMatrix(
      s: SparkSession, d: String): (Array[Array[Double]], Array[Double]) = {
    val key = d + "|" + ContentStamp.of(d)
    val holder = covMemo.synchronized {
      Option(covMemo.get(key)).getOrElse {
        val h = new CovHolder(() => computeCovarianceMatrix(s, d))
        covMemo.put(key, h)
        h
      }
    }
    holder.value
  }

  private def computeCovarianceMatrix(
      s: SparkSession, d: String): (Array[Array[Double]], Array[Double]) = {
    val rows = covMoments(s, d)
      .select(col("i"), col("j"), covCol, col("sua"), col("n")).collect()
    require(rows.nonEmpty, s"embeddings corpus under $d is empty — no covariance moments")
    val dim = rows.iterator.map(_.getInt(1)).max + 1
    val cov = Array.ofDim[Double](dim, dim)
    val mean = new Array[Double](dim)
    rows.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      cov(i)(j) = c
      cov(j)(i) = c
      if (i == j) mean(i) = r.getLong(3).toDouble / 1000000.0 / r.getLong(4)
    }
    (cov, mean)
  }

  /** DuckDB SQL for emb_pca_topk with the eigenbasis embedded as literals —
    * generated at Verify time (the basis depends on the data dir, so it
    * cannot be a static string). Both engines then run the IDENTICAL
    * computation: a sequential dot product against the same double
    * literals, minus the same mean-offset scalar, rounded to 6dp —
    * `java.lang.Double.toString` prints the shortest round-tripping
    * representation, so DuckDB parses back the exact same doubles and the
    * projection hash-matches bit-for-bit. The eigensolve itself is
    * deterministic (Eigen.symmetric: fixed sweep order, sign convention,
    * tie-broken sort), so generating the oracle from the same covariance
    * moments the query uses is a re-derivation, not a copy of the answer:
    * the distributed work under test — the moments pass and the projection
    * pass — is recomputed independently by DuckDB from the raw parquet.
    */
  def pcaOracleSql(s: SparkSession, d: String): String = {
    val (cov, mean) = covarianceMatrix(s, d)
    val (_, vecs) = graft.functions.Eigen.symmetric(cov)
    basisProjSql(vecs.take(4).toSeq, mean, "pc")
  }

  /** DuckDB SQL for emb_whitening — same literal-embedding scheme as
    * [[pcaOracleSql]], over the variance-normalized basis.
    */
  def whiteningOracleSql(s: SparkSession, d: String): String = {
    val (basis, mean) = whitenedBasis(s, d, 4)
    basisProjSql(basis, mean, "w")
  }

  /** DuckDB SQL for sim_opq_code_gain, generated at Verify time (the
    * rotation depends on the data dir). The d×d snake-allocated eigenbasis
    * and the mean vector embed as double literals
    * (`java.lang.Double.toString` → shortest round-tripping repr, the
    * [[pcaOracleSql]] discipline); DuckDB then replays all three rungs —
    * coordinate build, seed assignment, one Lloyd update, re-encode,
    * min-d2 total — in the same exact integer arithmetic as the Spark
    * pipeline, so the totals hash-match bit-for-bit.
    */
  def opqOracleSql(s: SparkSession, d: String): String = {
    val (basis, mean) = opqBasis(s, d)
    val dim = mean.length
    def out(sfx: String, scheme: String) = s"""
      SELECT '$scheme' AS scheme, tot_$sfx.t AS total_qerr_u,
             round(CAST(tot_$sfx.t AS DOUBLE) / n.n / $dim.0
               / 1000000000000.0, 6) AS mse
      FROM tot_$sfx, n"""
    def tot(sfx: String) = s""",
      q_$sfx AS (SELECT vec_id, sb, d2 FROM cd_$sfx
                 QUALIFY row_number() OVER (PARTITION BY vec_id, sb
                   ORDER BY d2, c_id) = 1),
      tot_$sfx AS (SELECT CAST(sum(d2) AS BIGINT) AS t FROM q_$sfx)"""
    s"""${opqSqlPrefix(basis, mean)},${opqTrainChain("raw")},${opqTrainChain("cen")},${opqTrainChain("opq")}${tot("raw")}${tot("cen")}${tot("opq")}
      ${out("raw", "raw")}
      UNION ALL${out("cen", "centered")}
      UNION ALL${out("opq", "opq")}"""
  }

  /** Shared WITH-clause head of the generated OPQ oracles: corpus, count,
    * mean/basis literals, and the three coordinate tables (raw, centered,
    * rotated). Unreferenced CTEs are inert, so both consumers share one
    * prefix.
    */
  private def opqSqlPrefix(
      basis: Seq[Array[Double]], mean: Array[Double]): String = {
    def dstr(x: Double) = java.lang.Double.toString(x)
    val mLit = mean.map(dstr).mkString("[", ", ", "]")
    val bRows = basis.zipWithIndex.map { case (vj, j) =>
      val off = mean.indices.map(i => mean(i) * vj(i)).sum
      s"(${j + 1}, ${vj.map(dstr).mkString("[", ", ", "]")}, ${dstr(off)})"
    }.mkString(",\n        ")
    s"""
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
      ml AS (SELECT $mLit AS m),
      bs(j, bj, offj) AS (VALUES
        $bRows),
      xu_raw AS (SELECT vec_id, (i - 1) // 8 AS sb, (i - 1) % 8 AS wd,
                        CAST(round(v[i] * 1000000) AS BIGINT) AS xu
                 FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      xu_cen AS (SELECT vec_id, (i - 1) // 8 AS sb, (i - 1) % 8 AS wd,
                        CAST(round((v[i] - ml.m[i]) * 1000000) AS BIGINT) AS xu
                 FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r, ml),
      xu_opq AS (SELECT vec_id, (j - 1) // 8 AS sb, (j - 1) % 8 AS wd,
                        CAST(round((list_dot_product(v, bj) - offj) * 1000000)
                          AS BIGINT) AS xu
                 FROM c CROSS JOIN bs)"""
  }

  /** The per-scheme train/encode replay (seed assignment → one Lloyd
    * update → re-encode distances), instantiated per coordinate-table
    * suffix — shared by the code-gain and recall OPQ oracles.
    */
  private def opqTrainChain(sfx: String): String = s"""
      seeds_$sfx AS (SELECT vec_id AS c_id, sb, wd, xu AS cu
                     FROM xu_$sfx WHERE vec_id < 16),
      a1d_$sfx AS (SELECT x.vec_id, x.sb, s.c_id,
                          sum((x.xu - s.cu) * (x.xu - s.cu)) AS d2
                   FROM xu_$sfx x JOIN seeds_$sfx s
                     ON x.sb = s.sb AND x.wd = s.wd
                   GROUP BY 1, 2, 3),
      a1_$sfx AS (SELECT vec_id, sb, c_id FROM a1d_$sfx
                  QUALIFY row_number() OVER (PARTITION BY vec_id, sb
                    ORDER BY d2, c_id) = 1),
      cents_$sfx AS (SELECT x.sb, a.c_id, x.wd,
                            CAST(round(CAST(sum(x.xu) AS DOUBLE) / count(*))
                              AS BIGINT) AS cu
                     FROM a1_$sfx a JOIN xu_$sfx x
                       ON a.vec_id = x.vec_id AND a.sb = x.sb
                     GROUP BY 1, 2, 3),
      cd_$sfx AS (SELECT x.vec_id, x.sb, k.c_id,
                         sum((x.xu - k.cu) * (x.xu - k.cu)) AS d2
                  FROM xu_$sfx x JOIN cents_$sfx k
                    ON x.sb = k.sb AND x.wd = k.wd
                  GROUP BY 1, 2, 3)"""

  /** DuckDB SQL for stream_opq_encode — the [[opqOracleSql]] machinery
    * cut down to the rotated code table itself: DuckDB independently
    * rotates, trains, and encodes, and the STREAMED per-row encode must
    * land on the identical (vec_id, sub, c_id) set.
    */
  def opqStreamCodesSql(s: SparkSession, d: String): String = {
    val (basis, mean) = opqBasis(s, d)
    s"""${opqSqlPrefix(basis, mean)},${opqTrainChain("opq")}
      SELECT vec_id, sb AS sub, c_id FROM cd_opq
      QUALIFY row_number() OVER (PARTITION BY vec_id, sb ORDER BY d2, c_id) = 1"""
  }

  /** DuckDB SQL for stream_opq_probe — the rotated-space ADC top-5 per
    * probe: the [[opqSqlPrefix]]/[[opqTrainChain]] train/encode replay
    * feeding per-probe LUTs and the code-table join, ranked to 5. The
    * streamed rotate→LUT→join path must land on the identical table.
    */
  def opqAdcProbeSql(s: SparkSession, d: String): String = {
    val (basis, mean) = opqBasis(s, d)
    s"""${opqSqlPrefix(basis, mean)},${opqTrainChain("opq")},
      pcodes AS (SELECT vec_id, sb, c_id FROM cd_opq
                 QUALIFY row_number() OVER (PARTITION BY vec_id, sb
                   ORDER BY d2, c_id) = 1),
      plut AS (SELECT vec_id AS q_id, sb, c_id, d2 FROM cd_opq WHERE vec_id < 10),
      padc AS (SELECT l.q_id, cds.vec_id, CAST(sum(l.d2) AS BIGINT) AS adc_u
               FROM pcodes cds JOIN plut l ON cds.sb = l.sb AND cds.c_id = l.c_id
               WHERE cds.vec_id <> l.q_id
               GROUP BY 1, 2)
      SELECT q_id, vec_id, round(adc_u / 1000000000000.0, 6) AS adc_d2,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY adc_u, vec_id) AS INTEGER) AS rank
      FROM padc
      QUALIFY row_number() OVER (PARTITION BY q_id
        ORDER BY adc_u, vec_id) <= 5"""
  }

  /** DuckDB SQL for sim_opq_train_curve — the pqTrainCurveSql round
    * structure reading the [[opqSqlPrefix]]'s rotated xu_opq coordinates
    * (generated: the basis/mean enter as literals). Per round one
    * distance table serves both that round's error total and the next
    * round's re-assignment, same as the raw-space replay.
    */
  def opqTrainCurveSql(s: SparkSession, d: String): String = {
    val (basis, mean) = opqBasis(s, d)
    def dist(cents: String, out: String) = s""",
      $out AS (SELECT x.vec_id, x.sb, k.c_id,
                      sum((x.xu - k.cu) * (x.xu - k.cu)) AS d2
               FROM xu_opq x JOIN $cents k ON x.sb = k.sb AND x.wd = k.wd
               GROUP BY 1, 2, 3)"""
    def update(assign: String, out: String) = s""",
      $out AS (SELECT x.sb, a.c_id, x.wd,
                      CAST(round(CAST(sum(x.xu) AS DOUBLE) / count(*))
                        AS BIGINT) AS cu
               FROM $assign a JOIN xu_opq x
                 ON a.vec_id = x.vec_id AND a.sb = x.sb
               GROUP BY 1, 2, 3)"""
    def argmin(dt: String, out: String) = s""",
      $out AS (SELECT vec_id, sb, c_id FROM $dt
               QUALIFY row_number() OVER (PARTITION BY vec_id, sb
                 ORDER BY d2, c_id) = 1)"""
    def tot(dt: String, out: String) = s""",
      $out AS (SELECT CAST(sum(d2) AS BIGINT) AS t FROM (
                 SELECT d2 FROM $dt
                 QUALIFY row_number() OVER (PARTITION BY vec_id, sb
                   ORDER BY d2, c_id) = 1))"""
    val rounds = (1 to 4).map { k =>
      val in = if (k == 1) argmin("oa1d", "oa1") + update("oa1", "oc1")
      else argmin(s"odist${k - 1}", s"oa$k") + update(s"oa$k", s"oc$k")
      in + dist(s"oc$k", s"odist$k") + tot(s"odist$k", s"ot$k")
    }.mkString
    val outs = (1 to 4).map { k =>
      s"""
      SELECT CAST($k AS INTEGER) AS iter, ot$k.t AS total_qerr_u,
             round(CAST(ot$k.t AS DOUBLE) / n.n / 64.0
               / 1000000000000.0, 6) AS mse
      FROM ot$k, n"""
    }.mkString("\n      UNION ALL")
    s"""${opqSqlPrefix(basis, mean)},
      oseeds AS (SELECT vec_id AS c_id, sb, wd, xu AS cu
                 FROM xu_opq WHERE vec_id < 16),
      oa1d AS (SELECT x.vec_id, x.sb, s.c_id,
                      sum((x.xu - s.cu) * (x.xu - s.cu)) AS d2
               FROM xu_opq x JOIN oseeds s ON x.sb = s.sb AND x.wd = s.wd
               GROUP BY 1, 2, 3)$rounds
      $outs"""
  }

  /** DuckDB SQL for pipeline_hybrid_retrieval — the OPQ train/encode
    * replay feeding a depth-50 ADC leg, the static BM25 chain (probes
    * doc_id < 10) feeding the depth-50 lexical leg, and the RRF fusion
    * tail — every stage the same arithmetic as its standalone oracle.
    */
  def hybridRetrievalSql(s: SparkSession, d: String): String = {
    val (basis, mean) = opqBasis(s, d)
    s"""${hybridCtes(basis, mean)}
      SELECT q_id, cand, round(rrf_u / 1000000.0, 6) AS rrf, n_legs,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY rrf_u DESC, cand) AS INTEGER) AS rank
      FROM hf
      QUALIFY row_number() OVER (PARTITION BY q_id
        ORDER BY rrf_u DESC, cand) <= 10"""
  }

  /** The WITH chain both hybrid oracles share: the OPQ train/encode
    * replay, the depth-50 ADC leg (dtop), the BM25 chain at doc_id < 10
    * (ltop), and the RRF fusion (hf).
    */
  private def hybridCtes(
      basis: Seq[Array[Double]], mean: Array[Double]): String = {
    s"""${opqSqlPrefix(basis, mean)},${opqTrainChain("opq")},
      hcodes AS (SELECT vec_id, sb, c_id FROM cd_opq
                 QUALIFY row_number() OVER (PARTITION BY vec_id, sb
                   ORDER BY d2, c_id) = 1),
      hlut AS (SELECT vec_id AS q_id, sb, c_id, d2 FROM cd_opq WHERE vec_id < 10),
      hadc AS (SELECT l.q_id, cds.vec_id, CAST(sum(l.d2) AS BIGINT) AS adc_u
               FROM hcodes cds JOIN hlut l ON cds.sb = l.sb AND cds.c_id = l.c_id
               WHERE cds.vec_id <> l.q_id
               GROUP BY 1, 2),
      dtop AS (SELECT q_id, vec_id AS cand,
                      row_number() OVER (PARTITION BY q_id
                        ORDER BY adc_u, vec_id) AS rank
               FROM hadc
               QUALIFY row_number() OVER (PARTITION BY q_id
                 ORDER BY adc_u, vec_id) <= 50),
      htk AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
              FROM documents),
      htok AS (SELECT doc_id, term FROM htk WHERE length(term) > 0),
      htf AS (SELECT doc_id, term, count(*) AS tf FROM htok GROUP BY 1, 2),
      hdl AS (SELECT doc_id, count(*) AS dl FROM htok GROUP BY 1),
      hdf AS (SELECT term, count(*) AS df FROM htf GROUP BY term),
      hn AS (SELECT count(*) AS n_docs FROM documents),
      hst AS (SELECT n_docs,
                     CAST((SELECT sum(dl) FROM hdl) AS DOUBLE) / n_docs AS avgdl
              FROM hn),
      hq AS (SELECT doc_id AS q_doc, term
             FROM (SELECT htf.doc_id, htf.term,
                          round(htf.tf * ln(hn.n_docs / CAST(hdf.df AS DOUBLE)), 6)
                            AS score
                   FROM htf JOIN hdf USING (term) CROSS JOIN hn
                   WHERE htf.doc_id < 10)
             QUALIFY row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term) <= 3),
      hcu AS (SELECT hq.q_doc, htf.doc_id,
                     CAST(round(ln(1 + (hst.n_docs - hdf.df + 0.5) / (hdf.df + 0.5))
                          * ((htf.tf * 2.2)
                             / (htf.tf + 1.2 * (0.25 + 0.75 * hdl.dl / hst.avgdl)))
                          * 1000000) AS BIGINT) AS cu
              FROM htf JOIN hq USING (term) JOIN hdf USING (term)
              JOIN hdl ON htf.doc_id = hdl.doc_id CROSS JOIN hst
              WHERE htf.doc_id <> hq.q_doc),
      hsc AS (SELECT q_doc, doc_id, CAST(sum(cu) AS BIGINT) AS su
              FROM hcu GROUP BY 1, 2),
      ltop AS (SELECT q_doc AS q_id, doc_id AS cand,
                      row_number() OVER (PARTITION BY q_doc
                        ORDER BY su DESC, doc_id) AS rank
               FROM hsc
               QUALIFY row_number() OVER (PARTITION BY q_doc
                 ORDER BY su DESC, doc_id) <= 50),
      legs AS (SELECT q_id, cand,
                      CAST(round(1000000.0 / (60 + rank)) AS BIGINT) AS cu
               FROM dtop
               UNION ALL
               SELECT q_id, cand,
                      CAST(round(1000000.0 / (60 + rank)) AS BIGINT) AS cu
               FROM ltop),
      hf AS (SELECT q_id, cand, CAST(sum(cu) AS BIGINT) AS rrf_u,
                    CAST(count(*) AS BIGINT) AS n_legs
             FROM legs GROUP BY 1, 2)"""
  }

  /** DuckDB SQL for pipeline_hybrid_gain — the fusion audit: recall@5 of
    * the dense leg alone, the lexical leg alone, and the RRF fusion,
    * against the exact raw-space integer-L2 top-5 (the rotation-invariant
    * dense ground truth the OPQ audits share). One WITH chain serves the
    * retrieval oracle and this audit.
    */
  def hybridGainSql(s: SparkSession, d: String): String = {
    val (basis, mean) = opqBasis(s, d)
    def hit(src: String, scheme: String) = s"""
      SELECT '$scheme' AS scheme, CAST(count(*) AS BIGINT) AS n_hits,
             round(CAST(count(*) AS DOUBLE) / 50.0, 6) AS recall_at_5
      FROM (SELECT q_id, cand FROM $src) t
      JOIN x ON t.q_id = x.q_id AND t.cand = x.vec_id"""
    s"""${hybridCtes(basis, mean)},$opqExactCtes,
      d5 AS (SELECT q_id, cand FROM dtop WHERE rank <= 5),
      l5 AS (SELECT q_id, cand FROM ltop WHERE rank <= 5),
      r5 AS (SELECT q_id, cand FROM hf
             QUALIFY row_number() OVER (PARTITION BY q_id
               ORDER BY rrf_u DESC, cand) <= 5)
      ${hit("d5", "dense")}
      UNION ALL${hit("l5", "lexical")}
      UNION ALL${hit("r5", "rrf")}"""
  }

  /** DuckDB SQL for pipeline_retrieval_metrics — the shared hybrid chain's
    * depth-10 lists scored by graded nDCG@10 and MRR@10 against the exact
    * top-5 with its rank kept; the 1/log2(rank+1) discounts are the SAME
    * integer micro-unit literals the Spark side embeds.
    */
  def hybridMetricsSql(s: SparkSession, d: String): String = {
    val (basis, mean) = opqBasis(s, d)
    s"""${hybridCtes(basis, mean)},$opqExactCtes,
      xr AS (SELECT q_id, vec_id AS cand,
                    row_number() OVER (PARTITION BY q_id
                      ORDER BY d2, vec_id) AS erank
             FROM ex
             QUALIFY row_number() OVER (PARTITION BY q_id
               ORDER BY d2, vec_id) <= 5),
      ds(rank, disc_u) AS (VALUES (1, 1000000), (2, 630930), (3, 500000),
                                  (4, 430677), (5, 386853), (6, 356207),
                                  (7, 333333), (8, 315465), (9, 301030),
                                  (10, 289065)),
      rl AS (SELECT 'dense' AS scheme, q_id, cand, rank FROM dtop WHERE rank <= 10
             UNION ALL
             SELECT 'lex' AS scheme, q_id, cand, rank FROM ltop WHERE rank <= 10
             UNION ALL
             SELECT 'rrf' AS scheme, q_id, cand,
                    row_number() OVER (PARTITION BY q_id
                      ORDER BY rrf_u DESC, cand) AS rank
             FROM hf
             QUALIFY row_number() OVER (PARTITION BY q_id
               ORDER BY rrf_u DESC, cand) <= 10),
      sc AS (SELECT rl.scheme,
                    coalesce(6 - xr.erank, 0) * ds.disc_u AS g_u,
                    CASE WHEN xr.erank = 1
                         THEN CAST(round(1000000.0 / rl.rank) AS BIGINT)
                         ELSE 0 END AS rr_u,
                    CASE WHEN xr.erank IS NOT NULL THEN 1 ELSE 0 END AS hit
             FROM rl JOIN ds ON rl.rank = ds.rank
             LEFT JOIN xr ON rl.q_id = xr.q_id AND rl.cand = xr.cand)
      SELECT scheme,
             round(sum(g_u) / (10.0 * 10271927), 6) AS ndcg_at_10,
             round(sum(rr_u) / 10000000.0, 6) AS mrr_at_10,
             CAST(sum(hit) AS BIGINT) AS n_rel_found
      FROM sc GROUP BY 1"""
  }

  /** DuckDB SQL for pipeline_hybrid_ksweep — the shared hybrid WITH
    * chain's depth-50 leg tables fused at every k in the sweep, each
    * fusion's top-5 scored against the exact raw-space top-5.
    */
  def hybridKsweepSql(s: SparkSession, d: String): String = {
    val (basis, mean) = opqBasis(s, d)
    s"""${hybridCtes(basis, mean)},$opqExactCtes,
      kks(k) AS (VALUES (5), (20), (60), (240)),
      klegs AS (SELECT k, q_id, cand,
                       CAST(round(1000000.0 / (k + rank)) AS BIGINT) AS cu
                FROM dtop CROSS JOIN kks
                UNION ALL
                SELECT k, q_id, cand,
                       CAST(round(1000000.0 / (k + rank)) AS BIGINT) AS cu
                FROM ltop CROSS JOIN kks),
      kf AS (SELECT k, q_id, cand, CAST(sum(cu) AS BIGINT) AS rrf_u
             FROM klegs GROUP BY 1, 2, 3),
      k5 AS (SELECT k, q_id, cand FROM kf
             QUALIFY row_number() OVER (PARTITION BY k, q_id
               ORDER BY rrf_u DESC, cand) <= 5),
      kh AS (SELECT k, CAST(count(*) AS BIGINT) AS n_hits
             FROM k5 JOIN x ON k5.q_id = x.q_id AND k5.cand = x.vec_id
             GROUP BY k)
      SELECT kks.k, coalesce(kh.n_hits, CAST(0 AS BIGINT)) AS n_hits,
             round(CAST(coalesce(kh.n_hits, 0) AS DOUBLE) / 50.0, 6)
               AS recall_at_5
      FROM kks LEFT JOIN kh ON kks.k = kh.k"""
  }

  /** DuckDB SQL for pipeline_hybrid_depth_curve — the shared hybrid
    * chain's depth-50 leg tables cut at every depth in the sweep before
    * the k=60 fusion, each fusion's top-5 scored against the exact
    * raw-space top-5.
    */
  def hybridDepthCurveSql(s: SparkSession, d: String): String = {
    val (basis, mean) = opqBasis(s, d)
    s"""${hybridCtes(basis, mean)},$opqExactCtes,
      dds(depth) AS (VALUES (5), (10), (25), (50)),
      dlegs AS (SELECT depth, q_id, cand,
                       CAST(round(1000000.0 / (60 + rank)) AS BIGINT) AS cu
                FROM dtop CROSS JOIN dds WHERE rank <= depth
                UNION ALL
                SELECT depth, q_id, cand,
                       CAST(round(1000000.0 / (60 + rank)) AS BIGINT) AS cu
                FROM ltop CROSS JOIN dds WHERE rank <= depth),
      dfu AS (SELECT depth, q_id, cand, CAST(sum(cu) AS BIGINT) AS rrf_u
              FROM dlegs GROUP BY 1, 2, 3),
      dcut AS (SELECT depth, q_id, cand FROM dfu
               QUALIFY row_number() OVER (PARTITION BY depth, q_id
                 ORDER BY rrf_u DESC, cand) <= 5),
      dhit AS (SELECT depth, CAST(count(*) AS BIGINT) AS n_hits
               FROM dcut JOIN x ON dcut.q_id = x.q_id AND dcut.cand = x.vec_id
               GROUP BY depth)
      SELECT dds.depth, coalesce(dhit.n_hits, CAST(0 AS BIGINT)) AS n_hits,
             round(CAST(coalesce(dhit.n_hits, 0) AS DOUBLE) / 50.0, 6)
               AS recall_at_5
      FROM dds LEFT JOIN dhit ON dds.depth = dhit.depth"""
  }

  /** DuckDB SQL for sim_opq_recall — the [[opqOracleSql]] machinery with
    * an ADC@5-vs-exact-top5 tail per scheme: codes and per-probe LUTs read
    * off the same cd_ distances, the exact baseline is the raw-space
    * integer-L2² top-5 (rotation-invariant ground truth).
    */
  def opqRecallSql(s: SparkSession, d: String): String = {
    val (basis, mean) = opqBasis(s, d)
    def adc(sfx: String) = s""",
      codes_$sfx AS (SELECT vec_id, sb, c_id FROM cd_$sfx
                     QUALIFY row_number() OVER (PARTITION BY vec_id, sb
                       ORDER BY d2, c_id) = 1),
      lut_$sfx AS (SELECT vec_id AS q_id, sb, c_id, d2
                   FROM cd_$sfx WHERE vec_id < 10),
      adc_$sfx AS (SELECT l.q_id, cds.vec_id, CAST(sum(l.d2) AS BIGINT) AS adc_u
                   FROM codes_$sfx cds JOIN lut_$sfx l
                     ON cds.sb = l.sb AND cds.c_id = l.c_id
                   WHERE cds.vec_id <> l.q_id
                   GROUP BY 1, 2),
      top_$sfx AS (SELECT q_id, vec_id FROM adc_$sfx
                   QUALIFY row_number() OVER (PARTITION BY q_id
                     ORDER BY adc_u, vec_id) <= 5),
      hit_$sfx AS (SELECT count(*) AS n FROM top_$sfx t
                   JOIN x ON t.q_id = x.q_id AND t.vec_id = x.vec_id)"""
    def out(sfx: String, scheme: String) = s"""
      SELECT '$scheme' AS scheme, CAST(hit_$sfx.n AS BIGINT) AS n_hits,
             round(CAST(hit_$sfx.n AS DOUBLE) / 50.0, 6) AS recall_at_5
      FROM hit_$sfx"""
    s"""${opqSqlPrefix(basis, mean)},${opqTrainChain("raw")},${opqTrainChain("opq")},$opqExactCtes${adc("raw")}${adc("opq")}
      ${out("raw", "raw")}
      UNION ALL${out("opq", "opq")}"""
  }

  /** Exact raw-space baseline CTEs shared by the generated OPQ oracles:
    * `ex` = every (probe, candidate) integer-L2² pair, `x` = the exact
    * top-5 per probe.
    */
  private val opqExactCtes: String = """
      ex AS (SELECT p.vec_id AS q_id, b.vec_id,
                    sum((p.xu - b.xu) * (p.xu - b.xu)) AS d2
             FROM xu_raw p JOIN xu_raw b ON p.sb = b.sb AND p.wd = b.wd
             WHERE p.vec_id < 10 AND b.vec_id <> p.vec_id
             GROUP BY 1, 2),
      x AS (SELECT q_id, vec_id FROM ex
            QUALIFY row_number() OVER (PARTITION BY q_id
              ORDER BY d2, vec_id) <= 5)"""

  /** DuckDB SQL for sim_opq_rerank_gain — whole-corpus ADC top-50 per
    * scheme, exact re-rank to top-5, recall vs the exact top-5.
    */
  def opqRerankGainSql(s: SparkSession, d: String): String = {
    val (basis, mean) = opqBasis(s, d)
    def leg(sfx: String) = s""",
      codes_$sfx AS (SELECT vec_id, sb, c_id FROM cd_$sfx
                     QUALIFY row_number() OVER (PARTITION BY vec_id, sb
                       ORDER BY d2, c_id) = 1),
      lut_$sfx AS (SELECT vec_id AS q_id, sb, c_id, d2
                   FROM cd_$sfx WHERE vec_id < 10),
      adcd_$sfx AS (SELECT l.q_id, cds.vec_id, CAST(sum(l.d2) AS BIGINT) AS adc_u
                    FROM codes_$sfx cds JOIN lut_$sfx l
                      ON cds.sb = l.sb AND cds.c_id = l.c_id
                    WHERE cds.vec_id <> l.q_id
                    GROUP BY 1, 2),
      adc50_$sfx AS (SELECT q_id, vec_id FROM adcd_$sfx
                     QUALIFY row_number() OVER (PARTITION BY q_id
                       ORDER BY adc_u, vec_id) <= 50),
      rr_$sfx AS (SELECT e.q_id, e.vec_id
                  FROM ex e JOIN adc50_$sfx t
                    ON e.q_id = t.q_id AND e.vec_id = t.vec_id
                  QUALIFY row_number() OVER (PARTITION BY e.q_id
                    ORDER BY e.d2, e.vec_id) <= 5),
      hit_$sfx AS (SELECT count(*) AS n FROM rr_$sfx r
                   JOIN x ON r.q_id = x.q_id AND r.vec_id = x.vec_id)"""
    def out(sfx: String, scheme: String) = s"""
      SELECT '$scheme' AS scheme,
             round(CAST(hit_$sfx.n AS DOUBLE) / 50.0, 6) AS recall_at_depth50
      FROM hit_$sfx"""
    s"""${opqSqlPrefix(basis, mean)},${opqTrainChain("raw")},${opqTrainChain("opq")},$opqExactCtes${leg("raw")}${leg("opq")}
      ${out("raw", "raw")}
      UNION ALL${out("opq", "opq")}"""
  }

  /** DuckDB SQL for sim_opq_ivfpq_gain — the raw-geometry IVF-PQ
    * candidate set (16 full-vector coarse seeds, nprobe=2) with each
    * scheme's codes/LUT restricted to it, ADC top-10, exact re-rank to
    * top-5, recall vs the exact top-5. The candidate CTEs replay the
    * Spark plan's shared coarse-cell directory exactly.
    */
  def opqIvfpqGainSql(s: SparkSession, d: String): String = {
    val (basis, mean) = opqBasis(s, d)
    def leg(sfx: String) = s""",
      codes_$sfx AS (SELECT vec_id, sb, c_id FROM cd_$sfx
                     QUALIFY row_number() OVER (PARTITION BY vec_id, sb
                       ORDER BY d2, c_id) = 1),
      lut_$sfx AS (SELECT vec_id AS q_id, sb, c_id, d2
                   FROM cd_$sfx WHERE vec_id < 10),
      adcd_$sfx AS (SELECT cn.q_id, cn.vec_id, CAST(sum(l.d2) AS BIGINT) AS adc_u
                    FROM cand cn JOIN codes_$sfx cd ON cn.vec_id = cd.vec_id
                    JOIN lut_$sfx l
                      ON l.q_id = cn.q_id AND l.sb = cd.sb AND l.c_id = cd.c_id
                    GROUP BY 1, 2),
      adc10_$sfx AS (SELECT q_id, vec_id FROM adcd_$sfx
                     QUALIFY row_number() OVER (PARTITION BY q_id
                       ORDER BY adc_u, vec_id) <= 10),
      rr_$sfx AS (SELECT e.q_id, e.vec_id
                  FROM ex e JOIN adc10_$sfx t
                    ON e.q_id = t.q_id AND e.vec_id = t.vec_id
                  QUALIFY row_number() OVER (PARTITION BY e.q_id
                    ORDER BY e.d2, e.vec_id) <= 5),
      hit_$sfx AS (SELECT count(*) AS n FROM rr_$sfx r
                   JOIN x ON r.q_id = x.q_id AND r.vec_id = x.vec_id)"""
    def out(sfx: String, scheme: String) = s"""
      SELECT '$scheme' AS scheme,
             round(CAST(hit_$sfx.n AS DOUBLE) / 50.0, 6) AS recall_at_depth10
      FROM hit_$sfx"""
    s"""${opqSqlPrefix(basis, mean)},${opqTrainChain("raw")},${opqTrainChain("opq")},$opqExactCtes,
      cellsd AS (SELECT x.vec_id, s.c16, sum((x.xu - s.cu) * (x.xu - s.cu)) AS d2
                 FROM xu_raw x JOIN (SELECT vec_id AS c16, sb, wd, xu AS cu
                                     FROM xu_raw WHERE vec_id < 16) s
                   ON x.sb = s.sb AND x.wd = s.wd
                 GROUP BY 1, 2),
      cells AS (SELECT vec_id, c16 AS cell FROM cellsd
                QUALIFY row_number() OVER (PARTITION BY vec_id
                  ORDER BY d2, c16) = 1),
      pcells AS (SELECT vec_id AS q_id, c16 AS cell FROM cellsd
                 WHERE vec_id < 10
                 QUALIFY row_number() OVER (PARTITION BY vec_id
                   ORDER BY d2, c16) <= 2),
      cand AS (SELECT p.q_id, c.vec_id FROM cells c
               JOIN pcells p ON c.cell = p.cell
               WHERE c.vec_id <> p.q_id)${leg("raw")}${leg("opq")}
      ${out("raw", "raw")}
      UNION ALL${out("opq", "opq")}"""
  }

  /** Top-k eigenbasis scaled per-component by 1/√λ — the whitening basis
    * (projected coordinates have unit variance and zero cross-covariance).
    * The λ floor guards a degenerate (rank-deficient) corpus from a
    * division blow-up; with real data λ_1..λ_4 ≫ the floor.
    */
  private def whitenedBasis(
      s: SparkSession, d: String, k: Int): (Seq[Array[Double]], Array[Double]) = {
    val (cov, mean) = covarianceMatrix(s, d)
    val (vals, vecs) = graft.functions.Eigen.symmetric(cov)
    ((0 until k).map(j => vecs(j).map(_ / math.sqrt(math.max(vals(j), 1e-12)))), mean)
  }

  /** Snake-dealt eigenvalue allocation — the non-parametric OPQ
    * initialization (Ge et al., "Optimized Product Quantization", CVPR
    * 2013 §4: balance variance mass across subquantizers by permuting the
    * principal axes). Eigen-ranks sorted by λ descending are dealt into
    * `nSub` buckets boustrophedon (0..7, then 7..0, …), so every subspace
    * receives one dimension from each variance tier. Returns, for each
    * NEW dimension index j (subspace-major: j = bucket·subDim + slot),
    * the eigen RANK it carries. Purely positional — deterministic given
    * the deterministic eigensolve.
    */
  private[graft] def opqSnakeOrder(dim: Int, nSub: Int): Array[Int] = {
    // tier can reach floor((dim-1)/nSub); with a remainder that is >=
    // subDim, so bucket*subDim + tier would collide with another bucket's
    // slot and the "permutation" would silently drop/duplicate dimensions
    require(dim % nSub == 0, s"opqSnakeOrder needs nSub | dim, got dim=$dim nSub=$nSub")
    val order = new Array[Int](dim)
    val subDim = dim / nSub
    var r = 0
    while (r < dim) {
      val tier = r / nSub
      val pos = r % nSub
      val bucket = if (tier % 2 == 0) pos else nSub - 1 - pos
      order(bucket * subDim + tier) = r
      r += 1
    }
    order
  }

  /** The OPQ rotation for data dir `d`: per new-dimension basis vectors
    * (snake-allocated eigenvectors) plus the per-dim means. Everything
    * downstream of the covariance pass is deterministic (Eigen.symmetric),
    * so the Verify-time oracle re-derives identical literals.
    */
  private[graft] def opqBasis(
      s: SparkSession, d: String): (Seq[Array[Double]], Array[Double]) = {
    val (cov, mean) = covarianceMatrix(s, d)
    val (_, vecs) = graft.functions.Eigen.symmetric(cov)
    (opqSnakeOrder(mean.length, 8).toSeq.map(vecs(_)), mean)
  }

  /** Single-Literal constant vectors/matrices (the EncodeIngest centsLit
    * discipline): `array(lit(...))` per element builds a tree ANALYSIS
    * re-walks on every action before ConstantFolding collapses it — a
    * 64×64 basis is ~4k nodes of per-action planning tax. One pre-folded
    * Literal node carries the identical values under the identical type.
    */
  private def dArrLit(xs: Seq[Double]): Column =
    org.apache.spark.sql.GraftDatasetShim.literalCol(xs,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType, containsNull = false))

  private def dMatLit(m: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.GraftDatasetShim.literalCol(m,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false),
        containsNull = false))

  /** Shared projection column builder: col j = round(dot(x, b_j) −
    * dot(mean, b_j), 6) (+0.0 canonicalizes IEEE −0 after rounding). The
    * mean offset folds to a driver scalar so centering never touches the
    * corpus; the projection pass is scan → project, zero shuffles.
    */
  private def basisProjCols(
      basis: Seq[Array[Double]], mean: Array[Double], prefix: String) =
    basis.zipWithIndex.map { case (vj, j) =>
      val offset = mean.indices.map(i => mean(i) * vj(i)).sum
      val vLit = dArrLit(vj.toSeq)
      (round(aggregate(
        zip_with(asDouble(col("embedding")), vLit, (x, c) => x * c),
        lit(0.0), (acc, x) => acc + x) - offset, 6) + 0.0).as(s"$prefix${j + 1}")
    }

  /** DuckDB mirror of [[basisProjCols]], with the basis as SQL literals. */
  private def basisProjSql(
      basis: Seq[Array[Double]], mean: Array[Double], prefix: String): String = {
    val cols = basis.zipWithIndex.map { case (vj, j) =>
      val offset = mean.indices.map(i => mean(i) * vj(i)).sum
      val arr = vj.map(java.lang.Double.toString).mkString("[", ", ", "]")
      s"round(list_dot_product(embedding::DOUBLE[], $arr) - " +
        s"(${java.lang.Double.toString(offset)}), 6) + 0.0 AS $prefix${j + 1}"
    }
    s"SELECT vec_id,\n  ${cols.mkString(",\n  ")}\nFROM embeddings"
  }

  /** The IVF probe shape shared by the fixture and trained codebooks:
    * build inverted lists by nearest-centroid assignment, probe the 2
    * closest lists per query vector, exact-rescore within the probed
    * lists, keep the top-5. `cents` must carry (c_id, cv, cn) and be
    * centroid-count-bounded — it broadcasts to both the corpus assignment
    * and the probes, so the corpus never shuffles for the quantizer.
    */
  private def ivfProbe(base: DataFrame, cents: DataFrame): DataFrame = {
    val csim = round(dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("c_id"))
    // inverted lists: every vector tagged with its nearest centroid
    val assigned = base.join(broadcast(cents))
      .withColumn("csim", csim)
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("c_id"))
    // probes: same quantizer, keep the 2 closest clusters each
    val probes = base.filter(col("vec_id") < 10).join(broadcast(cents))
      .withColumn("csim", csim)
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") <= 2)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qn"), col("c_id"))
    val cos = round(
      dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
    val wTop = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 5)
  }

  /** Label-carrying IVF frames for the filtered-ANN family — the
    * sim_ivf_topk fixture quantizer (vec_id<16 centroids, nprobe=2) with
    * `label` riding along: `assigned` is every vector tagged with its
    * nearest cell, `probes` the <10 queries with their 2 probed cells and
    * their own label as the filter target (same-class retrieval). One
    * definition so sim_ivf_filtered and its pre/post sweep measure the
    * identical index.
    */
  private def ivfLabeledFrames(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val base = fanOut(embeddings(s, d), s)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val cents = base.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
    val csim = round(dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6)
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("c_id"))
    val assigned = base.join(broadcast(cents))
      .withColumn("csim", csim)
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("label"), col("v"), col("nrm"), col("c_id"))
    val probes = base.filter(col("vec_id") < 10).join(broadcast(cents))
      .withColumn("csim", csim)
      .withColumn("crank", row_number().over(wAssign))
      .filter(col("crank") <= 2)
      .select(col("vec_id").as("q_id"), col("label").as("tgt"),
        col("v").as("qv"), col("nrm").as("qn"), col("c_id"))
    (assigned, probes)
  }

  /** The filtered-exact ground truth both filtered-ANN queries share:
    * brute-force cosine top-5 over ONLY the probe's own-label population
    * (the declared broadcast-probe baseline class). Returns
    * (q_id, tgt, vec_id, cos, rank ≤ 5).
    */
  private def filteredExact(s: SparkSession, d: String): DataFrame = {
    val base = fanOut(embeddings(s, d), s)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
    val p1 = base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("label").as("tgt"),
        col("v").as("qv"), col("nrm").as("qn"))
    val cos = round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
    val wTop = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    base.join(broadcast(p1))
      .filter(col("vec_id") =!= col("q_id") && col("label") === col("tgt"))
      .select(col("q_id"), col("tgt"), col("vec_id"), cos.as("cos"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= 5)
  }

  /** (vec_id, sub, wd, xu) — every vector's coordinates in integer
    * micro-units, keyed by PQ subspace (`sub` = dim div 8) and
    * within-subspace dimension (`wd` = dim mod 8). The shared scan both
    * PQ stages start from; pure posexplode, no shuffle.
    */
  private def pqXu(s: SparkSession, d: String): DataFrame =
    fanOut(embeddings(s, d), s)
      .select(col("vec_id"), posexplode(asDouble(col("embedding"))).as(Seq("dim", "x")))
      .select(col("vec_id"), expr("dim div 8").as("sub"), (col("dim") % 8).as("wd"),
        round(col("x") * 1000000).cast("long").as("xu"))

  // ---- array-shape PQ kernel (r13 optimization) -------------------------
  //
  // The original per-dimension kernel ([[pqAssign]]/[[qerrAgainst]]/
  // [[lloydUpdate]]) joined the 64-rows-per-vector coordinate stream
  // against the broadcast codebook on (sub, wd) — a 16× row explosion to
  // N·1024 intermediate rows — then needed a hash aggregate over
  // N·128 (vec, sub, c_id) groups (one Exchange) AND an argmin window over
  // (vec, sub) (a second Exchange) per assignment pass; a training curve
  // runs eight such passes (bench r13 baseline: 114-117 shuffle-MB per
  // curve query). The array shape slices each vector into its 8 subvectors
  // ONCE (pure map, 8 rows per vector), broadcasts the codebook as one
  // 8-row (sub → 16 candidate structs) dim, and folds the argmin PER ROW —
  // the exact shape the streaming encoder (EncodeIngest) already proved
  // bit-identical: strict less-than over c_id-ascending candidates replays
  // the (d2, c_id)-ascending window rule. Assignment and quantization
  // error become ZERO-shuffle map passes; the Lloyd update's only exchange
  // carries 1024-group partial means. At scale this is the difference
  // between shuffling the corpus per training pass and never shuffling it.

  /** (vec_id, sub, xs: array<long>[8]) — every vector's 8 subvectors in
    * integer micro-units; pure chunked projection, no shuffle. The same
    * rounding as [[pqXu]] (round(x·1e6) per dimension), so all integer
    * arithmetic downstream is bit-identical.
    */
  private def pqXuArr(s: SparkSession, d: String): DataFrame =
    chunkedXuFrame(fanOut(embeddings(s, d), s),
      transform(asDouble(col("embedding")),
        x => round(x * 1000000).cast("long")))

  /** Per-subspace candidate directory from a per-dim (sub, wd, c_id, cu)
    * codebook: (sub, cands: array<struct<c_id, cu[8]>>) with cands sorted
    * by c_id ascending — the tie order the argmin fold relies on. Two
    * codebook-bounded aggregations (≤128 → ≤8 rows); the corpus never
    * participates.
    */
  private def centsBySub(cents: DataFrame): DataFrame =
    centsArrBySub(cents.groupBy(col("sub"), col("c_id"))
      .agg(transform(array_sort(collect_list(struct(col("wd"), col("cu")))),
        w => w.getField("cu")).as("cu")))

  /** As [[centsBySub]], from an already array-shaped (sub, c_id, cu[8])
    * codebook (seed frames are born in this shape).
    */
  private def centsArrBySub(centsArr: DataFrame): DataFrame =
    centsArr.groupBy(col("sub"))
      .agg(array_sort(collect_list(struct(col("c_id"), col("cu")))).as("cands"))

  /** Argmin struct (d2, c_id) over a c_id-ascending candidate array:
    * strict less-than keeps the FIRST (= lowest c_id) candidate on d2
    * ties — the [[pqAssign]] (d2, c_id)-ascending rule. The accumulator
    * seeds with the first candidate's c_id (so the id type is inherited,
    * never invented) and an unreachable d2 (real distances are ≤
    * 8·(2e6)² ≪ Long.MaxValue), so the first candidate always replaces it.
    */
  private def argminCand(cands: Column, d2Of: Column => Column): Column =
    aggregate(cands,
      struct(lit(Long.MaxValue).as("d2"),
        element_at(cands, 1).getField("c_id").as("c_id")),
      (acc, c) => {
        val d2 = d2Of(c)
        when(d2 < acc.getField("d2"),
          struct(d2.as("d2"), c.getField("c_id").as("c_id"))).otherwise(acc)
      })

  private def assignBest(xuArr: DataFrame, cands: DataFrame): DataFrame =
    xuArr.join(broadcast(cands), Seq("sub"))
      .withColumn("best", argminCand(col("cands"),
        c => VectorExpressions.l2sq(col("xs"), c.getField("cu"))))

  /** [[pqAssign]] in the array shape: (vec_id, sub, c_id), zero shuffle. */
  private def pqAssignArr(xuArr: DataFrame, cents: DataFrame): DataFrame =
    assignBest(xuArr, centsBySub(cents))
      .select(col("vec_id"), col("sub"), col("best").getField("c_id").as("c_id"))

  /** [[qerrAgainst]] in the array shape: one (t) row, zero shuffle before
    * the scalar aggregate.
    */
  private def qerrAgainstArr(xuArr: DataFrame, cands: DataFrame): DataFrame =
    assignBest(xuArr, cands)
      .select(col("best").getField("d2").as("d2"))
      .agg(sum(col("d2")).as("t"))

  /** [[lloydUpdate]] in the array shape: assignment and member-mean update
    * in ONE corpus pass (the subvector rides the row to the explode — no
    * join back onto the coordinate table), one 1024-group exchange.
    */
  private def lloydUpdateCands(xuArr: DataFrame, cands: DataFrame): DataFrame =
    assignBest(xuArr, cands)
      .select(col("sub"), col("best").getField("c_id").as("c_id"),
        posexplode(col("xs")).as(Seq("wd", "xu")))
      .groupBy(col("sub"), col("c_id"), col("wd"))
      .agg(round(sum(col("xu")).cast("double") / count(lit(1))).cast("long").as("cu"))

  private def lloydUpdateArr(xuArr: DataFrame, cents: DataFrame): DataFrame =
    lloydUpdateCands(xuArr, centsBySub(cents))

  /** [[trainCents]] in the array shape: seed assignment + one Lloyd
    * update; seeds (vec_id < 16) are already array-shaped rows.
    */
  private def trainCentsArr(xuArr: DataFrame): DataFrame =
    lloydUpdateCands(xuArr, centsArrBySub(
      xuArr.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("sub"), col("xs").as("cu"))))
  // ---- end array-shape PQ kernel ----------------------------------------


  /** (vec_id, sub, wd, xu) with xu = round((x − mean)·1e6) — [[pqXu]]'s
    * shape over CENTERED coordinates, the middle rung of the OPQ audit
    * ladder (isolates the centering gain from the rotation gain).
    */
  private[graft] def centeredXu(
      s: SparkSession, d: String, mean: Array[Double]): DataFrame = {
    val mLit = dArrLit(mean.toSeq)
    fanOut(embeddings(s, d), s)
      .select(col("vec_id"), posexplode(
        zip_with(asDouble(col("embedding")), mLit,
          (x, m) => round((x - m) * 1000000).cast("long"))).as(Seq("dim", "xu")))
      .select(col("vec_id"), expr("dim div 8").as("sub"),
        (col("dim") % 8).as("wd"), col("xu"))
  }

  /** Chunk a 64-long per-dim integer coordinate array into the
    * (vec_id, sub: long, xs[8]) subvector rows of the array-shape kernel —
    * pure map, no shuffle.
    */
  private def chunkedXuFrame(base: DataFrame, xuPerDim: Column): DataFrame =
    base.select(col("vec_id"), posexplode(
        transform(sequence(lit(0), lit(7)), sA =>
          transform(sequence(lit(0), lit(7)),
            w => element_at(xuPerDim, sA * lit(8) + w + lit(1)))))
        .as(Seq("sub0", "xs")))
      .select(col("vec_id"), col("sub0").cast("long").as("sub"), col("xs"))

  /** [[centeredXu]] in the array shape. */
  private def centeredXuArr(
      s: SparkSession, d: String, mean: Array[Double]): DataFrame = {
    val mLit = dArrLit(mean.toSeq)
    chunkedXuFrame(fanOut(embeddings(s, d), s),
      zip_with(asDouble(col("embedding")), mLit,
        (x, m) => round((x - m) * 1000000).cast("long")))
  }

  /** [[opqXu]] in the array shape. */
  private def opqXuArr(s: SparkSession, d: String,
      basis: Seq[Array[Double]], mean: Array[Double]): DataFrame = {
    val bLit = dMatLit(basis.map(_.toSeq))
    val oLit = dArrLit(basis.map(vj => mean.indices.map(i => mean(i) * vj(i)).sum))
    chunkedXuFrame(
      fanOut(embeddings(s, d), s)
        .select(col("vec_id"), asDouble(col("embedding")).as("v")),
      zip_with(bLit, oLit, (bj, oj) =>
        round((aggregate(zip_with(col("v"), bj, (x, c) => x * c),
          lit(0.0), (acc, x) => acc + x) - oj) * 1000000).cast("long")))
  }

  /** (vec_id, sub, wd, xu) in the OPQ basis: new coordinate j =
    * dot(x, b_j) − dot(mean, b_j), rounded once to integer micro-units.
    * The rotation is a zero-shuffle projection pass (the [[basisProjCols]]
    * shape over the full d×d literal basis); everything downstream runs
    * the unmodified integer PQ pipeline.
    */
  private[graft] def opqXu(s: SparkSession, d: String,
      basis: Seq[Array[Double]], mean: Array[Double]): DataFrame = {
    val bLit = dMatLit(basis.map(_.toSeq))
    val oLit = dArrLit(basis.map(vj => mean.indices.map(i => mean(i) * vj(i)).sum))
    fanOut(embeddings(s, d), s)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .select(col("vec_id"), posexplode(
        zip_with(bLit, oLit, (bj, oj) =>
          round((aggregate(zip_with(col("v"), bj, (x, c) => x * c),
            lit(0.0), (acc, x) => acc + x) - oj) * 1000000).cast("long")))
        .as(Seq("dim", "xu")))
      .select(col("vec_id"), expr("dim div 8").as("sub"),
        (col("dim") % 8).as("wd"), col("xu"))
  }

  /** One (scheme, total_qerr_u, mse) audit row: encode `xu` against
    * `cents` and sum every (vector, subspace)'s minimal integer L2²
    * quantization error — an exact BIGINT total (order-free), with the
    * per-dimension MSE formed once from integers both engines agree on.
    */
  private def pqQerrRow(s: SparkSession, d: String, xuArr: DataFrame,
      cents: DataFrame, scheme: String, dim: Int): DataFrame = {
    val n = embeddings(s, d).agg(count(lit(1)).as("n"))
    qerrAgainstArr(xuArr, centsBySub(cents)).crossJoin(n)
      .select(lit(scheme).as("scheme"), col("t").as("total_qerr_u"),
        round(col("t").cast("double") / col("n") / dim.toDouble
          / 1000000000000.0, 6).as("mse"))
  }

  /** Session-scoped cache of the OPQ-ROTATED coordinate table — the
    * rotate-once-at-ingest production shape (the rotation is part of the
    * index build, not the query): both OPQ audits start from it, and the
    * build also embeds the covariance/eigensolve driver work (itself
    * memoized in [[covarianceMatrix]]).
    */
  private val sharedOpqXu = new SessionFrameCache(4, "sharedOpqXu")

  /** The ARRAY-shape rotated coordinate table (vec_id, sub, xs[8]) — what
    * the cache actually holds (8 rows per vector instead of 64; the
    * array-shape kernel's native input). [[opqXuShared]] derives the
    * per-dim view from it with one shuffle-free posexplode.
    */
  def opqXuArrShared(s: SparkSession, d: String): DataFrame = {
    val (basis, mean) = opqBasis(s, d)
    sharedOpqXu.getOrBuild(s, d)(opqXuArr(s, d, basis, mean))
  }

  def opqXuShared(s: SparkSession, d: String): DataFrame =
    opqXuArrShared(s, d)
      .select(col("vec_id"), col("sub"), posexplode(col("xs")).as(Seq("wd", "xu")))

  /** Unpersist and drop every shared rotated-coordinate frame of `s`. */
  def releaseOpqXu(s: SparkSession): Unit = sharedOpqXu.release(s)

  /** Session-scoped cache of the codebook trained in the rotated space —
    * the OPQ family's train-once artifact, same lifecycle as
    * [[pqCodebookShared]].
    */
  private val sharedOpqCents = new SessionFrameCache(4, "sharedOpqCents")
  def opqCentsShared(s: SparkSession, d: String): DataFrame = {
    // parent materialized OUTSIDE this cache's monitor (the TextOps lock
    // discipline: derived → parent only, no jobs under two monitors)
    val xu = opqXuArrShared(s, d)
    sharedOpqCents.getOrBuild(s, d)(trainCentsArr(xu))
  }

  /** Unpersist and drop every shared rotated-codebook frame of `s`. */
  def releaseOpqCents(s: SparkSession): Unit = sharedOpqCents.release(s)

  /** Session-scoped cache of the rotated-space CODE TABLE — encode once,
    * every rotated-ADC consumer scans codes (the [[pqCodesShared]]
    * lifecycle in the rotated space).
    */
  private val sharedOpqCodes = new SessionFrameCache(4, "sharedOpqCodes")
  def opqCodesShared(s: SparkSession, d: String): DataFrame = {
    // parents materialized OUTSIDE this cache's monitor (lock discipline)
    val xu = opqXuArrShared(s, d)
    val cents = opqCentsShared(s, d)
    sharedOpqCodes.getOrBuild(s, d)(pqAssignArr(xu, cents))
  }

  /** Unpersist and drop every shared rotated-code frame of `s`. */
  def releaseOpqCodes(s: SparkSession): Unit = sharedOpqCodes.release(s)

  /** Driver-collected codebook for the streaming encode-at-ingest path:
    * per subspace (index = sub), the centroid list sorted by c_id
    * ascending, each with its 8 per-dimension micro-unit coordinates —
    * the 1024-cell artifact a streaming encoder embeds as literals (the
    * streaming analogue of the broadcast the batch `pqAssign` does).
    */
  private[graft] def collectedCents(
      cents: DataFrame): IndexedSeq[Seq[(Int, Array[Long])]] = {
    val rows = cents.select(col("sub").cast("int"), col("c_id").cast("int"),
      col("wd").cast("int"), col("cu").cast("long")).collect()
    val bySub = rows.groupBy(_.getInt(0))
    val nSub = bySub.keySet.max + 1
    (0 until nSub).map { sub =>
      bySub.getOrElse(sub, Array.empty[org.apache.spark.sql.Row])
        .groupBy(_.getInt(1)).toSeq.sortBy(_._1)
        .map { case (cid, cells) =>
          val cus = new Array[Long](8)
          cells.foreach(r => cus(r.getInt(2)) = r.getLong(3))
          (cid, cus)
        }
    }
  }

  /** Session-scoped cache of the trained PQ codebook — per-subspace k=16
    * centroids from ONE Lloyd step (L2 assignment) over the deterministic
    * vec_id<16 seed subvectors; per-dimension member means rounded back to
    * micro-units, the single rounding in the PQ pipeline (lifecycle:
    * [[SessionFrameCache]]). Training costs two corpus passes; the
    * product is 8×16×8 = 1024 cells. Both sim_pq_adc and sim_pq_recall
    * consume it, and a session re-probing an already-quantized corpus is
    * exactly the train-once-probe-many shape production PQ runs — the
    * cache makes the queries measure that steady state instead of
    * re-training per invocation.
    */
  private val sharedPqCodebook = new SessionFrameCache(4, "sharedPqCodebook")
  def pqCodebookShared(s: SparkSession, d: String): DataFrame =
    sharedPqCodebook.getOrBuild(s, d)(trainCentsArr(pqXuArr(s, d)))


  /** Shrunk-shortlist recall read-out shared by the code-quality audits
    * (sim_ivfpq_code_gain, sim_opq_ivfpq_gain): ADC top-10 shortlist →
    * exact integer-L2 re-rank → top-5 → recall vs the exact top-5. Depth
    * 10 is the regime where ADC ORDERING is the binding constraint (the
    * production 50×k shortlist forgives most code noise).
    */
  private def ivfpqRecallAtDepth10(
      s: SparkSession, d: String, adcr: DataFrame, scheme: String): DataFrame =
    pqRecallAtDepth(s, d, adcr, scheme, 10, "recall_at_depth10")

  /** Generalized shrunk-shortlist recall: ADC top-`depth` shortlist →
    * exact integer-L2 re-rank → top-5 → recall vs the exact top-5,
    * emitted under `outCol`.
    */
  private def pqRecallAtDepth(s: SparkSession, d: String, adcr: DataFrame,
      scheme: String, depth: Int, outCol: String): DataFrame = {
    val wShort = Window.partitionBy(col("q_id")).orderBy(col("adc_u"), col("vec_id"))
    val shortlist = adcr
      .withColumn("r", row_number().over(wShort)).filter(col("r") <= depth)
      .select(col("q_id"), col("vec_id"))
    val vu = pqVu(s, d)
    val probes = vu.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("vu").as("qu"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
    val top5 = vu.join(broadcast(shortlist), Seq("vec_id"))
      .join(broadcast(probes), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        graft.expressions.VectorExpressions.l2sq(col("qu"), col("vu")).as("d2"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id"))
    top5.join(pqExactTop5(s, d), Seq("q_id", "vec_id"))
      .agg(count(lit(1)).as("n_hits"))
      .select(lit(scheme).as("scheme"),
        round(col("n_hits").cast("double") / 50.0, 6).as(outCol))
  }

  /** Session-scoped cache of the hybrid stack's two RANKED leg tables —
    * (q_id, cand, rank, leg) at depth 50, leg ∈ {dense, lex}. FOUR
    * queries (retrieval, the gain audit, the k sweep, the depth curve)
    * fuse/cut/score the same legs, and the gain audit replays the
    * retrieval query inline on top — without this cache each invocation
    * re-ran the whole-corpus rotated-ADC pass AND the BM25 probe pass.
    * The cached frame is ≤ 2·50·|probes| narrow rows; in production the
    * legs are the per-modality retrieval services a fusion layer
    * consumes, computed once per query batch.
    */
  /** The UNCACHED legs build — what [[hybridLegsShared]] materializes.
    * Exposed for PlanSpec: since the cache serves a truncated LogicalRDD
    * view (r13), the corpus-pass plan contract (probe-broadcast joins,
    * keyed ranking) is pinned on this build plan, not the consumer's.
    */
  private[graft] def hybridLegsBuild(s: SparkSession, d: String): DataFrame =
    hybridDenseLeg(s, d).withColumn("leg", lit("dense"))
      .unionByName(hybridLexLeg(s, d).withColumn("leg", lit("lex")))

  private val sharedHybridLegs = new SessionFrameCache(4, "sharedHybridLegs")
  def hybridLegsShared(s: SparkSession, d: String): DataFrame = {
    // parents materialized OUTSIDE this cache's monitor (the TextOps
    // lock discipline: acquisition order is derived → parent only) —
    // constructing the build plan here triggers the parent caches' builds
    val legs = hybridLegsBuild(s, d)
    sharedHybridLegs.getOrBuild(s, d)(legs)
  }

  /** Unpersist and drop every shared hybrid-leg frame of session `s`. */
  def releaseHybridLegs(s: SparkSession): Unit = sharedHybridLegs.release(s)

  /** The hybrid stack's DENSE leg: whole-corpus rotated ADC per probe,
    * ranked to depth 50 — (q_id, cand, rank). Factored so the retrieval
    * query, the gain audit, and the k sweep rank the SAME leg table.
    */
  private def hybridDenseLeg(s: SparkSession, d: String): DataFrame = {
    val wD = Window.partitionBy(col("q_id")).orderBy(col("adc_u"), col("vec_id"))
    opqCodesShared(s, d)
      .join(broadcast(opqLut(s, d)), Seq("sub", "c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("d2")).as("adc_u"))
      .withColumn("rank", row_number().over(wD)).filter(col("rank") <= 50)
      .select(col("q_id"), col("vec_id").as("cand"), col("rank"))
  }

  /** The hybrid stack's LEXICAL leg: BM25 over the same probe ids,
    * ranked to depth 50 — (q_id, cand, rank).
    */
  private def hybridLexLeg(s: SparkSession, d: String): DataFrame = {
    val wL = Window.partitionBy(col("q_doc")).orderBy(col("su").desc, col("doc_id"))
    TextOps.bm25Scored(s, d, col("doc_id") < 10)
      .withColumn("rank", row_number().over(wL)).filter(col("rank") <= 50)
      .select(col("q_doc").as("q_id"), col("doc_id").as("cand"), col("rank"))
  }

  /** Per-probe ADC lookup table in the ROTATED space — [[pqLut]]'s shape
    * over the shared rotated coordinates/codebook.
    */
  private def opqLut(s: SparkSession, d: String): DataFrame =
    opqXuShared(s, d).filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("sub"), col("wd"), col("xu").as("qu"))
      .join(broadcast(opqCentsShared(s, d)), Seq("sub", "wd"))
      .groupBy(col("q_id"), col("sub"), col("c_id"))
      .agg(sum((col("qu") - col("cu")) * (col("qu") - col("cu"))).as("d2"))


  /** Unpersist and drop every shared PQ codebook frame of session `s`. */
  def releasePqCodebook(s: SparkSession): Unit = sharedPqCodebook.release(s)

  /** Session-scoped cache of the PQ CODE TABLE — the 8-rows-per-vector
    * (vec_id, sub, c_id) encoding of the whole corpus against the trained
    * codebook (lifecycle: [[SessionFrameCache]]). In production PQ this IS
    * the index: vectors are encoded once at ingest and every query scans
    * codes, never raw vectors. Before this cache, `sim_pq_adc` and (via
    * composition) `sim_pq_recall` each re-ran the encode pass — a full
    * corpus posexplode + broadcast-join + per-(vec,sub) argmin — per
    * invocation; now one encode serves every ADC consumer in the session.
    */
  private val sharedPqCodes = new SessionFrameCache(4, "sharedPqCodes")
  def pqCodesShared(s: SparkSession, d: String): DataFrame = {
    // codebook materialized OUTSIDE this cache's monitor (the TextOps
    // lock discipline: derived → parent only, no jobs under two monitors)
    val cents = pqCodebookShared(s, d)
    sharedPqCodes.getOrBuild(s, d)(pqAssignArr(pqXuArr(s, d), cents))
  }

  /** The UNCACHED code-table build — what [[pqCodesShared]] materializes.
    * Exposed for PlanSpec to pin the r13 array-kernel shape (broadcast
    * candidate dim + per-row argmin fold, zero corpus shuffle).
    */
  private[graft] def pqCodesBuild(s: SparkSession, d: String): DataFrame = {
    val cents = pqCodebookShared(s, d)
    pqAssignArr(pqXuArr(s, d), cents)
  }

  /** Unpersist and drop every shared PQ code frame of session `s`. */
  def releasePqCodes(s: SparkSession): Unit = sharedPqCodes.release(s)

  /** Re-rank shortlist depth: 50×k for k=5 — the multiplier is the knob a
    * production deployment tunes for target recall (FAISS-style setups
    * commonly re-rank 10–100× the final k). On THIS corpus the near-uniform
    * synthetic embeddings are a worst case for a 1-Lloyd-step k=16
    * quantizer — the measured depth-recall curve at sf0.01 is 50→0.72,
    * 100→0.80, 200→0.98, 230→1.00 — so 50×k is the smallest round
    * multiplier that recovers the exact top-5 for every probe (pinned in
    * WideOpsSpec). Clustered real-world embeddings reach recall 1.0 far
    * shallower; the |probes|×250 shortlist stays broadcast-bounded either
    * way.
    */
  private val RerankShortlist = 250

  /** Per-probe ADC lookup table: (q_id, sub, c_id, d2) — the |probes|·8·16
    * structure every ADC scan broadcasts (Jégou et al. §IV.A). Derived from
    * the shared codebook; codebook-bounded, never corpus-sized.
    */
  private def pqLut(s: SparkSession, d: String): DataFrame = {
    val cents = pqCodebookShared(s, d)
    pqXu(s, d).filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("sub"), col("wd"), col("xu").as("qu"))
      .join(broadcast(cents), Seq("sub", "wd"))
      .groupBy(col("q_id"), col("sub"), col("c_id"))
      .agg(sum((col("qu") - col("cu")) * (col("qu") - col("cu"))).as("d2"))
  }

  /** Per-(probe, candidate) ADC distance in integer micro² units: the
    * per-probe LUT (|probes|·8·16 rows, broadcast) joined onto the shared
    * code table — the scan that touches only 8-byte codes, never full
    * vectors. Single source for sim_pq_adc (top-5 directly) and
    * sim_pq_rerank (top-[[RerankShortlist]] shortlist).
    */
  private def adcScores(s: SparkSession, d: String): DataFrame =
    pqCodesShared(s, d).join(broadcast(pqLut(s, d)), Seq("sub", "c_id"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("d2")).as("adc_u"))

  /** Every (vector, coarse-cell) integer-L2² pair against the 16 seed
    * coarse centroids — the IVF-PQ coarse quantizer's scoring pass (16-row
    * broadcast, per-row distance fold, the allowlisted bounded-broadcast
    * IVF shape). Consumers argmin it for corpus cell assignment and top-k
    * it for probe cell selection.
    */
  private def ivfpqCellScores(s: SparkSession, d: String): DataFrame = {
    val vu = pqVu(s, d)
    val seeds = vu.filter(col("vec_id") < 16)
      .select(col("vec_id").as("c16"), col("vu").as("cu"))
    vu.join(broadcast(seeds))
      .select(col("vec_id"), col("c16"),
        graft.expressions.VectorExpressions.l2sq(col("vu"), col("cu")).as("d2"))
  }

  /** Session-shared coarse CELL ASSIGNMENT (vec_id, cell) against the 16
    * fixture seeds — the inverted-list directory itself, 1 narrow row per
    * vector. Before this cache every fixture-cell IVF-PQ query (top-k,
    * recall, probe sweep, grid, the residual family) re-ran the corpus×16
    * scoring pass + argmin per invocation; in production this assignment
    * is computed once at ingest (it IS the partitioning), so the shared
    * stage is the honest steady state. The trained-cell variant keeps its
    * own in-query assignment (training is its measured cost by design).
    */
  private val sharedIvfpqCells = new SessionFrameCache(4, "sharedIvfpqCells")
  def ivfpqCellsShared(s: SparkSession, d: String): DataFrame =
    sharedIvfpqCells.getOrBuild(s, d) {
      val wCell = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("c16"))
      ivfpqCellScores(s, d)
        .withColumn("r", row_number().over(wCell)).filter(col("r") === 1)
        .select(col("vec_id"), col("c16").as("cell"))
    }

  /** Unpersist and drop every shared cell-assignment frame of session `s`. */
  def releaseIvfpqCells(s: SparkSession): Unit = sharedIvfpqCells.release(s)

  /** Cell scores against the TRAINED coarse centroids: one full-vector
    * integer-L2 Lloyd step over the seed assignment (per-dim means rounded
    * back to micro-units — the single rounding, identical to the PQ
    * codebook's). The ≤16-row centroid table reassembles per-dim rows into
    * ordered vectors with one bounded groupBy and broadcasts.
    */
  private def ivfpqTrainedCellScores(s: SparkSession, d: String): DataFrame = {
    val wCell = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("c16"))
    val asn = ivfpqCellScores(s, d)
      .withColumn("r", row_number().over(wCell)).filter(col("r") === 1)
      .select(col("vec_id"), col("c16"))
    val cents = asn.join(pqXu(s, d), Seq("vec_id"))
      .groupBy(col("c16"), col("sub"), col("wd"))
      .agg(round(sum(col("xu")).cast("double") / count(lit(1))).cast("long").as("cu"))
      .groupBy(col("c16"))
      .agg(transform(
        array_sort(collect_list(struct((col("sub") * 8 + col("wd")).as("dim"), col("cu")))),
        x => x.getField("cu")).as("cu"))
    pqVu(s, d).join(broadcast(cents))
      .select(col("vec_id"), col("c16"),
        graft.expressions.VectorExpressions.l2sq(col("vu"), col("cu")).as("d2"))
  }

  /** The IVF-PQ pipeline downstream of cell scoring: corpus cells by
    * argmin, nprobe=2 probe cells, candidate equi-join, ADC over the
    * shared code table restricted to candidates, top-50 shortlist, exact
    * integer-L2 re-rank to top-5. Shared by the fixture-cell and
    * trained-cell variants.
    */
  private def ivfpqFrom(s: SparkSession, d: String, scores: DataFrame,
      cells: DataFrame): DataFrame = {
    val wCell = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("c16"))
    val probeCells = scores.filter(col("vec_id") < 10)
      .withColumn("r", row_number().over(wCell)).filter(col("r") <= 2)
      .select(col("vec_id").as("q_id"), col("c16").as("cell"))
    val cand = cells.join(broadcast(probeCells), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"))
    val adcr = cand
      .join(pqCodesShared(s, d), Seq("vec_id"))
      .join(broadcast(pqLut(s, d)), Seq("q_id", "sub", "c_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("d2")).as("adc_u"))
    ivfpqExactTail(s, d, adcr)
  }

  /** Nprobe=2 probe cells against the FIXTURE coarse quantizer
    * (q_id, cell) — the ≤20-row broadcast every fixture-cell IVF-PQ
    * probe starts from, exposed for the streamed serving variants.
    */
  private[graft] def ivfpqProbeCells(s: SparkSession, d: String): DataFrame = {
    val wCell = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("c16"))
    ivfpqCellScores(s, d).filter(col("vec_id") < 10)
      .withColumn("r", row_number().over(wCell)).filter(col("r") <= 2)
      .select(col("vec_id").as("q_id"), col("c16").as("cell"))
  }

  /** The ~10% salted-md5 forget set of the index-erasure pair — shared
    * verbatim with the DuckDB oracle (the knnBatchSql convention), so
    * both engines agree on exactly which vectors are erased.
    */
  private[graft] def forgetPred: Column =
    conv(substring(md5(concat(lit("fgt"), col("vec_id").cast("string"))), 1, 15),
      16, 10).cast("long") % 50L === 0L

  /** Write the compacted inverted-list layout (cells ⋈ codes,
    * repartition(cell) + partitionBy(cell) — one file per list) into
    * `dir`: the sim_ivfpq_compaction write factored out so the erasure
    * pair and IvfpqForgetSpec start from the identical physical state.
    */
  private[graft] def stageIvfpqLayout(s: SparkSession, d: String, dir: String): Unit =
    ivfpqCellsShared(s, d).join(pqCodesShared(s, d), Seq("vec_id"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)

  /** Partition-pruned purge of the forget set from a staged inverted-list
    * layout. The plan comes from the FORGET SET alone — its cells read
    * off the in-memory cell directory (bounded: ≤16 rows, one per list),
    * zero scans of the physical index — then ONLY those cells' partition
    * dirs are dynamically overwritten with their survivors; every other
    * list's file is never opened. A cell whose every vector was forgotten
    * leaves a stale dir under dynamic overwrite: it is deleted, with the
    * part-file-listing guard (the StreamForgetKeys crash-replay lesson).
    * Returns per-cell forgotten counts for the caller's census.
    */
  private[graft] def purgeForgotten(
      s: SparkSession, d: String, dir: String): Map[Long, Long] = {
    // bounded (≤16 rows: one per inverted list)
    val nf = ivfpqCellsShared(s, d).filter(forgetPred)
      .groupBy(col("cell")).agg(countDistinct(col("vec_id")).as("nf"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    if (nf.nonEmpty) {
      val affected = nf.keySet.toSeq
      val key = "spark.sql.sources.partitionOverwriteMode"
      val prev = s.conf.getOption(key)
      s.conf.set(key, "dynamic")
      try {
        s.read.parquet(dir)
          .filter(col("cell").cast("long").isin(affected: _*))
          .filter(!forgetPred)
          .repartition(col("cell"))
          .write.mode("overwrite").partitionBy("cell").parquet(dir)
      } finally prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
      // fully-forgotten dirs (≤16, part-file-guarded before any read).
      // Readable dirs are censused in ONE job (basePath keeps the cell
      // partition column) instead of one driver-sequential probe job per
      // cell — the ≤16-tiny-job loop was pure scheduling overhead at any
      // scale (guide §5 driver discipline).
      val existing = affected.sorted.filter(cl =>
        java.nio.file.Files.exists(java.nio.file.Paths.get(dir, s"cell=$cl")))
      val (readable, bare) = existing.partition { cl =>
        val listing = java.nio.file.Files.list(
          java.nio.file.Paths.get(dir, s"cell=$cl"))
        try {
          val it = listing.iterator()
          var found = false
          while (it.hasNext && !found)
            found = it.next().getFileName.toString.endsWith(".parquet")
          found
        } finally listing.close()
      }
      bare.foreach(cl => graft.streaming.StagedEvents.deleteRecursively(
        java.nio.file.Paths.get(dir, s"cell=$cl")))
      if (readable.nonEmpty) {
        val surviving = s.read.option("basePath", dir)
          .parquet(readable.map(cl => s"$dir/cell=$cl"): _*)
          .filter(!forgetPred)
          .select(col("cell").cast("long")).distinct()
          .collect().map(_.getLong(0)).toSet
        readable.filterNot(surviving).foreach(cl =>
          graft.streaming.StagedEvents.deleteRecursively(
            java.nio.file.Paths.get(dir, s"cell=$cl")))
      }
    }
    nf
  }

  /** The IVF-PQ pipeline's exact tail downstream of the per-(probe,
    * candidate) ADC totals: top-50 shortlist, exact integer-L2 re-rank,
    * top-5 with 6dp distances. Shared by [[ivfpqFrom]] and the streamed
    * compacted-layout probe (whose ADC stage runs in-stream).
    */
  private[graft] def ivfpqExactTail(
      s: SparkSession, d: String, adcr: DataFrame): DataFrame = {
    val wShort = Window.partitionBy(col("q_id")).orderBy(col("adc_u"), col("vec_id"))
    val shortlist = adcr
      .withColumn("r", row_number().over(wShort)).filter(col("r") <= 50)
      .select(col("q_id"), col("vec_id"))
    val vu = pqVu(s, d)
    val probes = vu.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("vu").as("qu"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
    vu.join(broadcast(shortlist), Seq("vec_id"))
      .join(broadcast(probes), Seq("q_id"))
      .select(col("q_id"), col("vec_id"),
        graft.expressions.VectorExpressions.l2sq(col("qu"), col("vu")).as("d2"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("q_id"), col("vec_id"),
        round(col("d2").cast("double") / 1000000000000.0, 6).as("exact_d2"),
        col("rank"))
  }

  /** RESIDUAL IVF-PQ — the layout FAISS IVFPQ actually ships (Jégou et
    * al. §V.B): PQ encodes the residual x − centroid(cell(x)), not x
    * itself, so the codebook spends its 8 bytes on the WITHIN-cell
    * geometry instead of re-describing the coarse structure the inverted
    * list already captured. Everything stays exact integer micro-units
    * (residuals are differences of integers): residual seeds come from
    * vec_id ∈ [16, 32) (the seed vectors' own residuals are zero — the one
    * residual-space trap), one Lloyd step trains the residual codebook,
    * and the per-probe LUT becomes per-(probe, PROBED CELL) — the query's
    * residual differs per cell, which is residual ADC's defining extra
    * index dimension (|probes| · nprobe · 8 · 16 rows, still broadcast).
    * Returns the candidate ADC frame (q_id, vec_id, adc_u).
    */
  /** Per-dim RESIDUAL coordinates (vec_id, cell, sub, wd, xu = x − c):
    * the map-only pass under the residual codebook and code builds —
    * recomputed per build, never cached (the cappedShingleHashes trade:
    * a per-dim stream is corpus×64 rows; the narrow OUTPUTS are what the
    * session caches hold).
    */
  private def residualXu(s: SparkSession, d: String): DataFrame = {
    val cells = ivfpqCellsShared(s, d)
    val xu = pqXu(s, d)
    val cellCu = xu.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell"), col("sub"), col("wd"), col("xu").as("ccu"))
    xu.join(cells, Seq("vec_id"))
      .join(broadcast(cellCu), Seq("cell", "sub", "wd"))
      .select(col("vec_id"), col("cell"), col("sub"), col("wd"),
        (col("xu") - col("ccu")).as("xu"))
  }

  /** [[residualXu]] in the array shape: (vec_id, cell, sub, xs[8]) with
    * xs = x − centroid(cell), element-wise over the subvector — same
    * integer arithmetic, one broadcast join fewer (the per-cell centroid
    * subvectors join as ONE 128-row dim instead of a per-dim 1024-row
    * one) and an 8× narrower row stream.
    */
  private def residualXuArr(s: SparkSession, d: String): DataFrame = {
    val cells = ivfpqCellsShared(s, d)
    val xu = pqXuArr(s, d)
    val cellCu = xu.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell"), col("sub"), col("xs").as("ccu"))
    xu.join(cells, Seq("vec_id"))
      .join(broadcast(cellCu), Seq("cell", "sub"))
      .select(col("vec_id"), col("cell"), col("sub"),
        zip_with(col("xs"), col("ccu"), (a, b) => a - b).as("xs"))
  }

  /** Session-shared residual PQ codebook (8×16×8 cells trained by one
    * Lloyd step over residual space, seeds = vec_id ∈ [16, 32) residuals)
    * — the train-once artifact, same lifecycle as [[pqCodebookShared]].
    */
  private val sharedResidualCents = new SessionFrameCache(4, "sharedResidualCents")
  def residualCentsShared(s: SparkSession, d: String): DataFrame =
    sharedResidualCents.getOrBuild(s, d) {
      val rxu = residualXuArr(s, d).drop("cell")
      val rseeds = rxu.filter(col("vec_id") >= 16 && col("vec_id") < 32)
        .select((col("vec_id") - 16).as("c_id"), col("sub"), col("xs").as("cu"))
      lloydUpdateCands(rxu, centsArrBySub(rseeds))
    }

  /** Unpersist and drop every shared residual codebook of session `s`. */
  def releaseResidualCents(s: SparkSession): Unit = sharedResidualCents.release(s)

  /** Session-shared residual CODE table (vec_id, cell, sub, c_id) — the
    * encode-once-at-ingest index the residual ADC queries scan; carries
    * the coarse cell so the candidate filter needs no extra join.
    */
  private val sharedResidualCodes = new SessionFrameCache(4, "sharedResidualCodes")
  def residualCodesShared(s: SparkSession, d: String): DataFrame = {
    // parent materialized OUTSIDE this cache's monitor (lock discipline)
    val cents = residualCentsShared(s, d)
    sharedResidualCodes.getOrBuild(s, d) {
      val rxu = residualXuArr(s, d)
      pqAssignArr(rxu.drop("cell"), cents)
        .join(rxu.select(col("vec_id"), col("cell")).distinct(), Seq("vec_id"))
    }
  }

  /** Unpersist and drop every shared residual code table of session `s`. */
  def releaseResidualCodes(s: SparkSession): Unit = sharedResidualCodes.release(s)

  private def ivfpqResidualAdc(s: SparkSession, d: String): DataFrame = {
    val rcodes = residualCodesShared(s, d)
    val rcents = residualCentsShared(s, d)
    val scores = ivfpqCellScores(s, d)
    val wCell = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("c16"))
    val probeCells = scores.filter(col("vec_id") < 10)
      .withColumn("r", row_number().over(wCell)).filter(col("r") <= 2)
      .select(col("vec_id").as("q_id"), col("c16").as("cell"))
    val xu = pqXu(s, d)
    val cellCu = xu.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell"), col("sub"), col("wd"), col("xu").as("ccu"))
    val qres = xu.filter(col("vec_id") < 10)
      .withColumnRenamed("vec_id", "q_id")
      .join(broadcast(probeCells), Seq("q_id"))
      .join(broadcast(cellCu), Seq("cell", "sub", "wd"))
      .select(col("q_id"), col("cell"), col("sub"), col("wd"),
        (col("xu") - col("ccu")).as("qu"))
    val rlut = qres.join(broadcast(rcents), Seq("sub", "wd"))
      .groupBy(col("q_id"), col("cell"), col("sub"), col("c_id"))
      .agg(sum((col("qu") - col("cu")) * (col("qu") - col("cu"))).as("d2"))
    rcodes.join(broadcast(probeCells), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .join(broadcast(rlut), Seq("q_id", "cell", "sub", "c_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("d2")).as("adc_u"))
  }

  /** (vec_id, vu: array<long>) — full vectors in integer micro-units, the
    * exact-arithmetic row-store the brute-force baseline and the re-rank
    * gather both read.
    */
  private def pqVu(s: SparkSession, d: String): DataFrame =
    fanOut(embeddings(s, d), s).select(col("vec_id"),
      transform(asDouble(col("embedding")),
        x => round(x * 1000000).cast("long")).as("vu"))

  /** The k-center oracle's shared CTE chain: micro-unit dims, the seed,
    * and the 7 unrolled (argmax, distance, fold-min) steps — one string
    * so the selection and the census oracles can never drift.
    */
  private lazy val kcenterOracleCtes: String = {
    def dist(cte: String, centerCte: String) =
      s"""$cte AS MATERIALIZED (
        SELECT a.vec_id, CAST(sum((a.xu - b.xu) * (a.xu - b.xu)) AS BIGINT) AS d2
        FROM vud a JOIN $centerCte s ON true
             JOIN vud b ON b.vec_id = s.cid AND b.dim = a.dim
        GROUP BY 1)"""
    val steps = (1 to 7).map { k =>
      s""",
      c$k AS MATERIALIZED (SELECT vec_id AS cid, dmin FROM m$k
        QUALIFY row_number() OVER (ORDER BY dmin DESC, vec_id) = 1),
      ${dist(s"d$k", s"c$k")},
      m${k + 1} AS MATERIALIZED (
        SELECT m.vec_id, CASE WHEN d.d2 < m.dmin THEN d.d2 ELSE m.dmin END AS dmin
        FROM m$k m JOIN d$k d ON d.vec_id = m.vec_id)"""
    }.mkString
    s"""c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      vud AS MATERIALIZED (SELECT vec_id, i - 1 AS dim,
                   CAST(round(v[i] * 1000000) AS BIGINT) AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      c0 AS (SELECT min(vec_id) AS cid FROM c),
      ${dist("m1x", "c0")},
      m1 AS MATERIALIZED (SELECT vec_id, d2 AS dmin FROM m1x)$steps"""
  }

  /** Integer-micro-unit vectors for the k-center family (pqVu's shape,
    * bound separately so the sampling operator doesn't entangle with the
    * PQ session caches).
    */
  private def kcenterVu(s: SparkSession, d: String): DataFrame =
    fanOut(embeddings(s, d), s).select(col("vec_id"),
      transform(asDouble(col("embedding")),
        x => round(x * 1000000).cast("long")).as("vu"))

  /** The greedy farthest-point selection log — (step, center_id, sel_d2u)
    * with the step-0 seed (no radius) and the step-8 residual row (no
    * center). Driver-side content-stamped memo (the covarianceMatrix
    * discipline): the loop's 8 bounded one-row collects run once per
    * (dir, content) and both sample_kcenter and the census read the same
    * selection.
    */
  private val kcenterMemo =
    new java.util.concurrent.ConcurrentHashMap[String,
      Seq[(Int, java.lang.Long, java.lang.Long)]]()

  private def kcenterRows(
      s: SparkSession, d: String): Seq[(Int, java.lang.Long, java.lang.Long)] =
    kcenterMemo.computeIfAbsent(d + "|" + ContentStamp.of(d), _ => {
      val vu = kcenterVu(s, d)
      val l2 = graft.expressions.VectorExpressions.l2sq _
      // bounded collect: exactly one row per greedy step (k = 8)
      val seed = vu.agg(min(col("vec_id"))).collect()(0).getLong(0)
      def distTo(cid: Long): DataFrame =
        vu.crossJoin(broadcast(
            vu.filter(col("vec_id") === cid).select(col("vu").as("cu"))))
          .select(col("vec_id"), l2(col("vu"), col("cu")).as("dmin"))
      val rows = scala.collection.mutable.ArrayBuffer[
        (Int, java.lang.Long, java.lang.Long)]((0, seed, null))
      var minD = distTo(seed)
      for (step <- 1 to 7) {
        val top = minD.orderBy(col("dmin").desc, col("vec_id")).limit(1)
          .collect()(0)
        val cid = top.getLong(0)
        rows += ((step, cid, top.getLong(1)))
        minD = SessionCaches.loopCheckpoint(
          minD.join(distTo(cid).withColumnRenamed("dmin", "d2"), Seq("vec_id"))
            .select(col("vec_id"), least(col("dmin"), col("d2")).as("dmin")))
      }
      val residual = minD.agg(max(col("dmin"))).collect()(0).getLong(0)
      rows += ((8, null, residual))
      rows.toSeq
    })

  /** Exact integer-L2² top-5 per probe — the declared brute-force baseline
    * both PQ recall audits compare against.
    */
  private def pqExactTop5(s: SparkSession, d: String): DataFrame =
    pqExactTop5Ranked(s, d).select(col("q_id"), col("vec_id"))

  /** [[pqExactTop5]] keeping the exact rank (`erank` 1..5) — the graded
    * relevance the ranking-metrics audit needs (gain 6 − erank).
    */
  private def pqExactTop5Ranked(s: SparkSession, d: String): DataFrame = {
    val vu = pqVu(s, d)
    val probes = vu.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("vu").as("qu"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
    vu.join(broadcast(probes), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        graft.expressions.VectorExpressions.l2sq(col("qu"), col("vu")).as("d2"))
      .withColumn("erank", row_number().over(w)).filter(col("erank") <= 5)
      .select(col("q_id"), col("vec_id"), col("erank"))
  }

  /** Top-5 per probe by integer L2² over SQ8 codes — emb_quantize_int8's
    * exact per-dim symmetric rule, the scales a driver-side d-bounded
    * collect re-entered as an array literal so quantization is one
    * zero-shuffle projection pass. Shared by the SQ8 recall audit and the
    * quantization ladder.
    */
  private def sq8Top5(s: SparkSession, d: String): DataFrame = {
    val vu = pqVu(s, d)
    // bounded (64 rows = embedding dimensionality, never N): per-dim max|xu|
    val m = vu.select(posexplode(col("vu")).as(Seq("dim", "xu")))
      .groupBy(col("dim")).agg(max(abs(col("xu"))).as("m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1).map(_._2)
    val mLit = m.mkString("array(", "L, ", "L)")
    val q8 = vu.selectExpr("vec_id",
      s"""zip_with(vu, $mLit, (x, m) -> CASE WHEN m = 0L THEN 0L
         ELSE CAST(signum(x) AS BIGINT) * ((abs(x) * 254 + m) div (2 * m))
         END) AS q8""")
    val probes = q8.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("q8").as("qq"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
    q8.join(broadcast(probes), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        graft.expressions.VectorExpressions.l2sq(col("qq"), col("q8")).as("d2"))
      .withColumn("r", row_number().over(w)).filter(col("r") <= 5)
      .select(col("q_id"), col("vec_id"))
  }

  /** Top-5 per probe from the binary rung: sign codes packed as two
    * 32-dim BIGINT words, Hamming top-50 shortlist, exact integer-L2²
    * re-rank. The per-row pack is one bounded 64-element fold (d-bounded,
    * zero shuffle); the pair work is 2 XORs + 2 popcounts. Shared by the
    * binary recall audit and the quantization ladder.
    */
  private def binaryTop5(s: SparkSession, d: String): DataFrame = {
    val vu = pqVu(s, d)
    val words = vu.selectExpr("vec_id", "vu",
      "aggregate(transform(vu, (x, i) -> IF(x > 0L AND i < 32, shiftleft(1L, i), 0L)), 0L, (a, w) -> a | w) AS lo",
      "aggregate(transform(vu, (x, i) -> IF(x > 0L AND i >= 32, shiftleft(1L, i - 32), 0L)), 0L, (a, w) -> a | w) AS hi")
    val probes = words.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("vu").as("qu"),
        col("lo").as("qlo"), col("hi").as("qhi"))
    val wH = Window.partitionBy(col("q_id")).orderBy(col("h"), col("vec_id"))
    val wD = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
    words.join(broadcast(probes), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("vu"), col("qu"),
        (bit_count(col("lo").bitwiseXOR(col("qlo"))) +
          bit_count(col("hi").bitwiseXOR(col("qhi")))).as("h"))
      .withColumn("r", row_number().over(wH)).filter(col("r") <= 50)
      .select(col("q_id"), col("vec_id"),
        graft.expressions.VectorExpressions.l2sq(col("qu"), col("vu")).as("d2"))
      .withColumn("r", row_number().over(wD)).filter(col("r") <= 5)
      .select(col("q_id"), col("vec_id"))
  }

  /** 16×dim random-hyperplane matrix with ±1 components derived from
    * md5("p_i") — the same portable-hash rule the MinHash pipeline uses, so
    * the DuckDB oracle rebuilds the IDENTICAL matrix in SQL
    * (`('0x'||substr(md5(p||'_'||i),1,15))::BIGINT % 2`). Computed once on
    * the driver (a 16×64 constant — at cluster scale this is the literal the
    * plan broadcasts for free), never per row.
    */
  private def planeMatrix(dim: Int): Array[Array[Long]] =
    Array.tabulate(16) { p =>
      Array.tabulate(dim) { i =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"${p}_$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        if (java.lang.Long.parseLong(hex.take(15), 16) % 2 == 0) 1L else -1L
      }
    }

  /** (vec_id, bucket) — the 16-bit random-hyperplane signature of every
    * vector as a bit string. Sign sums run in integer micro-units
    * (`round(x·1e6)·(±1)` summed as BIGINT) so the bit is
    * addition-order-independent and both engines agree even when a
    * projection lands near zero. One codegen'd pass per row, zero shuffle;
    * the bucket key (16 bits), not the vector, is all that downstream joins
    * ever ship.
    */
  private def lshBuckets(s: SparkSession, d: String): DataFrame = {
    // dim probe: one-row action; the table contract is fixed-width vectors
    val dim = embeddings(s, d).select(size(col("embedding")).as("n")).head().getInt(0)
    val planes = planeMatrix(dim)
    // micro-unit rounding happens ONCE per row (the builtin keeps Spark's
    // HALF_UP semantics the oracle replays); the 16 sign projections are
    // then codegen'd integer dots against the ±1 plane literals instead of
    // 16 interpreted round-and-multiply HOF folds
    val vu = transform(asDouble(col("embedding")),
      x => round(x * 1000000).cast("long"))
    val bits = (0 until 16).map { p =>
      when(graft.expressions.VectorExpressions
        .dotLong(col("vu"), typedLit(planes(p))) > 0, lit("1")).otherwise(lit("0"))
    }
    fanOut(embeddings(s, d), s)
      .select(col("vec_id"), vu.as("vu"))
      .select(col("vec_id"), concat(bits: _*).as("bucket"))
  }

  /** Shared DuckDB CTEs rebuilding the hyperplane signature: `sig` holds
    * (vec_id, p, bit), `buckets` the 16-char bit string — the ONE canonical
    * SQL both LSH oracles compose, so the plane/hash rule can never drift
    * between them.
    */
  private val lshSigSql: String = """
      c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      ex AS (SELECT vec_id, i, CAST(round(v[i] * 1000000) AS BIGINT) AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      w AS (SELECT p, i,
                   CASE WHEN ('0x' || substr(md5(p::VARCHAR || '_' || (i - 1)::VARCHAR), 1, 15))::BIGINT % 2 = 0
                        THEN 1 ELSE -1 END AS w
            FROM (SELECT unnest(range(0, 16)) AS p), (SELECT DISTINCT i FROM ex)),
      sig AS (SELECT e.vec_id, w.p, CASE WHEN sum(e.xu * w.w) > 0 THEN 1 ELSE 0 END AS bit
              FROM ex e JOIN w ON e.i = w.i GROUP BY 1, 2),
      buckets AS (SELECT vec_id, string_agg(bit::VARCHAR, '' ORDER BY p) AS bucket
                  FROM sig GROUP BY vec_id)"""

  val queries: Map[String, Q] = Map(
    // A1/A2/A3 over real vectors: per-row array max / sum / length.
    "arr_stats" -> ((s, d) => {
      val v = asDouble(col("embedding"))
      embeddings(s, d).select(
        col("vec_id"),
        round(array_max(v), 6).as("vmax"),
        round(VectorExpressions.sum(v), 6).as("vsum"),
        size(col("embedding")).as("dim"))
    }),

    // L2 norm per vector (the normalize step of any ANN pipeline).
    "arr_l2_norm" -> ((s, d) => {
      val v = asDouble(col("embedding"))
      embeddings(s, d).select(
        col("vec_id"),
        round(sqrt(dot(v, v)), 6).as("l2_norm"))
    }),

    // Brute-force cosine top-5 for 10 probe vectors. Probe side broadcast;
    // rank on the rounded similarity with vec_id tiebreak so ordering is
    // reproducible across engines.
    "sim_cosine_topk" -> ((s, d) => {
      val base = fanOut(embeddings(s, d), s).select(col("vec_id"), asDouble(col("embedding")).as("v"))
      val probes = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))
      val cos = round(
        dot(col("qv"), col("v")) /
          (sqrt(dot(col("qv"), col("qv"))) * sqrt(dot(col("v"), col("v")))), 6)
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      base.join(broadcast(probes), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), cos.as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
    }),

    // Maximum-inner-product top-k (MIPS) — the retrieval metric of
    // dot-product-trained recommender/two-tower models, where a vector's
    // NORM is part of its relevance and cosine's normalization would
    // erase it. The test corpus is unit-norm (MIPS would collapse to
    // cosine, proving nothing), so each vector first gets a deterministic
    // id-derived popularity weight folded into its norm — the synthetic-
    // input device text_pii_redact uses, making every ranking exercise the
    // norm term for real; dot(w_a·a, w_b·b) factors to w_a·w_b·dot(a,b),
    // so the weighting costs one scalar multiply, not a vector rewrite.
    // Same broadcast-probes brute-force baseline shape as sim_cosine_topk;
    // the scale path is norm-augmented IVF (MIPS reduces to cosine after
    // the (x, √(M²−|x|²)) augmentation), which reuses the ivfProbe
    // machinery unchanged.
    "sim_mips_topk" -> ((s, d) => {
      val pop = (lit(1.0) + col("vec_id") % 5) / 3.0
      val base = fanOut(embeddings(s, d), s)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"), pop.as("sv"))
      val probes = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("sv").as("sq"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("ip").desc, col("vec_id"))
      base.join(broadcast(probes), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          round(dot(col("qv"), col("v")) * col("sq") * col("sv"), 6).as("ip"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
    }),

    // k-NN majority-label voting: classify each probe by the mode label of
    // its top-5 cosine neighbors — similarity search applied to weak
    // labeling, the standard ANN-assisted annotation pass over a training
    // corpus. Composes the oracled top-k with the labels table; the argmax
    // is min(struct(-n, label)) — a hash aggregate with a deterministic
    // min-label tie-break, no window, no global sort.
    "sim_knn_label" -> ((s, d) => {
      val topk = queries("sim_cosine_topk")(s, d)
      val lbl = embeddings(s, d).select(col("vec_id"), col("label"))
      topk.join(lbl, "vec_id")
        .groupBy(col("q_id"), col("label")).agg(count(lit(1)).as("n"))
        .groupBy(col("q_id"))
        .agg(min(struct((-col("n")).as("nn"), col("label").as("lbl"))).as("w"))
        .select(col("q_id"), col("w.lbl").as("knn_label"), (-col("w.nn")).as("n_votes"))
    }),

    // Embedding-cosine near-duplicate pairs (brute force with precomputed
    // norms; threshold tuned to this dataset's similarity range). The scale
    // path bucketizes with sim_lsh_buckets first, shrinking the pair space
    // from N² to Σ bucket².
    "dedup_embed_cosine" -> ((s, d) => {
      val base = fanOut(embeddings(s, d), s)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      val a = base.select(col("vec_id").as("da"), col("v").as("va"), col("nrm").as("na"))
      val b = base.select(col("vec_id").as("db"), col("v").as("vb"), col("nrm").as("nb"))
      a.join(b, col("da") < col("db"))
        .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
        .filter(col("cos") > 0.4)
        .select(col("da"), col("db"), round(col("cos"), 6).as("cos"))
    }),

    // Opaque binary media column + typed metadata (the multimodal transport
    // contract, graft.ops.Multimodal): payload length + content hash are
    // oracle-checked; the stubbed decode dimensions are spec-tested.
    "mm_binary_meta" -> ((s, d) => {
      val withMeta = graft.ops.Multimodal.withMediaMeta(
        fanOut(documents(s, d), s).select(col("doc_id"), col("text").cast("binary").as("media")),
        "media")
      withMeta.select(
        col("doc_id"),
        col("meta.n_bytes").as("n_bytes"),
        col("meta.sha256").as("sha256"))
    }),

    // IVF-style ANN: a 16-centroid coarse quantizer (deterministic sample —
    // production would k-means; a fixed sample keeps the oracle exact), every
    // vector assigned to its nearest centroid by cosine, probes search only
    // their nprobe=2 closest clusters. The scale shape: the inverted lists
    // partition the corpus, so each probe scans ~2/16 of it instead of all N;
    // centroids are a broadcast table, assignment is one codegen'd pass.
    //
    // HONESTY NOTE on the codebook: `vec_id < 16` is an ARBITRARY FIXED
    // quantizer, not a trained one — a fixture that keeps the DuckDB oracle
    // bit-exact (both engines pick the same 16 vectors by id). The IVF plan
    // shape, inverted-list partitioning, and the recall audit
    // (sim_ivf_recall) are exactly what a production build uses; the one
    // thing production changes is feeding the codebook from k-means
    // (iterate `sim_kmeans_update` to convergence) instead of `vec_id < 16`.
    // Do not read these centroids as a recall-tuned codebook.
    "sim_ivf_topk" -> ((s, d) => {
      val base = ivfBase(s, d)
      // fixed vec_id<16 codebook: an oracle-determinism fixture, not a
      // trained quantizer — sim_ivf_trained runs the same shape over the
      // Lloyd-trained centroids
      val cents = base.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      ivfProbe(base, cents)
    }),

    // IVF over a TRAINED codebook: the quantizer is the centroid set one
    // Lloyd iteration (sim_kmeans_update) produces, not the fixed-fixture
    // ids — the production training loop's read side. The k×d centroid
    // table reassembles into ordered vectors with one tiny groupBy
    // (centroid-count-bounded, broadcast); everything downstream is the
    // identical bucketed IVF shape, and the oracle recomputes the same
    // codebook from the same oracled Lloyd SQL, so the end-to-end
    // train→index→probe path is hash-matched.
    "sim_ivf_trained" -> ((s, d) => {
      val km = queries("sim_kmeans_update")(s, d)
      val cents = km.groupBy(col("c_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("mean_x")))),
          x => x.getField("mean_x")).as("cv"))
        .withColumn("cn", sqrt(dot(col("cv"), col("cv"))))
      ivfProbe(ivfBase(s, d), cents)
    }),

    // GREEDY K-CENTER coreset selection (Gonzalez 1985, the 2-approximation
    // farthest-point heuristic) — the diverse-subset primitive a curation
    // pipeline runs to pick maximally-spread exemplars (seed sets for
    // semantic dedup, diverse instruction selection, eval-probe picking).
    // Start from the corpus's smallest vec_id, then 7 times: the next
    // center is the vector FARTHEST from the selected set (max over nodes
    // of min over centers), and that selection distance IS the coverage
    // radius the set guaranteed before admitting it — so the per-step
    // sel_d2u column is the k-vs-radius curve a budget decision reads
    // (monotone nonincreasing by construction, spec-pinned). The closing
    // row (step 8, NULL center) is the residual radius an unpicked 9th
    // center would have covered. All distances are exact integer-micro-
    // unit L2² through the codegen'd l2sq kernel, so every argmax is an
    // integer comparison with the vec_id tiebreak — no float boundary
    // anywhere. Scale shape: each step is ONE linear corpus pass (min-dist
    // frame joined to the single new center, 1-row broadcast) + one
    // TakeOrdered(1); the min-dist frame is loop-checkpointed per step
    // (the bfsFrom discipline), and the 8 one-row collects are the
    // bounded-by-k driver reads the greedy algorithm inherently needs.
    // Oracle: the 8 steps unrolled as generated MATERIALIZED CTEs.
    "sample_kcenter" -> ((s, d) => {
      import s.implicits._
      kcenterRows(s, d).toDF("step", "center_id", "sel_d2u")
    }),

    // The ASSIGNMENT CENSUS under the final 8 k-center exemplars — the
    // table that turns the selection curve into a usable coverage map:
    // every vector assigned to its nearest center (exact integer-L2²,
    // ties to the smaller center id), then per center the population,
    // the covering radius (max assigned distance), and the exact total
    // distance — what a curation sampler reads to budget per-region
    // quotas, and what flags a region one exemplar can't represent
    // (large n × large radius). The greedy selection is a driver-side
    // content-stamped memo shared with sample_kcenter (the
    // covarianceMatrix discipline), so the census costs ONE extra
    // linear pass: corpus × the 8-row broadcast center table.
    "sample_kcenter_census" -> ((s, d) => {
      val centers = kcenterRows(s, d).collect {
        case (_, cid, _) if cid != null => cid.longValue()
      }
      val vu = kcenterVu(s, d)
      val cents = broadcast(vu.filter(col("vec_id").isin(centers: _*))
        .select(col("vec_id").as("center_id"), col("vu").as("cu")))
      val l2 = graft.expressions.VectorExpressions.l2sq _
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("d2"), col("center_id"))
      vu.crossJoin(cents)
        .select(col("vec_id"), col("center_id"), l2(col("vu"), col("cu")).as("d2"))
        .withColumn("r", row_number().over(w)).filter(col("r") === 1)
        .groupBy(col("center_id"))
        .agg(count(lit(1)).as("n_assigned"), max(col("d2")).as("radius_d2u"),
          // exact BIGINT total (a mean at 1e12 magnitude has no stable
          // 6-decimal rounding in doubles — ulp is ~2e-4 there); the
          // reader divides
          sum(col("d2")).as("sum_d2u"))
    }),

    // COARSE-QUANTIZER BALANCE audit for the k-center exemplars — the
    // cross-family composition question a pipeline owner actually asks:
    // "I already selected 8 maximally-spread exemplars; can they double
    // as my IVF coarse centroids?" The answer is measured, and it is the
    // honest NO: k-center optimizes coverage RADIUS (every point near
    // some center) while an inverted-list quantizer needs load BALANCE
    // (lists of equal size — the widest list bounds probe latency), and
    // farthest-point exemplars sit at the corpus's boundary where they
    // capture thin lists while interior mass piles onto a few. The table
    // reads widest/narrowest list under (a) the family's standardized
    // fixture seeds (vec_id < 8 — sim_kmeans_update's seeds) and (b) the
    // 8 greedy exemplars, same integer-L2 assignment both. Measured at
    // sf0.01: kcenter 75/50 vs fixture 70/48 — on this near-uniform
    // corpus the penalty is mild but consistently the WRONG direction,
    // and on clustered production data the boundary-exemplar effect
    // compounds; the don't-reuse-your-coreset-as-an-index lesson, next
    // to sim_ivfpq_trained's "training buys balance" row. One linear
    // pass per scheme over the 8-row broadcast center table.
    "sim_ivf_kcenter_balance" -> ((s, d) => {
      val vu = kcenterVu(s, d)
      val l2 = graft.expressions.VectorExpressions.l2sq _
      def balance(cents: DataFrame, scheme: String): DataFrame = {
        val w = Window.partitionBy(col("vec_id"))
          .orderBy(col("d2"), col("center_id"))
        vu.crossJoin(broadcast(cents))
          .select(col("vec_id"), col("center_id"), l2(col("vu"), col("cu")).as("d2"))
          .withColumn("r", row_number().over(w)).filter(col("r") === 1)
          .groupBy(col("center_id")).agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_lists"), max(col("n")).as("widest"),
            min(col("n")).as("narrowest"))
          .select(lit(scheme).as("scheme"), col("n_lists"),
            col("widest"), col("narrowest"))
      }
      val kc = kcenterRows(s, d).collect {
        case (_, cid, _) if cid != null => cid.longValue()
      }
      val kcCents = vu.filter(col("vec_id").isin(kc: _*))
        .select(col("vec_id").as("center_id"), col("vu").as("cu"))
      val fxCents = vu.filter(col("vec_id") < 8)
        .select(col("vec_id").as("center_id"), col("vu").as("cu"))
      balance(fxCents, "fixture_seeds").unionByName(balance(kcCents, "kcenter"))
    }),

    // One Lloyd iteration of k-means (k=8, cosine assignment): assign every
    // vector to its nearest seed centroid, then recompute the centroids as
    // per-dimension means — posexplode shards the mean over (cluster, dim)
    // so no task ever holds a whole centroid, and the sums run in integer
    // micro-units so the result is addition-order-independent (the property
    // that lets the oracle match a shuffled cluster). This is the iterative
    // step a full clustering loop (or the IVF quantizer training) repeats.
    "sim_kmeans_update" -> ((s, d) => {
      val base = fanOut(embeddings(s, d), s)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      val cents = base.filter(col("vec_id") < 8)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      val csim = round(dot(col("v"), col("cv")) / (col("nrm") * col("cn")), 6)
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("csim").desc, col("c_id"))
      val assigned = base.join(broadcast(cents))
        .withColumn("csim", csim)
        .withColumn("crank", row_number().over(wAssign))
        .filter(col("crank") === 1)
        .select(col("vec_id"), col("v"), col("c_id"))
      assigned
        .select(col("c_id"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("c_id"), col("dim"))
        .agg(
          count(lit(1)).as("n_members"),
          round(sum(round(col("x") * 1000000).cast("long")) / count(lit(1)) / 1e6, 6)
            .as("mean_x"))
    }),

    // Per-dimension corpus statistics (count / mean / std / min / max) — the
    // profiling pass every embedding pipeline runs before normalization or
    // quantization. Shape: posexplode to (dim, x) narrow rows, ONE partial-
    // aggregated groupBy(dim) — the shuffle carries 6 numbers per (partition,
    // dim), never a vector. Sums run exactly: means in integer micro-units
    // (BIGINT), second moments in DECIMAL(38,0) (micro² units overflow a
    // 64-bit long around 10⁷ rows — decimal partials stay exact AND mergeable
    // at any N, and both engines cast the identical integer to double at the
    // end, so the rounded std matches bit-for-bit).
    "emb_dim_stats" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val ex = fanOut(embeddings(s, d), s)
        .select(posexplode(asDouble(col("embedding"))).as(Seq("dim", "x")))
        .select(col("dim"), col("x"),
          round(col("x") * 1000000).cast("long").as("xu"))
      val dec = DecimalType(38, 0)
      ex.groupBy(col("dim"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("xu")).as("su"),
          sum(col("xu").cast(dec) * col("xu")).as("sq"),
          round(min(col("x")), 6).as("min_x"),
          round(max(col("x")), 6).as("max_x"))
        .select(
          col("dim"), col("n"),
          round(col("su").cast("double") / 1000000.0 / col("n"), 6).as("mean_x"),
          round(sqrt(
            col("sq").cast("double") / 1000000000000.0 / col("n") -
              pow(col("su").cast("double") / 1000000.0 / col("n"), 2)), 6).as("std_x"),
          col("min_x"), col("max_x"))
    }),

    // EMBEDDING DRIFT between two ingest slices — the expectations-trend
    // idea (diag_expectations_trend) applied to the vector column: when an
    // upstream encoder, preprocessing step, or source mix changes, the
    // per-dimension means move, and a training pipeline wants the alarm at
    // ingest, not after a week of skewed retrieval. Slices are the parity
    // split (vec_id % 2); slice B carries a PLANTED +0.25 shift on dims
    // 0–3 (applied in exact micro-units inside the query) so the verdict
    // path demonstrably fires while dims ≥ 4 pin the no-drift path.
    // All verdict arithmetic is INTEGER: with per-slice micro-unit sums
    // (sua, na) and (sub, nb), |mean_b − mean_a| > 0.1 ⟺
    // |sub·na − sua·nb| > 100000·na·nb — cross-multiplied so no division,
    // no rounding, no float summation order anywhere in the verdict
    // (products stay far inside long at bench scale; a 100 TB build
    // widens the same algebra to DECIMAL(38)). The human-readable means
    // use emb_dim_stats' proven round(su/1e6/n, 6) form. Scale shape: one
    // scan, one groupBy(dim) with conditional partial sums — the per-dim
    // frame is bounded by the dimensionality, never the corpus.
    "emb_drift" -> ((s, d) => {
      val ex = fanOut(embeddings(s, d), s)
        .select(col("vec_id"), posexplode(asDouble(col("embedding"))).as(Seq("dim", "x")))
        .select(col("vec_id"), col("dim"),
          round(col("x") * 1000000).cast("long").as("xu"))
        .withColumn("grp", (col("vec_id") % 2).cast("int"))
        .withColumn("xu", when(col("grp") === 1 && col("dim") < 4,
          col("xu") + 250000L).otherwise(col("xu")))
      val agg = ex.groupBy(col("dim")).agg(
        sum(when(col("grp") === 0, col("xu")).otherwise(0L)).as("sua"),
        sum(when(col("grp") === 0, 1L).otherwise(0L)).as("na"),
        sum(when(col("grp") === 1, col("xu")).otherwise(0L)).as("sub"),
        sum(when(col("grp") === 1, 1L).otherwise(0L)).as("nb"))
      val per = agg.select(col("dim"), col("na"), col("nb"),
        round(col("sua").cast("double") / 1000000.0 / col("na"), 6).as("mean_a"),
        round(col("sub").cast("double") / 1000000.0 / col("nb"), 6).as("mean_b"),
        (abs(col("sub") * col("na") - col("sua") * col("nb")) >
          lit(100000L) * col("na") * col("nb")).as("drifted"))
      val total = per.agg(
        sum(when(col("drifted"), 1L).otherwise(0L)).as("n_drifted_dims"))
      per.crossJoin(broadcast(total))
    }),

    // Symmetric int8 quantization (the embedding-compression pass that cuts
    // ANN index storage 4×): per-dimension scale = 127/max|x|, q = round-half-
    // away-from-zero(x·127/scale) — computed ENTIRELY in integer arithmetic
    // ((|xu|·254 + m) div (2m), xu = micro-units, m = per-dim max|xu|), so
    // there is no float rounding boundary for engines to disagree on. The
    // per-dim scales are a |dim|-row aggregate broadcast back to the fact
    // side — the big table never shuffles. Output exploded as (vec_id, dim,
    // q8): the same rows a quantized index would store.
    "emb_quantize_int8" -> ((s, d) => {
      val ex = fanOut(embeddings(s, d), s)
        .select(col("vec_id"), posexplode(asDouble(col("embedding"))).as(Seq("dim", "x")))
        .select(col("vec_id"), col("dim"),
          round(col("x") * 1000000).cast("long").as("xu"))
      val scales = ex.groupBy(col("dim")).agg(max(abs(col("xu"))).as("m"))
      ex.join(broadcast(scales), "dim")
        .select(col("vec_id"), col("dim"),
          when(col("m") === 0, lit(0))
            .otherwise((signum(col("xu")).cast("long") *
              expr("(abs(xu) * 254 + m) div (2 * m)")).cast("int"))
            .as("q8"))
    }),

    // Upper-triangle covariance matrix of the embedding dimensions — the
    // second-order statistic behind PCA / whitening / decorrelation of an
    // embedding corpus. NO self-join: each row expands to its d(d+1)/2
    // dimension pairs with one higher-order transform (the products are
    // per-row local), then ONE partial-aggregated groupBy(i,j) — the shuffle
    // carries (i,j,Σp) partials, 2080 cells for d=64, regardless of N.
    // Products of micro-unit integers sum exactly in DECIMAL(38,0); the
    // d-row mean table broadcasts back twice for the E[x]E[y] term. At
    // 100 TB this is the textbook outer-product aggregation — linear scan,
    // constant-size output.
    "emb_covariance" -> ((s, d) => covMoments(s, d).select(col("i"), col("j"), covCol)),

    // PCA projection to the top-k principal components — the embedding-
    // compression / whitening step a training pipeline runs before
    // clustering or visualizing a corpus. The distributed work is ONE
    // constant-size-output corpus scan (covMoments: covariance cells AND
    // per-dim means in the same pass) plus one zero-shuffle projection
    // pass; the eigendecomposition itself is a d×d driver problem
    // (graft.functions.Eigen, deterministic cyclic Jacobi), bounded by
    // model geometry, not N. pc_j = dot(x, v_j) - dot(mean, v_j), with
    // the second term folded into a driver-side scalar so centering never
    // touches the corpus. No eigensolver exists in SQL, so the DuckDB
    // oracle is GENERATED at Verify time ([[pcaOracleSql]]): the same
    // deterministic eigenbasis is embedded as SQL literals and DuckDB
    // re-projects the corpus — a full hash-match, not rows-only. The
    // algebraic contract — orthonormal basis, descending eigenvalues,
    // trace preservation, Var(pc1) = λ1 — stays spec-pinned on top.
    "emb_pca_topk" -> ((s, d) => {
      val (cov, mean) = covarianceMatrix(s, d)
      val (_, vecs) = graft.functions.Eigen.symmetric(cov)
      embeddings(s, d)
        .select(col("vec_id") +: basisProjCols(vecs.take(4).toSeq, mean, "pc"): _*)
    }),

    // PCA WHITENING — the decorrelate-and-normalize transform (basis
    // scaled 1/√λ) a pipeline applies before isotropic-distance methods
    // (k-means, cosine ANN) so no dominant direction swamps the metric:
    // projected coordinates have unit variance and zero cross-covariance
    // (spec-pinned). Identical execution shape to emb_pca_topk — one
    // constant-output moments pass, a d×d driver eigensolve, a zero-
    // shuffle projection — via the same [[basisProjCols]]; the oracle
    // ([[whiteningOracleSql]]) embeds the same scaled basis as literals,
    // full hash-match.
    "emb_whitening" -> ((s, d) => {
      val (basis, mean) = whitenedBasis(s, d, 4)
      embeddings(s, d)
        .select(col("vec_id") +: basisProjCols(basis, mean, "w"): _*)
    }),

    // ANN quality gate: per-probe recall@5 of the IVF index against the
    // exact brute-force top-5 — the accuracy audit every production ANN
    // deployment runs before swapping the exact path out. Both inputs are
    // oracled queries; the join is a tiny (50-row) equi join, and the oracle
    // recomputes the identical composition, so the recall is hash-matched
    // exactly, not just contract-checked.
    "sim_ivf_recall" -> ((s, d) => {
      val exact = queries("sim_cosine_topk")(s, d)
        .select(col("q_id"), col("vec_id"))
      val approx = queries("sim_ivf_topk")(s, d)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      exact.join(approx, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
        .select(col("q_id"), col("n_hits"),
          round(col("n_hits") / 5.0, 6).as("recall"))
    }),

    // FILTERED ANN — predicate + vector search in ONE query, the serving
    // pattern every production vector store hits ("top-k similar WHERE
    // label = X"). Post-filtering an unfiltered top-k starves recall (the
    // k survivors may all fail the predicate, and re-probing deeper costs
    // another round trip); the right shape applies the predicate to the
    // CANDIDATE LISTS inside the probed cells, BEFORE the top-k — same
    // cell-scan cost, no starvation. Each probe targets its OWN label
    // (same-class retrieval); the output is the filtered-IVF top-5's
    // recall against the filtered exact top-5, hash-matched per probe.
    // Scale shape: the 16-centroid quantizer broadcasts, candidate joins
    // stay equi-keyed on c_id, and the label predicate prunes candidates
    // before the per-probe window; the exact leg is the declared
    // broadcast-probe brute-force baseline class (PlanSpec allowlist).
    "sim_ivf_filtered" -> ((s, d) => {
      val (assigned, probes) = ivfLabeledFrames(s, d)
      val cos = round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
      val wTop = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      // IVF leg: predicate INSIDE the probed cells, before the top-k
      val ivf = assigned.join(broadcast(probes), Seq("c_id"))
        .filter(col("vec_id") =!= col("q_id") && col("label") === col("tgt"))
        .select(col("q_id"), col("vec_id"), cos.as("cos"))
        .withColumn("rank", row_number().over(wTop))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      filteredExact(s, d).join(ivf, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"), col("tgt"))
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0))).as("n_hits"))
        .select(col("q_id"), col("tgt").as("target_label"),
          col("n_exact"), col("n_hits"),
          round(col("n_hits") / col("n_exact"), 6).as("recall"))
    }),

    // THE MEASURED REASON the predicate belongs inside the cells: the same
    // probes, cells, and candidate budget, with the label filter applied
    // the WRONG way as a second leg — AFTER the unfiltered top-5 (what a
    // naive serving layer does: ask the index for k, then drop
    // non-matching rows). With ~|labels| classes an unfiltered top-5
    // keeps ≈ 5/|labels| matching rows, so post-filter recall collapses
    // while pre-filter recall (sim_ivf_filtered's leg) holds — both
    // measured per probe against the same filtered-exact ground truth and
    // hash-matched. The starvation number is what answers "just filter
    // the results" in an ANN design review.
    "sim_ivf_filtered_sweep" -> ((s, d) => {
      val (assigned, probes) = ivfLabeledFrames(s, d)
      val cos = round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6)
      val wTop = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      val cands = assigned.join(broadcast(probes), Seq("c_id"))
        .filter(col("vec_id") =!= col("q_id"))
      // pre-filter: predicate BEFORE the top-5 (the right way)
      val pre = cands.filter(col("label") === col("tgt"))
        .select(col("q_id"), col("vec_id"), cos.as("cos"))
        .withColumn("rank", row_number().over(wTop)).filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id"), lit(1).as("pre_hit"))
      // post-filter: unfiltered top-5, THEN the predicate (the naive way)
      val post = cands
        .select(col("q_id"), col("tgt"), col("label"), col("vec_id"), cos.as("cos"))
        .withColumn("rank", row_number().over(wTop)).filter(col("rank") <= 5)
        .filter(col("label") === col("tgt"))
        .select(col("q_id"), col("vec_id"), lit(1).as("post_hit"))
      filteredExact(s, d)
        .join(pre, Seq("q_id", "vec_id"), "left")
        .join(post, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"), col("tgt"))
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("pre_hit"), lit(0))).as("pre_hits"),
          sum(coalesce(col("post_hit"), lit(0))).as("post_hits"))
        .select(col("q_id"), col("tgt").as("target_label"), col("n_exact"),
          col("pre_hits"), col("post_hits"),
          round(col("pre_hits") / col("n_exact"), 6).as("pre_recall"),
          round(col("post_hits") / col("n_exact"), 6).as("post_recall"))
    }),

    // Product quantization + asymmetric distance (the Jégou et al. PQ
    // design that makes billion-vector ANN storable: 64-dim vectors become
    // 8 one-byte codes — one nearest-centroid id per 8-dim subspace — and
    // query distances are computed code-side from a per-query lookup table
    // without ever touching the full vectors). Codebook: per-subspace
    // k=16 centroids trained by ONE Lloyd step (L2 assignment) from the
    // deterministic vec_id<16 seed subvectors — the same
    // train-don't-fixture discipline as sim_ivf_trained; production
    // iterates the identical step to convergence (usually on a sample —
    // here the step runs over the full corpus so the oracle can replay
    // it). EVERYTHING ranks in exact integer arithmetic: coordinates in
    // micro-units, L2² distances as BIGINT sums of squared differences,
    // ADC totals as integer sums over the 8 subspaces — argmin and top-5
    // have no floating-point boundary for engines to disagree on (only
    // the Lloyd mean rounds, identically on both sides). Scale shape: the
    // codebook (8×16×8 cells) and the per-probe LUT (|probes|·8·16 rows)
    // broadcast; the only corpus-sized streams are the posexplode pass,
    // the (vec, sub, code) assignment groupBys, and the 8-rows-per-vector
    // code table the ADC join actually scans — the PQ storage win made
    // visible in the plan.
    "sim_pq_adc" -> ((s, d) => {
      val wTop = Window.partitionBy(col("q_id")).orderBy(col("adc_u"), col("vec_id"))
      adcScores(s, d)
        .withColumn("rank", row_number().over(wTop))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id"),
          round(col("adc_u").cast("double") / 1000000000000.0, 6).as("adc_d2"),
          col("rank"))
    }),

    // Two-stage ANN: ADC shortlist → exact re-rank — the composition every
    // production PQ deployment actually ships (Jégou et al. §V: codes
    // recall a candidate set, full vectors re-rank it). Stage 1 scans ONLY
    // the 8-byte-code table for a per-probe top-[[RerankShortlist]]
    // shortlist (the measured ADC recall@5 ≈ 0.32 documents why codes
    // alone can't rank the top-5 — quantization error reorders
    // near-neighbors); stage 2 gathers full vectors for the
    // |probes|×shortlist rows alone — broadcast against the corpus
    // row-store, never a second corpus scan of distances — and re-ranks in
    // the same exact integer L2² arithmetic as sim_pq_recall's baseline.
    // sim_pq_rerank_recall audits the end-to-end recall the way
    // sim_ivf_recall audits IVF.
    "sim_pq_rerank" -> ((s, d) => {
      val wShort = Window.partitionBy(col("q_id")).orderBy(col("adc_u"), col("vec_id"))
      val shortlist = adcScores(s, d)
        .withColumn("srank", row_number().over(wShort))
        .filter(col("srank") <= RerankShortlist)
        .select(col("q_id"), col("vec_id"))
      val vu = pqVu(s, d)
      val probes = vu.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("vu").as("qu"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
      vu.join(broadcast(shortlist), Seq("vec_id"))
        .join(broadcast(probes), Seq("q_id"))
        .select(col("q_id"), col("vec_id"),
          graft.expressions.VectorExpressions.l2sq(col("qu"), col("vu")).as("d2"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id"),
          round(col("d2").cast("double") / 1000000000000.0, 6).as("exact_d2"),
          col("rank"))
    }),

    // Recall audit of the two-stage path: re-ranked top-5 vs the exact
    // top-5 — the promotion gate that justifies replacing brute force with
    // codes+re-rank in production. At the 50×k shortlist the reading is
    // recall 1.0 per probe (pinned in WideOpsSpec); a shortlist the exact
    // top-5 escapes would show up here, not in a silent quality regression
    // downstream.
    "sim_pq_rerank_recall" -> ((s, d) => {
      val approx = queries("sim_pq_rerank")(s, d)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      pqExactTop5(s, d).join(approx, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
        .select(col("q_id"), col("n_hits"),
          round(col("n_hits") / 5.0, 6).as("recall"))
    }),

    // SCALAR (SQ8) quantization recall — the 4×-compression rung of the
    // quantization ladder (float32 2048 bits → SQ8 512 → PQ 64 → binary
    // 64): top-5 by integer L2² over emb_quantize_int8's EXACT per-dim
    // symmetric int8 codes, scored against the exact micro-unit top-5.
    // The per-dim scales are a d-bounded (64-row) aggregate collected
    // driver-side and re-entered as an array literal (the emb_pca_topk
    // d-bounded-scalar precedent), so quantization itself is a
    // ZERO-SHUFFLE projection pass — at 100 TB the corpus never moves
    // for its own compression. Distances stay in the codegen'd integer
    // l2sq kernel; every rank boundary is integer, no float tie anywhere.
    "sim_sq8_recall" -> ((s, d) =>
      sq8Top5(s, d)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
        .join(pqExactTop5(s, d), Seq("q_id", "vec_id"), "right")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
        .select(col("q_id"), col("n_hits"),
          round(col("n_hits") / 5.0, 6).as("recall"))),

    // BINARY quantization + Hamming re-rank — the 1-bit rung: sign codes
    // packed as two 32-dim words per vector (32 bits per BIGINT word —
    // 1L<<63 overflows portably, and the w32 layout generalizes to any
    // d), Hamming-distance top-50 shortlist (bit_count(xor) — the only
    // per-pair work, 2 XORs + 2 popcounts), exact integer-L2² re-rank of
    // the shortlist, recall@5 vs the exact top-5. This is the
    // binary-embedding serving shape (32× smaller index, shortlist
    // quality is the whole question — the rung the ladder query ranks).
    "sim_binary_rerank" -> ((s, d) =>
      binaryTop5(s, d)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
        .join(pqExactTop5(s, d), Seq("q_id", "vec_id"), "right")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
        .select(col("q_id"), col("n_hits"),
          round(col("n_hits") / 5.0, 6).as("recall"))),

    // The QUANTIZATION LADDER — the one decision-grade table a pipeline
    // reads before picking its index compression: every rung's total
    // recall@5 over the shared 10-probe set next to its bits/vector.
    // float32 is the exact baseline (1.0 by construction — the sanity
    // anchor), SQ8 the 4× rung, PQ 8×8 the 32× rung, binary+rerank the
    // 32×-with-popcount-scan rung. Measured at sf0.01 the ladder reads
    // the honest guidance: SQ8 keeps (nearly) everything, raw PQ@64-bit
    // is a shortlist generator (0.32), binary's Hamming shortlist +
    // exact re-rank buys most of the exactness back at the same 64 bits.
    // Each leg reuses its family's shared stages; the fusion is four
    // 10-row aggregates.
    "sim_quant_ladder" -> ((s, d) => {
      val ex = pqExactTop5(s, d)
      def leg(scheme: String, bits: Int, top5: DataFrame): DataFrame =
        ex.join(top5.select(col("q_id"), col("vec_id"), lit(1).as("hit")),
            Seq("q_id", "vec_id"), "left")
          .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
          .select(lit(scheme).as("scheme"), lit(bits).as("bits_per_vec"),
            col("n_hits"), round(col("n_hits") / 50.0, 6).as("recall_at_5"))
      leg("float32", 2048, ex)
        .unionByName(leg("sq8", 512, sq8Top5(s, d)))
        .unionByName(leg("pq8x8", 64, queries("sim_pq_adc")(s, d)))
        .unionByName(leg("binary_rerank", 64, binaryTop5(s, d)))
    }),

    // IVF-PQ: the layout billion-vector ANN actually deploys (FAISS
    // IVFPQ / Jégou et al. §V): a coarse quantizer partitions the corpus
    // into inverted lists, probes scan ONLY their nprobe=2 nearest cells'
    // codes (≈2/16 of the corpus here), ADC ranks the candidates from
    // 8-byte codes, and the top-50 shortlist re-ranks in exact integer
    // L2². Composition of three already-oracled stages (coarse cells =
    // the integer-L2 analogue of sim_ivf_topk's fixture quantizer; ADC =
    // sim_pq_adc's LUT scan restricted to candidates by an equi-join on
    // the cell-filtered candidate set; re-rank = sim_pq_rerank's gather).
    // Scale shape: cells + probe cells come from a 16-row broadcast, the
    // candidate filter is an equi-join on the cell id (at cluster scale
    // the code table is PARTITIONED by cell — the inverted-list locality
    // this join models), and only |probes|·50 rows ever gather full
    // vectors. sim_ivfpq_recall reads 0.92 at sf0.01 = exactly the
    // nprobe=2 cell-coverage ceiling (the shortlist and re-rank lose
    // nothing); the residual is pure cell-miss, the nprobe knob.
    "sim_ivfpq_topk" -> ((s, d) =>
      ivfpqFrom(s, d, ivfpqCellScores(s, d), ivfpqCellsShared(s, d))),

    // IVF-PQ over a TRAINED coarse quantizer: one full-vector integer-L2
    // Lloyd step (assign to the 16 seeds, recompute per-dim means rounded
    // to micro-units — the same train-don't-fixture discipline as
    // sim_ivf_trained and the PQ codebook) feeds the identical pipeline.
    // What training buys at scale is LIST BALANCE, not recall: on this
    // corpus the widest inverted list shrinks 42 → 37 rows (σ 5.4 → 5.0)
    // — the worst list bounds what a probe scans, so balancing is the
    // production motive for training the coarse level — while recall@5
    // reads 0.86 vs the fixture's 0.92 at the same nprobe=2 (recall is
    // the nprobe knob, list width is the training knob). The oracle
    // replays the Lloyd step in the same integer arithmetic, so the full
    // train→partition→encode→probe→re-rank path is hash-matched.
    "sim_ivfpq_trained" -> ((s, d) => {
      val scores = ivfpqTrainedCellScores(s, d)
      val wCell = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("c16"))
      val cells = scores
        .withColumn("r", row_number().over(wCell)).filter(col("r") === 1)
        .select(col("vec_id"), col("c16").as("cell"))
      ivfpqFrom(s, d, scores, cells)
    }),

    // End-to-end IVF-PQ recall audit vs the global exact top-5 — the
    // nprobe/shortlist tuning gate. Attribution discipline: compare with
    // sim_pq_rerank_recall (1.0, no cell filter) to read the cell-miss
    // cost, and with sim_pq_recall (~0.32, no re-rank) to read what the
    // exact re-rank recovers.
    "sim_ivfpq_recall" -> ((s, d) => {
      val approx = queries("sim_ivfpq_topk")(s, d)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      pqExactTop5(s, d).join(approx, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
        .select(col("q_id"), col("n_hits"),
          round(col("n_hits") / 5.0, 6).as("recall"))
    }),

    // The nprobe TUNING CURVE for IVF-PQ: recall@5 and scanned fraction at
    // nprobe ∈ {1, 2, 4, 8} against the exact baseline — the recall/cost
    // table a user reads before picking nprobe (the same discipline as the
    // re-rank depth curve, SURVEY §8). Sweep shape: the nprobe=8 candidate
    // union is computed ONCE, each candidate tagged with the probe-cell
    // rank `pr` that admits it (a vector lives in exactly one cell, so pr
    // is unique per pair); ADC runs once over that union, and the
    // per-nprobe legs are a bounded explode (a candidate participates at
    // np iff pr ≤ np) + per-(np, q) shortlist/re-rank windows — never 4
    // corpus scans. Output: 4 rows, each the (recall, scanned_frac) point
    // the nprobe knob buys.
    //
    // Measured at sf0.01: recall 0.90/0.92/0.80/0.72 at scanned fraction
    // 0.06/0.12/0.24/0.50 — NON-monotonic past nprobe=2, and that is the
    // honest FAISS-known lesson the curve teaches: with the ADC shortlist
    // FIXED at 50 and standalone ADC recall only ~0.32, every extra probed
    // cell adds candidates whose noisy code distances crowd true neighbors
    // out of the top-50 before the exact re-rank can save them. Past the
    // cell-coverage knee the binding constraint is shortlist depth, not
    // cell coverage — tune nprobe and the shortlist together.
    "sim_ivfpq_probe_sweep" -> ((s, d) => {
      val scores = ivfpqCellScores(s, d)
      val wCell = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("c16"))
      val cells = ivfpqCellsShared(s, d)
      val probeCells8 = scores.filter(col("vec_id") < 10)
        .withColumn("pr", row_number().over(wCell)).filter(col("pr") <= 8)
        .select(col("vec_id").as("q_id"), col("c16").as("cell"), col("pr"))
      val cand = cells.join(broadcast(probeCells8), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), col("pr"))
      val adcr = cand.join(pqCodesShared(s, d), Seq("vec_id"))
        .join(broadcast(pqLut(s, d)), Seq("q_id", "sub", "c_id"))
        .groupBy(col("q_id"), col("vec_id"), col("pr"))
        .agg(sum(col("d2")).as("adc_u"))
      val swept = adcr.select(col("q_id"), col("vec_id"), col("adc_u"),
        explode(expr("filter(array(1, 2, 4, 8), v -> v >= pr)")).as("np"))
      val wShort = Window.partitionBy(col("np"), col("q_id"))
        .orderBy(col("adc_u"), col("vec_id"))
      val shortlist = swept
        .withColumn("r", row_number().over(wShort)).filter(col("r") <= 50)
        .select(col("np"), col("q_id"), col("vec_id"))
      val vu = pqVu(s, d)
      val probes = vu.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("vu").as("qu"))
      val wRank = Window.partitionBy(col("np"), col("q_id"))
        .orderBy(col("d2"), col("vec_id"))
      val approxTop5 = vu.join(broadcast(shortlist), Seq("vec_id"))
        .join(broadcast(probes), Seq("q_id"))
        .select(col("np"), col("q_id"), col("vec_id"),
          graft.expressions.VectorExpressions.l2sq(col("qu"), col("vu")).as("d2"))
        .withColumn("rank", row_number().over(wRank)).filter(col("rank") <= 5)
        .select(col("np"), col("q_id"), col("vec_id"), lit(1).as("hit"))
      val hits = approxTop5
        .join(pqExactTop5(s, d), Seq("q_id", "vec_id"))
        .groupBy(col("np")).agg(count(lit(1)).as("n_hits"))
      val scanned = swept.groupBy(col("np")).agg(count(lit(1)).as("n_cand"))
      val nTotal = vu.agg(count(lit(1)).as("n_total"))
      scanned.join(hits, Seq("np"), "left")
        .crossJoin(broadcast(nTotal))
        .select(col("np").cast("int").as("nprobe"),
          round(coalesce(col("n_hits"), lit(0L)).cast("double") / 50.0, 6).as("recall"),
          round(col("n_cand").cast("double") / (col("n_total") * 10.0), 6)
            .as("scanned_frac"))
    }),

    // The COMBINED nprobe × shortlist-depth grid: the probe sweep's own
    // reading (recall goes NON-monotonic past nprobe=2 because the fixed-50
    // shortlist binds before cell coverage does) says the two knobs must be
    // tuned together — so this is the 4×4 table that tuning actually reads:
    // recall@5 at nprobe ∈ {1,2,4,8} × depth ∈ {25,50,100,200}, plus the
    // per-nprobe scanned fraction (depth never changes what ADC scans, only
    // what re-ranks). Sweep shape extends the probe sweep's one-union
    // discipline a level deeper: candidates are tagged with the admitting
    // probe rank ONCE, ADC runs once, the per-(np,q) ADC rank is computed
    // once and cut at max-depth 200, each depth leg is a bounded explode of
    // that ranked frame, and the exact re-rank distance is computed ONCE
    // per DISTINCT (q, candidate) pair (≤ |probes|·200 rows, broadcast)
    // then joined back under every (np, depth) leg — never 16 corpus scans,
    // and the same pair is never re-ranked twice.
    "sim_ivfpq_grid" -> ((s, d) => {
      val scores = ivfpqCellScores(s, d)
      val wCell = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("c16"))
      val cells = ivfpqCellsShared(s, d)
      val probeCells8 = scores.filter(col("vec_id") < 10)
        .withColumn("pr", row_number().over(wCell)).filter(col("pr") <= 8)
        .select(col("vec_id").as("q_id"), col("c16").as("cell"), col("pr"))
      val cand = cells.join(broadcast(probeCells8), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), col("pr"))
      val adcr = cand.join(pqCodesShared(s, d), Seq("vec_id"))
        .join(broadcast(pqLut(s, d)), Seq("q_id", "sub", "c_id"))
        .groupBy(col("q_id"), col("vec_id"), col("pr"))
        .agg(sum(col("d2")).as("adc_u"))
      val swept = adcr.select(col("q_id"), col("vec_id"), col("adc_u"),
        explode(expr("filter(array(1, 2, 4, 8), v -> v >= pr)")).as("np"))
      val wShort = Window.partitionBy(col("np"), col("q_id"))
        .orderBy(col("adc_u"), col("vec_id"))
      val ranked = swept
        .withColumn("r", row_number().over(wShort)).filter(col("r") <= 200)
      val byDepth = ranked.select(col("np"), col("q_id"), col("vec_id"),
        explode(expr("filter(array(25, 50, 100, 200), v -> v >= r)")).as("depth"))
      val pairs = ranked.select(col("q_id"), col("vec_id")).distinct()
      val vu = pqVu(s, d)
      val probes = vu.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("vu").as("qu"))
      val exact = vu.join(broadcast(pairs), Seq("vec_id"))
        .join(broadcast(probes), Seq("q_id"))
        .select(col("q_id"), col("vec_id"),
          graft.expressions.VectorExpressions.l2sq(col("qu"), col("vu")).as("d2"))
      val wRank = Window.partitionBy(col("np"), col("depth"), col("q_id"))
        .orderBy(col("d2"), col("vec_id"))
      val approxTop5 = byDepth.join(exact, Seq("q_id", "vec_id"))
        .withColumn("rank", row_number().over(wRank)).filter(col("rank") <= 5)
        .select(col("np"), col("depth"), col("q_id"), col("vec_id"))
      val hits = approxTop5
        .join(pqExactTop5(s, d), Seq("q_id", "vec_id"))
        .groupBy(col("np"), col("depth")).agg(count(lit(1)).as("n_hits"))
      val scanned = swept.groupBy(col("np")).agg(count(lit(1)).as("n_cand"))
      val nTotal = vu.agg(count(lit(1)).as("n_total"))
      val grid = byDepth.select(col("np"), col("depth")).distinct()
      grid.join(hits, Seq("np", "depth"), "left")
        .join(broadcast(scanned), Seq("np"))
        .crossJoin(broadcast(nTotal))
        .select(col("np").cast("int").as("nprobe"),
          col("depth").cast("int").as("depth"),
          round(coalesce(col("n_hits"), lit(0L)).cast("double") / 50.0, 6).as("recall"),
          round(col("n_cand").cast("double") / (col("n_total") * 10.0), 6)
            .as("scanned_frac"))
    }),

    // RESIDUAL IVF-PQ top-k — see [[ivfpqResidualAdc]]: codes describe
    // x − centroid(cell) instead of x, the per-probe LUT gains a cell
    // dimension, and the pipeline downstream (50-shortlist → exact
    // re-rank) is identical to sim_ivfpq_topk's, so the two are directly
    // comparable at equal bytes per vector.
    "sim_ivfpq_residual" -> ((s, d) => {
      val adcr = ivfpqResidualAdc(s, d)
      val wShort = Window.partitionBy(col("q_id")).orderBy(col("adc_u"), col("vec_id"))
      val shortlist = adcr
        .withColumn("r", row_number().over(wShort)).filter(col("r") <= 50)
        .select(col("q_id"), col("vec_id"))
      val vu = pqVu(s, d)
      val probes = vu.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("vu").as("qu"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
      vu.join(broadcast(shortlist), Seq("vec_id"))
        .join(broadcast(probes), Seq("q_id"))
        .select(col("q_id"), col("vec_id"),
          graft.expressions.VectorExpressions.l2sq(col("qu"), col("vu")).as("d2"))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id"),
          round(col("d2").cast("double") / 1000000000000.0, 6).as("exact_d2"),
          col("rank"))
    }),

    // End-to-end recall of the residual variant vs the exact top-5 — read
    // against sim_ivfpq_recall (raw codes, same cells/nprobe/shortlist) to
    // see what residual encoding buys at equal index bytes.
    "sim_ivfpq_residual_recall" -> ((s, d) => {
      val approx = queries("sim_ivfpq_residual")(s, d)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      pqExactTop5(s, d).join(approx, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
        .select(col("q_id"), col("n_hits"),
          round(col("n_hits") / 5.0, 6).as("recall"))
    }),

    // Where residual coding actually shows up: at shortlist depth 50 the
    // exact re-rank forgives most code noise (both schemes sit at the
    // 0.92 cell-coverage ceiling), so this audit SHRINKS the shortlist to
    // 10 — the regime where ADC ordering quality is the binding
    // constraint — and reads recall@5 for raw vs residual codes side by
    // side. Measured at sf0.01: raw 0.50, residual 0.42 — residual coding
    // LOSES on this corpus, and that is the honest reading: the
    // embeddings are near-uniform random unit vectors, so the coarse
    // cells capture almost no structure, residual magnitudes ≈ raw
    // magnitudes, and the residual codebook spends its budget modeling
    // the same geometry from a worse (16-seed residual-space) start. The
    // FAISS guidance this table encodes: residual encoding pays on
    // CLUSTERED corpora where ||x − centroid|| ≪ ||x||; audit it on your
    // data before paying its extra LUT dimension. Two rows; both ADC
    // frames come from the already-shared code tables and one extra
    // bounded rank window each.
    "sim_ivfpq_code_gain" -> ((s, d) => {
      def recallAtDepth10(adcr: DataFrame, scheme: String): DataFrame =
        ivfpqRecallAtDepth10(s, d, adcr, scheme)
      val rawAdcr = {
        val scores = ivfpqCellScores(s, d)
        val wCell = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("c16"))
        val cells = ivfpqCellsShared(s, d)
        val probeCells = scores.filter(col("vec_id") < 10)
          .withColumn("r", row_number().over(wCell)).filter(col("r") <= 2)
          .select(col("vec_id").as("q_id"), col("c16").as("cell"))
        cells.join(broadcast(probeCells), Seq("cell"))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id"))
          .join(pqCodesShared(s, d), Seq("vec_id"))
          .join(broadcast(pqLut(s, d)), Seq("q_id", "sub", "c_id"))
          .groupBy(col("q_id"), col("vec_id"))
          .agg(sum(col("d2")).as("adc_u"))
      }
      recallAtDepth10(rawAdcr, "raw")
        .unionAll(recallAtDepth10(ivfpqResidualAdc(s, d), "residual"))
    }),

    // OPQ-STYLE ROTATION AUDIT (Ge et al. 2013): does rotating the corpus
    // into the snake-allocated PCA eigenbasis lower the PQ quantization
    // error? Three rungs, each the IDENTICAL integer PQ train/encode
    // pipeline over a different coordinate table — raw (the production
    // pqXu), centered (isolates the centering gain), and OPQ-rotated
    // (adds the rotation) — each reduced to its exact BIGINT total
    // quantization error. The rotation is a zero-shuffle projection pass;
    // training is the usual bounded-broadcast codebook shape; the only
    // nested loop is the 1-row scalar(corpus size) annotate. The oracle
    // is GENERATED at Verify time ([[opqOracleSql]]) like emb_pca_topk's:
    // the d×d basis embeds as SQL literals and DuckDB replays rotation +
    // training + encoding — full hash-match. On THIS corpus (near-uniform
    // random unit vectors, near-isotropic covariance) the honest expected
    // reading is "no material gain" — the audit is the tool a deployment
    // runs on ITS corpus before paying for a rotation; clustered real
    // embeddings are where the rotation pays (same lesson as the residual
    // code-gain audit above).
    "sim_opq_code_gain" -> ((s, d) => {
      val (_, mean) = opqBasis(s, d)
      val dim = mean.length
      val cxu = centeredXuArr(s, d, mean)
      // raw and opq rungs read the session-shared codebooks (identical
      // arithmetic to training in place — trainCents(pqXu) IS the shared
      // codebook's definition); only the centered middle rung trains fresh
      pqQerrRow(s, d, pqXuArr(s, d), pqCodebookShared(s, d), "raw", dim)
        .unionAll(pqQerrRow(s, d, cxu, trainCentsArr(cxu), "centered", dim))
        .unionAll(pqQerrRow(s, d, opqXuArrShared(s, d), opqCentsShared(s, d), "opq", dim))
    }),

    // The TRAINING-COST-vs-MSE curve the one-Lloyd-step codebook the PQ
    // family standardizes on was chosen against, made runnable: 4 Lloyd
    // iterations over the shared coordinate scan, each iteration one
    // bounded-broadcast re-assignment + one keyed mean update (the
    // codebook is 1024 rows — only IT iterates; the corpus is scanned
    // once per round, never shuffled on itself), with the exact BIGINT
    // quantization-error total read after every round. Iteration 1 IS
    // the family codebook (spec-pinned equal to sim_opq_code_gain's raw
    // rung); the curve shows where extra rounds stop paying. Empty
    // centroids die naturally (group-by over assigned members only) in
    // both engines. Static unrolled SQL oracle — no data-dependent
    // literals, full hash-match.
    "sim_pq_train_curve" -> ((s, d) => {
      val xu = pqXuArr(s, d)
      val n = embeddings(s, d).agg(count(lit(1)).as("n"))
      def row(cents: DataFrame, iter: Int): DataFrame =
        qerrAgainstArr(xu, centsBySub(cents)).crossJoin(n)
          .select(lit(iter).cast("int").as("iter"), col("t").as("total_qerr_u"),
            round(col("t").cast("double") / col("n") / 64.0
              / 1000000000000.0, 6).as("mse"))
      // Each round's ≤1024-row codebook is lazily loop-checkpointed:
      // without truncation round i's qerr leg replays rounds 1..i−1's
      // corpus passes inside ONE plan (1+2+3+4 = 10 assignment passes per
      // rep instead of 4+4); the blocks materialize inside the query's own
      // timed action and Bench/Verify free them per query.
      import SessionCaches.loopCheckpoint
      Iterator.iterate(loopCheckpoint(trainCentsArr(xu)))(
          c => loopCheckpoint(lloydUpdateArr(xu, c)))
        .take(4).zipWithIndex
        .map { case (c, i) => row(c, i + 1) }
        .reduce(_ unionAll _)
    }),

    // The training curve IN THE ROTATED SPACE — sim_pq_train_curve's 4
    // unrolled Lloyd rounds over the OPQ coordinates: does the rotation
    // change where extra training rounds stop paying? Iteration 1 IS the
    // shared OPQ codebook (trainCents over opqXuShared — the exact
    // arithmetic sim_opq_code_gain's "opq" rung reads), so the curve's
    // first point cross-pins the family artifact; rounds 2-4 read the
    // residual headroom training can still claim after the rotation has
    // already decorrelated the subspaces. Same scale shape as the raw
    // curve: only the 1024-row codebook iterates, the session-shared
    // rotated corpus is scanned once per round, never shuffled on
    // itself. Oracle: generated — DuckDB re-derives the rotation from
    // the basis literals and unrolls the same 4 rounds.
    "sim_opq_train_curve" -> ((s, d) => {
      val xu = opqXuArrShared(s, d)
      val n = embeddings(s, d).agg(count(lit(1)).as("n"))
      def row(cents: DataFrame, iter: Int): DataFrame =
        qerrAgainstArr(xu, centsBySub(cents)).crossJoin(n)
          .select(lit(iter).cast("int").as("iter"), col("t").as("total_qerr_u"),
            round(col("t").cast("double") / col("n") / 64.0
              / 1000000000000.0, 6).as("mse"))
      // per-round lazy loopCheckpoint — see sim_pq_train_curve
      import SessionCaches.loopCheckpoint
      Iterator.iterate(loopCheckpoint(trainCentsArr(xu)))(
          c => loopCheckpoint(lloydUpdateArr(xu, c)))
        .take(4).zipWithIndex
        .map { case (c, i) => row(c, i + 1) }
        .reduce(_ unionAll _)
    }),

    // SEED-CHOICE audit for the PQ trainer: quantization error after one
    // Lloyd update from the family's fixture seeds (vec_id<16 — the
    // deterministic but arbitrary first-ids choice every PQ query
    // standardizes on) vs a deterministic md5-ranked sample (the 16
    // corpus vectors with smallest md5(vec_id), the engine-portable
    // stand-in for a uniform random draw — k-means++/|| style seeding
    // reduced to its oracle-able core). Scale shape: the md5 selection is
    // ORDER BY + LIMIT 16 (TakeOrderedAndProject — map-side top-k, no
    // unbounded single-partition funnel); training is the usual
    // bounded-broadcast shape. On id-uncorrelated synthetic data the
    // honest expectation is a wash — but the OPQ audits taught that
    // predictions lose to measurements here.
    "sim_pq_seed_audit" -> ((s, d) => {
      val xu = pqXuArr(s, d)
      val dim = 64 // the PQ family's fixed 8×8 layout
      val md5Sel = fanOut(embeddings(s, d), s)
        .select(col("vec_id"), md5(col("vec_id").cast("string")).as("h"))
        .orderBy(col("h"), col("vec_id")).limit(16)
        .select(col("vec_id"))
      val md5Seeds = xu.join(broadcast(md5Sel), Seq("vec_id"))
        .select(col("vec_id").as("c_id"), col("sub"), col("xs").as("cu"))
      pqQerrRow(s, d, xu, pqCodebookShared(s, d), "fixture", dim)
        .unionAll(pqQerrRow(s, d, xu,
          lloydUpdateCands(xu, centsArrBySub(md5Seeds)), "md5", dim))
    }),

    // The END-TO-END rung of the FAISS OPQ ladder: IVF-PQ over
    // OPQ-rotated codes, read at the depth-10 regime where ADC ordering
    // binds — directly comparable to sim_ivfpq_code_gain's raw 0.50 /
    // residual 0.42 rows because the CANDIDATE SET is identical by
    // construction (the raw-geometry coarse cells; rotation preserves L2
    // so cell assignment is the same quantizer, and reusing the shared
    // cell directory isolates CODE quality with zero confound). Both
    // legs: candidates → codes → per-probe LUT → ADC top-10 → exact
    // re-rank top-5 → recall vs exact top-5.
    "sim_opq_ivfpq_gain" -> ((s, d) => {
      val scores = ivfpqCellScores(s, d)
      val wCell = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("c16"))
      val probeCells = scores.filter(col("vec_id") < 10)
        .withColumn("r", row_number().over(wCell)).filter(col("r") <= 2)
        .select(col("vec_id").as("q_id"), col("c16").as("cell"))
      val cand = ivfpqCellsShared(s, d).join(broadcast(probeCells), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"))
      def adcOver(codes: DataFrame, lut: DataFrame): DataFrame =
        cand.join(codes, Seq("vec_id"))
          .join(broadcast(lut), Seq("q_id", "sub", "c_id"))
          .groupBy(col("q_id"), col("vec_id"))
          .agg(sum(col("d2")).as("adc_u"))
      ivfpqRecallAtDepth10(s, d, adcOver(pqCodesShared(s, d), pqLut(s, d)), "raw")
        .unionAll(
          ivfpqRecallAtDepth10(s, d, adcOver(opqCodesShared(s, d), opqLut(s, d)), "opq"))
    }),

    // The PRODUCTION-regime leg: whole-corpus ADC shortlist at depth 50
    // (the measured raw depth-recall point 0.72 from the re-rank curve)
    // → exact re-rank → recall@5, raw vs rotated codes. Completes the
    // three-regime table next to sim_opq_recall (whole-corpus ADC@5) and
    // sim_opq_ivfpq_gain (candidate-restricted depth 10): where in the
    // retrieval stack does the rotation actually pay?
    "sim_opq_rerank_gain" -> ((s, d) => {
      def fullAdc(codes: DataFrame, lut: DataFrame): DataFrame =
        codes.join(broadcast(lut), Seq("sub", "c_id"))
          .filter(col("vec_id") =!= col("q_id"))
          .groupBy(col("q_id"), col("vec_id"))
          .agg(sum(col("d2")).as("adc_u"))
      pqRecallAtDepth(s, d, fullAdc(pqCodesShared(s, d), pqLut(s, d)),
          "raw", 50, "recall_at_depth50")
        .unionAll(pqRecallAtDepth(s, d,
          fullAdc(opqCodesShared(s, d), opqLut(s, d)),
          "opq", 50, "recall_at_depth50"))
    }),

    // Does the OPQ rotation's quantization-error gain move RETRIEVAL? ADC
    // top-5 recall against the exact raw-space integer-L2 top-5 (the
    // rotation-invariant ground truth — orthogonal maps preserve L2, so
    // the same baseline serves both schemes) for raw codes vs rotated
    // codes. The raw leg reads the session-shared codebook/code table
    // (identical to sim_pq_adc's ranking, consistency spec-pinned); the
    // rotated leg trains its own codebook over the rotated coordinates.
    // This is the decision-grade number next to the MSE audit: a
    // deployment pays for the rotation only if THIS moves.
    "sim_opq_recall" -> ((s, d) => {
      def adcTop5(xu: DataFrame, cents: DataFrame, codes: DataFrame): DataFrame = {
        val lut = xu.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("sub"), col("wd"), col("xu").as("qu"))
          .join(broadcast(cents), Seq("sub", "wd"))
          .groupBy(col("q_id"), col("sub"), col("c_id"))
          .agg(sum((col("qu") - col("cu")) * (col("qu") - col("cu"))).as("d2"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("adc_u"), col("vec_id"))
        codes.join(broadcast(lut), Seq("sub", "c_id"))
          .filter(col("vec_id") =!= col("q_id"))
          .groupBy(col("q_id"), col("vec_id"))
          .agg(sum(col("d2")).as("adc_u"))
          .withColumn("r", row_number().over(w)).filter(col("r") <= 5)
          .select(col("q_id"), col("vec_id"))
      }
      def recallRow(top5: DataFrame, scheme: String): DataFrame =
        top5.join(pqExactTop5(s, d), Seq("q_id", "vec_id"))
          .agg(count(lit(1)).as("n_hits"))
          .select(lit(scheme).as("scheme"), col("n_hits"),
            round(col("n_hits").cast("double") / 50.0, 6).as("recall_at_5"))
      val rawTop5 =
        adcTop5(pqXu(s, d), pqCodebookShared(s, d), pqCodesShared(s, d))
      val oxu = opqXuShared(s, d)
      recallRow(rawTop5, "raw")
        .unionAll(recallRow(
          adcTop5(oxu, opqCentsShared(s, d), opqCodesShared(s, d)), "opq"))
    }),

    // MMR-DIVERSIFIED top-k (Carbonell & Goldstein 1998, λ = 1/2): greedy
    // re-selection of 5 results from the relevance top-20 shortlist,
    // each pick maximizing relevance MINUS the max similarity to the
    // already-picked set — the diversification every RAG retriever runs
    // so five near-duplicates don't fill the context window. At λ = 1/2
    // the argmax reduces to rel − max-sim in ONE integer unit (micro²
    // dot products), so the greedy path is exactly reproducible and the
    // oracle replays it as 5 unrolled selection steps. The greedy kernel
    // itself is the declared bounded-imperative class (FeatureFinder's
    // category): ≤20 candidates × 5 picks per probe inside mapGroups,
    // keyed by probe — the corpus-scale work (shortlist build) stays
    // declarative above it.
    "sim_mmr_topk" -> ((s, d) => {
      import s.implicits._
      val vu = pqVu(s, d)
      val probes = vu.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("vu").as("qu"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("rel").desc, col("vec_id"))
      val cand = vu.join(broadcast(probes), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), col("vu"),
          graft.expressions.VectorExpressions.dotLong(col("qu"), col("vu")).as("rel"))
        .withColumn("r", row_number().over(w)).filter(col("r") <= 20)
      cand.select(col("q_id"), col("vec_id"), col("vu"), col("rel"))
        .as[(Long, Long, Seq[Long], Long)]
        .groupByKey(_._1)
        .flatMapGroups { (q, it) =>
          def dot(a: Seq[Long], b: Seq[Long]): Long = {
            var acc = 0L; var i = 0
            while (i < a.length) { acc += a(i) * b(i); i += 1 }
            acc
          }
          val remaining = scala.collection.mutable.ArrayBuffer(it.toSeq: _*)
          val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long], Long, Int)]
          var k = 1
          while (k <= 5 && remaining.nonEmpty) {
            val scored = remaining.map { c =>
              val pen = if (picked.isEmpty) 0L
                else picked.iterator.map(p => dot(c._3, p._2)).max
              (c, c._4 - pen)
            }
            val (best, score) = scored.minBy { case (c, sc) => (-sc, c._2) }
            picked += ((best._2, best._3, score, k))
            remaining -= best
            k += 1
          }
          picked.iterator.map(p => (q, p._1, p._4, p._3))
        }
        .toDF("q_id", "vec_id", "rank", "score_u")
        .select(col("q_id"), col("vec_id"), col("rank").cast("int").as("rank"),
          col("score_u"))
    }),

    // MMR λ SWEEP — the diversification knob itself. λ trades relevance
    // against redundancy (score = λ·rel − (1−λ)·max-sim over the picked
    // set); sweeping λ ∈ {1/4, 1/2, 3/4} over the SAME top-20 shortlist is
    // the table read before shipping a retriever config. A ×4 unit lift
    // keeps every leg exact: 4·score = 4λ·rel − 4(1−λ)·pen has integer
    // weights (1,3) / (2,2) / (3,1), so each greedy path is exactly
    // reproducible and the λ=1/2 leg reproduces sim_mmr_topk's ranking
    // with scores ×2 (the spec's cross-check). ONE mapGroups pass runs all
    // three greedy selections over one gather of the ≤20-candidate group —
    // the corpus-scale shortlist build (and its shuffle) happens once, not
    // per λ; the λ loop is driver-free bounded work inside the group.
    "sim_mmr_lambda_sweep" -> ((s, d) => {
      import s.implicits._
      val vu = pqVu(s, d)
      val probes = vu.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("vu").as("qu"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("rel").desc, col("vec_id"))
      val cand = vu.join(broadcast(probes), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), col("vu"),
          graft.expressions.VectorExpressions.dotLong(col("qu"), col("vu")).as("rel"))
        .withColumn("r", row_number().over(w)).filter(col("r") <= 20)
      cand.select(col("q_id"), col("vec_id"), col("vu"), col("rel"))
        .as[(Long, Long, Seq[Long], Long)]
        .groupByKey(_._1)
        .flatMapGroups { (q, it) =>
          def dot(a: Seq[Long], b: Seq[Long]): Long = {
            var acc = 0L; var i = 0
            while (i < a.length) { acc += a(i) * b(i); i += 1 }
            acc
          }
          val cands = it.toSeq
          Seq((25, 1L, 3L), (50, 2L, 2L), (75, 3L, 1L)).iterator.flatMap {
            case (lam, a, b) =>
              val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
              val picked =
                scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Long], Long, Int)]
              var k = 1
              while (k <= 5 && remaining.nonEmpty) {
                val scored = remaining.map { c =>
                  val pen = if (picked.isEmpty) 0L
                    else picked.iterator.map(p => dot(c._3, p._2)).max
                  (c, a * c._4 - b * pen)
                }
                val (best, score) = scored.minBy { case (c, sc) => (-sc, c._2) }
                picked += ((best._2, best._3, score, k))
                remaining -= best
                k += 1
              }
              picked.iterator.map(p => (lam, q, p._1, p._4, p._3))
          }
        }
        .toDF("lam_pct", "q_id", "vec_id", "rank", "score_u")
        .select(col("lam_pct").cast("int").as("lam_pct"), col("q_id"),
          col("vec_id"), col("rank").cast("int").as("rank"), col("score_u"))
    }),

    // Radius (RANGE) search — the fixed-threshold twin of top-k: every
    // corpus vector within L2² < 1.9 (micro² units) of each probe, with
    // neighborhood size, nearest distance, and an order-free member
    // fingerprint per probe. The threshold is a cosine>0.05 band
    // (d² = 2−2cos on unit norms — wide enough that most probes have a
    // non-empty neighborhood at the verification scale), the range-query
    // API over the same geometry the dedup family mines. Declared
    // brute-force audit shape (broadcast probes); the production path
    // bounds candidates with the IVF cells exactly like the top-k path.
    "sim_range_search" -> ((s, d) => {
      val vu = pqVu(s, d)
      val probes = vu.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("vu").as("qu"))
      vu.join(broadcast(probes), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          graft.expressions.VectorExpressions.l2sq(col("qu"), col("vu")).as("d2"))
        .filter(col("d2") < 1900000000000L)
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as("n_within"),
          round(min(col("d2")).cast("double") / 1000000000000.0, 6).as("nearest_d2"),
          sum(col("vec_id")).as("id_sum"))
    }),

    // Matryoshka truncation curve: top-5 recall when ranking by only the
    // FIRST k dims of each embedding (k ∈ {8, 16, 32, 64}) vs the
    // full-dim exact baseline — the read-out behind "can cheap prefix
    // vectors drive first-stage retrieval?" (Kusupati et al. 2022; these
    // embeddings are not MRL-trained, so the curve measures how much
    // signal the leading dims happen to carry — the honest framing). One
    // pass over the probe×corpus pairs computes all four prefix distances
    // as a 4-struct array (each a codegen'd integer-L2 fold over the
    // slice), exploded and ranked per (k, q) — never four corpus scans.
    // Measured at sf0.01: 0.08 / 0.06 / 0.18 / 1.00 at k = 8/16/32/64 —
    // near-random until full dim, i.e. this corpus's synthetic embeddings
    // spread signal uniformly across dims, and the audit's verdict is
    // "do NOT truncate here"; an MRL-trained model is what would bend
    // this curve upward, and this query is how you'd check that it did.
    "emb_matryoshka_recall" -> ((s, d) => {
      val dims = Seq(8, 16, 32, 64)
      val vu = pqVu(s, d)
      val probes = vu.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("vu").as("qu"))
      val scored = vu.join(broadcast(probes), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          explode(array(dims.map(k => struct(lit(k).as("k"),
            graft.expressions.VectorExpressions.l2sq(
              slice(col("qu"), 1, k), slice(col("vu"), 1, k)).as("d2"))): _*))
            .as("x"))
        .select(col("q_id"), col("vec_id"),
          col("x.k").as("k"), col("x.d2").as("d2"))
      val w = Window.partitionBy(col("k"), col("q_id"))
        .orderBy(col("d2"), col("vec_id"))
      val top = scored.withColumn("r", row_number().over(w)).filter(col("r") <= 5)
      top.join(pqExactTop5(s, d).withColumn("hit", lit(1)),
          Seq("q_id", "vec_id"), "left")
        .groupBy(col("k"))
        .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
        .select(col("k").cast("int").as("dim"),
          round(col("n_hits").cast("double") / 50.0, 6).as("recall"))
    }),

    // PQ recall audit: ADC top-5 vs the EXACT integer-L2² top-5 (brute
    // force over the 10-probe broadcast — the same declared-baseline shape
    // as sim_cosine_topk). Both sides rank in exact BIGINT arithmetic, so
    // recall measures quantization loss alone, never float noise. The
    // production promotion decision ("are 8-byte codes good enough?")
    // reads exactly this table.
    "sim_pq_recall" -> ((s, d) => {
      val approx = queries("sim_pq_adc")(s, d)
        .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
      pqExactTop5(s, d).join(approx, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0))).as("n_hits"))
        .select(col("q_id"), col("n_hits"),
          round(col("n_hits") / 5.0, 6).as("recall"))
    }),

    // LSH bucketing: 16 deterministic md5-derived hyperplanes, signature =
    // sign bits. The portable plane rule (see planeMatrix) graduates this
    // from a rows-only check to a full hash-matched oracle. This is the plan
    // shape that scales: the join key is a 16-bit bucket, not the vector.
    "sim_lsh_buckets" -> ((s, d) => lshBuckets(s, d)),

    // Embedding near-dup dedup AT SCALE: the LSH-bucketed composition that
    // replaces dedup_embed_cosine's all-pairs O(N²) BroadcastNestedLoopJoin.
    // Stage 1: 16-bit hyperplane signatures, split 4 bands × 4 bits (banding
    // trades one long signature for 4 chances to collide — the same
    // recall/precision lever as MinHash banding). Stage 2: candidate pairs
    // per (band, key) bucket WITHOUT a self-join (the TextOps in-bucket
    // expansion pattern: one groupBy + k² HOF expansion over small buckets).
    // Stage 3: exact-cosine verification of candidates only. Work is
    // Σ bucket² + |candidates|, not N² — the 100 TB shape. Semantics: pairs
    // that share ≥1 band AND cos > 0.4; the oracle replicates the identical
    // pipeline, so the (documented) LSH recall loss vs the brute-force
    // baseline is pinned, not hidden. dedup_embed_cosine remains the
    // small-N/recall-100% baseline.
    "dedup_embed_lsh" -> ((s, d) => {
      val base = fanOut(embeddings(s, d), s)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
        .cache() // reused by both join sides; avoids recomputing the scan branch
      val bands = lshBuckets(s, d).select(col("vec_id"), explode(array(
        (0 until 4).map(b => struct(lit(b).as("band"),
          substring(col("bucket"), b * 4 + 1, 4).as("bk"))): _*)).as("x"))
        .select(col("vec_id"), col("x.band").as("band"), col("x.bk").as("bk"))
      val cand = bands
        .groupBy(col("band"), col("bk"))
        .agg(array_sort(collect_list(col("vec_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          "flatten(transform(ids, (x, i) -> " +
            "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS da, y AS db))))")).as("p"))
        .select(col("p.da"), col("p.db"))
        .distinct()
      val result = cand
        .join(base.select(col("vec_id").as("da"), col("v").as("va"), col("nrm").as("na")), "da")
        .join(base.select(col("vec_id").as("db"), col("v").as("vb"), col("nrm").as("nb")), "db")
        .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
        .filter(col("cos") > 0.4)
        .select(col("da"), col("db"), round(col("cos"), 6).as("cos"))
        .persist()
      // materialize the (small, ≤|candidates|) pair set, then release the
      // full-corpus base cache — repeated invocations in a long session no
      // longer accumulate its blocks. A lost result block recomputes from
      // the scan (slower, still correct); the result cache itself is freed
      // by the ContextCleaner once the caller drops the frame.
      result.count()
      base.unpersist()
      result
    }),

    // SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    // deduplication = cluster the embedding space, then compare pairs ONLY
    // inside each cluster and drop all but one member of every
    // high-cosine group. This is the production-scale answer to
    // dedup_embed_cosine's all-pairs baseline: the cluster key partitions
    // the pairwise work, so cost falls from N² to Σ|cluster|² — and the
    // pair join is an equi-join on c_id, not a nested loop. Quantizer =
    // the same fixed 16-centroid fixture as sim_ivf_topk (same honesty
    // note: production feeds Lloyd-trained centroids through the identical
    // shape, sim_ivf_trained). Keep rule: a vector is dropped iff an
    // EARLIER (lower-id) same-cluster vector sits above the cosine
    // threshold — greedy keep-first, deterministic, order-free.
    "dedup_semantic" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val base = ivfBase(s, d)
      val cents = base.filter(col("vec_id") < 16)
        .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"))
      // materialize the assignment ONCE (quantize-once-reuse, the same
      // persist discipline as dedup_embed_lsh): the table is read from
      // three plan positions (both pair-join sides + the final verdict
      // join), and without the cache each reference re-runs the corpus ×
      // centroid quantizer pass. At 100 TB this table is what a pipeline
      // writes out between stages; the cache blocks are freed by
      // SessionCaches.releaseAll / the ContextCleaner.
      val asg = base.crossJoin(broadcast(cents))
        .withColumn("cos", dot(col("v"), col("cv")) / (col("nrm") * col("cn")))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("c_id"))))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("c_id"), col("v"), col("nrm"))
        .persist()
      asg.count()
      val dups = asg.select(col("c_id"), col("vec_id").as("da"),
          col("v").as("va"), col("nrm").as("na"))
        .join(asg.select(col("c_id"), col("vec_id").as("db"),
          col("v").as("vb"), col("nrm").as("nb")), Seq("c_id"))
        .filter(col("da") < col("db"))
        .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
        .filter(col("cos") > 0.4)
        .groupBy(col("db").as("vec_id"))
        .agg(count(lit(1)).as("n_earlier"))
      asg.select(col("vec_id"), col("c_id"))
        .join(dups, Seq("vec_id"), "left")
        .select(col("vec_id"), col("c_id"),
          coalesce(col("n_earlier"), lit(0L)).as("n_earlier_dups"),
          col("n_earlier").isNull.as("keep"))
    }),

    // Threshold calibration for the near-dup family: the candidate pairs'
    // cosine distribution in 0.05-wide buckets — the curve a pipeline
    // owner reads before PICKING the dedup threshold (how many pairs does
    // 0.75 vs 0.80 drop?). Composes the oracled LSH+verify pipeline; the
    // bucket index is pure integer arithmetic over the 6dp-rounded cosine
    // (round(cos·1e6) div 50000), so no float boundary decides a bucket.
    // Output is ≤20 rows whatever the corpus size.
    "dedup_threshold_sweep" -> ((s, d) => {
      queries("dedup_embed_lsh")(s, d)
        .select(expr("CAST(round(cos * 1000000) AS LONG) div 50000").as("bucket"),
          col("cos"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_pairs"),
          round(min(col("cos")), 6).as("min_cos"),
          round(max(col("cos")), 6).as("max_cos"))
    }),

    // Hybrid retrieval via reciprocal-rank fusion (Cormack et al.): the
    // dense leg (sim_cosine_topk over embeddings) and the lexical leg
    // (text_shingle_knn 4-gram Jaccard over documents) rank the SAME 10
    // probe ids (the test tables share the 0-based id space, the standard
    // one-embedding-per-document layout), and each candidate's fused score
    // is Σ 1/(60+rank). Contributions are rounded to integer micro-units
    // BEFORE the sum — 1e6/(60+r) for r in 1..5 sits far from any .5
    // boundary, so both engines produce the identical BIGINT and the fused
    // ranking has no float tie. Each leg is its own already-oracled
    // operator; fusion itself is one keyed aggregation over <=100 rows per
    // probe — cost lives in the legs, which scale independently.
    "sim_rrf_fusion" -> ((s, d) => {
      val cu = round(lit(1000000.0) / (lit(60) + col("rank"))).cast("long")
      val dense = queries("sim_cosine_topk")(s, d)
        .select(col("q_id"), col("vec_id").as("cand"), cu.as("cu"))
      val lex = TextOps.queries("text_shingle_knn")(s, d)
        .select(col("q_doc").as("q_id"), col("doc_id").as("cand"), cu.as("cu"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("rrf_u").desc, col("cand"))
      dense.unionByName(lex)
        .groupBy(col("q_id"), col("cand"))
        .agg(sum(col("cu")).as("rrf_u"), count(lit(1)).as("n_legs"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("cand"),
          round(col("rrf_u").cast("double") / 1000000.0, 6).as("rrf"),
          col("n_legs"), col("rank"))
    }),

    // The ENCODE SCAN throughput shape: the whole corpus product-quantized
    // in ONE pure projection pass — the streaming encode's literal-codebook
    // argmin expression (EncodeIngest.codeStructs: array_min over
    // (d2, c_id) structs, ties to the lower c_id) run batch-side, zero
    // shuffles, whole-stage codegen. This is the number BENCH tracks for
    // the per-row encode cost itself, separated from streaming micro-batch
    // overhead (stream_pq_encode = this + staging + 4 drains) AND from the
    // join-based batch encode (pqCodesShared's broadcast-join + window
    // argmin); all three land on the identical code table. At 1000
    // executors this is the saturating map-only pass an index build wants.
    "sim_pq_encode_scan" -> ((s, d) => {
      val cents = collectedCents(pqCodebookShared(s, d))
      fanOut(embeddings(s, d), s)
        .select(col("vec_id"), asDouble(col("embedding")).as("v"))
        .select(col("vec_id"),
          transform(col("v"), x => round(x * 1000000).cast("long")).as("xu"))
        .select(col("vec_id"),
          explode(graft.streaming.EncodeIngest.codeStructs(col("xu"), cents)).as("c"))
        .select(col("vec_id"), col("c.sub").cast("int").as("sub"), col("c.c_id").as("c_id"))
    }),

    // The COMPOSED production retrieval pipeline, end to end in one
    // oracled query: BM25 lexical leg (the text_bm25_topk scoring core
    // over the session-shared inverted index, probes = the dense family's
    // doc_id < 10, production depth 50) + ROTATED-ADC dense leg (the
    // sim_opq_rerank_gain regime: OPQ codes scanned against a broadcast
    // per-probe LUT, depth 50) fused with reciprocal-rank fusion (the
    // sim_rrf_fusion rule: integer micro-unit 1e6/(60+rank) contributions,
    // exact BIGINT sum, top-10). Each leg is an already-oracled operator;
    // this query pins the COMPOSITION — the hybrid retrieval stack a RAG
    // data pipeline actually deploys (lexical recall + dense semantics,
    // rank-fused). Scale shape: the corpus appears exactly twice — one
    // posting-table probe join (query dims broadcast) and one 8-byte-code
    // scan (LUT broadcast); fusion itself aggregates ≤ 100 rows per probe.
    "pipeline_hybrid_retrieval" -> ((s, d) => {
      val cu = round(lit(1000000.0) / (lit(60) + col("rank"))).cast("long")
      val wF = Window.partitionBy(col("q_id")).orderBy(col("rrf_u").desc, col("cand"))
      hybridLegsShared(s, d)
        .select(col("q_id"), col("cand"), cu.as("cu"))
        .groupBy(col("q_id"), col("cand"))
        .agg(sum(col("cu")).as("rrf_u"), count(lit(1)).as("n_legs"))
        .withColumn("rank", row_number().over(wF))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("cand"),
          round(col("rrf_u").cast("double") / 1000000.0, 6).as("rrf"),
          col("n_legs"), col("rank"))
    }),

    // The FUSION AUDIT — measure, don't guess, for the composed stack:
    // recall@5 of the dense leg alone, the lexical leg alone, and the
    // RRF fusion, all against the exact raw-space integer-L2 top-5 (the
    // rotation-invariant dense ground truth every OPQ audit shares). On
    // THIS corpus documents and embeddings are statistically independent,
    // so the honest expectation is that mixing lexical rank DILUTES dense
    // recall — the negative result a pipeline owner needs pinned before
    // trusting RRF: fusion pays only when the modalities correlate, and
    // this table is the cheap test that tells you whether yours do.
    "pipeline_hybrid_gain" -> ((s, d) => {
      val exact = pqExactTop5(s, d).withColumnRenamed("vec_id", "cand")
      def recallRow(top5: DataFrame, scheme: String): DataFrame =
        top5.join(exact, Seq("q_id", "cand"))
          .agg(count(lit(1)).as("n_hits"))
          .select(lit(scheme).as("scheme"), col("n_hits"),
            round(col("n_hits").cast("double") / 50.0, 6).as("recall_at_5"))
      val hybrid = queries("pipeline_hybrid_retrieval")(s, d)
      val legs = hybridLegsShared(s, d)
      val dense5 = legs.filter(col("leg") === "dense" && col("rank") <= 5)
        .select(col("q_id"), col("cand"))
      val lex5 = legs.filter(col("leg") === "lex" && col("rank") <= 5)
        .select(col("q_id"), col("cand"))
      val rrf5 = hybrid.filter(col("rank") <= 5).select(col("q_id"), col("cand"))
      recallRow(dense5, "dense")
        .unionAll(recallRow(lex5, "lexical"))
        .unionAll(recallRow(rrf5, "rrf"))
    }),

    // The RRF k-constant SWEEP over the hybrid stack —
    // pipeline_hybrid_gain parameterized by the fusion's only knob:
    // k ∈ {5, 20, 60, 240} (small k weights the top ranks steeply; large
    // k flattens toward leg-count voting). Both legs are ranked ONCE at
    // depth 50; the sweep is a 4-value literal explode over the bounded
    // leg rows plus per-(k, probe) top-5 windows — never a re-scan of
    // either corpus pass. On this corpus (independent modalities, the
    // lexical leg is noise) the honest expectation: small k lets the
    // noise leg's top ranks override dense evidence, large k converges
    // to two-leg consensus — the curve a pipeline owner reads before
    // trusting k=60's default.
    "pipeline_hybrid_ksweep" -> ((s, d) => {
      import s.implicits._
      val ks = Seq(5, 20, 60, 240)
      val legs = hybridLegsShared(s, d)
      val wK = Window.partitionBy(col("k"), col("q_id"))
        .orderBy(col("rrf_u").desc, col("cand"))
      val top5 = legs
        .select(col("q_id"), col("cand"), col("rank"),
          explode(array(ks.map(lit): _*)).as("k"))
        .select(col("k"), col("q_id"), col("cand"),
          round(lit(1000000.0) / (col("k") + col("rank"))).cast("long").as("cu"))
        .groupBy(col("k"), col("q_id"), col("cand"))
        .agg(sum(col("cu")).as("rrf_u"))
        .withColumn("r", row_number().over(wK)).filter(col("r") <= 5)
        .select(col("k"), col("q_id"), col("cand"))
      val exact = pqExactTop5(s, d).withColumnRenamed("vec_id", "cand")
      val hits = top5.join(exact, Seq("q_id", "cand"))
        .groupBy(col("k")).agg(count(lit(1)).as("n_hits"))
      ks.toDF("k").join(hits, Seq("k"), "left")
        .select(col("k"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          round(coalesce(col("n_hits"), lit(0L)).cast("double") / 50.0, 6)
            .as("recall_at_5"))
    }),

    // INDEX COMPACTION — the physical inverted-list layout step: the
    // IVF-PQ index (cell + codes) repartitioned BY CELL and written
    // partitionBy(cell), so each inverted list is one contiguous
    // partition directory a probe's nprobe cells can open directly
    // (partition pruning — pinned in CompactionSpec) while every other
    // list is never read. The query emits the per-cell inventory read
    // BACK from the compacted layout: the write→read round trip must
    // lose nothing vs the logical table (the oracle re-derives it from
    // raw parquet). repartition(cell) before partitionBy keeps exactly
    // one writer task per cell — one file per list, not one per
    // (task × cell) fragment; at 100 TB this is the compaction job that
    // turns a streamed append log into a servable index.
    // GDPR ERASURE FOR THE ANN INDEX — cdc_forget_keys' discipline
    // applied to the servable inverted-list layout: the purge is planned
    // from the FORGET SET alone (its cells come off the ≤16-row cell
    // directory, zero index scans), only the affected cells' partition
    // dirs are rewritten (dynamic overwrite), every other inverted list's
    // file is never opened (byte-identity spec-pinned in
    // IvfpqForgetSpec). The emitted census is the post-purge read-back —
    // per cell: survivors, codes, how many vectors the purge removed,
    // and whether the cell was rewritten at all — hash-matched against
    // the logical purged index DuckDB re-derives from raw parquet.
    "sim_ivfpq_forget_purge" -> ((s, d) => {
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("ivfpq-forget")
      try {
        stageIvfpqLayout(s, d, dir.toString)
        val nf = purgeForgotten(s, d, dir.toString)
        // bounded (≤16 rows): collected so the result outlives the temp dir
        s.read.parquet(dir.toString)
          .groupBy(col("cell").cast("int").as("cell"))
          .agg(countDistinct(col("vec_id")).as("n_vectors"),
            count(lit(1)).as("n_codes"))
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
            nf.getOrElse(r.getInt(0).toLong, 0L), nf.contains(r.getInt(0).toLong)))
          .toSeq
          .toDF("cell", "n_vectors", "n_codes", "n_forgotten", "rewritten")
      } finally graft.streaming.StagedEvents.deleteRecursively(dir)
    }),

    // The SERVING side of index erasure — what a tier does between purge
    // jobs: dead vectors are TOMBSTONED (a broadcast-bounded id set) and
    // dropped from each probe's candidates BEFORE ranking, so answers
    // are exact w.r.t. the purged corpus while the physical lists still
    // hold dead codes. Per probe the row reads the cost and the
    // guarantee: candidates scanned with tombstones vs after the
    // physical purge (the dead-scan overhead the purge job reclaims),
    // the served top-5 checksum, and the agreement flag pinning that
    // tombstone serving ≡ purged serving — both legs computed end to end
    // and replayed leg for leg in the oracle.
    "sim_ivfpq_forget_serve" -> ((s, d) => {
      val cells = ivfpqCellsShared(s, d)
      val pc = ivfpqProbeCells(s, d)
      val cand = cells.join(broadcast(pc), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), forgetPred.as("dead"))
      val counts = cand.groupBy(col("q_id")).agg(
        count(lit(1)).as("n_scanned_tomb"),
        sum(when(col("dead"), 1L).otherwise(0L)).as("n_dead"))
      def top5(c: DataFrame): DataFrame = {
        val adcr = c
          .join(pqCodesShared(s, d), Seq("vec_id"))
          .join(broadcast(pqLut(s, d)), Seq("q_id", "sub", "c_id"))
          .groupBy(col("q_id"), col("vec_id"))
          .agg(sum(col("d2")).as("adc_u"))
        ivfpqExactTail(s, d, adcr).select(col("q_id"), col("vec_id"))
      }
      val tomb = top5(cand.filter(!col("dead")).select(col("q_id"), col("vec_id")))
        .groupBy(col("q_id"))
        .agg(sum(col("vec_id")).as("top5_sum"), count(lit(1)).as("tn"))
      val purged = top5(cells.filter(!forgetPred)
          .join(broadcast(pc), Seq("cell"))
          .filter(col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id")))
        .groupBy(col("q_id"))
        .agg(sum(col("vec_id")).as("p_sum"), count(lit(1)).as("pn"))
      counts.join(tomb, Seq("q_id")).join(purged, Seq("q_id"))
        .select(col("q_id"), col("n_scanned_tomb"), col("n_dead"),
          (col("n_scanned_tomb") - col("n_dead")).as("n_scanned_purged"),
          col("top5_sum"),
          (col("top5_sum") === col("p_sum") && col("tn") === col("pn")).as("agree"))
    }),

    "sim_ivfpq_compaction" -> ((s, d) => {
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("ivfpq-compaction")
      try {
        ivfpqCellsShared(s, d).join(pqCodesShared(s, d), Seq("vec_id"))
          .repartition(col("cell"))
          .write.mode("overwrite").partitionBy("cell").parquet(dir.toString)
        // bounded (≤16 rows): collected so the result outlives the temp dir
        s.read.parquet(dir.toString)
          .groupBy(col("cell").cast("int").as("cell"))
          .agg(countDistinct(col("vec_id")).as("n_vectors"),
            count(lit(1)).as("n_codes"))
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
          .toDF("cell", "n_vectors", "n_codes")
      } finally graft.streaming.StagedEvents.deleteRecursively(dir)
    }),

    // The DEPTH curve for the hybrid stack — the ksweep's orthogonal
    // knob: recall@5 of the k=60 fusion when BOTH legs are cut at depth
    // ∈ {5, 10, 25, 50} before fusing. Depth is the production cost
    // lever (each leg's depth is rows fetched per query); the curve
    // reads how much fused quality the cheaper shortlists give up. Same
    // sweep shape as the k sweep: legs ranked ONCE, a literal explode
    // filters them per depth, per-(depth, probe) top-5 windows.
    "pipeline_hybrid_depth_curve" -> ((s, d) => {
      import s.implicits._
      val depths = Seq(5, 10, 25, 50)
      val cu = round(lit(1000000.0) / (lit(60) + col("rank"))).cast("long")
      val wD = Window.partitionBy(col("depth"), col("q_id"))
        .orderBy(col("rrf_u").desc, col("cand"))
      val top5 = hybridLegsShared(s, d)
        .select(col("q_id"), col("cand"), col("rank"), cu.as("cu"),
          explode(array(depths.map(lit): _*)).as("depth"))
        .filter(col("rank") <= col("depth"))
        .groupBy(col("depth"), col("q_id"), col("cand"))
        .agg(sum(col("cu")).as("rrf_u"))
        .withColumn("r", row_number().over(wD)).filter(col("r") <= 5)
        .select(col("depth"), col("q_id"), col("cand"))
      val exact = pqExactTop5(s, d).withColumnRenamed("vec_id", "cand")
      val hits = top5.join(exact, Seq("q_id", "cand"))
        .groupBy(col("depth")).agg(count(lit(1)).as("n_hits"))
      depths.toDF("depth").join(hits, Seq("depth"), "left")
        .select(col("depth"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          round(coalesce(col("n_hits"), lit(0L)).cast("double") / 50.0, 6)
            .as("recall_at_5"))
    }),

    // GRADED ranking metrics for the hybrid stack — recall@5 says WHETHER
    // the right answers surface; nDCG@10 and MRR@10 say WHERE (a list
    // that buries its one true hit at rank 10 has the same recall as one
    // that leads with it — and very different training value when the
    // ranked list becomes hard-negative mining input). Gains are graded
    // by the exact top-5's own order (rel = 6 − exact rank); discounts
    // 1/log2(rank+1) are embedded as INTEGER micro-unit literals in both
    // engines — identical constants, so no libm log2 divergence can
    // decide a hash — and IDCG is closed-form (every probe has exactly 5
    // relevant), making nDCG one integer sum + one division per scheme.
    // Scale shape: everything after the shared legs is ≤30 rows per
    // probe; no corpus re-scan, no new shuffle beyond three tiny aggs.
    "pipeline_retrieval_metrics" -> ((s, d) => {
      val discU = Seq(1000000L, 630930L, 500000L, 430677L, 386853L,
        356207L, 333333L, 315465L, 301030L, 289065L)
      val idcgU = 10271927L // 5·disc(1)+4·disc(2)+3·disc(3)+2·disc(4)+1·disc(5)
      val discArr = array(discU.map(lit): _*)
      val exact = pqExactTop5Ranked(s, d).withColumnRenamed("vec_id", "cand")
      val ranked = hybridLegsShared(s, d).filter(col("rank") <= 10)
        .select(col("leg").as("scheme"), col("q_id"), col("cand"), col("rank"))
        .unionByName(queries("pipeline_hybrid_retrieval")(s, d)
          .select(lit("rrf").as("scheme"), col("q_id"), col("cand"), col("rank")))
      ranked.join(broadcast(exact), Seq("q_id", "cand"), "left")
        .select(col("scheme"),
          (coalesce(lit(6L) - col("erank"), lit(0L)) *
            element_at(discArr, col("rank"))).as("g_u"),
          when(col("erank") === 1,
            round(lit(1000000.0) / col("rank")).cast("long"))
            .otherwise(lit(0L)).as("rr_u"),
          when(col("erank").isNotNull, 1L).otherwise(0L).as("hit"))
        .groupBy(col("scheme"))
        .agg(sum(col("g_u")).as("dcg_u"), sum(col("rr_u")).as("mrr_su"),
          sum(col("hit")).as("n_rel_found"))
        .select(col("scheme"),
          round(col("dcg_u").cast("double") / (10.0 * idcgU), 6).as("ndcg_at_10"),
          round(col("mrr_su").cast("double") / 10000000.0, 6).as("mrr_at_10"),
          col("n_rel_found"))
    }),

    // The SERVING-COST table for the inverted-list layout — the cost
    // twin of sim_ivfpq_probe_sweep's recall curve: per nprobe ∈
    // {1,2,4,8}, how many inverted lists a probe set opens and how many
    // 1-byte codes it scans (8 per vector in a touched list), plus the
    // corpus fraction scanned per probe. Read next to the sweep's recall
    // column this is the complete recall-vs-cost tradeoff the nprobe
    // knob buys — and the row counts are exactly what the compacted
    // partitionBy(cell) layout turns into files opened. Everything is
    // bounded: probe ranks are a ≤160-row frame, list sizes a 16-row
    // aggregate; the corpus is scanned once for each.
    "sim_ivfpq_scan_cost" -> ((s, d) => {
      val wCell = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("c16"))
      val pr = ivfpqCellScores(s, d).filter(col("vec_id") < 10)
        .withColumn("pr", row_number().over(wCell)).filter(col("pr") <= 8)
        .select(col("vec_id").as("q_id"), col("c16").as("cell"), col("pr"))
      val sizes = ivfpqCellsShared(s, d)
        .groupBy(col("cell")).agg(count(lit(1)).as("n_vec"))
      val n = embeddings(s, d).agg(count(lit(1)).as("n"))
      val nq = pr.select(countDistinct(col("q_id")).as("nq"))
      pr.join(broadcast(sizes), Seq("cell"))
        .select(col("q_id"), col("pr"), col("n_vec"),
          explode(array(Seq(1, 2, 4, 8).map(lit): _*)).as("np"))
        .filter(col("pr") <= col("np"))
        .groupBy(col("np"))
        .agg(count(lit(1)).as("cells_touched"),
          (sum(col("n_vec")) * 8).cast("long").as("codes_scanned"),
          sum(col("n_vec")).as("sv"))
        .crossJoin(n).crossJoin(nq)
        .select(col("np").as("nprobe"), col("cells_touched"),
          col("codes_scanned"),
          round(col("sv").cast("double") / col("n") / col("nq"), 6)
            .as("scanned_frac"))
    }),

    // INDEX MAINTENANCE — the append→fragment→merge loop a streamed
    // index actually lives: half the corpus is compacted first (one
    // file per list), the other half lands later as an APPEND into the
    // same partitioned layout (a second file per touched list — the
    // fragmentation a streaming sink accumulates batch after batch),
    // then the re-compaction job rewrites one file per list
    // (fragmented-then-merged pinned file-count-by-file-count in
    // CompactionSpec). The emitted read-back inventory must equal the
    // SAME logical table as sim_ivfpq_compaction — the maintenance loop
    // loses nothing (oracle shared). At 100 TB this is the recurring
    // LSM-style merge that keeps probe-side reads at one file per list.
    "sim_ivfpq_recompaction" -> ((s, d) => {
      import s.implicits._
      val idx = ivfpqCellsShared(s, d).join(pqCodesShared(s, d), Seq("vec_id"))
      val log = java.nio.file.Files.createTempDirectory("ivfpq-append-log")
      val merged = java.nio.file.Files.createTempDirectory("ivfpq-recompacted")
      try {
        idx.filter(col("vec_id") % 2 === 0).repartition(col("cell"))
          .write.mode("overwrite").partitionBy("cell").parquet(log.toString)
        idx.filter(col("vec_id") % 2 === 1).repartition(col("cell"))
          .write.mode("append").partitionBy("cell").parquet(log.toString)
        s.read.parquet(log.toString)
          .repartition(col("cell"))
          .write.mode("overwrite").partitionBy("cell").parquet(merged.toString)
        // bounded (≤16 rows): collected so the result outlives the temp dirs
        s.read.parquet(merged.toString)
          .groupBy(col("cell").cast("int").as("cell"))
          .agg(countDistinct(col("vec_id")).as("n_vectors"),
            count(lit(1)).as("n_codes"))
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
          .toDF("cell", "n_vectors", "n_codes")
      } finally {
        graft.streaming.StagedEvents.deleteRecursively(log)
        graft.streaming.StagedEvents.deleteRecursively(merged)
      }
    }),

    // The MERGE-DECISION metric that schedules the recompaction: four
    // mod-4 slices of the corpus appended into the partitionBy(cell)
    // layout in sequence (each append writes ≤1 file per touched list —
    // the repartition(cell) guarantee), and after every batch the
    // PHYSICAL list/file counts are read off the directory: n_files
    // grows by one per touched list per batch while n_lists saturates,
    // and merge_due fires when files exceed 2× lists — the
    // fragmentation watermark an index maintenance job polls. The
    // oracle re-derives the expected counts LOGICALLY from the cell
    // assignment (distinct (cell, batch) pairs), so physical layout
    // state hash-matching SQL is the claim: the directory contains
    // exactly what the write protocol predicts, batch by batch.
    "sim_ivfpq_frag_trigger" -> ((s, d) => {
      import s.implicits._
      val idx = ivfpqCellsShared(s, d).join(pqCodesShared(s, d), Seq("vec_id"))
      val dir = java.nio.file.Files.createTempDirectory("ivfpq-frag-log")
      try {
        val rows = (0 until 4).map { b =>
          idx.filter(col("vec_id") % 4 === b).repartition(col("cell"))
            .write.mode(if (b == 0) "overwrite" else "append")
            .partitionBy("cell").parquet(dir.toString)
          import scala.jdk.CollectionConverters._
          val walk = java.nio.file.Files.walk(dir)
          val files =
            try walk.iterator().asScala
              .filter(_.getFileName.toString.endsWith(".parquet")).toVector
            finally walk.close()
          val lists = files.map(_.getParent.getFileName.toString).distinct.size
          (b, lists.toLong, files.size.toLong, files.size > 2L * lists)
        }
        rows.toDF("batch", "n_lists", "n_files", "merge_due")
      } finally graft.streaming.StagedEvents.deleteRecursively(dir)
    }),

    // NN-Descent style k-NN GRAPH construction (Dong et al. 2011, WWW —
    // "Efficient K-Nearest Neighbor Graph Construction") — the graph-ANN
    // index family the inverted-list operators can't express: every node
    // ends with its K approximate nearest neighbors, built WITHOUT any
    // N² pass. Init partitions the corpus into md5 blocks TWICE under
    // different salts and brute-forces only in-block pairs (2·N·blocksize
    // distances) — the overlap is what lets later rounds cross block
    // boundaries (see [[knnGraphShared]]); each round then expands
    // every node's candidates to neighbors ∪ REVERSE neighbors ∪ two-hop
    // neighbors-of-neighbors — the "a neighbor of my neighbor is likely my
    // neighbor" closure the paper's local join exploits — and re-ranks to
    // top-K by exact cosine. Per round: two self-joins of the K-bounded
    // edge list (≤ N·(K²+2K) candidate rows, never N²) + two keyed joins
    // onto the vector table for the distance evaluation + one per-node
    // top-K window; everything shuffles on node id, so at 100 TB the
    // rounds are a fixed number of keyed shuffles of a K-bounded edge
    // list. The whole 3-iteration history is ONE session-shared frame
    // ([[knnGraphShared]]) the graph query and the convergence curve both
    // read. Ranking is on the 6dp-rounded cosine with nbr-id tiebreak, so
    // the graph replays bit-for-bit in the generated DuckDB CTE chain
    // (every per-round CTE MATERIALIZED — the text_bpe_train lesson: the
    // doubly-referenced round CTE inlines exponentially otherwise).
    "sim_knn_graph" -> ((s, d) =>
      knnFinalGraphShared(s, d)
        .select(col("vec_id"), col("nbr"), col("rank"), col("cos"))),

    // The convergence audit of the same build: recall@K per round against
    // the EXACT top-K of a deterministic md5 10% probe sample — the
    // brute-force leg costs |probes|·N distances (linear, not quadratic:
    // the audit stays runnable at scale precisely because the sample is
    // bounded), shares its tie rule with the graph, and reads the graph
    // rounds from the session-shared frame. The measured curve is the
    // stopping rule an index-build job consults: when the recall delta
    // per round flattens, iterating further buys nothing.
    "sim_knn_graph_curve" -> ((s, d) => {
      val g = knnGraphShared(s, d)
      val vecs = ivfBase(s, d)
      val probes = vecs
        .filter(conv(substring(md5(col("vec_id").cast("string")), 1, 15), 16, 10)
          .cast("long") % 10L === 0L)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("nbr"))
      val exact = vecs.join(broadcast(probes), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("nbr"),
          round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos"))
        .withColumn("r", row_number().over(w)).filter(col("r") <= KnnK)
        .select(col("q_id"), col("nbr"))
      val perIter = g.groupBy(col("iter")).agg(count(lit(1)).as("n_edges"))
      val hits = g.select(col("iter"), col("vec_id").as("q_id"), col("nbr"))
        .join(exact, Seq("q_id", "nbr"))
        .groupBy(col("iter")).agg(count(lit(1)).as("n_hits"))
      perIter.join(hits, Seq("iter"), "left")
        .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
        .select(col("iter"), col("n_edges"),
          round(coalesce(col("n_hits"), lit(0L)) / col("n_exact"), 6).as("recall"))
    }),

    // INCREMENTAL kNN-graph maintenance — the graph analogue of
    // sim_ivfpq_recompaction's append→merge loop: a vector batch (~1/8 of
    // the corpus by salted md5) arrives AFTER the base graph was built,
    // and instead of a full NN-Descent rebuild the index absorbs it in
    // three bounded steps: (1) each new node seeds from its two salted
    // blocks over the CURRENT corpus and ranks to top-K; (2) one search
    // hop through the base graph (neighbors of my seed neighbors) and a
    // re-rank — the standard search-based insert; (3) the AFFECTED base
    // neighborhoods (nodes a new node now points at) re-rank their old
    // edges against the new arrivals; every other base node keeps its
    // edges untouched. Cost: O(batch · blocksize + batch · K²) distance
    // evaluations, never a corpus-wide round — at 100 TB this is the
    // difference between an hourly index refresh and a weekly rebuild.
    // Output: per-cohort (new / affected / untouched / overall) edge
    // recall against the from-scratch FULL rebuild (the session-shared
    // frame), hash-matched in DuckDB by replaying base build + insert +
    // comparison. What the metric shows: the incremental graph tracks the
    // rebuild closely everywhere except where the insert's locality
    // assumption bites — and it QUANTIFIES that bite per cohort, which is
    // the number an index-maintenance job alarms on.
    "sim_knn_graph_incremental" -> ((s, d) => {
      val vecs = ivfBase(s, d)
      val full = knnFinalGraphShared(s, d)
        .select(col("vec_id"), col("nbr"))
      val (ginc, aff) = knnIncInsert(s, d, SessionCaches.loopCheckpoint)
      // cohort labels + recall vs the from-scratch rebuild
      val cohorts = vecs.select(col("vec_id"), knnBatchPred.as("nw"))
        .join(aff.select(col("vec_id"), lit(true).as("af")), Seq("vec_id"), "left")
        .select(col("vec_id"),
          when(col("nw"), "new").when(col("af"), "affected")
            .otherwise("untouched").as("cohort"))
      val incC = ginc.join(cohorts, Seq("vec_id"))
      val per = cohorts.groupBy(col("cohort")).agg(count(lit(1)).as("n_nodes"))
        .join(incC.groupBy(col("cohort")).agg(count(lit(1)).as("n_edges")), Seq("cohort"))
        .join(full.join(cohorts, Seq("vec_id"))
          .groupBy(col("cohort")).agg(count(lit(1)).as("n_full")), Seq("cohort"))
        .join(incC.join(full, Seq("vec_id", "nbr"))
          .groupBy(col("cohort")).agg(count(lit(1)).as("n_hits")), Seq("cohort"), "left")
        .select(col("cohort"), col("n_nodes"), col("n_edges"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          round(coalesce(col("n_hits"), lit(0L)) / col("n_full"), 6).as("recall"))
      // the overall row: three 1-row scalar aggregates annotated together
      // (the declared constant-size cross-join shape)
      val overall = cohorts.agg(count(lit(1)).as("n_nodes"))
        .crossJoin(ginc.agg(count(lit(1)).as("n_edges")))
        .crossJoin(ginc.join(full, Seq("vec_id", "nbr")).agg(count(lit(1)).as("n_hits"))
          .crossJoin(full.agg(count(lit(1)).as("n_full"))))
        .select(lit("overall").as("cohort"), col("n_nodes"), col("n_edges"),
          col("n_hits"), round(col("n_hits") / col("n_full"), 6).as("recall"))
      per.unionByName(overall)
    }),

    // GRAPH-SERVING LAYOUT — the kNN graph's physical counterpart of the
    // inverted-list compaction: the final graph repartitioned by its b1
    // salted block and written partitionBy(blk), one adjacency file per
    // block, so a serving read for a node opens ONLY its block's file
    // (partition pruning — KnnLayoutSpec pins files-read == blocks-probed
    // and one-file-per-block). The oracled output is the per-block
    // inventory read BACK from the layout: the write→read round trip
    // must lose nothing vs the logical graph (the oracle re-derives the
    // block inventory from the generated build chain). At 100 TB this is
    // the job that turns the maintained edge list into the
    // random-access-served artifact a retrieval tier reads.
    "sim_knn_graph_layout" -> ((s, d) => {
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("knn-layout")
      try {
        val blk = (conv(substring(
          md5(concat(lit("b1"), col("vec_id").cast("string"))), 1, 15),
          16, 10).cast("long") % KnnBlocks).as("blk")
        knnFinalGraphShared(s, d)
          .select(col("vec_id"), col("nbr"), blk)
          .repartition(col("blk"))
          .write.mode("overwrite").partitionBy("blk").parquet(dir.toString)
        // bounded (≤16 rows): collected so the result outlives the temp dir
        s.read.parquet(dir.toString)
          .groupBy(col("blk").cast("int").as("blk"))
          .agg(countDistinct(col("vec_id")).as("n_nodes"),
            count(lit(1)).as("n_edges"))
          .collect()
          .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
          .toDF("blk", "n_nodes", "n_edges")
      } finally graft.streaming.StagedEvents.deleteRecursively(dir)
    }),

    // The MERGE-DECISION metric for the graph layout — the graph twin of
    // sim_ivfpq_frag_trigger: four mod-4 slices of the final adjacency
    // appended into the partitionBy(blk) serving layout in sequence
    // (each append writes ≤1 file per touched block — the
    // repartition(blk) guarantee), the PHYSICAL block/file counts read
    // off the directory after every batch, and merge_due firing past the
    // 2× fragmentation watermark — the poll that schedules the layout's
    // recompaction between incremental inserts. The oracle re-derives
    // the counts LOGICALLY from distinct (blk, batch) pairs over the
    // generated build chain, so directory state hash-matching SQL pins
    // that the layout contains exactly what the write protocol predicts.
    "sim_knn_graph_frag_trigger" -> ((s, d) => {
      import s.implicits._
      val blk = (conv(substring(
        md5(concat(lit("b1"), col("vec_id").cast("string"))), 1, 15),
        16, 10).cast("long") % KnnBlocks).as("blk")
      val g = knnFinalGraphShared(s, d)
        .select(col("vec_id"), col("nbr"), blk)
      val dir = java.nio.file.Files.createTempDirectory("knn-frag-log")
      try {
        val rows = (0 until 4).map { b =>
          g.filter(col("vec_id") % 4 === b).repartition(col("blk"))
            .write.mode(if (b == 0) "overwrite" else "append")
            .partitionBy("blk").parquet(dir.toString)
          import scala.jdk.CollectionConverters._
          val walk = java.nio.file.Files.walk(dir)
          val files =
            try walk.iterator().asScala
              .filter(_.getFileName.toString.endsWith(".parquet")).toVector
            finally walk.close()
          val blocks = files.map(_.getParent.getFileName.toString).distinct.size
          (b, blocks.toLong, files.size.toLong, files.size > 2L * blocks)
        }
        rows.toDF("batch", "n_blocks", "n_files", "merge_due")
      } finally graft.streaming.StagedEvents.deleteRecursively(dir)
    }),

    // SERVED GRAPH TRAVERSAL — greedy beam search over the kNN graph,
    // the query-time half of the graph-ANN story (the HNSW/NSG read path
    // in its flat one-layer form): start at the probe's own node, expand
    // the beam's graph neighbors, score candidates by exact cosine to
    // the probe, keep the best B=8, repeat 3 rounds; the answer is the
    // top-5 of everything VISITED. Cost per probe: rounds·B·K candidate
    // scores — the graph turns a corpus scan into a bounded walk, which
    // is the point of maintaining the graph at all. The rounds unroll
    // like the Lloyd training curves (fixed count, no driver loop over
    // data); every step is an equi-join on node id with the probe table
    // broadcast. Oracle: the generated build chain plus the unrolled
    // walk replayed CTE for CTE — the walk's visit order, tie rule, and
    // scores must all agree for the hash to match.
    "sim_knn_graph_search" -> ((s, d) => {
      val vecs = ivfBase(s, d)
      val g = knnFinalGraphShared(s, d)
        .select(col("vec_id"), col("nbr"))
      // bounded-frame conf scope (the sim_knn_graph_entry discipline):
      // per-hop frames are <= probes x beam x K rows at ANY corpus size,
      // so their plans compile with AQE off + a fixed small partition
      // count - no per-stage AQE jobs, no re-optimization of 10^2-row
      // exchanges; shared parents above still build at session settings
      graft.tables.Tables.withShufflePartitions(s, 4)(
        graft.tables.Tables.withAqeOff(s) {
      val probes = vecs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      def score(cand: DataFrame): DataFrame =
        cand
          .join(vecs.select(col("vec_id").as("cand"), col("v"), col("nrm")), Seq("cand"))
          .join(broadcast(probes), Seq("q_id"))
          .select(col("q_id"), col("cand"),
            round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos"))
      val wB = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand"))
      var beam = probes.select(col("q_id"), col("q_id").as("cand"))
      var visited: DataFrame = null
      for (_ <- 1 to 3) {
        val expand = beam
          .join(g.select(col("vec_id").as("cand"), col("nbr")), Seq("cand"))
          .select(col("q_id"), col("nbr").as("cand"))
          .filter(col("cand") =!= col("q_id"))
          .distinct()
        val scored = score(expand)
        // per-round lineage truncation (the bfsFrom discipline): beam_t
        // references visited_t and expand_{t+1} references beam_t, so an
        // untruncated visited doubles its plan every round (2^rounds
        // replays of the scoring subplan)
        visited = SessionCaches.loopCheckpoint(
          if (visited == null) scored
          else visited.unionByName(scored).distinct())
        beam = visited.withColumn("r", row_number().over(wB)).filter(col("r") <= 8)
          .select(col("q_id"), col("cand"))
      }
      visited.withColumn("rank", row_number().over(wB)).filter(col("rank") <= 5)
        .select(col("q_id"), col("cand").as("vec_id"), col("cos"),
          col("rank").cast("int").as("rank"))
      })
    }),

    // FILTERED graph-ANN read — sim_ivf_filtered's question asked of the
    // graph index, with a THREE-way measured answer per probe against
    // the shared filtered-exact ground truth: (pre) the label predicate
    // INSIDE the walk — only matching candidates enter the visited set
    // and beam, the filtered-subgraph walk; (vis) the unfiltered walk
    // with the predicate over its WHOLE visited set before the top-5 —
    // the zero-index-change serving lever; (post) the naive unfiltered
    // top-5 then filter. Measured at sf0.01: vis 0.34 > pre 0.16 > post
    // 0.10 mean recall — the OPPOSITE ordering of the IVF case, and the
    // finding IS the operator: on a label-blind kNN graph the filtered
    // walk dead-ends (6/10 probes have no same-label neighbor to step
    // to — their rows read honest zeros), so predicate-inside-the-index
    // only wins once the GRAPH is built label-aware (the actual
    // Filtered-DiskANN design); until then, filter the visited set, not
    // the result set. Both walks and all three legs replay in the
    // generated CTE oracle, dead ends included.
    "sim_knn_graph_search_filtered" -> ((s, d) => {
      val base = fanOut(embeddings(s, d), s)
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
        .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      val g = knnFinalGraphShared(s, d)
        .select(col("vec_id"), col("nbr"))
      // bounded-frame conf scope - see sim_knn_graph_search
      graft.tables.Tables.withShufflePartitions(s, 4)(
        graft.tables.Tables.withAqeOff(s) {
      val probes = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("label").as("tgt"),
          col("v").as("qv"), col("nrm").as("qn"))
      def score(cand: DataFrame): DataFrame =
        cand
          .join(base.select(col("vec_id").as("cand"), col("label"),
            col("v"), col("nrm")), Seq("cand"))
          .join(broadcast(probes), Seq("q_id"))
          .select(col("q_id"), col("tgt"), col("cand"), col("label"),
            round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos"))
      val wB = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand"))
      def walkVisited(filtered: Boolean): DataFrame = {
        var beam = probes.select(col("q_id"), col("q_id").as("cand"))
        var visited: DataFrame = null
        for (_ <- 1 to 3) {
          val expand = beam
            .join(g.select(col("vec_id").as("cand"), col("nbr")), Seq("cand"))
            .select(col("q_id"), col("nbr").as("cand"))
            .filter(col("cand") =!= col("q_id"))
            .distinct()
          val sc = score(expand)
          val scored =
            (if (filtered) sc.filter(col("label") === col("tgt")) else sc)
              .select(col("q_id"), col("cand"), col("cos"))
          // per-round lineage truncation — see the bfsFrom discipline
          visited = SessionCaches.loopCheckpoint(
            if (visited == null) scored
            else visited.unionByName(scored).distinct())
          beam = visited.withColumn("r", row_number().over(wB)).filter(col("r") <= 8)
            .select(col("q_id"), col("cand"))
        }
        visited
      }
      def top5(v: DataFrame): DataFrame =
        v.withColumn("rk", row_number().over(wB)).filter(col("rk") <= 5)
          .select(col("q_id"), col("cand").as("vec_id"))
      val visU = walkVisited(filtered = false)
      val pre = top5(walkVisited(filtered = true)).withColumn("pre_hit", lit(1))
      val post = top5(visU)
        .join(base.select(col("vec_id"), col("label")), Seq("vec_id"))
        .join(broadcast(probes.select(col("q_id"), col("tgt"))), Seq("q_id"))
        .filter(col("label") === col("tgt"))
        .select(col("q_id"), col("vec_id"), lit(1).as("post_hit"))
      // the middle ground a serving tier can apply WITHOUT touching the
      // index: filter the whole visited set (≈ rounds·B·K candidates),
      // THEN take 5 — costs nothing extra at walk time and dodges the
      // top-5 starvation, but still misses what the walk never visited
      val visLeg = top5(visU
        .join(base.select(col("vec_id").as("cand"), col("label")), Seq("cand"))
        .join(broadcast(probes.select(col("q_id"), col("tgt"))), Seq("q_id"))
        .filter(col("label") === col("tgt"))
        .select(col("q_id"), col("cand"), col("cos")))
        .withColumn("vis_hit", lit(1))
      filteredExact(s, d)
        .join(pre, Seq("q_id", "vec_id"), "left")
        .join(visLeg, Seq("q_id", "vec_id"), "left")
        .join(post, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"), col("tgt"))
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("pre_hit"), lit(0))).as("pre_hits"),
          sum(coalesce(col("vis_hit"), lit(0))).as("vis_hits"),
          sum(coalesce(col("post_hit"), lit(0))).as("post_hits"))
        .select(col("q_id"), col("tgt").as("target_label"), col("n_exact"),
          col("pre_hits"), col("vis_hits"), col("post_hits"),
          round(col("pre_hits") / col("n_exact"), 6).as("pre_recall"),
          round(col("vis_hits") / col("n_exact"), 6).as("vis_recall"),
          round(col("post_hits") / col("n_exact"), 6).as("post_recall"))
      })
    }),

    // The LABEL-AWARE build's inventory — what the stitch actually adds,
    // per label: how many same-label edges the blind graph already had,
    // how many shortcut edges the stitch contributes beyond them, and —
    // the dead-end census that motivated it — how many nodes had ZERO
    // same-label out-edges before vs after (before: the stranded-walk
    // population sim_knn_graph_search_filtered measured; after: 0 by
    // construction, every node gets LblK same-label shortcuts unless its
    // label-blocks hold no other member). All integer counts.
    "sim_knn_graph_labeled_build" -> ((s, d) => {
      val lb = fanOut(embeddings(s, d), s).select(col("vec_id"), col("label"))
      val ge = knnFinalGraphShared(s, d)
        .select(col("vec_id"), col("nbr"))
      val gl = knnLabeledGraphShared(s, d)
      def sameLabel(g: DataFrame): DataFrame = g
        .join(lb, Seq("vec_id"))
        .join(lb.select(col("vec_id").as("nbr"), col("label").as("nl")), Seq("nbr"))
        .filter(col("label") === col("nl"))
        .select(col("vec_id"), col("label"))
      val nodes = lb.groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
      def edgeCounts(g: DataFrame, as: String): DataFrame =
        sameLabel(g).groupBy(col("label")).agg(count(lit(1)).as(as))
      val added = gl.join(ge, Seq("vec_id", "nbr"), "left_anti")
        .join(lb, Seq("vec_id"))
        .groupBy(col("label")).agg(count(lit(1)).as("added_edges"))
      def noSame(g: DataFrame, as: String): DataFrame =
        lb.join(sameLabel(g).select(col("vec_id")).distinct(),
            Seq("vec_id"), "left_anti")
          .groupBy(col("label")).agg(count(lit(1)).as(as))
      nodes
        .join(edgeCounts(ge, "base_same_edges"), Seq("label"), "left")
        .join(added, Seq("label"), "left")
        .join(edgeCounts(gl, "aug_same_edges"), Seq("label"), "left")
        .join(noSame(ge, "no_same_before"), Seq("label"), "left")
        .join(noSame(gl, "no_same_after"), Seq("label"), "left")
        .select(col("label"), col("n_nodes"),
          coalesce(col("base_same_edges"), lit(0L)).as("base_same_edges"),
          coalesce(col("added_edges"), lit(0L)).as("added_edges"),
          coalesce(col("aug_same_edges"), lit(0L)).as("aug_same_edges"),
          coalesce(col("no_same_before"), lit(0L)).as("no_same_before"),
          coalesce(col("no_same_after"), lit(0L)).as("no_same_after"))
    }),

    // The labeled search — sim_knn_graph_search_filtered's three-way
    // measurement RE-RUN where it matters: the filtered (in-walk
    // predicate) beam walk over the STITCHED graph (lab), the same
    // filtered walk over the blind graph (blind — replays the original
    // pre leg verbatim), and the unfiltered walk over the stitched graph
    // with its visited set filtered (vis — the zero-predicate-pushdown
    // serving lever on the new index). The finding this lands: the
    // stitch flips the ordering — predicate-inside-the-index only wins
    // once the index is built label-aware, exactly the Filtered-DiskANN
    // claim, now a measured row per probe against the same shared
    // filtered-exact truth.
    "sim_knn_graph_search_labeled" -> ((s, d) => {
      val base = fanOut(embeddings(s, d), s)
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
        .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      val ge = knnFinalGraphShared(s, d)
        .select(col("vec_id"), col("nbr"))
      val gl = knnLabeledGraphShared(s, d)
      // bounded-frame conf scope - see sim_knn_graph_search
      graft.tables.Tables.withShufflePartitions(s, 4)(
        graft.tables.Tables.withAqeOff(s) {
      val probes = base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("label").as("tgt"),
          col("v").as("qv"), col("nrm").as("qn"))
      def score(cand: DataFrame): DataFrame =
        cand
          .join(base.select(col("vec_id").as("cand"), col("label"),
            col("v"), col("nrm")), Seq("cand"))
          .join(broadcast(probes), Seq("q_id"))
          .select(col("q_id"), col("tgt"), col("cand"), col("label"),
            round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos"))
      val wB = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand"))
      def walkVisited(g: DataFrame, filtered: Boolean): DataFrame = {
        var beam = probes.select(col("q_id"), col("q_id").as("cand"))
        var visited: DataFrame = null
        for (_ <- 1 to 3) {
          val expand = beam
            .join(g.select(col("vec_id").as("cand"), col("nbr")), Seq("cand"))
            .select(col("q_id"), col("nbr").as("cand"))
            .filter(col("cand") =!= col("q_id"))
            .distinct()
          val sc = score(expand)
          val scored =
            (if (filtered) sc.filter(col("label") === col("tgt")) else sc)
              .select(col("q_id"), col("cand"), col("cos"))
          // per-round lineage truncation — see the bfsFrom discipline
          visited = SessionCaches.loopCheckpoint(
            if (visited == null) scored
            else visited.unionByName(scored).distinct())
          beam = visited.withColumn("r", row_number().over(wB)).filter(col("r") <= 8)
            .select(col("q_id"), col("cand"))
        }
        visited
      }
      def top5(v: DataFrame): DataFrame =
        v.withColumn("rk", row_number().over(wB)).filter(col("rk") <= 5)
          .select(col("q_id"), col("cand").as("vec_id"))
      val lab = top5(walkVisited(gl, filtered = true)).withColumn("lab_hit", lit(1))
      val blind = top5(walkVisited(ge, filtered = true)).withColumn("blind_hit", lit(1))
      val vis = top5(walkVisited(gl, filtered = false)
        .join(base.select(col("vec_id").as("cand"), col("label")), Seq("cand"))
        .join(broadcast(probes.select(col("q_id"), col("tgt"))), Seq("q_id"))
        .filter(col("label") === col("tgt"))
        .select(col("q_id"), col("cand"), col("cos")))
        .withColumn("vis_hit", lit(1))
      filteredExact(s, d)
        .join(lab, Seq("q_id", "vec_id"), "left")
        .join(blind, Seq("q_id", "vec_id"), "left")
        .join(vis, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"), col("tgt"))
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("lab_hit"), lit(0))).as("lab_hits"),
          sum(coalesce(col("blind_hit"), lit(0))).as("blind_hits"),
          sum(coalesce(col("vis_hit"), lit(0))).as("vis_hits"))
        .select(col("q_id"), col("tgt").as("target_label"), col("n_exact"),
          col("lab_hits"), col("blind_hits"), col("vis_hits"),
          round(col("lab_hits") / col("n_exact"), 6).as("lab_recall"),
          round(col("blind_hits") / col("n_exact"), 6).as("blind_recall"),
          round(col("vis_hits") / col("n_exact"), 6).as("vis_recall"))
      })
    }),

    // ENTRY-POINT strategy for the graph walk — the missing HNSW rung.
    // Every walk above starts at the probe's OWN node, an entry a real
    // index only has when the query is already a corpus member; a cold
    // index serving external queries needs an entry strategy, and HNSW's
    // answer is a hierarchy: a sparse upper layer is scanned brute-force
    // to pick a per-query entry, then the full-graph walk runs from
    // there. This measures the three strategies a serving tier can
    // actually choose between, per probe against the exact cosine top-5:
    //   self  — start at the probe's node (the ceiling; only available
    //           for in-corpus queries),
    //   fixed — start at ONE global entry node (what a flat index with a
    //           single entry point does; zero extra distance work),
    //   hier  — brute-force the ~1/8 md5-sampled upper layer to pick the
    //           per-probe entry (|L1| ≈ N/8 distance evals — the HNSW
    //           upper-layer descent collapsed to one sampled layer),
    //           then the same walk.
    // All three run the IDENTICAL 3-round B=8 walk; only beam0 differs,
    // so the recall spread is attributable to the entry alone. The
    // output also pins both entry choices (fixed_entry, hier_entry) and
    // the layer size n_layer1 — the hier strategy's per-query scan cost.
    // Measured at sf0.01: mean recall self 0.58 > hier 0.40 > fixed
    // 0.24 — the fixed entry strands the 3-round walk far from most
    // targets, and the sampled layer buys back two thirds of the gap to
    // the in-corpus ceiling for an N/8 scan (vs the N-scan exact
    // answer). At 100 TB that N/8 is the difference between a serving
    // tier that scans shards and one that reads a cached upper layer.
    // Oracle: the generated build chain + THREE unrolled walk replays
    // differing only in their beam0 CTE.
    "sim_knn_graph_entry" -> ((s, d) => {
      val vecs = ivfBase(s, d)
      // shared parent materialized BEFORE the bounded-frame conf scope:
      // a cold build must compile at session settings (AQE, data-scaled
      // partitions), never at the walk's bounded-frame settings
      val g = knnFinalGraphShared(s, d)
        .select(col("vec_id"), col("nbr"))
      graft.tables.Tables.withShufflePartitions(s, 4)(
        graft.tables.Tables.withAqeOff(s) {
      val probes = vecs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      // the sampled upper layer: ~1/8 of the corpus by salted md5 — the
      // same standardized sampling rule as the init blocks
      val l1 = vecs.filter(
        conv(substring(md5(concat(lit("hl"), col("vec_id").cast("string"))), 1, 15),
          16, 10).cast("long") % 8L === 0L)
      def score(cand: DataFrame): DataFrame =
        cand
          .join(vecs.select(col("vec_id").as("cand"), col("v"), col("nrm")), Seq("cand"))
          .join(broadcast(probes), Seq("q_id"))
          .select(col("q_id"), col("cand"),
            round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos"))
      val wB = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand"))
      // per-probe hier entry: argmax cosine over the layer only (never
      // the probe's own node — an external query wouldn't be in L1)
      val hier = l1.select(col("vec_id").as("cand"), col("v"), col("nrm"))
        .join(broadcast(probes), col("cand") =!= col("q_id"))
        .select(col("q_id"), col("cand"),
          round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos"))
        .withColumn("r", row_number().over(wB)).filter(col("r") === 1)
        .select(col("q_id"), col("cand"))
      // the one global entry: the layer's smallest id — deterministic,
      // zero per-query work (bounded 1-row frame, broadcast to probes)
      val fx = l1.agg(min(col("vec_id")).as("fixed_entry"))
      def walk(entry: DataFrame): DataFrame = {
        var beam = entry
        var visited: DataFrame = null
        for (_ <- 1 to 3) {
          val expand = beam
            .join(g.select(col("vec_id").as("cand"), col("nbr")), Seq("cand"))
            .select(col("q_id"), col("nbr").as("cand"))
            .filter(col("cand") =!= col("q_id"))
            .distinct()
          val scored = score(expand)
          // per-round lineage truncation — see the bfsFrom discipline
          visited = SessionCaches.loopCheckpoint(
            if (visited == null) scored
            else visited.unionByName(scored).distinct())
          beam = visited.withColumn("r", row_number().over(wB)).filter(col("r") <= 8)
            .select(col("q_id"), col("cand"))
        }
        visited
      }
      def top5(v: DataFrame): DataFrame =
        v.withColumn("rk", row_number().over(wB)).filter(col("rk") <= 5)
          .select(col("q_id"), col("cand").as("vec_id"))
      val se = top5(walk(probes.select(col("q_id"), col("q_id").as("cand"))))
        .withColumn("self_hit", lit(1))
      val fxw = top5(walk(probes.select(col("q_id"))
        .crossJoin(broadcast(fx)).select(col("q_id"), col("fixed_entry").as("cand"))))
        .withColumn("fixed_hit", lit(1))
      val hrw = top5(walk(hier)).withColumn("hier_hit", lit(1))
      val exact = vecs.join(broadcast(probes), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("cand"),
          round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos"))
        .withColumn("r", row_number().over(wB)).filter(col("r") <= 5)
        .select(col("q_id"), col("cand").as("vec_id"))
      exact
        .join(se, Seq("q_id", "vec_id"), "left")
        .join(fxw, Seq("q_id", "vec_id"), "left")
        .join(hrw, Seq("q_id", "vec_id"), "left")
        .groupBy(col("q_id"))
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("self_hit"), lit(0))).as("self_hits"),
          sum(coalesce(col("fixed_hit"), lit(0))).as("fixed_hits"),
          sum(coalesce(col("hier_hit"), lit(0))).as("hier_hits"))
        .join(hier.select(col("q_id"), col("cand").as("hier_entry")), Seq("q_id"))
        .crossJoin(broadcast(fx))
        .crossJoin(broadcast(l1.agg(count(lit(1)).as("n_layer1"))))
        .select(col("q_id"), col("fixed_entry"), col("hier_entry"), col("n_layer1"),
          col("n_exact"), col("self_hits"), col("fixed_hits"), col("hier_hits"),
          round(col("self_hits") / col("n_exact"), 6).as("self_recall"),
          round(col("fixed_hits") / col("n_exact"), 6).as("fixed_recall"),
          round(col("hier_hits") / col("n_exact"), 6).as("hier_recall"))
      })
    }),

    // The recall-vs-cost SWEEP for the graph search — the nprobe-sweep
    // analogue for the graph index: beam width B ∈ {4, 8, 16} × rounds
    // 1..3, each cell's visited-set top-5 scored against the exact
    // cosine top-5 (the declared broadcast-probe baseline class). Cost
    // per cell is rounds·B·K candidate scores, so the table reads as
    // "what recall does each extra unit of walk work buy" — the knob an
    // operator tunes before sizing the serving tier. The walks unroll
    // exactly like the search query; only the beam cut differs per B.
    "sim_knn_graph_search_sweep" -> ((s, d) => {
      val vecs = ivfBase(s, d)
      val g = knnFinalGraphShared(s, d)
        .select(col("vec_id"), col("nbr"))
      // bounded-frame conf scope - see sim_knn_graph_search
      graft.tables.Tables.withShufflePartitions(s, 4)(
        graft.tables.Tables.withAqeOff(s) {
      val probes = vecs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      def score(cand: DataFrame): DataFrame =
        cand
          .join(vecs.select(col("vec_id").as("cand"), col("v"), col("nrm")), Seq("cand"))
          .join(broadcast(probes), Seq("q_id"))
          .select(col("q_id"), col("cand"),
            round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos"))
      val wB = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand"))
      val exact = vecs.join(broadcast(probes), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("cand"),
          round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos"))
        .withColumn("r", row_number().over(wB)).filter(col("r") <= 5)
        .select(col("q_id"), col("cand"))
      val cells = for (b <- Seq(4, 8, 16)) yield {
        var beam = probes.select(col("q_id"), col("q_id").as("cand"))
        var visited: DataFrame = null
        (1 to 3).map { r =>
          val expand = beam
            .join(g.select(col("vec_id").as("cand"), col("nbr")), Seq("cand"))
            .select(col("q_id"), col("nbr").as("cand"))
            .filter(col("cand") =!= col("q_id"))
            .distinct()
          val scored = score(expand)
          // per-round lineage truncation — see the bfsFrom discipline
          visited = SessionCaches.loopCheckpoint(
            if (visited == null) scored
            else visited.unionByName(scored).distinct())
          beam = visited.withColumn("r", row_number().over(wB)).filter(col("r") <= b)
            .select(col("q_id"), col("cand"))
          visited.withColumn("r", row_number().over(wB)).filter(col("r") <= 5)
            .select(col("q_id"), col("cand"))
            .join(exact, Seq("q_id", "cand"))
            .agg(count(lit(1)).as("n_hits"))
            .select(lit(b).cast("int").as("beam"), lit(r).cast("int").as("rounds"),
              col("n_hits"), round(col("n_hits") / 50.0, 6).as("recall_at_5"))
        }
      }
      cells.flatten.reduce(_ unionByName _)
      })
    }),

    // SERVE FROM THE MAINTAINED GRAPH — the end-to-end proof the
    // incremental maintenance loop preserves the READ path, not just
    // edge recall: the identical beam walk (B=8, 3 rounds) runs over
    // the from-scratch rebuild AND over the maintained graph the insert
    // left behind (the session-shared index state a serving tier
    // actually holds between rebuilds), each answer set scored against
    // the exact cosine top-5, plus the direct agreement between the two
    // answer sets. If maintenance degraded the walk topology — dead
    // ends where the repair skipped a neighborhood — it shows up HERE
    // first, as served-recall drift the per-cohort edge metric can
    // average away; this is the number an index-maintenance job pages
    // on before scheduling the full rebuild.
    "sim_knn_graph_serve_maintained" -> ((s, d) => {
      val vecs = ivfBase(s, d)
      val full = knnFinalGraphShared(s, d)
        .select(col("vec_id"), col("nbr"))
      val ginc = knnIncGraphShared(s, d)
      // Examined r14: the bounded-frame AQE-off scope the other walks use
      // REGRESSED this query (A/B: 1.54 s AQE-on vs 2.39 s off while the
      // control moved the other way) - the two-graph comparison's readout
      // joins benefit from AQE's runtime sizing here. Left at session
      // settings deliberately.
      val probes = vecs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      def score(cand: DataFrame): DataFrame =
        cand
          .join(vecs.select(col("vec_id").as("cand"), col("v"), col("nrm")), Seq("cand"))
          .join(broadcast(probes), Seq("q_id"))
          .select(col("q_id"), col("cand"),
            round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos"))
      val wB = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand"))
      def walkTop5(g: DataFrame): DataFrame = {
        var beam = probes.select(col("q_id"), col("q_id").as("cand"))
        var visited: DataFrame = null
        for (_ <- 1 to 3) {
          val expand = beam
            .join(g.select(col("vec_id").as("cand"), col("nbr")), Seq("cand"))
            .select(col("q_id"), col("nbr").as("cand"))
            .filter(col("cand") =!= col("q_id"))
            .distinct()
          val scored = score(expand)
          // per-round lineage truncation — see the bfsFrom discipline
          visited = SessionCaches.loopCheckpoint(
            if (visited == null) scored
            else visited.unionByName(scored).distinct())
          beam = visited.withColumn("r", row_number().over(wB)).filter(col("r") <= 8)
            .select(col("q_id"), col("cand"))
        }
        visited.withColumn("r", row_number().over(wB)).filter(col("r") <= 5)
          .select(col("q_id"), col("cand"))
      }
      val exact = vecs.join(broadcast(probes), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("cand"),
          round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos"))
        .withColumn("r", row_number().over(wB)).filter(col("r") <= 5)
        .select(col("q_id"), col("cand"))
      val f5 = walkTop5(full)
      val m5 = walkTop5(ginc)
      def row(tag: String, hits: DataFrame): DataFrame =
        hits.agg(count(lit(1)).as("n_hits"))
          .select(lit(tag).as("variant"), col("n_hits"),
            round(col("n_hits") / 50.0, 6).as("frac"))
      row("rebuilt", f5.join(exact, Seq("q_id", "cand")))
        .unionByName(row("maintained", m5.join(exact, Seq("q_id", "cand"))))
        .unionByName(row("agreement", f5.join(m5, Seq("q_id", "cand"))))
    }),

    // SERVE FROM THE COMPACTED LAYOUT — the graph read path composed
    // with the graph serving layout: the IDENTICAL beam walk (B=8, 3
    // rounds, same tie rule) as sim_knn_graph_search, but adjacency
    // comes from the staged partitionBy(blk) layout with per-hop
    // partition-PRUNED reads instead of the session-shared logical
    // frame. Each round collects the beam's occupied block SET (bounded
    // by construction: ≤10 probes × B=8 node ids → ≤ KnnBlocks
    // distinct values) and reads only those blocks' files — so a hop
    // touches the slice of the graph the walk actually visits, never
    // the whole adjacency table. That is the 100 TB serving contract:
    // the index lives as one file per block on object storage, a query
    // walks rounds·B nodes, and I/O is proportional to blocks VISITED,
    // not graph size (KnnLayoutSpec pins files-read == blocks-probed on
    // this exact read shape). The layout itself is an ingest artifact —
    // staged once per data-dir content stamp via the atomic-rename
    // protocol, the same build sim_knn_graph_layout inventories and
    // sim_knn_graph_frag_trigger polls — a serving tier READS it, it
    // does not rebuild it per query. Oracle: verbatim the
    // sim_knn_graph_search SQL — serving from the layout must change
    // NOTHING about the walk's visit order, scores, or answer set.
    "sim_knn_graph_search_compacted" -> ((s, d) => {
      val dir = knnLayoutDir(s, d)
      val vecs = ivfBase(s, d)
      // bounded-frame conf scope - see sim_knn_graph_search
      graft.tables.Tables.withShufflePartitions(s, 4)(
        graft.tables.Tables.withAqeOff(s) {
      val probes = vecs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
      def score(cand: DataFrame): DataFrame =
        cand
          .join(vecs.select(col("vec_id").as("cand"), col("v"), col("nrm")), Seq("cand"))
          .join(broadcast(probes), Seq("q_id"))
          .select(col("q_id"), col("cand"),
            round(dot(col("qv"), col("v")) / (col("qn") * col("nrm")), 6).as("cos"))
      val wB = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("cand"))
      var beam = probes.select(col("q_id"), col("q_id").as("cand"))
      var visited: DataFrame = null
      for (_ <- 1 to 3) {
        // bounded collect (≤ KnnBlocks ints): the hop's partition filter
        val blocks = beam
          .select(knnBlkOf(col("cand")).cast("int").as("blk"))
          .distinct().collect().map(_.getInt(0)).sorted
        val adj = s.read.parquet(dir)
          .filter(col("blk").isin(blocks.map(Integer.valueOf): _*))
          .select(col("vec_id").as("cand"), col("nbr"))
        val expand = beam.join(adj, Seq("cand"))
          .select(col("q_id"), col("nbr").as("cand"))
          .filter(col("cand") =!= col("q_id"))
          .distinct()
        val scored = score(expand)
        // per-round lineage truncation (the bfsFrom discipline): beam_t
        // references visited_t and expand_{t+1} references beam_t, so an
        // untruncated visited doubles its plan every round (2^rounds
        // replays of the scoring subplan)
        visited = SessionCaches.loopCheckpoint(
          if (visited == null) scored
          else visited.unionByName(scored).distinct())
        beam = visited.withColumn("r", row_number().over(wB)).filter(col("r") <= 8)
          .select(col("q_id"), col("cand"))
      }
      visited.withColumn("rank", row_number().over(wB)).filter(col("rank") <= 5)
        .select(col("q_id"), col("cand").as("vec_id"), col("cos"),
          col("rank").cast("int").as("rank"))
      })
    }),
  )

  /** Neighbors kept per node, md5 init blocks, and expansion rounds of the
    * NN-Descent build — shared between the Spark side and the generated
    * oracle so the two can never drift.
    */
  private val KnnK = 8
  private val KnnBlocks = 16
  private val KnnIters = 4

  /** Same-label shortcut edges kept per node and the label-scoped salted
    * block count of the STITCHED label-aware build — shared with the
    * generated oracle (the KnnK/KnnBlocks convention).
    */
  private val LblK = 4
  private val LblBlocks = 4

  /** The layout's block-routing hash — the b1 init-block formula, shared
    * by the layout writer, the fragmentation poll, and the compacted
    * walk's per-hop partition filter so the three can never disagree on
    * where a node's adjacency lives.
    */
  private[graft] def knnBlkOf(c: Column): Column =
    conv(substring(md5(concat(lit("b1"), c.cast("string"))), 1, 15), 16, 10)
      .cast("long") % KnnBlocks

  /** Stage-once serving layout for the FINAL kNN adjacency: one file per
    * block under partitionBy(blk), keyed by the data dir's content stamp
    * (an in-place regeneration re-stages — the SessionFrameCache rule)
    * and committed via [[graft.ops.Multimodal.stageOnce]]'s atomic-rename
    * protocol so a concurrent reader never observes a half-written
    * layout. This is the ingest artifact sim_knn_graph_layout
    * inventories; the compacted walk serves from it across queries and
    * JVMs without rebuilding.
    */
  private[graft] def knnLayoutDir(s: SparkSession, d: String): String = {
    val stamp = ContentStamp.of(d)
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d|$stamp".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    graft.ops.Multimodal.stageOnce(
      s"${sys.props("java.io.tmpdir")}/graft_knn_layout_$key") { tmp =>
      knnFinalGraphShared(s, d)
        .select(col("vec_id"), col("nbr"), knnBlkOf(col("vec_id")).as("blk"))
        .repartition(col("blk"))
        .write.mode("overwrite").partitionBy("blk").parquet(tmp)
    }
  }

  /** Exact-cosine re-rank of a candidate edge set to top-K per node —
    * the primitive both the init and every NN-Descent round apply. Two
    * keyed joins onto the vector table, one per-node window on the
    * 6dp-rounded cosine with nbr tiebreak (the oracle's exact tie rule).
    */
  private def knnRank(cand: DataFrame, vecs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("nbr"))
    cand
      .join(vecs.select(col("vec_id"), col("v"), col("nrm")), Seq("vec_id"))
      .join(vecs.select(col("vec_id").as("nbr"), col("v").as("nv"),
        col("nrm").as("nn")), Seq("nbr"))
      .select(col("vec_id"), col("nbr"),
        round(dot(col("v"), col("nv")) / (col("nrm") * col("nn")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= KnnK)
  }

  /** Session-scoped cache of the FULL NN-Descent iteration history —
    * (iter, vec_id, nbr, rank, cos) for iter ∈ 0..KnnIters. The final
    * graph query and the convergence curve both read it; without the
    * cache each would re-run every expansion round. Builds only from the
    * raw embeddings scan (no parent shared frame — no lock-order
    * obligations).
    */
  private val sharedKnnGraph = new SessionFrameCache(4, "sharedKnnGraph")
  def knnGraphShared(s: SparkSession, d: String): DataFrame =
    sharedKnnGraph.getOrBuild(s, d)(nnDescentHistory(s, ivfBase(s, d)))

  /** The FINAL-round graph — the history filtered to iter == KnnIters,
    * materialized once for the 13 serving/search/maintenance consumers.
    * Under the r13 truncated-view cache a consumer-side filter re-scans
    * the whole 5-round history leaf per hop read (the InMemoryRelation's
    * batch-stat pruning that used to skip non-final batches is gone with
    * the IMR); this K-bounded frame restores — and beats — that pruning.
    */
  private val sharedKnnFinal = new SessionFrameCache(4, "sharedKnnFinal")
  def knnFinalGraphShared(s: SparkSession, d: String): DataFrame = {
    // parent materialized OUTSIDE this cache's monitor (lock discipline)
    val hist = knnGraphShared(s, d)
    sharedKnnFinal.getOrBuild(s, d)(hist.filter(col("iter") === KnnIters))
  }

  /** The STITCHED label-aware graph — the Filtered-DiskANN remedy
    * (Gollapudi et al., WWW 2023, the StitchedVamana variant) for the
    * measured dead-end finding of `sim_knn_graph_search_filtered`: on the
    * label-blind graph the filtered walk strands 6/10 probes with no
    * same-label neighbor to step to (pre 0.16 < vis 0.34). The stitch is
    * the blind graph UNION per-node same-label shortcut edges: each node's
    * top-[[LblK]] exact-cosine neighbors among LABEL-SCOPED salted-block
    * candidates — the NN-Descent init discipline applied within each
    * label (two md5 salts so no block is an island), so build cost stays
    * blocked-brute-force bounded at any corpus size and the whole stitch
    * is one label+block equi-join, never a per-label cartesian. Session
    * shared: the build inventory and the labeled search both read it.
    */
  private val sharedLabeledGraph = new SessionFrameCache(4, "knnLabeledGraph")
  def knnLabeledGraphShared(s: SparkSession, d: String): DataFrame = {
    // parent materialized OUTSIDE this cache's monitor (lock discipline)
    knnGraphShared(s, d)
    sharedLabeledGraph.getOrBuild(s, d) {
      val base = fanOut(embeddings(s, d), s)
        .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
        .withColumn("nrm", sqrt(dot(col("v"), col("v"))))
      def blkOf(salt: String): Column =
        conv(substring(md5(concat(lit(salt), col("vec_id").cast("string"))), 1, 15),
          16, 10).cast("long") % LblBlocks
      val blk = base.select(col("vec_id"), col("label"),
        blkOf("lb1").as("b1"), blkOf("lb2").as("b2"))
      def pairs(bc: String): DataFrame =
        blk.select(col("label"), col(bc).as("bb"), col("vec_id"))
          .join(blk.select(col("label"), col(bc).as("bb"), col("vec_id").as("nbr")),
            Seq("label", "bb"))
          .filter(col("vec_id") =!= col("nbr"))
          .select(col("vec_id"), col("nbr"))
      val cand = pairs("b1").union(pairs("b2")).distinct()
      val wS = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("nbr"))
      val shortcuts = cand
        .join(base.select(col("vec_id"), col("v"), col("nrm")), Seq("vec_id"))
        .join(base.select(col("vec_id").as("nbr"), col("v").as("nv"),
          col("nrm").as("nn")), Seq("nbr"))
        .select(col("vec_id"), col("nbr"),
          round(dot(col("v"), col("nv")) / (col("nrm") * col("nn")), 6).as("cos"))
        .withColumn("rk", row_number().over(wS)).filter(col("rk") <= LblK)
        .select(col("vec_id"), col("nbr"))
      knnFinalGraphShared(s, d)
        .select(col("vec_id"), col("nbr"))
        .unionByName(shortcuts).distinct()
    }
  }

  /** The append-batch membership predicate of the incremental-maintenance
    * pair: ~1/8 of the corpus by a salted md5 bucket of vec_id — shared
    * verbatim with the DuckDB oracle, so both engines split identically.
    * The base graph is built WITHOUT these vectors; the incremental query
    * then inserts them and repairs the affected neighborhoods.
    */
  private def knnBatchPred =
    conv(substring(md5(concat(lit("inc"), col("vec_id").cast("string"))), 1, 15),
      16, 10).cast("long") % 8L === 0L

  /** Session-scoped cache of the BASE-corpus NN-Descent graph (final
    * round only) — the "index that already exists" the incremental
    * insert starts from, exactly like the staged IVF-PQ layout
    * `sim_ivfpq_recompaction` appends into.
    */
  private val sharedKnnBase = new SessionFrameCache(4, "sharedKnnBase")
  def knnBaseGraphShared(s: SparkSession, d: String): DataFrame =
    sharedKnnBase.getOrBuild(s, d) {
      nnDescentHistory(s, ivfBase(s, d).filter(!knnBatchPred))
        .filter(col("iter") === KnnIters)
        .select(col("vec_id"), col("nbr"), col("rank"), col("cos"))
    }

  /** The three-step incremental insert of the batch vectors into the
    * base graph — extracted so `sim_knn_graph_incremental` (the oracled
    * maintenance job, uncached: its benched cost IS the insert) and the
    * session-shared maintained graph [[knnIncGraphShared]] (what the
    * serving reads) run the identical steps. Returns (maintained graph
    * edges, affected base-node ids).
    */
  private def knnIncInsert(s: SparkSession, d: String,
      checkpoint: DataFrame => DataFrame): (DataFrame, DataFrame) = {
    val vecs = ivfBase(s, d)
    val base = knnBaseGraphShared(s, d).select(col("vec_id"), col("nbr"))
    // (1) new-node seeds: in-block mates under both salts, current corpus
    def seedPairs(salt: String): DataFrame = {
      val b = vecs.select(col("vec_id"),
        (conv(substring(md5(concat(lit(salt), col("vec_id").cast("string"))), 1, 15),
          16, 10).cast("long") % KnnBlocks).as("blk"))
      b.filter(knnBatchPred).select(col("vec_id"), col("blk"))
        .join(b.select(col("vec_id").as("nbr"), col("blk")), Seq("blk"))
        .filter(col("vec_id") =!= col("nbr"))
        .select(col("vec_id"), col("nbr"))
    }
    // Each step below is referenced several times by the next step and by
    // the consuming query (n1 appears in hop/aff/affCand/ginc; ginc and aff
    // each 3-4× in the cohort readout), so without truncation the final
    // logical plan nests the whole chain multiplicatively — measured r13:
    // a 20k-line / 1594-Exchange plan the driver re-analyzed per action.
    // LAZY checkpoints keep the insert's cost inside the caller's own
    // timed action while collapsing every re-reference to a LogicalRDD
    // leaf. The truncation's LIFECYCLE is the caller's to choose
    // (`checkpoint`): the per-invocation oracle query passes the BFS-idiom
    // loopCheckpoint (Bench/Verify free the blocks after each query);
    // the session-shared build passes the knn-lifecycle checkpoint —
    // nothing session-cached may derive from per-query loop frames, or a
    // post-release recompute (LRU eviction, stale stamp) walks freed
    // localCheckpoint RDDs and dies with checkpoint-block-not-found.
    val n0 = checkpoint(
      knnRank(seedPairs("b1").union(seedPairs("b2")).distinct(), vecs)
        .select(col("vec_id"), col("nbr")))
    // (2) one search hop through the base graph + re-rank
    val hop = n0
      .join(base.select(col("vec_id").as("nbr"), col("nbr").as("nbr2")), Seq("nbr"))
      .select(col("vec_id"), col("nbr2").as("nbr"))
      .filter(col("vec_id") =!= col("nbr"))
    val n1 = checkpoint(
      knnRank(n0.union(hop).distinct(), vecs)
        .select(col("vec_id"), col("nbr")))
    // (3) affected base neighborhoods: old edges ∪ reverse new edges
    val newIds = vecs.filter(knnBatchPred).select(col("vec_id"))
    val aff = checkpoint(
      n1.select(col("nbr").as("vec_id")).distinct()
        .join(newIds, Seq("vec_id"), "left_anti"))
    val affCand = base.join(aff, Seq("vec_id"))
      .union(n1.select(col("nbr").as("vec_id"), col("vec_id").as("nbr"))
        .join(aff, Seq("vec_id")))
      .distinct()
    val ga = checkpoint(knnRank(affCand, vecs).select(col("vec_id"), col("nbr")))
    val ginc = base.join(aff, Seq("vec_id"), "left_anti")
      .unionByName(ga).unionByName(n1)
    (ginc, aff)
  }

  /** Session-scoped cache of the MAINTAINED graph — the edge list the
    * incremental insert leaves behind, i.e. the index state a serving
    * tier actually reads between rebuilds. The serve-path comparison
    * starts here; `sim_knn_graph_incremental` itself stays uncached (it
    * IS the oracled maintenance job, the ccLabelsShared convention).
    */
  private val sharedKnnInc = new SessionFrameCache(4, "sharedKnnInc")
  def knnIncGraphShared(s: SparkSession, d: String): DataFrame = {
    // parents materialized OUTSIDE this cache's monitor (lock discipline)
    knnBaseGraphShared(s, d)
    // the shared build's truncation frames live under the KNN lifecycle
    // (freed in releaseKnnGraph with the cached frame), NEVER the
    // per-query loop registry: Bench/Verify free loop blocks after every
    // query, and a later eviction/stale-stamp recompute of this cached
    // frame would walk the freed checkpoint RDDs
    sharedKnnInc.getOrBuild(s, d)(knnIncInsert(s, d, knnLifecycleCheckpoint(s))._1)
  }

  /** Lazy lineage truncation whose blocks are registered under the KNN
    * session lifecycle ([[liveKnnCheckpoints]], freed in
    * [[releaseKnnGraph]]) — for truncation INSIDE session-shared builds,
    * where the per-query loop registry would free blocks the cached
    * frame's recompute path still needs.
    */
  private def knnLifecycleCheckpoint(s: SparkSession)(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint(false)
    liveKnnCheckpoints.synchronized {
      liveKnnCheckpoints.getOrElseUpdate(s, scala.collection.mutable.Set.empty[Int]) ++=
        SessionCaches.checkpointRddIds(out)
    }
    out
  }

  /** One full NN-Descent history build over `vecs` — shared by the
    * full-corpus frame and the base-only frame. Returns the checkpointed
    * union (iter, vec_id, nbr, rank, cos), iter ∈ 0..KnnIters.
    */
  private def nnDescentHistory(s: SparkSession, vecs: DataFrame): DataFrame = {
      // TWO differently-salted block assignments: a single partition would
      // trap the whole build — neighbors, reverse neighbors, and two-hop
      // expansions of a one-block init all stay inside the init block, so
      // no round can ever cross it (measured: recall flat over rounds).
      // Overlapping a second salted partition makes every node a bridge
      // between two blocks, and the two-hop closure then mixes globally.
      def blkPairs(salt: String): DataFrame = {
        val b = vecs.select(col("vec_id"),
          (conv(substring(md5(concat(lit(salt), col("vec_id").cast("string"))), 1, 15),
            16, 10).cast("long") % KnnBlocks).as("blk"))
        b.join(b.withColumnRenamed("vec_id", "nbr"), Seq("blk"))
          .filter(col("vec_id") =!= col("nbr"))
          .select(col("vec_id"), col("nbr"))
      }
      val init = blkPairs("b1").union(blkPairs("b2")).distinct()
      // Each round references the previous graph THREE times (forward,
      // reverse, two-hop). persist() alone is NOT enough: the LOGICAL plan
      // still nests three copies of the prior round's plan, so by round t
      // the analyzer/canonicalizer walks 3^t nodes — measured 44 s to
      // "scan" an already-cached 4000-row result, all of it planning. The
      // connectedComponents discipline applies: localCheckpoint per round
      // truncates the plan to a constant-size LogicalRDD, and the round
      // blocks are freed deterministically once the unioned history has
      // materialized (after which, per the CC contract, the rounds cannot
      // be re-executed — only the cached union is ever read again). Each
      // frame's checkpoint ids are read off its OWN plan
      // ([[SessionCaches.checkpointRddIds]]), so a concurrent build
      // persisting blocks during this window is never swept.
      val rounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      var g = knnRank(init, vecs).withColumn("iter", lit(0)).localCheckpoint(true)
      rounds += g
      for (t <- 1 to KnnIters) {
        val edges = g.select(col("vec_id"), col("nbr"))
        val rev = edges.select(col("nbr").as("vec_id"), col("vec_id").as("nbr"))
        val hop = edges
          .join(edges.select(col("vec_id").as("nbr"), col("nbr").as("nbr2")), Seq("nbr"))
          .select(col("vec_id"), col("nbr2").as("nbr"))
          .filter(col("vec_id") =!= col("nbr"))
        val cand = edges.union(rev).union(hop).distinct()
        g = knnRank(cand, vecs).withColumn("iter", lit(t)).localCheckpoint(true)
        rounds += g
      }
      // the unioned history checkpoints too, so it owns its own blocks and
      // never re-reads a round frame; only then can the rounds be freed
      // (peak storage: the rounds plus one union of them, all K-bounded)
      val acc = rounds.reduce(_ unionByName _).localCheckpoint(true)
      val live = s.sparkContext.getPersistentRDDs
      rounds.flatMap(SessionCaches.checkpointRddIds).foreach(id =>
        live.get(id).foreach(_.unpersist(blocking = false)))
      // the history's own checkpoint blocks are registered for the
      // deterministic release path (the CC liveCcCheckpoints discipline —
      // SharedCacheLifecycleSpec's zero-persisted-blocks contract)
      liveKnnCheckpoints.synchronized {
        liveKnnCheckpoints.getOrElseUpdate(s, scala.collection.mutable.Set.empty[Int]) ++=
          SessionCaches.checkpointRddIds(acc)
      }
      acc
  }

  private val liveKnnCheckpoints =
    new scala.collection.mutable.WeakHashMap[SparkSession, scala.collection.mutable.Set[Int]]()

  /** Unpersist and drop the shared NN-Descent iteration frames of `s`,
    * including the history's localCheckpoint blocks (a released history
    * cannot be re-executed — checkpoint lineage is truncated).
    */
  def releaseKnnGraph(s: SparkSession): Unit = {
    sharedLabeledGraph.release(s) // derives from the full graph: derived first
    sharedKnnInc.release(s) // derives from the base graph: derived first
    sharedKnnFinal.release(s) // derives from the history: derived first
    sharedKnnGraph.release(s)
    sharedKnnBase.release(s)
    liveKnnCheckpoints.synchronized {
      liveKnnCheckpoints.remove(s).foreach { ids =>
        val live = s.sparkContext.getPersistentRDDs
        ids.foreach(id => live.get(id).foreach(_.unpersist(blocking = false)))
      }
    }
  }

  /** Canonical DuckDB SQL for the brute-force cosine top-5 — single source
    * for sim_cosine_topk AND the neighbor set of sim_knn_label.
    */
  private val cosineTopkSql: String = """
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      p AS (SELECT vec_id AS q_id, v AS qv FROM c WHERE vec_id < 10),
      scored AS (
        SELECT q_id, vec_id,
               round(list_dot_product(qv, v)
                 / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v, v))), 6) AS cos
        FROM c CROSS JOIN p WHERE vec_id <> q_id)
      SELECT q_id, vec_id, cos,
             CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
      FROM scored
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) <= 5"""

  /** Canonical DuckDB SQL for the IVF top-5 — single source for
    * sim_ivf_topk AND the approximate side of sim_ivf_recall.
    */
  private val kmeansSql: String = """
      WITH c AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings),
      cents AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM c WHERE vec_id < 8),
      assigned AS (
        SELECT vec_id, v, c_id FROM (
          SELECT a.vec_id, a.v, cents.c_id,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_dot_product(a.v, cv) / (a.nrm * cn), 6) DESC, c_id) AS crank
          FROM c a CROSS JOIN cents) WHERE crank = 1),
      ex AS (
        SELECT c_id, i - 1 AS dim, v[i] AS x
        FROM assigned, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r)
      SELECT c_id, dim, count(*) AS n_members,
             round(sum(CAST(round(x * 1000000) AS BIGINT)) / count(*) / 1e6, 6) AS mean_x
      FROM ex GROUP BY c_id, dim"""

  private val ivfTopkSql: String = """
      WITH c AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings),
      cents AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM c WHERE vec_id < 16),
      assigned AS (
        SELECT vec_id, v, nrm, c_id FROM (
          SELECT a.vec_id, a.v, a.nrm, cents.c_id,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_dot_product(a.v, cv) / (a.nrm * cn), 6) DESC, c_id) AS crank
          FROM c a CROSS JOIN cents) WHERE crank = 1),
      probes AS (
        SELECT vec_id AS q_id, v AS qv, nrm AS qn, c_id FROM (
          SELECT a.vec_id, a.v, a.nrm, cents.c_id,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_dot_product(a.v, cv) / (a.nrm * cn), 6) DESC, c_id) AS crank
          FROM c a CROSS JOIN cents WHERE a.vec_id < 10) WHERE crank <= 2),
      scored AS (
        SELECT q_id, s.vec_id,
               round(list_dot_product(qv, s.v) / (qn * s.nrm), 6) AS cos
        FROM assigned s JOIN probes p ON s.c_id = p.c_id
        WHERE s.vec_id <> p.q_id)
      SELECT q_id, vec_id, cos,
             CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
      FROM scored
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) <= 5"""

  /** Canonical DuckDB CTE chain replaying the PQ pipeline (seed assignment
    * → one Lloyd update → encode → per-pair ADC distances) in the same
    * exact integer arithmetic — shared prefix of pqAdcSql (top-5) and
    * pqRerankSql (top-50 shortlist → exact re-rank).
    */
  private val pqAdcCtes: String = """
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      xu AS (SELECT vec_id, (i - 1) // 8 AS sb, (i - 1) % 8 AS wd,
                    CAST(round(v[i] * 1000000) AS BIGINT) AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      seeds AS (SELECT vec_id AS c_id, sb, wd, xu AS cu FROM xu WHERE vec_id < 16),
      a1d AS (SELECT x.vec_id, x.sb, s.c_id,
                     sum((x.xu - s.cu) * (x.xu - s.cu)) AS d2
              FROM xu x JOIN seeds s ON x.sb = s.sb AND x.wd = s.wd
              GROUP BY 1, 2, 3),
      a1 AS (SELECT vec_id, sb, c_id FROM a1d
             QUALIFY row_number() OVER (PARTITION BY vec_id, sb ORDER BY d2, c_id) = 1),
      cents AS (SELECT x.sb, a.c_id, x.wd,
                       CAST(round(CAST(sum(x.xu) AS DOUBLE) / count(*)) AS BIGINT) AS cu
                FROM a1 a JOIN xu x ON a.vec_id = x.vec_id AND a.sb = x.sb
                GROUP BY 1, 2, 3),
      cd AS (SELECT x.vec_id, x.sb, k.c_id,
                    sum((x.xu - k.cu) * (x.xu - k.cu)) AS d2
             FROM xu x JOIN cents k ON x.sb = k.sb AND x.wd = k.wd
             GROUP BY 1, 2, 3),
      codes AS (SELECT vec_id, sb, c_id FROM cd
                QUALIFY row_number() OVER (PARTITION BY vec_id, sb ORDER BY d2, c_id) = 1),
      lut AS (SELECT vec_id AS q_id, sb, c_id, d2 FROM cd WHERE vec_id < 10),
      adc AS (SELECT l.q_id, cds.vec_id, CAST(sum(l.d2) AS BIGINT) AS adc_u
              FROM codes cds JOIN lut l ON cds.sb = l.sb AND cds.c_id = l.c_id
              WHERE cds.vec_id <> l.q_id
              GROUP BY 1, 2)"""

  /** Unrolled 4-round Lloyd replay for sim_pq_train_curve: per round one
    * distance table serves BOTH that round's error total and the next
    * round's re-assignment — the same double duty the Spark plan's shared
    * scan does. Static (seeds are vec_id<16, structure data-independent).
    */
  private val pqTrainCurveSql: String = {
    def dist(cents: String, out: String) = s""",
      $out AS (SELECT x.vec_id, x.sb, k.c_id,
                      sum((x.xu - k.cu) * (x.xu - k.cu)) AS d2
               FROM xu x JOIN $cents k ON x.sb = k.sb AND x.wd = k.wd
               GROUP BY 1, 2, 3)"""
    def update(assign: String, out: String) = s""",
      $out AS (SELECT x.sb, a.c_id, x.wd,
                      CAST(round(CAST(sum(x.xu) AS DOUBLE) / count(*))
                        AS BIGINT) AS cu
               FROM $assign a JOIN xu x
                 ON a.vec_id = x.vec_id AND a.sb = x.sb
               GROUP BY 1, 2, 3)"""
    def argmin(d: String, out: String) = s""",
      $out AS (SELECT vec_id, sb, c_id FROM $d
               QUALIFY row_number() OVER (PARTITION BY vec_id, sb
                 ORDER BY d2, c_id) = 1)"""
    def tot(d: String, out: String) = s""",
      $out AS (SELECT CAST(sum(d2) AS BIGINT) AS t FROM (
                 SELECT d2 FROM $d
                 QUALIFY row_number() OVER (PARTITION BY vec_id, sb
                   ORDER BY d2, c_id) = 1))"""
    val rounds = (1 to 4).map { k =>
      val in = if (k == 1) {
        // round 1: assign to seeds, update → c1
        argmin("a1d", "a1") + update("a1", "c1")
      } else {
        // round k: re-assign to c(k-1)'s distance table, update → ck
        argmin(s"dist${k - 1}", s"a$k") + update(s"a$k", s"c$k")
      }
      in + dist(s"c$k", s"dist$k") + tot(s"dist$k", s"t$k")
    }.mkString
    val outs = (1 to 4).map { k =>
      s"""
      SELECT CAST($k AS INTEGER) AS iter, t$k.t AS total_qerr_u,
             round(CAST(t$k.t AS DOUBLE) / n.n / 64.0
               / 1000000000000.0, 6) AS mse
      FROM t$k, n"""
    }.mkString("\n      UNION ALL")
    s"""
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
      xu AS (SELECT vec_id, (i - 1) // 8 AS sb, (i - 1) % 8 AS wd,
                    CAST(round(v[i] * 1000000) AS BIGINT) AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      seeds AS (SELECT vec_id AS c_id, sb, wd, xu AS cu FROM xu WHERE vec_id < 16),
      a1d AS (SELECT x.vec_id, x.sb, s.c_id,
                     sum((x.xu - s.cu) * (x.xu - s.cu)) AS d2
              FROM xu x JOIN seeds s ON x.sb = s.sb AND x.wd = s.wd
              GROUP BY 1, 2, 3)$rounds
      $outs"""
  }

  /** Static replay of sim_pq_seed_audit: both seedings (fixture ids vs
    * md5-ranked sample), one Lloyd update each, exact min-d2 totals.
    */
  private val pqSeedAuditSql: String = {
    def chain(seeds: String, sfx: String) = s""",
      a1d_$sfx AS (SELECT x.vec_id, x.sb, s.c_id,
                          sum((x.xu - s.cu) * (x.xu - s.cu)) AS d2
                   FROM xu x JOIN $seeds s ON x.sb = s.sb AND x.wd = s.wd
                   GROUP BY 1, 2, 3),
      a1_$sfx AS (SELECT vec_id, sb, c_id FROM a1d_$sfx
                  QUALIFY row_number() OVER (PARTITION BY vec_id, sb
                    ORDER BY d2, c_id) = 1),
      cents_$sfx AS (SELECT x.sb, a.c_id, x.wd,
                            CAST(round(CAST(sum(x.xu) AS DOUBLE) / count(*))
                              AS BIGINT) AS cu
                     FROM a1_$sfx a JOIN xu x
                       ON a.vec_id = x.vec_id AND a.sb = x.sb
                     GROUP BY 1, 2, 3),
      cd_$sfx AS (SELECT x.vec_id, x.sb, k.c_id,
                         sum((x.xu - k.cu) * (x.xu - k.cu)) AS d2
                  FROM xu x JOIN cents_$sfx k
                    ON x.sb = k.sb AND x.wd = k.wd
                  GROUP BY 1, 2, 3),
      t_$sfx AS (SELECT CAST(sum(d2) AS BIGINT) AS t FROM (
                   SELECT d2 FROM cd_$sfx
                   QUALIFY row_number() OVER (PARTITION BY vec_id, sb
                     ORDER BY d2, c_id) = 1))"""
    def out(sfx: String, scheme: String) = s"""
      SELECT '$scheme' AS scheme, t_$sfx.t AS total_qerr_u,
             round(CAST(t_$sfx.t AS DOUBLE) / n.n / 64.0
               / 1000000000000.0, 6) AS mse
      FROM t_$sfx, n"""
    s"""
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
      xu AS (SELECT vec_id, (i - 1) // 8 AS sb, (i - 1) % 8 AS wd,
                    CAST(round(v[i] * 1000000) AS BIGINT) AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      seeds_fix AS (SELECT vec_id AS c_id, sb, wd, xu AS cu
                    FROM xu WHERE vec_id < 16),
      sel AS (SELECT vec_id FROM c
              ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
      seeds_md5 AS (SELECT x.vec_id AS c_id, x.sb, x.wd, x.xu AS cu
                    FROM xu x JOIN sel ON x.vec_id = sel.vec_id)${chain("seeds_fix", "fix")}${chain("seeds_md5", "m5")}
      ${out("fix", "fixture")}
      UNION ALL${out("m5", "md5")}"""
  }

  /** DuckDB SQL for stream_pq_encode: the raw-space code table from the
    * same static train/encode replay the ADC oracles share — the streamed
    * per-row encode must land on the identical (vec_id, sub, c_id) set.
    */
  private[graft] val pqStreamCodesSql: String = pqAdcCtes + """
      SELECT vec_id, sb AS sub, c_id FROM codes"""

  /** DuckDB SQL for stream_ivfpq_index: the full streaming index row —
    * coarse cell (argmin over the 16 raw seed vectors, ties to the lower
    * cell — the batch ivfpqCellsShared rule) joined with the PQ codes,
    * all independently re-derived from raw parquet.
    */
  private val cellAsnCtes: String = """,
      cseed AS (SELECT vec_id AS cell, sb, wd, xu AS cu FROM xu WHERE vec_id < 16),
      cd2 AS (SELECT x.vec_id, s.cell, sum((x.xu - s.cu) * (x.xu - s.cu)) AS d2
              FROM xu x JOIN cseed s ON x.sb = s.sb AND x.wd = s.wd
              GROUP BY 1, 2),
      cellasn AS (SELECT vec_id, cell FROM cd2
                  QUALIFY row_number() OVER (PARTITION BY vec_id
                    ORDER BY d2, cell) = 1)"""

  private[graft] val ivfpqStreamIndexSql: String = pqAdcCtes + cellAsnCtes + """
      SELECT cds.vec_id, a.cell, cds.sb AS sub, cds.c_id
      FROM codes cds JOIN cellasn a ON cds.vec_id = a.vec_id"""

  /** DuckDB SQL for sim_ivfpq_scan_cost: probe cell ranks off the same
    * cd2 distance table, list sizes off the same cellasn assignment, the
    * nprobe legs a VALUES cross join — the lists-opened / codes-scanned
    * cost table per nprobe.
    */
  private val ivfpqScanCostSql: String = pqAdcCtes + cellAsnCtes + """,
      spr AS (SELECT vec_id AS q_id, cell,
                     row_number() OVER (PARTITION BY vec_id
                       ORDER BY d2, cell) AS pr
              FROM cd2 WHERE vec_id < 10),
      ssz AS (SELECT cell, count(*) AS n_vec FROM cellasn GROUP BY cell),
      snn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM c),
      snq AS (SELECT CAST(count(DISTINCT q_id) AS BIGINT) AS nq FROM spr),
      snp(np) AS (VALUES (1), (2), (4), (8)),
      slegs AS (SELECT np, q_id, n_vec FROM spr JOIN ssz USING (cell)
                CROSS JOIN snp WHERE pr <= np)
      SELECT np AS nprobe, CAST(count(*) AS BIGINT) AS cells_touched,
             CAST(8 * sum(n_vec) AS BIGINT) AS codes_scanned,
             round(CAST(sum(n_vec) AS DOUBLE) / snn.n / snq.nq, 6)
               AS scanned_frac
      FROM slegs, snn, snq
      GROUP BY 1, snn.n, snq.nq"""

  /** DuckDB SQL for sim_ivfpq_frag_trigger: the EXPECTED list/file
    * counts after each mod-4 append, derived logically — files after
    * batch k = distinct (cell, batch≤k) pairs, because each append
    * writes exactly one file per touched list.
    */
  private val ivfpqFragTriggerSql: String = pqAdcCtes + cellAsnCtes + """,
      fb AS (SELECT DISTINCT cell, vec_id % 4 AS b FROM cellasn),
      fk(k) AS (VALUES (0), (1), (2), (3))
      SELECT CAST(k AS INTEGER) AS batch,
             CAST(count(DISTINCT cell) AS BIGINT) AS n_lists,
             CAST(count(*) AS BIGINT) AS n_files,
             count(*) > 2 * count(DISTINCT cell) AS merge_due
      FROM fk JOIN fb ON fb.b <= fk.k
      GROUP BY 1"""

  /** DuckDB SQL for sim_ivfpq_compaction: the per-cell inventory of the
    * compacted inverted-list layout — the physical round-trip (write
    * partitionBy(cell), read back, aggregate) must lose nothing vs the
    * logical index table DuckDB re-derives from raw parquet.
    */
  private[graft] val ivfpqCompactionSql: String = pqAdcCtes + cellAsnCtes + """
      SELECT a.cell,
             CAST(count(DISTINCT cds.vec_id) AS BIGINT) AS n_vectors,
             CAST(count(*) AS BIGINT) AS n_codes
      FROM codes cds JOIN cellasn a ON cds.vec_id = a.vec_id
      GROUP BY 1"""

  /** The forget-set predicate shared verbatim with [[forgetPred]]. */
  private val forgetSqlPred =
    "('0x' || substr(md5('fgt' || vec_id::VARCHAR), 1, 15))::BIGINT % 50 = 0"

  /** One serve leg of the erasure-serving oracle: candidates → ADC →
    * top-50 shortlist → exact re-rank → per-probe top-5 checksum. Two
    * instantiations (tombstone-filtered, physically purged) must agree —
    * the equivalence the query's `agree` flag pins.
    */
  private def forgetServeLeg(pfx: String, candSql: String): String = s"""
      ${pfx}cand AS ($candSql),
      ${pfx}adc AS (SELECT ca.q_id, ca.vec_id, CAST(sum(l.d2) AS BIGINT) AS adc_u
               FROM ${pfx}cand ca JOIN codes cds ON cds.vec_id = ca.vec_id
               JOIN lut l ON l.q_id = ca.q_id AND l.sb = cds.sb AND l.c_id = cds.c_id
               GROUP BY 1, 2),
      ${pfx}short AS (SELECT q_id, vec_id FROM ${pfx}adc
                 QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY adc_u, vec_id) <= 50),
      ${pfx}ex AS (SELECT sh.q_id, sh.vec_id,
                     CAST(sum((p.xu - b.xu) * (p.xu - b.xu)) AS BIGINT) AS d2
              FROM ${pfx}short sh JOIN xu p ON p.vec_id = sh.q_id
              JOIN xu b ON b.vec_id = sh.vec_id AND b.sb = p.sb AND b.wd = p.wd
              GROUP BY 1, 2),
      ${pfx}top AS (SELECT q_id, CAST(sum(vec_id) AS BIGINT) AS s5,
                       count(*) AS n5
               FROM (SELECT q_id, vec_id FROM ${pfx}ex
                     QUALIFY row_number() OVER (PARTITION BY q_id
                       ORDER BY d2, vec_id) <= 5)
               GROUP BY 1)"""

  /** ADC top-5: the codes-only ranking sim_pq_adc returns. */
  private val pqAdcSql: String = pqAdcCtes + """
      SELECT q_id, vec_id,
             round(CAST(adc_u AS DOUBLE) / 1000000000000.0, 6) AS adc_d2,
             CAST(row_number() OVER (PARTITION BY q_id ORDER BY adc_u, vec_id) AS INTEGER) AS rank
      FROM adc
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY adc_u, vec_id) <= 5"""

  /** The shared (c, vu) prefix of the quantization-ladder legs: per-dim
    * integer micro-unit coordinates of every vector.
    */
  private val quantVuCtes: String = """
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      vu AS (SELECT vec_id, i - 1 AS dim, CAST(round(v[i] * 1000000) AS BIGINT) AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r)"""

  /** Exact integer-L2² top-5 per probe — the SQL twin of [[pqExactTop5]],
    * the baseline every ladder rung scores against.
    */
  private val intExactTop5Sql: String = quantVuCtes + """,
      ex AS (SELECT p.vec_id AS q_id, b.vec_id,
                    sum((p.xu - b.xu) * (p.xu - b.xu)) AS d2
             FROM vu p JOIN vu b ON p.dim = b.dim
             WHERE p.vec_id < 10 AND b.vec_id <> p.vec_id
             GROUP BY 1, 2)
      SELECT q_id, vec_id FROM ex
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) <= 5"""

  /** SQ8 top-5 per probe — the SQL twin of [[sq8Top5]]: emb_quantize_int8's
    * exact integer quantization rule, integer L2² over the codes.
    */
  private val sq8Top5Sql: String = quantVuCtes + """,
      sc AS (SELECT dim, max(abs(xu)) AS m FROM vu GROUP BY dim),
      q AS (SELECT vec_id, vu.dim,
                   CASE WHEN m = 0 THEN 0
                        ELSE CAST(sign(xu) AS BIGINT) * ((abs(xu) * 254 + m) // (2 * m))
                   END AS q8
            FROM vu JOIN sc ON vu.dim = sc.dim),
      ad AS (SELECT p.vec_id AS q_id, b.vec_id,
                    sum((p.q8 - b.q8) * (p.q8 - b.q8)) AS d2
             FROM q p JOIN q b ON p.dim = b.dim
             WHERE p.vec_id < 10 AND b.vec_id <> p.vec_id
             GROUP BY 1, 2)
      SELECT q_id, vec_id FROM ad
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) <= 5"""

  /** Binary-rung top-5 per probe — the SQL twin of [[binaryTop5]]: sign
    * codes as two 32-dim words (bit 63 never set, so popcount semantics
    * can't diverge on sign), Hamming top-50, exact re-rank.
    */
  private val binTop5Sql: String = quantVuCtes + """,
      w AS (SELECT vec_id,
                   bit_or(CASE WHEN xu > 0 AND dim < 32
                               THEN (1::BIGINT << dim) ELSE 0 END) AS lo,
                   bit_or(CASE WHEN xu > 0 AND dim >= 32
                               THEN (1::BIGINT << (dim - 32)) ELSE 0 END) AS hi
            FROM vu GROUP BY 1),
      hm AS (SELECT p.vec_id AS q_id, b.vec_id,
                    bit_count(xor(p.lo, b.lo)) + bit_count(xor(p.hi, b.hi)) AS h
             FROM w p JOIN w b ON b.vec_id <> p.vec_id WHERE p.vec_id < 10),
      sl AS (SELECT q_id, vec_id FROM hm
             QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY h, vec_id) <= 50),
      rr AS (SELECT s.q_id, s.vec_id,
                    sum((p.xu - b.xu) * (p.xu - b.xu)) AS d2
             FROM sl s JOIN vu p ON p.vec_id = s.q_id
                  JOIN vu b ON b.vec_id = s.vec_id AND b.dim = p.dim
             GROUP BY 1, 2)
      SELECT q_id, vec_id FROM rr
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) <= 5"""

  /** Two-stage: ADC top-[[RerankShortlist]] shortlist, exact integer-L2²
    * re-rank to top-5 — the oracle replay of sim_pq_rerank (xu carries
    * per-dim integer coordinates, so the exact leg reuses it keyed on
    * (sb, wd)).
    */
  private val pqRerankSql: String = pqAdcCtes + s""",
      short AS (SELECT q_id, vec_id FROM adc
                QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY adc_u, vec_id) <= $RerankShortlist),
      ex AS (SELECT s.q_id, s.vec_id,
                    CAST(sum((p.xu - b.xu) * (p.xu - b.xu)) AS BIGINT) AS d2
             FROM short s
             JOIN xu p ON p.vec_id = s.q_id
             JOIN xu b ON b.vec_id = s.vec_id AND b.sb = p.sb AND b.wd = p.wd
             GROUP BY 1, 2)
      SELECT q_id, vec_id,
             round(CAST(d2 AS DOUBLE) / 1000000000000.0, 6) AS exact_d2,
             CAST(row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS INTEGER) AS rank
      FROM ex
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) <= 5"""

  /** IVF-PQ oracle tail from a `celld` (vec_id, c16, d2) cell-distance
    * CTE: cells → nprobe=2 probe cells → candidates → candidate-restricted
    * ADC → top-50 shortlist → exact re-rank. Shared by the fixture-cell
    * and Lloyd-trained-cell variants.
    */
  private def ivfpqSqlWith(celldSql: String): String = pqAdcCtes + s""",
      $celldSql,
      cellsv AS (SELECT vec_id, c16 AS cell FROM celld
                 QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, c16) = 1),
      probecells AS (SELECT vec_id AS q_id, c16 AS cell FROM celld
                     WHERE vec_id < 10
                     QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, c16) <= 2),
      candv AS (SELECT p.q_id, cl.vec_id FROM cellsv cl JOIN probecells p ON cl.cell = p.cell
                WHERE cl.vec_id <> p.q_id),
      adcr AS (SELECT ca.q_id, ca.vec_id, CAST(sum(l.d2) AS BIGINT) AS adc_u
               FROM candv ca JOIN codes cds ON cds.vec_id = ca.vec_id
               JOIN lut l ON l.q_id = ca.q_id AND l.sb = cds.sb AND l.c_id = cds.c_id
               GROUP BY 1, 2),
      shortr AS (SELECT q_id, vec_id FROM adcr
                 QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY adc_u, vec_id) <= 50),
      exr AS (SELECT s.q_id, s.vec_id,
                     CAST(sum((p.xu - b.xu) * (p.xu - b.xu)) AS BIGINT) AS d2
              FROM shortr s JOIN xu p ON p.vec_id = s.q_id
              JOIN xu b ON b.vec_id = s.vec_id AND b.sb = p.sb AND b.wd = p.wd
              GROUP BY 1, 2)
      SELECT q_id, vec_id,
             round(CAST(d2 AS DOUBLE) / 1000000000000.0, 6) AS exact_d2,
             CAST(row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS INTEGER) AS rank
      FROM exr
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) <= 5"""

  /** Fixture coarse cells: distances to the 16 seed vectors. */
  private val pqIvfpqSql: String = ivfpqSqlWith("""
      celld AS (SELECT x.vec_id, s16.c16, sum((x.xu - s16.cu) * (x.xu - s16.cu)) AS d2
                FROM xu x JOIN (SELECT vec_id AS c16, sb, wd, xu AS cu
                                FROM xu WHERE vec_id < 16) s16
                  ON x.sb = s16.sb AND x.wd = s16.wd
                GROUP BY 1, 2)""")

  /** Trained coarse cells: one integer-L2 Lloyd step over the seed
    * assignment, per-dim means rounded to micro-units, then distances to
    * the trained centroids.
    */
  private val pqIvfpqTrainedSql: String = ivfpqSqlWith("""
      cd0 AS (SELECT x.vec_id, s16.c16, sum((x.xu - s16.cu) * (x.xu - s16.cu)) AS d2
              FROM xu x JOIN (SELECT vec_id AS c16, sb, wd, xu AS cu
                              FROM xu WHERE vec_id < 16) s16
                ON x.sb = s16.sb AND x.wd = s16.wd
              GROUP BY 1, 2),
      casn AS (SELECT vec_id, c16 FROM cd0
               QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, c16) = 1),
      ctr AS (SELECT a.c16, x.sb, x.wd,
                     CAST(round(CAST(sum(x.xu) AS DOUBLE) / count(*)) AS BIGINT) AS cu
              FROM casn a JOIN xu x ON a.vec_id = x.vec_id GROUP BY 1, 2, 3),
      celld AS (SELECT x.vec_id, t.c16, sum((x.xu - t.cu) * (x.xu - t.cu)) AS d2
                FROM xu x JOIN ctr t ON x.sb = t.sb AND x.wd = t.wd
                GROUP BY 1, 2)""")

  /** Residual IVF-PQ chain ending in `radcr(q_id, vec_id, adc_u)` plus
    * the fixture cells and raw-code CTEs (from pqAdcCtes) — shared by the
    * residual top-k, its recall audit, and the raw-vs-residual code-gain
    * audit. MATERIALIZED on every multiply-referenced stage (the BPE-chain
    * discipline — DuckDB inlines plain CTEs per reference).
    */
  private val pqResidualCtes: String = pqAdcCtes + """,
      celld AS (SELECT x.vec_id, s16.c16, sum((x.xu - s16.cu) * (x.xu - s16.cu)) AS d2
                FROM xu x JOIN (SELECT vec_id AS c16, sb, wd, xu AS cu
                                FROM xu WHERE vec_id < 16) s16
                  ON x.sb = s16.sb AND x.wd = s16.wd
                GROUP BY 1, 2),
      cellsv AS (SELECT vec_id, c16 AS cell FROM celld
                 QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, c16) = 1),
      probecells AS (SELECT vec_id AS q_id, c16 AS cell FROM celld
                     WHERE vec_id < 10
                     QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, c16) <= 2),
      ccu AS (SELECT vec_id AS cell, sb, wd, xu AS ccu FROM xu WHERE vec_id < 16),
      rxu AS MATERIALIZED (SELECT x.vec_id, x.sb, x.wd, x.xu - cc.ccu AS ru
             FROM xu x JOIN cellsv cv ON x.vec_id = cv.vec_id
             JOIN ccu cc ON cc.cell = cv.cell AND cc.sb = x.sb AND cc.wd = x.wd),
      rseeds AS (SELECT vec_id - 16 AS c_id, sb, wd, ru AS cu FROM rxu
                 WHERE vec_id >= 16 AND vec_id < 32),
      ra1d AS (SELECT x.vec_id, x.sb, s.c_id, sum((x.ru - s.cu) * (x.ru - s.cu)) AS d2
               FROM rxu x JOIN rseeds s ON x.sb = s.sb AND x.wd = s.wd
               GROUP BY 1, 2, 3),
      ra1 AS (SELECT vec_id, sb, c_id FROM ra1d
              QUALIFY row_number() OVER (PARTITION BY vec_id, sb ORDER BY d2, c_id) = 1),
      rcents AS MATERIALIZED (SELECT x.sb, a.c_id, x.wd,
                     CAST(round(CAST(sum(x.ru) AS DOUBLE) / count(*)) AS BIGINT) AS cu
              FROM ra1 a JOIN rxu x ON a.vec_id = x.vec_id AND a.sb = x.sb
              GROUP BY 1, 2, 3),
      rcd AS (SELECT x.vec_id, x.sb, k.c_id, sum((x.ru - k.cu) * (x.ru - k.cu)) AS d2
              FROM rxu x JOIN rcents k ON x.sb = k.sb AND x.wd = k.wd
              GROUP BY 1, 2, 3),
      rcodes AS MATERIALIZED (SELECT vec_id, sb, c_id FROM rcd
               QUALIFY row_number() OVER (PARTITION BY vec_id, sb ORDER BY d2, c_id) = 1),
      qres AS (SELECT q.vec_id AS q_id, p.cell, q.sb, q.wd, q.xu - cc.ccu AS qu
               FROM xu q JOIN probecells p ON q.vec_id = p.q_id
               JOIN ccu cc ON cc.cell = p.cell AND cc.sb = q.sb AND cc.wd = q.wd
               WHERE q.vec_id < 10),
      rlut AS MATERIALIZED (SELECT qr.q_id, qr.cell, qr.sb, k.c_id,
                      sum((qr.qu - k.cu) * (qr.qu - k.cu)) AS d2
               FROM qres qr JOIN rcents k ON k.sb = qr.sb AND k.wd = qr.wd
               GROUP BY 1, 2, 3, 4),
      rcandv AS MATERIALIZED (SELECT p.q_id, cv.vec_id, cv.cell FROM cellsv cv
                 JOIN probecells p ON cv.cell = p.cell
                 WHERE cv.vec_id <> p.q_id),
      radcr AS MATERIALIZED (SELECT ca.q_id, ca.vec_id, CAST(sum(l.d2) AS BIGINT) AS adc_u
               FROM rcandv ca JOIN rcodes rc ON rc.vec_id = ca.vec_id
               JOIN rlut l ON l.q_id = ca.q_id AND l.cell = ca.cell
                 AND l.sb = rc.sb AND l.c_id = rc.c_id
               GROUP BY 1, 2)"""

  /** Residual IVF-PQ top-5: radcr → 50-shortlist → exact re-rank. */
  private val pqIvfpqResidualSql: String = pqResidualCtes + """,
      shortr AS (SELECT q_id, vec_id FROM radcr
                 QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY adc_u, vec_id) <= 50),
      exr AS (SELECT s.q_id, s.vec_id,
                     CAST(sum((p.xu - b.xu) * (p.xu - b.xu)) AS BIGINT) AS d2
              FROM shortr s JOIN xu p ON p.vec_id = s.q_id
              JOIN xu b ON b.vec_id = s.vec_id AND b.sb = p.sb AND b.wd = p.wd
              GROUP BY 1, 2)
      SELECT q_id, vec_id,
             round(CAST(d2 AS DOUBLE) / 1000000000000.0, 6) AS exact_d2,
             CAST(row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) AS INTEGER) AS rank
      FROM exr
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) <= 5"""

  /** Raw vs residual codes at shortlist depth 10 — the regime where ADC
    * ordering quality binds.
    */
  private val pqCodeGainSql: String = pqResidualCtes + """,
      rawadcr AS (SELECT ca.q_id, ca.vec_id, CAST(sum(l.d2) AS BIGINT) AS adc_u
                  FROM rcandv ca JOIN codes cds ON cds.vec_id = ca.vec_id
                  JOIN lut l ON l.q_id = ca.q_id AND l.sb = cds.sb AND l.c_id = cds.c_id
                  GROUP BY 1, 2),
      shr AS (SELECT 'raw' AS scheme, q_id, vec_id FROM rawadcr
              QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY adc_u, vec_id) <= 10
              UNION ALL
              SELECT 'residual' AS scheme, q_id, vec_id FROM radcr
              QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY adc_u, vec_id) <= 10),
      shex AS (SELECT s.scheme, s.q_id, s.vec_id,
                      CAST(sum((p.xu - b.xu) * (p.xu - b.xu)) AS BIGINT) AS d2
               FROM shr s JOIN xu p ON p.vec_id = s.q_id
               JOIN xu b ON b.vec_id = s.vec_id AND b.sb = p.sb AND b.wd = p.wd
               GROUP BY 1, 2, 3),
      atop AS (SELECT scheme, q_id, vec_id FROM shex
               QUALIFY row_number() OVER (PARTITION BY scheme, q_id
                 ORDER BY d2, vec_id) <= 5),
      exq AS (SELECT p.vec_id AS q_id, b.vec_id,
                     sum((p.xu - b.xu) * (p.xu - b.xu)) AS d2
              FROM xu p JOIN xu b ON p.sb = b.sb AND p.wd = b.wd
              WHERE p.vec_id < 10 AND b.vec_id <> p.vec_id
              GROUP BY 1, 2),
      exact AS (SELECT q_id, vec_id FROM exq
                QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) <= 5)
      SELECT a.scheme, round(count(x.vec_id) / 50.0, 6) AS recall_at_depth10
      FROM atop a LEFT JOIN exact x ON a.q_id = x.q_id AND a.vec_id = x.vec_id
      GROUP BY 1"""

  /** Generated CTE chain replaying the NN-Descent build round for round.
    * Every round CTE is MATERIALIZED — each is referenced three times by
    * the next round's expansion, and DuckDB inlines plain CTEs per
    * reference (the measured text_bpe_train 2^k cliff).
    */
  private val knnCosExpr = "round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6)"

  /** The exact-cosine top-K re-rank of a candidate CTE — the SQL twin of
    * [[knnRank]], referenced by every chain and by the incremental insert.
    * `vecsCte` names the vector CTE the distances evaluate against.
    */
  private def knnRankSql(candCte: String, vecsCte: String): String = s"""
        SELECT * FROM (
          SELECT cd.vec_id, cd.nbr, $knnCosExpr AS cos,
                 row_number() OVER (PARTITION BY cd.vec_id
                   ORDER BY $knnCosExpr DESC, cd.nbr) AS rank
          FROM $candCte cd JOIN $vecsCte x ON x.vec_id = cd.vec_id
               JOIN $vecsCte y ON y.vec_id = cd.nbr)
        WHERE rank <= $KnnK"""

  /** The batch-split predicate shared verbatim with [[knnBatchPred]]. */
  private val knnBatchSql =
    "('0x' || substr(md5('inc' || vec_id::VARCHAR), 1, 15))::BIGINT % 8 = 0"

  private def knnOracleCtes: String = knnChainCtes("", "")

  /** The stitched label-aware graph's CTE block — the SQL twin of
    * [[knnLabeledGraphShared]]. Expects the vector CTE `c` and the blind
    * graph CTE `ge(vec_id, nbr)` in scope; defines `lb` (labels), the
    * label-scoped two-salt block candidates, the top-[[LblK]] shortcut
    * edges `lsc`, and the stitched graph `gl(vec_id, nbr)`.
    */
  private def labeledGraphCtes: String = s"""
      lb AS (SELECT vec_id, label FROM embeddings),
      lblk AS MATERIALIZED (SELECT c.vec_id, lb.label,
               ('0x' || substr(md5('lb1' || c.vec_id::VARCHAR), 1, 15))::BIGINT
                 % $LblBlocks AS b1,
               ('0x' || substr(md5('lb2' || c.vec_id::VARCHAR), 1, 15))::BIGINT
                 % $LblBlocks AS b2
             FROM c JOIN lb ON lb.vec_id = c.vec_id),
      lcand AS (SELECT DISTINCT a.vec_id, e.vec_id AS nbr
             FROM lblk a JOIN lblk e
               ON a.label = e.label AND (a.b1 = e.b1 OR a.b2 = e.b2)
                  AND a.vec_id <> e.vec_id),
      lsc AS MATERIALIZED (SELECT vec_id, nbr FROM (
             SELECT cd.vec_id, cd.nbr,
                    row_number() OVER (PARTITION BY cd.vec_id
                      ORDER BY $knnCosExpr DESC, cd.nbr) AS rk
             FROM lcand cd JOIN c x ON x.vec_id = cd.vec_id
                  JOIN c y ON y.vec_id = cd.nbr) WHERE rk <= $LblK),
      gl AS MATERIALIZED (SELECT DISTINCT vec_id, nbr FROM (
             SELECT vec_id, nbr FROM ge
             UNION ALL SELECT vec_id, nbr FROM lsc))"""

  /** The three-step incremental-insert CTE block — the SQL twin of
    * [[knnIncInsert]], shared by the incremental metric and the
    * serve-path comparison so the maintained graph has exactly one
    * replay. Expects the base chain (`bg\$KnnIters`) and the full vector
    * CTE `c` in scope; leaves `ginc(vec_id, nbr)` defined.
    */
  private def knnIncInsertCtes: String = s"""
      newv AS (SELECT vec_id FROM c WHERE $knnBatchSql),
      base AS (SELECT vec_id, nbr FROM bg$KnnIters),
      seeds AS (SELECT DISTINCT a.vec_id, e.vec_id AS nbr
                FROM blk a JOIN blk e
                  ON (a.b1 = e.b1 OR a.b2 = e.b2) AND a.vec_id <> e.vec_id
                WHERE a.vec_id IN (SELECT vec_id FROM newv)),
      n0 AS MATERIALIZED (${knnRankSql("seeds", "c")}),
      icand AS (SELECT DISTINCT vec_id, nbr FROM (
          SELECT vec_id, nbr FROM n0
          UNION ALL SELECT n0.vec_id, b.nbr FROM n0 JOIN base b ON n0.nbr = b.vec_id
                    WHERE n0.vec_id <> b.nbr)),
      n1 AS MATERIALIZED (${knnRankSql("icand", "c")}),
      aff AS MATERIALIZED (SELECT DISTINCT nbr AS vec_id FROM n1
             WHERE nbr NOT IN (SELECT vec_id FROM newv)),
      affcand AS (SELECT DISTINCT vec_id, nbr FROM (
          SELECT b.vec_id, b.nbr FROM base b JOIN aff ON b.vec_id = aff.vec_id
          UNION ALL SELECT n1.nbr AS vec_id, n1.vec_id AS nbr
                    FROM n1 JOIN aff ON n1.nbr = aff.vec_id)),
      ga AS MATERIALIZED (${knnRankSql("affcand", "c")}),
      ginc AS MATERIALIZED (
          SELECT vec_id, nbr FROM base
          WHERE vec_id NOT IN (SELECT vec_id FROM aff)
          UNION ALL SELECT vec_id, nbr FROM ga
          UNION ALL SELECT vec_id, nbr FROM n1)"""

  /** The unrolled beam-walk CTEs (3 rounds, beam width `b`), every name
    * prefixed `pfx` so several widths coexist in one WITH. Expects
    * `${pfx}beam0(q_id, cand)`, the graph CTE `ge(vec_id, nbr)` (name
    * overridable so one WITH can walk several graphs), `qs(q_id, qv,
    * qn)`, and the vector CTE `c` to be defined by the caller.
    */
  /** @param scFilter extra JOIN/WHERE clauses appended to each round's
    *   scoring CTE — the filtered-walk variant's in-walk predicate
    *   (candidates failing it never enter the visited set or the beam).
    */
  private def beamWalkCtes(pfx: String, b: Int, ge: String = "ge",
      scFilter: String = ""): String =
    (1 to 3).map { r =>
      val prevBeam = s"${pfx}beam${r - 1}"
      val visPrev =
        if (r == 1) ""
        else s"SELECT q_id, cand, cos FROM ${pfx}vis${r - 1} UNION ALL "
      s""",
      ${pfx}exp$r AS (SELECT DISTINCT b.q_id, e.nbr AS cand
                FROM $prevBeam b JOIN $ge e ON e.vec_id = b.cand
                WHERE e.nbr <> b.q_id),
      ${pfx}sc$r AS (SELECT x.q_id, x.cand,
                      round(list_dot_product(q.qv, v.v) / (q.qn * v.nrm), 6) AS cos
               FROM ${pfx}exp$r x JOIN qs q ON q.q_id = x.q_id
                    JOIN c v ON v.vec_id = x.cand$scFilter),
      ${pfx}vis$r AS MATERIALIZED (SELECT DISTINCT q_id, cand, cos FROM (
          ${visPrev}SELECT q_id, cand, cos FROM ${pfx}sc$r)),
      ${pfx}beam$r AS (SELECT q_id, cand FROM (
          SELECT q_id, cand,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand) AS r
          FROM ${pfx}vis$r) WHERE r <= $b)"""
    }.mkString

  /** Generated CTE chain replaying an NN-Descent build round for round,
    * with every name prefixed `pfx` (so two chains — the full corpus and
    * the base-only corpus of the incremental twin — coexist in one WITH)
    * and the vector source optionally filtered. Every round CTE is
    * MATERIALIZED — each is referenced three times by the next round's
    * expansion, and DuckDB inlines plain CTEs per reference (the measured
    * text_bpe_train 2^k cliff).
    */
  private def knnChainCtes(pfx: String, srcWhere: String): String = {
    val (c, blk) = (s"${pfx}c", s"${pfx}blk")
    val sb = new StringBuilder
    sb.append(s"""
      $c AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings $srcWhere),
      $blk AS MATERIALIZED (
        SELECT vec_id,
               ('0x' || substr(md5('b1' || vec_id::VARCHAR), 1, 15))::BIGINT % $KnnBlocks AS b1,
               ('0x' || substr(md5('b2' || vec_id::VARCHAR), 1, 15))::BIGINT % $KnnBlocks AS b2
        FROM $c),
      ${pfx}cand0 AS (SELECT DISTINCT a.vec_id, e.vec_id AS nbr
                FROM $blk a JOIN $blk e
                  ON (a.b1 = e.b1 OR a.b2 = e.b2) AND a.vec_id <> e.vec_id),
      ${pfx}g0 AS MATERIALIZED (${knnRankSql(s"${pfx}cand0", c)})""")
    for (t <- 1 to KnnIters) {
      val p = s"${pfx}g${t - 1}"
      sb.append(s""",
      ${pfx}cand$t AS (
        SELECT DISTINCT vec_id, nbr FROM (
          SELECT vec_id, nbr FROM $p
          UNION ALL SELECT nbr AS vec_id, vec_id AS nbr FROM $p
          UNION ALL SELECT x.vec_id, y.nbr
                    FROM $p x JOIN $p y ON x.nbr = y.vec_id
                    WHERE x.vec_id <> y.nbr)),
      ${pfx}g$t AS MATERIALIZED (${knnRankSql(s"${pfx}cand$t", c)})""")
    }
    sb.toString
  }

  /** The hier-entry fragment — the sampled upper layer, the per-probe
    * argmax entry, and the unrolled walk from it (prefix `hr`) — bound
    * once and shared by sim_knn_graph_entry's hier leg AND
    * stream_graph_probe's oracle: the streamed serving path's whole
    * contract is that it answers identically to the batch leg, so both
    * must pin against one SQL string. Expects `c` and `qs` in scope.
    */
  private lazy val hierWalkCtes: String = s"""l1 AS MATERIALIZED (SELECT vec_id FROM c
            WHERE ('0x' || substr(md5('hl' || vec_id::VARCHAR), 1, 15))::BIGINT % 8 = 0),
      hr AS (SELECT q_id, cand AS hier_entry FROM (
               SELECT q.q_id, v.vec_id AS cand,
                      row_number() OVER (PARTITION BY q.q_id
                        ORDER BY round(list_dot_product(q.qv, v.v) / (q.qn * v.nrm), 6) DESC,
                                 v.vec_id) AS r
               FROM qs q JOIN l1 l ON l.vec_id <> q.q_id
                    JOIN c v ON v.vec_id = l.vec_id) WHERE r = 1),
      hrbeam0 AS (SELECT q_id, hier_entry AS cand FROM hr)${beamWalkCtes("hr", 8)}"""

  /** The hier-entry walk's top-5 as a standalone oracle —
    * stream_graph_probe must land on this, hash for hash.
    */
  private[graft] lazy val knnHierWalkOracle: String = s"""
      WITH $knnOracleCtes,
      ge AS (SELECT vec_id, nbr FROM g$KnnIters),
      qs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM c WHERE vec_id < 10),
      $hierWalkCtes
      SELECT q_id, cand AS vec_id, cos, CAST(rank AS INTEGER) AS rank FROM (
        SELECT q_id, cand, cos,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand) AS rank
        FROM hrvis3) WHERE rank <= 5"""

  /** The unrolled B=8 beam-walk replay — bound once and shared by
    * sim_knn_graph_search AND sim_knn_graph_search_compacted: the
    * layout-serving variant's whole contract is that it answers
    * IDENTICALLY, so the two rows must pin against one SQL string.
    */
  private lazy val knnSearchOracle: String = s"""
      WITH $knnOracleCtes,
      ge AS (SELECT vec_id, nbr FROM g$KnnIters),
      qs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM c WHERE vec_id < 10),
      beam0 AS (SELECT q_id, q_id AS cand FROM qs)${beamWalkCtes("", 8)}
      SELECT q_id, cand AS vec_id, cos, CAST(rank AS INTEGER) AS rank FROM (
        SELECT q_id, cand, cos,
               row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand) AS rank
        FROM vis3) WHERE rank <= 5"""

  val oracle: Map[String, String] = Map(
    "sim_knn_graph" -> s"""
      WITH $knnOracleCtes
      SELECT vec_id, nbr, CAST(rank AS INTEGER) AS rank, cos FROM g$KnnIters""",
    "sim_knn_graph_curve" -> {
      val allg = (0 to KnnIters)
        .map(t => s"SELECT $t AS iter, vec_id, nbr FROM g$t")
        .mkString("\n          UNION ALL ")
      s"""
      WITH $knnOracleCtes,
      allg AS (
          $allg),
      probes AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM c
                 WHERE ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT % 10 = 0),
      exact AS (SELECT q_id, nbr FROM (
          SELECT p.q_id, x.vec_id AS nbr,
                 row_number() OVER (PARTITION BY p.q_id
                   ORDER BY round(list_dot_product(p.qv, x.v) / (p.qn * x.nrm), 6) DESC,
                            x.vec_id) AS r
          FROM probes p JOIN c x ON x.vec_id <> p.q_id)
        WHERE r <= $KnnK),
      per AS (SELECT iter, CAST(count(*) AS BIGINT) AS n_edges FROM allg GROUP BY 1),
      hits AS (SELECT a.iter, CAST(count(*) AS BIGINT) AS n_hits
               FROM allg a JOIN exact e ON a.vec_id = e.q_id AND a.nbr = e.nbr
               GROUP BY 1)
      SELECT per.iter, per.n_edges,
             round(coalesce(hits.n_hits, 0) / (SELECT count(*) FROM exact), 6) AS recall
      FROM per LEFT JOIN hits ON per.iter = hits.iter"""
    },
    // sim_knn_graph_search: the unrolled beam walk over the generated
    // build chain — visit set, tie rule, and 6dp scores replayed exactly
    "sim_knn_graph_search" -> knnSearchOracle,
    // sim_knn_graph_search_compacted: VERBATIM the same walk replay —
    // serving adjacency from the partition-pruned layout must change
    // nothing about the visit order, scores, or answer set
    "sim_knn_graph_search_compacted" -> knnSearchOracle,
    // sim_knn_graph_search_filtered: TWO walk replays over the same
    // generated graph — the filtered walk (in-walk label predicate in
    // every round's scoring CTE) and the unfiltered walk post-filtered
    // at top-5 — both scored per probe against the filtered-exact truth
    "sim_knn_graph_search_filtered" -> s"""
      WITH $knnOracleCtes,
      ge AS (SELECT vec_id, nbr FROM g$KnnIters),
      lb AS (SELECT vec_id, label FROM embeddings),
      qs AS (SELECT c.vec_id AS q_id, lb.label AS tgt, c.v AS qv, c.nrm AS qn
             FROM c JOIN lb ON lb.vec_id = c.vec_id WHERE c.vec_id < 10),
      ubeam0 AS (SELECT q_id, q_id AS cand FROM qs)${beamWalkCtes("u", 8)},
      post AS (SELECT t.q_id, t.cand AS vec_id FROM (
                 SELECT q_id, cand,
                        row_number() OVER (PARTITION BY q_id
                          ORDER BY cos DESC, cand) AS rk
                 FROM uvis3) t
               JOIN qs q ON q.q_id = t.q_id
               JOIN lb ON lb.vec_id = t.cand
               WHERE t.rk <= 5 AND lb.label = q.tgt),
      fbeam0 AS (SELECT q_id, q_id AS cand FROM qs)${beamWalkCtes("f", 8, "ge",
        "\n                    JOIN lb ON lb.vec_id = x.cand WHERE lb.label = q.tgt")},
      pre AS (SELECT q_id, cand AS vec_id FROM (
                SELECT q_id, cand,
                       row_number() OVER (PARTITION BY q_id
                         ORDER BY cos DESC, cand) AS rk
                FROM fvis3) WHERE rk <= 5),
      visleg AS (SELECT q_id, cand AS vec_id FROM (
                   SELECT t.q_id, t.cand,
                          row_number() OVER (PARTITION BY t.q_id
                            ORDER BY t.cos DESC, t.cand) AS rk
                   FROM uvis3 t
                   JOIN qs q ON q.q_id = t.q_id
                   JOIN lb ON lb.vec_id = t.cand
                   WHERE lb.label = q.tgt) WHERE rk <= 5),
      ex AS (SELECT q_id, tgt, vec_id FROM (
               SELECT p.q_id, p.tgt, s.vec_id,
                      round(list_dot_product(p.qv, s.v) / (p.qn * s.nrm), 6) AS cos
               FROM c s JOIN lb ON lb.vec_id = s.vec_id CROSS JOIN qs p
               WHERE s.vec_id <> p.q_id AND lb.label = p.tgt)
             QUALIFY row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, vec_id) <= 5)
      SELECT e.q_id, CAST(e.tgt AS INTEGER) AS target_label,
             count(*) AS n_exact,
             CAST(sum(CASE WHEN pr.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS pre_hits,
             CAST(sum(CASE WHEN vl.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS vis_hits,
             CAST(sum(CASE WHEN po.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS post_hits,
             round(sum(CASE WHEN pr.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) AS pre_recall,
             round(sum(CASE WHEN vl.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) AS vis_recall,
             round(sum(CASE WHEN po.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) AS post_recall
      FROM ex e
      LEFT JOIN pre pr ON pr.q_id = e.q_id AND pr.vec_id = e.vec_id
      LEFT JOIN visleg vl ON vl.q_id = e.q_id AND vl.vec_id = e.vec_id
      LEFT JOIN post po ON po.q_id = e.q_id AND po.vec_id = e.vec_id
      GROUP BY 1, 2""",
    // sim_knn_graph_labeled_build: the stitch re-derived — per label, the
    // blind graph's same-label edges, the shortcut edges added beyond
    // them, and the zero-same-label-out-edge node census before/after
    "sim_knn_graph_labeled_build" -> s"""
      WITH $knnOracleCtes,
      ge AS (SELECT vec_id, nbr FROM g$KnnIters),
      $labeledGraphCtes,
      samege AS (SELECT g.vec_id, a.label FROM ge g
                 JOIN lb a ON a.vec_id = g.vec_id
                 JOIN lb b ON b.vec_id = g.nbr AND b.label = a.label),
      samegl AS (SELECT g.vec_id, a.label FROM gl g
                 JOIN lb a ON a.vec_id = g.vec_id
                 JOIN lb b ON b.vec_id = g.nbr AND b.label = a.label),
      added AS (SELECT a.label, count(*) AS added_edges
                FROM (SELECT vec_id, nbr FROM gl
                      EXCEPT SELECT vec_id, nbr FROM ge) x
                JOIN lb a ON a.vec_id = x.vec_id GROUP BY 1)
      SELECT lb.label, CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(coalesce(any_value(eg.n), 0) AS BIGINT) AS base_same_edges,
             CAST(coalesce(any_value(added.added_edges), 0) AS BIGINT) AS added_edges,
             CAST(coalesce(any_value(egl.n), 0) AS BIGINT) AS aug_same_edges,
             CAST(sum(CASE WHEN lb.vec_id NOT IN (SELECT vec_id FROM samege)
                           THEN 1 ELSE 0 END) AS BIGINT) AS no_same_before,
             CAST(sum(CASE WHEN lb.vec_id NOT IN (SELECT vec_id FROM samegl)
                           THEN 1 ELSE 0 END) AS BIGINT) AS no_same_after
      FROM lb
      LEFT JOIN (SELECT label, count(*) AS n FROM samege GROUP BY 1) eg
             ON eg.label = lb.label
      LEFT JOIN (SELECT label, count(*) AS n FROM samegl GROUP BY 1) egl
             ON egl.label = lb.label
      LEFT JOIN added ON added.label = lb.label
      GROUP BY 1""",
    // sim_knn_graph_search_labeled: THREE walk replays — the filtered
    // walk over the stitched graph, the same filtered walk over the
    // blind graph, and the unfiltered stitched walk visited-filtered —
    // each scored per probe against the filtered-exact truth
    "sim_knn_graph_search_labeled" -> s"""
      WITH $knnOracleCtes,
      ge AS (SELECT vec_id, nbr FROM g$KnnIters),
      $labeledGraphCtes,
      qs AS (SELECT c.vec_id AS q_id, lb.label AS tgt, c.v AS qv, c.nrm AS qn
             FROM c JOIN lb ON lb.vec_id = c.vec_id WHERE c.vec_id < 10),
      lbeam0 AS (SELECT q_id, q_id AS cand FROM qs)${beamWalkCtes("l", 8, "gl",
        "\n                    JOIN lb ON lb.vec_id = x.cand WHERE lb.label = q.tgt")},
      bbeam0 AS (SELECT q_id, q_id AS cand FROM qs)${beamWalkCtes("b", 8, "ge",
        "\n                    JOIN lb ON lb.vec_id = x.cand WHERE lb.label = q.tgt")},
      ubeam0 AS (SELECT q_id, q_id AS cand FROM qs)${beamWalkCtes("u", 8, "gl")},
      labl AS (SELECT q_id, cand AS vec_id FROM (
                SELECT q_id, cand,
                       row_number() OVER (PARTITION BY q_id
                         ORDER BY cos DESC, cand) AS rk
                FROM lvis3) WHERE rk <= 5),
      blind AS (SELECT q_id, cand AS vec_id FROM (
                SELECT q_id, cand,
                       row_number() OVER (PARTITION BY q_id
                         ORDER BY cos DESC, cand) AS rk
                FROM bvis3) WHERE rk <= 5),
      visleg AS (SELECT q_id, cand AS vec_id FROM (
                   SELECT t.q_id, t.cand,
                          row_number() OVER (PARTITION BY t.q_id
                            ORDER BY t.cos DESC, t.cand) AS rk
                   FROM uvis3 t
                   JOIN qs q ON q.q_id = t.q_id
                   JOIN lb ON lb.vec_id = t.cand
                   WHERE lb.label = q.tgt) WHERE rk <= 5),
      ex AS (SELECT q_id, tgt, vec_id FROM (
               SELECT p.q_id, p.tgt, s.vec_id,
                      round(list_dot_product(p.qv, s.v) / (p.qn * s.nrm), 6) AS cos
               FROM c s JOIN lb ON lb.vec_id = s.vec_id CROSS JOIN qs p
               WHERE s.vec_id <> p.q_id AND lb.label = p.tgt)
             QUALIFY row_number() OVER (PARTITION BY q_id
               ORDER BY cos DESC, vec_id) <= 5)
      SELECT e.q_id, CAST(e.tgt AS INTEGER) AS target_label,
             count(*) AS n_exact,
             CAST(sum(CASE WHEN la.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS lab_hits,
             CAST(sum(CASE WHEN bl.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS blind_hits,
             CAST(sum(CASE WHEN vl.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS vis_hits,
             round(sum(CASE WHEN la.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) AS lab_recall,
             round(sum(CASE WHEN bl.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) AS blind_recall,
             round(sum(CASE WHEN vl.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) AS vis_recall
      FROM ex e
      LEFT JOIN labl la ON la.q_id = e.q_id AND la.vec_id = e.vec_id
      LEFT JOIN blind bl ON bl.q_id = e.q_id AND bl.vec_id = e.vec_id
      LEFT JOIN visleg vl ON vl.q_id = e.q_id AND vl.vec_id = e.vec_id
      GROUP BY 1, 2""",
    // sim_knn_graph_entry: the generated build chain + THREE unrolled
    // walk replays that differ ONLY in their beam0 CTE — self-entry,
    // the one global fixed entry, and the per-probe upper-layer argmax
    "sim_knn_graph_entry" -> s"""
      WITH $knnOracleCtes,
      ge AS (SELECT vec_id, nbr FROM g$KnnIters),
      qs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM c WHERE vec_id < 10),
      $hierWalkCtes,
      fx AS (SELECT min(vec_id) AS fixed_entry FROM l1),
      sebeam0 AS (SELECT q_id, q_id AS cand FROM qs)${beamWalkCtes("se", 8)},
      fxbeam0 AS (SELECT q_id, (SELECT fixed_entry FROM fx) AS cand FROM qs)${
        beamWalkCtes("fx", 8)},
      se5 AS (SELECT q_id, cand AS vec_id FROM (
                SELECT q_id, cand,
                       row_number() OVER (PARTITION BY q_id
                         ORDER BY cos DESC, cand) AS rk
                FROM sevis3) WHERE rk <= 5),
      fx5 AS (SELECT q_id, cand AS vec_id FROM (
                SELECT q_id, cand,
                       row_number() OVER (PARTITION BY q_id
                         ORDER BY cos DESC, cand) AS rk
                FROM fxvis3) WHERE rk <= 5),
      hr5 AS (SELECT q_id, cand AS vec_id FROM (
                SELECT q_id, cand,
                       row_number() OVER (PARTITION BY q_id
                         ORDER BY cos DESC, cand) AS rk
                FROM hrvis3) WHERE rk <= 5),
      ex AS (SELECT q_id, vec_id FROM (
               SELECT p.q_id, s.vec_id,
                      row_number() OVER (PARTITION BY p.q_id
                        ORDER BY round(list_dot_product(p.qv, s.v) / (p.qn * s.nrm), 6) DESC,
                                 s.vec_id) AS r
               FROM qs p JOIN c s ON s.vec_id <> p.q_id) WHERE r <= 5)
      SELECT e.q_id,
             (SELECT fixed_entry FROM fx) AS fixed_entry,
             any_value(hr.hier_entry) AS hier_entry,
             (SELECT CAST(count(*) AS BIGINT) FROM l1) AS n_layer1,
             CAST(count(*) AS BIGINT) AS n_exact,
             CAST(sum(CASE WHEN se5.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS self_hits,
             CAST(sum(CASE WHEN fx5.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS fixed_hits,
             CAST(sum(CASE WHEN hr5.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hier_hits,
             round(sum(CASE WHEN se5.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) AS self_recall,
             round(sum(CASE WHEN fx5.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) AS fixed_recall,
             round(sum(CASE WHEN hr5.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) AS hier_recall
      FROM ex e
      JOIN hr ON hr.q_id = e.q_id
      LEFT JOIN se5 ON se5.q_id = e.q_id AND se5.vec_id = e.vec_id
      LEFT JOIN fx5 ON fx5.q_id = e.q_id AND fx5.vec_id = e.vec_id
      LEFT JOIN hr5 ON hr5.q_id = e.q_id AND hr5.vec_id = e.vec_id
      GROUP BY 1""",
    // sim_knn_graph_search_sweep: three full walks (B ∈ {4, 8, 16}), the
    // per-round top-5 of each compared against the exact cosine top-5
    "sim_knn_graph_search_sweep" -> {
      val chains = Seq(4, 8, 16).map(b =>
        s"""b${b}beam0 AS (SELECT q_id, q_id AS cand FROM qs)${beamWalkCtes(s"b$b", b)}""")
        .mkString(",\n      ")
      val rows = (for (b <- Seq(4, 8, 16); r <- 1 to 3) yield s"""
      SELECT CAST($b AS INTEGER) AS beam, CAST($r AS INTEGER) AS rounds,
             CAST(count(*) AS BIGINT) AS n_hits,
             round(count(*) / 50.0, 6) AS recall_at_5
      FROM (SELECT q_id, cand FROM (
              SELECT q_id, cand,
                     row_number() OVER (PARTITION BY q_id
                       ORDER BY cos DESC, cand) AS rk
              FROM b${b}vis$r) WHERE rk <= 5) t
      JOIN exact e ON t.q_id = e.q_id AND t.cand = e.cand""")
        .mkString("\n      UNION ALL")
      s"""
      WITH $knnOracleCtes,
      ge AS (SELECT vec_id, nbr FROM g$KnnIters),
      qs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM c WHERE vec_id < 10),
      exact AS MATERIALIZED (SELECT q_id, cand FROM (
          SELECT p.q_id, x.vec_id AS cand,
                 row_number() OVER (PARTITION BY p.q_id
                   ORDER BY round(list_dot_product(p.qv, x.v) / (p.qn * x.nrm), 6)
                     DESC, x.vec_id) AS rn
          FROM qs p JOIN c x ON x.vec_id <> p.q_id) WHERE rn <= 5),
      $chains
      $rows"""
    },
    // sim_knn_graph_layout: the per-block adjacency inventory re-derived
    // from the generated build chain — the layout round trip must lose
    // nothing vs the logical graph
    "sim_knn_graph_layout" -> s"""
      WITH $knnOracleCtes
      SELECT CAST(('0x' || substr(md5('b1' || g.vec_id::VARCHAR), 1, 15))::BIGINT
                  % $KnnBlocks AS INTEGER) AS blk,
             CAST(count(DISTINCT g.vec_id) AS BIGINT) AS n_nodes,
             CAST(count(*) AS BIGINT) AS n_edges
      FROM g$KnnIters g GROUP BY 1""",
    // sim_knn_graph_frag_trigger: the expected directory counts derived
    // logically — files after batch k = distinct (blk, batch≤k) pairs,
    // because each append writes exactly one file per touched block
    "sim_knn_graph_frag_trigger" -> s"""
      WITH $knnOracleCtes,
      gb AS (SELECT DISTINCT
                    ('0x' || substr(md5('b1' || vec_id::VARCHAR), 1, 15))::BIGINT
                      % $KnnBlocks AS blk,
                    vec_id % 4 AS b
             FROM g$KnnIters),
      fk(k) AS (VALUES (0), (1), (2), (3))
      SELECT CAST(k AS INTEGER) AS batch,
             CAST(count(DISTINCT blk) AS BIGINT) AS n_blocks,
             CAST(count(*) AS BIGINT) AS n_files,
             count(*) > 2 * count(DISTINCT blk) AS merge_due
      FROM fk JOIN gb ON gb.b <= fk.k
      GROUP BY 1""",
    // sim_knn_graph_incremental: base build (batch excluded) + the
    // three-step insert + the cohort comparison against the full chain,
    // all replayed CTE for CTE
    "sim_knn_graph_incremental" -> s"""
      WITH $knnOracleCtes,${knnChainCtes("b", s"WHERE NOT ($knnBatchSql)")},
      $knnIncInsertCtes,
      fulle AS (SELECT vec_id, nbr FROM g$KnnIters),
      cohorts AS MATERIALIZED (
          SELECT c.vec_id,
                 CASE WHEN c.vec_id IN (SELECT vec_id FROM newv) THEN 'new'
                      WHEN c.vec_id IN (SELECT vec_id FROM aff) THEN 'affected'
                      ELSE 'untouched' END AS cohort
          FROM c),
      per AS (
        SELECT co.cohort,
               CAST(count(DISTINCT co.vec_id) AS BIGINT) AS n_nodes,
               CAST(count(g.vec_id) AS BIGINT) AS n_edges
        FROM cohorts co LEFT JOIN ginc g ON g.vec_id = co.vec_id
        GROUP BY 1),
      nf AS (SELECT co.cohort, CAST(count(*) AS BIGINT) AS n_full
             FROM fulle f JOIN cohorts co ON f.vec_id = co.vec_id GROUP BY 1),
      nh AS (SELECT co.cohort, CAST(count(*) AS BIGINT) AS n_hits
             FROM ginc g JOIN fulle f ON g.vec_id = f.vec_id AND g.nbr = f.nbr
                  JOIN cohorts co ON g.vec_id = co.vec_id
             GROUP BY 1)
      SELECT per.cohort, per.n_nodes, per.n_edges,
             CAST(coalesce(nh.n_hits, 0) AS BIGINT) AS n_hits,
             round(coalesce(nh.n_hits, 0) / nf.n_full, 6) AS recall
      FROM per JOIN nf ON per.cohort = nf.cohort
           LEFT JOIN nh ON per.cohort = nh.cohort
      UNION ALL
      SELECT 'overall',
             CAST((SELECT count(*) FROM cohorts) AS BIGINT),
             CAST((SELECT count(*) FROM ginc) AS BIGINT),
             CAST((SELECT count(*) FROM ginc g JOIN fulle f
                   ON g.vec_id = f.vec_id AND g.nbr = f.nbr) AS BIGINT),
             round((SELECT count(*) FROM ginc g JOIN fulle f
                    ON g.vec_id = f.vec_id AND g.nbr = f.nbr)
                   / (SELECT count(*) FROM fulle), 6)""",
    // sim_knn_graph_serve_maintained: the identical B=8 walk replayed
    // over BOTH graphs — the rebuild chain and the insert chain — each
    // answer set scored against the exact top-5, plus their agreement
    "sim_knn_graph_serve_maintained" -> s"""
      WITH $knnOracleCtes,${knnChainCtes("b", s"WHERE NOT ($knnBatchSql)")},
      $knnIncInsertCtes,
      ge AS (SELECT vec_id, nbr FROM g$KnnIters),
      gi AS MATERIALIZED (SELECT vec_id, nbr FROM ginc),
      qs AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM c WHERE vec_id < 10),
      exact AS MATERIALIZED (SELECT q_id, cand FROM (
          SELECT p.q_id, x.vec_id AS cand,
                 row_number() OVER (PARTITION BY p.q_id
                   ORDER BY round(list_dot_product(p.qv, x.v) / (p.qn * x.nrm), 6)
                     DESC, x.vec_id) AS rn
          FROM qs p JOIN c x ON x.vec_id <> p.q_id) WHERE rn <= 5),
      fbeam0 AS (SELECT q_id, q_id AS cand FROM qs)${beamWalkCtes("f", 8, "ge")},
      mbeam0 AS (SELECT q_id, q_id AS cand FROM qs)${beamWalkCtes("m", 8, "gi")},
      f5 AS (SELECT q_id, cand FROM (
          SELECT q_id, cand,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand) AS rk
          FROM fvis3) WHERE rk <= 5),
      m5 AS (SELECT q_id, cand FROM (
          SELECT q_id, cand,
                 row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, cand) AS rk
          FROM mvis3) WHERE rk <= 5)
      SELECT 'rebuilt' AS variant, CAST(count(*) AS BIGINT) AS n_hits,
             round(count(*) / 50.0, 6) AS frac
      FROM f5 t JOIN exact e ON t.q_id = e.q_id AND t.cand = e.cand
      UNION ALL
      SELECT 'maintained', CAST(count(*) AS BIGINT), round(count(*) / 50.0, 6)
      FROM m5 t JOIN exact e ON t.q_id = e.q_id AND t.cand = e.cand
      UNION ALL
      SELECT 'agreement', CAST(count(*) AS BIGINT), round(count(*) / 50.0, 6)
      FROM f5 t JOIN m5 e ON t.q_id = e.q_id AND t.cand = e.cand""",
    "arr_stats" -> """
      SELECT vec_id,
             round(CAST(list_max(embedding) AS DOUBLE), 6) AS vmax,
             round(list_sum(embedding::DOUBLE[]), 6) AS vsum,
             CAST(len(embedding) AS INTEGER) AS dim
      FROM embeddings""",
    "arr_l2_norm" -> """
      SELECT vec_id,
             round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS l2_norm
      FROM embeddings""",
    "sim_cosine_topk" -> cosineTopkSql,
    "dedup_semantic" -> """
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                        sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
                 FROM embeddings),
      cents AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM c WHERE vec_id < 16),
      asg AS (SELECT vec_id, c_id, v, nrm FROM (
                SELECT x.vec_id, ct.c_id, x.v, x.nrm,
                       row_number() OVER (PARTITION BY x.vec_id
                         ORDER BY list_dot_product(x.v, ct.cv) / (x.nrm * ct.cn) DESC,
                                  ct.c_id) AS rn
                FROM c x CROSS JOIN cents ct)
              WHERE rn = 1),
      dups AS (SELECT b.vec_id, count(*) AS n_earlier
               FROM asg a JOIN asg b
                 ON a.c_id = b.c_id AND a.vec_id < b.vec_id
               WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) > 0.4
               GROUP BY 1)
      SELECT asg.vec_id, asg.c_id,
             coalesce(d.n_earlier, 0) AS n_earlier_dups,
             d.vec_id IS NULL AS keep
      FROM asg LEFT JOIN dups d ON asg.vec_id = d.vec_id""",
    "sim_mips_topk" -> """
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                        (1.0 + vec_id % 5) / 3.0 AS sv
                 FROM embeddings),
      p AS (SELECT vec_id AS q_id, v AS qv, sv AS sq FROM c WHERE vec_id < 10),
      scored AS (
        SELECT q_id, vec_id, round(list_dot_product(qv, v) * sq * sv, 6) AS ip
        FROM c CROSS JOIN p WHERE vec_id <> q_id)
      SELECT q_id, vec_id, ip,
             CAST(row_number() OVER (PARTITION BY q_id ORDER BY ip DESC, vec_id) AS INTEGER) AS rank
      FROM scored
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY ip DESC, vec_id) <= 5""",
    "sim_knn_label" -> s"""
      WITH knn AS ($cosineTopkSql),
      votes AS (SELECT q_id, label, count(*) AS n
                FROM knn JOIN embeddings e ON knn.vec_id = e.vec_id
                GROUP BY 1, 2)
      SELECT q_id, label AS knn_label, n AS n_votes FROM votes
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY n DESC, label) = 1""",
    "dedup_embed_cosine" -> """
      WITH c AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings)
      SELECT a.vec_id AS da, b.vec_id AS db,
             round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
      FROM c a JOIN c b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) > 0.4""",
    "sim_ivf_topk" -> ivfTopkSql,
    // filtered ANN: the label predicate is applied inside the probed cells
    // (before the top-k) in BOTH engines, and the exact leg restricts the
    // brute-force population the same way — recall is hash-matched per probe
    "sim_ivf_filtered" -> """
      WITH c AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings),
      cents AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM c WHERE vec_id < 16),
      assigned AS (
        SELECT vec_id, label, v, nrm, c_id FROM (
          SELECT a.vec_id, a.label, a.v, a.nrm, cents.c_id,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_dot_product(a.v, cv) / (a.nrm * cn), 6) DESC, c_id) AS crank
          FROM c a CROSS JOIN cents) WHERE crank = 1),
      probes AS (
        SELECT vec_id AS q_id, label AS tgt, v AS qv, nrm AS qn, c_id FROM (
          SELECT a.vec_id, a.label, a.v, a.nrm, cents.c_id,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_dot_product(a.v, cv) / (a.nrm * cn), 6) DESC, c_id) AS crank
          FROM c a CROSS JOIN cents WHERE a.vec_id < 10) WHERE crank <= 2),
      ivf AS (
        SELECT q_id, vec_id FROM (
          SELECT p.q_id, s.vec_id,
                 round(list_dot_product(qv, s.v) / (qn * s.nrm), 6) AS cos
          FROM assigned s JOIN probes p ON s.c_id = p.c_id
          WHERE s.vec_id <> p.q_id AND s.label = p.tgt)
        QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) <= 5),
      p1 AS (SELECT vec_id AS q_id, label AS tgt, v AS qv, nrm AS qn
             FROM c WHERE vec_id < 10),
      ex AS (
        SELECT q_id, tgt, vec_id FROM (
          SELECT p.q_id, p.tgt, s.vec_id,
                 round(list_dot_product(p.qv, s.v) / (p.qn * s.nrm), 6) AS cos
          FROM c s CROSS JOIN p1 p
          WHERE s.vec_id <> p.q_id AND s.label = p.tgt)
        QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) <= 5)
      SELECT e.q_id, CAST(e.tgt AS INTEGER) AS target_label,
             count(*) AS n_exact,
             CAST(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
             round(sum(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) AS recall
      FROM ex e LEFT JOIN ivf i ON e.q_id = i.q_id AND e.vec_id = i.vec_id
      GROUP BY 1, 2""",
    // pre- vs post-filter over the identical cells and budget: the post
    // leg ranks UNfiltered candidates, takes 5, then filters — the recall
    // collapse is the hash-matched output
    "sim_ivf_filtered_sweep" -> """
      WITH c AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings),
      cents AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM c WHERE vec_id < 16),
      assigned AS (
        SELECT vec_id, label, v, nrm, c_id FROM (
          SELECT a.vec_id, a.label, a.v, a.nrm, cents.c_id,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_dot_product(a.v, cv) / (a.nrm * cn), 6) DESC, c_id) AS crank
          FROM c a CROSS JOIN cents) WHERE crank = 1),
      probes AS (
        SELECT vec_id AS q_id, label AS tgt, v AS qv, nrm AS qn, c_id FROM (
          SELECT a.vec_id, a.label, a.v, a.nrm, cents.c_id,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_dot_product(a.v, cv) / (a.nrm * cn), 6) DESC, c_id) AS crank
          FROM c a CROSS JOIN cents WHERE a.vec_id < 10) WHERE crank <= 2),
      cands AS (
        SELECT p.q_id, p.tgt, s.label, s.vec_id,
               round(list_dot_product(qv, s.v) / (qn * s.nrm), 6) AS cos
        FROM assigned s JOIN probes p ON s.c_id = p.c_id
        WHERE s.vec_id <> p.q_id),
      pre AS (
        SELECT q_id, vec_id FROM (SELECT * FROM cands WHERE label = tgt)
        QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) <= 5),
      post AS (
        SELECT q_id, vec_id FROM (
          SELECT * FROM cands
          QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) <= 5)
        WHERE label = tgt),
      p1 AS (SELECT vec_id AS q_id, label AS tgt, v AS qv, nrm AS qn
             FROM c WHERE vec_id < 10),
      ex AS (
        SELECT q_id, tgt, vec_id FROM (
          SELECT p.q_id, p.tgt, s.vec_id,
                 round(list_dot_product(p.qv, s.v) / (p.qn * s.nrm), 6) AS cos
          FROM c s CROSS JOIN p1 p
          WHERE s.vec_id <> p.q_id AND s.label = p.tgt)
        QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) <= 5)
      SELECT e.q_id, CAST(e.tgt AS INTEGER) AS target_label,
             count(*) AS n_exact,
             CAST(sum(CASE WHEN pr.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS pre_hits,
             CAST(sum(CASE WHEN po.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS post_hits,
             round(sum(CASE WHEN pr.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) AS pre_recall,
             round(sum(CASE WHEN po.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                   / CAST(count(*) AS DOUBLE), 6) AS post_recall
      FROM ex e
      LEFT JOIN pre pr ON e.q_id = pr.q_id AND e.vec_id = pr.vec_id
      LEFT JOIN post po ON e.q_id = po.q_id AND e.vec_id = po.vec_id
      GROUP BY 1, 2""",
    "sim_pq_adc" -> pqAdcSql,
    // the batch encode-scan must land on the same code table as the
    // streamed encode and the join-based shared stage
    "sim_pq_encode_scan" -> pqStreamCodesSql,
    // the compacted layout's per-cell inventory must equal the logical
    // index table re-derived from raw parquet
    "sim_ivfpq_compaction" -> ivfpqCompactionSql,
    // sim_ivfpq_forget_purge: the purged index re-derived LOGICALLY —
    // per cell, survivors/codes/forgotten under the shared md5 forget
    // set; a fully-forgotten cell emits no row (its dir is deleted)
    "sim_ivfpq_forget_purge" -> (pqAdcCtes + cellAsnCtes + s""",
      fgt AS (SELECT vec_id FROM c WHERE $forgetSqlPred)
      SELECT CAST(a.cell AS INTEGER) AS cell,
             CAST(count(DISTINCT cds.vec_id) FILTER (WHERE f.vec_id IS NULL) AS BIGINT) AS n_vectors,
             CAST(count(*) FILTER (WHERE f.vec_id IS NULL) AS BIGINT) AS n_codes,
             CAST(count(DISTINCT cds.vec_id) FILTER (WHERE f.vec_id IS NOT NULL) AS BIGINT) AS n_forgotten,
             count(DISTINCT cds.vec_id) FILTER (WHERE f.vec_id IS NOT NULL) > 0 AS rewritten
      FROM codes cds JOIN cellasn a ON cds.vec_id = a.vec_id
      LEFT JOIN fgt f ON f.vec_id = cds.vec_id
      GROUP BY 1
      HAVING count(*) FILTER (WHERE f.vec_id IS NULL) > 0"""),
    // sim_ivfpq_forget_serve: both serve legs replayed end to end — the
    // tombstone-filtered candidates and the purged index's candidates
    // each run ADC → shortlist → exact re-rank → top-5
    "sim_ivfpq_forget_serve" -> (pqAdcCtes + cellAsnCtes + s""",
      fgt AS (SELECT vec_id FROM c WHERE $forgetSqlPred),
      probecells AS (SELECT vec_id AS q_id, cell FROM cd2
                     WHERE vec_id < 10
                     QUALIFY row_number() OVER (PARTITION BY vec_id
                       ORDER BY d2, cell) <= 2),
      candf AS (SELECT p.q_id, a.vec_id, (f.vec_id IS NOT NULL) AS dead
                FROM cellasn a JOIN probecells p ON a.cell = p.cell
                LEFT JOIN fgt f ON f.vec_id = a.vec_id
                WHERE a.vec_id <> p.q_id),
      cnts AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_scanned_tomb,
                      CAST(sum(CASE WHEN dead THEN 1 ELSE 0 END) AS BIGINT) AS n_dead
               FROM candf GROUP BY 1),
      ${forgetServeLeg("t", "SELECT q_id, vec_id FROM candf WHERE NOT dead")},
      ${forgetServeLeg("g",
        """SELECT p.q_id, a.vec_id
                FROM cellasn a JOIN probecells p ON a.cell = p.cell
                WHERE a.vec_id <> p.q_id
                  AND a.vec_id NOT IN (SELECT vec_id FROM fgt)""")}
      SELECT c.q_id, c.n_scanned_tomb, c.n_dead,
             c.n_scanned_tomb - c.n_dead AS n_scanned_purged,
             t.s5 AS top5_sum,
             (t.s5 = g.s5 AND t.n5 = g.n5) AS agree
      FROM cnts c
      JOIN ttop t ON t.q_id = c.q_id
      JOIN gtop g ON g.q_id = c.q_id"""),
    // the maintenance loop must lose nothing: same logical inventory
    "sim_ivfpq_recompaction" -> ivfpqCompactionSql,
    "sim_ivfpq_scan_cost" -> ivfpqScanCostSql,
    // the directory must contain exactly what the write protocol predicts
    "sim_ivfpq_frag_trigger" -> ivfpqFragTriggerSql,
    "sim_pq_rerank" -> pqRerankSql,
    "sim_ivfpq_topk" -> pqIvfpqSql,
    "sim_ivfpq_trained" -> pqIvfpqTrainedSql,
    "sim_ivfpq_residual" -> pqIvfpqResidualSql,
    "sim_ivfpq_code_gain" -> pqCodeGainSql,
    "sim_pq_train_curve" -> pqTrainCurveSql,
    "sim_pq_seed_audit" -> pqSeedAuditSql,
    "sim_ivfpq_residual_recall" -> s"""
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      vu AS (SELECT vec_id, i - 1 AS dim, CAST(round(v[i] * 1000000) AS BIGINT) AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      ex AS (SELECT p.vec_id AS q_id, b.vec_id,
                    sum((p.xu - b.xu) * (p.xu - b.xu)) AS d2
             FROM vu p JOIN vu b ON p.dim = b.dim
             WHERE p.vec_id < 10 AND b.vec_id <> p.vec_id
             GROUP BY 1, 2),
      x AS (SELECT q_id, vec_id FROM ex
            QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) <= 5),
      a AS (SELECT q_id, vec_id FROM ($pqIvfpqResidualSql))
      SELECT x.q_id, CAST(count(a.vec_id) AS BIGINT) AS n_hits,
             round(count(a.vec_id) / 5.0, 6) AS recall
      FROM x LEFT JOIN a ON x.q_id = a.q_id AND x.vec_id = a.vec_id
      GROUP BY x.q_id""",
    // MMR: 5 greedy selection steps unrolled (generated — the BPE-chain
    // discipline, every CTE MATERIALIZED against per-reference inlining).
    "sim_mmr_topk" -> {
      def step(k: Int) =
        s"""p$k AS MATERIALIZED (
           |        SELECT c.q_id, c.vec_id, c.rel - max(pd.pdot) AS score
           |        FROM cand c
           |        JOIN sel${k - 1} s ON s.q_id = c.q_id
           |        JOIN pd ON pd.q_id = c.q_id AND pd.i = c.vec_id AND pd.j = s.vec_id
           |        LEFT JOIN sel${k - 1} x ON x.q_id = c.q_id AND x.vec_id = c.vec_id
           |        WHERE x.vec_id IS NULL
           |        GROUP BY c.q_id, c.vec_id, c.rel),
           |      s$k AS MATERIALIZED (SELECT q_id, vec_id, score FROM p$k
           |        QUALIFY row_number() OVER (PARTITION BY q_id
           |          ORDER BY score DESC, vec_id) = 1),
           |      sel$k AS MATERIALIZED (SELECT q_id, vec_id FROM sel${k - 1}
           |        UNION ALL SELECT q_id, vec_id FROM s$k)""".stripMargin
      val steps = (2 to 5).map(step).mkString(",\n      ")
      val union = (1 to 5).map(k =>
        s"SELECT q_id, vec_id, $k AS rank, score FROM s$k").mkString("\n      UNION ALL ")
      s"""
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      vu AS MATERIALIZED (SELECT vec_id, i - 1 AS dim_i,
                   CAST(round(v[i] * 1000000) AS BIGINT) AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      rel AS (SELECT p.vec_id AS q_id, b.vec_id, sum(p.xu * b.xu) AS rel
              FROM vu p JOIN vu b ON p.dim_i = b.dim_i
              WHERE p.vec_id < 10 AND b.vec_id <> p.vec_id
              GROUP BY 1, 2),
      cand AS MATERIALIZED (SELECT q_id, vec_id, CAST(rel AS BIGINT) AS rel FROM rel
              QUALIFY row_number() OVER (PARTITION BY q_id
                ORDER BY rel DESC, vec_id) <= 20),
      pd AS MATERIALIZED (SELECT ca.q_id, ca.vec_id AS i, cb.vec_id AS j,
                     CAST(sum(x.xu * y.xu) AS BIGINT) AS pdot
             FROM cand ca
             JOIN cand cb ON ca.q_id = cb.q_id AND ca.vec_id <> cb.vec_id
             JOIN vu x ON x.vec_id = ca.vec_id
             JOIN vu y ON y.vec_id = cb.vec_id AND y.dim_i = x.dim_i
             GROUP BY 1, 2, 3),
      s1 AS MATERIALIZED (SELECT q_id, vec_id, rel AS score FROM cand
             QUALIFY row_number() OVER (PARTITION BY q_id
               ORDER BY rel DESC, vec_id) = 1),
      sel1 AS MATERIALIZED (SELECT q_id, vec_id FROM s1),
      $steps
      SELECT q_id, vec_id, CAST(rank AS INTEGER) AS rank,
             CAST(score AS BIGINT) AS score_u
      FROM ($union)"""
    },
    // MMR λ sweep: three generated greedy chains over the SHARED cand/pd
    // CTEs, one per integer weight pair (4λ, 4(1−λ)) — the same unrolled
    // 5-step discipline as sim_mmr_topk, suffixed per λ.
    "sim_mmr_lambda_sweep" -> {
      def chain(tag: String, a: Int, b: Int): String = {
        def step(k: Int) =
          s"""p$k$tag AS MATERIALIZED (
             |        SELECT c.q_id, c.vec_id, $a * c.rel - $b * max(pd.pdot) AS score
             |        FROM cand c
             |        JOIN sel${k - 1}$tag s ON s.q_id = c.q_id
             |        JOIN pd ON pd.q_id = c.q_id AND pd.i = c.vec_id AND pd.j = s.vec_id
             |        LEFT JOIN sel${k - 1}$tag x ON x.q_id = c.q_id AND x.vec_id = c.vec_id
             |        WHERE x.vec_id IS NULL
             |        GROUP BY c.q_id, c.vec_id, c.rel),
             |      s$k$tag AS MATERIALIZED (SELECT q_id, vec_id, score FROM p$k$tag
             |        QUALIFY row_number() OVER (PARTITION BY q_id
             |          ORDER BY score DESC, vec_id) = 1),
             |      sel$k$tag AS MATERIALIZED (SELECT q_id, vec_id FROM sel${k - 1}$tag
             |        UNION ALL SELECT q_id, vec_id FROM s$k$tag)""".stripMargin
        s"""s1$tag AS MATERIALIZED (SELECT q_id, vec_id, $a * rel AS score FROM cand
           |        QUALIFY row_number() OVER (PARTITION BY q_id
           |          ORDER BY rel DESC, vec_id) = 1),
           |      sel1$tag AS MATERIALIZED (SELECT q_id, vec_id FROM s1$tag),
           |      ${(2 to 5).map(step).mkString(",\n      ")}""".stripMargin
      }
      val lams = Seq((25, "_25", 1, 3), (50, "_50", 2, 2), (75, "_75", 3, 1))
      val chains = lams.map { case (_, tag, a, b) => chain(tag, a, b) }
        .mkString(",\n      ")
      val union = lams.flatMap { case (lam, tag, _, _) =>
        (1 to 5).map(k =>
          s"SELECT $lam AS lam_pct, q_id, vec_id, $k AS rank, score FROM s$k$tag")
      }.mkString("\n      UNION ALL ")
      s"""
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      vu AS MATERIALIZED (SELECT vec_id, i - 1 AS dim_i,
                   CAST(round(v[i] * 1000000) AS BIGINT) AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      rel AS (SELECT p.vec_id AS q_id, b.vec_id, sum(p.xu * b.xu) AS rel
              FROM vu p JOIN vu b ON p.dim_i = b.dim_i
              WHERE p.vec_id < 10 AND b.vec_id <> p.vec_id
              GROUP BY 1, 2),
      cand AS MATERIALIZED (SELECT q_id, vec_id, CAST(rel AS BIGINT) AS rel FROM rel
              QUALIFY row_number() OVER (PARTITION BY q_id
                ORDER BY rel DESC, vec_id) <= 20),
      pd AS MATERIALIZED (SELECT ca.q_id, ca.vec_id AS i, cb.vec_id AS j,
                     CAST(sum(x.xu * y.xu) AS BIGINT) AS pdot
             FROM cand ca
             JOIN cand cb ON ca.q_id = cb.q_id AND ca.vec_id <> cb.vec_id
             JOIN vu x ON x.vec_id = ca.vec_id
             JOIN vu y ON y.vec_id = cb.vec_id AND y.dim_i = x.dim_i
             GROUP BY 1, 2, 3),
      $chains
      SELECT CAST(lam_pct AS INTEGER) AS lam_pct, q_id, vec_id,
             CAST(rank AS INTEGER) AS rank,
             CAST(score AS BIGINT) AS score_u
      FROM ($union)"""
    },

    "sim_range_search" -> """
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      vu AS (SELECT vec_id, i - 1 AS dim_i, CAST(round(v[i] * 1000000) AS BIGINT) AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      d AS (SELECT p.vec_id AS q_id, b.vec_id,
                   sum((p.xu - b.xu) * (p.xu - b.xu)) AS d2
            FROM vu p JOIN vu b ON p.dim_i = b.dim_i
            WHERE p.vec_id < 10 AND b.vec_id <> p.vec_id
            GROUP BY 1, 2)
      SELECT q_id, count(*) AS n_within,
             round(CAST(min(d2) AS DOUBLE) / 1000000000000.0, 6) AS nearest_d2,
             CAST(sum(vec_id) AS BIGINT) AS id_sum
      FROM d WHERE d2 < 1900000000000 GROUP BY 1""",

    // Matryoshka prefix-dim recall: per-k distances from the dim_i < k
    // restriction of the same integer coordinate table.
    "emb_matryoshka_recall" -> """
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      vu AS (SELECT vec_id, i - 1 AS dim_i, CAST(round(v[i] * 1000000) AS BIGINT) AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      ks AS (SELECT unnest([8, 16, 32, 64]) AS k),
      dist AS (SELECT ks.k, p.vec_id AS q_id, b.vec_id,
                      sum((p.xu - b.xu) * (p.xu - b.xu)) AS d2
               FROM vu p JOIN vu b ON p.dim_i = b.dim_i, ks
               WHERE p.vec_id < 10 AND b.vec_id <> p.vec_id AND p.dim_i < ks.k
               GROUP BY 1, 2, 3),
      top AS (SELECT k, q_id, vec_id FROM dist
              QUALIFY row_number() OVER (PARTITION BY k, q_id
                ORDER BY d2, vec_id) <= 5),
      exd AS (SELECT p.vec_id AS q_id, b.vec_id,
                     sum((p.xu - b.xu) * (p.xu - b.xu)) AS d2
              FROM vu p JOIN vu b ON p.dim_i = b.dim_i
              WHERE p.vec_id < 10 AND b.vec_id <> p.vec_id
              GROUP BY 1, 2),
      ex AS (SELECT q_id, vec_id FROM exd
             QUALIFY row_number() OVER (PARTITION BY q_id
               ORDER BY d2, vec_id) <= 5)
      SELECT CAST(t.k AS INTEGER) AS dim,
             round(sum(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) / 50.0, 6)
               AS recall
      FROM top t LEFT JOIN ex e ON t.q_id = e.q_id AND t.vec_id = e.vec_id
      GROUP BY 1""",
    // nprobe sweep: the fixture-cell IVF-PQ tail generalized to probe-rank
    // ≤ 8, swept over np ∈ {1,2,4,8} exactly as the Spark side does.
    "sim_ivfpq_probe_sweep" -> (pqAdcCtes + """,
      celld AS (SELECT x.vec_id, s16.c16, sum((x.xu - s16.cu) * (x.xu - s16.cu)) AS d2
                FROM xu x JOIN (SELECT vec_id AS c16, sb, wd, xu AS cu
                                FROM xu WHERE vec_id < 16) s16
                  ON x.sb = s16.sb AND x.wd = s16.wd
                GROUP BY 1, 2),
      cellsv AS (SELECT vec_id, c16 AS cell FROM celld
                 QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, c16) = 1),
      probecells8 AS (SELECT vec_id AS q_id, c16 AS cell,
                             row_number() OVER (PARTITION BY vec_id ORDER BY d2, c16) AS pr
                      FROM celld WHERE vec_id < 10
                      QUALIFY pr <= 8),
      candv AS (SELECT p.q_id, cl.vec_id, p.pr
                FROM cellsv cl JOIN probecells8 p ON cl.cell = p.cell
                WHERE cl.vec_id <> p.q_id),
      adcr AS (SELECT ca.q_id, ca.vec_id, ca.pr, CAST(sum(l.d2) AS BIGINT) AS adc_u
               FROM candv ca JOIN codes cds ON cds.vec_id = ca.vec_id
               JOIN lut l ON l.q_id = ca.q_id AND l.sb = cds.sb AND l.c_id = cds.c_id
               GROUP BY 1, 2, 3),
      swept AS (SELECT a.q_id, a.vec_id, a.adc_u, s.np
                FROM adcr a, LATERAL (SELECT unnest([1, 2, 4, 8]) AS np) s
                WHERE s.np >= a.pr),
      shortr AS (SELECT np, q_id, vec_id FROM swept
                 QUALIFY row_number() OVER (PARTITION BY np, q_id ORDER BY adc_u, vec_id) <= 50),
      exr AS (SELECT s.np, s.q_id, s.vec_id,
                     CAST(sum((p.xu - b.xu) * (p.xu - b.xu)) AS BIGINT) AS d2
              FROM shortr s JOIN xu p ON p.vec_id = s.q_id
              JOIN xu b ON b.vec_id = s.vec_id AND b.sb = p.sb AND b.wd = p.wd
              GROUP BY 1, 2, 3),
      atop AS (SELECT np, q_id, vec_id FROM exr
               QUALIFY row_number() OVER (PARTITION BY np, q_id ORDER BY d2, vec_id) <= 5),
      exq AS (SELECT p.vec_id AS q_id, b.vec_id,
                     sum((p.xu - b.xu) * (p.xu - b.xu)) AS d2
              FROM xu p JOIN xu b ON p.sb = b.sb AND p.wd = b.wd
              WHERE p.vec_id < 10 AND b.vec_id <> p.vec_id
              GROUP BY 1, 2),
      exact AS (SELECT q_id, vec_id FROM exq
                QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) <= 5),
      hits AS (SELECT a.np, count(*) AS n_hits
               FROM atop a JOIN exact x ON a.q_id = x.q_id AND a.vec_id = x.vec_id
               GROUP BY 1),
      scanned AS (SELECT np, count(*) AS n_cand FROM swept GROUP BY 1)
      SELECT CAST(s.np AS INTEGER) AS nprobe,
             round(coalesce(h.n_hits, 0) / 50.0, 6) AS recall,
             round(s.n_cand / (10.0 * (SELECT count(*) FROM embeddings)), 6) AS scanned_frac
      FROM scanned s LEFT JOIN hits h ON s.np = h.np"""),
    // nprobe × depth grid: the probe sweep's swept frame ranked once per
    // (np, q), cut at max-depth 200, each depth leg an unnest of the rank,
    // exact re-rank distance computed once per distinct pair — exactly the
    // Spark side's one-union/one-rank/one-gather shape.
    "sim_ivfpq_grid" -> (pqAdcCtes + """,
      celld AS (SELECT x.vec_id, s16.c16, sum((x.xu - s16.cu) * (x.xu - s16.cu)) AS d2
                FROM xu x JOIN (SELECT vec_id AS c16, sb, wd, xu AS cu
                                FROM xu WHERE vec_id < 16) s16
                  ON x.sb = s16.sb AND x.wd = s16.wd
                GROUP BY 1, 2),
      cellsv AS (SELECT vec_id, c16 AS cell FROM celld
                 QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, c16) = 1),
      probecells8 AS (SELECT vec_id AS q_id, c16 AS cell,
                             row_number() OVER (PARTITION BY vec_id ORDER BY d2, c16) AS pr
                      FROM celld WHERE vec_id < 10
                      QUALIFY pr <= 8),
      candv AS (SELECT p.q_id, cl.vec_id, p.pr
                FROM cellsv cl JOIN probecells8 p ON cl.cell = p.cell
                WHERE cl.vec_id <> p.q_id),
      adcr AS (SELECT ca.q_id, ca.vec_id, ca.pr, CAST(sum(l.d2) AS BIGINT) AS adc_u
               FROM candv ca JOIN codes cds ON cds.vec_id = ca.vec_id
               JOIN lut l ON l.q_id = ca.q_id AND l.sb = cds.sb AND l.c_id = cds.c_id
               GROUP BY 1, 2, 3),
      swept AS (SELECT a.q_id, a.vec_id, a.adc_u, s.np
                FROM adcr a, LATERAL (SELECT unnest([1, 2, 4, 8]) AS np) s
                WHERE s.np >= a.pr),
      rankr AS (SELECT np, q_id, vec_id,
                       row_number() OVER (PARTITION BY np, q_id
                         ORDER BY adc_u, vec_id) AS r
                FROM swept
                QUALIFY r <= 200),
      bydepth AS (SELECT np, q_id, vec_id, dp.depth
                  FROM rankr, LATERAL (SELECT unnest([25, 50, 100, 200]) AS depth) dp
                  WHERE dp.depth >= r),
      pairs AS (SELECT DISTINCT q_id, vec_id FROM rankr),
      exd AS (SELECT s.q_id, s.vec_id,
                     CAST(sum((p.xu - b.xu) * (p.xu - b.xu)) AS BIGINT) AS d2
              FROM pairs s JOIN xu p ON p.vec_id = s.q_id
              JOIN xu b ON b.vec_id = s.vec_id AND b.sb = p.sb AND b.wd = p.wd
              GROUP BY 1, 2),
      atop AS (SELECT bd.np, bd.depth, bd.q_id, bd.vec_id
               FROM bydepth bd JOIN exd e
                 ON e.q_id = bd.q_id AND e.vec_id = bd.vec_id
               QUALIFY row_number() OVER (PARTITION BY bd.np, bd.depth, bd.q_id
                 ORDER BY e.d2, bd.vec_id) <= 5),
      exq AS (SELECT p.vec_id AS q_id, b.vec_id,
                     sum((p.xu - b.xu) * (p.xu - b.xu)) AS d2
              FROM xu p JOIN xu b ON p.sb = b.sb AND p.wd = b.wd
              WHERE p.vec_id < 10 AND b.vec_id <> p.vec_id
              GROUP BY 1, 2),
      exact AS (SELECT q_id, vec_id FROM exq
                QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) <= 5),
      hits AS (SELECT a.np, a.depth, count(*) AS n_hits
               FROM atop a JOIN exact x ON a.q_id = x.q_id AND a.vec_id = x.vec_id
               GROUP BY 1, 2),
      grid AS (SELECT DISTINCT np, depth FROM bydepth),
      scanned AS (SELECT np, count(*) AS n_cand FROM swept GROUP BY 1)
      SELECT CAST(g.np AS INTEGER) AS nprobe,
             CAST(g.depth AS INTEGER) AS depth,
             round(coalesce(h.n_hits, 0) / 50.0, 6) AS recall,
             round(s.n_cand / (10.0 * (SELECT count(*) FROM embeddings)), 6) AS scanned_frac
      FROM grid g
      LEFT JOIN hits h ON g.np = h.np AND g.depth = h.depth
      JOIN scanned s ON g.np = s.np"""),
    "sim_ivfpq_recall" -> s"""
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      vu AS (SELECT vec_id, i - 1 AS dim, CAST(round(v[i] * 1000000) AS BIGINT) AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      ex AS (SELECT p.vec_id AS q_id, b.vec_id,
                    sum((p.xu - b.xu) * (p.xu - b.xu)) AS d2
             FROM vu p JOIN vu b ON p.dim = b.dim
             WHERE p.vec_id < 10 AND b.vec_id <> p.vec_id
             GROUP BY 1, 2),
      x AS (SELECT q_id, vec_id FROM ex
            QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) <= 5),
      a AS (SELECT q_id, vec_id FROM ($pqIvfpqSql))
      SELECT x.q_id, CAST(count(a.vec_id) AS BIGINT) AS n_hits,
             round(count(a.vec_id) / 5.0, 6) AS recall
      FROM x LEFT JOIN a ON x.q_id = a.q_id AND x.vec_id = a.vec_id
      GROUP BY x.q_id""",
    "sim_pq_rerank_recall" -> s"""
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      vu AS (SELECT vec_id, i - 1 AS dim, CAST(round(v[i] * 1000000) AS BIGINT) AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      ex AS (SELECT p.vec_id AS q_id, b.vec_id,
                    sum((p.xu - b.xu) * (p.xu - b.xu)) AS d2
             FROM vu p JOIN vu b ON p.dim = b.dim
             WHERE p.vec_id < 10 AND b.vec_id <> p.vec_id
             GROUP BY 1, 2),
      x AS (SELECT q_id, vec_id FROM ex
            QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) <= 5),
      a AS (SELECT q_id, vec_id FROM ($pqRerankSql))
      SELECT x.q_id, CAST(count(a.vec_id) AS BIGINT) AS n_hits,
             round(count(a.vec_id) / 5.0, 6) AS recall
      FROM x LEFT JOIN a ON x.q_id = a.q_id AND x.vec_id = a.vec_id
      GROUP BY x.q_id""",
    "sim_pq_recall" -> s"""
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      vu AS (SELECT vec_id, i - 1 AS dim, CAST(round(v[i] * 1000000) AS BIGINT) AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      ex AS (SELECT p.vec_id AS q_id, b.vec_id,
                    sum((p.xu - b.xu) * (p.xu - b.xu)) AS d2
             FROM vu p JOIN vu b ON p.dim = b.dim
             WHERE p.vec_id < 10 AND b.vec_id <> p.vec_id
             GROUP BY 1, 2),
      x AS (SELECT q_id, vec_id FROM ex
            QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY d2, vec_id) <= 5),
      a AS (SELECT q_id, vec_id FROM ($pqAdcSql))
      SELECT x.q_id, CAST(count(a.vec_id) AS BIGINT) AS n_hits,
             round(count(a.vec_id) / 5.0, 6) AS recall
      FROM x LEFT JOIN a ON x.q_id = a.q_id AND x.vec_id = a.vec_id
      GROUP BY x.q_id""",
    "sim_sq8_recall" -> s"""
      WITH x AS (SELECT q_id, vec_id FROM ($intExactTop5Sql)),
      a AS (SELECT q_id, vec_id FROM ($sq8Top5Sql))
      SELECT x.q_id, CAST(count(a.vec_id) AS BIGINT) AS n_hits,
             round(count(a.vec_id) / 5.0, 6) AS recall
      FROM x LEFT JOIN a ON x.q_id = a.q_id AND x.vec_id = a.vec_id
      GROUP BY x.q_id""",
    "sim_binary_rerank" -> s"""
      WITH x AS (SELECT q_id, vec_id FROM ($intExactTop5Sql)),
      a AS (SELECT q_id, vec_id FROM ($binTop5Sql))
      SELECT x.q_id, CAST(count(a.vec_id) AS BIGINT) AS n_hits,
             round(count(a.vec_id) / 5.0, 6) AS recall
      FROM x LEFT JOIN a ON x.q_id = a.q_id AND x.vec_id = a.vec_id
      GROUP BY x.q_id""",
    "sim_quant_ladder" -> s"""
      WITH x AS (SELECT q_id, vec_id FROM ($intExactTop5Sql)),
      pq AS (SELECT q_id, vec_id FROM ($pqAdcSql)),
      s8 AS (SELECT q_id, vec_id FROM ($sq8Top5Sql)),
      bi AS (SELECT q_id, vec_id FROM ($binTop5Sql))
      SELECT 'float32' AS scheme, CAST(2048 AS INTEGER) AS bits_per_vec,
             CAST(count(*) AS BIGINT) AS n_hits,
             round(count(*) / 50.0, 6) AS recall_at_5 FROM x
      UNION ALL
      SELECT 'sq8', 512, CAST(count(*) AS BIGINT), round(count(*) / 50.0, 6)
      FROM x JOIN s8 ON x.q_id = s8.q_id AND x.vec_id = s8.vec_id
      UNION ALL
      SELECT 'pq8x8', 64, CAST(count(*) AS BIGINT), round(count(*) / 50.0, 6)
      FROM x JOIN pq ON x.q_id = pq.q_id AND x.vec_id = pq.vec_id
      UNION ALL
      SELECT 'binary_rerank', 64, CAST(count(*) AS BIGINT), round(count(*) / 50.0, 6)
      FROM x JOIN bi ON x.q_id = bi.q_id AND x.vec_id = bi.vec_id""",
    "emb_covariance" -> """
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      ex AS (SELECT vec_id, i - 1 AS di, CAST(round(v[i] * 1000000) AS BIGINT) AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      p AS (SELECT a.di AS i, b.di AS j,
                   sum(CAST(a.xu AS HUGEINT) * b.xu) AS sp,
                   CAST(sum(a.xu) AS BIGINT) AS sua,
                   CAST(sum(b.xu) AS BIGINT) AS sub,
                   count(*) AS n
            FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.di >= a.di
            GROUP BY 1, 2)
      SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
             round(CAST(sp AS DOUBLE) / 1000000000000.0 / n
                   - (CAST(sua AS DOUBLE) / 1000000.0 / n)
                     * (CAST(sub AS DOUBLE) / 1000000.0 / n), 6) + 0.0 AS cov
      FROM p""",
    "sim_ivf_recall" -> s"""
      WITH x AS ($cosineTopkSql),
      a AS ($ivfTopkSql)
      SELECT x.q_id, CAST(count(a.vec_id) AS BIGINT) AS n_hits,
             round(count(a.vec_id) / 5.0, 6) AS recall
      FROM x LEFT JOIN a ON x.q_id = a.q_id AND x.vec_id = a.vec_id
      GROUP BY x.q_id""",
    "mm_binary_meta" -> """
      SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
             sha256(text) AS sha256
      FROM documents""",
    "sim_kmeans_update" -> kmeansSql,
    // sample_kcenter: the 8 greedy farthest-point steps unrolled as
    // generated MATERIALIZED CTEs — per step a linear distance pass to
    // the one new center and an integer argmax with the vec_id tiebreak
    "sample_kcenter" -> {
      val sel = (1 to 7).map(k =>
        s"UNION ALL SELECT $k, (SELECT cid FROM c$k), (SELECT dmin FROM c$k)")
        .mkString("\n      ")
      s"""
      WITH $kcenterOracleCtes
      SELECT CAST(0 AS INTEGER) AS step, (SELECT cid FROM c0) AS center_id,
             CAST(NULL AS BIGINT) AS sel_d2u
      $sel
      UNION ALL SELECT 8, CAST(NULL AS BIGINT), (SELECT max(dmin) FROM m8)"""
    },
    // sample_kcenter_census: the shared selection chain + one assignment
    // pass (every vector × the 8 selected centers, argmin with the
    // center-id tiebreak)
    "sample_kcenter_census" -> s"""
      WITH $kcenterOracleCtes,
      cents AS (SELECT cid FROM c0
      ${(1 to 7).map(k => s"UNION ALL SELECT cid FROM c$k").mkString("\n      ")}),
      ad AS (SELECT a.vec_id, b.vec_id AS center_id,
                    CAST(sum((a.xu - b.xu) * (a.xu - b.xu)) AS BIGINT) AS d2
             FROM vud a JOIN vud b ON b.dim = a.dim
                  AND b.vec_id IN (SELECT cid FROM cents)
             GROUP BY 1, 2),
      asg AS (SELECT vec_id, center_id, d2 FROM ad
              QUALIFY row_number() OVER (PARTITION BY vec_id
                ORDER BY d2, center_id) = 1)
      SELECT center_id, CAST(count(*) AS BIGINT) AS n_assigned,
             CAST(max(d2) AS BIGINT) AS radius_d2u,
             CAST(sum(d2) AS BIGINT) AS sum_d2u
      FROM asg GROUP BY 1""",
    // sim_ivf_kcenter_balance: the selection chain + two assignment
    // passes (fixture seeds vs the 8 exemplars), each folded to its
    // list-size extremes
    "sim_ivf_kcenter_balance" -> s"""
      WITH $kcenterOracleCtes,
      cents AS (SELECT cid FROM c0
      ${(1 to 7).map(k => s"UNION ALL SELECT cid FROM c$k").mkString("\n      ")}),
      kca AS (SELECT a.vec_id, b.vec_id AS center_id,
                     CAST(sum((a.xu - b.xu) * (a.xu - b.xu)) AS BIGINT) AS d2
              FROM vud a JOIN vud b ON b.dim = a.dim
                   AND b.vec_id IN (SELECT cid FROM cents)
              GROUP BY 1, 2),
      fxa AS (SELECT a.vec_id, b.vec_id AS center_id,
                     CAST(sum((a.xu - b.xu) * (a.xu - b.xu)) AS BIGINT) AS d2
              FROM vud a JOIN vud b ON b.dim = a.dim AND b.vec_id < 8
              GROUP BY 1, 2),
      kcl AS (SELECT center_id, CAST(count(*) AS BIGINT) AS n FROM (
                SELECT vec_id, center_id FROM kca
                QUALIFY row_number() OVER (PARTITION BY vec_id
                  ORDER BY d2, center_id) = 1) GROUP BY 1),
      fxl AS (SELECT center_id, CAST(count(*) AS BIGINT) AS n FROM (
                SELECT vec_id, center_id FROM fxa
                QUALIFY row_number() OVER (PARTITION BY vec_id
                  ORDER BY d2, center_id) = 1) GROUP BY 1)
      SELECT 'fixture_seeds' AS scheme, CAST(count(*) AS BIGINT) AS n_lists,
             CAST(max(n) AS BIGINT) AS widest, CAST(min(n) AS BIGINT) AS narrowest
      FROM fxl
      UNION ALL
      SELECT 'kcenter', CAST(count(*) AS BIGINT), CAST(max(n) AS BIGINT),
             CAST(min(n) AS BIGINT)
      FROM kcl""",
    "sim_ivf_trained" -> s"""
      WITH km AS (SELECT * FROM ($kmeansSql)),
      tc0 AS (SELECT c_id, list(mean_x ORDER BY dim) AS cv FROM km GROUP BY c_id),
      tc AS (SELECT c_id, cv, sqrt(list_dot_product(cv, cv)) AS cn FROM tc0),
      c AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings),
      assigned AS (
        SELECT vec_id, v, nrm, c_id FROM (
          SELECT a.vec_id, a.v, a.nrm, tc.c_id,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_dot_product(a.v, cv) / (a.nrm * cn), 6) DESC, c_id) AS crank
          FROM c a CROSS JOIN tc) WHERE crank = 1),
      probes AS (
        SELECT vec_id AS q_id, v AS qv, nrm AS qn, c_id FROM (
          SELECT a.vec_id, a.v, a.nrm, tc.c_id,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_dot_product(a.v, cv) / (a.nrm * cn), 6) DESC, c_id) AS crank
          FROM c a CROSS JOIN tc WHERE a.vec_id < 10) WHERE crank <= 2),
      scored AS (
        SELECT q_id, s.vec_id,
               round(list_dot_product(qv, s.v) / (qn * s.nrm), 6) AS cos
        FROM assigned s JOIN probes p ON s.c_id = p.c_id
        WHERE s.vec_id <> p.q_id)
      SELECT q_id, vec_id, cos,
             CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS INTEGER) AS rank
      FROM scored
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) <= 5""",
    "sim_lsh_buckets" -> s"""
      WITH $lshSigSql
      SELECT vec_id, bucket FROM buckets""",
    "emb_dim_stats" -> """
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      ex AS (SELECT i - 1 AS dim, v[i] AS x,
                    CAST(round(v[i] * 1000000) AS BIGINT) AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      a AS (SELECT dim, count(*) AS n, CAST(sum(xu) AS BIGINT) AS su,
                   sum(CAST(xu AS HUGEINT) * xu) AS sq,
                   round(min(x), 6) AS min_x, round(max(x), 6) AS max_x
            FROM ex GROUP BY dim)
      SELECT CAST(dim AS INTEGER) AS dim, n,
             round(CAST(su AS DOUBLE) / 1000000.0 / n, 6) AS mean_x,
             round(sqrt(CAST(sq AS DOUBLE) / 1000000000000.0 / n
                        - pow(CAST(su AS DOUBLE) / 1000000.0 / n, 2)), 6) AS std_x,
             min_x, max_x
      FROM a""",
    // verdicts replay in exact integer cross-multiplication (no division);
    // the planted +0.25 on dims 0-3 of the odd-parity slice is applied in
    // identical micro-units on both engines
    "emb_drift" -> """
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      ex AS (SELECT vec_id, i - 1 AS dim,
                    CAST(round(v[i] * 1000000) AS BIGINT)
                      + CASE WHEN vec_id % 2 = 1 AND i - 1 < 4
                             THEN 250000 ELSE 0 END AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      a AS (SELECT dim,
                   CAST(sum(CASE WHEN vec_id % 2 = 0 THEN xu ELSE 0 END) AS BIGINT) AS sua,
                   CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
                   CAST(sum(CASE WHEN vec_id % 2 = 1 THEN xu ELSE 0 END) AS BIGINT) AS sub,
                   CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
            FROM ex GROUP BY dim),
      p AS (SELECT CAST(dim AS INTEGER) AS dim, na, nb,
                   round(CAST(sua AS DOUBLE) / 1000000.0 / na, 6) AS mean_a,
                   round(CAST(sub AS DOUBLE) / 1000000.0 / nb, 6) AS mean_b,
                   abs(sub * na - sua * nb) > 100000 * na * nb AS drifted
            FROM a)
      SELECT p.*, t.n_drifted_dims
      FROM p, (SELECT CAST(sum(CASE WHEN drifted THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_drifted_dims FROM p) t""",
    "emb_quantize_int8" -> """
      WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      ex AS (SELECT vec_id, i - 1 AS dim,
                    CAST(round(v[i] * 1000000) AS BIGINT) AS xu
             FROM c, LATERAL (SELECT unnest(range(1, len(v) + 1)) AS i) r),
      sc AS (SELECT dim, max(abs(xu)) AS m FROM ex GROUP BY dim)
      SELECT vec_id, CAST(ex.dim AS INTEGER) AS dim,
             CAST(CASE WHEN m = 0 THEN 0
                       ELSE CAST(sign(xu) AS BIGINT) * ((abs(xu) * 254 + m) // (2 * m))
                  END AS INTEGER) AS q8
      FROM ex JOIN sc ON ex.dim = sc.dim""",
    "dedup_embed_lsh" -> lshPairsSql,
    "dedup_threshold_sweep" -> s"""
      WITH pairs AS ($lshPairsSql)
      SELECT CAST(round(cos * 1000000) AS BIGINT) // 50000 AS bucket,
             count(*) AS n_pairs,
             round(min(cos), 6) AS min_cos,
             round(max(cos), 6) AS max_cos
      FROM pairs GROUP BY 1""",
    "sim_rrf_fusion" -> s"""
      WITH dense AS ($cosineTopkSql),
      lex AS (${TextOps.shingleKnnSql}),
      u AS (SELECT q_id, vec_id AS cand,
                   CAST(round(1000000.0 / (60 + rank)) AS BIGINT) AS cu
            FROM dense
            UNION ALL
            SELECT q_doc, doc_id,
                   CAST(round(1000000.0 / (60 + rank)) AS BIGINT)
            FROM lex),
      f AS (SELECT q_id, cand, CAST(sum(cu) AS BIGINT) AS rrf_u,
                   count(*) AS n_legs
            FROM u GROUP BY 1, 2)
      SELECT q_id, cand, round(rrf_u / 1000000.0, 6) AS rrf, n_legs,
             CAST(row_number() OVER (PARTITION BY q_id
               ORDER BY rrf_u DESC, cand) AS INTEGER) AS rank
      FROM f
      QUALIFY row_number() OVER (PARTITION BY q_id
        ORDER BY rrf_u DESC, cand) <= 5""",
  )

  /** LSH band → candidate → exact-cosine-verify pairs, shared by the
    * dedup_embed_lsh oracle and the threshold-sweep calibration built on it.
    */
  private lazy val lshPairsSql: String = s"""
      WITH $lshSigSql,
      bands AS (SELECT vec_id, b AS band, substr(bucket, b * 4 + 1, 4) AS bk
                FROM buckets, (SELECT unnest(range(0, 4)) AS b)),
      cand AS (SELECT DISTINCT a.vec_id AS da, b.vec_id AS db
               FROM bands a JOIN bands b
                 ON a.band = b.band AND a.bk = b.bk AND a.vec_id < b.vec_id),
      n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM c)
      SELECT da, db,
             round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) AS cos
      FROM cand JOIN n x ON da = x.vec_id JOIN n y ON db = y.vec_id
      WHERE list_dot_product(x.v, y.v) / (x.nrm * y.nrm) > 0.4"""
}
