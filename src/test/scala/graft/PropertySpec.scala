package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.Peptides
import graft.kernels.{FeatureFinder, SpecPeaks}
import graft.ops.MzmlStats

/** Property-style tests (seeded generators, batched through a single Spark
  * pass so hundreds of cases cost one job): modsPosition against an
  * independent position derivation, scan-id extraction fallback, simhash
  * similarity behavior, feature-finder noise robustness, and the Jacobi
  * eigensolver on random symmetric matrices.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(20260812L)
  private val residues = "ACDEFGHIKLMNPQRSTVWY"
  private val modNames = Seq("Oxidation", "Carbamidomethyl", "Phospho", "Acetyl", "GG")

  /** Random peptidoform + independently computed expected positions. */
  private def genCase(): (String, Option[Seq[String]]) = {
    val nSegs = 1 + rnd.nextInt(4)
    val segs = Seq.fill(nSegs)(
      Seq.fill(rnd.nextInt(6))(residues(rnd.nextInt(residues.length))).mkString)
    val nMods = rnd.nextInt(nSegs) // mods go between segments (after seg i)
    val modAt = rnd.shuffle(segs.indices.dropRight(1).toList).take(nMods).sorted
    val sb = new StringBuilder
    var residuesSoFar = 0
    val expected = scala.collection.mutable.ArrayBuffer.empty[String]
    segs.zipWithIndex.foreach { case (seg, i) =>
      sb.append(seg)
      residuesSoFar += seg.length
      if (modAt.contains(i)) {
        val m = modNames(rnd.nextInt(modNames.length))
        sb.append(s"($m)")
        expected += s"$residuesSoFar-$m"
      }
    }
    (sb.toString, if (expected.isEmpty) None else Some(expected.toSeq))
  }

  test("modsPosition matches independent derivation on 300 random peptidoforms") {
    val cases = Seq.fill(300)(genCase()).filter(_._1.nonEmpty)
    val got = cases.map(_._1).toDF("p")
      .select(col("p"), Peptides.modsPosition(col("p")).as("m"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[String](1).toSeq))).toMap
    cases.foreach { case (p, expected) =>
      assert(got(p) === expected, s"peptidoform $p")
    }
  }

  test("scanId: extracts any scan=/spectrum= digits, falls back to full id") {
    val cases = (1 to 100).map { i =>
      val n = rnd.nextInt(1000000)
      rnd.nextInt(3) match {
        case 0 => (s"controllerType=0 controllerNumber=1 scan=$n", n.toString)
        case 1 => (s"spectrum=$n", n.toString)
        case _ => (s"index-only-$n", s"index-only-$n") // no match → identity
      }
    }
    val got = cases.map(_._1).toDF("id")
      .select(col("id"), MzmlStats.scanId(col("id")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (id, expected) => assert(got(id) === expected, id) }
  }

  test("simhash: identical token arrays hash equal; hamming grows with edits") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val base = Seq.fill(60)(residues(rnd.nextInt(residues.length)).toString ++
      rnd.nextInt(100).toString)
    val oneEdit = base.updated(0, "EDITED_TOKEN")
    val unrelated = Seq.fill(60)("zz" + rnd.nextInt(1000000).toString)
    val df = Seq(("a", base), ("b", base), ("c", oneEdit), ("d", unrelated))
      .toDF("k", "t")
      .select(col("k"), graft.expressions.SimHash64(col("t")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df("a") === df("b"))
    assert(hamming(df("a"), df("c")) < hamming(df("a"), df("d")),
      "near-duplicate must be closer than unrelated text")
  }

  test("l2sq: codegen'd integer L2^2 equals the HOF fold and a plain Scala loop") {
    val rows = (1 to 200).map { i =>
      val r = new Random(i)
      (i.toLong,
        Array.fill(64)(r.nextInt(2000001).toLong - 1000000L),
        Array.fill(64)(r.nextInt(2000001).toLong - 1000000L))
    }
    val df = rows.toDF("id", "a", "b")
    val hof = expr(
      "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, (acc, v) -> acc + v)")
    val got = df.select(col("id"),
      graft.expressions.VectorExpressions.l2sq(col("a"), col("b")).as("fast"),
      hof.as("ref")).collect()
    got.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"id ${r.getLong(0)}: codegen vs HOF")
    }
    val byId = rows.map { case (id, a, b) =>
      id -> a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    }.toMap
    got.foreach(r => assert(r.getLong(1) === byId(r.getLong(0)), "vs scala loop"))
  }

  test("peptidoform grammar fuzz: normalize/unmodified/modsPosition invariants " +
      "across the full UniMod table") {
    import graft.functions.Peptides
    val aa = "ACDEFGHIKLMNPQRSTVWY"
    val rnd = new Random(7)
    val ids = Peptides.unimodNames.keys.toVector.sorted

    case class Case(raw: String, residues: String, mods: Seq[(Int, String)], caret: Boolean)
    val cases = (1 to 300).map { i =>
      val nRes = 4 + rnd.nextInt(12)
      val residues = Array.fill(nRes)(aa(rnd.nextInt(aa.length))).mkString
      // distinct positions: 0 = N-terminal, p>0 = after residue p
      val positions = Seq.fill(rnd.nextInt(4))(rnd.nextInt(nRes + 1)).distinct.sorted
      // name → its bracket delta-mass renderings (empty for mods whose
      // mass is ambiguous at every rendered precision, e.g. Dehydrated)
      val massByName = Peptides.massForms.groupBy(_._2)
        .view.mapValues(_.map(_._1)).toMap
      val mods = positions.map { p =>
        val id = ids(rnd.nextInt(ids.length))
        val name = Peptides.unimodNames(id)
        val form = rnd.nextInt(4) match {
          case 0 => s"(UniMod:$id)"
          case 1 => s"(UNIMOD:$id)" // DIA-NN emits both casings
          case 2 => s"($name)" // already name-form
          case 3 => // bracket delta-mass rendering where one exists
            massByName.get(name) match {
              case Some(ms) => s"[${ms(rnd.nextInt(ms.length))}]"
              case None => s"($name)"
            }
        }
        (p, name, form)
      }
      val caret = i % 5 == 0
      val body = new StringBuilder
      mods.filter(_._1 == 0).foreach(m => body ++= m._3)
      residues.zipWithIndex.foreach { case (c, idx) =>
        body += c
        mods.filter(_._1 == idx + 1).foreach(m => body ++= m._3)
      }
      Case((if (caret) "^" else "") + body, residues, mods.map(m => (m._1, m._2)), caret)
    }

    val got = cases.map(_.raw).toDF("raw")
      .select(col("raw"),
        Peptides.normalizeSequence(col("raw")).as("norm"))
      .select(col("raw"), col("norm"),
        Peptides.normalizeSequence(col("norm")).as("norm2"),
        Peptides.unmodifiedSequence(col("norm")).as("unmod"),
        Peptides.modsPosition(col("norm")).as("mp"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3),
          Option(r.getSeq[String](4)).map(_.toSeq)))
      .toMap

    cases.foreach { c =>
      val (norm, norm2, unmod, mp) = got(c.raw)
      // idempotence: a normalized form normalizes to itself
      assert(norm2 === norm, s"${c.raw}: norm not idempotent ($norm -> $norm2)")
      // the caret marker and the residue content survive every rewrite —
      // including nested-paren names like Label:13C(6)15N(2)
      assert(norm.startsWith("^") === c.caret, c.raw)
      assert(unmod === (if (c.caret) "^" else "") + c.residues,
        s"${c.raw}: residues mangled ($norm -> $unmod)")
      // an N-terminal mod (bare or behind the caret) is dot-rendered
      val expectDot = c.mods.exists(_._1 == 0)
      assert(norm.stripPrefix("^").startsWith(".") === expectDot, s"${c.raw} -> $norm")
      // mod positions + canonical names agree with the generator
      val expectMp = if (c.mods.isEmpty) None else Some(c.mods.map(m => s"${m._1}-${m._2}"))
      assert(mp === expectMp, s"${c.raw} -> $norm: $mp vs $expectMp")
    }
  }

  test("l2sq: mismatched array lengths fail fast instead of silently truncating") {
    val df = Seq((Array(1L, 2L, 3L), Array(1L, 2L))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(graft.expressions.VectorExpressions.l2sq(col("a"), col("b"))).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("mismatched array lengths")), chain(e).mkString(" | "))
  }

  test("feature finder: pure noise yields no features, planted envelope always found") {
    (1 to 5).foreach { trial =>
      val r = new Random(trial)
      // isolated random peaks, no persistent traces
      val noise = (0 until 15).map(i =>
        SpecPeaks(i, i * 2.0, s"$i",
          Array.fill(20)(300 + r.nextDouble() * 1000).sorted,
          Array.fill(20)(100 + r.nextDouble() * 1000)))
      assert(FeatureFinder.detect(noise).isEmpty, s"trial $trial: noise made features")

      val mono = 400 + r.nextDouble() * 600
      val z = 1 + r.nextInt(3)
      val planted = noise.map { s =>
        val iso = (0 until 3).map(k => mono + k * FeatureFinder.IsoDiff / z)
        val ints = (0 until 3).map(k => 1e6 * math.pow(0.7, k))
        val mzs = (s.mz ++ iso).sorted
        val byMz = (s.mz.zip(s.intensity) ++ iso.zip(ints)).sortBy(_._1)
        SpecPeaks(s.index, s.rt, s.scan, byMz.map(_._1).toArray, byMz.map(_._2).toArray)
      }
      val feats = FeatureFinder.detect(planted)
      assert(feats.nonEmpty, s"trial $trial: envelope missed")
      val f = feats.minBy(x => math.abs(x.mz - mono))
      assert(math.abs(f.mz - mono) < 0.02, s"trial $trial")
      assert(f.charge === z, s"trial $trial: charge")
      assert(f.minRt <= f.rt && f.rt <= f.maxRt)
    }
  }

  test("Eigen.symmetric: random matrices — reconstruction, orthonormality, scale invariance") {
    import graft.functions.Eigen
    for (trial <- 1 to 40) {
      val n = 2 + rnd.nextInt(7)
      // random symmetric with entries across scales (1e-3 .. 1e3): the
      // relative Frobenius convergence must hold at every magnitude
      val scale = math.pow(10.0, rnd.nextInt(7) - 3)
      val a = Array.ofDim[Double](n, n)
      for (i <- 0 until n; j <- i until n) {
        val x = (rnd.nextDouble() * 2 - 1) * scale
        a(i)(j) = x
        a(j)(i) = x
      }
      val (vals, vecs) = Eigen.symmetric(a)
      val tol = 1e-9 * math.max(scale, 1e-12)
      assert(vals.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)), s"trial $trial: order")
      val trace = (0 until n).map(i => a(i)(i)).sum
      assert(math.abs(vals.sum - trace) < tol * n, s"trial $trial: trace")
      for (i <- 0 until n; j <- 0 until n) {
        val dot = vecs(i).zip(vecs(j)).map { case (x, y) => x * y }.sum
        assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"trial $trial: basis")
      }
      for (i <- 0 until n) {
        val av = a.map(row => row.zip(vecs(i)).map { case (x, y) => x * y }.sum)
        av.zip(vecs(i)).foreach { case (x, y) =>
          assert(math.abs(x - vals(i) * y) < tol * n, s"trial $trial: A.v=lambda.v")
        }
      }
    }
  }
}
