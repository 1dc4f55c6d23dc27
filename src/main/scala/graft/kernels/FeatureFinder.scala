package graft.kernels

import scala.collection.mutable.ArrayBuffer

/** One centroided MS1 spectrum of a run (scan order = index order). */
case class SpecPeaks(
    index: Int,
    rt: Double,
    scan: String,
    mz: Array[Double],
    intensity: Array[Double])

/** One detected feature, before pTIC annotation / scan attachment. */
case class RawFeature(
    mz: Double,
    rt: Double,
    intensity: Double,
    charge: Int,
    quality: Double,
    minRt: Double,
    minMz: Double,
    maxRt: Double,
    maxMz: Double)

/** Label-free MS1 feature finding: mass-trace building + isotope-pattern
  * grouping, in the spirit of the public MS1Connect algorithm
  * (doi:10.1093/bioinformatics/btad058) that the reference's
  * FeatureFinderMultiplexAlgorithm path descends from
  * (ms1_feature_finder.py:1-14). Exact OpenMS parity is not the bar
  * (SURVEY §7.4): output schema and invariants (bounding box contains the
  * apex, num_scans = scans inside the RT box) are.
  *
  * Runs per file inside `flatMapGroups` — a pure function of one run's
  * spectra, so the cluster-scale job is embarrassingly parallel across runs.
  */
object FeatureFinder {

  val IsoDiff = 1.0033548378
  val PpmTol = 10e-6
  val MaxScanGap = 1 // trace may skip this many scans
  val MinTraceLength = 3 // points per trace
  val MaxCharge = 4
  val MaxIsotopes = 6

  private case class Point(scanIdx: Int, rt: Double, mz: Double, intensity: Double)

  private final class Trace {
    val points = ArrayBuffer.empty[Point]
    var mzSum = 0.0 // intensity-weighted
    var wSum = 0.0
    var lastScanIdx: Int = -1
    def mz: Double = if (wSum > 0) mzSum / wSum else 0.0
    def add(p: Point): Unit = {
      points += p
      mzSum += p.mz * p.intensity
      wSum += p.intensity
      lastScanIdx = p.scanIdx
    }
    def minRt: Double = points.head.rt
    def maxRt: Double = points.last.rt
    def intensitySum: Double = points.iterator.map(_.intensity).sum
    def apex: Point = points.maxBy(_.intensity)
  }

  /** Greedy per-scan trace building: each peak extends the closest open
    * trace within the ppm tolerance, traces idle for more than MaxScanGap
    * scans close.
    */
  private def buildTraces(spectra: Seq[SpecPeaks]): Seq[Trace] = {
    val open = ArrayBuffer.empty[Trace]
    val closed = ArrayBuffer.empty[Trace]
    var scanPos = 0
    spectra.foreach { s =>
      // retire stale traces
      var i = 0
      while (i < open.length) {
        if (open(i).lastScanIdx < scanPos - MaxScanGap - 1) {
          closed += open.remove(i)
        } else i += 1
      }
      val extendedThisScan = new java.util.IdentityHashMap[Trace, java.lang.Boolean]()
      var p = 0
      while (p < s.mz.length) {
        val mz = s.mz(p)
        val inten = s.intensity(p)
        var best: Trace = null
        var bestD = Double.MaxValue
        open.foreach { t =>
          if (!extendedThisScan.containsKey(t)) {
            val d = math.abs(t.mz - mz)
            if (d <= t.mz * PpmTol && d < bestD) { best = t; bestD = d }
          }
        }
        val target = if (best != null) best else { val t = new Trace; open += t; t }
        target.add(Point(scanPos, s.rt, mz, inten))
        extendedThisScan.put(target, java.lang.Boolean.TRUE)
        p += 1
      }
      scanPos += 1
    }
    (closed ++ open).filter(_.points.length >= MinTraceLength).toSeq
  }

  private def rtOverlap(a: Trace, b: Trace): Boolean =
    a.minRt <= b.maxRt && b.minRt <= a.maxRt

  /** Group traces into isotope patterns; a feature needs the monoisotopic
    * trace plus at least one RT-overlapping isotope companion. Charge is
    * chosen by the longest isotope chain (ties → lower charge).
    */
  /** First index >= from with traces(idx).mz >= x (traces sorted by mz). */
  private def lowerBound(traces: IndexedSeq[Trace], x: Double, from: Int): Int = {
    var a = from
    var b = traces.length
    while (a < b) {
      val m = (a + b) >>> 1
      if (traces(m).mz < x) a = m + 1 else b = m
    }
    a
  }

  def detect(spectra: Seq[SpecPeaks]): Seq[RawFeature] = {
    val ordered = spectra.sortBy(_.index)
    val traces = buildTraces(ordered).sortBy(_.mz).toIndexedSeq
    val used = new Array[Boolean](traces.length)
    val features = ArrayBuffer.empty[RawFeature]

    var i = 0
    while (i < traces.length) {
      if (!used(i)) {
        val mono = traces(i)
        var bestChain: List[Int] = Nil
        var bestZ = 0
        var z = 1
        while (z <= MaxCharge) {
          val chain = ArrayBuffer(i)
          var k = 1
          var continue = true
          while (continue && k <= MaxIsotopes) {
            val targetMz = mono.mz + k * IsoDiff / z
            // binary search to the ppm window's lower edge: a linear scan
            // from i+1 would re-walk every trace between mono and the k-th
            // isotope for all 24 (charge, isotope) probes — O(n·span·24)
            // in dense runs
            var bestJ = -1
            var bestD = Double.MaxValue
            var j = lowerBound(traces, targetMz * (1 - PpmTol), i + 1)
            while (j < traces.length && traces(j).mz <= targetMz * (1 + PpmTol)) {
              if (!used(j) && !chain.contains(j)) {
                val d = math.abs(traces(j).mz - targetMz)
                if (d <= targetMz * PpmTol && d < bestD && rtOverlap(mono, traces(j))) {
                  bestJ = j; bestD = d
                }
              }
              j += 1
            }
            if (bestJ >= 0) { chain += bestJ; k += 1 }
            else continue = false
          }
          if (chain.length > bestChain.length) { bestChain = chain.toList; bestZ = z }
          z += 1
        }

        if (bestChain.length >= 2) {
          bestChain.foreach(used(_) = true)
          val members = bestChain.map(traces(_))
          val apex = mono.apex
          val allPoints = members.flatMap(_.points)
          features += RawFeature(
            mz = mono.mz,
            rt = apex.rt,
            intensity = members.iterator.map(_.intensitySum).sum,
            charge = bestZ,
            // engine-defined quality: isotope-chain support saturating at the
            // full expected envelope
            quality = math.min(1.0, bestChain.length.toDouble / (MaxIsotopes / 2.0)),
            minRt = allPoints.iterator.map(_.rt).min,
            minMz = allPoints.iterator.map(_.mz).min,
            maxRt = allPoints.iterator.map(_.rt).max,
            maxMz = allPoints.iterator.map(_.mz).max)
        }
      }
      i += 1
    }
    features.toSeq
  }
}
