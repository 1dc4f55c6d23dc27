package graft.functions

/** Deterministic cyclic-Jacobi eigendecomposition of a small symmetric
  * matrix (Golub & Van Loan §8.5) — the driver-side step of PCA over an
  * embedding corpus. The matrix is d×d where d is the embedding
  * dimensionality: bounded by model geometry, independent of corpus size,
  * so solving on the driver is constant work next to the distributed
  * covariance pass that produced it.
  *
  * Determinism is load-bearing (the projected output is oracle-dumped):
  * fixed row-cyclic sweep order, fixed relative (Frobenius-scaled)
  * convergence threshold,
  * ties in the eigenvalue sort broken by original index, and a fixed sign
  * convention — each eigenvector's largest-magnitude component (first on
  * ties) is made positive — so repeated runs produce bit-identical bases.
  */
object Eigen {

  /** @param m symmetric d×d matrix (only read; not mutated)
    * @return (eigenvalues, eigenvectors-as-rows) sorted by eigenvalue
    *         descending; vectors are orthonormal and sign-normalized
    */
  def symmetric(m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    require(n > 0 && m.forall(_.length == n), "matrix must be square")
    val a = Array.tabulate(n, n)((i, j) => m(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)

    def offDiag(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }

    // convergence is RELATIVE to the matrix's scale (Frobenius norm): an
    // absolute floor would be unreachable for large-norm inputs (rounding
    // noise scales with ‖A‖²) and every call would burn the full sweep cap
    val fro = {
      var sum = 0.0
      var i = 0
      while (i < n) {
        var j = 0
        while (j < n) { sum += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      sum
    }
    val threshold = 1e-28 * fro
    var sweep = 0
    // 100 sweeps bounds only a logic bug: cyclic Jacobi converges
    // quadratically, d=64 needs ~8
    while (offDiag() > threshold && sweep < 100) {
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }

    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { i =>
      val col = Array.tabulate(n)(k => v(k)(i))
      // sign convention: largest-|component| (first on ties) positive
      var best = 0
      var k = 1
      while (k < n) { if (math.abs(col(k)) > math.abs(col(best))) best = k; k += 1 }
      if (col(best) < 0) col.map(x => -x) else col
    }.toArray
    (values, vectors)
  }
}
