package graft.glm

/** Minimal dense linear algebra for driver-side design matrices (k ≤ ~50).
  * The engine never distributes these: X is tiny and shared (SURVEY.md §2.6
  * M1 — `pinv` precomputed on the driver and broadcast), so plain
  * row-major Array[Array[Double]] with Gauss-Jordan inversion suffices and
  * avoids any dependency beyond the JDK.
  */
object LinAlg {

  type Mat = Array[Array[Double]]

  def transpose(a: Mat): Mat = {
    val m = a.length; val n = a(0).length
    Array.tabulate(n, m)((i, j) => a(j)(i))
  }

  def matmul(a: Mat, b: Mat): Mat = {
    val m = a.length; val k = a(0).length; val n = b(0).length
    require(b.length == k, s"matmul shape mismatch: ${a.length}x$k * ${b.length}x$n")
    Array.tabulate(m, n) { (i, j) =>
      var s = 0.0; var t = 0; while (t < k) { s += a(i)(t) * b(t)(j); t += 1 }; s
    }
  }

  /** Inverse via Gauss-Jordan with partial pivoting. */
  def inverse(a0: Mat): Mat = {
    val n = a0.length
    val a = a0.map(_.clone())
    val inv = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      require(math.abs(a(piv)(col)) > 1e-12, s"singular matrix at column $col")
      if (piv != col) {
        val t = a(piv); a(piv) = a(col); a(col) = t
        val ti = inv(piv); inv(piv) = inv(col); inv(col) = ti
      }
      val d = a(col)(col)
      var j = 0
      while (j < n) { a(col)(j) /= d; inv(col)(j) /= d; j += 1 }
      r = 0
      while (r < n) {
        if (r != col && a(r)(col) != 0.0) {
          val f = a(r)(col)
          j = 0
          while (j < n) { a(r)(j) -= f * a(col)(j); inv(r)(j) -= f * inv(col)(j); j += 1 }
        }
        r += 1
      }
      col += 1
    }
    inv
  }

  /** Moore-Penrose pseudoinverse for full-column-rank X: (XᵀX)⁻¹Xᵀ, k×n. */
  def pinv(x: Mat): Mat = {
    val xt = transpose(x)
    matmul(inverse(matmul(xt, x)), xt)
  }

  /** Diagonal of (XᵀX)⁻¹ — the per-regressor variance factors for t-stats
    * (SURVEY.md §2.6 M2). */
  def xtxInvDiag(x: Mat): Array[Double] = {
    val xt = transpose(x)
    inverse(matmul(xt, x)).zipWithIndex.map { case (row, i) => row(i) }
  }
}
