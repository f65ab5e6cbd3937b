package graft.glm

/** Student-t distribution CDF / two-sided p-values in pure Scala
  * (SURVEY.md §2.6 M3, §7.5.3): no external math dependency is resolvable
  * offline, so the regularized incomplete beta is implemented directly —
  * Lanczos log-gamma plus the Lentz continued fraction (the standard
  * numerical-recipes formulation, public domain mathematics).
  *
  * p_two_sided(t, df) = I_{df/(df+t²)}(df/2, 1/2).
  */
object TDist {

  private val lanczosG = 7.0
  private val lanczosCoefs = Array(
    0.99999999999980993, 676.5203681218851, -1259.1392167224028,
    771.32342877765313, -176.61502916214059, 12.507343278686905,
    -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7,
  )

  /** log Γ(x) for x > 0 (Lanczos approximation, |err| < 1e-13). */
  def logGamma(x0: Double): Double = {
    if (x0 < 0.5) {
      // reflection: Γ(x)Γ(1−x) = π / sin(πx)
      math.log(math.Pi / math.sin(math.Pi * x0)) - logGamma(1.0 - x0)
    } else {
      val x = x0 - 1.0
      var a = lanczosCoefs(0)
      val t = x + lanczosG + 0.5
      var i = 1
      while (i < lanczosCoefs.length) { a += lanczosCoefs(i) / (x + i); i += 1 }
      0.5 * math.log(2.0 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Continued fraction for the incomplete beta (modified Lentz). */
  private def betacf(a: Double, b: Double, x: Double): Double = {
    val maxIter = 300
    val eps = 1e-15
    val fpmin = 1e-300
    val qab = a + b; val qap = a + 1.0; val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < fpmin) d = fpmin
    d = 1.0 / d
    var h = d
    var m = 1
    while (m <= maxIter) {
      val m2 = 2 * m
      var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
      d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      h *= d * c
      aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
      d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
      c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      val del = d * c
      h *= del
      if (math.abs(del - 1.0) < eps) return h
      m += 1
    }
    h
  }

  /** Regularized incomplete beta I_x(a, b), 0 ≤ x ≤ 1. */
  def regIncBeta(a: Double, b: Double, x: Double): Double = {
    require(x >= 0.0 && x <= 1.0, s"x out of range: $x")
    if (x == 0.0) 0.0
    else if (x == 1.0) 1.0
    else {
      val lbeta = logGamma(a + b) - logGamma(a) - logGamma(b) +
        a * math.log(x) + b * math.log(1.0 - x)
      val front = math.exp(lbeta)
      if (x < (a + 1.0) / (a + b + 2.0)) front * betacf(a, b, x) / a
      else 1.0 - math.exp(
        logGamma(a + b) - logGamma(a) - logGamma(b) +
          b * math.log(1.0 - x) + a * math.log(x)) * betacf(b, a, 1.0 - x) / b
    }
  }

  /** Two-sided p-value of a t statistic with `df` degrees of freedom.
    * Total over its input domain: NaN t, NaN df, and df ≤ 0 all yield NaN
    * (a NaN df must not reach regIncBeta's range check — `!(df > 0)` is
    * true for NaN where `df <= 0` is not). */
  def pTwoSided(t: Double, df: Double): Double = {
    if (t.isNaN || !(df > 0)) Double.NaN
    else regIncBeta(df / 2.0, 0.5, df / (df + t * t))
  }

  /** CDF of the t distribution (NaN-total like pTwoSided). */
  def cdf(t: Double, df: Double): Double = {
    if (t.isNaN || !(df > 0)) Double.NaN
    else {
      val p = 0.5 * regIncBeta(df / 2.0, 0.5, df / (df + t * t))
      if (t >= 0) 1.0 - p else p
    }
  }
}
