package graft.stats

/** Distribution math for the statistical-test kernel (SURVEY §2.10
  * X2-X9): log-gamma, regularized incomplete gamma/beta, and the CDFs /
  * quantiles built on them (Student t, F, χ², normal).
  *
  * All pure driver-side math on `Double`; the aggregates feeding these
  * are computed distributed, and p-values are evaluated per *group row*
  * (tens of rows), so scalar evaluation is never on the hot path. When
  * needed inside a plan, wrap in a UDF over the aggregated frame — the
  * per-row cost is microseconds on data that has already been reduced
  * by a factor of ~10⁶.
  *
  * Algorithms are the standard public-domain numerical methods
  * (Lanczos log-gamma; Lentz continued fractions for the incomplete
  * beta; power series + CF for the incomplete gamma), accurate to
  * ~1e-12 — unit-tested against scipy-derived fixture constants
  * (DistributionsSpec).
  */
object Distributions {

  /** Lanczos approximation, g = 7, 9 coefficients. |err| < 1e-13. */
  def logGamma(x: Double): Double = {
    require(x > 0, s"logGamma domain: x > 0, got $x")
    val g = 7.0
    val c = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (x < 0.5) {
      // reflection: Γ(x)Γ(1−x) = π / sin(πx)
      math.log(math.Pi / math.sin(math.Pi * x)) - logGamma(1.0 - x)
    } else {
      val z = x - 1.0
      var a = c(0)
      var i = 1
      while (i < 9) { a += c(i) / (z + i); i += 1 }
      val t = z + g + 0.5
      0.5 * math.log(2.0 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** Regularized lower incomplete gamma P(a, x) — χ² CDF building block. */
  def regGammaP(a: Double, x: Double): Double = {
    require(a > 0 && x >= 0, s"regGammaP domain: a>0, x>=0, got ($a, $x)")
    if (x == 0) 0.0
    else if (x < a + 1.0) {
      // power series
      var sum = 1.0 / a
      var term = sum
      var n = 1
      while (math.abs(term) > math.abs(sum) * 1e-16 && n < 500) {
        term *= x / (a + n); sum += term; n += 1
      }
      sum * math.exp(-x + a * math.log(x) - logGamma(a))
    } else 1.0 - regGammaQCf(a, x)
  }

  /** Upper regularized incomplete gamma via Lentz continued fraction. */
  private def regGammaQCf(a: Double, x: Double): Double = {
    val fpmin = 1e-300
    var b = x + 1.0 - a
    var c = 1.0 / fpmin
    var d = 1.0 / b
    var h = d
    var i = 1
    var del = 0.0
    do {
      val an = -i * (i - a)
      b += 2.0
      d = an * d + b; if (math.abs(d) < fpmin) d = fpmin
      c = b + an / c; if (math.abs(c) < fpmin) c = fpmin
      d = 1.0 / d
      del = d * c
      h *= del
      i += 1
    } while (math.abs(del - 1.0) > 1e-16 && i < 500)
    math.exp(-x + a * math.log(x) - logGamma(a)) * h
  }

  /** Regularized incomplete beta I_x(a, b) — t and F CDF building block. */
  def regBeta(x: Double, a: Double, b: Double): Double = {
    require(a > 0 && b > 0 && x >= 0 && x <= 1, s"regBeta domain: got ($x, $a, $b)")
    if (x == 0.0) 0.0
    else if (x == 1.0) 1.0
    else {
      val lbeta = logGamma(a) + logGamma(b) - logGamma(a + b)
      val front = math.exp(a * math.log(x) + b * math.log(1.0 - x) - lbeta)
      if (x < (a + 1.0) / (a + b + 2.0)) front * betaCf(x, a, b) / a
      else 1.0 - front * betaCf(1.0 - x, b, a) / b
    }
  }

  /** Lentz continued fraction for the incomplete beta. */
  private def betaCf(x: Double, a: Double, b: Double): Double = {
    val fpmin = 1e-300
    val qab = a + b; val qap = a + 1.0; val qam = a - 1.0
    var c = 1.0
    var d = 1.0 - qab * x / qap
    if (math.abs(d) < fpmin) d = fpmin
    d = 1.0 / d
    var h = d
    var m = 1
    var del = 0.0
    do {
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
      del = d * c
      h *= del
      m += 1
    } while (math.abs(del - 1.0) > 1e-16 && m < 500)
    h
  }

  // ---- CDFs ---------------------------------------------------------------

  /** Student t CDF (two use sites: Welch p-value, CI sanity checks). */
  def tCdf(t: Double, df: Double): Double = {
    val x = df / (df + t * t)
    val p = 0.5 * regBeta(x, df / 2.0, 0.5)
    if (t > 0) 1.0 - p else p
  }

  /** Two-sided t-test p-value. */
  def tTwoSidedP(t: Double, df: Double): Double =
    regBeta(df / (df + t * t), df / 2.0, 0.5)

  /** χ² upper-tail p-value (X7). */
  def chi2P(stat: Double, df: Double): Double = 1.0 - regGammaP(df / 2.0, stat / 2.0)

  /** F distribution upper-tail p-value (X5 ANOVA). */
  def fP(f: Double, df1: Double, df2: Double): Double =
    if (f <= 0) 1.0
    else regBeta(df2 / (df2 + df1 * f), df2 / 2.0, df1 / 2.0)

  /** Standard normal CDF via erfc-free Abramowitz-Stegun-grade series —
    * implemented through the incomplete gamma for full precision. */
  def normCdf(z: Double): Double = {
    val p = 0.5 * regGammaP(0.5, z * z / 2.0)
    if (z >= 0) 0.5 + p else 0.5 - p
  }

  /** Inverse standard normal CDF (Acklam's rational approximation +
    * one Halley refinement step → ~1e-15). */
  def normInv(p: Double): Double = {
    require(p > 0 && p < 1, s"normInv domain: 0<p<1, got $p")
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
      1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
      6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
      -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00)
    val dd = Array(7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
      3.754408661907416e+00)
    val plow = 0.02425
    val x0 =
      if (p < plow) {
        val q = math.sqrt(-2 * math.log(p))
        (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((dd(0) * q + dd(1)) * q + dd(2)) * q + dd(3)) * q + 1)
      } else if (p <= 1 - plow) {
        val q = p - 0.5; val r = q * q
        (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
          (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
      } else {
        val q = math.sqrt(-2 * math.log(1 - p))
        -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
          ((((dd(0) * q + dd(1)) * q + dd(2)) * q + dd(3)) * q + 1)
      }
    // one Halley step against the exact CDF
    val e = normCdf(x0) - p
    val u = e * math.sqrt(2 * math.Pi) * math.exp(x0 * x0 / 2.0)
    x0 - u / (1.0 + x0 * u / 2.0)
  }

  /** Inverse Student t CDF (quantile), bisection + Newton hybrid on the
    * exact CDF — deterministic, ~1e-12, used on tiny aggregated frames. */
  def tInv(p: Double, df: Double): Double = {
    require(p > 0 && p < 1, s"tInv domain: 0<p<1, got $p")
    if (p == 0.5) return 0.0
    // bracket from the normal quantile, expand if needed
    var lo = -1e3; var hi = 1e3
    var x = normInv(p) * math.sqrt(df / math.max(df - 2.0, 0.5))
    var i = 0
    while (i < 100) {
      val err = tCdf(x, df) - p
      if (math.abs(err) < 1e-14) return x
      if (err > 0) hi = math.min(hi, x) else lo = math.max(lo, x)
      // Newton step with bisection fallback
      val pdf = math.exp(logGamma((df + 1) / 2) - logGamma(df / 2) -
        0.5 * math.log(df * math.Pi) - (df + 1) / 2.0 * math.log1p(x * x / df))
      val nx = x - err / pdf
      x = if (nx > lo && nx < hi) nx else (lo + hi) / 2.0
      i += 1
    }
    x
  }

  /** Studentized-range critical values q_{0.05}(k, df) for Tukey HSD
    * (X6), k = 2..20 — table-driven per SURVEY §7.2 (exact integration
    * is out of scope). Rows at df = 5, 10, 20, 30, 60, 120, ∞ from
    * standard studentized-range tables; between rows the value is
    * linearly interpolated in 1/df (the standard convention), which
    * keeps the error well under 1% — vs >10% if the ∞ row were used
    * at df ≈ 5-20. */
  private val q05Inf: Map[Int, Double] = Map(
    2 -> 2.772, 3 -> 3.314, 4 -> 3.633, 5 -> 3.858, 6 -> 4.030,
    7 -> 4.170, 8 -> 4.286, 9 -> 4.387, 10 -> 4.474, 11 -> 4.552,
    12 -> 4.622, 13 -> 4.685, 14 -> 4.743, 15 -> 4.796, 16 -> 4.845,
    17 -> 4.891, 18 -> 4.934, 19 -> 4.974, 20 -> 5.012)

  private val q05ByDf: Seq[(Double, Map[Int, Double])] = Seq(
    5.0 -> Map(
      2 -> 3.635, 3 -> 4.602, 4 -> 5.218, 5 -> 5.673, 6 -> 6.033,
      7 -> 6.330, 8 -> 6.582, 9 -> 6.801, 10 -> 6.995, 11 -> 7.167,
      12 -> 7.323, 13 -> 7.466, 14 -> 7.596, 15 -> 7.716, 16 -> 7.828,
      17 -> 7.932, 18 -> 8.030, 19 -> 8.122, 20 -> 8.208),
    10.0 -> Map(
      2 -> 3.151, 3 -> 3.877, 4 -> 4.327, 5 -> 4.654, 6 -> 4.912,
      7 -> 5.124, 8 -> 5.305, 9 -> 5.461, 10 -> 5.599, 11 -> 5.722,
      12 -> 5.833, 13 -> 5.935, 14 -> 6.028, 15 -> 6.114, 16 -> 6.194,
      17 -> 6.269, 18 -> 6.339, 19 -> 6.405, 20 -> 6.467),
    20.0 -> Map(
      2 -> 2.950, 3 -> 3.578, 4 -> 3.958, 5 -> 4.232, 6 -> 4.445,
      7 -> 4.620, 8 -> 4.768, 9 -> 4.896, 10 -> 5.008, 11 -> 5.108,
      12 -> 5.199, 13 -> 5.282, 14 -> 5.357, 15 -> 5.427, 16 -> 5.492,
      17 -> 5.553, 18 -> 5.610, 19 -> 5.663, 20 -> 5.714),
    30.0 -> Map(
      2 -> 2.888, 3 -> 3.486, 4 -> 3.845, 5 -> 4.102, 6 -> 4.302,
      7 -> 4.464, 8 -> 4.602, 9 -> 4.720, 10 -> 4.824, 11 -> 4.917,
      12 -> 5.001, 13 -> 5.077, 14 -> 5.147, 15 -> 5.211, 16 -> 5.271,
      17 -> 5.327, 18 -> 5.379, 19 -> 5.429, 20 -> 5.475),
    60.0 -> Map(
      2 -> 2.829, 3 -> 3.399, 4 -> 3.737, 5 -> 3.977, 6 -> 4.163,
      7 -> 4.314, 8 -> 4.441, 9 -> 4.550, 10 -> 4.646, 11 -> 4.732,
      12 -> 4.808, 13 -> 4.878, 14 -> 4.942, 15 -> 5.001, 16 -> 5.056,
      17 -> 5.107, 18 -> 5.154, 19 -> 5.199, 20 -> 5.241),
    120.0 -> Map(
      2 -> 2.800, 3 -> 3.356, 4 -> 3.685, 5 -> 3.917, 6 -> 4.096,
      7 -> 4.241, 8 -> 4.363, 9 -> 4.468, 10 -> 4.560, 11 -> 4.641,
      12 -> 4.714, 13 -> 4.781, 14 -> 4.842, 15 -> 4.898, 16 -> 4.950,
      17 -> 4.998, 18 -> 5.044, 19 -> 5.086, 20 -> 5.126))

  /** q_{0.05}(k, ∞) — kept for callers that know their dfs are huge. */
  def tukeyQcrit05(k: Int): Double = {
    require(k >= 2 && k <= 20, s"tukeyQcrit05 table covers k in [2,20], got $k")
    q05Inf(k)
  }

  /** q_{0.05}(k, dfWithin) with 1/df interpolation; requires
    * dfWithin ≥ 5 (below the table, no safe extrapolation). For
    * df ≥ 120 the ∞ and 120 rows are blended as
    * q∞ + (q₁₂₀ − q∞)·(120/df) — the same closed form the SQL oracle
    * mirrors. */
  def tukeyQcrit05(k: Int, dfWithin: Double): Double = {
    require(k >= 2 && k <= 20, s"tukeyQcrit05 table covers k in [2,20], got $k")
    require(dfWithin >= 5.0, s"tukeyQcrit05 needs dfWithin >= 5, got $dfWithin")
    if (dfWithin >= 120.0)
      q05Inf(k) + (q05ByDf.last._2(k) - q05Inf(k)) * (120.0 / dfWithin)
    else {
      val x = 1.0 / dfWithin
      // bracketing rows in 1/df space (rows are ascending in df)
      val pts = q05ByDf.map { case (df, m) => (1.0 / df, m(k)) }.sortBy(_._1)
      val (x1, y1) = pts.takeWhile(_._1 <= x).lastOption.getOrElse(pts.head)
      val (x2, y2) = pts.dropWhile(_._1 < x).headOption.getOrElse(pts.last)
      if (x2 == x1) y1 else y1 + (y2 - y1) * (x - x1) / (x2 - x1)
    }
  }
}
