package graft.stats

import org.scalatest.funsuite.AnyFunSuite

/** Pin the distribution kernel against independently computed
  * arbitrary-precision constants (mpmath, 30 significant digits —
  * the same values scipy returns to double precision). No Spark needed.
  */
class DistributionsSpec extends AnyFunSuite {
  import Distributions._

  private def close(got: Double, want: Double, tol: Double = 1e-11): Unit =
    assert(math.abs(got - want) < tol, s"got $got, want $want")

  test("logGamma matches Γ at integer/half-integer anchors") {
    close(logGamma(1.0), 0.0)
    close(logGamma(2.0), 0.0)
    close(logGamma(5.0), math.log(24.0))
    close(logGamma(0.5), math.log(math.sqrt(math.Pi)))
  }

  test("normInv: Φ⁻¹(0.975) = 1.95996398454005424 and round-trips") {
    close(normInv(0.975), 1.9599639845400542)
    close(normInv(0.025), -1.9599639845400542)
    close(normCdf(1.2345), 0.8914916766373298)
    close(normCdf(normInv(0.123456)), 0.123456, 1e-12)
  }

  test("tInv: t quantiles at (0.975, df=10), (0.975, df=399), (0.995, df=4)") {
    close(tInv(0.975, 10), 2.2281388519862747)
    close(tInv(0.975, 399), 1.9659272959208821)
    close(tInv(0.995, 4), 4.6040948713499932, 1e-10)
    close(tInv(0.5, 77), 0.0)
  }

  test("tCdf / two-sided p: t=2 df=7; t=2.5 df=13.7 (Welch fractional df)") {
    close(tCdf(2.0, 7), 0.9571903357185120)
    close(tTwoSidedP(2.5, 13.7), 0.0257846564713731)
    close(tCdf(-2.0, 7), 1.0 - 0.9571903357185120)
  }

  test("chi2P: sf(31.4, df=24) = 0.14258105315224929") {
    close(chi2P(31.4, 24), 0.1425810531522493)
    close(chi2P(0.0, 5), 1.0)
  }

  test("fP: sf(3.2, 24, 9000) = 2.122603495e-7 (ANOVA-shaped dfs)") {
    close(fP(3.2, 24, 9000), 2.122603495005951e-7, 1e-15)
    close(fP(0.0, 3, 100), 1.0)
  }

  test("symmetry: tCdf(t) + tCdf(-t) = 1 across a grid (property)") {
    for (t <- Seq(0.1, 0.7, 1.3, 2.9, 8.0); df <- Seq(1.0, 3.5, 12.0, 250.0))
      close(tCdf(t, df) + tCdf(-t, df), 1.0, 1e-13)
  }

  test("tInv round-trips through tCdf (property)") {
    for (p <- Seq(0.01, 0.2, 0.6, 0.975, 0.999); df <- Seq(2.0, 9.0, 55.0, 1200.0))
      close(tCdf(tInv(p, df), df), p, 1e-10)
  }

  test("studentized range: q(k, df) pinned vs published tables at df ∈ {5,10,30,120,∞}") {
    // Standard q_{0.05} tables publish 3-4 significant digits; the
    // exact Gauss–Legendre integration must land within rounding of
    // every one of them. (Tighter mpmath pins below.)
    val published = Seq(
      (2, 5.0, 3.635), (2, 10.0, 3.151), (2, 30.0, 2.888),
      (2, 120.0, 2.800), (2, Double.PositiveInfinity, 2.772),
      (3, 5.0, 4.602), (3, 10.0, 3.877), (3, 30.0, 3.486),
      (3, 120.0, 3.356), (3, Double.PositiveInfinity, 3.314),
      (5, 5.0, 5.673), (5, 10.0, 4.654), (5, 30.0, 4.102),
      (5, 120.0, 3.917), (5, Double.PositiveInfinity, 3.858))
    for ((k, df, want) <- published)
      close(studentizedRangeInv(0.95, k, df), want, 2.5e-3)
  }

  test("studentized range: tiny dfs bracket adaptively (df=1 needs q far beyond the default hi edge)") {
    // published q_{0.05} at df ∈ {1, 2} — the quantiles the fixed
    // [1e-3, 40] bracket could not reach (q(6, 1) ≈ 40.4)
    val published = Seq(
      (2, 1.0, 17.97), (3, 1.0, 26.98), (6, 1.0, 40.41),
      (2, 2.0, 6.085), (6, 2.0, 11.73))
    for ((k, df, want) <- published)
      assert(math.abs(studentizedRangeInv(0.95, k, df) / want - 1.0) < 2e-3,
        s"q(0.95, $k, $df): got ${studentizedRangeInv(0.95, k, df)}, want ~$want")
  }

  test("studentized range: k=2 ∞ case is the √2·z closed form; CDF is a CDF") {
    // range of 2 normals = |N(0,√2)| → q_{0.05}(2, ∞) = √2·Φ⁻¹(0.975)
    close(studentizedRangeInv(0.95, 2, Double.PositiveInfinity),
      math.sqrt(2.0) * 1.9599639845400542, 1e-7)
    close(normalRangeCdf(1e9, 4), 1.0, 1e-12)
    assert(normalRangeCdf(0.0, 4) === 0.0)
    // monotone in q, decreasing in df at fixed q
    assert(studentizedRangeCdf(3.0, 3, 10.0) < studentizedRangeCdf(3.5, 3, 10.0))
    assert(studentizedRangeCdf(3.5, 3, 10.0) < studentizedRangeCdf(3.5, 3, 1000.0))
    // quantile round-trips through the CDF
    for (df <- Seq(7.0, 40.0, 500.0))
      close(studentizedRangeCdf(studentizedRangeInv(0.95, 3, df), 3, df), 0.95, 1e-7)
  }

  test("tukeyQcrit05(k, df): interpolation tracks exact within 1e-3, floor enforced") {
    // off-grid dfs: the 1/df interpolation over the exact grid stays
    // within ~1e-3 of direct integration (the grid exists so the
    // SQL oracle can mirror q_crit bit-identically, not for speed)
    for (df <- Seq(5.25, 7.5, 13.0, 25.0, 75.0, 300.0, 7000.0))
      close(tukeyQcrit05(3, df), studentizedRangeInv(0.95, 3, df), 1e-3)
    // grid rows are the exact values themselves
    close(tukeyQcrit05(3, 10.0), studentizedRangeInv(0.95, 3, 10.0), 1e-9)
    // huge df converges to the ∞ value
    close(tukeyQcrit05(3, 1e9), studentizedRangeInv(0.95, 3, Double.PositiveInfinity), 1e-6)
    // the ∞ value alone would be anti-conservative by >10% at df=5
    assert(tukeyQcrit05(3, 5.0) / tukeyQcrit05(3) > 1.1)
    assertThrows[IllegalArgumentException](tukeyQcrit05(3, 4.0))
    assertThrows[IllegalArgumentException](tukeyQcrit05(25))
  }
}
