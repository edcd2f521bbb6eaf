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

  test("tukeyQcrit05 anchors: k=2 is √2·z₀.₉₇₅; k=3 = 3.314") {
    close(tukeyQcrit05(2), math.sqrt(2.0) * 1.9599639845400542, 5e-3)
    assert(tukeyQcrit05(3) === 3.314)
    assertThrows[IllegalArgumentException](tukeyQcrit05(25))
  }

  test("tukeyQcrit05(k, df): table rows exact, interpolation close, floor enforced") {
    // exact table rows
    assert(tukeyQcrit05(3, 10.0) === 3.877)
    assert(tukeyQcrit05(4, 30.0) === 3.845)
    // df=9 interpolates between the 5 and 10 rows; published q(3,9)=3.948
    close(tukeyQcrit05(3, 9.0), 3.948, 0.02)
    // huge df converges to the ∞ row
    close(tukeyQcrit05(3, 1e9), 3.314, 1e-6)
    // df ≥ 120 uses the ∞/120 closed-form blend (mirrored in x6's oracle)
    close(tukeyQcrit05(3, 240.0), 3.314 + (3.356 - 3.314) * 0.5, 1e-12)
    // the ∞ row alone would be anti-conservative by >10% here
    assert(tukeyQcrit05(3, 5.0) / tukeyQcrit05(3) > 1.1)
    assertThrows[IllegalArgumentException](tukeyQcrit05(3, 4.0))
  }
}
