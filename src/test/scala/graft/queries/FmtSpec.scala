package graft.queries

import graft.SparkSpec

/** Fmt.trunc portability properties + dedup idempotence (SURVEY §5.2 #3).
  * Property-style: seeded random sampling (scalacheck's bridge artifact
  * isn't in the offline cache, so properties are checked with explicit
  * deterministic sample loops — same coverage, reproducible seeds). */
class FmtSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(4242)

  test("trunc(x, 6) equals floor(x*1e6 + 1e-6)/1e6 exactly over random samples (property)") {
    val xs = Seq.fill(200)((rnd.nextDouble() - 0.5) * 2e6)
    val got = xs.toDF("x").select(Fmt.trunc($"x", 6)).as[Double].collect()
    val want = xs.map(x => math.floor(x * 1e6 + 1e-6) / 1e6)
    assert(got.toSeq === want)
  }

  test("trunc matches the JVM reference computation for negatives too (portability property)") {
    // NOTE trunc is deliberately NOT idempotent-in-general (floor on the
    // re-scaled representation can step once more for some negative
    // doubles) — the property the oracles rely on is only that both
    // engines compute the identical result from the same input double.
    val xs = Seq.fill(200)(-(rnd.nextDouble()) * 1e4)
    val got = xs.toDF("x").select(Fmt.trunc($"x", 6)).as[Double].collect()
    val want = xs.map(x => math.floor(x * 1e6 + 1e-6) / 1e6)
    assert(got.toSeq === want)
  }

  test("trunc at an exact decimal boundary stays put (the 0.2600625 case)") {
    // 41.61/160 = 0.2600625 — the HALF_UP vs binary-round divergence that
    // motivated truncation over round() (see Fmt scaladoc).
    val got = Seq(41.61 / 160.0).toDF("x").select(Fmt.trunc($"x", 6)).as[Double].head()
    assert(got === 0.260062)
  }

  test("the epsilon absorbs sub-noise perturbations at exact decimal grid lines") {
    // the j2/j3 class: an average lands exactly on a 3-decimal value and
    // the two engines' sums differ by ~1e-13 — without the epsilon the
    // floor flips between 78.753999 and 78.754.
    val got = Seq(78.754, 78.754 - 1e-13, 78.754 + 1e-13).toDF("x")
      .select(Fmt.trunc($"x", 6)).as[Double].collect().toSeq
    assert(got === Seq(78.754, 78.754, 78.754))
  }

  test("dropDuplicates is idempotent: dedup(dedup(df)) == dedup(df) (SURVEY §5.2 #3)") {
    (1 to 3).foreach { _ =>
      val pairs = List.fill(60)((rnd.nextInt(10), rnd.nextInt(5)))
      val df = pairs.toDF("a", "b")
      val once = df.dropDuplicates(Seq("a", "b"))
      val twice = once.dropDuplicates(Seq("a", "b"))
      assert(once.count() === twice.count())
      assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
      assert(once.count() === pairs.distinct.size)
    }
  }
}
