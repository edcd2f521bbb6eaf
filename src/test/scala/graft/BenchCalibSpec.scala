package graft

import org.scalatest.funsuite.AnyFunSuite

import BenchCalib.Probe

/** Replays the round-8 driver incident against the calibration classifier.
  *
  * The incident: BENCH_r08.json's driver run totaled 164 s (3.1x the quiet
  * record) during a sustained many-core contention phase at suite-clock
  * ~195-262 s, yet self-classified `"quiet", ratio 1.02` — the run-wide
  * MEDIAN of a single-thread spin probe erased the burst, and the 32-task
  * Spark probe fired only at the (quiet) endpoints. These cases pin the two
  * fixes: windowed classification over the merged probe timeline, and the
  * Spark probe on the same cadence so core-removal steal (invisible to a
  * one-thread spin) still registers.
  */
class BenchCalibSpec extends AnyFunSuite {

  private val quietSpin = Bench.QuietSpinS
  private val quietSpark = Bench.QuietSparkS

  /** The EXACT spin trace from BENCH_r08.json's tail (driver run), with the
    * r8 reality of no mid-run Spark probes (NaN = skipped). */
  private val r8DriverSpins = Seq(
    0.309, 0.335, 0.309, 0.475, 0.506, 0.310, 0.310, 0.309, 2.227, 0.304,
    1.097, 1.320, 0.403, 0.393, 0.304, 0.305, 0.317)
  private val r8DriverAts = Seq(
    0.0, 7.7, 29.7, 54.3, 75.2, 98.3, 145.4, 172.4, 195.3, 218.1, 238.9,
    261.7, 323.9, 350.9, 374.1, 395.6, 398.2)

  test("r8 driver incident trace (spin-only) now classifies degraded") {
    val probes = r8DriverAts.zip(r8DriverSpins).map { case (at, s) => Probe(at, s, Double.NaN) }
    val v = BenchCalib.classify(probes, quietSpin, quietSpark)
    assert(v.klass == "degraded",
      s"the r8 run that self-classified quiet must read degraded; got $v")
    // the burst is visible in both windowed views
    assert(v.frac15 > 0.2 || v.worst2 >= Bench.StealRatio)
  }

  test("core-removal steal: quiet spins but inflated 32-task probes => degraded") {
    // the mode the spin probe is structurally blind to — contention that
    // removes cores from the pool leaves one thread's cycles untouched
    val probes = (0 until 14).map { i =>
      val inflamed = i >= 6 && i <= 10 // a 5-probe (~100 s) contention phase
      Probe(i * 20.0, 0.31, if (inflamed) 1.4 else 0.34)
    }
    val v = BenchCalib.classify(probes, quietSpin, quietSpark)
    assert(v.klass == "degraded", s"spin-blind contention must classify degraded; got $v")
  }

  test("a single isolated probe spike stays quiet (sampling noise, not a phase)") {
    val probes = (0 until 14).map { i =>
      Probe(i * 20.0, if (i == 7) 0.55 else 0.31, 0.34)
    }
    val v = BenchCalib.classify(probes, quietSpin, quietSpark)
    assert(v.klass == "quiet", s"one 1.8x spike among 14 quiet probes is noise; got $v")
  }

  test("fully quiet trace classifies quiet with ratio ~1") {
    val probes = (0 until 12).map(i => Probe(i * 20.0, 0.305, 0.335))
    val v = BenchCalib.classify(probes, quietSpin, quietSpark)
    assert(v.klass == "quiet")
    assert(v.ratio > 0.8 && v.ratio < 1.2)
    assert(v.frac15 == 0.0)
  }

  test("sustained heavy steal classifies severe") {
    val probes = (0 until 10).map(i => Probe(i * 20.0, 1.6, 1.8))
    val v = BenchCalib.classify(probes, quietSpin, quietSpark)
    assert(v.klass == "severe")
  }

  test("suspect flags: r8's inflated queries flag, small-noise and new queries don't") {
    val quietRef = Map(
      "dd6_ngram_jaccard" -> 1.03, "ss2_ivf_ann" -> 1.09,
      "llm3_semantic_diversity" -> 0.34, "j7_map_lookup" -> 0.04)
    val best = Map(
      "dd6_ngram_jaccard" -> 19.03,        // r8 driver: 18.5x — flag
      "ss2_ivf_ann" -> 16.98,              // r8 driver: both iters slow — flag
      "llm3_semantic_diversity" -> 9.65,   // r8 driver: 28x — flag
      "j7_map_lookup" -> 0.15,             // 3.8x but +0.11 s absolute — noise floor
      "st9_new_this_round" -> 5.0)         // absent from ref — never flagged
    val flagged = BenchCalib.suspects(best, quietRef).map(_._1)
    assert(flagged.toSet == Set("dd6_ngram_jaccard", "ss2_ivf_ann", "llm3_semantic_diversity"))
  }

  test("parseQuietRef reads the tools/quietref.py file shape") {
    val text =
      """{ "_source": "min across ...", "queries": {
        |  "a1_descriptive_stats": 1.032,
        |  "dd6_ngram_jaccard": 1.03
        | } }""".stripMargin
    val m = BenchCalib.parseQuietRef(text)
    assert(m == Map("a1_descriptive_stats" -> 1.032, "dd6_ngram_jaccard" -> 1.03))
    assert(BenchCalib.parseQuietRef("not json at all").isEmpty)
    assert(BenchCalib.parseQuietRef("""{"queries":{}}""").isEmpty)
  }

  test("the committed QUIET_REF.json parses and covers the registered queries") {
    val p = java.nio.file.Paths.get("bench_history/QUIET_REF.json")
    assert(java.nio.file.Files.isReadable(p), "bench_history/QUIET_REF.json must be committed")
    val m = BenchCalib.parseQuietRef(java.nio.file.Files.readString(p))
    assert(m.nonEmpty)
    // every reference entry is a plausible quiet-host seconds value
    m.foreach { case (q, s) => assert(s > 0 && s < 900, s"$q -> $s") }
    // r8's registered queries are all present (new-this-round queries may lag
    // one round until their first quiet record is committed)
    val missing = m.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"QUIET_REF has queries not in the registry: $missing")
  }
}
