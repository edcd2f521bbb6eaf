package graft

/** Host-contention classifier for the benchmark artifact — the PURE half of
  * the self-calibration machinery, factored out of [[Bench]] so its decision
  * rules are unit-testable against replayed probe traces (BenchCalibSpec
  * replays the round-8 driver incident and requires `"degraded"`).
  *
  * Why two probes (the round-8 lesson): the single-threaded spin probe
  * measures one core's cycles, so hypervisor steal that REMOVES CORES from
  * the 32-way pool — rather than timeslicing the probe's own core — leaves
  * it at its quiet reference while every 32-task Spark stage runs 3-15x
  * long (driver r8 run: spins 0.30-0.33 s throughout, suite 164 s vs 54 s
  * quiet, self-classified "quiet" ratio 1.02). The 32-task Spark job probe
  * sees exactly that mode: it schedules through the same task pool the
  * queries use. Both probes now fire on the same ~20 s cadence and the
  * classifier takes the MAX of the two ratios per cadence point.
  *
  * Why windowed, not run-wide-median: a contention BURST (the r8 driver
  * phase ran ~t=195-262 s of a 280 s suite) is outvoted by quiet samples
  * under a median. The classifier therefore reports
  *  - `frac15`: fraction of per-point combined ratios >= [[Bench.StealRatio]]
  *  - `worst2`: the best (min) ratio inside the worst CONSECUTIVE-PAIR
  *    window — two adjacent probes both inflated is a sustained phase, not
  *    sampling noise
  * and classifies degraded when EITHER the run-wide median is inflated OR
  * a fifth of the probes are OR any sustained pair is. "Severe" keeps its
  * r7 meaning (the 30-50x phase) via the median or HALF the points >= 4x
  * (a sub-majority 4x burst is degraded, not severe — severe discards the
  * run wholesale, so it demands the inflation be the run's dominant mode).
  */
object BenchCalib {

  /** One cadence point: suite-clock offset plus both probes' seconds.
    * `sparkS` is NaN when the Spark probe was skipped at that point (e.g.
    * the session is mid-shutdown in the SIGTERM hook path). */
  final case class Probe(atS: Double, spinS: Double, sparkS: Double)

  final case class Verdict(
      klass: String,       // "quiet" | "degraded" | "severe"
      ratio: Double,       // max(median spin ratio, median spark ratio) — headline
      frac15: Double,      // fraction of per-point combined ratios >= StealRatio
      worst2: Double)      // min combined ratio over the worst consecutive pair (1.0 if <2 points)

  private def median(v: Seq[Double]): Double = {
    val s = v.sorted
    if (s.isEmpty) 1.0 else s(s.size / 2)
  }

  /** Classify a probe trace. `quietSpinS`/`quietSparkS` are the pinned
    * quiet-host references for the two probes (see [[Bench.QuietSpinS]] /
    * [[Bench.QuietSparkS]]). */
  def classify(probes: Seq[Probe], quietSpinS: Double, quietSparkS: Double,
               stealRatio: Double = Bench.StealRatio,
               severeRatio: Double = Bench.SevereRatio): Verdict = {
    val combined = probes.map { p =>
      val spin = p.spinS / quietSpinS
      val spark = if (p.sparkS.isNaN) Double.NaN else p.sparkS / quietSparkS
      if (spark.isNaN) spin else math.max(spin, spark)
    }
    val medSpin = median(probes.map(_.spinS / quietSpinS))
    val sparkRs = probes.collect { case p if !p.sparkS.isNaN => p.sparkS / quietSparkS }
    val medSpark = if (sparkRs.isEmpty) 1.0 else median(sparkRs)
    val ratio = math.max(medSpin, medSpark)
    val frac15 =
      if (combined.isEmpty) 0.0
      else combined.count(_ >= stealRatio).toDouble / combined.size
    val worst2 =
      if (combined.size < 2) 1.0
      else combined.sliding(2).map(_.min).max
    val medComb = median(combined)
    val frac4 =
      if (combined.isEmpty) 0.0
      else combined.count(_ >= severeRatio).toDouble / combined.size
    // severe = the MAJORITY of the run ran >= 4x (the r7 driver-phase mode);
    // a 4x BURST inside an otherwise-quiet run is degraded, not severe —
    // the distinction matters because a severe run's numbers are discarded
    // wholesale while a degraded run's per-query `suspect` flags say which
    // numbers survive
    val klass =
      if (medComb >= severeRatio || frac4 >= 0.5) "severe"
      else if (medComb >= stealRatio || frac15 >= 0.2 || worst2 >= stealRatio) "degraded"
      else "quiet"
    Verdict(klass, ratio, frac15, worst2)
  }

  /** Per-query suspect flags vs the committed quiet reference
    * (bench_history/QUIET_REF.json): a query is suspect when its BEST
    * measured iteration exceeds `SuspectFactor` x its quiet record AND the
    * absolute excess is non-trivial (`SuspectFloorS` — a 0.05 s query
    * reading 0.2 s is scheduler noise, not evidence). Queries absent from
    * the reference (new this round) are never flagged — their first quiet
    * record hasn't been committed yet. Returns (query -> (best_s, ref_s)).
    */
  val SuspectFactor = 3.0
  val SuspectFloorS = 0.5
  def suspects(best: Map[String, Double], quietRef: Map[String, Double])
      : Seq[(String, (Double, Double))] =
    best.toSeq.sortBy(_._1).flatMap { case (q, b) =>
      quietRef.get(q) match {
        case Some(r) if b > SuspectFactor * r && b - r > SuspectFloorS =>
          Some(q -> ((b, r)))
        case _ => None
      }
    }

  /** Minimal parser for QUIET_REF.json's flat `"queries":{"name":sec,...}`
    * map — no JSON library on the unmanaged classpath, and the file is
    * machine-written by tools/quietref.py with no nesting or escapes
    * inside the queries object. Returns empty on any shape surprise
    * (missing file handled by the caller): a bench run must never fail
    * because its reference artifact is absent or malformed. */
  def parseQuietRef(text: String): Map[String, Double] = {
    val start = text.indexOf("\"queries\"")
    if (start < 0) return Map.empty
    val open = text.indexOf('{', start)
    val close = text.indexOf('}', open)
    if (open < 0 || close < 0) return Map.empty
    val body = text.substring(open + 1, close)
    val Pair = """"([^"]+)"\s*:\s*([0-9eE+.\-]+)""".r
    Pair.findAllMatchIn(body).flatMap { m =>
      try Some(m.group(1) -> m.group(2).toDouble)
      catch { case _: NumberFormatException => None }
    }.toMap
  }
}
