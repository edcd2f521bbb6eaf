package graft.ml

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GramOls (the one-pass x10 ladder): prediction parity with spark.ml's
  * RFormula+LinearRegression path on full-rank designs, pinv behavior
  * on rank-deficient ones, and the one-scan-for-all-models contract. */
class GramOlsSpec extends SparkSpec {
  import spark.implicits._

  /** Same AR(1) lag-persistent fixture as MlModelsSpec. */
  private lazy val lagData = {
    val rnd = new scala.util.Random(7)
    val rows = for {
      st <- 0 until 20
      series = Iterator.iterate(0.5)(r =>
        math.min(0.98, math.max(0.02, 0.5 + 0.95 * (r - 0.5) + rnd.nextGaussian() * 0.03)))
        .take(201).toVector
      t <- 1 until 201
    } yield (s"s$st", s"d${st % 5}", (t % 24).toString, series(t), series(t - 1))
    rows.toDF("station", "district", "hour_str", "rate", "rate_lag1").cache()
  }
  private val cats = Set("district", "hour_str")

  test("gram fit predictions equal spark.ml's RFormula+LR fit (full-rank designs)") {
    for (f <- Seq("rate ~ district", "rate ~ district + hour_str + rate_lag1")) {
      val gram = GramOls.ladder(lagData, Seq(f), cats)(f)
      val ml = Models.olsFit(lagData, f)
      // same parameter count even though the dummy basis differs
      assert(gram.terms.length === Models.lrStage(ml).numFeatures, f)
      val maxDiff = ml.transform(lagData)
        .withColumn("p_gram", gram.column)
        .select(max(abs(col("p_gram") - col("prediction")))).as[Double].head()
      // both are exact least-squares solutions of the same full-rank
      // system; only conditioning-amplified float noise separates them
      assert(maxDiff < 1e-8, s"$f maxDiff=$maxDiff")
    }
  }

  test("rank-deficient design: pinv yields finite coefficients and the unique LS fitted values") {
    // rate_dup ≡ rate_lag1 duplicated — the design matrix loses a rank,
    // the x10-M2 situation (statsmodels pinv-solves it silently)
    val df = lagData.withColumn("rate_dup", col("rate_lag1"))
    val deficient = "rate ~ district + rate_lag1 + rate_dup"
    val reduced = "rate ~ district + rate_lag1"
    val ls = GramOls.ladder(df, Seq(deficient), cats)(deficient)
    assert(ls.terms.forall(t => java.lang.Double.isFinite(t.coef)))
    // fitted values are unique across every LS solution: compare with
    // the reduced full-rank model, whose column space is identical
    val lsRed = GramOls.ladder(df, Seq(reduced), cats)(reduced)
    val maxDiff = df.select(max(abs(ls.column - lsRed.column))).as[Double].head()
    // conditioning-amplified float noise only (the gram's combine order
    // varies with partitioning, so leave real headroom)
    assert(maxDiff < 1e-6, s"maxDiff=$maxDiff")
    // minimum-norm: the duplicated feature's weight splits evenly
    val w = ls.terms.collect {
      case LinearScore.Num(c, coef) if c == "rate_lag1" || c == "rate_dup" => coef
    }
    assert(w.length === 2 && math.abs(w(0) - w(1)) < 1e-6, w.toString)
  }

  test("randomized designs: gram fit ≡ spark.ml predictions over seeded random frames (property)") {
    val rnd = new scala.util.Random(17)
    val formulas = Seq(
      "y ~ x1", "y ~ cat1 + x1", "y ~ cat1 + cat2 + x2",
      "y ~ cat1 + cat2 + x1 + x2")
    for (trial <- 0 until 3) {
      val k1 = 3 + rnd.nextInt(3)
      val k2 = 2 + rnd.nextInt(4)
      val rows = Seq.fill(400) {
        val c1 = rnd.nextInt(k1); val c2 = rnd.nextInt(k2)
        val x1 = rnd.nextDouble() * 10 - 5; val x2 = rnd.nextGaussian() * 3
        val y = 0.7 * c1 - 0.4 * c2 + 0.9 * x1 - 1.3 * x2 + rnd.nextGaussian() * 0.5
        (s"a$c1", s"b$c2", x1, x2, y)
      }
      val df = rows.toDF("cat1", "cat2", "x1", "x2", "y")
      val formula = formulas(trial % formulas.length)
      val gram = GramOls.ladder(df, Seq(formula), Set("cat1", "cat2"))(formula)
      val ml = Models.olsFit(df, formula)
      val maxDiff = ml.transform(df)
        .withColumn("p", gram.column)
        .select(max(abs(col("p") - col("prediction")))).as[Double].head()
      assert(maxDiff < 1e-7, s"trial $trial formula '$formula' maxDiff=$maxDiff")
    }
  }

  test("rows with a null categorical are skipped whole, not fitted as base level") {
    val f = "rate ~ district + rate_lag1"
    val withNulls = lagData.withColumn("district",
      when(col("rate_lag1") > 0.8, lit(null)).otherwise(col("district")))
    val onNulls = GramOls.ladder(withNulls, Seq(f), cats)(f)
    val onFiltered = GramOls.ladder(
      withNulls.filter(col("district").isNotNull), Seq(f), cats)(f)
    assert(math.abs(onNulls.intercept - onFiltered.intercept) < 1e-9)
    def key(t: LinearScore.Term): (String, String) = t match {
      case LinearScore.Num(c, _)    => (c, "")
      case LinearScore.Cat(c, v, _) => (c, v)
    }
    val a = onNulls.terms.map(t => key(t) -> t.coef).toMap
    assert(onFiltered.terms.forall(t => math.abs(a(key(t)) - t.coef) < 1e-9))
  }

  /** Spark jobs launched while `thunk` runs (AQE may split one query
    * into several jobs, so absolute counts are config-dependent — the
    * ladder invariant below compares counts instead). */
  private def jobsDuring(thunk: => Unit): Int = {
    val starts = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
        starts.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      thunk
      // the listener bus posts asynchronously: wait until the count has
      // been stable for 500 ms (deadline 5 s) instead of a fixed nap,
      // so a lagging bus can't undercount one window and not the other
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      var last = -1
      var stableSince = System.nanoTime()
      while (System.nanoTime() < deadline &&
             (starts.get() != last ||
              System.nanoTime() - stableSince < 500L * 1000 * 1000)) {
        if (starts.get() != last) { last = starts.get(); stableSince = System.nanoTime() }
        Thread.sleep(25)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    starts.get()
  }

  test("a 3-model ladder launches no more jobs than a 1-model fit (one shared scan)") {
    lagData.count() // materialize the fixture cache outside the window
    val one = jobsDuring {
      GramOls.ladder(lagData, Seq("rate ~ district"), cats)
    }
    val three = jobsDuring {
      val out = GramOls.ladder(lagData, Seq(
        "rate ~ district",
        "rate ~ district + hour_str",
        "rate ~ district + hour_str + rate_lag1"), cats)
      assert(out.size === 3)
    }
    assert(three <= one, s"3-model ladder ran $three jobs vs $one for one model")
  }

  test("ladder story on the lag-persistent fixture: M1 < M2 < M3, M3 > 0.85") {
    val fs = Seq(
      "M1" -> "rate ~ district",
      "M2" -> "rate ~ district + hour_str",
      "M3" -> "rate ~ district + hour_str + rate_lag1")
    val fits = GramOls.ladder(lagData, fs.map(_._2), cats)
    def r2(f: String): Double = {
      val ls = fits(f)
      lagData.select(
        (lit(1.0) - sum(pow(col("rate") - ls.column, 2)) /
          (sum(col("rate") * col("rate")) -
            sum(col("rate")) * sum(col("rate")) / count(lit(1)))).as("r2"))
        .as[Double].head()
    }
    val ladder = fs.map { case (n, f) => n -> r2(f) }.toMap
    assert(ladder("M1") < ladder("M2") && ladder("M2") < ladder("M3"), ladder.toString)
    assert(ladder("M3") > 0.85, ladder.toString)
  }
}
