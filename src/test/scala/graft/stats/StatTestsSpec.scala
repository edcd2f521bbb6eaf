package graft.stats

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Behavioural tests for the X2-X9 kernel on crafted fixtures with
  * independently computed (mpmath, 30-digit) expected values. */
class StatTestsSpec extends SparkSpec {
  import spark.implicits._

  // Two crafted samples with known exact moments:
  //   A = [0.1, 0.2, 0.3, 0.4, 0.5]  (n=5, mean=0.3, var=0.025)
  //   B = [0.3, 0.5, 0.7, 0.9]       (n=4, mean=0.6, var=0.0666..)
  private def twoGroups = (
    Seq(0.1, 0.2, 0.3, 0.4, 0.5).map(("A", _)) ++
      Seq(0.3, 0.5, 0.7, 0.9).map(("B", _))
  ).toDF("g", "x")

  test("welchCohen: t, df, p, d match the hand/mpmath-computed fixture") {
    val r = StatTests.welchCohen(twoGroups, "x", col("g") === "A").collect()(0)
    // se² = 0.025/5 + 0.0666667/4 = 0.0216667; t = -0.3/sqrt(.0216667)
    val t = r.getAs[Double]("t_stat")
    val df = r.getAs[Double]("df_welch")
    val p = r.getAs[Double]("p_value")
    val d = r.getAs[Double]("cohens_d")
    assert(math.abs(t - tExpected) < 1e-10, s"t=$t")
    assert(math.abs(df - dfExpected) < 1e-8, s"df=$df")
    assert(math.abs(p - pExpected) < 1e-10, s"p=$p")
    assert(math.abs(d - (-1.4491376746189439)) < 1e-10, s"d=$d")
  }

  // mpmath (30-digit): t = -2.0380986614602724, df = 4.749414519906323,
  // two-sided p = 0.10008380903500762, pooled-SD d = -1.4491376746189439
  private val tExpected = -2.0380986614602724
  private val dfExpected = 4.749414519906323
  private val pExpected = 0.10008380903500762

  test("welch symmetry: swapping the groups flips the t sign (property)") {
    val ab = StatTests.welchCohen(twoGroups, "x", col("g") === "A").collect()(0)
    val ba = StatTests.welchCohen(twoGroups, "x", col("g") === "B").collect()(0)
    assert(math.abs(ab.getAs[Double]("t_stat") + ba.getAs[Double]("t_stat")) < 1e-12)
    assert(math.abs(ab.getAs[Double]("p_value") - ba.getAs[Double]("p_value")) < 1e-12)
  }

  test("anova: F/p/eta2 on a 3-group fixture") {
    val df3 = (
      Seq(1.0, 2.0, 3.0).map(("a", _)) ++ Seq(2.0, 3.0, 4.0).map(("b", _)) ++
        Seq(5.0, 6.0, 7.0).map(("c", _))
    ).toDF("g", "x")
    val r = StatTests.anova(df3, "x", "g").collect()(0)
    assert(math.abs(r.getAs[Double]("f_stat") - fExpected) < 1e-10)
    assert(math.abs(r.getAs[Double]("p_value") - fpExpected) < 1e-10)
    assert(math.abs(r.getAs[Double]("eta_sq") - etaExpected) < 1e-12)
  }

  // SSB = 26, SSW = 6 → F = 13; p = f_sf(13, 2, 6) = 0.006591796875 (exact dyadic)
  private val fExpected = 13.0
  private val fpExpected = 0.006591796875
  private val etaExpected = 26.0 / 32.0

  test("chi2Cells completes the grid with zero cells and exact expected counts") {
    // 2x2 with an absent combination: (x,q) missing
    val df = Seq(("x", "p"), ("x", "p"), ("y", "p"), ("y", "q")).toDF("r", "c")
    val cells = StatTests.chi2Cells(df, "r", "c").collect()
    assert(cells.length === 4)
    val m = cells.map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("observed")).toMap
    assert(m(("x", "q")) === 0.0)
    val e = cells.map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("expected")).toMap
    assert(math.abs(e(("x", "p")) - 2 * 3 / 4.0) < 1e-12)
    assert(math.abs(e(("x", "q")) - 2 * 1 / 4.0) < 1e-12)
  }

  test("chi2Summary: statistic/dof/p/CramérV on a fixed 2x2 table") {
    // observed: [[10, 20], [30, 40]]; expected [[12, 18], [28, 42]];
    // chi2 (no Yates, matching dof=24-grade reference use) = 50/63
    val rows = Seq.fill(10)(("r1", "c1")) ++ Seq.fill(20)(("r1", "c2")) ++
      Seq.fill(30)(("r2", "c1")) ++ Seq.fill(40)(("r2", "c2"))
    val cells = StatTests.chi2Cells(rows.toDF("r", "c"), "r", "c")
    val s = StatTests.chi2Summary(cells, "r", "c").collect()(0)
    assert(math.abs(s.getAs[Double]("chi2") - 50.0 / 63.0) < 1e-10)
    assert(s.getAs[Double]("dof") === 1.0)
    assert(math.abs(s.getAs[Double]("cramers_v") - math.sqrt(50.0 / 63.0 / 100.0)) < 1e-12)
    assert(math.abs(s.getAs[Double]("p_value") - chi2pExpected) < 1e-9)
    assert(s.getAs[String]("strength") === "weak")
  }

  // mpmath: chi2_sf(50/63, 1) = 0.37299848361348712
  private val chi2pExpected = 0.37299848361348712

  test("tCIByGroup: CI brackets the mean, Pass/Fail classification correct") {
    val df = (Seq.fill(50)(0.6) ++ Seq.fill(50)(0.65)).map(("hi", _))
      .++((Seq.fill(50)(0.05) ++ Seq.fill(50)(0.1)).map(("lo", _)))
      .toDF("g", "x")
    val out = StatTests.tCIByGroup(df, "x", "g").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("hi").getAs[String]("status") === "Pass (Green)")
    assert(out("lo").getAs[String]("status") === "Fail (Red)")
    val hi = out("hi")
    assert(hi.getAs[Double]("ci_lower") < 0.625 && hi.getAs[Double]("ci_upper") > 0.625)
  }

  test("tukeyHSD: q stats and rejections on a 3-group fixture") {
    val df3 = (
      Seq(1.0, 2.0, 3.0, 2.0).map(("a", _)) ++ Seq(2.0, 3.0, 4.0, 3.0).map(("b", _)) ++
        Seq(8.0, 9.0, 10.0, 9.0).map(("c", _))
    ).toDF("g", "x")
    val rows = StatTests.tukeyHSD(df3, "x", "g").collect()
      .map(r => (r.getAs[String]("group_a"), r.getAs[String]("group_b")) -> r).toMap
    assert(rows.size === 3)
    // MSW = 2/3; se = sqrt(MSW/2*(1/4+1/4)) = sqrt(1/6); diffs: b-a=1, c-a=7, c-b=6
    val se = math.sqrt((2.0 / 3.0) / 2.0 * 0.5)
    assert(math.abs(rows(("a", "b")).getAs[Double]("q_stat") - 1.0 / se) < 1e-10)
    assert(!rows(("a", "b")).getAs[Boolean]("reject"))
    assert(rows(("a", "c")).getAs[Boolean]("reject"))
    assert(rows(("b", "c")).getAs[Boolean]("reject"))
  }

  test("mannWhitney: hand-computed U/z/p with ties; separated samples hit the extremes") {
    // pooled {1,1,2} (flag) vs {1,2,2}: midranks 1→2, 2→5
    // R1 = 2+2+5 = 9, U1 = 9 − 3·4/2 = 3, U2 = 9 − 3 = 6
    // ties: two value-groups of 3 → Σ(t³−t) = 48
    // σ = sqrt(9/12 · (7 − 48/30)) = sqrt(4.05); z = (3 − 4.5)/σ
    val df = Seq((1, true), (1, true), (2, true), (1, false), (2, false), (2, false))
      .toDF("v", "flag").withColumn("g", lit("only"))
    val r = StatTests.mannWhitney(df, "v", $"flag", "g").collect().head
    assert(r.getAs[Long]("n1") === 3L && r.getAs[Long]("n2") === 3L)
    assert(r.getAs[Double]("u1") === 3.0)
    assert(r.getAs[Double]("u2") === 6.0)
    val zExp = (3.0 - 4.5) / math.sqrt(9.0 / 12.0 * (7.0 - 48.0 / 30.0))
    assert(math.abs(r.getAs[Double]("z") - zExp) < 1e-12)
    // A&S 7.1.26 two-sided tail vs the exact value (mpmath erfc): |err| < 1.5e-7
    assert(math.abs(r.getAs[Double]("p_value") - 0.4560565) < 1e-4)

    // fully separated samples: U1 = 0 (all flags below), U2 = n1·n2
    val sep = Seq((1, true), (2, true), (3, true),
      (10, false), (11, false), (12, false), (13, false))
      .toDF("v", "flag").withColumn("g", lit("only"))
    val rs = StatTests.mannWhitney(sep, "v", $"flag", "g").collect().head
    assert(rs.getAs[Double]("u1") === 0.0 && rs.getAs[Double]("u2") === 12.0)
  }

  test("kruskalWallis: hand-computed H without and with ties; dof=2 p matches the exact exp(-H/2)") {
    // no ties: a={1,2} b={3,4} c={5,6} → ranks 1..6, Ra=3 Rb=7 Rc=11
    // S = (9+49+121)/2 = 89.5; H = 12/42·89.5 − 21 = 32/7
    val df = Seq((1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c"), (6, "c"))
      .toDF("v", "grp").withColumn("g", lit("only"))
    val r = StatTests.kruskalWallis(df, "v", "grp", "g").collect().head
    assert(r.getAs[Long]("n") === 6L && r.getAs[Long]("k") === 3L &&
      r.getAs[Long]("dof") === 2L)
    assert(math.abs(r.getAs[Double]("h") - 32.0 / 7.0) < 1e-12)
    // dof=2 chi2 survival is EXACTLY exp(-H/2)
    assert(math.abs(r.getAs[Double]("p_value") - math.exp(-16.0 / 7.0)) < 1e-9)

    // with ties: a={1,1} b={1,2} c={2,2} → midranks 1→2, 2→5
    // Ra=4 Rb=7 Rc=10; S = (16+49+100)/2 = 82.5; Hraw = 12/42·82.5 − 21 = 18/7
    // ties Σ(t³−t) = 48; H = (18/7) / (1 − 48/210) = 10/3
    val dft = Seq((1, "a"), (1, "a"), (1, "b"), (2, "b"), (2, "c"), (2, "c"))
      .toDF("v", "grp").withColumn("g", lit("only"))
    val rt = StatTests.kruskalWallis(dft, "v", "grp", "g").collect().head
    assert(math.abs(rt.getAs[Double]("h") - 10.0 / 3.0) < 1e-12)
    assert(math.abs(rt.getAs[Double]("p_value") - math.exp(-5.0 / 3.0)) < 1e-9)

    // two-group KW ≡ Mann-Whitney z² (the classic identity, tie-corrected)
    val two = Seq((1, "a"), (1, "a"), (2, "a"), (1, "b"), (2, "b"), (2, "b"))
      .toDF("v", "grp").withColumn("g", lit("only"))
    val kw = StatTests.kruskalWallis(two, "v", "grp", "g").collect().head
    val mw = StatTests.mannWhitney(two.withColumn("flag", $"grp" === "a"),
      "v", $"flag", "g").collect().head
    val z = mw.getAs[Double]("z")
    assert(math.abs(kw.getAs[Double]("h") - z * z) < 1e-10)
  }

  test("mannWhitney properties: U1+U2 = n1·n2, flag inversion negates z exactly, layout-invariant") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 400).map(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(12), rnd.nextBoolean()))
    val df = rows.toDF("g", "v", "flag")
    val a = StatTests.mannWhitney(df, "v", $"flag", "g")
      .collect().map(r => r.getString(0) -> r).toMap
    val b = StatTests.mannWhitney(df.repartition(7), "v", !$"flag", "g")
      .collect().map(r => r.getString(0) -> r).toMap
    a.foreach { case (g, r) =>
      val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
      assert(r.getAs[Double]("u1") + r.getAs[Double]("u2") === (n1 * n2).toDouble, g)
      val inv = b(g)
      assert(inv.getAs[Long]("n1") === n2 && inv.getAs[Long]("n2") === n1, g)
      assert(inv.getAs[Double]("u1") === r.getAs[Double]("u2"), g)
      assert(inv.getAs[Double]("z") === -r.getAs[Double]("z"), g)
      assert(inv.getAs[Double]("p_value") === r.getAs[Double]("p_value"), g)
    }
  }
}
