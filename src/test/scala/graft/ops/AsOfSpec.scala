package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Backward as-of join on crafted fixtures: boundary semantics (≥),
  * per-key isolation, leading-null contract, and the fail-fast
  * guards. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def left = Seq(
    ("a", 5L, "l1"), ("a", 15L, "l2"), ("a", 20L, "l3"), ("a", 25L, "l4"),
    ("b", 15L, "l5")
  ).toDF("k", "t", "tag")

  private def right = Seq(
    ("a", 10L, 1.0), ("a", 20L, 2.0),
    ("b", 30L, 9.0)
  ).toDF("k", "t", "v")

  test("backward semantics: latest right at or BEFORE each left time; " +
    "equal timestamps apply; no earlier row -> null; keys isolated") {
    val out = AsOf.asofBackward(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(out("l1") === None)          // before any right row
    assert(out("l2") === Some(1.0))     // 10 <= 15 < 20
    assert(out("l3") === Some(2.0))     // equal timestamp applies (>=)
    assert(out("l4") === Some(2.0))     // carried forward
    assert(out("l5") === None)          // key b's only right row is later
  }

  test("left columns survive untouched; multiple value columns carry together") {
    val r2 = Seq(("a", 10L, 1.0, "x")).toDF("k", "t", "v", "w")
    val out = AsOf.asofBackward(left, r2, Seq("k"), "t", "t", Seq("v", "w"))
    assert(out.columns.toSeq === Seq("k", "t", "tag", "asof_v", "asof_w"))
    val row = out.filter($"tag" === "l2")
      .select("k", "t", "asof_v", "asof_w")
      .as[(String, Long, Option[Double], Option[String])].head()
    assert(row === (("a", 15L, Some(1.0), Some("x"))))
    assert(out.count() === left.count()) // one row per left row, always
  }

  test("a matched right row's NULL value is returned as-is, not skipped " +
    "for an older non-null row; multi-col carry never stitches rows") {
    // right rows: t=10 (v=1.0, w="x"), t=20 (v=null, w="y") — the latest
    // match at t>=20 must yield (null, "y"), never the stitched (1.0, "y")
    // that per-column last(ignoreNulls) produced (r7 ADVICE item).
    val r = Seq(
      ("a", 10L, Some(1.0), Some("x")),
      ("a", 20L, None: Option[Double], Some("y"))
    ).toDF("k", "t", "v", "w")
    val out = AsOf.asofBackward(left, r, Seq("k"), "t", "t", Seq("v", "w"))
      .select("tag", "asof_v", "asof_w")
      .as[(String, Option[Double], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("l2") === ((Some(1.0), Some("x")))) // t=15: row@10 whole
    assert(out("l3") === ((None, Some("y"))))      // t=20: row@20 whole, null v kept
    assert(out("l4") === ((None, Some("y"))))      // carried as the whole row
  }

  test("fail-fast guards: empty keys, empty vals, colliding output name") {
    intercept[IllegalArgumentException] {
      AsOf.asofBackward(left, right, Seq.empty, "t", "t", Seq("v"))
    }
    intercept[IllegalArgumentException] {
      AsOf.asofBackward(left, right, Seq("k"), "t", "t", Seq.empty)
    }
    val clash = left.withColumn("asof_v", lit(0))
    intercept[IllegalArgumentException] {
      AsOf.asofBackward(clash, right, Seq("k"), "t", "t", Seq("v"))
    }
  }

  test("property: matches a per-key scan reference on seeded random series") {
    val rnd = new scala.util.Random(17)
    val l = (0 until 300).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong, i.toLong))
    val rRows = (0 until 80).map(i =>
      (s"k${rnd.nextInt(5)}", i * 7L % 100, i.toDouble)) // unique (k,t) by construction?
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq   // enforce the uniqueness contract
    val out = AsOf.asofBackward(l.toDF("k", "t", "id"), rRows.toDF("k", "t", "v"),
      Seq("k"), "t", "t", Seq("v"))
      .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
    val byKey = rRows.groupBy(_._1)
    l.foreach { case (k, t, id) =>
      val expect = byKey.getOrElse(k, Seq.empty)
        .filter(_._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      assert(out(id) === expect, s"row $id ($k, $t)")
    }
  }

  // ---- keyless/global variant --------------------------------------

  test("global: boundary carry across buckets — left rows in a bucket " +
    "with no earlier in-bucket right row inherit the previous buckets' " +
    "latest value; empty prefix stays null; >= ties apply") {
    val l = (0L until 40L).map(t => (t, s"l$t")).toDF("t", "tag")
    val r = Seq((5L, 1.0), (6L, 2.0), (25L, 3.0)).toDF("t", "v")
    // maxBroadcastRows = 0 forces the range-partitioned path; buckets =
    // 8 over times 0..39 — right-empty buckets exist by construction,
    // so the spine carry path is genuinely exercised. The default runs
    // the broadcast binary-search path; both must agree.
    for (mbr <- Seq(0L, 1000000L)) {
      val out = AsOf.asofBackwardGlobal(l, r, "t", "t", Seq("v"), buckets = 8,
        maxBroadcastRows = mbr)
        .select("t", "asof_v").as[(Long, Option[Double])].collect().toMap
      (0L until 40L).foreach { t =>
        val expect =
          if (t < 5) None
          else if (t < 6) Some(1.0) // t=5: equal timestamp applies
          else if (t < 25) Some(2.0)
          else Some(3.0)
        assert(out(t) === expect, s"t=$t (maxBroadcastRows=$mbr)")
      }
    }
  }

  test("global: buckets=1 (single partition) and buckets=16 agree with " +
    "a scan reference on seeded random series; empty right -> all null") {
    val rnd = new scala.util.Random(23)
    val l = (0 until 400).map(i => (rnd.nextInt(1000).toLong, i.toLong))
    val rRows = (0 until 60).map(i => (i * 17L % 1000, i.toDouble))
      .groupBy(_._1).map(_._2.head).toSeq // unique times (the contract)
    val lDf = l.toDF("t", "id")
    val rDf = rRows.toDF("t", "v")
    for (b <- Seq(1, 16); mbr <- Seq(0L, 1000000L)) {
      val out = AsOf.asofBackwardGlobal(lDf, rDf, "t", "t", Seq("v"), buckets = b,
        maxBroadcastRows = mbr)
        .select("id", "asof_v").as[(Long, Option[Double])].collect().toMap
      l.foreach { case (t, id) =>
        val expect = rRows.filter(_._1 <= t).sortBy(_._1).lastOption.map(_._2)
        assert(out(id) === expect, s"buckets=$b mbr=$mbr row $id t=$t")
      }
    }
    val empty = AsOf.asofBackwardGlobal(lDf, rDf.filter($"t" < -1), "t", "t",
      Seq("v"), buckets = 4)
      .select("asof_v").as[Option[Double]].collect()
    assert(empty.length === 400 && empty.forall(_.isEmpty))
  }

  test("null left time -> NULL result; NaN left time (floating axis) -> " +
    "LATEST right row — identical across keyed, range, and broadcast paths") {
    val l = Seq((Option(10.0), "a"), (None: Option[Double], "n"),
      (Option(Double.NaN), "x")).toDF("t", "tag")
    val r = Seq((5.0, 1.0), (20.0, 2.0)).toDF("t", "v")
    val expect = Map("a" -> Some(1.0), "n" -> None, "x" -> Some(2.0))
    for (mbr <- Seq(0L, 1000000L)) { // range and broadcast paths
      val out = AsOf.asofBackwardGlobal(l, r, "t", "t", Seq("v"),
        buckets = 4, maxBroadcastRows = mbr)
        .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
      assert(out === expect, s"global path mbr=$mbr")
    }
    val keyed = AsOf.asofBackward(
      l.withColumn("k", lit("g")), r.withColumn("k", lit("g")),
      Seq("k"), "t", "t", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(keyed === expect, "keyed path")
  }

  test("broadcast path searches integral axes as exact longs: adjacent " +
    "times beyond 2^53 (double-indistinguishable) still resolve correctly") {
    val base = 1L << 60 // (base|1).toDouble == base.toDouble — cast is lossy
    val l = Seq((base, "lo"), (base | 1, "hi"), (base + 2, "later"))
      .toDF("t", "tag")
    val r = Seq((base, 1.0), (base | 1, 2.0)).toDF("t", "v")
    val out = AsOf.asofBackwardGlobal(l, r, "t", "t", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(out === Map("lo" -> Some(1.0), "hi" -> Some(2.0),
      "later" -> Some(2.0)))
    // under a double key the two right times would collide and the
    // uniqueness require would reject a perfectly valid series
  }

  test("decimal time axes: exact unscaled-long key on the broadcast path; " +
    ">18-digit precision routes to the raw-ordered partitioned path") {
    // fractional decimal(10,2): backward semantics agree across both paths
    val l = Seq("1.00", "2.50", "3.75").toDF("ts")
      .select(col("ts").cast("decimal(10,2)").as("t"))
    val r = Seq(("0.99", 1.0), ("2.50", 2.0), ("3.80", 3.0)).toDF("ts", "v")
      .select(col("ts").cast("decimal(10,2)").as("t"), col("v"))
    for (mbr <- Seq(0L, 1000L)) {
      val out = AsOf.asofBackwardGlobal(l, r, "t", "t", Seq("v"),
        maxBroadcastRows = mbr)
        .select(col("t").cast("string"), col("asof_v"))
        .as[(String, Double)].collect().toMap
      assert(out === Map("1.00" -> 1.0, "2.50" -> 2.0, "3.75" -> 2.0),
        s"mbr=$mbr")
    }
    // adjacent decimal times beyond 2^53 (double-indistinguishable): the
    // old double key either tripped the uniqueness require on a valid
    // series or matched the wrong row (r8 ADVICE). precision 18 takes the
    // unscaled-long broadcast kernel; precision 38 has no exact long key
    // and must take the partitioned path, whose raw-column ordering is
    // exact at any precision
    val base = BigDecimal(1L << 53) // 16 digits; base+1 == base as a double
    for (prec <- Seq(18, 38)) {
      val dt = s"decimal($prec,0)"
      val lb = Seq(base.toString, (base + 1).toString, (base + 2).toString)
        .toDF("ts").select(col("ts").cast(dt).as("t"))
      val rb = Seq((base.toString, 1.0), ((base + 1).toString, 2.0))
        .toDF("ts", "v").select(col("ts").cast(dt).as("t"), col("v"))
      val out = AsOf.asofBackwardGlobal(lb, rb, "t", "t", Seq("v"))
        .select((col("t").cast("long") - lit(1L << 53)).as("off"), col("asof_v"))
        .as[(Long, Double)].collect().toMap
      assert(out === Map(0L -> 1.0, 1L -> 2.0, 2L -> 2.0), s"precision $prec")
    }
  }

  test("global: a matched right row's NULL field comes through as NULL " +
    "(struct carry, same contract as the keyed form); guards fire") {
    val l = Seq((10L, "x"), (30L, "y")).toDF("t", "tag")
    val r = Seq((5L, Some(1.0), "a"), (20L, None: Option[Double], "b"))
      .toDF("t", "v", "w")
    for (mbr <- Seq(0L, 1000000L)) {
      val out = AsOf.asofBackwardGlobal(l, r, "t", "t", Seq("v", "w"),
        buckets = 4, maxBroadcastRows = mbr)
        .select("tag", "asof_v", "asof_w")
        .as[(String, Option[Double], Option[String])].collect()
        .map(row => row._1 -> ((row._2, row._3))).toMap
      assert(out("x") === ((Some(1.0), Some("a"))), s"mbr=$mbr")
      assert(out("y") === ((None, Some("b"))), s"mbr=$mbr") // row@20 whole, null v kept
    }
    // the broadcast path ENFORCES right-time uniqueness at collect time
    intercept[IllegalArgumentException] {
      AsOf.asofBackwardGlobal(l,
        Seq((5L, 1.0), (5L, 2.0)).toDF("t", "v"), "t", "t", Seq("v"))
        .collect()
    }
    intercept[IllegalArgumentException] {
      AsOf.asofBackwardGlobal(l, r, "t", "t", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      AsOf.asofBackwardGlobal(l, r, "t", "t", Seq("v"), buckets = 0)
    }
    intercept[IllegalArgumentException] {
      AsOf.asofBackwardGlobal(l.withColumn("asof_v", lit(0)), r, "t", "t", Seq("v"))
    }
  }
}
