package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** X10-X13 behaviour on synthetic data (VERDICT r1 #6): the R² ladder
  * must reproduce the reference's story (lag features carry the
  * predictive power, 01:1139-1151), and the arithmetic MinMax scale
  * must equal ml.feature.MinMaxScaler. */
class MlModelsSpec extends SparkSpec {
  import spark.implicits._

  /** AR(1) lag-persistent series per station: rate_t = 0.5 + 0.95·
    * (rate_{t-1} − 0.5) + ε, ε ~ N(0, 0.03), deterministic seed. */
  private lazy val lagData = {
    val rnd = new scala.util.Random(7)
    val rows = for {
      st <- 0 until 20
      series = Iterator.iterate(0.5)(r =>
        math.min(0.98, math.max(0.02, 0.5 + 0.95 * (r - 0.5) + rnd.nextGaussian() * 0.03)))
        .take(201).toVector
      t <- 1 until 201
    } yield (s"s$st", s"d${st % 5}", (t % 24).toString, series(t), series(t - 1))
    rows.toDF("station", "district", "hour_str", "rate", "rate_lag1")
  }

  test("X10 R-squared ladder: structural < +time < +lag, and lag model > 0.85 (01:1151)") {
    val ladder = Models.olsLadder(lagData, Seq(
      "M1" -> "rate ~ district",
      "M2" -> "rate ~ district + hour_str",
      "M3" -> "rate ~ district + hour_str + rate_lag1")).map(t => t._1 -> t._2).toMap
    assert(ladder("M1") < ladder("M2"), s"ladder=$ladder")
    assert(ladder("M2") < ladder("M3"), s"ladder=$ladder")
    assert(ladder("M3") > 0.85, s"M3 r2=${ladder("M3")}")
    assert(ladder("M1") < 0.1, s"M1 should be near-useless: ${ladder("M1")}")
  }

  test("X10 prediction pipeline scores unseen rows (model.transform end-to-end)") {
    val m3 = Models.olsFit(lagData, "rate ~ district + hour_str + rate_lag1")
    val scored = m3.transform(lagData.limit(100))
    assert(scored.count() === 100)
    val rmse = scored
      .select(sqrt(avg(pow(col("prediction") - col("rate"), 2))))
      .as[Double].head()
    assert(rmse < 0.08, s"rmse=$rmse")
  }

  test("LinearScore expression scoring equals the pipeline's transform() predictions") {
    // the unrolled coefficients-as-literals scorer (the x10/x15 oracle
    // path) must be the same model as spark.ml's BLAS-dot serving path;
    // only summation-order ulps may separate them
    val m3 = Models.olsFit(lagData, "rate ~ district + hour_str + rate_lag1")
    val ls = LinearScore.fromFit(m3, lagData, Set("district", "hour_str"))
    assert(ls.terms.length === Models.lrStage(m3).numFeatures)
    val maxDiff = m3.transform(lagData)
      .withColumn("p_expr", ls.column)
      .select(max(abs(col("p_expr") - col("prediction"))))
      .as[Double].head()
    assert(maxDiff < 1e-12, s"maxDiff=$maxDiff")
    // the SQL rendering references exactly the frame's columns + literals,
    // identifiers ANSI-quoted so odd column names can't break the oracle
    assert(ls.sql.contains("CASE WHEN \"district\" = "))
    assert(ls.sql.contains("\"rate_lag1\""))
    // a degenerate fit (non-finite coefficient) must fail loudly at
    // construction, not as a DuckDB parse error at oracle time
    intercept[IllegalArgumentException] {
      LinearScore(0.0, Seq(LinearScore.Num("x", Double.NaN)))
    }
  }

  test("X12 arithmetic scaling equals ml.feature.MinMaxScaler output") {
    val df = Seq(1.0, 3.0, 5.0, 9.0).toDF("x")
    val model = Models.fitMinMax(df, Seq("x"))
    val viaMl = model.transform(
      new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(Array("x")).setOutputCol("mm_in").transform(df))
      .select(Models.vectorElem(col("mm_out"), lit(0))).as[Double].collect().toSeq
    val bounds = df.agg(min("x").as("mn"), max("x").as("mx"))
    val viaExpr = df.crossJoin(bounds)
      .select(Models.minMaxScaleExpr(col("x"), col("mn"), col("mx")))
      .as[Double].collect().toSeq
    assert(viaMl.zip(viaExpr).forall { case (a, b) => math.abs(a - b) < 1e-12 },
      s"$viaMl vs $viaExpr")
    assert(viaExpr === Seq(0.0, 0.25, 0.5, 1.0))
  }

  test("X13 inverse round-trips both the expression and the fitted-scaler paths") {
    val df = Seq(2.0, 4.0, 8.0).toDF("x")
    val model = Models.fitMinMax(df, Seq("x"))
    val bounds = df.agg(min("x").as("mn"), max("x").as("mx"))
    val rt = df.crossJoin(bounds)
      .withColumn("s", Models.minMaxScaleExpr(col("x"), col("mn"), col("mx")))
      .select(Models.minMaxInverseExpr(col("s"), col("mn"), col("mx")))
      .as[Double].collect().toSeq
    assert(rt.zip(Seq(2.0, 4.0, 8.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    val inv = df.crossJoin(bounds)
      .withColumn("s", Models.minMaxScaleExpr(col("x"), col("mn"), col("mx")))
      .select(Models.minMaxInverse(model, 0, col("s"))).as[Double].collect().toSeq
    assert(inv.zip(Seq(2.0, 4.0, 8.0)).forall { case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("X11 KMeans recovers 4 well-separated synthetic usage shapes (structure, not labels)") {
    // 4 archetype curves over 24h, 10 stations each, tiny deterministic jitter
    val rnd = new scala.util.Random(11)
    def curve(kind: Int, h: Int): Double = kind match {
      case 0 => if (h >= 10 && h <= 17) 0.9 else 0.1 // commercial
      case 1 => if (h >= 6 && h <= 9) 0.9 else 0.1   // residential am
      case 2 => if (h >= 18 && h <= 22) 0.9 else 0.1 // evening
      case _ => 0.5                                   // flat
    }
    val rows = for (k <- 0 until 4; s <- 0 until 10) yield {
      val vals = (0 until 24).map(h => curve(k, h) + rnd.nextDouble() * 0.02)
      (s"st_${k}_$s", k, vals)
    }
    val df = rows.toDF("station_no", "true_kind", "vals")
      .select(col("station_no") +: col("true_kind") +:
        (0 until 24).map(h => element_at(col("vals"), h + 1).as(h.toString)): _*)
    val out = Models.kmeansOnPivot(df, (0 until 24).map(_.toString))
      .select("true_kind", "cluster").as[(Int, Int)].collect()
    // every true kind maps to exactly one cluster and clusters don't merge kinds
    val kindToClusters = out.groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSet).toMap
    assert(kindToClusters.values.forall(_.size === 1), s"$kindToClusters")
    assert(kindToClusters.values.reduce(_ ++ _).size === 4)
  }

  test("kmeansAssignExpr matches model.transform's assignments (the x11 oracle path)") {
    val rnd = new scala.util.Random(13)
    val rows = for (k <- 0 until 4; s <- 0 until 12) yield {
      val base = Array.tabulate(24)(h => 0.2 * k + 0.03 * math.sin(h + k))
      (s"st_${k}_$s", base.map(_ + rnd.nextDouble() * 0.01).toSeq)
    }
    val cols = (0 until 24).map(h => s"h$h")
    val df = rows.toDF("station_no", "vals")
      .select(col("station_no") +:
        (0 until 24).map(h => element_at(col("vals"), h + 1).as(s"h$h")): _*)
    val centers = Models.kmeansCenters(df, cols)
    val viaModel = Models.kmeansOnPivot(df, cols)
      .select("station_no", "cluster").as[(String, Int)].collect().toMap
    val viaExpr = df.withColumn("c", Models.kmeansAssignExpr(centers, cols))
      .select("station_no", "c").as[(String, Int)].collect().toMap
    assert(viaExpr === viaModel)
    // SQL rendering references the feature columns + literal centers
    val sql = Models.kmeansAssignSql(centers, cols)
    assert(sql.startsWith("CASE WHEN") && sql.contains("h23") && sql.endsWith("ELSE 3 END"))
  }

  test("kmeansCentersLocal (the x11 fit since r7): recovers the 4-shape " +
    "structure, WCSS on par with spark.ml, partition-layout-invariant") {
    val rnd = new scala.util.Random(11)
    def curve(kind: Int, h: Int): Double = kind match {
      case 0 => if (h >= 10 && h <= 17) 0.9 else 0.1
      case 1 => if (h >= 6 && h <= 9) 0.9 else 0.1
      case 2 => if (h >= 18 && h <= 22) 0.9 else 0.1
      case _ => 0.5
    }
    val rows = for (k <- 0 until 4; s <- 0 until 10) yield {
      val vals = (0 until 24).map(h => curve(k, h) + rnd.nextDouble() * 0.02)
      (s"st_${k}_$s", k, vals)
    }
    val cols = (0 until 24).map(_.toString)
    val df = rows.toDF("station_no", "true_kind", "vals")
      .select(col("station_no") +: col("true_kind") +:
        (0 until 24).map(h => element_at(col("vals"), h + 1).as(h.toString)): _*)
    val centers = Models.kmeansCentersLocal(df, cols)
    val out = df
      .withColumn("cluster", Models.kmeansAssignExpr(centers, cols))
      .select("true_kind", "cluster").as[(Int, Int)].collect()
    val kindToClusters = out.groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSet).toMap
    assert(kindToClusters.values.forall(_.size === 1), s"$kindToClusters")
    assert(kindToClusters.values.reduce(_ ++ _).size === 4)
    // WCSS no worse than the spark.ml fit's on the same frame (both
    // are local optima of the same objective; parity is the contract)
    def wcss(cs: Array[Array[Double]]): Double = {
      val data = df.select(cols.map(col): _*).collect()
        .map(r => Array.tabulate(24)(r.getDouble))
      data.map(p => cs.map(c =>
        c.zip(p).map { case (a, b) => (a - b) * (a - b) }.sum).min).sum
    }
    val sparkMl = Models.kmeansCenters(df, cols)
    assert(wcss(centers) <= wcss(sparkMl) * 1.05,
      s"local WCSS ${wcss(centers)} vs spark.ml ${wcss(sparkMl)}")
    // determinism under a different partition layout
    val centers2 = Models.kmeansCentersLocal(df.repartition(7), cols)
    assert(centers.map(_.toSeq).toSeq === centers2.map(_.toSeq).toSeq)
  }
}
