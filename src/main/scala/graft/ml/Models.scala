package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{MinMaxScaler, MinMaxScalerModel, RFormula, VectorAssembler}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.regression.{LinearRegression, LinearRegressionModel}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ML layer (SURVEY §2.10 X10-X13) on spark.ml — the reference's
  * statsmodels/sklearn fits re-expressed as Pipelines.
  *
  * Reference provenance (file:line in /root/reference):
  *  - X10 OLS M1/M2/M3 via R formulas: notebooks/01_youbike_analysis.ipynb:1139-1148
  *    (R² comparison 01:1151; M3's lag feature is the story: 0.02 → 0.92)
  *  - X11 K-Means k=4, seed fixed, on the station×hour pivot: 01:659-661
  *  - X12 MinMaxScaler fit/transform: notebooks/04_lstm_prediction.ipynb:67-68
  *  - X13 MinMax inverse transform: 04:303-312 (the dummy-matrix trick
  *    replaced by direct arithmetic on the fitted min/max)
  *
  * Scale posture: RFormula/LinearRegression(normal solver) reduce to
  * one pass of gram-matrix accumulation (treeAggregate) — linear scan,
  * no driver materialization of rows; KMeans consumes the *pivoted*
  * frame (stations × 24), which is already reduced by ~10⁶ — the
  * aggregate-before-ML shape the reference itself uses (SURVEY §4.1).
  */
object Models {

  /** X10: OLS via R formula (handles `C(...)` one-hot like statsmodels).
    * Normal-equation solver → deterministic coefficients. The returned
    * PipelineModel transforms raw rows straight to a `prediction`. */
  def olsFit(df: DataFrame, formula: String): org.apache.spark.ml.PipelineModel = {
    val rf = new RFormula().setFormula(formula)
      .setFeaturesCol("features").setLabelCol("label")
    val lr = new LinearRegression()
      .setSolver("normal").setRegParam(0.0)
      .setFeaturesCol("features").setLabelCol("label")
    new Pipeline().setStages(Array(rf, lr)).fit(df)
  }

  /** The LinearRegressionModel inside an [[olsFit]] pipeline. */
  def lrStage(m: org.apache.spark.ml.PipelineModel): LinearRegressionModel =
    m.stages(1).asInstanceOf[LinearRegressionModel]

  /** X10: fit the reference's three models and return (model, r2,
    * n_features) rows — the R² ladder that motivates the lag feature. */
  def olsLadder(df: DataFrame, formulas: Seq[(String, String)]): Seq[(String, Double, Int)] =
    formulas.map { case (name, f) =>
      val m = lrStage(olsFit(df, f))
      (name, m.summary.r2, m.numFeatures)
    }

  /** X11: K-Means k=4 on hour-pivot columns (01:659-661). Returns the
    * input plus a `cluster` column. Seed pinned; cluster *labels* are
    * arbitrary — downstream naming (A10) keys on peak-hour structure,
    * not label identity (SURVEY §7.3 #6).
    *
    * Fit-cost posture: the pivot is an *aggregated* frame (stations ×
    * 24 — a few thousand rows even at 100 TB of facts), but Lloyd's
    * launches one job per iteration, so a cluster-wide partition count
    * turns a trivial fit into pure scheduler overhead (measured: 9 s →
    * 2.3 s at sf0.1 on local[32]). Coalesce the assembled vectors to a
    * couple of partitions + cache before the iterative fit, and run
    * k-means|| init with a single step (random init is cheaper still
    * but merges kinds on the MlModelsSpec fixture — seeding quality
    * matters; one || step is enough at k=4). */
  def kmeansOnPivot(pivot: DataFrame, featureCols: Seq[String], k: Int = 4,
                    seed: Long = 42L): DataFrame = {
    val (model, withVec) = kmeansFit(pivot, featureCols, k, seed)
    // the cached assembled frame stays: the returned transform reads it
    model.transform(withVec).drop("features")
  }

  /** The single source of X11's estimator settings (k, seed, one
    * k-means|| init step, coalesce-before-iterate) — [[kmeansOnPivot]]
    * and [[kmeansCenters]] MUST fit identically or the
    * centroids-as-literals oracle and the expression≡transform spec pin
    * silently diverge. Returns the model plus the cached assembled
    * frame (caller owns the unpersist decision). */
  private def kmeansFit(pivot: DataFrame, featureCols: Seq[String], k: Int,
                        seed: Long): (org.apache.spark.ml.clustering.KMeansModel, DataFrame) = {
    val asm = new VectorAssembler().setInputCols(featureCols.toArray).setOutputCol("features")
    val km = new KMeans().setK(k).setSeed(seed).setInitSteps(1)
      .setFeaturesCol("features").setPredictionCol("cluster")
    val withVec = asm.transform(pivot).coalesce(2).cache()
    (km.fit(withVec), withVec)
  }

  /** X11's fitted centroids as plain arrays — the literal payload for
    * the coefficients-as-literals oracle pattern (see
    * [[kmeansAssignExpr]]). Shares [[kmeansFit]] with [[kmeansOnPivot]],
    * so the two paths cannot diverge. */
  def kmeansCenters(pivot: DataFrame, featureCols: Seq[String], k: Int = 4,
                    seed: Long = 42L): Array[Array[Double]] = {
    val (model, withVec) = kmeansFit(pivot, featureCols, k, seed)
    val centers = model.clusterCenters.map(_.toArray)
    withVec.unpersist(blocking = false) // only the driver-side centers escape
    centers
  }

  /** Driver-side deterministic K-Means fit on an AGGREGATED frame —
    * the aggregate-before-ML endgame (GramOls's statsmodels move
    * applied to X11): the station×hour pivot is dimension-sized
    * (~1.5k×24, bounded at ANY fact scale — stations don't grow with
    * events), so launching one distributed job per Lloyd's iteration
    * is pure scheduler overhead; the reference itself fits sklearn on
    * exactly this driver-local matrix (01:659-661). Rows are
    * collected in featureCols sort order, so the accumulation order —
    * and therefore every float mean — is partition-layout-invariant;
    * k-means++ seeding off a seeded RNG plus Lloyd's to assignment
    * fixpoint, with the SAME first-min tie rule [[kmeansAssignExpr]]
    * mirrors, makes the whole fit bit-deterministic. MlModelsSpec
    * pins structure recovery and WCSS parity vs the spark.ml fit. */
  def kmeansCentersLocal(pivot: DataFrame, featureCols: Seq[String],
                         k: Int = 4, seed: Long = 42L,
                         maxIter: Int = 50): Array[Array[Double]] = {
    val cols = featureCols.map(col)
    val rows: Array[Array[Double]] = pivot.select(cols: _*)
      .orderBy(cols: _*)
      .collect().map(r => Array.tabulate(featureCols.length)(r.getDouble))
    kmeansLocalRows(rows, k, seed, maxIter)
  }

  /** The pure rows → centers core of [[kmeansCentersLocal]]: seeded
    * k-means++ init + Lloyd's to assignment fixpoint with the
    * first-min tie rule. Deterministic for a fixed row ORDER — callers
    * own providing layout-invariant ordering (kmeansCentersLocal sorts
    * by the feature columns; the PQ codebook trainer orders its sample
    * by md5 rank). Also the training core for product-quantization
    * codebooks ([[graft.llm.Similarity.pqTrainCodebooks]]). */
  def kmeansLocalRows(rows: Array[Array[Double]], k: Int, seed: Long,
                      maxIter: Int): Array[Array[Double]] = {
    require(rows.length >= k, s"k-means needs >= $k rows, got ${rows.length}")
    val dim = rows.head.length
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val rnd = new java.util.Random(seed)
    // k-means++ (D²-weighted) seeding
    val centers = Array.fill(k)(new Array[Double](dim))
    rows(rnd.nextInt(rows.length)).copyToArray(centers(0))
    var c = 1
    while (c < k) {
      val dists = rows.map(r => (0 until c).map(j => d2(r, centers(j))).min)
      val total = dists.sum
      if (total <= 0) rows(rnd.nextInt(rows.length)).copyToArray(centers(c))
      else {
        var t = rnd.nextDouble() * total
        var i = 0
        while (i < rows.length - 1 && t > dists(i)) { t -= dists(i); i += 1 }
        rows(i).copyToArray(centers(c))
      }
      c += 1
    }
    // Lloyd's to assignment fixpoint (first-min tie rule)
    val assign = Array.fill(rows.length)(-1)
    var changed = true
    var it = 0
    while (changed && it < maxIter) {
      changed = false
      var r = 0
      while (r < rows.length) {
        var best = 0; var bestD = d2(rows(r), centers(0))
        var j = 1
        while (j < k) {
          val d = d2(rows(r), centers(j))
          if (d < bestD) { best = j; bestD = d }
          j += 1
        }
        if (assign(r) != best) { assign(r) = best; changed = true }
        r += 1
      }
      if (changed) {
        val sums = Array.fill(k)(new Array[Double](dim))
        val counts = new Array[Long](k)
        var i = 0
        while (i < rows.length) {
          val a = assign(i); counts(a) += 1
          var j = 0
          while (j < dim) { sums(a)(j) += rows(i)(j); j += 1 }
          i += 1
        }
        var j = 0
        while (j < k) {
          // an emptied cluster keeps its previous center (spark.ml's rule)
          if (counts(j) > 0) {
            var x = 0
            while (x < dim) { centers(j)(x) = sums(j)(x) / counts(j); x += 1 }
          }
          j += 1
        }
      }
      it += 1
    }
    centers
  }

  /** K-Means ASSIGNMENT unrolled to column arithmetic: squared
    * euclidean distance to each literal centroid (left-assoc sum of
    * squares in feature order), then a first-min argmin CASE — the
    * WHEN for index i tests d_i <= d_j only for j > i, which returns
    * the first index attaining the minimum (spark.ml's tie rule).
    * Rendered identically in SQL by [[kmeansAssignSql]], so the
    * assignment is bit-exact across engines whenever the feature
    * columns are (x11 feeds it the trunc-6 pivot a3 proves exact). */
  def kmeansAssignExpr(centers: Array[Array[Double]], featureCols: Seq[String]): Column = {
    val dists = centers.map { c =>
      featureCols.zipWithIndex.map { case (h, i) =>
        (col(h) - lit(c(i))) * (col(h) - lit(c(i)))
      }.reduceLeft(_ + _)
    }
    val k = dists.length
    (0 until k - 1).foldLeft(org.apache.spark.sql.functions.when(lit(false), k - 1)) {
      case (acc, i) =>
        val cond = ((i + 1) until k).map(j => dists(i) <= dists(j)).reduceLeft(_ && _)
        acc.when(cond, i)
    }.otherwise(k - 1)
  }

  /** DuckDB mirror of [[kmeansAssignExpr]], term for term. */
  def kmeansAssignSql(centers: Array[Array[Double]], featureCols: Seq[String]): String = {
    val dists = centers.map { c =>
      featureCols.zipWithIndex.map { case (h, i) =>
        s"($h - ${c(i)})*($h - ${c(i)})"
      }.mkString(" + ")
    }
    val k = dists.length
    val whens = (0 until k - 1).map { i =>
      val cond = ((i + 1) until k).map(j => s"(${dists(i)}) <= (${dists(j)})").mkString(" AND ")
      s"WHEN $cond THEN $i"
    }
    s"CASE ${whens.mkString(" ")} ELSE ${k - 1} END"
  }

  /** X12: fit MinMaxScaler on `cols` assembled as a vector. */
  def fitMinMax(df: DataFrame, cols: Seq[String]): MinMaxScalerModel = {
    val asm = new VectorAssembler().setInputCols(cols.toArray).setOutputCol("mm_in")
    new MinMaxScaler().setInputCol("mm_in").setOutputCol("mm_out")
      .setMin(0.0).setMax(1.0)
      .fit(asm.transform(df))
  }

  /** X12 as plain column arithmetic: (x - min) / (max - min) with the
    * (min, max) observed over `df` — the exact MinMaxScaler [0,1]
    * semantics, but expressible in oracle SQL and codegen-friendly.
    * MlModelsSpec asserts equality with the spark.ml scaler output. */
  def minMaxScaleExpr(x: Column, minV: Column, maxV: Column): Column =
    (x - minV) / (maxV - minV)

  /** X13: inverse of [[minMaxScaleExpr]] — scaled*(max-min)+min, the
    * reference's dummy-matrix unscale (04:303-312) done directly. */
  def minMaxInverseExpr(scaled: Column, minV: Column, maxV: Column): Column =
    scaled * (maxV - minV) + minV

  /** X13 driver-side: invert one feature column of a fitted scaler
    * (the api/app/main.py:192-196 path: only the predicted column). */
  def minMaxInverse(model: MinMaxScalerModel, featureIdx: Int, scaled: Column): Column = {
    val mn = model.originalMin.toArray(featureIdx)
    val mx = model.originalMax.toArray(featureIdx)
    scaled * (mx - mn) + mn
  }

  /** Extract one element of an ml Vector column (for reading scaled
    * features back out as scalars). */
  val vectorElem: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((v: Vector, i: Int) => v(i))
}
