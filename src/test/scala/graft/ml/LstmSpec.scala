package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pin the engine-native LSTM forward pass (X14 serving half) against
  * an independently computed NumPy fixture, and prove the X15 seam:
  * the scorer as a Spark UDF over sequence rows with the
  * skip-don't-die null contract.
  *
  * Fixture: weights generated from closed-form sin/cos formulas (both
  * sides evaluate the same trig on the same args; JVM vs C libm agree
  * to ~1 ulp, far inside the 1e-9 tolerance after 3-5 timesteps) and
  * run through an independent NumPy implementation of the PyTorch
  * gate equations.
  */
class LstmSpec extends SparkSpec {
  import Lstm._
  import spark.implicits._

  private val D = 2
  private val H = 3

  private val w = LstmWeights(
    inputSize = D, hidden = H,
    wIh = Array.tabulate(4 * H, D)((k, d) => math.sin(0.7 * k + 0.3 * d) * 0.5),
    wHh = Array.tabulate(4 * H, H)((k, j) => math.cos(0.9 * k + 0.2 * j) * 0.5),
    bIh = Array.tabulate(4 * H)(k => math.sin(1.3 * k) * 0.1),
    bHh = Array.tabulate(4 * H)(k => math.cos(1.7 * k) * 0.1),
    fcW = Array.tabulate(H)(j => math.sin(2.1 * j + 0.5)),
    fcB = 0.25)

  private def close(got: Double, want: Double, tol: Double = 1e-9): Unit =
    assert(math.abs(got - want) < tol, s"got $got, want $want")

  test("forward pass matches the NumPy fixture on three sequence shapes") {
    val seq1 = (0 until 3).map(t => Array.tabulate(D)(d => math.sin(t + 0.5 * d)))
    val seq2 = (0 until 5).map(t => Array.tabulate(D)(d => 0.25 * t - 0.1 * d))
    val seq3 = Seq(Array(1.0, -2.0))
    close(forward(seq1, w).get, 0.23717329577041635)
    close(forward(seq2, w).get, 0.24650321917126516)
    close(forward(seq3, w).get, 0.32287731071794423)
  }

  test("degenerate inputs skip, not die: empty seq, ragged width, null step") {
    assert(forward(Seq.empty, w).isEmpty)
    assert(forward(Seq(Array(1.0)), w).isEmpty) // width 1 != D
    assert(forward(Seq(Array(1.0, 2.0), null), w).isEmpty)
  }

  test("fromFlat rebuilds the PyTorch state_dict layout bit-identically") {
    val w2 = fromFlat(D, H,
      w.wIh.flatten, w.wHh.flatten, w.bIh, w.bHh, w.fcW, w.fcB)
    val seq = (0 until 3).map(t => Array.tabulate(D)(d => math.sin(t + 0.5 * d)))
    assert(forward(seq, w2) === forward(seq, w))
  }

  test("scoreUdf: distributed scoring over sequence rows, nulls propagate") {
    val rows = Seq(
      (1L, Seq(Seq(math.sin(0.0), math.sin(0.5)),
        Seq(math.sin(1.0), math.sin(1.5)), Seq(math.sin(2.0), math.sin(2.5)))),
      (2L, Seq(Seq(1.0, -2.0))),
      (3L, Seq(Seq(1.0)))) // ragged → null
      .toDF("id", "seq")
    val out = rows.withColumn("score", scoreUdf(w)(col("seq")))
      .collect().map(r => r.getLong(0) -> Option(r.get(2))).toMap
    close(out(1L).get.asInstanceOf[Double], 0.23717329577041635)
    close(out(2L).get.asInstanceOf[Double], 0.32287731071794423)
    assert(out(3L).isEmpty)
  }

  test("scoreUdf: null SCALAR inside an inner array skips, not NPEs") {
    // array<array<double>> legally carries null elements; before the fix
    // this unboxed at s.toArray and killed the task (ADVICE r4)
    val rows = spark.sql(
      "SELECT 4L AS id, array(array(1.0d, CAST(NULL AS double))) AS seq")
    val out = rows.withColumn("score", scoreUdf(w)(col("seq"))).collect()
    assert(out.head.isNullAt(2))
  }

  test("EmbeddingWeights rejects embDim == 0 at construction") {
    // grouped(0) inside fitMultiStation used to be the first failure point
    intercept[IllegalArgumentException] {
      Lstm.EmbeddingWeights(w, Array.fill(3)(Array.empty[Double]), baseDim = D)
    }
  }

  test("BPTT gradients match central finite differences on every parameter") {
    val samples = Seq(
      ((0 until 4).map(t => Array.tabulate(D)(d => math.sin(0.9 * t - 0.4 * d))), 0.6),
      ((0 until 2).map(t => Array.tabulate(D)(d => 0.3 * t + 0.1 * d)), -0.2))
    def loss(wts: Lstm.LstmWeights): Double = {
      val acc = new Lstm.Grads(D, H)
      samples.foreach { case (s, y) => Lstm.accumulateGrad(s, y, wts, acc) }
      acc.loss
    }
    val acc = new Lstm.Grads(D, H)
    samples.foreach { case (s, y) => Lstm.accumulateGrad(s, y, w, acc) }
    // analytic summed-loss gradient (meanVector divides by n=2 — undo)
    val analytic = acc.meanVector.map(_ * acc.n)
    val params = Lstm.flatten(w)
    val eps = 1e-6
    params.indices.foreach { i =>
      val p = params.clone()
      p(i) = params(i) + eps
      val up = loss(Lstm.unflatten(D, H, p))
      p(i) = params(i) - eps
      val dn = loss(Lstm.unflatten(D, H, p))
      val numeric = (up - dn) / (2 * eps)
      assert(math.abs(analytic(i) - numeric) < 1e-6,
        s"param $i: analytic ${analytic(i)} vs numeric $numeric")
    }
  }

  test("Adam fit learns next-step prediction on a sine series (04:137-162 analog)") {
    val xs = (0 until 60).map(t => (math.sin(0.4 * t) + 1.0) / 2.0)
    val samples = (0 until 56).map { s =>
      ((0 until 3).map(t => Array(xs(s + t))), xs(s + 3))
    }
    val (trained, hist) = Lstm.fit(samples, Lstm.init(1, 4, seed = 7L),
      epochs = 300, lr = 0.02)
    assert(hist.last < 0.05 * hist.head,
      s"loss ${hist.head} -> ${hist.last}: did not learn")
    assert(hist.last < 5e-3, s"final mean MSE ${hist.last} too high")
    // trained forward actually predicts the next point
    val pred = Lstm.forward((10 until 13).map(t => Array(xs(t))), trained).get
    assert(math.abs(pred - xs(13)) < 0.15, s"pred $pred vs ${xs(13)}")
  }

  test("distributedGrad over 4 partitions equals the local accumulation") {
    val samples = (0 until 24).map { s =>
      ((0 until 3).map(t => Array.tabulate(D)(d => math.sin(0.2 * (s + t) + d))),
        math.cos(0.3 * s))
    }
    val local = new Lstm.Grads(D, H)
    samples.foreach { case (sq, y) => Lstm.accumulateGrad(sq, y, w, local) }
    val dist = Lstm.distributedGrad(
      spark.sparkContext.parallelize(samples, 4), w)
    assert(dist.n === local.n)
    assert(math.abs(dist.loss - local.loss) < 1e-12 * math.abs(local.loss))
    val (lv, dv) = (local.meanVector, dist.meanVector)
    lv.indices.foreach { i =>
      assert(math.abs(lv(i) - dv(i)) <= 1e-10 * (1.0 + math.abs(lv(i))),
        s"grad $i: local ${lv(i)} vs distributed ${dv(i)}")
    }
  }

  test("fitDistributed: full-batch Adam over a sequence frame reduces loss") {
    val xs = (0 until 40).map(t => (math.sin(0.4 * t) + 1.0) / 2.0)
    val rows = (0 until 36).map { s =>
      (s.toLong, Seq(Seq(xs(s)), Seq(xs(s + 1)), Seq(xs(s + 2))), xs(s + 3))
    }.toDF("id", "seq", "label").repartition(4)
    val (_, hist) = Lstm.fitDistributed(rows, "seq", "label",
      Lstm.init(1, 3, seed = 11L), epochs = 40, lr = 0.05)
    assert(hist.last < 0.3 * hist.head,
      s"distributed loss ${hist.head} -> ${hist.last}: did not drop")
    // minibatch mode (the reference's DataLoader analog): sampled
    // epochs still train; final loss is measured on the full set
    val (_, mb) = Lstm.fitDistributed(rows, "seq", "label",
      Lstm.init(1, 3, seed = 11L), epochs = 40, lr = 0.05,
      batchFraction = 0.5)
    assert(mb.last < 0.5 * mb.head,
      s"minibatch loss ${mb.head} -> ${mb.last}: did not drop")
  }

  test("multi-station BPTT: embedding-table gradients match finite differences") {
    val we = Lstm.initEmbedding(baseDim = 1, embDim = 2, nStations = 3,
      hidden = 2, seed = 5L)
    val samples = Seq(
      (0, (0 until 3).map(t => Array(math.sin(0.5 * t))), 0.4),
      (2, (0 until 2).map(t => Array(0.2 * t)), -0.1),
      (0, (0 until 4).map(t => Array(math.cos(0.3 * t))), 0.7))
    def loss(v: Array[Double]): Double = {
      val nBase = Lstm.flatten(we.base).length
      val wv = Lstm.EmbeddingWeights(
        Lstm.unflatten(3, 2, v.slice(0, nBase)),
        v.slice(nBase, v.length).grouped(2).toArray, 1)
      val acc = new Lstm.EmbGrads(3, 2, 3, 2)
      samples.foreach { case (s, sq, y) => Lstm.accumulateGradEmb(s, sq, y, wv, acc) }
      acc.base.loss
    }
    val acc = new Lstm.EmbGrads(3, 2, 3, 2)
    samples.foreach { case (s, sq, y) => Lstm.accumulateGradEmb(s, sq, y, we, acc) }
    // base grads via meanVector (undo the /n); emb grads are raw sums
    val analytic = acc.base.meanVector.map(_ * acc.base.n) ++ acc.emb
    val params = Lstm.flatten(we.base) ++ we.emb.flatten
    val eps = 1e-6
    params.indices.foreach { i =>
      val p = params.clone(); p(i) += eps
      val up = loss(p)
      p(i) = params(i) - eps
      val dn = loss(p)
      val numeric = (up - dn) / (2 * eps)
      assert(math.abs(analytic(i) - numeric) < 1e-6,
        s"param $i: analytic ${analytic(i)} vs numeric $numeric")
    }
    // station 1 received no samples: its table row must have zero grad
    assert((0 until 2).forall(j => acc.emb(1 * 2 + j) === 0.0))
  }

  test("multi-station fit separates per-station offsets via the embedding (05:276-372 analog)") {
    // y = 0.3*x_T + offset(station): without the embedding the best MSE
    // is the offset variance (~0.05); learning below that proves the
    // table carries the station identity
    val offsets = Array(0.1, 0.3, 0.5, 0.7)
    val samples = for {
      st <- 0 until 4
      s <- 0 until 15
    } yield {
      val xs = (0 until 3).map(t => Array((math.sin(0.4 * (s + t) + st) + 1.0) / 2.0))
      (st, xs: Seq[Array[Double]], 0.3 * xs.last(0) + offsets(st))
    }
    val (trained, hist) = Lstm.fitMultiStation(samples,
      Lstm.initEmbedding(1, 2, 4, 4, seed = 3L), epochs = 400, lr = 0.03)
    val offsetVar = {
      val m = offsets.sum / 4
      offsets.map(o => (o - m) * (o - m)).sum / 4
    }
    assert(hist.last < 0.2 * offsetVar,
      s"final MSE ${hist.last} not below the no-embedding floor $offsetVar")
    assert(hist.last < 0.1 * hist.head, s"loss ${hist.head} -> ${hist.last}")
    // per-station predictions land near their own offset band
    val preds = (0 until 4).map { st =>
      val xs = (0 until 3).map(t => Array((math.sin(0.4 * (7 + t) + st) + 1.0) / 2.0))
      Lstm.forward(xs.map(_ ++ trained.emb(st)), trained.base).get - 0.3 * xs.last(0)
    }
    (0 until 4).foreach { st =>
      assert(math.abs(preds(st) - offsets(st)) < 0.12,
        s"station $st: recovered offset ${preds(st)} vs ${offsets(st)}")
    }
  }

  test("distributedGradEmb over 4 partitions equals the local accumulation") {
    val we = Lstm.initEmbedding(1, 2, 5, 3, seed = 9L)
    val samples = (0 until 30).map { s =>
      (s % 5, (0 until 3).map(t => Array(math.sin(0.2 * (s + t)))): Seq[Array[Double]],
        math.cos(0.3 * s))
    }
    val local = new Lstm.EmbGrads(3, 3, 5, 2)
    samples.foreach { case (st, sq, y) => Lstm.accumulateGradEmb(st, sq, y, we, local) }
    val dist = Lstm.distributedGradEmb(
      spark.sparkContext.parallelize(samples, 4), we)
    assert(dist.base.n === local.base.n)
    local.emb.indices.foreach { i =>
      assert(math.abs(local.emb(i) - dist.emb(i)) <= 1e-10 * (1.0 + math.abs(local.emb(i))),
        s"emb grad $i: ${local.emb(i)} vs ${dist.emb(i)}")
    }
    val (lv, dv) = (local.base.meanVector, dist.base.meanVector)
    lv.indices.foreach { i =>
      assert(math.abs(lv(i) - dv(i)) <= 1e-10 * (1.0 + math.abs(lv(i))))
    }
  }

  test("end-to-end 04-notebook path on engine data: distributed fit approaches the noise floor and beats persistence") {
    // W5 sequences -> distributed BPTT/Adam -> MSE, all engine-native,
    // over the driver's own sf0.001 frame. The synthetic rates are
    // near-white (lag-1 corr ~0.07), so the persistence baseline
    // (pred = last value) sits at ~2x the variance while the best any
    // predictor can do is ~var; the trained net must land near the
    // floor and far below persistence - proof the trainer works on
    // real engine output, not just fixtures.
    import graft.ops.Windows
    val base = graft.queries.RelationalQueries.enriched(spark, "/root/testdata/sf0.001")
      .filter(col("filling_rate").isNotNull)
    val k = col("station_no")
    val ord = Seq(col("record_time"), col("event_id"))
    val seqd = base
      .withColumn("seq", Windows.slidingSeq(col("filling_rate"), 3, k, ord: _*))
      .withColumn("label", Windows.leadLabel(col("filling_rate"), k, ord: _*))
      .filter(size(col("seq")) === 3 && col("label").isNotNull)
      .withColumn("nested", transform(col("seq"), x => array(x)))
      .select("nested", "label", "seq")
      .cache()
    try {
      val stats = seqd.agg(
        avg(pow(col("label") - element_at(col("seq"), 3), 2)).as("mse_persist"),
        var_pop(col("label")).as("variance")).head()
      val msePersist = stats.getDouble(0)
      val variance = stats.getDouble(1)
      val (_, hist) = Lstm.fitDistributed(seqd, "nested", "label",
        Lstm.init(1, 8, seed = 21L), epochs = 80, lr = 0.02)
      assert(hist.last < hist.head, s"loss did not drop: ${hist.head} -> ${hist.last}")
      assert(hist.last < 0.75 * msePersist,
        s"trained MSE ${hist.last} does not beat persistence $msePersist")
      assert(hist.last < 1.25 * variance,
        s"trained MSE ${hist.last} not near the noise floor $variance")
    } finally seqd.unpersist()
  }

  test("X15 serving-path shape: tile x3 -> LSTM -> inverse scale -> clamp (main.py:148-199)") {
    // the API's single-observation path: scaled features tiled into a
    // length-3 steady-state sequence, scored, then mapped back to a
    // non-negative bike count — here with the engine LSTM in the seam
    // the reference fills with the trained torch model
    val obs = Seq((10L, 0.4, 0.7), (11L, 0.9, 0.1)).toDF("sid", "f1", "f2")
    val seqd = obs.withColumn("seq",
      array_repeat(array(col("f1"), col("f2")), 3))
    val scored = seqd
      .withColumn("pred_scaled", scoreUdf(w)(col("seq")))
      .withColumn("bikes_pred",
        greatest(lit(0.0), round(col("pred_scaled") * 30.0)))
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    // fixture: forward([[0.4,0.7]]*3) and [[0.9,0.1]]*3 via the same
    // equations, scaled by the 30-space inverse and clamped
    val e10 = forward(Seq.fill(3)(Array(0.4, 0.7)), w).get
    val e11 = forward(Seq.fill(3)(Array(0.9, 0.1)), w).get
    assert(scored(10L) === math.max(0.0, math.round(e10 * 30.0).toDouble))
    assert(scored(11L) === math.max(0.0, math.round(e11 * 30.0).toDouble))
  }
}
