package graft.ml

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** X14 engine-native: a standard LSTM (the reference's
  * `nn.LSTM(input, hidden, batch_first) → last timestep →
  * Linear(hidden, 1)`, `notebooks/04_lstm_prediction.ipynb:90-135`)
  * in pure Scala — the **forward pass** pluggable into the X15
  * scoring pipeline as a scalar UDF, and the **training half**:
  * exact BPTT gradients of the MSE loss plus an Adam loop, with a
  * distributed full-batch gradient for cluster-scale fits.
  *
  * Serving posture: load trained weights (the S10 ML-artifact seam —
  * four flat arrays in PyTorch's parameter layout) and evaluate them
  * distributed, next to the feature pipeline (W5 windows, X12
  * scaling, X13 inverse) that is already here. A scalar codegen'd
  * loop over ≤ (T·H·(D+H)) mults per row is exactly a map-stage
  * kernel: no shuffle, scales with executors like any projection.
  *
  * Training posture: synchronous full-batch gradient descent — the
  * classic Spark shape (MLlib's GradientDescent/L-BFGS do the same).
  * Per epoch: broadcast the (tiny — 4H·(D+H+2)+H+1 doubles) weight
  * vector, `treeAggregate` the per-sample BPTT gradients (map-side
  * partial sums, log-depth combine — one reduce of an ~1 KB array
  * regardless of row count), Adam step on the driver. At 100 TB the
  * bottleneck is the scan, not the 88-double gradient shuffle.
  * Gradient correctness is pinned against central finite differences
  * over every parameter in LstmSpec.
  *
  * Weight layout follows PyTorch `nn.LSTM` exactly so a state_dict
  * dumps straight in: `weight_ih_l0` is (4H × D) and `weight_hh_l0`
  * (4H × H), rows ordered [input | forget | cell | output]; the two
  * bias vectors are kept separate (PyTorch adds both). Gate math per
  * timestep, h/c zero-initialized:
  *
  *   i = σ(Wi·x + bi + Ui·h + b'i)     f = σ(Wf·x + bf + Uf·h + b'f)
  *   g = tanh(Wg·x + bg + Ug·h + b'g)  o = σ(Wo·x + bo + Uo·h + b'o)
  *   c ← f∘c + i∘g                     h ← o∘tanh(c)
  *
  * and the head is `fcW·h_T + fcB` (last timestep only, as the
  * reference's `out[:, -1, :]`). LstmSpec pins the whole pass against
  * an independently computed NumPy fixture.
  */
object Lstm {

  /** Trained parameters in PyTorch `nn.LSTM` + `nn.Linear` layout. */
  final case class LstmWeights(
      inputSize: Int,
      hidden: Int,
      wIh: Array[Array[Double]], // (4H, D) rows: [i | f | g | o]
      wHh: Array[Array[Double]], // (4H, H)
      bIh: Array[Double], // (4H)
      bHh: Array[Double], // (4H)
      fcW: Array[Double], // (H)
      fcB: Double) {
    require(wIh.length == 4 * hidden && wIh.forall(_.length == inputSize),
      s"weight_ih must be (4*$hidden, $inputSize)")
    require(wHh.length == 4 * hidden && wHh.forall(_.length == hidden),
      s"weight_hh must be (4*$hidden, $hidden)")
    require(bIh.length == 4 * hidden && bHh.length == 4 * hidden,
      s"biases must be (4*$hidden)")
    require(fcW.length == hidden, s"fc weight must be ($hidden)")
  }

  private def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  /** One sequence through LSTM + head. Returns None (skip-don't-die,
    * like the Multimodal decode contract) when the sequence is empty
    * or any step's feature width doesn't match the weights. */
  def forward(seq: Seq[Array[Double]], w: LstmWeights): Option[Double] = {
    if (seq.isEmpty || seq.exists(x => x == null || x.length != w.inputSize))
      return None
    val hDim = w.hidden
    val h = new Array[Double](hDim)
    val c = new Array[Double](hDim)
    val gates = new Array[Double](4 * hDim)
    seq.foreach { x =>
      var k = 0
      while (k < 4 * hDim) {
        var acc = w.bIh(k) + w.bHh(k)
        val wi = w.wIh(k); val wh = w.wHh(k)
        var d = 0
        while (d < w.inputSize) { acc += wi(d) * x(d); d += 1 }
        var j = 0
        while (j < hDim) { acc += wh(j) * h(j); j += 1 }
        gates(k) = acc
        k += 1
      }
      var j = 0
      while (j < hDim) {
        val i = sigmoid(gates(j))
        val f = sigmoid(gates(hDim + j))
        val g = math.tanh(gates(2 * hDim + j))
        val o = sigmoid(gates(3 * hDim + j))
        c(j) = f * c(j) + i * g
        h(j) = o * math.tanh(c(j))
        j += 1
      }
    }
    var out = w.fcB
    var j = 0
    while (j < hDim) { out += w.fcW(j) * h(j); j += 1 }
    Some(out)
  }

  /** The S10 artifact seam: rebuild weights from the flat arrays a
    * PyTorch `state_dict` export (or any column store) provides. */
  def fromFlat(inputSize: Int, hidden: Int,
               wIhFlat: Array[Double], wHhFlat: Array[Double],
               bIh: Array[Double], bHh: Array[Double],
               fcW: Array[Double], fcB: Double): LstmWeights =
    LstmWeights(inputSize, hidden,
      wIhFlat.grouped(inputSize).toArray,
      wHhFlat.grouped(hidden).toArray,
      bIh, bHh, fcW, fcB)

  /** Spark scorer over a sequence column (array<array<double>>): the
    * X15 seam's NN slot. Weights ride the closure — broadcast-small
    * (4H·(D+H+2)+H+1 doubles) — and null/ragged rows yield null. */
  def scoreUdf(w: LstmWeights): UserDefinedFunction =
    udf((seq: Seq[Seq[java.lang.Double]]) =>
      if (seq == null) None
      else forward(seq.map(toStep), w))

  /** One timestep column value → dense step, or null for the skip path.
    * A null *element* inside the inner array (legal in
    * array<array<double>> data) would NPE at unboxing, so it degrades to
    * the same null-step skip as a null inner array. The boxed element
    * type matters: an unboxed `Seq[Seq[Double]]` UDF signature makes
    * Spark's deserializer throw NOT_NULL_ASSERT_VIOLATION on the task
    * before any guard can run. */
  private def toStep(s: scala.collection.Seq[java.lang.Double]): Array[Double] = {
    if (s == null || s.contains(null)) return null
    val a = new Array[Double](s.size)
    var i = 0
    val it = s.iterator
    while (it.hasNext) { a(i) = it.next().doubleValue; i += 1 }
    a
  }

  // ---------------------------------------------------------------------
  // Training half: BPTT + Adam (X14 train, 04_lstm_prediction.ipynb:137-162)
  // ---------------------------------------------------------------------

  /** Accumulated gradients of the summed squared-error loss, flat in
    * the same PyTorch layout as [[LstmWeights]]. Mutable on purpose:
    * one instance per partition accumulates in place inside
    * `treeAggregate`, so per-row allocation is zero. */
  final class Grads(val d: Int, val h: Int) extends Serializable {
    val wIh = new Array[Double](4 * h * d)
    val wHh = new Array[Double](4 * h * h)
    val bIh = new Array[Double](4 * h)
    val bHh = new Array[Double](4 * h)
    val fcW = new Array[Double](h)
    var fcB = 0.0
    var loss = 0.0
    var n = 0L

    def merge(o: Grads): Grads = {
      var i = 0
      while (i < wIh.length) { wIh(i) += o.wIh(i); i += 1 }
      i = 0
      while (i < wHh.length) { wHh(i) += o.wHh(i); i += 1 }
      i = 0
      while (i < bIh.length) { bIh(i) += o.bIh(i); bHh(i) += o.bHh(i); i += 1 }
      i = 0
      while (i < fcW.length) { fcW(i) += o.fcW(i); i += 1 }
      fcB += o.fcB; loss += o.loss; n += o.n
      this
    }

    /** Mean-gradient vector in [[flatten]] parameter order. */
    def meanVector: Array[Double] = {
      val m = math.max(1L, n).toDouble
      val out = new Array[Double](wIh.length + wHh.length + bIh.length +
        bHh.length + fcW.length + 1)
      var p = 0
      def put(a: Array[Double]): Unit = { var i = 0; while (i < a.length) { out(p) = a(i) / m; p += 1; i += 1 } }
      put(wIh); put(wHh); put(bIh); put(bHh); put(fcW)
      out(p) = fcB / m
      out
    }

    def meanLoss: Double = loss / math.max(1L, n).toDouble
  }

  /** Weights → flat parameter vector (layout matches [[Grads.meanVector]]). */
  def flatten(w: LstmWeights): Array[Double] =
    (w.wIh.flatten ++ w.wHh.flatten ++ w.bIh ++ w.bHh ++ w.fcW) :+ w.fcB

  /** Flat parameter vector → weights (inverse of [[flatten]]). */
  def unflatten(d: Int, h: Int, v: Array[Double]): LstmWeights = {
    val (nIh, nHh, nB) = (4 * h * d, 4 * h * h, 4 * h)
    require(v.length == nIh + nHh + 2 * nB + h + 1,
      s"parameter vector must have ${nIh + nHh + 2 * nB + h + 1} entries, got ${v.length}")
    var p = 0
    def take(n: Int): Array[Double] = { val a = v.slice(p, p + n); p += n; a }
    fromFlat(d, h, take(nIh), take(nHh), take(nB), take(nB), take(h), v(p))
  }

  /** One sample's exact BPTT: accumulate d(pred−y)²/dθ into `acc`.
    * Ragged/empty rows are skipped (the forward-pass contract).
    * When `dX` is non-null (a zeroed T×D buffer) the input gradients
    * ∂loss/∂x_t[d] are added into it — the hook the multi-station
    * embedding trainer uses to backprop into its embedding table. */
  def accumulateGrad(seq: Seq[Array[Double]], y: Double, w: LstmWeights,
                     acc: Grads, dX: Array[Array[Double]] = null): Unit = {
    if (seq.isEmpty || seq.exists(x => x == null || x.length != w.inputSize))
      return
    val hDim = w.hidden
    val dDim = w.inputSize
    val t = seq.length
    val xs = seq.toArray
    // forward, caching every timestep's activations for the backward pass
    val iv = Array.ofDim[Double](t, hDim)
    val fv = Array.ofDim[Double](t, hDim)
    val gv = Array.ofDim[Double](t, hDim)
    val ov = Array.ofDim[Double](t, hDim)
    val cv = Array.ofDim[Double](t, hDim)
    val hv = Array.ofDim[Double](t, hDim)
    val gates = new Array[Double](4 * hDim)
    var step = 0
    while (step < t) {
      val x = xs(step)
      val hPrev = if (step == 0) null else hv(step - 1)
      var k = 0
      while (k < 4 * hDim) {
        var a = w.bIh(k) + w.bHh(k)
        val wi = w.wIh(k); val wh = w.wHh(k)
        var d = 0
        while (d < dDim) { a += wi(d) * x(d); d += 1 }
        if (hPrev != null) {
          var j = 0
          while (j < hDim) { a += wh(j) * hPrev(j); j += 1 }
        }
        gates(k) = a
        k += 1
      }
      var j = 0
      while (j < hDim) {
        val i = sigmoid(gates(j))
        val f = sigmoid(gates(hDim + j))
        val g = math.tanh(gates(2 * hDim + j))
        val o = sigmoid(gates(3 * hDim + j))
        val cPrev = if (step == 0) 0.0 else cv(step - 1)(j)
        iv(step)(j) = i; fv(step)(j) = f; gv(step)(j) = g; ov(step)(j) = o
        cv(step)(j) = f * cPrev + i * g
        hv(step)(j) = o * math.tanh(cv(step)(j))
        j += 1
      }
      step += 1
    }
    var pred = w.fcB
    var j = 0
    while (j < hDim) { pred += w.fcW(j) * hv(t - 1)(j); j += 1 }
    val err = pred - y
    acc.loss += err * err
    acc.n += 1
    val dPred = 2.0 * err
    // backward
    val dh = new Array[Double](hDim)
    val dc = new Array[Double](hDim)
    j = 0
    while (j < hDim) {
      acc.fcW(j) += dPred * hv(t - 1)(j)
      dh(j) = dPred * w.fcW(j)
      j += 1
    }
    acc.fcB += dPred
    val dPre = new Array[Double](4 * hDim)
    step = t - 1
    while (step >= 0) {
      val x = xs(step)
      val hPrev = if (step == 0) null else hv(step - 1)
      var jj = 0
      while (jj < hDim) {
        val i = iv(step)(jj); val f = fv(step)(jj)
        val g = gv(step)(jj); val o = ov(step)(jj)
        val tc = math.tanh(cv(step)(jj))
        val cPrev = if (step == 0) 0.0 else cv(step - 1)(jj)
        dc(jj) += dh(jj) * o * (1.0 - tc * tc)
        dPre(jj) = dc(jj) * g * i * (1.0 - i) // input gate
        dPre(hDim + jj) = dc(jj) * cPrev * f * (1.0 - f) // forget gate
        dPre(2 * hDim + jj) = dc(jj) * i * (1.0 - g * g) // cell candidate
        dPre(3 * hDim + jj) = dh(jj) * tc * o * (1.0 - o) // output gate
        dc(jj) *= f // carried to step-1
        jj += 1
      }
      var k = 0
      java.util.Arrays.fill(dh, 0.0)
      while (k < 4 * hDim) {
        val dp = dPre(k)
        acc.bIh(k) += dp; acc.bHh(k) += dp
        val rowI = k * dDim
        val wiRow = w.wIh(k)
        var d = 0
        while (d < dDim) {
          acc.wIh(rowI + d) += dp * x(d)
          if (dX != null) dX(step)(d) += dp * wiRow(d)
          d += 1
        }
        if (hPrev != null) {
          val rowH = k * hDim
          val wh = w.wHh(k)
          var j2 = 0
          while (j2 < hDim) {
            acc.wHh(rowH + j2) += dp * hPrev(j2)
            dh(j2) += dp * wh(j2)
            j2 += 1
          }
        }
        k += 1
      }
      step -= 1
    }
  }

  /** Seeded LCG emitting uniforms in ±1 — the shared deterministic
    * init source (one copy so the bit-extraction can never drift
    * between the base and embedding initializers). */
  private final class SeededUniform(seed: Long) {
    private var state = seed
    def next(): Double = {
      state = state * 6364136223846793005L + 1442695040888963407L
      // top 53 bits → [0,1), then to ±1
      (state >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
  }

  /** Deterministic small-weight init (uniform in ±1/√H, seeded LCG —
    * the PyTorch default scale without a framework RNG). */
  def init(inputSize: Int, hidden: Int, seed: Long = 42L): LstmWeights = {
    val rng = new SeededUniform(seed)
    def next(): Double = rng.next() / math.sqrt(hidden.toDouble)
    LstmWeights(inputSize, hidden,
      Array.fill(4 * hidden, inputSize)(next()),
      Array.fill(4 * hidden, hidden)(next()),
      Array.fill(4 * hidden)(next()),
      Array.fill(4 * hidden)(next()),
      Array.fill(hidden)(next()),
      next())
  }

  /** Adam state over a flat parameter vector (Kingma & Ba 2015,
    * PyTorch defaults β=(0.9, 0.999), ε=1e-8). */
  final class Adam(nParams: Int, lr: Double = 1e-2,
                   beta1: Double = 0.9, beta2: Double = 0.999,
                   eps: Double = 1e-8) extends Serializable {
    private val m = new Array[Double](nParams)
    private val v = new Array[Double](nParams)
    private var step = 0

    def update(params: Array[Double], grad: Array[Double]): Unit = {
      require(params.length == nParams && grad.length == nParams)
      step += 1
      val bc1 = 1.0 - math.pow(beta1, step)
      val bc2 = 1.0 - math.pow(beta2, step)
      var i = 0
      while (i < nParams) {
        m(i) = beta1 * m(i) + (1.0 - beta1) * grad(i)
        v(i) = beta2 * v(i) + (1.0 - beta2) * grad(i) * grad(i)
        params(i) -= lr * (m(i) / bc1) / (math.sqrt(v(i) / bc2) + eps)
        i += 1
      }
    }
  }

  /** Local full-batch Adam fit. Returns the trained weights and the
    * per-epoch mean-MSE history (index 0 = loss under the init). */
  def fit(samples: Seq[(Seq[Array[Double]], Double)], w0: LstmWeights,
          epochs: Int, lr: Double = 1e-2): (LstmWeights, Array[Double]) = {
    var w = w0
    val params = flatten(w0)
    val adam = new Adam(params.length, lr)
    val history = new Array[Double](epochs + 1)
    var e = 0
    while (e < epochs) {
      val acc = new Grads(w.inputSize, w.hidden)
      samples.foreach { case (seq, y) => accumulateGrad(seq, y, w, acc) }
      history(e) = acc.meanLoss
      adam.update(params, acc.meanVector)
      w = unflatten(w.inputSize, w.hidden, params)
      e += 1
    }
    val fin = new Grads(w.inputSize, w.hidden)
    samples.foreach { case (seq, y) => accumulateGrad(seq, y, w, fin) }
    history(epochs) = fin.meanLoss
    (w, history)
  }

  /** One distributed full-batch gradient: broadcast the weights, BPTT
    * per row, map-side partial sums, log-depth combine. The returned
    * [[Grads]] is bitwise what a single partition would accumulate up
    * to float-sum order. */
  def distributedGrad(rdd: RDD[(Seq[Array[Double]], Double)],
                      w: LstmWeights): Grads = {
    val bc = rdd.sparkContext.broadcast(w)
    try {
      rdd.treeAggregate(new Grads(w.inputSize, w.hidden))(
        seqOp = (acc, row) => { accumulateGrad(row._1, row._2, bc.value, acc); acc },
        combOp = (a, b) => a.merge(b))
    } finally bc.destroy()
  }

  /** Distributed full-batch Adam fit over a frame with a sequence
    * column (any array<array<numeric>> — cast to double) and a numeric
    * label column — the cluster-scale X14 trainer. One scan + one
    * ~1 KB gradient reduce per epoch; the sequence frame is cached for
    * the epoch loop and released before returning. Null-label rows
    * (W5's leadLabel emits one per partition tail) are dropped, the
    * same skip-don't-die contract as ragged sequences.
    *
    * `batchFraction` < 1 samples that fraction of rows per epoch
    * (fresh deterministic seed each epoch) — the distributed analog of
    * the reference's DataLoader minibatching (04:137-150): same
    * broadcast-and-reduce shape, gradient noise traded for epoch cost.
    * 1.0 (default) is exact full-batch. */
  def fitDistributed(df: DataFrame, seqCol: String, labelCol: String,
                     w0: LstmWeights, epochs: Int, lr: Double = 1e-2,
                     batchFraction: Double = 1.0, seed: Long = 42L)
      : (LstmWeights, Array[Double]) = {
    require(batchFraction > 0.0 && batchFraction <= 1.0,
      s"batchFraction must be in (0, 1], got $batchFraction")
    import org.apache.spark.sql.functions.col
    import org.apache.spark.storage.StorageLevel
    val rdd = df
      .filter(col(labelCol).isNotNull)
      .select(col(seqCol).cast("array<array<double>>"),
        col(labelCol).cast("double"))
      .rdd
      .map { r =>
        val seq = r.getSeq[scala.collection.Seq[java.lang.Double]](0)
        val arr: Seq[Array[Double]] =
          if (seq == null) Seq.empty
          else seq.map(s => toStep(s)).toSeq
        (arr, r.getDouble(1))
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var w = w0
      val params = flatten(w0)
      val adam = new Adam(params.length, lr)
      val history = new Array[Double](epochs + 1)
      var e = 0
      while (e < epochs) {
        val batch =
          if (batchFraction >= 1.0) rdd
          else rdd.sample(withReplacement = false, batchFraction, seed + e)
        val acc = distributedGrad(batch, w)
        history(e) = acc.meanLoss
        adam.update(params, acc.meanVector)
        w = unflatten(w.inputSize, w.hidden, params)
        e += 1
      }
      // final loss is always measured on the FULL set, so histories
      // from different batch fractions are comparable
      history(epochs) = distributedGrad(rdd, w).meanLoss
      (w, history)
    } finally rdd.unpersist(blocking = false)
  }

  // ---------------------------------------------------------------------
  // Multi-station variant: LSTM + trainable station embedding (X14's
  // 05_multistation_lstm.ipynb:276-310 — nn.Embedding(num_stations, E)
  // concatenated to the features at every timestep)
  // ---------------------------------------------------------------------

  /** LSTM weights + an N×E station-embedding table. The LSTM's input
    * size is baseDim + embDim. */
  final case class EmbeddingWeights(base: LstmWeights, emb: Array[Array[Double]],
                                    baseDim: Int) {
    require(base.inputSize > baseDim,
      s"embedding dim must be >= 1 (lstm inputSize ${base.inputSize} vs baseDim $baseDim)")
    require(emb.forall(_.length == base.inputSize - baseDim),
      "embedding width must equal lstm inputSize - baseDim")
    def embDim: Int = base.inputSize - baseDim
    def nStations: Int = emb.length
  }

  /** Gradient accumulator for [[EmbeddingWeights]]: the base LSTM
    * grads plus the flat N×E embedding-table gradient. Shares the base
    * accumulator's loss/n counters. */
  final class EmbGrads(d: Int, h: Int, nStations: Int, embDim: Int)
      extends Serializable {
    val base = new Grads(d, h)
    val emb = new Array[Double](nStations * embDim)
    def merge(o: EmbGrads): EmbGrads = {
      base.merge(o.base)
      var i = 0
      while (i < emb.length) { emb(i) += o.emb(i); i += 1 }
      this
    }
  }

  /** One multi-station sample's BPTT: concatenate the sample's station
    * embedding to every timestep, run the base BPTT, and route the
    * embedding columns' input gradients (summed over timesteps, as a
    * shared weight must) into the table row. */
  def accumulateGradEmb(station: Int, baseSeq: Seq[Array[Double]], y: Double,
                        w: EmbeddingWeights, acc: EmbGrads): Unit = {
    val e = w.embDim
    if (station < 0 || station >= w.nStations) return
    if (baseSeq.isEmpty ||
        baseSeq.exists(x => x == null || x.length != w.baseDim)) return
    val row = w.emb(station)
    val seq = baseSeq.map(x => x ++ row)
    val t = seq.length
    val dX = Array.ofDim[Double](t, w.base.inputSize)
    accumulateGrad(seq, y, w.base, acc.base, dX)
    var step = 0
    while (step < t) {
      var j = 0
      while (j < e) {
        acc.emb(station * e + j) += dX(step)(w.baseDim + j)
        j += 1
      }
      step += 1
    }
  }

  /** Deterministic init for the multi-station model. */
  def initEmbedding(baseDim: Int, embDim: Int, nStations: Int, hidden: Int,
                    seed: Long = 42L): EmbeddingWeights = {
    val base = init(baseDim + embDim, hidden, seed)
    val rng = new SeededUniform(seed ^ 0x9e3779b97f4a7c15L)
    EmbeddingWeights(base,
      Array.fill(nStations, embDim)(rng.next() * 0.1), baseDim)
  }

  /** Local full-batch Adam fit of LSTM + embedding table. Samples are
    * (stationIdx, baseFeatureSeq, label). */
  def fitMultiStation(samples: Seq[(Int, Seq[Array[Double]], Double)],
                      w0: EmbeddingWeights, epochs: Int, lr: Double = 1e-2)
      : (EmbeddingWeights, Array[Double]) = {
    val (n, e, d, h) = (w0.nStations, w0.embDim, w0.baseDim, w0.base.hidden)
    val nBase = flatten(w0.base).length
    var w = w0
    val params = flatten(w0.base) ++ w0.emb.flatten
    val adam = new Adam(params.length, lr)
    val history = new Array[Double](epochs + 1)
    def meanGradVector(acc: EmbGrads): Array[Double] = {
      val m = math.max(1L, acc.base.n).toDouble
      acc.base.meanVector ++ acc.emb.map(_ / m)
    }
    def epochGrads(): EmbGrads = {
      val acc = new EmbGrads(d + e, h, n, e)
      samples.foreach { case (s, sq, y) => accumulateGradEmb(s, sq, y, w, acc) }
      acc
    }
    var ep = 0
    while (ep < epochs) {
      val acc = epochGrads()
      history(ep) = acc.base.meanLoss
      adam.update(params, meanGradVector(acc))
      w = EmbeddingWeights(
        unflatten(d + e, h, params.slice(0, nBase)),
        params.slice(nBase, params.length).grouped(e).toArray,
        d)
      ep += 1
    }
    history(epochs) = epochGrads().base.meanLoss
    (w, history)
  }

  /** Distributed full-batch gradient for the multi-station model: same
    * treeAggregate shape as [[distributedGrad]] — the reduced payload
    * grows by N·E doubles (1,500 stations × 5 dims ≈ 60 KB), still a
    * broadcast-and-reduce, never a shuffle of the data. */
  def distributedGradEmb(rdd: RDD[(Int, Seq[Array[Double]], Double)],
                         w: EmbeddingWeights): EmbGrads = {
    val bc = rdd.sparkContext.broadcast(w)
    try {
      rdd.treeAggregate(
        new EmbGrads(w.base.inputSize, w.base.hidden, w.nStations, w.embDim))(
        seqOp = (acc, r) => { accumulateGradEmb(r._1, r._2, r._3, bc.value, acc); acc },
        combOp = (a, b) => a.merge(b))
    } finally bc.destroy()
  }
}
