package graft.ml

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** X14's serving half, engine-native: a standard LSTM **forward pass**
  * (the reference's `nn.LSTM(input, hidden, batch_first) → last
  * timestep → Linear(hidden, 1)`, `notebooks/04_lstm_prediction
  * .ipynb:90-135`) in pure Scala, pluggable into the X15 scoring
  * pipeline as a scalar UDF.
  *
  * Scope: TRAINING stays out of engine scope (SURVEY §2.10 X14 — a
  * 50-100-epoch Adam loop is a deep-learning-framework job, and the
  * reference's own M3 OLS-with-lag is the engine-native predictor).
  * What the engine must own is the SERVING path: load trained weights
  * (the S10 ML-artifact seam — four flat arrays in PyTorch's
  * parameter layout) and evaluate them distributed, next to the
  * feature pipeline (W5 windows, X12 scaling, X13 inverse) that is
  * already here. A scalar codegen'd loop over ≤ (T·H·(D+H)) mults per
  * row is exactly a map-stage kernel: no shuffle, scales with
  * executors like any projection.
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
    udf((seq: Seq[Seq[Double]]) =>
      if (seq == null) None
      else forward(seq.map(s => if (s == null) null else s.toArray), w))
}
