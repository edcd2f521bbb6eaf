package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ArrayKernels

/** Embedding similarity search: brute-force cosine top-k as the exact
  * baseline, and an IVF (inverted-file) variant as the scale path.
  *
  * Scale posture: brute force broadcasts the query set and linearly
  * scans the corpus — correct and embarrassingly parallel, with no
  * shuffle until the final per-query top-k (a tiny window). IVF prunes
  * the scan: vectors are bucketed by nearest centroid, queries probe
  * only the nProbe closest cells, so the scanned fraction drops to
  * ~nProbe/cells while recall stays near 1 for clustered data. At
  * 100 TB the cell id becomes the storage partitioning key, so a probe
  * touches only matching partitions — same plan, pruned at the source.
  *
  * Hot-path arithmetic runs on the native codegen'd kernels
  * ([[graft.functions.ArrayKernels]]) — same sequential-fold order as
  * the `aggregate`+`zip_with` composition they replaced (bit-identical,
  * oracle-stable), but inside whole-stage codegen instead of
  * interpreted lambda evals. Norms are factored out of the pair loop:
  * cosine(a,b) = dot(a,b)/(‖a‖·‖b‖) with ‖·‖ computed once per row
  * before the join — the same doubles, ~3× fewer fold passes.
  */
object Similarity {

  /** Dot product of two float-vector columns in double precision,
    * sequential left fold — bit-identical to the SQL oracle's
    * list_sum(list_transform(...)). */
  def dotD(a: Column, b: Column): Column = ArrayKernels.dotD(a, b)

  /** Cosine similarity via [[dotD]]. Prefer pre-computing the norms
    * before a join (as the operators below do) when one side is reused
    * across many pairs. */
  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b)))

  /** ‖v‖ = sqrt(Σ vᵢ²) in double precision. */
  def norm(v: Column): Column = sqrt(dotD(v, v))

  /** The family-wide norm guard: keep a row only when its norm is a
    * strictly-positive FINITE number. A bare `> 0` would keep NaN-norm
    * rows (NaN compares greater than any value under Spark's total
    * ordering, r15 ADVICE), letting one corrupt component NaN-top every
    * desc ranking; `!isnan` closes that hole, and `< +Inf` (r16 ADVICE)
    * closes the remaining one — a vector with an Inf COMPONENT has norm
    * +Inf (not NaN), whose Inf/Inf cosine is NaN and would sort first
    * under desc ranking — so the guard now matches the oracle's
    * `isfinite(x) AND x > 0` exactly: zero-, NaN- or Inf-norm rows are
    * uniformly dropped on either side of every ANN operator. */
  private def posNorm(c: Column): Column =
    c > 0 && !isnan(c) && c < lit(Double.PositiveInfinity)

  /** Squared L2 distance in double precision, same fold shape. */
  def sqDist(a: Column, b: Column): Column = ArrayKernels.sqDistD(a, b)

  /** Brute-force exact top-k: broadcast `queries` (qIdCol, qVecCol)
    * against the corpus, cosine per pair (norms precomputed per side),
    * row_number per query with a deterministic (similarity desc,
    * corpus id) tie-break.
    *
    * Zero-norm contract (uniform across the ANN family, r14 ADVICE): a
    * row whose vector has zero (or NaN) norm is DROPPED on either side
    * — its cosine is undefined, and concretely 0/0 is a hard
    * DIVIDE_BY_ZERO under ANSI semantics (Spark 4's default), so one
    * degenerate row would otherwise kill the whole query (or, with
    * ANSI off, NaN-top every desc ranking). The same guard lives in
    * [[pqRefineTopK]] and both IVF paths; exact and quantized passes
    * agree on the dropped set because a nonzero float vector always
    * quantizes nonzero (its max-|x| component maps to ±127 by
    * [[int8Scale]]'s construction). */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qIdCol: String, qVecCol: String,
                     k: Int): DataFrame = {
    val corpusN = corpus.withColumn("__c_norm", norm(col(vecCol)))
      .filter(posNorm(col("__c_norm")))
    val queriesN = queries.withColumn("__q_norm", norm(col(qVecCol)))
      .filter(posNorm(col("__q_norm")))
    val scored = corpusN.crossJoin(broadcast(queriesN))
      .filter(col(idCol) =!= col(qIdCol))
      .withColumn("cos_sim",
        dotD(col(qVecCol), col(vecCol)) / (col("__q_norm") * col("__c_norm")))
    val w = Window.partitionBy(qIdCol).orderBy(desc("cos_sim"), col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol).as("query_id"), col(idCol).as("neighbor_id"),
        col("cos_sim"), col("rank"))
  }

  /** Int8 scalar quantization — the production 4×-smaller embedding
    * storage path (float32 → one byte per component + one float scale
    * per vector; at 100 TB of embeddings the scan-volume saving IS the
    * feature, orthogonal to PQ's codebook compression in ss5).
    * Per-vector symmetric scale s = max|xᵢ| / 127, so every quantized
    * component lands in [-127, 127] by construction (a true TINYINT).
    * Deterministic end to end: array_max of |x| is exact double math,
    * floor(x/s + 0.5) is the explicit round-half-up both engines
    * compute identically (round() itself differs on binary-edge
    * half-cases across engines), and an all-zero vector quantizes to
    * all-zero instead of dividing by zero. */
  def int8Scale(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double")))) / 127.0

  /** Quantize `v` under `scale` to ARRAY<TINYINT>. See [[int8Scale]]. */
  def int8Quantize(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale > 0, floor(x.cast("double") / scale + 0.5))
        .otherwise(lit(0L)).cast("tinyint"))

  /** The int8 vectors back as exact integer-VALUED doubles for
    * scoring: cosine over quantized components needs no dequantization
    * because the two scales cancel (Σ qaᵢqbᵢ·sasb) / (‖qa‖sa·‖qb‖sb) =
    * Σ qaᵢqbᵢ / (‖qa‖‖qb‖) — pure integer sums (exact in ANY
    * aggregation order, every term ≪ 2^53) plus one sqrt and one
    * division, bit-reproducible on both engines. */
  def int8AsDouble(q8: Column): Column =
    transform(q8, x => x.cast("double"))

  /** IVF cell assignment: nearest centroid by squared L2 per row.
    * `centroids` = (cell, centVecCol), broadcast-small by construction
    * (cells ≪ corpus). One broadcast join + per-id argmin window. */
  def assignCells(df: DataFrame, idCol: String, vecCol: String,
                  centroids: DataFrame, cellCol: String, centVecCol: String): DataFrame = {
    val joined = df.crossJoin(broadcast(centroids))
      .withColumn("cell_dist", sqDist(col(vecCol), col(centVecCol)))
    val w = Window.partitionBy(idCol).orderBy(col("cell_dist"), col(cellCol))
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "cell_dist", centVecCol)
  }

  /** Sign-random-projection (hyperplane) LSH tables: `tables`
    * independent tables of `bits` seeded gaussian hyperplanes each.
    * Deterministic for a fixed seed — the data-INDEPENDENT ANN path
    * (no training pass, unlike IVF): two vectors land in the same
    * bucket of one table with probability (1 − θ/π)^bits for angle θ,
    * so near-duplicates (θ≈0) collide in almost every table while the
    * bulk spreads over 2^bits buckets. */
  def hyperplaneTables(dim: Int, tables: Int, bits: Int,
                       seed: Long = 42L): Seq[Seq[Array[Double]]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(tables)(Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian())))
  }

  /** Packed sign-bucket of `v` under one table's hyperplanes: bit i =
    * (v · plane_i ≥ 0). Pure codegen'd dot products over literal
    * plane arrays. NULL-propagating by design: if the vector length
    * doesn't match the planes' dim, dotD is null and so is the bucket —
    * the downstream equi-join then DROPS the row (null keys never
    * match) instead of silently collapsing everything into bucket 0
    * and going quadratic. */
  def hyperplaneBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val d = ArrayKernels.dotD(v, array(p.map(lit).toIndexedSeq: _*))
      // null dot → null bucket (explicit guard); NaN takes the ≥0 bit —
      // DuckDB orders NaN above all values, so the oracle's `d >= 0` is
      // true for NaN and the engines must agree on corrupt components
      when(d.isNull, lit(null).cast("int"))
        .when(d >= 0 || isnan(d), lit(1 << i))
        .otherwise(lit(0))
    }.reduce(_ + _)

  /** Axis-aligned sign-bit LSH tables: table `t` packs the sign bits
    * of components `[groupBits·t+1, groupBits·(t+1)]` — the degenerate
    * hyperplane family whose planes are standard basis vectors. Data-
    * independent like [[hyperplaneBucket]], but each bit is a single
    * element sign test instead of a 64-term dot product, and — unlike
    * seeded gaussian planes — compactly mirrorable in a SQL oracle
    * (`embedding[i] >= 0`, no plane literals). Because the tables
    * cover DISJOINT component groups, a perturbation confined to one
    * group leaves every other table's bucket identical, so near-dups
    * that differ in few components collide deterministically — the
    * recall guarantee dd5 relies on. Returns an array of (t, b)
    * structs to explode into equi-join keys; a missing/short vector
    * yields null buckets (explicit null guard), which the downstream
    * equi-join drops instead of collapsing into bucket 0. */
  def axisSignBuckets(v: Column, tables: Int, groupBits: Int): Column = {
    require(groupBits >= 1 && groupBits <= 31,
      s"groupBits must be in [1,31] (bucket is a packed Int), got $groupBits")
    require(tables >= 1, s"tables must be positive, got $tables")
    array((0 until tables).map { t =>
      val b = (0 until groupBits).map { i =>
        val e = try_element_at(v, lit(groupBits * t + i + 1))
        // same NaN-as-≥0 contract as [[hyperplaneBucket]] (DuckDB parity)
        when(e.isNull, lit(null).cast("int"))
          .when(e >= 0f || isnan(e), lit(1 << i))
          .otherwise(lit(0))
      }.reduce(_ + _)
      struct(lit(t).as("t"), b.as("b"))
    }: _*)
  }

  /** Multi-table hyperplane-LSH top-k: candidates are corpus rows that
    * share (table, bucket) with the query in ANY table — the union-of-
    * tables probe — deduplicated, then exact cosine + top-k. The join
    * key is (table, bucket): shuffle-bounded, never all-pairs; at
    * 100 TB (table, bucket) becomes the storage partitioning key and a
    * probe touches only matching partitions, like ss2's IVF cells but
    * with zero training. Recall is tunable via tables × bits
    * (asserted against brute force in LlmSpec). */
  def hyperplaneTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qIdCol: String, qVecCol: String,
                     dim: Int, tables: Int, bits: Int, k: Int,
                     seed: Long = 42L): DataFrame = {
    require(bits >= 1 && bits <= 31,
      s"bits must be in [1,31] (bucket is a packed Int), got $bits")
    require(dim >= 1 && tables >= 1 && k >= 1,
      s"dim/tables/k must be positive, got dim=$dim tables=$tables k=$k")
    val planes = hyperplaneTables(dim, tables, bits, seed)
    // bucket computation runs as ONE kernel expression with the plane
    // matrix as data ([[graft.functions.HyperplaneBuckets]]): the
    // literal-inlined form ([[hyperplaneBucket]], kept as the
    // executable spec the ss3 oracle replays in SQL) blows HotSpot's
    // JIT method limit past ~1 table of planes and ran INTERPRETED —
    // a measured 10x cliff at 2 tables on the r8 recall curve.
    // posexplode emits (table = position, bucket); null buckets (dim
    // mismatch / null element) join nothing — scalar equi-join keys
    // keep SQL null semantics, unlike a struct key whose null fields
    // would match as raw bytes
    def withBuckets(df: DataFrame, vec: Column, normName: String): DataFrame =
      df.withColumn(normName, norm(vec))
        .select(col("*"),
          posexplode(graft.functions.ArrayKernels.hyperplaneBuckets(vec, planes))
            .as(Seq("__t", "__b")))
    val cB = withBuckets(corpus, col(vecCol), "__c_norm")
    val qB = withBuckets(queries, col(qVecCol), "__q_norm")
    // score BEFORE deduplicating: the broadcast join leaves scoring
    // map-side, so the only shuffle (the dedup of pairs colliding in
    // several tables) carries three scalar columns instead of two
    // attached vectors — at a 100x corpus with clustered buckets the
    // wide-row dedup shuffled gigabytes (the r8 recall-curve run
    // measured 196 s -> ~2 s from this reorder). cos_sim is a pure
    // function of the pair, so dedup-after-score is value-identical.
    val candidates = cB.join(broadcast(qB), Seq("__t", "__b"))
      .filter(col(idCol) =!= col(qIdCol))
      .withColumn("cos_sim",
        dotD(col(qVecCol), col(vecCol)) / (col("__q_norm") * col("__c_norm")))
      .select(col(qIdCol), col(idCol), col("cos_sim"))
      .dropDuplicates(qIdCol, idCol) // same pair can collide in several tables
    val w = Window.partitionBy(qIdCol).orderBy(desc("cos_sim"), col(idCol))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol).as("query_id"), col(idCol).as("neighbor_id"),
        col("cos_sim"), col("rank"))
  }

  // ---- Product quantization (Jégou et al., TPAMI 2011) -------------------
  // PQ compresses each vector into M small codes (nearest codeword per
  // subspace) and scores queries against CODES ONLY via asymmetric
  // distance computation (ADC): a per-query lookup table of
  // query-subvector ↔ codeword distances, summed over subspaces. In
  // relational terms the LUT is a broadcast-joinable table and ADC is
  // one keyed join + a fixed-order sum — the FAISS IVF-PQ shape
  // re-expressed as a Spark plan: codes are ~M bytes/vector (vs
  // dim·4), the probe prunes cells, and the only shuffle is the final
  // per-(query, candidate) rollup.

  /** The M disjoint subvectors of `vec` (1-based slices of subDim). */
  def pqSubvectors(vec: Column, m: Int, subDim: Int): Column =
    array((0 until m).map(i => slice(vec, i * subDim + 1, subDim)): _*)

  /** Train PQ codebooks on a BOUNDED deterministic sample — FAISS
    * practice: codebooks come from a fixed-size training sample no
    * matter how large the corpus, so the collect here is sample-sized
    * by construction, never corpus-sized (the only `.collect()` in the
    * PQ path, and the 100 TB story is unchanged: sampleN rows). The
    * sample is the `sampleN` md5-hash-smallest ids (layout- and
    * run-invariant, no rand()); per subspace, a seeded local Lloyd
    * k-means ([[graft.ml.Models.kmeansLocalRows]]) learns `ks`
    * codewords, truncated to 6 decimals so they inline as
    * cross-engine-exact literals in both the Spark plan and the SQL
    * oracle (the x11 centroids-as-literals move). Returns
    * (subspace, codeword id, codeword) rows. */
  def pqTrainCodebooks(df: DataFrame, idCol: String, vecCol: String,
                       m: Int, subDim: Int, ks: Int, sampleN: Int,
                       seed: Long = 42L): Seq[(Int, Int, Array[Double])] = {
    val sample: Array[Array[Float]] = df
      .select(col(vecCol), md5(col(idCol).cast("string")).as("__h"))
      .orderBy(col("__h"))
      .limit(sampleN)
      .select(col(vecCol))
      .collect()
      .map(_.getSeq[Float](0).toArray)
    def t6(x: Double): Double = math.floor(x * 1e6 + 1e-6) / 1e6
    (0 until m).flatMap { mi =>
      val rows = sample.map(v =>
        Array.tabulate(subDim)(j => v(mi * subDim + j).toDouble))
      graft.ml.Models.kmeansLocalRows(rows, ks, seed + mi, maxIter = 50)
        .zipWithIndex
        .map { case (cw, cid) => (mi, cid, cw.map(t6)) }
    }
  }

  /** Encode each row as M codes: nearest codeword per subspace by
    * squared L2, deterministic (distance, cid) tie-break. `codebook`
    * must have columns (pq_m, pq_cid, pq_vec) and is broadcast-small
    * by construction (M · #codewords rows). Output: idCol + `carry`
    * columns + (pq_m, pq_cid) — M rows per input row. */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
               codebook: DataFrame, m: Int, subDim: Int,
               carry: Seq[String] = Nil): DataFrame = {
    val sub = df.select(col(idCol) +: carry.map(col) :+
      posexplode(pqSubvectors(col(vecCol), m, subDim)).as(Seq("__m", "__sub")): _*)
    val w = Window.partitionBy(col(idCol), col("__m"))
      .orderBy(col("__d"), col("pq_cid"))
    sub.join(broadcast(codebook), col("__m") === col("pq_m"))
      .withColumn("__d", sqDist(col("__sub"), col("pq_vec")))
      // a wrong-dimension vector yields NULL sqDist on every codeword;
      // under the default asc ordering nulls sort FIRST, so without
      // this guard the argmin window would silently hand it the
      // lowest-cid codeword. Drop instead — the hyperplaneTopK
      // null-keys-join-nothing convention (malformed rows fall out of
      // the index rather than poisoning it with legitimate-looking
      // codes).
      .filter(col("__d").isNotNull)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((col(idCol) +: carry.map(col)) ++
        Seq(col("pq_m"), col("pq_cid")): _*)
  }

  /** IVF-PQ top-k: probe the nProbe nearest cells per query (exact
    * centroid distances), then rank candidates by ADC over their PQ
    * codes — the original vectors are never touched after encoding.
    * `codes` = [[pqEncode]] output carrying cellCol; per-(query,
    * candidate) distance is assembled as M conditional sums added in
    * FIXED subspace order (a plain `sum` over the M partials would be
    * aggregation-order-nondeterministic in the last ulp — enough to
    * flip a rank tie vs the oracle's replay). */
  /** The probe plan every IVF serve shares: rank cells per query by
    * squared distance to the stored centroid (cell-id tie-break), keep
    * the nProbe closest. Null centroid distance (malformed /
    * wrong-dimension query) is dropped — nulls sort FIRST under the
    * ascending window, so a bad query would otherwise probe arbitrary
    * cells. Returns the query columns + `cellCol`, one row per
    * (query, probed cell). ONE definition feeds the coarse join AND
    * [[probedCellSet]]'s static partition-pruning list, so the scanned
    * cells and the joined cells cannot desync. */
  def probeCells(queries: DataFrame, qIdCol: String, qVecCol: String,
                 centroids: DataFrame, centVecCol: String, cellCol: String,
                 nProbe: Int): DataFrame = {
    val probeW = Window.partitionBy(qIdCol).orderBy(col("cell_dist"), col(cellCol))
    queries.crossJoin(broadcast(centroids))
      .withColumn("cell_dist", sqDist(col(qVecCol), col(centVecCol)))
      .filter(col("cell_dist").isNotNull)
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nProbe)
      .drop("rn", "cell_dist", centVecCol)
  }

  /** The DISTINCT cell ids a query workload probes — the serve-side
    * STATIC partition-pruning list for a cell-partitioned stored index
    * (ss10/ss11): `store.filter(col("cell").isin(probedCellSet…: _*))`
    * turns the probe list into literal PartitionFilters, so the coarse
    * scan lists only probed-cell directories at PLAN time, at every
    * scale. Static beats dynamic pruning here by measurement: Spark's
    * DPP inserts `dynamicpruningexpression(cell IN dynamicpruning#N)`
    * on this exact join but silently degrades it to `true` when the
    * broadcast-reuse check fails under AQE re-planning or the cost
    * model under-prices the benefit (both observed at fixture scale) —
    * whereas the serve KNOWS its probe list before scanning, so
    * nothing needs to be estimated. The collect is bounded by
    * ≤ min(|queries|·nProbe, nCells) ints — the same broadcast-tiny
    * contract as the probe frame itself. */
  def probedCellSet(queries: DataFrame, qIdCol: String, qVecCol: String,
                    centroids: DataFrame, centVecCol: String, cellCol: String,
                    nProbe: Int): Seq[Any] =
    probeCells(queries, qIdCol, qVecCol, centroids, centVecCol, cellCol, nProbe)
      .select(col(cellCol)).distinct().orderBy(col(cellCol))
      .collect().map(_.get(0)).toSeq

  def ivfPqTopK(codes: DataFrame, idCol: String, cellCol: String,
                codebook: DataFrame,
                centroids: DataFrame, centVecCol: String,
                queries: DataFrame, qIdCol: String, qVecCol: String,
                m: Int, subDim: Int, nProbe: Int, k: Int): DataFrame = {
    val probes = probeCells(queries, qIdCol, qVecCol,
        centroids, centVecCol, cellCol, nProbe)
      .select(col(qIdCol), col(cellCol))
    val lut = queries.select(col(qIdCol),
        posexplode(pqSubvectors(col(qVecCol), m, subDim)).as(Seq("__m", "__sub")))
      .join(broadcast(codebook), col("__m") === col("pq_m"))
      .select(col(qIdCol), col("pq_m"), col("pq_cid"),
        sqDist(col("__sub"), col("pq_vec")).as("__pd"))
    val cand = codes.join(broadcast(probes), Seq(cellCol))
      .filter(col(idCol) =!= col(qIdCol))
      .join(broadcast(lut), Seq(qIdCol, "pq_m", "pq_cid"))
    val partials = (0 until m).map(i =>
      sum(when(col("pq_m") === i, col("__pd"))).as(s"__d$i"))
    val adc = cand.groupBy(col(qIdCol), col(idCol))
      .agg(partials.head, partials.tail: _*)
      .withColumn("approx_dist", (0 until m).map(i => col(s"__d$i")).reduce(_ + _))
      // a candidate with PARTIAL codes (pqEncode dropped some of its
      // malformed subvectors) sums to null — drop it here too rather
      // than let null sort first in the ranking
      .filter(col("approx_dist").isNotNull)
    val w = Window.partitionBy(qIdCol).orderBy(col("approx_dist"), col(idCol))
    adc.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol).as("query_id"), col(idCol).as("neighbor_id"),
        col("approx_dist"), col("rank"))
  }

  /** Exact re-ranking of a PQ shortlist — the FAISS "refine" step:
    * ADC ranks candidates by QUANTIZED distance, which deliberately
    * collapses differences below quantization resolution into ties
    * (measured: on a corpus whose true neighbors are tight jittered
    * replicas, pure-ADC top-k picks arbitrarily inside the ~tie-class
    * and recall ≈ k / |tie class|). Re-scoring a shortlist of
    * `shortlist ≫ k` ADC candidates with exact cosine restores the
    * fine order; the exact pass touches only |queries|·shortlist
    * vectors — a keyed point-lookup join, not a scan. */
  def pqRefineTopK(shortlist: DataFrame, corpus: DataFrame,
                   idCol: String, vecCol: String,
                   queries: DataFrame, qIdCol: String, qVecCol: String,
                   k: Int): DataFrame = {
    val cn = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__n_vec"))
      .withColumn("__c_norm", norm(col("__n_vec")))
      // bruteForceTopK's uniform zero-norm guard: an ADC shortlist (ss5)
      // can carry a zero-norm candidate the cosine refine can't score —
      // 0/0 is a hard error under ANSI, so drop it here too
      .filter(posNorm(col("__c_norm")))
    val qn = queries
      .select(col(qIdCol).as("query_id"), col(qVecCol).as("__q_vec"))
      .withColumn("__q_norm", norm(col("__q_vec")))
      .filter(posNorm(col("__q_norm")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(desc("cos_sim"), col("neighbor_id"))
    // BROADCAST the shortlist (|queries|·shortlist id pairs — bounded
    // small like the query set itself): the corpus side then streams
    // past it map-side and only shortlist hits ever materialize their
    // float vector. The prior shuffle_hash form exchanged the ENTIRE
    // float corpus on neighbor_id to serve a handful of lookups — the
    // one corpus-wide shuffle in the refine family, visible in the r14
    // ss9 plan dump and exactly what the stored-table scan-envelope
    // claim must not pay at 100 TB.
    cn.join(broadcast(shortlist.select("query_id", "neighbor_id")),
        Seq("neighbor_id"))
      .join(broadcast(qn), Seq("query_id"))
      .withColumn("cos_sim",
        dotD(col("__q_vec"), col("__n_vec")) / (col("__q_norm") * col("__c_norm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos_sim"), col("rank"))
  }

  /** Int8-coarse → exact-refine top-k (ss7, r12 verdict ask #3): the
    * production composition of the ss6 storage path with the ANN
    * family. CANDIDATE GENERATION scans only the int8-quantized corpus
    * — 4× fewer bytes than float32, and at 100 TB of embeddings that
    * corpus-wide scan is the entire cost envelope — ranking by
    * quantized cosine (integer dot; the per-vector scales cancel, so
    * no dequantization and the score is exact integer math in any
    * aggregation order). The top `shortlist ≫ k` per query then
    * re-score with exact float cosine — [[pqRefineTopK]]'s keyed
    * point-lookup join, touching |queries|·shortlist float vectors
    * instead of the corpus. A true neighbor is lost only if int8
    * quantization error (≤ ~0.8% per component) pushes it below rank
    * `shortlist` in the coarse pass — LlmSpec pins recall@k against
    * brute force on this corpus.
    *
    * In production the quantized table is STORED (ss6's parquet claim:
    * ≤ 40% of float32 even on incompressible vectors) and the float
    * corpus is only ever point-read by the refine join; here both
    * derive from the same input frame. */
  def int8RefineTopK(corpus: DataFrame, idCol: String, vecCol: String,
                     queries: DataFrame, qIdCol: String, qVecCol: String,
                     shortlist: Int, k: Int): DataFrame = {
    val quantCorpus = corpus
      .select(col(idCol),
        int8Quantize(col(vecCol), int8Scale(col(vecCol))).as("__q8"))
    int8RefineTopKStored(quantCorpus, idCol, "__q8",
      corpus.select(col(idCol), col(vecCol)), vecCol,
      queries, qIdCol, qVecCol, shortlist, k)
  }

  /** [[int8RefineTopK]] against an ALREADY-QUANTIZED corpus — the
    * stored-table serving form (ss9/st15): `quantCorpus` is the
    * persisted int8 table (idCol + an ARRAY<TINYINT> column, e.g. a
    * parquet table written once by [[int8Quantize]]), and the coarse
    * pass scans ONLY it — the plan's corpus-side ReadSchema carries no
    * float vector column, which at 100 TB is the whole point: the scan
    * envelope is the 4×-smaller stored bytes (ss6 measured ≤ 40% on
    * disk), and `corpus`'s float vectors are touched exclusively by
    * the |queries|·shortlist keyed point-lookups of the refine join.
    * Because [[int8Quantize]] is deterministic and tinyint survives a
    * parquet roundtrip exactly, this is hash-identical to
    * [[int8RefineTopK]]'s in-session quantization (the dd11
    * persisted-signature-table precedent, proven by ss9 sharing ss7's
    * oracle). Queries quantize in-session — they are the small side. */
  def int8RefineTopKStored(quantCorpus: DataFrame, idCol: String, q8Col: String,
                           corpus: DataFrame, vecCol: String,
                           queries: DataFrame, qIdCol: String, qVecCol: String,
                           shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) — the refine pass only reorders")
    // Zero-norm rows (an all-zero quantized vector) fall to
    // bruteForceTopK's uniform family guard (r14 ADVICE) — plan and
    // serving agree on rank geometry for degenerate inputs.
    val qCorpus = quantCorpus
      .select(col(idCol), int8AsDouble(col(q8Col)).as("__qv"))
    val qQueries = queries
      .select(col(qIdCol),
        int8AsDouble(int8Quantize(col(qVecCol), int8Scale(col(qVecCol))))
          .as("__q_qv"))
    val coarse = bruteForceTopK(qCorpus, idCol, "__qv",
      qQueries, qIdCol, "__q_qv", shortlist)
    pqRefineTopK(coarse, corpus, idCol, vecCol, queries, qIdCol, qVecCol, k)
  }

  // ---- int8 shortlist planning (r13 verdict ask #4) ----------------------
  // The refine pass recovers a true top-k neighbor only if the coarse
  // quantized ranking placed it within `shortlist` — so coarse
  // recall@k AT depth `shortlist` IS refined recall@k, and picking the
  // shortlist is picking a quantile of the quantized-rank distribution
  // of true neighbors. That distribution depends on the corpus's score
  // geometry (how densely similarities crowd the k-th score) as much
  // as on the quantization noise, so — the lshPlan precedent, but
  // measured rather than modeled — the plan MEASURES it on a bounded
  // deterministic query sample (the pqTrainCodebooks sampling move)
  // and reads the shortlist off the empirical CDF. Deterministic end
  // to end: md5-smallest sample ids, integer quantized scores,
  // id-tiebroken ranks.

  /** The quantized-coarse rank of every TRUE top-k neighbor, for a
    * bounded deterministic sample of `sampleN` queries drawn FROM THE
    * QUERY WORKLOAD (md5-smallest query ids — layout- and
    * run-invariant): one value per (sample query, exact top-k
    * neighbor) pair, ≤ sampleN·k ints collected driver-side (bounded
    * by construction at any corpus size; the only non-distributed
    * step). The scoring pass is one broadcast cross of the sample
    * against the corpus — sampleN·|corpus| scored rows, a plan-time
    * cost, not a serving cost.
    *
    * The sample MUST come from the workload, not the corpus: the r14
    * bench_scale measurement (ann_recall int8.plan) planned shortlist
    * 10 from md5-sampled CORPUS rows on the clustered-replica corpus
    * while the real workload needed ~80 for the same recall — a 4×
    * under-plan. Workload queries sit at replica-cluster centroids,
    * where the true top-k is a dense near-tie class that quantization
    * noise reorders freely; corpus rows are themselves jittered
    * replicas with much wider sibling gaps. Rank geometry is a
    * property of the (query, corpus) PAIR. */
  def int8TrueNeighborRanks(corpus: DataFrame, idCol: String, vecCol: String,
                            queries: DataFrame, qIdCol: String, qVecCol: String,
                            k: Int, sampleN: Int): Array[Int] = {
    require(k >= 1 && sampleN >= 1,
      s"k/sampleN must be positive, got k=$k sampleN=$sampleN")
    val sample = queries
      .select(col(qIdCol).as("__plan_qid"), col(qVecCol).as("__plan_qvec"),
        md5(col(qIdCol).cast("string")).as("__h"))
      .orderBy(col("__h"))
      .limit(sampleN)
      .select(col("__plan_qid"), col("__plan_qvec"))
    val exact = bruteForceTopK(corpus, idCol, vecCol,
        sample, "__plan_qid", "__plan_qvec", k)
      .select(col("query_id"), col("neighbor_id"))
    def quant(c: Column): Column = int8AsDouble(int8Quantize(c, int8Scale(c)))
    val corpusQ = corpus
      .select(col(idCol), quant(col(vecCol)).as("__qv"))
      .withColumn("__c_qnorm", norm(col("__qv")))
      .filter(posNorm(col("__c_qnorm"))) // ivfInt8RefineTopK's zero-norm guard
    val queriesQ = sample
      .select(col("__plan_qid"), quant(col("__plan_qvec")).as("__q_qv"))
      .withColumn("__q_qnorm", norm(col("__q_qv")))
      .filter(posNorm(col("__q_qnorm")))
    val w = Window.partitionBy("__plan_qid").orderBy(desc("q_sim"), col(idCol))
    val ranked = corpusQ.crossJoin(broadcast(queriesQ))
      .filter(col(idCol) =!= col("__plan_qid"))
      .withColumn("q_sim",
        dotD(col("__q_qv"), col("__qv")) / (col("__q_qnorm") * col("__c_qnorm")))
      .withColumn("q_rank", row_number().over(w))
      .select(col("__plan_qid").as("query_id"), col(idCol).as("neighbor_id"),
        col("q_rank"))
    // LEFT join (r14 ADVICE): a true neighbor the coarse pass can never
    // recover (it or its query quantized to zero norm and fell to the
    // guard above) must count as rank ∞ — a recall miss that depresses
    // the CDF — not silently vanish from the denominator, which would
    // overstate recall and under-plan the shortlist.
    exact.join(ranked, Seq("query_id", "neighbor_id"), "left")
      .select(coalesce(col("q_rank"), lit(Int.MaxValue)).as("q_rank"))
      .collect()
      .map(_.getInt(0))
  }

  /** Coarse (≡ refined) recall@k at depth `shortlist`: the empirical
    * CDF of [[int8TrueNeighborRanks]] — non-decreasing in `shortlist`
    * by construction (spec-pinned). A rank-∞ sentinel (Int.MaxValue —
    * an unrecoverable neighbor) counts as a miss at EVERY depth,
    * including a depth of Int.MaxValue itself. */
  def int8CoarseRecallAt(ranks: Array[Int], shortlist: Int): Double = {
    require(ranks.nonEmpty, "no measured ranks — sample the corpus first")
    ranks.count(r => r != Int.MaxValue && r <= shortlist).toDouble / ranks.length
  }

  /** The SMALLEST shortlist whose measured recall meets `targetRecall`
    * on the sample (floored at k — the refine pass needs at least k
    * candidates). When the sample contains rank-∞ sentinels
    * (unrecoverable neighbors), high targets may be UNREACHABLE at any
    * depth — this REFUSES loudly rather than returning a sentinel
    * depth that would degenerate the coarse pass into a corpus-wide
    * scan per query (r15 self-review): the caller must lower the
    * target or fix the degenerate inputs the planner measured. */
  def int8ShortlistFor(ranks: Array[Int], k: Int, targetRecall: Double): Int = {
    require(targetRecall > 0.0 && targetRecall <= 1.0,
      s"targetRecall must be in (0, 1], got $targetRecall")
    require(ranks.nonEmpty, "no measured ranks — sample the corpus first")
    val sorted = ranks.sorted
    // smallest s with |{r <= s}| / n >= target  ⇔  s = the ceil(target·n)-th
    // smallest rank (1-based) — an exact order statistic, no search
    val need = math.min(sorted.length,
      math.max(1, math.ceil(targetRecall * sorted.length - 1e-9).toInt))
    val depth = sorted(need - 1)
    require(depth != Int.MaxValue, {
      val lost = sorted.count(_ == Int.MaxValue)
      s"target recall $targetRecall is unreachable at any depth: $lost of " +
        s"${sorted.length} measured true neighbors are unrecoverable by the " +
        "coarse pass (rank ∞) — lower the target or fix the degenerate inputs"
    })
    math.max(k, depth)
  }

  /** IVF × int8 → exact-refine top-k (ss8): [[ivfTopK]]'s cell pruning
    * COMPOSED with [[int8RefineTopK]]'s quantized candidate generation —
    * the two scan-volume levers multiply. Per query: probe the nProbe
    * nearest cells by FLOAT query-vs-centroid distance (identical cell
    * selection to ss2, so the composition changes WHAT is scanned in a
    * cell, never WHICH cells); within the probed cells rank by
    * quantized cosine over the int8 corpus column (integer dot, scales
    * cancel — [[int8AsDouble]]'s contract) and keep a
    * `shortlist ≫ k` per query; re-score just those pairs with exact
    * float cosine ([[pqRefineTopK]]'s keyed point-lookup join) for the
    * final top-k. At 100 TB the candidate-generation scan therefore
    * reads (nProbe/nCells) of the corpus at one quarter of the bytes
    * (ss6's measured parquet ratio: 0.25 on incompressible vectors) —
    * the IVF fraction and the int8 byte cut are independent factors —
    * while the float corpus is only ever point-read for
    * |queries|·shortlist rows. Every stage is deterministic (truncated
    * centroids, integer coarse dots, sequential double refine folds,
    * id-tiebroken ranks), so the full chain is hash-oracled like
    * ss2/ss7. */
  def ivfInt8RefineTopK(cellCorpus: DataFrame, idCol: String, vecCol: String,
                        cellCol: String,
                        centroids: DataFrame, centVecCol: String,
                        queries: DataFrame, qIdCol: String, qVecCol: String,
                        nProbe: Int, shortlist: Int, k: Int): DataFrame = {
    val cellQuant = cellCorpus
      .select(col(idCol), col(cellCol),
        int8Quantize(col(vecCol), int8Scale(col(vecCol))).as("__q8"))
    ivfInt8RefineTopKStored(cellQuant, idCol, "__q8", cellCol,
      centroids, centVecCol,
      cellCorpus.select(col(idCol), col(vecCol)), vecCol,
      queries, qIdCol, qVecCol, nProbe, shortlist, k)
  }

  /** [[ivfInt8RefineTopK]] against an ALREADY-BUILT stored index — the
    * ss10 serving form (the ss9 move for the WHOLE IVF index, r14
    * verdict ask #2): `cellQuant` is the persisted inverted file
    * (idCol, cellCol, an ARRAY<TINYINT> column — one parquet table
    * written once by [[assignCells]] + [[int8Quantize]]) and
    * `centroids` the persisted (cell, centroid) table (truncated
    * doubles — tiny, broadcast). Candidate generation reads ONLY those
    * index tables: the coarse scan's ReadSchema is id + cell + the
    * tinyint array (at 100 TB, cell is the storage partitioning key,
    * so the probe prunes partitions at the source and the scanned
    * bytes are nProbe/nCells of a 4×-smaller corpus), while `corpus`'s
    * float vectors are touched exclusively by the refine join's
    * |queries|·shortlist keyed point-lookups. Cell assignment and
    * quantization are deterministic and survive a parquet roundtrip
    * exactly (truncated-double centroids, tinyint codes), so this is
    * hash-identical to [[ivfInt8RefineTopK]]'s in-session index —
    * proven by ss10 sharing ss8's oracle verbatim (the ss9/dd11
    * precedent). Queries quantize in-session — they are the small
    * side. */
  def ivfInt8RefineTopKStored(cellQuant: DataFrame, idCol: String,
                              q8Col: String, cellCol: String,
                              centroids: DataFrame, centVecCol: String,
                              corpus: DataFrame, vecCol: String,
                              queries: DataFrame, qIdCol: String, qVecCol: String,
                              nProbe: Int, shortlist: Int, k: Int): DataFrame = {
    require(shortlist >= k,
      s"shortlist ($shortlist) must be >= k ($k) — the refine pass only reorders")
    val probes = probeCells(queries, qIdCol, qVecCol,
        centroids, centVecCol, cellCol, nProbe)
      .select(col(qIdCol),
        int8AsDouble(int8Quantize(col(qVecCol), int8Scale(col(qVecCol))))
          .as("__q_qv"),
        col(cellCol))
      .withColumn("__q_qnorm", norm(col("__q_qv")))
      // an all-zero (or zero-scale) vector quantizes to a zero norm —
      // q_sim would be a null/NaN division whose window position is
      // engine-dependent; drop it like the null cell_dist above so the
      // public seam stays oracle-stable for arbitrary inputs
      // (r13 ADVICE)
      .filter(posNorm(col("__q_qnorm")))
    // the only corpus-wide work: the stored tinyint codes of the
    // probed cells — the float column is not in this projection
    val qCorpus = cellQuant
      .select(col(idCol), col(cellCol), int8AsDouble(col(q8Col)).as("__qv"))
      .withColumn("__c_qnorm", norm(col("__qv")))
      // same zero-norm guard, corpus side
      .filter(posNorm(col("__c_qnorm")))
    val w = Window.partitionBy(qIdCol).orderBy(desc("q_sim"), col(idCol))
    val coarse = qCorpus.join(broadcast(probes), Seq(cellCol))
      .filter(col(idCol) =!= col(qIdCol))
      .withColumn("q_sim",
        dotD(col("__q_qv"), col("__qv")) / (col("__q_qnorm") * col("__c_qnorm")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= shortlist)
      .select(col(qIdCol).as("query_id"), col(idCol).as("neighbor_id"))
    pqRefineTopK(coarse, corpus, idCol, vecCol, queries, qIdCol, qVecCol, k)
  }

  /** Near-duplicate pairs of a NEW vector batch against a PERSISTED
    * int8 index plus itself — the dd11/mm10 incremental topology on
    * EMBEDDINGS (st16, r14 verdict ask #3, the last missing modality
    * in the incremental matrix). Coarse gate: quantized cosine ≥
    * `tauQ` over the STORED tinyint codes — the index-wide scan reads
    * only (id, q8); the index's float column is touched exclusively
    * by the verify join's per-survivor point-lookups (exact float
    * cosine ≥ `tau`). The batch is broadcast through both arms
    * (bounded small — the arriving micro-batch), so per-batch cost is
    * one pruned int8 index scan + |survivors| float lookups; at
    * corpus scale the coarse scan composes with ss10's cell-pruned
    * index (probe the batch's cells only) exactly as ivfInt8 composes
    * with ss7. Threshold-only (no rank windows) → fully
    * aggregation-order-independent, hash-oracle-stable.
    *
    * Returns (new_id, matched_id, matched_side ∈ existing|new,
    * cos_sim): 'existing' pairs the batch against the index, 'new'
    * pairs the batch against itself (new_id < matched_id). Zero-norm
    * rows fall to the family guard on either side. Batch ids must be
    * disjoint from index ids (BandedHamming.freshBatch's idempotent-
    * replay contract applies one modality over). */
  def int8NearDupPairs(indexQuant: DataFrame, idCol: String, q8Col: String,
                       indexFloat: DataFrame, vecCol: String,
                       batch: DataFrame, bIdCol: String, bVecCol: String,
                       tauQ: Double, tau: Double): DataFrame = {
    def quant(c: Column): Column = int8AsDouble(int8Quantize(c, int8Scale(c)))
    val bq = batch
      .select(col(bIdCol).as("new_id"), quant(col(bVecCol)).as("__b_qv"))
      .withColumn("__b_qnorm", norm(col("__b_qv")))
      .filter(posNorm(col("__b_qnorm")))
    val idx = indexQuant
      .select(col(idCol).as("matched_id"), int8AsDouble(col(q8Col)).as("__i_qv"))
      .withColumn("__i_qnorm", norm(col("__i_qv")))
      .filter(posNorm(col("__i_qnorm")))
    def qcos(a: Column, b: Column, na: Column, nb: Column): Column =
      dotD(a, b) / (na * nb)
    val coarseE = idx.crossJoin(broadcast(bq))
      .filter(col("matched_id") =!= col("new_id"))
      .filter(qcos(col("__b_qv"), col("__i_qv"),
        col("__b_qnorm"), col("__i_qnorm")) >= tauQ)
      .select(col("new_id"), col("matched_id"))
    val bf = batch
      .select(col(bIdCol).as("new_id"), col(bVecCol).as("__b_vec"))
      .withColumn("__b_norm", norm(col("__b_vec")))
      .filter(posNorm(col("__b_norm")))
    val idxF = indexFloat
      .select(col(idCol).as("matched_id"), col(vecCol).as("__i_vec"))
      .withColumn("__i_norm", norm(col("__i_vec")))
      .filter(posNorm(col("__i_norm")))
    val vsExisting = idxF
      .join(broadcast(coarseE), Seq("matched_id"))
      .join(broadcast(bf), Seq("new_id"))
      .withColumn("cos_sim", qcos(col("__b_vec"), col("__i_vec"),
        col("__b_norm"), col("__i_norm")))
      .filter(col("cos_sim") >= tau)
      .select(col("new_id"), col("matched_id"),
        lit("existing").as("matched_side"), col("cos_sim"))
    // batch self-pairs: both sides bounded — gate + verify in one pass
    val bq2 = bq.select(col("new_id").as("matched_id"),
      col("__b_qv").as("__m_qv"), col("__b_qnorm").as("__m_qnorm"))
    val bf2 = bf.select(col("new_id").as("matched_id"),
      col("__b_vec").as("__m_vec"), col("__b_norm").as("__m_norm"))
    val vsNew = bq.crossJoin(broadcast(bq2))
      .filter(col("new_id") < col("matched_id"))
      .filter(qcos(col("__b_qv"), col("__m_qv"),
        col("__b_qnorm"), col("__m_qnorm")) >= tauQ)
      .join(broadcast(bf), Seq("new_id"))
      .join(broadcast(bf2), Seq("matched_id"))
      .withColumn("cos_sim", qcos(col("__b_vec"), col("__m_vec"),
        col("__b_norm"), col("__m_norm")))
      .filter(col("cos_sim") >= tau)
      .select(col("new_id"), col("matched_id"),
        lit("new").as("matched_side"), col("cos_sim"))
    vsExisting.unionByName(vsNew)
  }

  /** IVF search: per query pick the nProbe nearest cells, scan only
    * corpus rows in those cells, exact cosine + top-k inside the
    * probed subset. `cellCorpus` must carry cellCol (from
    * [[assignCells]]). */
  def ivfTopK(cellCorpus: DataFrame, idCol: String, vecCol: String, cellCol: String,
              centroids: DataFrame, centVecCol: String,
              queries: DataFrame, qIdCol: String, qVecCol: String,
              nProbe: Int, k: Int): DataFrame = {
    val probes = probeCells(queries, qIdCol, qVecCol,
        centroids, centVecCol, cellCol, nProbe)
      .select(col(qIdCol), col(qVecCol), col(cellCol))
      .withColumn("__q_norm", norm(col(qVecCol)))
    val candidates = cellCorpus
      .withColumn("__c_norm", norm(col(vecCol)))
      .join(broadcast(probes), Seq(cellCol))
      .filter(col(idCol) =!= col(qIdCol))
      .withColumn("cos_sim",
        dotD(col(qVecCol), col(vecCol)) / (col("__q_norm") * col("__c_norm")))
    val w = Window.partitionBy(qIdCol).orderBy(desc("cos_sim"), col(idCol))
    candidates.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol).as("query_id"), col(idCol).as("neighbor_id"),
        col("cos_sim"), col("rank"))
  }
}
