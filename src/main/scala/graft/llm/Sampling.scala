package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic training-data curation samplers.
  *
  * Everything here orders/assigns by md5 of the row id instead of
  * `rand()`/`sample()`: random-seeded sampling changes with partition
  * layout and engine, so a curation decision made once could never be
  * audited or reproduced. Hash order is content-independent,
  * stable across runs/engines/partitionings, and SQL-restatable — the
  * property the driver oracles check.
  *
  * Scale posture: quota sampling is one window shuffle on the stratum
  * key (per-stratum sort, spill-safe, AQE handles skewed strata);
  * hash-split is a pure map-side expression — no shuffle at all.
  */
object Sampling {

  /** Stable per-row sample key: md5 of the id rendered as a string. */
  def sampleKey(id: Column): Column = md5(id.cast("string"))

  /** Stratified quota sample: up to `k` rows per stratum, the k
    * hash-smallest ids (ties broken by id). Adds `rk` (1-based rank
    * within the stratum) to the surviving rows. */
  def stratifiedQuota(df: DataFrame, stratumCol: String, idCol: String,
                      k: Int): DataFrame = {
    require(k > 0, s"quota must be positive, got $k")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(sampleKey(col(idCol)), col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Token-budget mixture sampling — the data-mixing step that builds
    * a training corpus to a TARGET TOKEN COMPOSITION (the Pile /
    * LLaMA-style recipe: each domain/language contributes a fixed
    * token share, not a fixed document share, because training cost
    * and mixture proportions are measured in tokens). Within each
    * group, documents are taken in md5-of-id order (reproducible,
    * content-independent — the same audit property as
    * [[stratifiedQuota]]) until the group's token budget is filled:
    * a document is selected iff the EXCLUSIVE running token sum
    * before it is still under the budget, so the boundary document
    * may overshoot (greedy fill — deterministic, and the overshoot is
    * bounded by one document).
    *
    * One window shuffle on the group key (per-group sort + running
    * frame, spill-safe); groups absent from `budgets` select nothing.
    * Returns every input row with (n_tokens, cum_before, selected) so
    * both the kept corpus and the audit trail come out of one pass. */
  def tokenBudgetMixture(df: DataFrame, groupCol: String, idCol: String,
                         tokenCount: Column,
                         budgets: Map[String, Long]): DataFrame =
    // the sharded variant at shards = 1 IS the unsharded semantics
    // (spec-pinned) — one implementation, two entry points
    tokenBudgetMixtureSharded(df, groupCol, idCol, tokenCount, budgets, 1)
      .drop("shard")

  /** Sharded [[tokenBudgetMixture]] — the scale path for huge groups
    * (the [[Packing.packBinsSharded]] move): a per-group running sum
    * serializes the whole group through one window partition, which
    * is fine for bounded group counts at toy scale but caps
    * parallelism at the group count. Each group is split into
    * `shards` deterministic doc-hash shards (an INDEPENDENT md5 slice
    * from the ordering key, so shard membership doesn't bias the
    * within-shard order), each filling budget/shards — the window key
    * becomes (group, shard) and parallelism scales with shards. The
    * SELECTION differs from the unsharded pick (equally deterministic,
    * equally budget-respecting: per-shard overshoot is one document,
    * so the group total lands within `shards` boundary documents of
    * the budget); shards = 1 reproduces [[tokenBudgetMixture]]
    * exactly. Residual budget (budget mod shards) goes to shard 0. */
  def tokenBudgetMixtureSharded(df: DataFrame, groupCol: String, idCol: String,
                                tokenCount: Column, budgets: Map[String, Long],
                                shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    // withColumn silently OVERWRITES a same-named input column — a frame
    // that already carries e.g. n_tokens would lose it without error
    // (r7 ADVICE item; mirrors AsOf's outPrefix collision guard)
    val outNames = Seq("shard", "n_tokens", "cum_before", "selected")
    val clash = df.columns.filter(outNames.contains)
    require(clash.isEmpty,
      s"input already has output column(s) ${clash.mkString(", ")} — rename them first")
    require(budgets.nonEmpty, "budgets must be non-empty")
    require(budgets.values.forall(_ > 0), s"budgets must be positive: $budgets")
    val shard =
      conv(substring(sampleKey(col(idCol)), 9, 8), 16, 10).cast("long") % shards
    val w = Window.partitionBy(col(groupCol), col("shard"))
      .orderBy(sampleKey(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val shardBudget = budgets.foldRight(lit(null).cast("long")) {
      case ((g, b), rest) =>
        when(col(groupCol) === g,
          lit(b / shards) + when(col("shard") === 0, b % shards).otherwise(0L))
          .otherwise(rest)
    }
    df.withColumn("shard", shard)
      .withColumn("n_tokens", tokenCount.cast("long"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("selected",
        coalesce(col("cum_before") < shardBudget, lit(false)))
  }

  /** Efraimidis–Spirakis weighted-sampling key (Information Processing
    * Letters 97(5), 2006, "Weighted random sampling with a reservoir"):
    * key = u^(1/w) with u uniform on (0, 1]; the k LARGEST keys form a
    * weighted sample WITHOUT replacement where each row's inclusion
    * odds are proportional to its weight — the one-pass, rank-only
    * restatement of weighted draws that a distributed engine can run
    * as a window top-k. u is md5-derived ((hash60(id)+1)/2^60, exactly
    * representable scaling) instead of rand(): deterministic,
    * layout-invariant, SQL-restatable — the same audit property as
    * [[sampleKey]]. Weight must be strictly positive. */
  def weightedKey(id: Column, weight: Column): Column =
    pow(
      (graft.ops.Sketches.hash60(id.cast("string")) + lit(1L)).cast("double") /
        lit(math.pow(2.0, 60)),
      lit(1.0) / weight)

  /** Weighted stratified sample: the k largest [[weightedKey]]s per
    * stratum (ties broken by id), with `es_key` and the 1-based rank
    * `rk` on the surviving rows. One window shuffle on the stratum
    * key — [[stratifiedQuota]]'s topology with the E-S key as the
    * order. At uniform weights this IS a uniform sample without
    * replacement (u^1 keeps the hash order). */
  def weightedSample(df: DataFrame, stratumCol: String, idCol: String,
                     weight: Column, k: Int): DataFrame = {
    require(k > 0, s"quota must be positive, got $k")
    val clash = df.columns.filter(Seq("es_key", "rk").contains)
    require(clash.isEmpty,
      s"input already has output column(s) ${clash.mkString(", ")} — rename them first")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("es_key").desc, col(idCol))
    df.withColumn("es_key", weightedKey(col(idCol), weight))
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Deterministic train/val/test split: the id hashes into one of 100
    * buckets (first 8 md5 hex chars mod 100); cumulative `weights`
    * cut-points map buckets to the labeled splits. Map-side only.
    * conv() parses the 8 hex chars into a long (max 2^32, no
    * overflow); the same arithmetic restates in ANSI SQL. */
  def hashSplit(id: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.map(_._2).sum == 100,
      s"split weights must sum to 100, got $weights")
    require(weights.forall(_._2 > 0), s"weights must be positive: $weights")
    val bucket = conv(substring(sampleKey(id), 1, 8), 16, 10).cast("long") % 100
    val cuts = weights.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    weights.map(_._1).zip(cuts).foldRight(lit(null).cast("string")) {
      case ((label, cut), rest) => when(bucket < cut, label).otherwise(rest)
    }
  }
}
