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
