package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data selection via importance resampling — the DSIR recipe (Xie et
  * al. 2023, "Data Selection for Language Models via Importance
  * Resampling"): estimate a target-domain and a raw-corpus unigram
  * distribution over HASHED n-gram buckets, score every raw document
  * by its log importance weight Σ_w log(p_target(b(w)) / p_raw(b(w))),
  * and keep the documents that look most target-like. Hashing
  * collapses the unbounded vocabulary into a FIXED number of buckets,
  * which is the whole scale story:
  *
  *  - the bucket count table is `buckets` rows regardless of corpus
  *    size, so it always BROADCASTS — scoring is a map-side hash join
  *    plus one aggregation keyed on the document id;
  *  - building the table is one corpus-wide aggregation on the bucket
  *    key (cardinality ≤ `buckets`, so partial/map-side combine
  *    collapses virtually all traffic before the shuffle);
  *  - nothing is ever collected to the driver.
  *
  * The word hash is the md5-prefix trick shared with
  * [[Sampling.hashSplit]] / [[Dedup.md5Hash64]] so the DuckDB oracles
  * can restate it bit-identically; xxhash64 would be cheaper for
  * Spark-only pipelines.
  */
object Importance {

  /** Deterministic hash bucket for one token: first 8 md5 hex chars as
    * an unsigned 32-bit value, mod `buckets` — non-negative, portable
    * (`CAST('0x' || substring(md5(w), 1, 8) AS UBIGINT) % buckets`). */
  def hashBucket(w: Column, buckets: Int): Column =
    conv(substring(md5(w), 1, 8), 16, 10).cast("long") % buckets

  /** The smoothed per-bucket log-likelihood-ratio table:
    * log((ct+α)/(Nt+α·B)) − log((cr+α)/(Nr+α·B)) where ct/cr are the
    * bucket's token counts on the target/raw side and Nt/Nr the side
    * totals (Lidstone smoothing keeps unseen buckets finite). Only
    * OBSERVED buckets appear — every scored token maps to an observed
    * bucket by construction, so the downstream join loses nothing.
    *
    * `isTarget` is evaluated per document (e.g. a curated-source
    * predicate); `ratioTrunc` is applied to the emitted ratio (pass a
    * fixed-scale truncation for cross-engine-stable scoring). */
  def bucketLogRatios(docs: DataFrame, textCol: String, isTarget: Column,
                      buckets: Int, alpha: Double = 1.0,
                      ratioTrunc: Column => Column = identity): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(alpha > 0, s"alpha must be positive (smoothing), got $alpha")
    val words = docs.select(isTarget.as("__t"),
      explode(TextOps.words(col(textCol))).as("__w"))
    val counts = words
      .groupBy(hashBucket(col("__w"), buckets).as("bucket"))
      .agg(
        sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"),
        sum(when(col("__t"), 0L).otherwise(1L)).as("__cr"))
    // side totals: a 1-row frame, broadcast back onto the bucket table
    val totals = counts.agg(sum("__ct").as("__nt"), sum("__cr").as("__nr"))
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"), ratioTrunc(
        log((col("__ct") + alpha) / (col("__nt") + lit(alpha * buckets))) -
          log((col("__cr") + alpha) / (col("__nr") + lit(alpha * buckets))))
        .as("log_ratio"))
  }

  /** Per-document log importance weight: Σ over the document's tokens
    * of the token's bucket log-ratio. `ratios` is the (bucket,
    * log_ratio) table from [[bucketLogRatios]] — broadcast by
    * construction. Returns (idCol, n_words, log_weight_raw); truncate
    * the sum at the call site before comparing across engines. */
  def docLogWeights(docs: DataFrame, idCol: String, textCol: String,
                    ratios: DataFrame, buckets: Int): DataFrame =
    docs.select(col(idCol), explode(TextOps.words(col(textCol))).as("__w"))
      .withColumn("bucket", hashBucket(col("__w"), buckets))
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("log_ratio")).as("log_weight_raw"))
}
