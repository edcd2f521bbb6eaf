package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the layout step of an LLM
  * training pipeline: documents are laid end-to-end into one token
  * stream per stratum and the stream is cut into fixed `budget`-token
  * training sequences (bins). Documents straddle bin boundaries by
  * design; the bookkeeping this stage emits (start offset, first/last
  * bin, straddle flag) is what the batch loader needs to materialize
  * any bin without re-scanning the corpus.
  *
  * Layout order is the deterministic hash order of [[Sampling
  * .sampleKey]], not arrival order: the packing a training run used is
  * then reproducible from the table alone (same property as the
  * samplers — no rand(), no partition-layout dependence).
  *
  * Scale posture: one window shuffle on the stratum key; the running
  * sum is a single pass per stratum. Strata (languages, sources)
  * bound the window's sort; a single global stream would serialize —
  * at 100 TB you pack within shards exactly like this, never globally.
  *
  * Skew: `Window.partitionBy(stratum)` runs each stratum's running sum
  * on ONE task — a giant stratum (say, 80% of a corpus in English)
  * serializes its own packing exactly like a hot join key. Past the
  * row count one task can sort comfortably (~tens of millions), use
  * [[packBinsSharded]]: a deterministic doc-hash shard key splits the
  * stratum into independent packing streams (bins never straddle a
  * shard, so the cost is at most one partially-filled final bin per
  * shard) — [[LlmSpec]] proves sharded ≡ unsharded per shard subset.
  */
object Packing {

  /** Per-document bin bookkeeping. Zero-token documents get
    * bin_last = bin_first (they occupy no tokens, they "sit" at their
    * offset). Output adds: start_tok (tokens before this doc in its
    * stratum's stream), bin_first, bin_last, spans_boundary. */
  def packBins(df: DataFrame, stratumCol: String, idCol: String,
               tokensCol: String, budget: Int): DataFrame =
    packWithin(df, Seq(col(stratumCol)), idCol, tokensCol, budget)

  /** [[packBins]] for a SKEWED stratum distribution: each stratum is
    * split into `shards` independent packing streams by a
    * deterministic doc-hash ([[graft.ops.Skew.salt]] — no rand(), so
    * the layout stays reproducible and partition-invariant). Adds a
    * `shard` column; bin ids are per (stratum, shard) — the batch
    * loader's bin namespace becomes (stratum, shard, bin_first).
    * Within each shard the bookkeeping is EXACTLY [[packBins]] run on
    * that shard's subset (LlmSpec proves it); across shards the only
    * cost is that bins never straddle a shard boundary, i.e. at most
    * one ragged final bin per shard instead of per stratum. */
  def packBinsSharded(df: DataFrame, stratumCol: String, idCol: String,
                      tokensCol: String, budget: Int, shards: Int): DataFrame = {
    require(shards >= 1, s"shards must be >= 1, got $shards")
    val sharded = df.withColumn("shard",
      graft.ops.Skew.salt(shards, col(idCol)))
    packWithin(sharded, Seq(col(stratumCol), col("shard")), idCol, tokensCol, budget)
  }

  /** Sliding-window document chunking with overlap — the
    * context-window prep both RAG indexing and long-context training
    * run on documents too long for one sequence: token windows of
    * `chunkTokens`, each retaining `overlap` tokens of its
    * predecessor (stride = chunkTokens − overlap), so no boundary
    * loses context. Chunk i covers tokens [i·stride, i·stride +
    * chunkTokens); the chunk count is 1 for short documents and
    * ceil((n − chunk)/stride) + 1 otherwise — the final chunk may be
    * ragged but is never empty and never a strict suffix of its
    * predecessor.
    *
    * A pure map + explode over the token array — no shuffle, no
    * state; scan-throughput at any corpus size, and every expression
    * (size/sequence/slice/array_join) restates verbatim in SQL.
    * Returns one row per chunk: the input row's idCol + (chunk_idx,
    * chunk_tokens, chunk_text). */
  def chunkWithOverlap(df: DataFrame, idCol: String, textCol: String,
                       chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be positive, got $chunkTokens")
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens), got $overlap")
    val stride = chunkTokens - overlap
    val ws = TextOps.words(col(textCol))
    val n = size(ws)
    val k = when(n <= chunkTokens, lit(1))
      .otherwise(ceil((n - lit(chunkTokens)).cast("double") / stride).cast("int") + 1)
    df.withColumn("__ws", ws)
      .withColumn("__k", k)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("__k") - 1), i =>
          slice(col("__ws"), i * stride + 1, lit(chunkTokens))))
          .as(Seq("chunk_idx", "__chunk")))
      .select(col(idCol), col("chunk_idx"),
        size(col("__chunk")).as("chunk_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  private def packWithin(df: DataFrame, partKeys: Seq[org.apache.spark.sql.Column],
                         idCol: String, tokensCol: String, budget: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val w = Window.partitionBy(partKeys: _*)
      .orderBy(Sampling.sampleKey(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // integer `div` via call_function, not expr() string interpolation:
    // a tokensCol needing backticks (dots/hyphens) would break the SQL
    // parse, and long/long `div` keeps bin ids exact past 2^53 tokens
    // where double division would round
    val toks = col(tokensCol).cast("long")
    val b = lit(budget.toLong)
    df.withColumn("start_tok",
        coalesce(sum(toks).over(w), lit(0L)))
      .withColumn("bin_first", call_function("div", col("start_tok"), b))
      .withColumn("bin_last", greatest(col("bin_first"),
        call_function("div", col("start_tok") + toks - lit(1L), b)))
      .withColumn("spans_boundary", col("bin_last") > col("bin_first"))
  }
}
