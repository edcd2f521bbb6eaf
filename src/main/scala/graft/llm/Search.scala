package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical (keyword) search over the corpus: Okapi BM25 top-k
  * (Robertson & Zaragoza 2009, "The Probabilistic Relevance
  * Framework: BM25 and Beyond") — the retrieval side every
  * training-data pipeline needs next to the embedding ANN family
  * ([[Similarity]]): corpus QA probes, eval-set leakage spot checks,
  * targeted subcorpus extraction all start from a keyword query.
  *
  * Plan shape for 100 TB: the corpus's token stream is filtered to
  * the QUERY TERMS before anything shuffles — the surviving
  * (doc, term, tf) posting fragment is the inverted-index slice a
  * dedicated search engine would read, tiny relative to the corpus.
  * Document lengths join in by doc id (shuffle-hash: both sides keyed,
  * nothing broadcastable at scale), the per-term document frequencies
  * and the one-row corpus stats broadcast, and the final top-k is a
  * TakeOrdered — no global sort materializes. */
object Search {

  /** BM25 top-k for a literal conjunction-free keyword query.
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·len/avglen))
    * with the Lucene idf = ln((N − df + 0.5)/(df + 0.5) + 1) (always
    * positive). `avglenTrunc` is applied to the corpus's average
    * document length before it enters the per-row arithmetic, and
    * `scoreTrunc` to the summed score BEFORE ranking — pass fixed-
    * scale truncations to make results reproducible across
    * engines/runs (a float average's summation order is scheduler-
    * dependent); identity for Spark-only pipelines. Ties rank by
    * doc id. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               scoreTrunc: Column => Column = identity,
               avglenTrunc: Column => Column = identity): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be positive, got $k")
    // the corpus token stream is lowercased (TextOps.words), so terms
    // are matched case-insensitively — a raw "Spark" must not silently
    // match nothing
    val terms = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT))
    val ws = docs.select(col(idCol), TextOps.words(col(textCol)).as("__ws"))
    val lens = ws.select(col(idCol), size(col("__ws")).as("__len"))
    val stats = lens.agg(
      count(lit(1)).as("__n"),
      avglenTrunc(avg("__len")).as("__avglen"))
    // the posting fragment: query terms only, BEFORE the shuffle
    val tf = ws.select(col(idCol), explode(col("__ws")).as("__w"))
      .filter(col("__w").isInCollection(terms))
      .groupBy(col(idCol), col("__w"))
      .agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy("__w").agg(count(lit(1)).as("__df"))
    val idf = log((col("__n") - col("__df") + 0.5) / (col("__df") + 0.5) + 1.0)
    val den = col("__tf") +
      lit(k1) * (lit(1.0 - b) + lit(b) * col("__len") / col("__avglen"))
    val scored = tf
      .join(broadcast(dfreq), Seq("__w"))
      .join(lens.hint("shuffle_hash"), Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("__contrib", idf * (col("__tf") * (k1 + 1.0)) / den)
      .groupBy(col(idCol))
      .agg(
        scoreTrunc(sum(col("__contrib"))).as("score"),
        count(lit(1)).as("n_terms_matched"))
    val top = scored.orderBy(desc("score"), col(idCol)).limit(k)
    top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(desc("score"), col(idCol))))
      .select(col("rank"), col(idCol), col("score"), col("n_terms_matched"))
  }
}
