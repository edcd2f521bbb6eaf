package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, TextOps}

/** Stage-level cost probe for the dd_prefix scale leg: times the
  * cumulative prefix-filter-join pipeline up to each stage (stage k's
  * own cost is the delta from stage k-1), so optimization work targets
  * the measured bottleneck instead of the guessed one.
  *
  * r10 measurement record, 100× (the redesign's justification): the
  * r9 pair-count layout spent 133 s of its 195 s leg shuffling 550M
  * slim collision rows into the count-filter aggregation
  * (join_filtered 28.8 s cumulative → candidates 162.2 s cumulative),
  * while the collision join itself — 1.59B raw rows — cost only ~15 s
  * because it never shuffles. The in-place-verify layout removes that
  * exchange entirely; this probe now times the replacement pipeline.
  *
  * r11 measurement record, 100× (the redesigned pipeline, post-r10):
  * each stage below materializes its own frame (recomputing its
  * prefix), so stage deltas read against the previous line —
  * base 7.1 s (500k docs) → explode+dfreq 5.3 s (93k grams) →
  * pfx+grams 15.6 s (10.6M prefix rows) → join_raw 17.3 s (1.28B
  * collision rows — NEVER shuffled) → join_filtered 21.2 s (351M
  * rows surviving the scalar length/positional filters) →
  * verified_rows 131.4 s (the staged mirror, which omits the
  * production path's df≥2 prefix pruning) → **full 75.7 s** (the
  * real Dedup.prefixFilterPairs, 25,600 verified pairs). vs the r9
  * pair-count layout's 264.8 s committed leg: **3.5×** — the removed
  * 550M-row count-filter exchange was the bottleneck ProbePrefix
  * predicted, and verification now settles map-side on the collision
  * rows via the SortedOverlapCount kernel.
  */
object ProbePrefix {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val f = args.headOption.map(_.toInt).getOrElse(100)
    val parts = args.lift(1).map(_.toInt).getOrElse(math.min(512, 32 * f))
    val threshold = 0.6
    val spark = LocalRun.session(32, 32)
    import org.apache.spark.sql.expressions.Window

    val documents = Tables.documents(spark, sfDir).select("doc_id", "text")
    val d = BenchScale.inflateDocuments(documents, f)
    val baseIn = d.withColumn("ws", TextOps.words(col("text")))
      .withColumn("grams", array_distinct(TextOps.wordShingles(col("ws"), 2)))
      .select(col("doc_id"), col("grams"))

    // mirror of prefixFilterPairs' internals, staged for timing
    def minOverlap(m: org.apache.spark.sql.Column) =
      ceil(lit(threshold) * m - lit(1e-9)).cast("long")
    def pairOverlap(ma: org.apache.spark.sql.Column, mb: org.apache.spark.sql.Column) =
      ceil(lit(threshold / (1.0 + threshold)) * (ma + mb) - lit(1e-9)).cast("long")
    val base = baseIn
      .select(col("doc_id").as("doc"),
        sort_array(array_distinct(transform(col("grams"), g => xxhash64(g))))
          .as("grams"))
      .filter(size(col("grams")) > 0)
      .withColumn("m", size(col("grams")).cast("long"))
    val ex = base.select(col("doc"), col("m"), explode(col("grams")).as("gram"))
    val dfreq = ex.groupBy("gram").agg(count(lit(1)).as("gdf"))
    val rankWin = Window.partitionBy("doc").orderBy(col("gdf"), col("gram"))
    val pfx = ex.hint("shuffle_hash")
      .join(dfreq.hint("shuffle_hash"), Seq("gram"))
      .withColumn("rn", row_number().over(rankWin).cast("long"))
      .filter(col("rn") <= col("m") - minOverlap(col("m")) + 1)
      .select("doc", "m", "rn", "gram")
      .join(base.select(col("doc"), col("grams")).hint("shuffle_hash"), Seq("doc"))
      .repartition(parts, col("gram"))
    val joined = pfx.select(col("doc").as("doc_a"), col("m").as("m_a"),
        col("rn").as("rn_a"), col("gram"), col("grams").as("g_a"))
      .hint("shuffle_hash")
      .join(pfx.select(col("doc").as("doc_b"), col("m").as("m_b"),
          col("rn").as("rn_b"), col("gram"), col("grams").as("g_b"))
        .hint("shuffle_hash"), Seq("gram"))
      .filter(col("doc_a") < col("doc_b"))
    val filtered = joined
      .filter(least(col("m_a"), col("m_b")) >= pairOverlap(col("m_a"), col("m_b")))
      .filter(lit(1L) +
        least(col("m_a") - col("rn_a"), col("m_b") - col("rn_b")) >=
        pairOverlap(col("m_a"), col("m_b")))
    val verified = filtered
      .withColumn("c",
        graft.functions.ArrayKernels.sortedOverlapCount(col("g_a"), col("g_b")))
      .withColumn("jaccard",
        col("c").cast("double") / (col("m_a") + col("m_b") - col("c")))
      .filter(col("jaccard") >= threshold)
    val out = Dedup.prefixFilterPairs(baseIn, "doc_id", "grams", threshold,
      collisionPartitions = Some(parts))

    def t(name: String)(a: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = a
      System.err.println(f"[probe] $name%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n%d")
    }
    t("base")(base.agg(count(lit(1)), sum("m")).head().getLong(0))
    t("explode+dfreq")(dfreq.agg(count(lit(1)), sum("gdf")).head().getLong(0))
    t("pfx+grams")(pfx.agg(count(lit(1))).head().getLong(0))
    t("join_raw")(joined.agg(count(lit(1))).head().getLong(0))
    t("join_filtered")(filtered.agg(count(lit(1))).head().getLong(0))
    t("verified_rows")(verified.agg(count(lit(1))).head().getLong(0))
    t("full")(out.agg(count(lit(1))).head().getLong(0))
    spark.stop()
  }
}
