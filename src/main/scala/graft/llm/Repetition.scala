package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gopher's repetition-removal metrics (Rae et al. 2021, Appendix A
  * Table A1) — the full family behind tx8's three headline fractions:
  * duplicate line/paragraph fractions (plain and character-weighted),
  * top n-gram character fractions (n = 2..4) and duplicated n-gram
  * character-coverage fractions (n = 5..10). Everything is keyed
  * (doc_id, unit) shuffles over exploded units — the dd9/tx8 shape: no
  * per-document state, no collect, no O(g²) per-row higher-order
  * lambdas (which would be quadratic in document length at 100 TB) —
  * and the coverage metric reuses tx16's flag → k-1-window → rollup
  * machinery ([[Dedup.duplicateSpans]]) at METRIC grain: instead of
  * removing covered tokens it sums their characters.
  *
  * Character bases, pinned so the DuckDB oracle mirrors them exactly:
  * unit metrics weight by the unit's own length; gram metrics use WORD
  * characters (sum of word lengths — separators excluded), the
  * deterministic cross-engine basis.
  */
object Repetition {

  /** Per-id duplicate-occurrence stats over one exploded string unit
    * (lines or paragraphs): `<prefix>_frac` = occurrences beyond each
    * distinct unit's first / total occurrences;
    * `<prefix>_char_frac` = the same, weighted by unit length. Two
    * keyed aggregations, no per-doc state. */
  def dupUnitStats(units: DataFrame, idCol: String, unitCol: String,
                   prefix: String): DataFrame =
    units.groupBy(col(idCol), col(unitCol))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(
        (sum(col("__c") - 1).cast("double") / sum(col("__c")))
          .as(prefix + "_frac"),
        (sum((col("__c") - 1) * length(col(unitCol))).cast("double") /
          sum(col("__c") * length(col(unitCol))))
          .as(prefix + "_char_frac"))

  /** Per-id characters claimed by the MOST FREQUENT word n-gram:
    * count × gram length. Ties on count break toward the longer gram;
    * ties on (count, length) all yield the same product, so the output
    * is deterministic even though row_number's pick among them is not
    * — which is what lets the oracle replay it with the same two-key
    * window. Docs shorter than n words emit no row (callers left-join
    * and coalesce to 0). */
  def topGramChars(docs: DataFrame, idCol: String, ws: Column, n: Int)
      : DataFrame = {
    val grams = docs.select(col(idCol),
      explode(TextOps.wordShingles(ws, n)).as("__g"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__c").desc, length(col("__g")).desc)
    grams.groupBy(col(idCol), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol),
        (col("__c") * length(col("__g"))).as(s"top_${n}gram_chars"))
  }

  /** [[dupUnitStats]] for SEVERAL unit kinds in one aggregation pass:
    * `units` carries a tag column (e.g. 'line'/'para'); stats pivot to
    * `<tag>_frac` / `<tag>_char_frac` columns per requested tag —
    * output ≡ the FULL-OUTER join of the per-kind [[dupUnitStats]]
    * frames (spec-pinned), at half the exchanges. The full-outer
    * qualifier matters for a doc with no units of some tag: this pass
    * emits its row with NULL columns for the absent tag (the when()
    * sums see no rows), where the per-kind frame emits no row at all —
    * an inner join would drop the doc. Harmless when every doc carries
    * every tag (tx21's pages always have lines and paragraphs), and the
    * left-join-and-coalesce contract callers already apply to
    * [[topGramChars]] handles the rest. */
  def dupUnitStatsMulti(units: DataFrame, idCol: String, tagCol: String,
                        unitCol: String, tags: Seq[String]): DataFrame = {
    val counted = units
      .groupBy(col(idCol), col(tagCol), col(unitCol))
      .agg(count(lit(1)).as("__c"))
    val aggs = tags.flatMap { t =>
      val isT = col(tagCol) === t
      Seq(
        (sum(when(isT, col("__c") - 1)).cast("double") /
          sum(when(isT, col("__c")))).as(s"dup_${t}_frac"),
        (sum(when(isT, (col("__c") - 1) * length(col(unitCol)))).cast("double") /
          sum(when(isT, col("__c") * length(col(unitCol)))))
          .as(s"dup_${t}_char_frac"))
    }
    counted.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** [[topGramChars]] for SEVERAL n in one explode/aggregate/window
    * pass: grams are tagged with their n, counted per (id, n, gram),
    * ranked per (id, n), then pivoted to one row per id with a
    * `top_<n>gram_chars` column per requested n (null when the doc is
    * shorter than n words — callers coalesce). Output ≡ joining the
    * per-n [[topGramChars]] frames (spec-pinned) at a third of the
    * shuffles — the tx21 profile runs 3 gram orders, and each
    * separate pipeline was an explode + two keyed exchanges. */
  def topGramCharsMulti(docs: DataFrame, idCol: String, ws: Column,
                        ns: Seq[Int]): DataFrame = {
    val tagged = docs.select(col(idCol),
        explode(array(ns.map(n => struct(lit(n).as("__n"),
          TextOps.wordShingles(ws, n).as("__gs"))): _*)).as("__t"))
      .select(col(idCol), col("__t.__n").as("__n"),
        explode(col("__t.__gs")).as("__g"))
    val w = Window.partitionBy(col(idCol), col("__n"))
      .orderBy(col("__c").desc, length(col("__g")).desc)
    val aggs = ns.map(n =>
      max(when(col("__n") === n, col("__c") * length(col("__g"))))
        .as(s"top_${n}gram_chars"))
    tagged.groupBy(col(idCol), col("__n"), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** [[dupGramCharFrac]] for SEVERAL n over ONE shared token/gram
    * pass. The coverage test is made FRAME-FREE so every n shares a
    * single window spec: token tpos is covered by some duplicated
    * n-gram iff a dup-gram START s exists with tpos−(n−1) ≤ s ≤ tpos,
    * i.e. iff the RUNNING MAX of (s + n − 1) over all starts at or
    * before tpos reaches tpos — the n-dependence moves from the window
    * frame (a per-window literal, which forced one window per n) into
    * the VALUE, and the unbounded-preceding running max computes
    * incrementally. One tagged gram explode, one (id, n, gram) count,
    * one semi-join, one tokens×n expansion, one window, one pivot
    * rollup — vs a full explode/agg/join/window pipeline per n
    * (r9 review finding on tx21). Output ≡ joining the per-n
    * [[dupGramCharFrac]] frames (spec-pinned). */
  def dupGramCharFracMulti(docs: DataFrame, idCol: String, ws: Column,
                           ns: Seq[Int]): DataFrame = {
    val base = docs.select(col(idCol), ws.as("__ws"))
    val tokens = base
      .select(col(idCol), posexplode(col("__ws")).as(Seq("__tpos", "__w")))
      .select(col(idCol), explode(array(ns.map(lit): _*)).as("__n"),
        col("__tpos"), length(col("__w")).as("__wl"))
    val grams = base.select(col(idCol),
        explode(array(ns.map(n => struct(lit(n).as("__n"),
          TextOps.wordShingles(col("__ws"), n).as("__gs"))): _*)).as("__t"))
      .select(col(idCol), col("__t.__n").as("__n"),
        posexplode(col("__t.__gs")).as(Seq("__gpos", "__g")))
    val dups = grams.groupBy(col(idCol), col("__n"), col("__g"))
      .agg(count(lit(1)).as("__c")).filter(col("__c") >= 2)
      .select(col(idCol).as("__did"), col("__n").as("__dn"),
        col("__g").as("__dg"))
    val starts = grams.join(dups.hint("shuffle_hash"),
        col(idCol) === col("__did") && col("__n") === col("__dn") &&
          col("__g") === col("__dg"), "left_semi")
      .select(col(idCol).as("__sid"), col("__n").as("__sn"),
        col("__gpos").as("__marker"))
    val w = Window.partitionBy(col(idCol), col("__n")).orderBy(col("__tpos"))
      .rowsBetween(Window.unboundedPreceding, 0)
    // null __cov (no start seen yet) is falsy under the when() below
    val covered = tokens.join(starts.hint("shuffle_hash"),
        col(idCol) === col("__sid") && col("__n") === col("__sn") &&
          col("__tpos") === col("__marker"), "left")
      .withColumn("__cov",
        max(col("__marker") + col("__n") - 1).over(w) >= col("__tpos"))
    val aggs = ns.map(n =>
      (sum(when(col("__n") === n && col("__cov"), col("__wl")).otherwise(0L))
        .cast("double") /
        sum(when(col("__n") === n, col("__wl")).otherwise(0L)))
        .as(s"dup$n"))
    covered.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-id fraction of WORD characters covered by n-grams that occur
    * MORE THAN ONCE WITHIN THE SAME DOCUMENT (Gopher's per-document
    * metric — contrast tx16's corpus-wide span removal). Positioned
    * grams → within-doc dup counts → start flags → the n-1-preceding
    * coverage window → character rollup. Every join is keyed on
    * (id, gram) or (id, position); the start set stays
    * shuffle-hash-joined (never broadcast — it is corpus-sized).
    * Kept as the single-n executable spec [[dupGramCharFracMulti]] is
    * pinned against. */
  def dupGramCharFrac(docs: DataFrame, idCol: String, ws: Column, n: Int,
                      outCol: String): DataFrame = {
    val base = docs.select(col(idCol), ws.as("__ws"))
    val tokens = base.select(col(idCol),
      posexplode(col("__ws")).as(Seq("__tpos", "__w")))
    val grams = base.select(col(idCol),
      posexplode(TextOps.wordShingles(col("__ws"), n))
        .as(Seq("__gpos", "__g")))
    // fresh aliases on the dup side: grams and dups share lineage, and
    // a same-name join condition would lean on self-join heuristics
    val dups = grams.groupBy(col(idCol), col("__g"))
      .agg(count(lit(1)).as("__c")).filter(col("__c") >= 2)
      .select(col(idCol).as("__did"), col("__g").as("__dg"))
    val starts = grams.join(dups.hint("shuffle_hash"),
        col(idCol) === col("__did") && col("__g") === col("__dg"),
        "left_semi")
      .select(col(idCol).as("__sid"), col("__gpos").as("__marker"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("__tpos"))
      .rowsBetween(-(n - 1), 0)
    tokens.join(starts.hint("shuffle_hash"),
        col(idCol) === col("__sid") && col("__tpos") === col("__marker"),
        "left")
      .withColumn("__cov", max(col("__marker")).over(w).isNotNull)
      .groupBy(col(idCol))
      .agg((sum(when(col("__cov"), length(col("__w"))).otherwise(0L))
        .cast("double") / sum(length(col("__w")))).as(outCol))
  }
}
