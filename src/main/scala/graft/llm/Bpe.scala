package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE-style tokenizer: vocabulary (merge-rule) learning on the
  * corpus's word histogram, and corpus tokenization as a chain of
  * plain string replacements (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units" — the byte-pair-
  * encoding recipe every modern LLM tokenizer descends from).
  *
  * Scale posture (the whole design):
  *  - LEARNING never touches the corpus row-by-row: one shuffle
  *    aggregates it to a distinct-word histogram, a bounded top-K of
  *    which (TakeOrderedAndProject — per-partition top-K, driver merge)
  *    is collected and the merge loop runs driver-side on that tiny
  *    table. This is the aggregate-before-ML shape (SURVEY §4.1) and
  *    exactly how reference BPE trainers work — they fit on word
  *    counts, not tokens.
  *  - APPLICATION is a pure map stage: the learned merges are LITERALS
  *    folded into a chain of plain (non-regex) `replace` calls over a
  *    delimiter-interleaved symbol string — whole-stage-codegen'd,
  *    scan-throughput, zero shuffle, and expressible verbatim in a SQL
  *    oracle because `replace` has identical non-overlapping
  *    left-to-right semantics in the JVM and DuckDB (verified:
  *    '|a|b|a|b|' under '|a|b|'→'|ab|' leaves the tail pair in both).
  *
  * Merge application semantics: each merge runs [[Passes]]
  * non-overlapping replacement passes of `|l|r|` → `|lr|`. One pass
  * misses an occurrence that starts inside a just-consumed match (the
  * shared boundary delimiter); the second pass picks those up. On
  * degenerate runs of a repeated symbol this pairs `aa·a·aa` where
  * strict leftmost-first BPE pairs `aa·aa·a` — a deliberate,
  * DOCUMENTED deviation: the pairing is still maximal, deterministic,
  * and bit-identical across engines, which is what the oracle
  * contract needs. [[learn]] applies merges to the histogram with the
  * SAME two-pass string semantics, so learning and application can
  * never disagree on a tokenization.
  */
object Bpe {

  /** Symbol delimiter. Input text must not contain it — callers strip
    * it first ([[stripSep]]); the corpus tables are alphanumeric. */
  val Sep = "|"

  /** Replacement passes per merge (see the semantics note above). */
  val Passes = 2

  final case class Merge(l: String, r: String) {
    def merged: String = l + r
  }

  /** Distinct-word histogram, top-K by (count desc, word asc) — the
    * bounded table learning runs on. One corpus shuffle; the orderBy +
    * limit plans as TakeOrderedAndProject, so no global sort. */
  def wordHistogram(docs: DataFrame, textCol: String, topK: Int): Array[(String, Long)] =
    docs.select(explode(TextOps.words(col(textCol))).as("w"))
      .filter(length(col("w")) > 0 && !col("w").contains(Sep))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("w"))
      .limit(topK)
      .collect().map(r => (r.getString(0), r.getLong(1)))

  /** One merge applied to a symbol string with the contract's two-pass
    * non-overlapping semantics — the executable spec [[applyMerges]]'
    * SQL `replace` chain is pinned against (String.replace is the same
    * non-overlapping left-to-right scan). */
  private[llm] def applyOne(sym: String, m: Merge): String = {
    val pat = Sep + m.l + Sep + m.r + Sep
    val rep = Sep + m.merged + Sep
    var s = sym
    (1 to Passes).foreach(_ => s = s.replace(pat, rep))
    s
  }

  /** Count-weighted BPE merge learning on the histogram (driver-side,
    * bounded input): `numMerges` rounds, each counting all adjacent
    * symbol pairs across the histogram words (weighted by word count,
    * overlapping occurrences included — the standard statistic),
    * picking the most frequent with a deterministic (count desc, pair
    * asc) tie-break, and rewriting every word with [[applyOne]]. Stops
    * early when no pair repeats. */
  def learn(hist: Array[(String, Long)], numMerges: Int): Seq[Merge] = {
    var words: Array[(String, Long)] = hist.map { case (w, n) =>
      (Sep + w.toCharArray.map(_.toString).mkString(Sep) + Sep, n)
    }
    val merges = Seq.newBuilder[Merge]
    var round = 0
    var exhausted = false
    while (round < numMerges && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (sym, n) =>
        val syms = sym.split(java.util.regex.Pattern.quote(Sep)).filter(_.nonEmpty)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + n
          i += 1
        }
      }
      val best = counts.filter(_._2 >= 2).toSeq
        .sortBy { case ((l, r), n) => (-n, l, r) }.headOption
      best match {
        case None => exhausted = true
        case Some(((l, r), _)) =>
          val m = Merge(l, r)
          merges += m
          words = words.map { case (sym, n) => (applyOne(sym, m), n) }
          round += 1
      }
    }
    merges.result()
  }

  /** Characters [[symbolize]]'s `(.)` regex treats differently across
    * engines: Java's `.` excludes ALL its line terminators (\r, NEL
    * U+0085, U+2028, U+2029 — and \n), RE2's excludes only \n. A
    * \n survives sanitization because both engines skip it
    * identically; the four Java-only terminators would de-sync the
    * symbol stream and are stripped. */
  private[llm] val JavaOnlyLineTerminators = Seq("\r", "\u0085", "\u2028", "\u2029")

  /** Remove the delimiter and the cross-engine-divergent line
    * terminators from raw text (operator precondition — mirrored in
    * SQL by [[sanitizeSqlExpr]]). */
  def stripSep(text: Column): Column =
    (Sep +: JavaOnlyLineTerminators).foldLeft(text)((c, s) =>
      replace(c, lit(s), lit("")))

  /** DuckDB mirror of [[stripSep]] over `textExpr`. */
  def sanitizeSqlExpr(textExpr: String): String = {
    val codes = Sep.codePointAt(0) +: JavaOnlyLineTerminators.map(_.codePointAt(0))
    codes.foldLeft(textExpr)((e, cp) => s"replace($e, chr($cp), '')")
  }

  /** Character-level symbol string of a text: every character becomes
    * a delimited symbol (`"the"` → `"|t|h|e|"`). Mirrored in SQL as
    * `'|' || regexp_replace(text, '(.)', '\1|', 'g')` — which is only
    * bit-identical after [[stripSep]] (see
    * [[JavaOnlyLineTerminators]]). */
  def symbolize(text: Column): Column =
    concat(lit(Sep), regexp_replace(text, "(.)", "$1" + Sep))

  /** The learned merges applied as a literal `replace` chain —
    * [[Passes]] calls per merge, nothing but codegen'd string scans. */
  def applyMerges(sym: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(sym) { (c, m) =>
      val pat = lit(Sep + m.l + Sep + m.r + Sep)
      val rep = lit(Sep + m.merged + Sep)
      (1 to Passes).foldLeft(c)((cc, _) => replace(cc, pat, rep))
    }

  /** Symbol count of a delimited symbol string: delimiters − 1 (the
    * empty text `"|"` counts 0). */
  def tokenCount(sym: Column): Column =
    length(sym) - length(replace(sym, lit(Sep), lit(""))) - 1

  /** DuckDB mirror of symbolize → applyMerges → (sym expr), for
    * generated oracles: builds the identical replace chain as SQL text
    * over `textExpr` (single quotes in symbols doubled — not that the
    * alphanumeric corpus produces any). */
  def symSqlExpr(textExpr: String, merges: Seq[Merge]): String = {
    def q(s: String): String = s.replace("'", "''")
    val base = s"'$Sep' || regexp_replace($textExpr, '(.)', '\\1$Sep', 'g')"
    merges.foldLeft(base) { (e, m) =>
      val pat = q(Sep + m.l + Sep + m.r + Sep)
      val rep = q(Sep + m.merged + Sep)
      (1 to Passes).foldLeft(e)((ee, _) => s"replace($ee, '$pat', '$rep')")
    }
  }
}
