package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parameterized ordered-windowed funnel over an event stream — the
  * general form of ClickHouse's `windowFunnel` (with deliberate
  * FIRST-TOUCH anchoring, see below) for an arbitrary stage chain:
  * `funnel(events, "user_id", "ts", "event_type",
  * Seq("click", "view", "purchase"), windowHours = 24)` computes, per
  * user, the first stage-1 event, then the first stage-2 event inside
  * `(t1, t1 + window]`, then the first stage-3 event inside
  * `(t2, t2 + window]`, …, and rolls the per-stage survivor tables
  * into one row of counts, conversion rates, and mean stage lags.
  *
  * Semantics (shared with the hand-built 3-stage a12 it generalizes —
  * a12 is re-expressed through this function, oracle unchanged):
  *  - STRICT temporal ordering: a stage-k event counts only strictly
  *    after the user's anchored stage-(k-1) time;
  *  - per-stage conversion window: … and at most `window` later —
  *    without it every user of a months-long stream trivially
  *    converts and the rates pin at 1.0;
  *  - FIRST-TOUCH anchoring: the chain is anchored at the user's
  *    FIRST qualifying event of each stage (marketing first-touch
  *    attribution). ClickHouse's windowFunnel additionally rescans
  *    later chain starts and would count MORE conversions; this form
  *    is deterministic, join-expressible, and what the a12 oracle
  *    pins.
  *
  * Topology (r17, guide §2.4/§1.2 — the algorithm pass): ONE scan of
  * the event stream and ONE exchange on the user key, at any chain
  * length k. The chained anchors are a WINDOW CASCADE — anchor k is
  * `min(when(type = sk AND t > a(k-1) AND t <= a(k-1) + win, t))`
  * over the unordered per-user frame, referencing anchor k-1's window
  * column — so all k WindowExecs share the one hash exchange (equal
  * partitioning, no per-window re-sort), the per-user reduction
  * reuses it again (groupBy on the same key), and the final ONE-ROW
  * rollup computes every count, the denominator and the exact-long
  * lag sums in a single global aggregate. The previous form (r10-r16)
  * scanned the stream k+1 times and gated stages through k-1
  * user-keyed shuffle-hash joins plus k+1 one-row cross-joins —
  * identical results (the per-stage min/gate expressions are
  *  unchanged, oracle-verified), but k+1 fact-table passes at 100 TB
  * against this form's one.
  *
  * Output columns, derived from the stage names:
  *  - `n_users` — distinct users in the whole stream (rate-1
  *    denominator), computed as the row count of a per-user frame;
  *  - `n_<s1>`, then `n_<sk>_after_<sk-1>` for each later stage;
  *  - `r_<s1>` = n_1/n_users, `r_<sk>` = n_k/n_(k-1);
  *  - `avg_hours_<sk-1>_to_<sk>` — mean lag between anchored stage
  *    times. Stage times are exact microsecond minima, so the mean is
  *    an exact-long sum divided once — deterministic cross-engine.
  *
  * Reference provenance: the reference's event-analytics roll-ups
  * (etl_job.py:141-163) stop at per-hour aggregation; the funnel is
  * the ordered-sequence analysis layer on the same stream.
  */
object Funnel {

  /** See object doc. `stages` needs >= 2 entries with distinct names
    * (names become column-name fragments). `windowHours` is the
    * per-stage conversion window in hours. `fmt` post-processes each
    * derived double (rates and lags) — the query layer passes its
    * cross-engine truncation (graft.queries.Fmt.t6) so the ops layer
    * stays presentation-free. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String],
             windowHours: Long, fmt: Column => Column = identity): DataFrame = {
    require(stages.size >= 2, s"funnel needs >= 2 stages, got ${stages.size}")
    require(stages.distinct.size == stages.size,
      s"stage names must be distinct, got $stages")
    require(windowHours > 0, s"windowHours must be positive, got $windowHours")
    val winUs = windowHours * 3600L * 1000000L
    // NULL-user events are EXCLUDED from the funnel by definition, on
    // both engines: Spark filters here, and the a12/a13 oracles filter
    // their fev CTE the same way (r11 review — an unfiltered SQL GROUP
    // BY would keep a NULL stage-1 group that count(DISTINCT user_id)
    // excludes from the denominator, an inconsistent hybrid).
    val ev = events.select(col(userCol).as("__user"),
      unix_micros(col(tsCol)).as("__tus"), col(typeCol).as("__type"))
      .filter(col("__user").isNotNull)

    // chained anchors as a window cascade over ONE per-user hash
    // exchange: anchor 0 = the user's first stage-0 time; anchor i =
    // the first stage-i time strictly inside (anchor(i-1),
    // anchor(i-1) + win] — a null anchor(i-1) nulls the `when` guard,
    // so the chain gates exactly as the former per-stage inner joins
    // did. min over an UNORDERED frame: no per-window sort, every
    // WindowExec shares the single exchange.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__user")
    val k = stages.size
    val anchored = stages.zipWithIndex.foldLeft(ev) { case (df, (name, i)) =>
      val qualifies =
        if (i == 0) col("__type") === name
        else col("__type") === name &&
          col("__tus") > col(s"__a${i - 1}") &&
          col("__tus") <= col(s"__a${i - 1}") + winUs
      df.withColumn(s"__a$i", min(when(qualifies, col("__tus"))).over(w))
    }
    // per-user frame (one row per user, anchors constant within the
    // partition — max = the value, null when the stage was unreached);
    // groupBy on the window's own key reuses its exchange
    val perUser = anchored.groupBy("__user")
      .agg(max(col("__a0")).as("__t0"),
        (1 until k).map(i => max(col(s"__a$i")).as(s"__t$i")): _*)

    // ONE global rollup: denominator (every user seen — the a12
    // contract), per-stage converted counts, and the exact-long lag
    // sums (sum skips null rows; a non-null __t(i) implies a non-null
    // __t(i-1) by the chain, matching the former stage-table sums)
    val nName: Int => String = {
      case 0 => s"n_${stages.head}"
      case i => s"n_${stages(i)}_after_${stages(i - 1)}"
    }
    val rollupCols: Seq[Column] =
      count(lit(1)).as("n_users") +: count(col("__t0")).as(nName(0)) +:
        (1 until k).flatMap(i => Seq(
          count(col(s"__t$i")).as(nName(i)),
          sum(col(s"__t$i") - col(s"__t${i - 1}")).as(s"__lag$i")))
    val joined = perUser.agg(rollupCols.head, rollupCols.tail: _*)

    // Empty-stage semantics: if stage table k comes out empty (count
    // 0), the rate whose DENOMINATOR it feeds and the lag over it are
    // emitted as explicit SQL NULL (when(denom > 0, ...) below) rather
    // than relying on engine-specific x/0 behavior — a SQL oracle's
    // n/NULLIF(d, 0) form matches this exactly. The rate OF the empty
    // stage itself is 0/denom = 0.0.
    val rates: Seq[Column] = stages.indices.map { i =>
      val denom = if (i == 0) col("n_users") else col(nName(i - 1))
      fmt(when(denom > 0, col(nName(i)).cast("double") / denom))
        .as(s"r_${stages(i)}")
    }
    val lags: Seq[Column] = (1 until stages.size).map { i =>
      fmt(when(col(nName(i)) > 0,
        col(s"__lag$i").cast("double") / col(nName(i)) / 3.6e9))
        .as(s"avg_hours_${stages(i - 1)}_to_${stages(i)}")
    }
    joined.select(col("n_users") +: stages.indices.map(i => col(nName(i)))
      ++: rates ++: lags: _*)
  }
}
