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
  * Topology — identical at any chain length k: k chained keyed
  * aggregations + (k-1) shuffle-hash stage-gating joins, ALL on the
  * user key (one partitioning reused across every stage), then each
  * stage table reduces to a ONE-ROW frame and the rollup is k+1 tiny
  * cross-joins (whitelisted tiny-broadcast crosses). The only
  * full-stream aggregations are the per-user min-time frames and the
  * denominator's per-user frame — nothing joins back to the raw
  * stream and no window function touches it, so the shape survives a
  * 100 TB event table exactly as well as one groupBy(user) does.
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

    // stage tables by left fold: t(k) has (__user, __t: anchored stage-k
    // time, __prev: anchored stage-(k-1) time carried for the lag sum)
    val first = ev.filter(col("__type") === stages.head)
      .groupBy("__user").agg(min(col("__tus")).as("__t"))
      .withColumn("__prev", lit(null).cast("long"))
    val stageTables: Seq[DataFrame] = stages.tail.scanLeft(first) { (prev, name) =>
      ev.filter(col("__type") === name)
        .join(prev.select(col("__user"), col("__t").as("__anchor"))
          .hint("shuffle_hash"), Seq("__user"))
        .filter(col("__tus") > col("__anchor") &&
          col("__tus") <= col("__anchor") + winUs)
        .groupBy("__user").agg(min(col("__tus")).as("__t"),
          min(col("__anchor")).as("__prev"))
    }

    // one-row rollup frames: the denominator from a per-user frame
    // (NOT a distinct over the raw stream), then one count(+lag sum)
    // per stage table
    val nUsers = ev.select("__user").groupBy("__user").agg(count(lit(1)).as("__c"))
      .agg(count(lit(1)).as("n_users"))
    val nName: Int => String = {
      case 0 => s"n_${stages.head}"
      case i => s"n_${stages(i)}_after_${stages(i - 1)}"
    }
    val rollups = stageTables.zipWithIndex.map { case (t, i) =>
      if (i == 0) t.agg(count(lit(1)).as(nName(0)))
      else t.agg(count(lit(1)).as(nName(i)),
        sum(col("__t") - col("__prev")).as(s"__lag$i"))
    }
    val joined = rollups.foldLeft(nUsers)(_.crossJoin(_))

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
