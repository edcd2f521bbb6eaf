package graft.queries

import org.apache.spark.sql.functions._

import graft.ops.Windows

/** SURVEY §2.6 window / time-series operators (W1-W6) as oracle-backed
  * queries. All full-fact outputs: no global sort (the harness
  * canonicalizes row order); ordering lives only inside the window
  * specs, where it is semantic.
  *
  * Scale posture: one shuffle on `station_no` per query, then sorted
  * per-partition evaluation — the canonical Spark window shape. Keys
  * are station-grain (bounded rows per key), so no skew risk.
  */
object WindowQueries extends Q.Registry {
  import RelationalQueries.enrSql

  /** Shared gappy series: filling_rate with deterministic nulls punched
    * at event_id % 7 == 0 so fill/interpolate recipes have real gaps.
    * Mirrored in SQL as `gappy`. */
  private val gappySql: String =
    """, gappy AS (
      |  SELECT event_id, station_no, record_time,
      |         CASE WHEN event_id % 7 <> 0 THEN filling_rate END AS x
      |  FROM enr)
      |""".stripMargin

  val all: Seq[Q] = Seq(

    Q("w7_sessionize",
      "Gap-based SESSIONIZATION (W7 — the classic event-analytics " +
        "operator the w-series lacked): per user, a new session " +
        "starts when the gap to the previous event exceeds 6 h " +
        "(~the corpus's median inter-event gap, so the rule splits " +
        "meaningfully); session_idx = running count of boundaries " +
        "(ops/Windows.sessionize — exact-microsecond gaps, RANGE-" +
        "frame cumsum so hypothetical timestamp ties stay in one " +
        "session, layout-invariantly). Output = per-session rollup: " +
        "event count, span, duration, purchase count. One shuffle on " +
        "user_id; the lag and cumsum windows and the final rollup " +
        "all share it.",
      (s, d) => {
        val sess = Windows.sessionize(
          graft.Tables.events(s, d)
            .select(col("user_id"), col("ts"), col("event_type")),
          "user_id", "ts", gapSec = 21600L)
        sess.groupBy("user_id", "session_idx")
          .agg(
            count(lit(1)).as("n_events"),
            min(col("ts")).as("s_start"),
            max(col("ts")).as("s_end"),
            Fmt.t6((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
              .cast("double") / 1e6).as("duration_sec"),
            sum((col("event_type") === "purchase").cast("long"))
              .as("n_purchases"))
          .orderBy("user_id", "session_idx")
      },
      Some(
        """WITH sv AS (
          |  SELECT user_id, ts, event_type,
          |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev
          |  FROM events),
          |sf AS (
          |  SELECT user_id, ts, event_type,
          |         CASE WHEN prev IS NULL OR epoch_us(ts) - prev > 21600000000
          |              THEN 1 ELSE 0 END AS newf
          |  FROM sv),
          |sx AS (
          |  SELECT user_id, ts, event_type,
          |         sum(newf) OVER (PARTITION BY user_id ORDER BY ts) AS session_idx
          |  FROM sf)
          |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
          |       count(*) AS n_events,
          |       min(ts) AS s_start, max(ts) AS s_end,
          |       floor((CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS DOUBLE) / 1e6)
          |         * 1e6 + 1e-6) / 1e6 AS duration_sec,
          |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
          |         AS n_purchases
          |FROM sx
          |GROUP BY user_id, session_idx
          |ORDER BY user_id, session_idx""".stripMargin)),

    Q("w1_lag_rate",
      "Lag feature per station (W1, 01:1115-1118): filling_rate_lag1 = " +
        "shift(1) within station ordered by time — the reference's " +
        "highest-value model feature (M3 R2=0.92 vs M1 0.02).",
      (s, d) =>
        RelationalQueries.enriched(s, d)
          .select(
            col("event_id"),
            col("station_no"),
            col("filling_rate"),
            Windows.lag1(col("filling_rate"), col("station_no"),
              col("record_time"), col("event_id")).as("filling_rate_lag1")),
      Some(enrSql +
        """SELECT event_id, station_no, filling_rate,
          |       lag(filling_rate) OVER (PARTITION BY station_no
          |         ORDER BY record_time, event_id) AS filling_rate_lag1
          |FROM enr""".stripMargin)),

    Q("w3_ffill_bfill",
      "Forward/backward fill over punched gaps (W3, 04:237): ffill, " +
        "bfill, and the pandas .ffill().bfill() cascade.",
      (s, d) => {
        val base = RelationalQueries.enriched(s, d)
          .withColumn("x", when(col("event_id") % 7 =!= 0, col("filling_rate")))
        val k = col("station_no")
        val ord = Seq(col("record_time"), col("event_id"))
        base.select(
          col("event_id"),
          col("x"),
          Windows.ffill(col("x"), k, ord: _*).as("x_ffill"),
          Windows.bfill(col("x"), k, ord: _*).as("x_bfill"),
          Windows.ffillThenBfill(col("x"), k, ord: _*).as("x_filled"))
      },
      Some(enrSql + gappySql +
        """SELECT event_id, x,
          |  last_value(x IGNORE NULLS) OVER (PARTITION BY station_no ORDER BY record_time, event_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS x_ffill,
          |  first_value(x IGNORE NULLS) OVER (PARTITION BY station_no ORDER BY record_time, event_id
          |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS x_bfill,
          |  coalesce(
          |    last_value(x IGNORE NULLS) OVER (PARTITION BY station_no ORDER BY record_time, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          |    first_value(x IGNORE NULLS) OVER (PARTITION BY station_no ORDER BY record_time, event_id
          |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) AS x_filled
          |FROM gappy""".stripMargin)),

    Q("w4_interpolate",
      "Per-station linear interpolation with the reference's exact " +
        ".interpolate('linear').ffill().bfill() cascade (W4, 05:194-196).",
      (s, d) => {
        val base = RelationalQueries.enriched(s, d)
          .withColumn("x", when(col("event_id") % 7 =!= 0, col("filling_rate")))
        base.select(
          col("event_id"),
          col("x"),
          Fmt.trunc(Windows.interpolateLinear(col("x"), col("station_no"),
            col("record_time"), col("event_id")), 6).as("x_interp"))
      },
      Some(enrSql + gappySql +
        """, staged AS (
          |  SELECT event_id, x,
          |    row_number() OVER w AS rn,
          |    last_value(x IGNORE NULLS) OVER (PARTITION BY station_no ORDER BY record_time, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
          |    first_value(x IGNORE NULLS) OVER (PARTITION BY station_no ORDER BY record_time, event_id
          |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
          |    last_value(CASE WHEN x IS NOT NULL THEN rn0 END IGNORE NULLS)
          |      OVER (PARTITION BY station_no ORDER BY record_time, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_rn,
          |    first_value(CASE WHEN x IS NOT NULL THEN rn0 END IGNORE NULLS)
          |      OVER (PARTITION BY station_no ORDER BY record_time, event_id
          |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_rn
          |  FROM (SELECT *, row_number() OVER (PARTITION BY station_no
          |          ORDER BY record_time, event_id) AS rn0 FROM gappy)
          |  WINDOW w AS (PARTITION BY station_no ORDER BY record_time, event_id))
          |SELECT event_id, x,
          |  floor((CASE WHEN x IS NOT NULL THEN x
          |        WHEN prev_val IS NOT NULL AND next_val IS NOT NULL
          |          THEN prev_val + (next_val - prev_val) * (rn - prev_rn) / (next_rn - prev_rn)
          |        ELSE coalesce(prev_val, next_val) END) * 1e6 + 1e-6) / 1e6 AS x_interp
          |FROM staged""".stripMargin)),

    Q("p17_dense_ids",
      "Dense 0-based station index (P17, 05:182): the reference's " +
        "enumerate() mapping dict as a ranking window over distinct keys.",
      (s, d) =>
        graft.ops.Windows.denseId(
          RelationalQueries.enriched(s, d).filter(col("district").isNotNull),
          "station_no", "station_idx")
          .orderBy("station_idx"),
      Some(enrSql +
        """SELECT station_no,
          |       CAST(row_number() OVER (ORDER BY station_no) - 1 AS INT) AS station_idx
          |FROM (SELECT DISTINCT station_no FROM enr WHERE district IS NOT NULL)
          |ORDER BY station_idx""".stripMargin)),

    Q("w5_sequences",
      "Sliding-window (X, y) training pairs (W5, 04:71-85, 05:224-252): " +
        "3-step sequence of rates + next-step label per station, emitted " +
        "flat (x1..x3) for the oracle.",
      (s, d) => {
        val base = RelationalQueries.enriched(s, d)
          .filter(col("filling_rate").isNotNull)
        val k = col("station_no")
        val ord = Seq(col("record_time"), col("event_id"))
        base
          .withColumn("seq", Windows.slidingSeq(col("filling_rate"), 3, k, ord: _*))
          .withColumn("label", Windows.leadLabel(col("filling_rate"), k, ord: _*))
          .filter(size(col("seq")) === 3 && col("label").isNotNull)
          .select(
            col("event_id"),
            element_at(col("seq"), 1).as("x1"),
            element_at(col("seq"), 2).as("x2"),
            element_at(col("seq"), 3).as("x3"),
            col("label"))
      },
      Some(enrSql +
        """SELECT event_id, x1, x2, x3, label FROM (
          |  SELECT event_id,
          |    lag(filling_rate, 2) OVER w AS x1,
          |    lag(filling_rate, 1) OVER w AS x2,
          |    filling_rate AS x3,
          |    lead(filling_rate, 1) OVER w AS label
          |  FROM enr WHERE filling_rate IS NOT NULL
          |  WINDOW w AS (PARTITION BY station_no ORDER BY record_time, event_id))
          |WHERE x1 IS NOT NULL AND x2 IS NOT NULL AND label IS NOT NULL""".stripMargin))
  )
}
