package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.9 STREAMING first-touch funnel — [[graft.ops.Funnel]]'s operator
  * on an unbounded stream, the shape a live conversion dashboard runs:
  * per-user stage-anchor times maintained as custom state in
  * `flatMapGroupsWithState` (the runningCounts/st3 API), so the funnel
  * advances INCREMENTALLY as events arrive instead of re-scanning the
  * whole history per refresh (the batch funnel's cost at 100 TB of
  * events).
  *
  * State per user is ONE fixed k-long array (the set-once anchor time
  * of each completed stage, 0 = not reached) — bounded regardless of
  * how many events or triggers arrive, the state-store posture every
  * st* operator in this engine ships. The update rule mirrors the
  * batch semantics exactly: stage 0 anchors at the user's FIRST
  * stage-0 event (first-touch); stage i anchors at the first stage-i
  * event with `t > anchor(i-1)` and `t <= anchor(i-1) + window`. Each
  * slot is written at most once and never rewritten, which is what
  * makes per-trigger emissions monotone (a later emission never loses
  * a field) — the final per-user row is `min` over non-null emissions,
  * exactly the st3 "max over running counts" recovery move.
  *
  * INPUT ORDER CONTRACT ([[stageTimes]]): within a trigger, a user's
  * events are sorted by event time here (iterator order is arbitrary);
  * ACROSS triggers the stream must deliver each user's events in
  * nondecreasing event-time order (true for date-partitioned
  * replay/log-compaction feeds — st13's staged arrival days split at a
  * time cut). A first-touch anchor is min-of-history: once stage 0 is
  * set from an in-order prefix it IS the global minimum, so no late
  * event can invalidate it. The contract is ENFORCED, not assumed
  * (r12 ADVICE): state carries the per-user max event time seen, and
  * an event arriving BELOW it in a later trigger fails the query with
  * `IllegalStateException` — a violated contract would otherwise
  * silently mis-anchor (a late earlier click cannot displace a
  * set-once anchor). Ties cost nothing: every gate is STRICT (>) on
  * the anchor, so an event tying the anchor timestamp is rejected in
  * whatever intra-tie order the sort yields — identical to the batch
  * `min`+strict-gate outcome.
  *
  * [[stageTimesBuffered]] LIFTS the cross-trigger contract — the
  * production generalization for feeds that are out of order within a
  * bounded lateness (Kafka partitions, multi-region collectors): the
  * input carries an event-time WATERMARK, and each user's events are
  * buffered in state until the watermark passes them, then folded in
  * event-time order through the identical anchor rule. Spark's
  * watermark guarantee (no future row below the watermark) makes the
  * fold order-correct regardless of arrival order; state is the same
  * fixed k-long anchor array PLUS a buffer bounded by the lateness
  * horizon (events within `delayThreshold` of the stream head — the
  * bound the watermark contract itself imposes). Buffered events are
  * flushed by event-time TIMEOUTS, so a user's anchors advance when
  * the watermark passes their pending events even if that user never
  * sends another event.
  *
  * Shuffle topology (both variants): one hash exchange on the user key
  * (groupByKey), identical at 1000 executors; no joins, no second pass.
  */
object FunnelStream {

  /** Buffered-variant state: set-once anchors + the not-yet-mature
    * event buffer (parallel arrays: event time µs, stage index). The
    * buffer holds ONLY stage events still above the watermark — its
    * size is bounded by the user's event rate × the lateness horizon,
    * the same bound any watermarked stateful operator carries. */
  case class FunnelBufState(anchors: Array[Long], bufTs: Array[Long],
                            bufStage: Array[Int])

  /** Fold `evs` (µs, stageIdx), sorted here by event time, into the
    * set-once anchor array `t` — the one anchor rule both variants and
    * the batch funnel share. */
  private def foldAnchors(t: Array[Long], evs: Array[(Long, Int)],
                          winUs: Long): Unit = {
    scala.util.Sorting.stableSort(evs,
      (a: (Long, Int), b: (Long, Int)) => a._1 < b._1)
    var j = 0
    while (j < evs.length) {
      val ts = evs(j)._1
      val i = evs(j)._2
      if (i == 0) { if (t(0) == 0L) t(0) = ts }
      else if (t(i) == 0L && t(i - 1) != 0L &&
        ts > t(i - 1) && ts <= t(i - 1) + winUs) t(i) = ts
      j += 1
    }
  }

  /** Per-trigger per-user snapshot stream of stage-anchor times.
    * Output rows: (user, times) where times(i) is the unix_micros
    * anchor of stage i, 0 while unreached. Users whose events are all
    * non-stage types still emit (all-zero) — the funnel DENOMINATOR is
    * every user seen, the a12 contract. NULL users are excluded, as in
    * the batch funnel. Requires in-order per-user delivery ACROSS
    * triggers (enforced — see the class doc); for out-of-order feeds
    * use [[stageTimesBuffered]]. */
  def stageTimes(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, stages: Seq[String],
                 windowHours: Long): Dataset[(Long, Array[Long])] = {
    require(stages.size >= 2, s"funnel needs >= 2 stages, got ${stages.size}")
    require(stages.distinct.size == stages.size,
      s"stage names must be distinct, got $stages")
    require(windowHours > 0, s"windowHours must be positive, got $windowHours")
    val session = events.sparkSession
    import session.implicits._
    val k = stages.size
    val winUs = windowHours * 3600L * 1000000L
    val stageIdx: Map[String, Int] = stages.zipWithIndex.toMap
    events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).cast("long"), unix_micros(col(tsCol)),
        col(typeCol))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (user: Long, rows: Iterator[(Long, Long, String)],
         state: GroupState[Array[Long]]) => {
          // state slot k (beyond the anchors) = max event time seen,
          // the cross-trigger in-order sentinel; emissions carry only
          // the k anchor slots. A checkpoint written by the pre-
          // sentinel version holds k-long arrays — pad instead of
          // crashing on t(k) (the sentinel starts life as "nothing
          // seen", exactly right for migrated state). ANY other length
          // means the stage list changed across a checkpointed deploy:
          // slot meanings no longer line up (e.g. an old sentinel slot
          // would be read as an anchor), so fail fast with a clear
          // error instead of the r13 fall-through's eventual
          // ArrayIndexOutOfBounds deep in the fold (r13 ADVICE)
          val t = state.getOption match {
            case Some(a) if a.length == k + 1 => a
            case Some(a) if a.length == k => a ++ Array(0L)
            case Some(a) => throw new IllegalStateException(
              s"incompatible funnel checkpoint for user $user: expected " +
                s"${k + 1} state slots (or the pre-sentinel $k), found " +
                s"${a.length} — the stage list changed across a " +
                "checkpointed deploy; restart with a fresh checkpoint")
            case None => Array.fill(k + 1)(0L)
          }
          val evs = rows.toArray
          scala.util.Sorting.stableSort(evs,
            (a: (Long, Long, String), b: (Long, Long, String)) => a._2 < b._2)
          if (evs.nonEmpty && t(k) != 0L && evs.head._2 < t(k))
            throw new IllegalStateException(
              s"FunnelStream.stageTimes input-order contract violated for " +
                s"user $user: event at ${evs.head._2} us arrived after an " +
                s"event at ${t(k)} us in a PRIOR trigger — a late earlier " +
                s"event cannot displace set-once anchors; use " +
                s"stageTimesBuffered for out-of-order feeds")
          var j = 0
          while (j < evs.length) {
            val ts = evs(j)._2
            stageIdx.get(evs(j)._3) match {
              case Some(0) if t(0) == 0L => t(0) = ts
              case Some(i) if i > 0 && t(i) == 0L && t(i - 1) != 0L &&
                  ts > t(i - 1) && ts <= t(i - 1) + winUs => t(i) = ts
              case _ => ()
            }
            j += 1
          }
          if (evs.nonEmpty && evs.last._2 > t(k)) t(k) = evs.last._2
          state.update(t)
          Iterator((user, java.util.Arrays.copyOf(t, k)))
        })
  }

  /** [[stageTimes]] for OUT-OF-ORDER feeds: `events` must carry an
    * event-time watermark on `tsCol` (`df.withWatermark(tsCol, delay)`
    * — applied here from `delayThreshold`). Arriving stage events are
    * buffered in state; once the watermark passes an event's time, no
    * earlier event can still arrive (Spark's watermark guarantee), so
    * the matured prefix folds through the anchor rule in true
    * event-time order — arrival order never matters within the
    * lateness horizon. Pending buffers flush on event-time timeouts:
    * the watermark advancing past a user's buffered events re-invokes
    * the group with no new rows and folds them, so anchors converge
    * without requiring further traffic from that user. Events later
    * than the watermark allows (beyond `delayThreshold`) are dropped
    * by the watermark machinery itself — the standard streaming
    * trade, stated rather than hidden. */
  def stageTimesBuffered(events: DataFrame, userCol: String, tsCol: String,
                         typeCol: String, stages: Seq[String],
                         windowHours: Long,
                         delayThreshold: String): Dataset[(Long, Array[Long])] = {
    require(stages.size >= 2, s"funnel needs >= 2 stages, got ${stages.size}")
    require(stages.distinct.size == stages.size,
      s"stage names must be distinct, got $stages")
    require(windowHours > 0, s"windowHours must be positive, got $windowHours")
    val session = events.sparkSession
    import session.implicits._
    val k = stages.size
    val winUs = windowHours * 3600L * 1000000L
    val stageIdx: Map[String, Int] = stages.zipWithIndex.toMap
    events
      .filter(col(userCol).isNotNull)
      .withWatermark(tsCol, delayThreshold)
      // keep the watermarked timestamp attribute itself in the operator
      // input (4th field, unread) — UNTOUCHED: any expression over it
      // (even a same-type cast) drops the event-time metadata and
      // EventTimeTimeout then fails to bind
      .select(col(userCol).cast("long"), unix_micros(col(tsCol)),
        col(typeCol), col(tsCol))
      .as[(Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(
        (user: Long, rows: Iterator[(Long, Long, String, java.sql.Timestamp)],
         state: GroupState[FunnelBufState]) => {
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val st = state.getOption.getOrElse(
            FunnelBufState(Array.fill(k)(0L), Array.empty, Array.empty))
          // buffer = carried pending events + this trigger's stage events
          val incoming = rows.flatMap(r =>
            stageIdx.get(r._3).map(i => (r._2, i))).toArray
          val all = new Array[(Long, Int)](st.bufTs.length + incoming.length)
          var i = 0
          while (i < st.bufTs.length) { all(i) = (st.bufTs(i), st.bufStage(i)); i += 1 }
          System.arraycopy(incoming, 0, all, st.bufTs.length, incoming.length)
          // mature = at or below the watermark: complete by the
          // watermark guarantee, so folding it sorted IS the in-order
          // replay; the rest stays buffered for a later trigger/timeout
          val (mature, pending) = all.partition(_._1 <= wmUs)
          val t = st.anchors
          foldAnchors(t, mature, winUs)
          state.update(FunnelBufState(t, pending.map(_._1), pending.map(_._2)))
          if (pending.nonEmpty) {
            // wake this group when the watermark passes its earliest
            // pending event (must arm strictly above the current wm)
            val wakeMs = math.max(pending.map(_._1).min / 1000L,
              state.getCurrentWatermarkMs() + 1L)
            state.setTimeoutTimestamp(wakeMs)
          }
          Iterator((user, t.clone()))
        })
  }
}
