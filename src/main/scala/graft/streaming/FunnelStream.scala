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
  * INPUT ORDER CONTRACT: within a trigger, a user's events are sorted
  * by event time here (iterator order is arbitrary); ACROSS triggers
  * the stream must deliver each user's events in nondecreasing
  * event-time order (true for date-partitioned replay/log-compaction
  * feeds — st13's staged arrival days split at a time cut). A
  * first-touch anchor is min-of-history: once stage 0 is set from an
  * in-order prefix it IS the global minimum, so no late event can
  * invalidate it — the production generalization (out-of-order within
  * a watermark) would buffer events per user until the watermark
  * passes, same state bound plus the buffer horizon. Ties cost
  * nothing: every gate is STRICT (>) on the anchor, so an event tying
  * the anchor timestamp is rejected in whatever intra-tie order the
  * sort yields — identical to the batch `min`+strict-gate outcome.
  *
  * Shuffle topology: one hash exchange on the user key (groupByKey),
  * identical at 1000 executors; no joins, no second pass.
  */
object FunnelStream {

  /** Per-trigger per-user snapshot stream of stage-anchor times.
    * Output rows: (user, times) where times(i) is the unix_micros
    * anchor of stage i, 0 while unreached. Users whose events are all
    * non-stage types still emit (all-zero) — the funnel DENOMINATOR is
    * every user seen, the a12 contract. NULL users are excluded, as in
    * the batch funnel. */
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
          val t = state.getOption.getOrElse(Array.fill(k)(0L))
          val evs = rows.toArray
          scala.util.Sorting.stableSort(evs,
            (a: (Long, Long, String), b: (Long, Long, String)) => a._2 < b._2)
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
          state.update(t)
          Iterator((user, t.clone()))
        })
  }
}
