package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.EtlJob

/** The reference's ETL service loop — `while True: run_etl();
  * sleep(600)` (etl_job.py:141-149), cron'd every 10 minutes at
  * dags/youbike_dag.py:135 — recast as a Structured Streaming
  * scheduler: a tick stream under `Trigger.ProcessingTime` fires one
  * full [[EtlJob.runOnce]] (Retry-wrapped extract → parse → transform
  * → within-batch dedup → insert-only dim upsert → sinks) per trigger.
  *
  * Compared to the hand-rolled sleep loop this inherits the engine's
  * driver machinery for free: trigger pacing, checkpointed batch ids,
  * stop/await semantics, and restart recovery. A tick that exhausts
  * its retries fails the query loudly (the reference's ValueError
  * contract) instead of silently skipping a cycle.
  *
  * Delivery contract: **at-least-once per tick.** With a
  * `checkpointDir`, a driver restart REPLAYS the last batch whose tick
  * committed to the source offset log but not the sink commit log —
  * that tick's `EtlJob.runOnce` runs again, so `Sinks.appendFacts`
  * side effects can duplicate (the reference's cron'd etl_job.py has
  * the same property: a crash between warehouse insert and process
  * exit re-inserts on the next cron fire). Exactly-once needs an
  * idempotent sink: key writes on the foreachBatch `batchId` (exposed
  * through `onResult`) and have the warehouse upsert/ignore on
  * (batch_id, unique key) — the dedup-on-conflict sink (S8,
  * IngestBatch.appendDeduped) is the batch-side building block.
  *
  * Scale posture: the tick stream is one row per trigger — all real
  * work happens inside runOnce's plan, which is map-side until the
  * dedup shuffle and broadcasts the dim anti-join (see EtlJob). The
  * scheduling layer adds no shuffle and no state beyond the rate
  * source's offset checkpoint.
  */
object ScheduledEtl {

  /** Start the scheduled loop. `ticks` defaults to a 1-row/s rate
    * source (only its trigger cadence matters, rows are ignored);
    * tests inject a MemoryStream so ticks are deterministic.
    * `onResult` observes each tick's (batchId, [[EtlJob.BatchResult]]) —
    * the batchId is the engine's checkpointed micro-batch id, the key
    * an idempotent sink uses to make restart replays exactly-once
    * (see the delivery contract above; a replayed tick re-fires with
    * the SAME batchId). */
  def start(spark: SparkSession,
            fetch: () => Dataset[String],
            sinks: EtlJob.Sinks,
            interval: String = "10 minutes",
            attempts: Int = 3,
            backoffMs: Long = 2000,
            ticks: Option[DataFrame] = None,
            checkpointDir: Option[String] = None,
            onResult: (Long, EtlJob.BatchResult) => Unit = (_, _) => ()): StreamingQuery = {
    val src = ticks.getOrElse(
      spark.readStream.format("rate").option("rowsPerSecond", 1).load())
    val writer = src.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(interval))
      .queryName("scheduled-etl")
      .foreachBatch { (_: DataFrame, batchId: Long) =>
        onResult(batchId, EtlJob.runOnce(spark, fetch, sinks, attempts, backoffMs))
        ()
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
