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
    * `onResult` observes each tick's [[EtlJob.BatchResult]]. */
  def start(spark: SparkSession,
            fetch: () => Dataset[String],
            sinks: EtlJob.Sinks,
            interval: String = "10 minutes",
            attempts: Int = 3,
            backoffMs: Long = 2000,
            ticks: Option[DataFrame] = None,
            checkpointDir: Option[String] = None,
            onResult: EtlJob.BatchResult => Unit = _ => ()): StreamingQuery = {
    val src = ticks.getOrElse(
      spark.readStream.format("rate").option("rowsPerSecond", 1).load())
    val writer = src.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(interval))
      .queryName("scheduled-etl")
      .foreachBatch { (_: DataFrame, _: Long) =>
        onResult(EtlJob.runOnce(spark, fetch, sinks, attempts, backoffMs))
        ()
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
