package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

import graft.ingest.IngestBatch

/** Streaming ingest (SURVEY §2.9): the reference's 10-minute poll loop
  * (etl_job.py:141-149, every-10-min cron at dags/youbike_dag.py:135) mapped to
  * Structured Streaming — micro-batch trigger, watermarked dedup on
  * the warehouse unique key, and the insert-only dim upsert as a
  * foreachBatch step.
  *
  * Scale posture: dropDuplicatesWithinWatermark keeps per-key state
  * only inside the watermark horizon (bounded state, keyed shuffle);
  * the dim upsert anti-join broadcasts the existing-keys side. At
  * 100 TB/day the same topology holds — state size is
  * keys-per-watermark-window, not history.
  */
object MicroBatchIngest {

  /** Watermarked exactly-once-ish dedup on (station_no, record_time) —
    * the streaming analog of the DB unique key (sql/init_schema.sql:17,
    * IntegrityError-skip at etl_job.py:129-132). */
  def dedupWithinWatermark(facts: DataFrame, watermark: String = "1 hour"): DataFrame =
    facts
      .withWatermark("record_time", watermark)
      .dropDuplicatesWithinWatermark("station_no", "record_time")

  /** Full sink wiring: watermark dedup, then per-micro-batch dim
    * upsert + fact append through user callbacks (the JDBC/parquet
    * writes stay pluggable — tests use in-memory collectors). */
  def writer(facts: DataFrame,
             appendFacts: DataFrame => Unit,
             upsertDims: DataFrame => Unit,
             dims: Long => DataFrame,
             existingDims: () => DataFrame,
             triggerInterval: String = "10 minutes",
             watermark: String = "1 hour"): DataStreamWriter[Row] =
    dedupWithinWatermark(facts, watermark)
      .writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendFacts(batch)
        val newDims = IngestBatch.newDimsOnly(dims(batchId), existingDims(), "station_no")
        upsertDims(newDims)
        ()
      }
}
