package graft.ingest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** The reference's ETL service tick, end-to-end (etl_job.py:64-132,
  * SURVEY §3.1): extract (pluggable fetch, retried with linear
  * backoff) → parse JSON → transform (empty-guard, validate, rename,
  * lenient cast, tz-normalize) → within-batch fact dedup → insert-only
  * -new dim upsert → sink appends. One [[runOnce]] call = one
  * 10-minute tick of the reference's loop (dags/youbike_dag.py:135);
  * scheduling stays outside (cron / Airflow / Structured Streaming via
  * [[graft.streaming.MicroBatchIngest]], which shares the same
  * stages).
  *
  * Scale posture: the batch is map-side until the dedup shuffle on the
  * warehouse unique key; the dim upsert anti-joins against a broadcast
  * of existing keys. The warehouse boundary is the pluggable [[Sinks]]
  * (JDBC in the reference via loaders/Readers.appendJdbc; parquet at
  * cluster scale; in-memory collectors in EtlJobSpec).
  */
object EtlJob {

  /** Pluggable warehouse boundary. `existingDimKeys` returns a frame
    * with at least a `station_no` column (the reference's
    * `SELECT station_no FROM station_info`, etl_job.py:120-121). */
  final case class Sinks(
    appendFacts: DataFrame => Unit,
    insertDims: DataFrame => Unit,
    existingDimKeys: () => DataFrame)

  final case class BatchResult(factsAppended: Long, dimsInserted: Long)

  /** One extract→transform→load tick. Fetch errors retry
    * `attempts`× with `backoffMs × attempt` sleeps (etl_job.py:21-23);
    * an empty or schema-broken batch fails loudly after retries, like
    * the reference's ValueError/KeyError — a silent skip would look
    * like a healthy tick to the scheduler. */
  def runOnce(spark: SparkSession,
              fetch: () => Dataset[String],
              sinks: Sinks,
              attempts: Int = 3,
              backoffMs: Long = 2000): BatchResult = {
    val records = Retry.withBackoff(attempts, backoffMs)(fetch())
    val raw = IngestBatch.parseJson(spark, records)
    val (dim, fact) = IngestBatch.transform(raw)

    val facts = IngestBatch.dedupFacts(fact).cache()
    val nFacts = facts.count() // materializes once; the sink write reuses it
    sinks.appendFacts(facts)
    facts.unpersist()

    val newDims = IngestBatch
      .newDimsOnly(dim, sinks.existingDimKeys(), "station_no").cache()
    val nDims = newDims.count()
    if (nDims > 0) sinks.insertDims(newDims)
    newDims.unpersist()

    BatchResult(nFacts, nDims)
  }
}
