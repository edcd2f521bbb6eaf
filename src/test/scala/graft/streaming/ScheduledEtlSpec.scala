package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.SparkSpec
import graft.ingest.EtlJob

/** The §3.1 lifecycle end-to-end AS A STREAM (the last composition the
  * batch EtlJobSpec and the operator-level MicroBatchIngestSpec don't
  * cover): Trigger-paced ticks each drive one full runOnce — flaky
  * fetch retried, within-batch fact dedup, insert-only dims
  * accumulating ACROSS ticks — with deterministic MemoryStream ticks
  * standing in for the production 10-minute rate source. */
class ScheduledEtlSpec extends SparkSpec {
  import spark.implicits._

  private def record(sno: String, t: String) =
    s"""{"sno":"$sno","sna":"n$sno","sarea":"d1","latitude":25.04,"longitude":121.52,
       |"Quantity":30,"available_rent_bikes":5,"available_return_bikes":25,
       |"srcUpdateTime":"$t"}""".stripMargin.replace("\n", "")

  private class MemSink {
    val facts = scala.collection.mutable.ArrayBuffer[String]()
    val dims = scala.collection.mutable.ArrayBuffer[String]()
    def sinks: EtlJob.Sinks = EtlJob.Sinks(
      appendFacts = b => facts.synchronized {
        facts ++= b.select("station_no").as[String].collect()
      },
      insertDims = b => dims.synchronized {
        dims ++= b.select("station_no").as[String].collect()
      },
      existingDimKeys = () => dims.synchronized { dims.toSeq }.toDF("station_no"))
  }

  test("each trigger runs one retried runOnce tick; dims stay insert-only across ticks") {
    implicit val sqlCtx = spark.sqlContext
    val tickSrc = MemoryStream[Long]
    val sink = new MemSink
    val calls = new AtomicInteger(0)
    val tickNo = new AtomicInteger(0)
    val results = scala.collection.mutable.ArrayBuffer[(Long, EtlJob.BatchResult)]()
    // every tick's FIRST fetch attempt times out; Retry recovers on the
    // second — the etl_job.py:21-23 backoff path exercised per trigger
    def fetch(): Dataset[String] = {
      if (calls.incrementAndGet() % 2 == 1)
        throw new RuntimeException("synthetic fetch timeout")
      val t = tickNo.incrementAndGet()
      // s0 repeats every tick (known dim from tick 2 on); s<t> is new.
      // The s0 record is replayed within the batch → fact dedup.
      Seq(record("s0", s"2025-12-10 15:0$t:00"),
        record("s0", s"2025-12-10 15:0$t:00"),
        record(s"s$t", s"2025-12-10 15:0$t:00")).toDS()
    }
    val q = ScheduledEtl.start(spark, () => fetch(), sink.sinks,
      interval = "0 seconds", attempts = 2, backoffMs = 1,
      ticks = Some(tickSrc.toDF()),
      checkpointDir = Some(
        java.nio.file.Files.createTempDirectory("graft-etl-ckpt").toString),
      onResult = (id, r) => results.synchronized { results += (id -> r) })
    tickSrc.addData(1L)
    q.processAllAvailable()
    tickSrc.addData(2L)
    q.processAllAvailable()
    q.stop()

    // 2 ticks × (1 failed + 1 good) fetch attempts
    assert(calls.get === 4, s"fetch calls: ${calls.get}")
    // per tick: 3 records → 2 unique facts; dims: tick 1 inserts both
    // s0 and s1, tick 2 must insert ONLY s2 (s0 already known); the
    // checkpointed batchIds (the idempotency key for replay-safe
    // sinks) arrive in order
    assert(results.synchronized { results.toSeq } ===
      Seq(0L -> EtlJob.BatchResult(2, 2), 1L -> EtlJob.BatchResult(2, 1)))
    assert(sink.dims.synchronized { sink.dims.sorted } === Seq("s0", "s1", "s2"))
    assert(sink.facts.synchronized { sink.facts.sorted } === Seq("s0", "s0", "s1", "s2"))
  }

  /** Scaffold for the restart-replay pair below: file-source ticks (a
    * MemoryStream purges committed batches, so it cannot re-serve a
    * replayed batch after restart — files can), one fixed record per
    * fetch, and a simulated crash in the documented at-least-once
    * window: offsets/0 written, the ENGINE's commits/0 removed, so the
    * restarted query must re-fire batch 0. Returns the fact sink after
    * [run tick 0 → stop → crash-window → restart → drain]. */
  private def replayScenario(
      tag: String,
      commitLog: Option[ScheduledEtl.BatchCommitLog],
      ckpt: java.nio.file.Path): MemSink = {
    val tickDir = java.nio.file.Files.createTempDirectory(s"graft-ticks-$tag")
    def addTick(n: Int): Unit =
      java.nio.file.Files.writeString(tickDir.resolve(s"t$n.txt"), s"$n\n")
    def ticks = spark.readStream.format("text").load(tickDir.toString)
    val sink = new MemSink
    def fetch(): Dataset[String] =
      Seq(record("s0", "2025-12-10 15:01:00")).toDS()
    def startQuery() = ScheduledEtl.start(spark, () => fetch(), sink.sinks,
      interval = "0 seconds", attempts = 1, backoffMs = 1,
      ticks = Some(ticks), checkpointDir = Some(ckpt.toString),
      commitLog = commitLog)

    val q1 = startQuery()
    addTick(1)
    q1.processAllAvailable()
    q1.stop()
    assert(sink.facts.synchronized(sink.facts.toSeq) === Seq("s0"), tag)

    // crash window: the engine logged the batch's offsets but died
    // before its commit marker — restart recovery re-runs batch 0.
    // Hadoop's checksummed local FS shadows every log file with a
    // .N.crc; leave it behind and the replay's commit re-add fails its
    // atomic rename (FileAlreadyExists on the crc), so a faithful
    // crash simulation removes both
    assert(java.nio.file.Files.deleteIfExists(ckpt.resolve("commits").resolve("0")),
      s"$tag: engine commit file for batch 0 expected")
    java.nio.file.Files.deleteIfExists(ckpt.resolve("commits").resolve(".0.crc"))
    val q2 = startQuery()
    q2.processAllAvailable() // drains the replayed batch 0
    q2.stop()
    sink
  }

  test("restart replay WITH the batchId commit log: the replayed tick is a no-op (exactly-once)") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-etl-ckpt-eo")
    val log = new ScheduledEtl.FileBatchCommitLog(ckpt.resolve("tick-commits"))
    val sink = replayScenario("eo", Some(log), ckpt)
    assert(log.isCommitted(0L))
    // batch 0 re-fired after restart, the adapter skipped it whole
    assert(sink.facts.synchronized(sink.facts.toSeq) === Seq("s0"),
      "replayed tick must not append twice")
  }

  test("FileBatchCommitLog: durable across instances, idempotent commit, purgeBelow retention") {
    val dir = java.nio.file.Files.createTempDirectory("graft-commitlog")
    val log = new ScheduledEtl.FileBatchCommitLog(dir)
    (0L to 5L).foreach(log.commit)
    log.commit(3L) // duplicate commit is benign
    assert((0L to 5L).forall(log.isCommitted))
    // a fresh instance over the same dir sees the same markers (the
    // restart-durability the adapter depends on)
    val reopened = new ScheduledEtl.FileBatchCommitLog(dir)
    assert(reopened.isCommitted(5L) && !reopened.isCommitted(6L))
    reopened.purgeBelow(4L)
    assert(!log.isCommitted(3L) && log.isCommitted(4L) && log.isCommitted(5L))
    // no orphan tmp files accumulate from commits
    val stream = java.nio.file.Files.newDirectoryStream(dir, "*.tmp")
    try assert(!stream.iterator().hasNext, "orphan tmp files left behind")
    finally stream.close()
  }

  test("restart replay WITHOUT a commit log duplicates the tick (the documented at-least-once baseline)") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-etl-ckpt-alo")
    val sink = replayScenario("alo", None, ckpt)
    // same scenario, no adapter: the replay re-runs runOnce and the
    // facts append duplicates — the exact gap the commit log closes
    assert(sink.facts.synchronized(sink.facts.toSeq) === Seq("s0", "s0"),
      "expected the at-least-once duplicate")
  }

  test("a tick that exhausts retries fails the query loudly, not a silent skip") {
    implicit val sqlCtx = spark.sqlContext
    val tickSrc = MemoryStream[Long]
    val sink = new MemSink
    val q = ScheduledEtl.start(spark,
      () => throw new RuntimeException("source down"),
      sink.sinks, interval = "0 seconds", attempts = 2, backoffMs = 1,
      ticks = Some(tickSrc.toDF()),
      checkpointDir = Some(
        java.nio.file.Files.createTempDirectory("graft-etl-ckpt2").toString))
    tickSrc.addData(1L)
    val e = intercept[StreamingQueryException] { q.processAllAvailable() }
    assert(e.getMessage.contains("source down") ||
      Option(e.getCause).exists(_.getMessage.contains("source down")))
    assert(sink.facts.isEmpty && sink.dims.isEmpty)
  }
}
