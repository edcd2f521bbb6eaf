package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** st18 cost decomposition (r18 — the r17 verdict's ask #3): the
  * suite's most expensive query is a median-of-3 FULL REBUILD of
  *   base dd7 connected-components + base label-store write
  *   + a two-trigger pair stream whose each batch runs two pruned
  *     label-store probes, a contracted CC, and a two-layout delta
  *     write.
  * This probe prices the three layers separately, with the per-leg
  * Spark JOB COUNT alongside the seconds — at fixture scale the
  * hypothesis is that cost ≈ jobs × per-job scheduling floor, not
  * data.
  *
  * Legs (each leg min-of-`iters`, memos reset per iteration):
  *   base_cc     CC over the verified pair graph, materialized
  *   base_write  base_cc + writeLabelDirs (both bucketed layouts)
  *   scaffold    the same staged two-day arrival stream with a
  *               count-only foreachBatch — the stream machinery floor
  *   full        grownDupLabelsDir end to end (what the bench pays
  *               per rebuild, minus the final resolve+window)
  *
  * `full − base_write − (scaffold − its source staging)` ≈ the two
  * batch bodies (probes + contracted CC + delta writes).
  */
object ProbeSt18 {
  def main(args: Array[String]): Unit = {
    val iters = if (args.length > 0) args(0).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalRun.session(cpus.toInt)
    Tables.prime(spark, sfDir)

    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    })

    def leg(name: String)(body: => Unit): Unit = {
      val secs = (1 to iters).map { _ =>
        val j0 = jobs.get()
        val t0 = System.nanoTime()
        body
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[probe_st18] $name%-10s ${dt}%.3f s  jobs=${jobs.get() - j0}")
        dt
      }
      println(f"[probe_st18] $name%-10s min=${secs.min}%.3f s")
    }

    // warm the shared verified-pairs cache once so every leg sees the
    // steady state the bench sees (Bench's fitmed3 resets the st18
    // memo, not the pair cache)
    queries.LlmQueries.verifiedPairsShared(spark, sfDir).count()

    leg("base_cc") {
      graft.llm.Dedup.releaseCheckpoint(
        graft.llm.Dedup.connectedComponents(
          queries.LlmQueries.verifiedPairsShared(spark, sfDir)
            .select("doc_a", "doc_b"), "doc_a", "doc_b")
          .localCheckpoint(true))
    }

    leg("base_write") {
      val stage = java.nio.file.Files.createTempDirectory("probe_st18_w_")
      try queries.LlmQueries.writeLabelDirs(spark,
        graft.llm.Dedup.connectedComponents(
          queries.LlmQueries.verifiedPairsShared(spark, sfDir)
            .select("doc_a", "doc_b"), "doc_a", "doc_b"),
        stage.resolve("labels"), "base")
      finally LocalRun.deleteRecursively(stage)
    }

    leg("scaffold") {
      val stage = java.nio.file.Files.createTempDirectory("probe_st18_s_")
      try {
        val docs = Tables.documents(spark, sfDir)
        val day = docs.filter(col("doc_id") % 100 === 0)
          .select(col("doc_id").cast("long").as("doc_a"),
            (col("doc_id") + 1L).as("doc_b"))
        val inDir = stage.resolve("in")
        java.nio.file.Files.createDirectories(inDir)
        Seq(0, 1).foreach { i =>
          LocalRun.writeSingleParquet(day, inDir.resolve(s"day$i.parquet"))
        }
        val schema = new org.apache.spark.sql.types.StructType()
          .add("doc_a", org.apache.spark.sql.types.LongType)
          .add("doc_b", org.apache.spark.sql.types.LongType)
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
          .writeStream
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .option("checkpointLocation", stage.resolve("ckpt").toString)
          .foreachBatch { (b: DataFrame, _: Long) => b.count(); () }
          .start()
        q.awaitTermination()
      } finally LocalRun.deleteRecursively(stage)
    }

    leg("full") {
      queries.LlmQueries.resetDupGroupsMemo()
      queries.LlmQueries.grownDupLabelsDir(spark, sfDir)
      ()
    }

    spark.stop()
  }
}
