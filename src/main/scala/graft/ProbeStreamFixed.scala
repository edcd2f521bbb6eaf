package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-cost decomposition of the streaming suite's COMMON machinery
  * (r12 verdict ask #5): fourteen real micro-batch streams cost ~36 s
  * per bench run and creep round over round; probe_st4.json decomposed
  * ONE stream — this probe prices the machinery every stream pays
  * regardless of its operator, so the ~36 s can be split into
  * per-stream fixed cost × 14 versus real state/operator work.
  *
  * Legs, each a complete AvailableNow stream, min-of-iters:
  *   noop          one file source (the sf events parquet, a single
  *                 file → a single data trigger + the trailing commit
  *                 batch), select one column, count-only foreachBatch —
  *                 the per-stream floor: checkpoint-dir create, offset/
  *                 commit WAL, file listing, incremental planning, one
  *                 scan;
  *   memsink       the same body through the memory sink the st
  *                 queries actually use (runToMemory) — prices the
  *                 sink choice;
  *   trig1 / trig4 the same source staged as 8 files and admitted in
  *                 ONE vs FOUR batches (maxFilesPerTrigger) — their
  *                 difference / 3 is the marginal cost of one extra
  *                 STATELESS trigger (offset WAL + commit WAL +
  *                 planning + scheduling);
  *   state1/state4 trig1/trig4 with st1's watermarked
  *                 dropDuplicatesWithinWatermark on top — one
  *                 state-store op × 32 partitions; the marginal
  *                 per-trigger delta now includes the state-store
  *                 open/snapshot/commit cycle, and (state1 − trig1) is
  *                 the one-trigger state machinery premium.
  *
  * Per-trigger StreamingQueryProgress durationMs phases (walCommit,
  * commitOffsets, latestOffset, getBatch, queryPlanning, addBatch,
  * triggerExecution) and stateOperators custom timings (commitTimeMs,
  * allUpdatesTimeMs, allRemovalsTimeMs) are dumped for the multi-
  * trigger legs — the phase split the leg deltas are read against.
  *
  * Measured record (r13, sf0.1, local[32], quiet host, min of 5) —
  * probe_stream_fixed.json; BASELINE.md "Streaming suite fixed cost":
  * noop floor 0.47 s/stream; memory sink +0.08 s; marginal stateless
  * trigger 0.22 s (WAL commits ~70 ms, rest scheduling); the ONE
  * watermarked dedup op adds 1.28 s on its first trigger and 0.38 s
  * per subsequent trigger — and the per-trigger stateOperators
  * timings show why: commitTimeMs sums ~9 s of CPU per trigger across
  * the 32 HDFSBacked stores even with ~130 state rows total, i.e. the
  * cost is per-store delta-file IO, data-independent at fixture
  * state sizes. The state1_p8/state4_p8 legs size state partitions to
  * the state (8) instead of the core count: premium 1.28 → 0.61 s,
  * stateful marginal 0.38 → 0.24 s — the measured worth of the
  * partition-sizing lever.
  *
  * The state1_rdb/state4_rdb legs swap in the RocksDB provider
  * (production's large-state backend): at fixture state sizes it is a
  * WASH — first-trigger premium 1.40 s (vs HDFSBacked's 1.19), marginal
  * stateful trigger 0.51 s (vs 0.65). RocksDB pays more to open 32
  * instances and slightly less per commit (changelog instead of full
  * delta snapshot); its real advantage — commit cost independent of
  * ACCUMULATED state size — cannot show on ~130 state rows, so the
  * suite keeps the default backend and this leg records why.
  *
  * Conclusion (the r12 ask #5 adjudication): ~14 streams × 0.47 s
  * floor ≈ 6.6 s of the ~36 s streaming bench cost is per-stream
  * start machinery (production pays it once per deploy, the bench per
  * run); most of the rest is per-trigger state-store commit cycles ×
  * the suite's 2-4 triggers/stream, which production DOES pay every
  * trigger — so no harness change is made: a shared warm-stream
  * harness would hide real start cost, and sizing state partitions
  * down to fixture state would tune to the fixture (at 100 TB the
  * partition count must be high; the lever's value is recorded here
  * so the trade is priced, not re-litigated).
  */
object ProbeStreamFixed {

  private def runStream(df: DataFrame,
                        collectProgress: Boolean = false,
                        memorySink: Boolean = false)
      : Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] = {
    val stage = java.nio.file.Files.createTempDirectory("graft_probe_stfix_")
    val base = df.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", stage.resolve("ckpt").toString)
    val q =
      if (memorySink) {
        val name = "stfix_" + java.util.UUID.randomUUID().toString.replace("-", "")
        base.format("memory").queryName(name).outputMode("append").start()
      } else
        base.foreachBatch { (b: DataFrame, _: Long) => b.count(); () }.start()
    q.awaitTermination()
    val prog = if (collectProgress) q.recentProgress.toSeq else Nil
    if (memorySink) df.sparkSession.catalog.dropTempView(q.name)
    LocalRun.deleteRecursively(stage)
    prog
  }

  private def timeS(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = args.headOption.map(_.toInt).getOrElse(5)
    val out = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "probe_stream_fixed.json")
    val spark = LocalRun.session(32, 32)

    // Stage the events table as 8 parquet files so maxFilesPerTrigger
    // can admit it in 1 vs 4 batches — the sf file is a single parquet,
    // which always arrives as one data trigger.
    val staged = java.nio.file.Files.createTempDirectory("graft_probe_stfix_src_")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    events.repartition(8).write.mode("overwrite").parquet(staged.toString)
    val schema = events.schema
    def stagedStream() = spark.readStream.schema(schema).parquet(staged.toString)
    def stagedN(filesPerTrigger: Int) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger).parquet(staged.toString)

    def dedupBody(src: DataFrame): DataFrame = src
      .select(col("event_id"),
        (if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
           timestamp_micros(expr("ts div 1000"))
         else col("ts")).as("t"),
        col("user_id"))
      .withWatermark("t", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

    def legNoop(): Unit =
      runStream(spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
        .select("event_id"))
    def legMemsink(): Unit =
      runStream(spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sfDir)
        .select("event_id"), memorySink = true)
    def legTrig1(): Unit = runStream(stagedStream().select("event_id"))
    def legTrig4(collect: Boolean) =
      runStream(stagedN(2).select("event_id"), collectProgress = collect)
    def legState1(): Unit = runStream(dedupBody(stagedStream()))
    def legState4(collect: Boolean) =
      runStream(dedupBody(stagedN(2)), collectProgress = collect)
    // state partitions = shuffle.partitions at FIRST checkpoint write;
    // these legs size them to the state (8) instead of the core count
    // (32) — isolating how much of the state premium is per-store fixed
    // cost (delta-file IO per partition per trigger) rather than data
    def withShufflePartitions[A](n: Int)(f: => A): A = {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, n.toString)
      try f finally spark.conf.set(key, prev)
    }
    def legState1P8(): Unit =
      withShufflePartitions(8) { runStream(dedupBody(stagedStream())) }
    def legState4P8(collect: Boolean) =
      withShufflePartitions(8) { runStream(dedupBody(stagedN(2)), collectProgress = collect) }
    // RocksDB provider legs: the state-store backend production clusters
    // run for large state (no per-commit full-snapshot cost, changelog
    // checkpointing). If the HDFSBacked per-store delta-file IO is the
    // premium, these legs measure what the backend swap buys at the
    // SAME 32 partitions.
    def withStateProvider[A](cls: String)(f: => A): A = {
      val key = "spark.sql.streaming.stateStore.providerClass"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, cls)
      try f finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    val RocksCls =
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    def legState1Rdb(): Unit =
      withStateProvider(RocksCls) { runStream(dedupBody(stagedStream())) }
    def legState4Rdb(collect: Boolean) =
      withStateProvider(RocksCls) { runStream(dedupBody(stagedN(2)), collectProgress = collect) }

    // one discarded cold pass: first stream in the JVM pays codegen +
    // scheduler warm-up that no per-stream accounting should include
    legNoop()

    val legs = Seq[(String, Boolean => Seq[org.apache.spark.sql.streaming.StreamingQueryProgress])](
      ("noop", _ => { legNoop(); Nil }),
      ("memsink", _ => { legMemsink(); Nil }),
      ("trig1", _ => { legTrig1(); Nil }),
      ("trig4", c => legTrig4(c)),
      ("state1", _ => { legState1(); Nil }),
      ("state4", c => legState4(c)),
      ("state1_p8", _ => { legState1P8(); Nil }),
      ("state4_p8", c => legState4P8(c)),
      ("state1_rdb", _ => { legState1Rdb(); Nil }),
      ("state4_rdb", c => legState4Rdb(c)))

    val all = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val progress = scala.collection.mutable.LinkedHashMap[String, Seq[String]]()
    for ((name, leg) <- legs) {
      val ts = (0 until iters).map { i =>
        val collect = i == iters - 1
        var prog: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] = Nil
        val s = timeS { prog = leg(collect) }
        if (collect && prog.nonEmpty)
          progress(name) = prog.map { p =>
            val dur = p.durationMs
            val keys = Seq("triggerExecution", "queryPlanning", "addBatch",
              "getBatch", "latestOffset", "walCommit", "commitOffsets")
            val durJson = keys.flatMap(k => Option(dur.get(k))
              .map(v => s""""$k":$v""")).mkString(",")
            val stateJson = p.stateOperators.map { so =>
              val cm = so.customMetrics
              def m(k: String): Long = Option(cm.get(k)).map(_.longValue).getOrElse(-1L)
              s"""{"rowsTotal":${so.numRowsTotal},"rowsUpdated":${so.numRowsUpdated},""" +
                s""""commitTimeMs":${so.commitTimeMs},"allUpdatesTimeMs":${so.allUpdatesTimeMs},""" +
                s""""allRemovalsTimeMs":${so.allRemovalsTimeMs},""" +
                s""""memUsedBytes":${m("stateOnCurrentVersionSizeBytes")}}"""
            }.mkString("[", ",", "]")
            s"""{"batchId":${p.batchId},"inputRows":${p.numInputRows},""" +
              s""""durationMs":{$durJson},"stateOperators":$stateJson}"""
          }
        System.err.println(f"[probe] $name%-8s iter $i: $s%6.3f s")
        s
      }
      all(name) = ts
    }

    LocalRun.deleteRecursively(staged)

    def fmt(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val mins = all.map { case (k, v) => k -> v.min }
    // derived split: marginal stateless trigger, marginal stateful
    // trigger, one-trigger state premium — the numbers BASELINE.md cites
    val derived = Seq(
      "stateless_trigger_marginal_s" -> (mins("trig4") - mins("trig1")) / 3.0,
      "stateful_trigger_marginal_s" -> (mins("state4") - mins("state1")) / 3.0,
      "state_machinery_premium_s" -> (mins("state1") - mins("trig1")),
      "state_premium_p8_s" -> (mins("state1_p8") - mins("trig1")),
      "stateful_trigger_marginal_p8_s" -> (mins("state4_p8") - mins("state1_p8")) / 3.0,
      "state_premium_rdb_s" -> (mins("state1_rdb") - mins("trig1")),
      "stateful_trigger_marginal_rdb_s" -> (mins("state4_rdb") - mins("state1_rdb")) / 3.0,
      "memsink_premium_s" -> (mins("memsink") - mins("noop")))
      .map { case (k, v) => s""""$k":${fmt(v)}""" }.mkString(",")
    val legsMin = mins.map { case (k, v) => s""""$k":${fmt(v)}""" }.mkString(",")
    val legsAll = all.map { case (k, v) =>
      s""""$k":${v.map(fmt).mkString("[", ",", "]")}"""
    }.mkString(",")
    val progJson = progress.map { case (k, v) =>
      s""""$k":${v.mkString("[", ",", "]")}"""
    }.mkString(",")
    val json = s"""{"probe":"stream_fixed_cost","sf_dir":"$sfDir","iters":$iters,""" +
      s""""legs_min_s":{$legsMin},"derived":{$derived},""" +
      s""""legs_all_s":{$legsAll},"triggers":{$progJson}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out), json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
