package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cost decomposition for st4_stream_stream_join — the suite's most
  * expensive query (6.33 s in the r11b record) and, until this probe,
  * the only heavy one without a staged breakdown (r11 verdict gap #3).
  *
  * Four cumulative legs, each a complete AvailableNow stream over the
  * same sf0.1 sources, min-of-iters:
  *   noop        one file source, select, count-only foreachBatch —
  *               the fixed micro-batch machinery (checkpoint dir,
  *               offset/commit WAL, planning, one source's file scan);
  *   two_src     both sources UNIONED, count-only sink — adds the
  *               second independent file-stream source;
  *   join        the real watermarked stream-stream join, count-only
  *               sink — adds the state-store join (two exchanges +
  *               four state-store ops per partition);
  *   full        the registered st4 body — adds the per-batch partial
  *               aggregation, the parquet partials write, and the
  *               final batch re-aggregation read.
  *
  * Per-trigger `durationMs` phases (triggerExecution / queryPlanning /
  * addBatch / walCommit / ...) and state-operator rows/memory for the
  * join leg are dumped alongside, from StreamingQueryProgress — the
  * phase split is the ground truth the leg deltas are read against.
  *
  * Measured record (r12, sf0.1, local[32], quiet host, min of 5):
  * noop 0.52 s | two_src 0.66 s | join 5.32 s | full 6.11 s — the
  * bench-observed ~6 s is the JOIN, not the sources or the sink.
  * Per-trigger split of the join leg (durationMs): the DATA batch
  * costs 4.0 s = 2.5 s addBatch (buffering 101,205 rows — the whole
  * fact side plus readings — into the four per-partition join state
  * stores; AvailableNow reads each file source in ONE batch, so the
  * watermark can evict nothing until the batch after) + 1.4 s
  * incremental queryPlanning (paid once per stream START — every
  * bench iteration starts a fresh stream, a steady-state production
  * query pays it once, not per trigger); then the trailing EMPTY
  * commit batch costs another 2.4 s (addBatch 2.2 s — the watermark
  * advance scans and evicts the 101k buffered state rows, 24 MB,
  * across 32 partitions × 4 stores). The partial-agg parquet write +
  * final re-agg add 0.8 s (full − join); fixed machinery (WAL,
  * offsets, file listing) is the 0.5 s noop floor. Conclusion: no
  * hidden inefficiency — the cost IS stream-stream join state-store
  * churn, which at 100 TB is exactly the bounded-state design (state
  * = rows per watermark horizon, amortized across triggers instead of
  * concentrated in one bounded replay); the restatement "join then
  * aggregate in batch" avoids it only by not being a stream.
  * Artifact: probe_st4.json.
  */
object ProbeSt4 {

  private def timeIt[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime()
    val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  private def runStream(df: DataFrame,
                        sink: (DataFrame, Long) => Unit,
                        collectProgress: Boolean = false)
      : Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] = {
    val stage = java.nio.file.Files.createTempDirectory("graft_probe_st4_")
    val q = df.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", stage.resolve("ckpt").toString)
      .foreachBatch { (b: DataFrame, id: Long) => sink(b, id); () }
      .start()
    q.awaitTermination()
    val prog = if (collectProgress) q.recentProgress.toSeq else Nil
    LocalRun.deleteRecursively(stage)
    prog
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = args.headOption.map(_.toInt).getOrElse(5)
    val out = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "probe_st4.json")
    val spark = LocalRun.session(32, 32)

    def events() = graft.queries.IngestQueries.eventsStream(spark, sfDir)
    def readings() = graft.queries.IngestQueries.readingsStream(spark, sfDir)

    def legNoop(): Unit =
      runStream(events().select("station_no"),
        (b, _) => { b.count(); () })

    def legTwoSrc(): Unit = {
      val l = events().select(col("record_time").as("t"))
      val r = readings().select(col("obs_time").as("t"))
      runStream(l.union(r), (b, _) => { b.count(); () })
      ()
    }

    def legJoin(collect: Boolean) = {
      val joined = graft.streaming.MicroBatchIngest
        .hourlyStreamJoin(events(), readings())
        .select(col("hour_window.start").as("hour_start"),
          col("bikes_available"), col("temperature"))
      runStream(joined, (b, _) => { b.count(); () }, collectProgress = collect)
    }

    def legFull(): Unit = {
      val joined = graft.streaming.MicroBatchIngest
        .hourlyStreamJoin(events(), readings())
        .select(col("hour_window.start").as("hour_start"),
          col("bikes_available"), col("temperature"))
      val stage = java.nio.file.Files.createTempDirectory("graft_probe_st4_full_")
      val outDir = stage.resolve("partials").toString
      runStream(joined, (b, _) => {
        b.groupBy("hour_start")
          .agg(count(lit(1)).as("n"),
            sum("bikes_available").as("sum_bikes"),
            sum("temperature").as("sum_temp"))
          .write.mode("append").parquet(outDir)
        ()
      })
      spark.read.parquet(outDir)
        .groupBy("hour_start")
        .agg(sum("n").as("n_pairs"),
          (sum("sum_bikes") / sum("n")).as("avg_bikes"),
          (sum("sum_temp") / sum("n")).as("avg_temp"))
        .count()
      LocalRun.deleteRecursively(stage)
    }

    def minOf(name: String, f: () => Unit): (Double, Seq[Double]) = {
      val ts = (1 to iters).map { i =>
        val (t, _) = timeIt(f())
        System.err.println(f"[probe_st4] $name iter $i: $t%.3f s")
        t
      }
      (ts.min, ts)
    }

    // warm the session (codegen, parquet footer caches) exactly as a
    // bench run would before its timed iterations
    legNoop()

    val (noopMin, noopAll) = minOf("noop", () => legNoop())
    val (twoMin, twoAll) = minOf("two_src", () => legTwoSrc())
    val (joinMin, joinAll) = minOf("join", () => { legJoin(collect = false); () })
    val (fullMin, fullAll) = minOf("full", () => legFull())

    // one extra join run for the per-trigger phase split
    val prog = legJoin(collect = true)
    val phases = prog.map { p =>
      val dur = p.durationMs
      val keys = dur.keySet().toArray(Array.empty[String]).toSeq.sorted
      val ds = keys.map(k => s""""$k":${dur.get(k)}""").mkString(",")
      val st = p.stateOperators.toSeq.map(s =>
        s"""{"rowsTotal":${s.numRowsTotal},"rowsUpdated":${s.numRowsUpdated},""" +
          s""""memUsedBytes":${s.memoryUsedBytes}}""").mkString(",")
      s"""{"batchId":${p.batchId},"inputRows":${p.numInputRows},""" +
        s""""durationMs":{$ds},"stateOperators":[$st]}"""
    }.mkString(",")

    def arr(xs: Seq[Double]) = xs.map(t => f"$t%.3f").mkString("[", ",", "]")
    val json =
      f"""{"probe":"st4_decomposition","sf_dir":"$sfDir","iters":$iters,
         |"legs_min_s":{"noop":$noopMin%.3f,"two_src":$twoMin%.3f,"join":$joinMin%.3f,"full":$fullMin%.3f},
         |"legs_all_s":{"noop":${arr(noopAll)},"two_src":${arr(twoAll)},"join":${arr(joinAll)},"full":${arr(fullAll)}},
         |"join_triggers":[$phases]}""".stripMargin.replace("\n", "")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
