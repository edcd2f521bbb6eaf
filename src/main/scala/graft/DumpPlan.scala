package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Per-query plan dump for bench_explain/ WITHOUT a full bench run:
  * `runMain graft.DumpPlan <sfDir> <outDir> <query...>` writes each
  * named query's `explain("formatted")` to `<outDir>/<name>.txt`,
  * priming the table cache exactly like [[Bench]] so the plan matches
  * the committed one (InMemoryTableScan leaves, not raw file scans).
  * Used when a new batch query lands mid-round; fit/stream queries go
  * through [[ExplainFit]] instead (building their DataFrame runs the
  * fit), and a full Bench run with `SPARK_GRAFT_EXPLAIN_DIR` still
  * refreshes everything at round close. */
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val names = args.drop(2)
    new java.io.File(outDir).mkdirs()
    val spark = LocalRun.session(32)
    queries.Warm.prime(spark, sfDir)
    for (name <- names) {
      val plan = SparkEntry.queries(name)(spark, sfDir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
      System.err.println(s"[dumpplan] wrote $outDir/$name.txt")
    }
    spark.stop()
  }
}
