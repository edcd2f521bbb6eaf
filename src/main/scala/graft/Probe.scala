package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: `runMain graft.Probe <query> [iters]` — prints
  * plan-build time, per-iteration execution time, and the formatted
  * physical plan for one named query. Not part of the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = LocalRun.session(cpus.toInt)
    if (sys.env.getOrElse("SPARK_GRAFT_PRIME", "1") == "1") Tables.prime(spark, sfDir)
    val fn = SparkEntry.queries(name)

    val tb0 = System.nanoTime()
    val df = fn(spark, sfDir)
    println(f"[probe] plan build: ${(System.nanoTime() - tb0) / 1e9}%.3f s")
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      // same methodology as Bench: execute the query's OWN plan, every
      // output column evaluated (count() would let Catalyst prune)
      val n = fn(spark, sfDir).queryExecution.toRdd.count()
      println(f"[probe] iter $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
