package graft

import org.apache.spark.sql.functions._

/** Microbench: SortedOverlapCount throughput on synthetic rows shaped
  * like dd_prefix's collision stream (two ~45-element sorted long
  * arrays per row), isolated from the join. Diagnostic main. */
object ProbeKernel {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(350000000L)
    val spark = LocalRun.session(32, 32)
    val df = spark.range(n)
      .withColumn("g_a", sort_array(transform(sequence(lit(1), lit(45)),
        i => xxhash64(col("id") + i.cast("long")))))
      .withColumn("g_b", sort_array(transform(sequence(lit(1), lit(45)),
        i => xxhash64(col("id") + i.cast("long") + 7L))))
    def t(name: String)(a: => Long): Unit = {
      val t0 = System.nanoTime()
      val v = a
      System.err.println(f"[kernel] $name%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s  v=$v%d")
    }
    t("baseline")(df.agg(count(lit(1)), sum(size(col("g_a")))).head().getLong(0))
    t("kernel1")(df.agg(sum(
      graft.functions.ArrayKernels.sortedOverlapCount(col("g_a"), col("g_b"))))
      .head().getLong(0))
    val c = graft.functions.ArrayKernels.sortedOverlapCount(col("g_a"), col("g_b"))
    t("kernel2_div")(df
      .filter(c.cast("double") / (lit(90L) - c) >= 0.6)
      .agg(count(lit(1))).head().getLong(0))
    spark.stop()
  }
}
