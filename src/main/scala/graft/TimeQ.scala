package graft

import org.apache.spark.sql.SparkSession

/** Scratch single-query timer for local iteration: primes the table
  * cache like Bench, then times each named query twice (cold-ish +
  * warm). Not part of any committed artifact — BENCH_* numbers come
  * from [[Bench]] with its calibration probes. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val qnames = args.drop(1)
    val spark = LocalRun.session(32)
    graft.queries.Warm.prime(spark, dir)
    for (q <- qnames) {
      val fn = SparkEntry.queries(q)
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        println(f"[timeq] $q iter$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
