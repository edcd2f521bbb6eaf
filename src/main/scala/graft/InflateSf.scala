package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Staged 10× test-data inflation for the suite-wide scale probe (r8
  * verdict ask #8): BENCH_SF1 / DUCKBENCH_SF1 measure the FULL
  * like-for-like suite on both engines at 10× the bench SF, turning
  * the "Spark's fixed per-query floor amortizes at scale" argument
  * from a BenchScale extrapolation into a suite-wide measurement.
  *
  * Fact tables scale; dimension tables don't (the real-warehouse
  * shape, and what keeps the broadcast-dim queries honest):
  *  - events / documents / embeddings inflate through [[BenchScale]]'s
  *    id-uniquified, interaction-free replicators — the same fixtures
  *    every query's planted expectations key off (unique event ids,
  *    day-shifted times, replica-prefixed token spaces), so every
  *    uniqueness require (as-of time axes, dedup ids) still holds;
  *  - lineitem / orders replicate verbatim ×f (aggregate-only
  *    consumers);
  *  - region / nation / customer / supplier / part copy through 1×.
  *
  * One parquet FILE per table (matching the driver's layout — DuckDB's
  * read_parquet and the file-stream sources address files, not dirs).
  */
object InflateSf {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/tmp/sf1"
    val f = if (args.length > 2) args(2).toInt else 10
    val spark = LocalRun.session(32)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dst))

    def writeOne(df: DataFrame, table: String): Unit = {
      val dest = java.nio.file.Paths.get(s"$dst/$table.parquet")
      LocalRun.writeSingleParquet(df, dest)
      System.err.println(s"[inflate] $table: ${df.columns.length} cols -> $dest")
    }
    def raw(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    writeOne(BenchScale.inflateEvents(raw("events"), f), "events")
    writeOne(BenchScale.inflateDocuments(raw("documents"), f), "documents")
    writeOne(BenchScale.inflateEmbeddings(raw("embeddings"), f), "embeddings")
    for (t <- Seq("lineitem", "orders"))
      writeOne(
        raw(t).crossJoin(broadcast(spark.range(f).select(col("id").as("__rep"))))
          .drop("__rep"),
        t)
    for (t <- Seq("region", "nation", "customer", "supplier", "part"))
      writeOne(raw(t), t)
    spark.stop()
  }
}
