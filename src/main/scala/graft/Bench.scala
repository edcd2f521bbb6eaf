package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * Methodology (VERDICT r1 requirements): shared base-table subtrees are
  * cached once ([[Tables.prime]]), each query gets one warm-up execution
  * (JIT + codegen + cache materialization) and `SPARK_GRAFT_BENCH_ITERS`
  * measured executions (default 2) of which the minimum is reported —
  * steady-state cost, not first-run compilation. Failures are recorded
  * in an `errors` field and count as +1000 s, never as a fast success.
  * Set `SPARK_GRAFT_EXPLAIN_DIR` to also dump `explain("formatted")`
  * per query.
  */
object Bench {
  /** Queries that fit an ML model or drive a full streaming pipeline
    * (single bench run, see below). */
  val FitQueries: Set[String] = Set(
    "x10_ols_ladder", "x11_kmeans_j6", "x15_scoring", "st1_stream_watermark_dedup")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Tables.prime(spark, sfDir)
    queries.Warm.prime(spark, sfDir)

    val explainDir = sys.env.get("SPARK_GRAFT_EXPLAIN_DIR")
    explainDir.foreach(d => new java.io.File(d).mkdirs())

    val names = SparkEntry.queries.keys.toSeq.sorted
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // ML model fits + the streaming pipeline: their cost is iterative
      // numeric work / a real micro-batch run, not codegen warm-up, and
      // repeating an identical fit 4x measures nothing new — single
      // run. (Other queries get warm-up + min-of-N.)
      val isFit = Bench.FitQueries(name)
      val sec =
        try {
          explainDir.foreach { d =>
            val plan = fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(Paths.get(s"$d/$name.txt"), plan)
          }
          if (isFit) once()
          else {
            once() // warm-up: codegen + JIT + cache fill
            Seq.fill(math.max(1, iters))(once()).min
          }
        } catch {
          case e: Throwable =>
            errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(300)
            1000.0
        }
      System.err.println(f"[bench] $name%-28s $sec%8.2f s")
      name -> sec
    }

    def js(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => s"${js(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${js(k)}:${js(v)}" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":${js(sfDir)},"iters":$iters,"errors":$errJson}""")
    spark.stop()
  }
}
