package graft

/** The driver-contract surfaces run under a FOREIGN SparkSession (the
  * driver's smoke check builds its own, with stock confs — none of the
  * pins our mains set). This round's testdata regeneration proved the
  * hazard class is real: stock Spark 4 infers the generator's
  * `isAdjustedToUTC=false` timestamps as TIMESTAMP_NTZ, which the
  * streaming layer rejects. Tables.ensureReadConfs guards that at every
  * read entry point; this spec pins the guard from a session that
  * deliberately carries the stock (adverse) conf values. */
class ForeignSessionSpec extends SparkSpec {

  test("entry() produces rows from a session with stock timestamp confs") {
    val foreign = spark.newSession()
    // simulate the driver's defaults, not our mains' pins
    foreign.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    foreign.conf.set("spark.sql.session.timeZone", "UTC")
    val out = SparkEntry.entry(foreign)
    assert(out.count() > 0)
  }

  test("a streaming query type-checks and runs from a stock-conf session") {
    val foreign = spark.newSession()
    foreign.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    foreign.conf.set("spark.sql.session.timeZone", "UTC")
    // st1 is the watermark-sensitive path: NTZ event time would throw
    // EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE at analysis
    val out = SparkEntry.queries("st1_stream_watermark_dedup")(
      foreign, "/root/testdata/sf0.001")
    assert(out.count() > 0)
  }

  test("fit-bearing r7 queries run from a stock-conf session (memoized " +
    "fits must not capture the wrong session)") {
    val foreign = spark.newSession()
    foreign.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    foreign.conf.set("spark.sql.session.timeZone", "UTC")
    // tx14 fits IRLS during plan construction, tx11 learns BPE merges,
    // dd10 fits cells — each through a per-dir memo that must work
    // when FIRST touched from a foreign session
    for (q <- Seq("tx14_quality_classifier", "tx11_bpe_tokenize",
        "dd10_semantic_dedup", "tx15_chunk_overlap")) {
      val out = SparkEntry.queries(q)(foreign, "/root/testdata/sf0.001")
      assert(out.count() > 0, q)
    }
  }

  test("r8 queries run from a stock-conf session: the as-of paths " +
    "(collect-at-build broadcast axis), the kernel expressions, the " +
    "stream-stream join, and the serving stream") {
    val foreign = spark.newSession()
    foreign.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    foreign.conf.set("spark.sql.session.timeZone", "UTC")
    // j9 collects its time axis during plan construction (timestamps —
    // the NTZ hazard's exact surface); st4/st5 run real streams; tx16
    // and mm7 exercise the new kernels and the codec seam
    for (q <- Seq("j9_asof_global", "tx16_substring_dedup",
        "mm7_audio_features", "st4_stream_stream_join",
        "st5_stream_scoring")) {
      val out = SparkEntry.queries(q)(foreign, "/root/testdata/sf0.001")
      assert(out.count() > 0, q)
    }
  }
}
