package graft.queries

import graft.SparkSpec

/** The per-session cached-frame memo must not retain dead sessions'
  * corpus-sized frames (r8 ADVICE: the WeakHashMap attempt could never
  * collect because each DataFrame value strongly references its
  * SparkSession key — the exact pathology the WeakHashMap javadoc warns
  * about). The fix is eager purge-on-access of stopped sessions'
  * entries; stopping a real extra session would stop the suite's shared
  * SparkContext, so the purge predicate is injected here. */
class FrameMemoSpec extends SparkSpec {

  test("purgeStoppedSessions drops exactly the stopped sessions' entries") {
    val s2 = spark.newSession()
    // dd10/dd11/llm2-style access through both sessions populates the memo
    // (other suites sharing this JVM may have contributed further session
    // keys — all assertions below are relative or post-drain)
    val sf = "/root/testdata/sf0.001"
    LlmQueries.semanticDupsFrame(spark, sf)
    LlmQueries.semanticDupsFrame(s2, sf)
    val n0 = LlmQueries.frameMemoSessionCount
    assert(n0 >= 2)
    // cycle: s2 "stops" — the next purge must drop only its entries
    LlmQueries.purgeStoppedSessions(isStopped = _ eq s2)
    assert(LlmQueries.frameMemoSessionCount === n0 - 1)
    // and an all-dead JVM drains to empty (no per-dead-session leak)
    LlmQueries.purgeStoppedSessions(isStopped = _ => true)
    assert(LlmQueries.frameMemoSessionCount === 0)
    // live path still works after a purge
    LlmQueries.semanticDupsFrame(spark, sf)
    assert(LlmQueries.frameMemoSessionCount === 1)
  }
}
