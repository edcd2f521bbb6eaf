package graft.queries

import graft.SparkSpec

/** llm8's planted end-to-end evidence at sf0.001, one assertion per
  * composed stage (the full per-doc record is hash-checked against
  * the chain-replaying DuckDB oracle by the driver; this spec pins
  * the cross-batch state dependencies by name). Doc lengths at this
  * sf: 0→23, 250→36, 300→79, 450→42 words — which decides who
  * survives the ≥30-word Gopher gate after trimming. */
class CurationStreamSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("llm8 streaming curation: dedup trims, quality gates the cleaned " +
    "text, the index grows with survivors only, and batch 2 sees all " +
    "three kinds of batch-1 state") {
    import spark.implicits._
    val rows = graft.SparkEntry.queries("llm8_stream_curation")(spark, sfDir)
      .select("doc_id", "n_tokens", "n_removed_tokens", "dedup_kept",
        "quality_kept", "kept", "n_match_existing", "n_match_new")
      .as[(Long, Long, Long, Boolean, Boolean, Boolean, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // batch 1 trim arm: head trimmed against the corpus (12 tokens),
    // long doc survives quality and matches its own base vector
    val t300 = rows(1000300L)
    assert(t300._4 && t300._5 && t300._6 && t300._3 == 12 && t300._7 >= 1,
      s"b1 trim survivor: $t300")
    // batch 1 killed arm: full corpus replay — everything covered
    val k0 = rows(1300000L)
    assert(!k0._4 && k0._2 == k0._3, s"b1 dup-killed: $k0")
    // batch 1 short-tail arm: dedup leaves 5 words, quality drops them
    val s0 = rows(1600000L)
    assert(s0._4 && !s0._5 && s0._2 - s0._3 == 5, s"b1 short-tail: $s0")
    // batch 2 cross-trim arm: its dup grams exist ONLY in batch 1's
    // table advance — removed down to the 12 nw_ words, quality-dropped
    val x300 = rows(2000300L)
    assert(x300._4 && !x300._5 && x300._3 > 0 && x300._2 - x300._3 == 12,
      s"b2 cross-trim: $x300")
    // batch 2 prober whose batch-1 twin SURVIVED: matches base AND the
    // appended vector — the index-GREW proof
    val p300 = rows(2300300L)
    assert(p300._6 && p300._7 >= 2, s"b2 grown-index prober: $p300")
    // batch 2 prober whose batch-1 twin was quality-DROPPED (doc 0's
    // trim left 19 < 30 words): only the base match — the appends are
    // survivor-gated
    val p0 = rows(2300000L)
    assert(p0._6 && p0._7 == 1, s"b2 gated prober: $p0")
    // the twin pair (src 0 shared by prober + twin arms): new-vs-new
    assert(p0._8 >= 1 && rows(2600000L)._8 >= 1,
      s"new-vs-new twins: $p0, ${rows(2600000L)}")
  }
}
