package graft.queries

import graft.SparkSpec

/** st18's planted incremental-grouping cases, asserted structurally
  * (the full label table is hash-checked against the recursive-CTE
  * closure by the driver oracle; this spec pins the HARD cases by
  * name): a batch-1 attach, the batch-2 chain that exists ONLY if
  * batch 1's relabel delta landed (the state-grew proof), a
  * batch-1-born component merged into an existing one by batch 2, an
  * isolated new component keeping its own min root, and a base-corpus
  * merge pulling a neighbor component under the smaller root. */
class DupGroupStreamSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("st18 incremental dup groups: attach, chain-through-new, merge, " +
    "and isolated-component roots all land as batch dd7 would label them") {
    import spark.implicits._
    val out = graft.SparkEntry.queries("st18_stream_dup_groups")(spark, sfDir)
      .select("doc", "group_id").as[(Long, Long)].collect().toMap
    // Base components may already be LSH-linked to other docs (the
    // corpus plants genuine near-dups), so assert MEMBERSHIP relative
    // to the base doc's label, not absolute roots.
    // batch-1 attach: new node 7000000 joins doc 0's component
    assert(out(7000000L) == out(0L), s"attach: ${out.get(7000000L)} vs ${out.get(0L)}")
    // batch-2 chain THROUGH batch 1's node — labels grew between triggers
    assert(out(9000000L) == out(0L), s"chain: ${out.get(9000000L)}")
    // batch-1-born isolated component (8000000, 8500000) merged into
    // doc 0's component by batch 2's (8000000, 0) pair
    assert(out(8000000L) == out(0L) && out(8500000L) == out(0L),
      s"merge-into-existing: ${out.get(8000000L)}, ${out.get(8500000L)}")
    // doc 250's isolated pair has no path to the base corpus (no %500
    // merge) so its root IS its min planted id, extended by batch 2's
    // (8500250, 9500250)
    assert(out(8000250L) == 8000250L && out(8500250L) == 8000250L &&
      out(9500250L) == 8000250L,
      s"isolated: ${out.get(8000250L)}, ${out.get(8500250L)}, ${out.get(9500250L)}")
    // base merge (400, 450) pulls 450's mutation component together
    // with 400's
    assert(out(450L) == out(400L) && out(1000450L) == out(400L),
      s"base merge: ${out.get(400L)}, ${out.get(450L)}, ${out.get(1000450L)}")
    assert(out(7000400L) == out(400L) && out(9000400L) == out(400L),
      "attach+chain on the 400 component")
    // and every group's label is its min member (dd7's canonical rule)
    val byGroup = out.toSeq.groupBy(_._2)
    byGroup.foreach { case (g, ms) =>
      assert(ms.map(_._1).min == g, s"group $g min is ${ms.map(_._1).min}") }
  }
}
