package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salting correctness: salted plans must produce exactly the plain
  * plan's results, just spread over more reducers. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key — the canonical skew shape
  private def skewed = (1 to 1000).map { i =>
    (if (i <= 900) "hot" else s"k${i % 17}", i.toLong, i * 1.5)
  }.toDF("key", "row_id", "v")

  private def dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"), ("k5", "C"))
    .toDF("key", "attr")

  test("saltedJoin returns exactly the plain equi-join result") {
    val plain = skewed.join(dim, Seq("key"))
      .select("key", "row_id", "v", "attr")
    val salted = Skew.saltedJoin(skewed, dim, "key", buckets = 8, col("row_id"))
      .select("key", "row_id", "v", "attr")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt is deterministic across evaluations (retry-safe, no rand())") {
    val a = skewed.select(Skew.salt(8, col("row_id"))).as[Int].collect().toSeq
    val b = skewed.select(Skew.salt(8, col("row_id"))).as[Int].collect().toSeq
    assert(a === b)
    assert(a.distinct.size > 1, "salt must actually spread")
    assert(a.forall(s => s >= 0 && s < 8))
  }

  test("saltedAgg equals the direct aggregation (sum + count through partial merge)") {
    val direct = skewed.groupBy("key")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .orderBy("key")
    val salted = Skew.saltedAgg(skewed, "key", buckets = 8,
      discriminators = Seq(col("row_id")),
      partials = Seq(sum("v").as("p_sum"), count(lit(1)).as("p_n")),
      merges = Seq(sum("p_sum").as("sum_v"), sum("p_n").as("n")))
      .orderBy("key")
    val d = direct.as[(String, Double, Long)].collect()
    val s = salted.as[(String, Double, Long)].collect()
    assert(d.map(_._1).toSeq === s.map(_._1).toSeq)
    d.zip(s).foreach { case ((_, dv, dn), (_, sv, sn)) =>
      assert(dn === sn)
      assert(math.abs(dv - sv) < 1e-6) // partial-sum order may differ in last ulps
    }
  }
}
