package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ops/MedianHistogram vs the definitional median: sort the slice,
  * take Percentile's interpolation at the two middle ranks. Seeded
  * random multisets cover odd/even sizes, heavy duplication (the
  * map-side-combine case the shape exists for), all-equal slices, and
  * singletons. */
class MedianHistogramSpec extends SparkSpec {
  import spark.implicits._

  private def naive(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    val lo = s((n - 1) / 2)
    val hi = s(n / 2)
    lo + (hi - lo) * 0.5
  }

  test("histogram median equals the sorted-definition median over seeded random multisets (property)") {
    val rnd = new scala.util.Random(31)
    val cases: Seq[Map[String, Seq[Double]]] = (0 until 25).map { _ =>
      val nSlices = 1 + rnd.nextInt(3)
      (0 until nSlices).map { s =>
        val n = 1 + rnd.nextInt(400)
        // values drawn from a small grid → heavy duplication
        s"s$s" -> Seq.fill(n)((rnd.nextInt(40) - 20) / 8.0)
      }.toMap
    } :+ Map("odd" -> Seq(3.0), "even" -> Seq(1.0, 2.0), "same" -> Seq.fill(7)(5.5))
    for (slices <- cases) {
      val rows = slices.toSeq.flatMap { case (s, vs) => vs.map(s -> _) }
      val df = rows.toDF("slice", "v")
      val got = MedianHistogram.ranked(df)
        .groupBy("slice").agg(
          MedianHistogram.vLoAgg.as("v_lo"), MedianHistogram.vHiAgg.as("v_hi"))
        .select(col("slice"),
          MedianHistogram.interpolate(col("v_lo"), col("v_hi")).as("p50"))
        .as[(String, Double)].collect().toMap
      val want = slices.map { case (s, vs) => s -> naive(vs) }
      assert(got === want, s"slices sizes=${slices.view.mapValues(_.size).toMap}")
    }
  }
}
