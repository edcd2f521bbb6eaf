package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden tests for the scalar derivation surface (SURVEY §5.2 #1).
  * Each pins a semantic trap called out in SURVEY §7.3. */
class DeriveSpec extends SparkSpec {
  import spark.implicits._

  test("isWeekday: pandas Monday=0 convention vs Spark Sunday=1 trap (SURVEY §7.3#3)") {
    // 2024-01-01 is a Monday; walk the whole week.
    val days = (1 to 7).map(d => Timestamp.valueOf(f"2024-01-0$d 12:00:00"))
    val out = days.toDF("ts")
      .select(date_format($"ts", "EEE").as("dow"), Derive.isWeekday($"ts").as("wd"))
      .as[(String, Boolean)].collect().toMap
    assert(out === Map(
      "Mon" -> true, "Tue" -> true, "Wed" -> true, "Thu" -> true,
      "Fri" -> true, "Sat" -> false, "Sun" -> false))
  }

  test("isWeekend is the exact negation of isWeekday") {
    val days = (1 to 7).map(d => Timestamp.valueOf(f"2024-01-0$d 03:30:00"))
    val out = days.toDF("ts")
      .select(Derive.isWeekday($"ts"), Derive.isWeekend($"ts"))
      .as[(Boolean, Boolean)].collect()
    assert(out.forall { case (wd, we) => wd != we })
  }

  test("taipeiToUtc: exact -8h shift, no DST (etl_job.py:106-109)") {
    // Session TZ is UTC, Taipei has no DST: 08:00 Taipei wall = 00:00 UTC.
    val out = Seq(Timestamp.valueOf("2024-06-15 08:00:00")).toDF("ts")
      .select(Derive.taipeiToUtc($"ts")).as[Timestamp].head()
    assert(out === Timestamp.valueOf("2024-06-15 00:00:00"))
    val winter = Seq(Timestamp.valueOf("2024-01-15 07:59:59")).toDF("ts")
      .select(Derive.taipeiToUtc($"ts")).as[Timestamp].head()
    assert(winter === Timestamp.valueOf("2024-01-14 23:59:59"))
  }

  test("rainCategory boundaries {null, 0, 1.9, 2, 2.1, 10, 10.1} (05:84-94 + fillna(0) at 05:91)") {
    val out = Seq[Option[Double]](None, Some(0.0), Some(1.9), Some(2.0), Some(2.1), Some(10.0), Some(10.1))
      .toDF("rain").select(Derive.rainCategory($"rain")).as[Int].collect().toSeq
    assert(out === Seq(0, 0, 1, 1, 2, 2, 3))
  }

  test("haversineMeters: Taipei Main Station → Taipei 101 ≈ 5.03 km; zero distance = 0") {
    // Known pair: TPE Main (25.0478, 121.5170) → Taipei 101 (25.0339, 121.5645);
    // independently computed with R=6371000: 5028.724 m.
    val out = Seq((25.0478, 121.5170, 25.0339, 121.5645)).toDF("a", "b", "c", "d")
      .select(Derive.haversineMeters($"a", $"b", $"c", $"d")).as[Double].head()
    assert(math.abs(out - 5028.724) < 0.5, s"got $out")
    val zero = Seq((25.0, 121.0, 25.0, 121.0)).toDF("a", "b", "c", "d")
      .select(Derive.haversineMeters($"a", $"b", $"c", $"d")).as[Double].head()
    assert(zero === 0.0)
  }

  test("riskLabel threshold at exactly 0.1 is Normal (01:964: strict <)") {
    val out = Seq(0.0999, 0.1, 0.5).toDF("r")
      .select(Derive.riskLabel($"r")).as[String].collect().toSeq
    assert(out === Seq("Shortage", "Normal", "Normal"))
  }

  test("clampRoundNonNeg: max(0, int(round(x))) incl. negative and half values") {
    val out = Seq(-3.2, -0.4, 0.0, 0.49, 2.5, 7.6).toDF("x")
      .select(Derive.clampRoundNonNeg($"x")).as[Int].collect().toSeq
    // Spark round() is HALF_UP on the decimal representation: 2.5 -> 3
    assert(out === Seq(0, 0, 0, 0, 3, 8))
  }

  test("isPeak set membership {7,8,9,17,18,19} (01:278)") {
    val out = (0 to 23).toDF("h").select(Derive.isPeak($"h")).as[Boolean].collect()
    val expected = (0 to 23).map(h => Set(7, 8, 9, 17, 18, 19).contains(h))
    assert(out.toSeq === expected)
  }

  test("stripPrefix removes an exact prefix only (05:55)") {
    val out = Seq("YouBike2.0_Daan", "Daan", "XYouBike2.0_Daan").toDF("n")
      .select(Derive.stripPrefix($"n", "YouBike2.0_")).as[String].collect().toSeq
    assert(out === Seq("Daan", "Daan", "XYouBike2.0_Daan"))
  }

  test("fillingRate divides and propagates null total as null") {
    val out = Seq((10, Some(40)), (3, None)).toDF("b", "t")
      .select(Derive.fillingRate($"b", $"t")).as[Option[Double]].collect().toSeq
    assert(out === Seq(Some(0.25), None))
  }
}
