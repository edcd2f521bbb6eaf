package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, TextOps}

/** Pins the guarantees [[BenchScale]]'s inflation helpers rely on: the
  * scale bench's linearity claim is only meaningful if replication is
  * provably interaction-free (no cross-replica dedup merges or LSH
  * collisions) and structure-preserving (each replica reproduces the
  * original corpus's similarity relations exactly).
  */
class BenchScaleSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),
    (2L, "entirely different content with no overlap at all here"),
    (3L, "the quick brown fox jumps over the lazy dog") // exact dup of 0
  ).toDF("doc_id", "text")

  test("inflateDocuments: ids stay unique, counts scale exactly") {
    val inflated = BenchScale.inflateDocuments(docs, 3)
    assert(inflated.count() === 12)
    assert(inflated.select("doc_id").distinct().count() === 12)
  }

  test("inflateEventsUsers: users replica-unique, nulls stay null, " +
    "hour-of-day preserved (the funnel/sessionize legs' isomorphism premise)") {
    val ev = Seq(
      (1L, Option(10L), "2024-01-01 10:30:00", "click"),
      (2L, Option(10L), "2024-01-01 11:00:00", "view"),
      (3L, Option.empty[Long], "2024-01-01 12:00:00", "click")
    ).toDF("event_id", "user_id", "ts_s", "event_type")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
    val inf = BenchScale.inflateEventsUsers(ev, 3)
    assert(inf.count() === 9)
    assert(inf.select("event_id").distinct().count() === 9)
    // a null user never gains a replica identity (null·f+rep is null)
    assert(inf.filter(col("user_id").isNull).count() === 3)
    // the one real user becomes three replica-unique users
    assert(inf.filter(col("user_id").isNotNull)
      .select("user_id").distinct().count() === 3)
    // the shift is whole days: hour-of-day (and thus every hour-derived
    // flag) is replica-invariant
    assert(inf.select(hour(col("ts"))).distinct()
      .collect().map(_.getInt(0)).toSet === Set(10, 11, 12))
    // per-user gaps are shift-invariant: each replica of user 10 keeps
    // the 30-minute click→view gap
    val gaps = inf.filter(col("user_id").isNotNull)
      .groupBy("user_id")
      .agg(((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
        / 1000000L).cast("long").as("gap"))
      .select("gap").distinct().collect().map(_.getLong(0)).toSet
    assert(gaps === Set(1800L))
  }

  test("inflateDocuments: per-replica token map preserves within-replica " +
    "similarity and zeroes cross-replica similarity") {
    val inflated = BenchScale.inflateDocuments(docs, 2)
      .withColumn("sh_set",
        array_distinct(TextOps.wordShingles(TextOps.words(col("text")), 3)))
    // replica of doc 0 (id 0*2+1=1... ids are doc_id*2+rep) vs its own
    // replica of doc 3: exact dup WITHIN replica 1
    val sets = inflated.select("doc_id", "sh_set").as[(Long, Seq[String])]
      .collect().toMap
    def jac(a: Seq[String], b: Seq[String]): Double =
      a.intersect(b).size.toDouble / a.union(b).distinct.size
    // within-replica relations mirror the original corpus
    assert(jac(sets(0L * 2 + 1), sets(3L * 2 + 1)) === 1.0) // dup pair survives
    assert(jac(sets(0L * 2 + 1), sets(1L * 2 + 1)) > 0.5)   // near-dup survives
    // cross-replica: same source doc, different replica -> zero overlap
    assert(jac(sets(0L * 2), sets(0L * 2 + 1)) === 0.0)
    assert(jac(sets(3L * 2), sets(0L * 2 + 1)) === 0.0)
  }

  test("inflateEvents: event ids stay unique, station set unchanged, " +
    "time range grows") {
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 08:00:00"), 7L, 10.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 9L, 20.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val inflated = BenchScale.inflateEvents(ev, 3)
    assert(inflated.count() === 6)
    assert(inflated.select("event_id").distinct().count() === 6)
    assert(inflated.select("user_id").distinct().count() === 2)
    val days = inflated.select(countDistinct(to_date(col("ts")))).as[Long].head()
    assert(days === 3) // one replica per day offset
  }

  test("exact dedup on an inflated corpus never merges across replicas") {
    val inflated = BenchScale.inflateDocuments(docs, 4)
    val groups = Dedup.exactDedup(inflated, "text", "doc_id")
    // 3 distinct contents per replica (docs 0/3 collapse) x 4 replicas
    assert(groups.count() === 12)
    assert(groups.agg(sum("n_copies")).as[Long].head() === 16)
  }
}
