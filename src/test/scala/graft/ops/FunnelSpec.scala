package graft.ops

import java.sql.Timestamp

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*) =
    rows.map { case (u, t, e) => (u, ts(t), e) }.toDF("user_id", "ts", "event_type")

  test("funnel: strict ordering, window boundaries, first-touch anchoring") {
    val events = ev(
      // user 1: clean full conversion — click 00:00, view +1h, purchase +2h
      (1L, "2020-01-01 00:00:00", "click"),
      (1L, "2020-01-01 01:00:00", "view"),
      (1L, "2020-01-01 03:00:00", "purchase"),
      // user 2: view EXACTLY at click time → strict '>' rejects it;
      // a later view at exactly +24h converts (inclusive upper bound)
      (2L, "2020-01-01 00:00:00", "click"),
      (2L, "2020-01-01 00:00:00", "view"),
      (2L, "2020-01-02 00:00:00", "view"),
      // user 3: view 1 µs past the 24 h window → no conversion
      (3L, "2020-01-01 00:00:00", "click"),
      (3L, "2020-01-02 00:00:00.000001", "view"),
      // user 4: FIRST-TOUCH — first click 00:00 has no view in window;
      // a second click on day 3 WOULD have a view 1h later, but the
      // chain anchors at the first click, so no conversion (this is
      // the documented divergence from ClickHouse windowFunnel)
      (4L, "2020-01-01 00:00:00", "click"),
      (4L, "2020-01-03 00:00:00", "click"),
      (4L, "2020-01-03 01:00:00", "view"),
      // user 5: view before any click — order matters, no conversion
      (5L, "2020-01-01 02:00:00", "view"),
      (5L, "2020-01-01 03:00:00", "click"),
      // user 6: never clicks — counts only in n_users
      (6L, "2020-01-01 00:00:00", "signup"))

    val out = Funnel.funnel(events, "user_id", "ts", "event_type",
      Seq("click", "view", "purchase"), windowHours = 24)
    assert(out.columns.toSeq === Seq(
      "n_users", "n_click", "n_view_after_click", "n_purchase_after_view",
      "r_click", "r_view", "r_purchase",
      "avg_hours_click_to_view", "avg_hours_view_to_purchase"))
    val r = out.as[(Long, Long, Long, Long, Double, Double, Double, Double, Double)]
      .head()
    assert(r._1 === 6L) // all six users
    assert(r._2 === 5L) // users 1-5 click (user 5's late click still counts as stage 1)
    assert(r._3 === 2L) // users 1 and 2 convert to view
    assert(r._4 === 1L) // only user 1 purchases
    assert(r._5 === 5.0 / 6.0)
    assert(r._6 === 2.0 / 5.0)
    assert(r._7 === 1.0 / 2.0)
    // lags: user1 +1h, user2 +24h → mean 12.5 h; purchase lag 2 h
    assert(r._8 === (1.0 + 24.0) / 2)
    assert(r._9 === 2.0)
  }

  test("funnel: 4-stage chain gates on every stage with the same topology") {
    val events = ev(
      // user 1 runs the full signup → click → view → purchase chain
      (1L, "2020-01-01 00:00:00", "signup"),
      (1L, "2020-01-01 01:00:00", "click"),
      (1L, "2020-01-01 02:00:00", "view"),
      (1L, "2020-01-01 04:00:00", "purchase"),
      // user 2 stalls after click; the purchase without a view does
      // not skip a stage
      (2L, "2020-01-01 00:00:00", "signup"),
      (2L, "2020-01-01 01:00:00", "click"),
      (2L, "2020-01-01 02:00:00", "purchase"))
    val out = Funnel.funnel(events, "user_id", "ts", "event_type",
      Seq("signup", "click", "view", "purchase"), windowHours = 24)
    assert(out.columns.toSeq === Seq(
      "n_users", "n_signup", "n_click_after_signup", "n_view_after_click",
      "n_purchase_after_view",
      "r_signup", "r_click", "r_view", "r_purchase",
      "avg_hours_signup_to_click", "avg_hours_click_to_view",
      "avg_hours_view_to_purchase"))
    val r = out.head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L && r.getLong(2) === 2L)
    assert(r.getLong(3) === 1L && r.getLong(4) === 1L)
    assert(r.getDouble(9) === 1.0)   // mean signup→click lag: both 1 h
    assert(r.getDouble(10) === 1.0)  // click→view: user 1 only
    assert(r.getDouble(11) === 2.0)  // view→purchase: user 1 only
  }

  test("funnel: invalid arguments are rejected") {
    val events = ev((1L, "2020-01-01 00:00:00", "click"))
    intercept[IllegalArgumentException] {
      Funnel.funnel(events, "user_id", "ts", "event_type", Seq("click"), 24)
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(events, "user_id", "ts", "event_type",
        Seq("click", "click"), 24)
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(events, "user_id", "ts", "event_type",
        Seq("click", "view"), 0)
    }
  }
}
