package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, user: Long, tpe: String, min: Int) =
    (id, user, tpe,
      new java.sql.Timestamp(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
        .getTime + min * 60000L))

  private def funnel(rows: Seq[(Long, Long, String, java.sql.Timestamp)]) =
    Analytics.sessionFunnel(
      rows.toDF("event_id", "user_id", "event_type", "ts"),
      Seq("view", "click", "purchase"))
      .as[(Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSet

  test("funnel steps must be strictly ordered within the session") {
    // user 1: click BEFORE the view — click must not count; the later
    // click completes step 2, no purchase
    val got = funnel(Seq(
      ev(1, 1, "click", 0), ev(2, 1, "view", 5), ev(3, 1, "click", 10)))
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    assert(got == Set((1L, 1L, Some(base + 5 * 60000L),
      Some(base + 10 * 60000L), None)))
  }

  test("a missing earlier step nulls all later ones") {
    // purchase exists but no view at all → everything null
    val got = funnel(Seq(ev(1, 2, "purchase", 0), ev(2, 2, "click", 1)))
    assert(got == Set((2L, 1L, None, None, None)))
  }

  test("sessions are isolated: steps never chain across a 30-min gap") {
    // view in session 1, click 40 min later (new session) → no step 2
    val got = funnel(Seq(ev(1, 3, "view", 0), ev(2, 3, "click", 40)))
    assert(got.size == 2)
    assert(got.forall { case (_, _, s1, s2, s3) =>
      (s1.isEmpty || s2.isEmpty) && s3.isEmpty })
  }

  test("cohortRetention counts distinct users per (cohort, offset)") {
    // users 1,2 first-seen week 0; user 1 also active week 1 (twice —
    // counted once); user 3 first-seen week 1
    val wk = 7 * 24 * 60
    val rows = Seq(ev(1, 1, "view", 0), ev(2, 2, "view", 10),
      ev(3, 1, "view", wk + 1), ev(4, 1, "view", wk + 2),
      ev(5, 3, "view", wk + 3))
    val got = Analytics.cohortRetention(rows.toDF("event_id", "user_id", "event_type", "ts"))
      .as[(Long, Long, Long)].collect().toSet
    // 2024-01-01 is mid-epoch-week, so offsets may split; recompute
    // expectations from the op's own week arithmetic
    val w0 = (java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime /
      1000 / 86400) / 7
    val w1 = ((java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime +
      (wk + 1) * 60000L) / 1000 / 86400) / 7
    if (w1 == w0) // both minutes landed in the same epoch week
      assert(got == Set((w0, 0L, 3L)))
    else
      assert(got == Set((w0, 0L, 2L), (w0, w1 - w0, 1L), (w1, 0L, 1L)))
  }
}
