package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (id, nation, segment, payload): nation/segment are the QI
  private val df = Seq(
    (1L, "US", "AUTO", 1.0), (2L, "US", "AUTO", 2.0), (3L, "US", "AUTO", 3.0),
    (4L, "FR", "BIKE", 4.0), (5L, "FR", "BIKE", 5.0),
    (6L, "DE", "SHIP", 6.0)).toDF("id", "nat", "seg", "v")

  test("groups below k are suppressed, at-or-above k survive") {
    val got = Privacy.kAnonymize(df, Seq("nat", "seg"), k = 2)
      .select("id", "nat", "seg", "group_size", "suppressed")
      .as[(Long, Option[String], Option[String], Long, Boolean)]
      .collect().toSet
    assert(got == Set(
      (1L, Some("US"), Some("AUTO"), 3L, false),
      (2L, Some("US"), Some("AUTO"), 3L, false),
      (3L, Some("US"), Some("AUTO"), 3L, false),
      (4L, Some("FR"), Some("BIKE"), 2L, false),
      (5L, Some("FR"), Some("BIKE"), 2L, false),
      (6L, None, None, 1L, true)))
  }

  test("non-QI columns pass through untouched; no rows dropped") {
    val out = Privacy.kAnonymize(df, Seq("nat", "seg"), k = 5)
    assert(out.count() == 6)
    assert(out.select(sum("v")).as[Double].head() == 21.0)
  }

  test("null QI values group together, as PARTITION BY defines") {
    val withNulls = Seq(
      (1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "X")).toDF("id", "nat")
    val got = Privacy.kAnonymize(withNulls, Seq("nat"), k = 2)
      .select("id", "group_size", "suppressed")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 2L, false), (2L, 2L, false), (3L, 1L, true)))
  }
}
