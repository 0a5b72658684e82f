package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("backward as-of join picks the latest right row at-or-before each left time") {
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"), (2L, 50L, "x"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 10L, "r@10"), (1L, 15L, "r@15"), (3L, 1L, "other"))
      .toDF("k", "rt", "payload")
    val out = Relational.asOfJoinBackward(left, right, "k", "k", "t", "rt",
        Seq("payload"))
      .select("name", "payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("e0").isEmpty)          // before any right row
    assert(out("e1").contains("r@10")) // equality is inclusive
    assert(out("e2").contains("r@15")) // latest at-or-before 20
    assert(out("x").isEmpty)           // key with no right rows
  }

  test("payload columns come from ONE right row even when values are null") {
    val left = Seq((1L, 3L, "e")).toDF("k", "t", "name")
    val right = Seq(
      (1L, 1L, Some(5L), "x"),
      (1L, 2L, None: Option[Long], "y") // matched row has null a
    ).toDF("k", "rt", "a", "b")
    val r = Relational.asOfJoinBackward(left, right, "k", "k", "t", "rt",
      Seq("a", "b")).collect().head
    // the t=2 row matches: a must be null (NOT the older row's 5), b = "y"
    assert(r.isNullAt(r.fieldIndex("a")), "null payload must not fall back to an older row")
    assert(r.getAs[String]("b") == "y")
  }

  test("paretoFrontier: dominance pruned, exact ties kept, groups isolated") {
    // group a points (x, y): (1,5) dominated by (2,5); (2,5) frontier;
    // (3,3) frontier (larger x); (3,3) duplicate — exact ties both kept;
    // (2,4) dominated by (2,5) same-x; (1,9) frontier (highest y).
    // group b: single point always frontier.
    val t = Seq(
      ("a", 1L, 1L, 5L), ("a", 2L, 2L, 5L), ("a", 3L, 3L, 3L),
      ("a", 4L, 3L, 3L), ("a", 5L, 2L, 4L), ("a", 6L, 1L, 9L),
      ("b", 7L, 0L, 0L)).toDF("g", "id", "x", "y")
    val got = Relational.paretoFrontier(t, "g", "x", "y")
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L, 4L, 6L, 7L))
  }

  test("null keys/timestamps never match on either side") {
    val left = Seq(
      (Some(1L), Some(10L), "ok"),
      (None: Option[Long], Some(10L), "nullkey"),
      (Some(1L), None: Option[Long], "nullts")
    ).toDF("k", "t", "name")
    val right = Seq(
      (Some(1L), Some(5L), "p1"),
      (None: Option[Long], Some(1L), "pnullk"),
      (Some(1L), None: Option[Long], "pnullt")
    ).toDF("k", "rt", "payload")
    val out = Relational.asOfJoinBackward(left, right, "k", "k", "t", "rt",
        Seq("payload")).collect()
      .map(r => r.getAs[String]("name") -> Option(r.getAs[String]("payload"))).toMap
    assert(out("ok").contains("p1"))
    assert(out("nullkey").isEmpty)
    assert(out("nullts").isEmpty)
  }

  test("tolerant as-of join: stale matches null, boundary staleness kept") {
    val left = Seq((1L, 100L, "fresh"), (1L, 200L, "stale"),
      (1L, 115L, "boundary"), (2L, 50L, "nomatch"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 95L, 7L), (1L, 10L, 3L)).toDF("k", "rt", "v")
    val out = Relational.asOfJoinBackwardTolerant(left, right,
        "k", "k", "t", "rt", Seq("v"), toleranceMs = 20L)
      .collect().map(r => r.getAs[String]("name") ->
        Option(r.getAs[Any]("v")).map(_.asInstanceOf[Long])).toMap
    assert(out("fresh").contains(7L))    // 5 ms old, within 20
    assert(out("boundary").contains(7L)) // exactly 20 ms old: kept
    assert(out("stale").isEmpty)         // 105 ms old: nulled like no match
    assert(out("nomatch").isEmpty)
  }
}
