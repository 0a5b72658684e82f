package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq((1L, 1000L), (2L, 5000L), (3L, 100000L))
    .toDF("a_id", "a_ms")
  private lazy val right = Seq(
    (10L, 900L),    // within 100 of a=1
    (11L, 1100L),   // within 100 of a=1 (other side)
    (12L, 1101L),   // 101 away — excluded at tol=100
    (13L, 4900L),   // within 100 of a=2, crosses a bucket boundary
    (14L, 99999L)   // within 100 of a=3
  ).toDF("b_id", "b_ms")

  test("pairs within tolerance, inclusive bound, across bucket edges") {
    val out = Relational.rangeJoin(left, right, "a_ms", "b_ms", 100L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 10L), (1L, 11L), (2L, 13L), (3L, 14L)))
    // boundary: exactly tol included
    val exact = Relational.rangeJoin(
      Seq((1L, 0L)).toDF("a_id", "a_ms"),
      Seq((2L, 100L), (3L, 101L)).toDF("b_id", "b_ms"), "a_ms", "b_ms", 100L)
      .select("b_id").as[Long].collect().toSet
    assert(exact == Set(2L))
  }

  test("equals the naive theta join on real data") {
    val ev = graft.queries.Tables.events(spark, sf("sf0.01"))
    val a = ev.where(col("event_type") === "error")
      .select(col("event_id").as("a_id"), unix_millis(col("ts")).as("a_ms"))
    val b = ev.where(col("event_type") === "click")
      .select(col("event_id").as("b_id"), unix_millis(col("ts")).as("b_ms"))
    val bucketed = Relational.rangeJoin(a, b, "a_ms", "b_ms", 60000L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = a.crossJoin(b)
      .where(abs(col("a_ms") - col("b_ms")) <= 60000L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive && bucketed.nonEmpty)
  }

  test("plans as an equi join, not a nested-loop cross product") {
    val plan = Relational.rangeJoin(left, right, "a_ms", "b_ms", 100L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"expected a hash/sort-merge equi join:\n$plan")
  }
}
