package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")

  private def log(rows: (Long, String, Long, Long, String)*) =
    rows.toDF("k", "v", "ts", "tie", "op")

  private def apply(l: org.apache.spark.sql.DataFrame) =
    Relational.applyCdc(base, l, "k", "ts", "tie")
      .as[(Long, String)].collect().toSet

  test("last op per key wins: U then D deletes, D then U resurrects") {
    val got = apply(log(
      (1L, "a2", 10L, 1L, "U"), (1L, "ignored", 20L, 2L, "D"), // last=D
      (2L, "dead", 10L, 3L, "D"), (2L, "b2", 20L, 4L, "U"))) // last=U
    assert(got == Set((2L, "b2"), (3L, "c")))
  }

  test("upsert on an absent key inserts; untouched base passes through") {
    val got = apply(log((9L, "new", 1L, 1L, "U")))
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c"), (9L, "new")))
  }

  test("tie column breaks same-timestamp ops deterministically") {
    // same ts: higher tie wins — D(tie=2) beats U(tie=1)
    val got = apply(log((1L, "u", 5L, 1L, "U"), (1L, "d", 5L, 2L, "D")))
    assert(got == Set((2L, "b"), (3L, "c")))
  }

  test("delete of an absent key is a no-op") {
    val got = apply(log((42L, "x", 1L, 1L, "D")))
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("mismatched payload columns are rejected") {
    val bad = Seq((1L, "x", 1.0, 1L, 1L, "U"))
      .toDF("k", "v", "extra", "ts", "tie", "op")
    intercept[IllegalArgumentException] {
      Relational.applyCdc(base, bad, "k", "ts", "tie")
    }
  }

  private val oldSnap = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, null.asInstanceOf[String], 30.0),
    (4L, "gone", 40.0)).toDF("k", "s", "p")
  private val newSnap = Seq(
    (1L, "a", 10.0),   // unchanged — must emit nothing
    (2L, "B", 20.0),   // s changed
    (3L, "now", 31.0), // null→value AND p changed
    (5L, "new", 50.0)) // insert
    .toDF("k", "s", "p")

  test("snapshotDiff classifies I/U/D with null-safe changed columns") {
    val got = Relational.snapshotDiff(oldSnap, newSnap, "k", Seq("s", "p"))
      .as[(Long, String, String)].collect().toSet
    assert(got == Set(
      (2L, "U", "s"), (3L, "U", "s,p"), (4L, "D", ""), (5L, "I", "")))
  }

  test("snapshotDiff then applyCdc round-trips the new snapshot") {
    val diff = Relational.snapshotDiff(oldSnap, newSnap, "k", Seq("s", "p"))
    // rebuild an applyCdc log from the diff: I/U carry new values, D
    // carries anything (applyCdc only reads its key)
    val logDf = diff.select(col("key").as("k"), col("op"))
      .join(newSnap, Seq("k"), "left")
      .select(col("k"), col("s"), col("p"), lit(1L).as("ts"),
        col("k").as("tie"),
        when(col("op") === "D", "D").otherwise("U").as("op"))
    val applied = Relational.applyCdc(
      oldSnap, logDf, "k", "ts", "tie")
      .as[(Long, String, Double)].collect().toSet
    val expect = newSnap.as[(Long, String, Double)].collect().toSet
    assert(applied == expect)
  }
}
