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

  test("scd2MergeBatch: fold of out-of-order batches equals one-shot rebuild; untouched keys ride through") {
    import graft.ops.Relational
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // key 1: versions on days 1, 3 (batch A) and a LATE day-2 version
    // (batch B) that must splice BETWEEN them; key 2 only in batch A —
    // untouched by the fold step; key 3 arrives new in batch B
    val batchA = Seq((1L, 10L, "a", ts(1)), (1L, 30L, "c", ts(3)),
      (2L, 20L, "x", ts(5)))
      .toDF("k", "vid", "payload", "t")
    val batchB = Seq((1L, 21L, "b", ts(2)), (3L, 40L, "z", ts(7)))
      .toDF("k", "vid", "payload", "t")
    val folded = Relational.scd2MergeBatch(
      Relational.scd2(batchA, "k", "t", "vid").drop("t"),
      batchB, "k", "t", "vid")
    val oneShot = Relational.scd2(batchA.unionByName(batchB), "k", "t", "vid")
      .drop("t")
    val f = folded.as[(Long, Long, String, Long, Option[Long], Boolean)]
      .collect().toSet
    val o = oneShot.as[(Long, Long, String, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(f == o, "fold(batches) must equal the one-shot SCD2 build")
    // the late day-2 row closed day-1's interval and is itself closed by day-3
    val k1 = f.filter(_._1 == 1L).toSeq.sortBy(_._4)
    assert(k1.map(_._2) == Seq(10L, 21L, 30L))
    assert(k1.map(_._5) == Seq(Some(ts(2).getTime), Some(ts(3).getTime), None))
  }

  test("cascadeStep + cascadeAudit: two-level delete hits exact rows") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val parent = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("pid", "v")
    val child = Seq((10L, 1L), (11L, 1L), (12L, 3L)).toDF("cid", "pid")
    val tomb = Seq(1L).toDF("pid")
    val delP = Relational.cascadeStep(parent, "pid", tomb)
    assert(delP.select("pid").as[Long].collect().toSeq == Seq(1L))
    val delC = Relational.cascadeStep(child, "pid", delP.select("pid"))
    assert(delC.select("cid").as[Long].collect().sorted.toSeq ==
      Seq(10L, 11L))
    val audit = Relational.cascadeAudit("child", child, delC, col("cid"))
      .collect().head
    assert(audit.getString(0) == "child" && audit.getLong(1) == 3L &&
      audit.getLong(2) == 2L)
    // digest is the xor of the two 60-bit md5 key hashes — recompute
    def h(k: String) = java.lang.Long.parseLong({
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(k.getBytes("UTF-8")).take(8).map("%02x".format(_))
        .mkString.take(15)
    }, 16)
    assert(audit.getLong(3) == (h("10") ^ h("11")))
    // empty deletion level: count 0, digest 0 (not null)
    val none = Relational.cascadeAudit("child", child,
      delC.where(lit(false)), col("cid")).collect().head
    assert(none.getLong(2) == 0L && none.getLong(3) == 0L)
  }

  test("incrementalJoinFold equals the one-shot join for any interleaving") {
    import spark.implicits._
    val a = Seq((1L, 10L), (2L, 20L), (3L, 10L), (4L, 30L)).toDF("aid", "k")
    val b = Seq((10L, "x"), (20L, "y"), (40L, "z")).toDF("k", "v")
    val full = a.join(b, Seq("k"))
      .select("k", "aid", "v").as[(Long, Long, String)].collect().toSet
    def ab(i: Int) = a.where(col("aid") % 2 === i)
    def bb(i: Int) = b.where(col("k") % 20 === i * 10)
    for (order <- Seq(
        Seq(true -> ab(0), false -> bb(0), true -> ab(1), false -> bb(1)),
        Seq(false -> bb(1), true -> ab(1), true -> ab(0), false -> bb(0)))) {
      val got = Relational.incrementalJoinFold(order, "k")
        .select("k", "aid", "v").as[(Long, Long, String)].collect().toSet
      assert(got == full, s"order $order")
    }
  }

  test("incrementalJoinFold requires batches on both sides") {
    import spark.implicits._
    val a = Seq((1L, 10L)).toDF("aid", "k")
    intercept[IllegalArgumentException] {
      Relational.incrementalJoinFold(Seq(true -> a, true -> a), "k")
    }
  }

  test("incrementalAggFold law: fold ≡ one-shot, any batch order") {
    import spark.implicits._
    val rows = Seq((1L, 5L), (1L, -2L), (2L, 7L), (2L, 7L), (3L, 0L),
      (1L, 9L), (3L, -4L)).zipWithIndex
      .map { case ((k, v), i) => (k, v, i.toLong) }
      .toDF("k", "v", "i")
    val oneShot = rows.groupBy("k")
      .agg(count("v").as("n"), sum("v").as("s"),
        min("v").as("mn"), max("v").as("mx"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    def batch(i: Int) = rows.where(col("i") % 3 === i).drop("i")
    for (order <- Seq(Seq(0, 1, 2), Seq(2, 0, 1))) {
      val got = Relational.incrementalAggFold(order.map(batch), "k", "v")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == oneShot, s"order $order")
    }
    // an empty delta batch is a no-op, not a key eraser
    val withEmpty = Relational.incrementalAggFold(
      Seq(batch(0), batch(1).limit(0), batch(1), batch(2)), "k", "v")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(withEmpty == oneShot)
  }

  test("survivorshipMerge: each field from its latest non-null carrier") {
    import spark.implicits._
    val rows = Seq(
      ("u1", 1L, 1L, Some("x"), Option.empty[Long]),
      ("u1", 2L, 1L, None, Some(7L)),
      ("u1", 3L, 1L, Some("y"), None),
      ("u1", 3L, 2L, Some("z"), None), // same seq, higher tie wins
      ("u2", 1L, 1L, None, None))      // cluster with all-null fields
      .toDF("c", "seq", "id", "a", "b")
    val got = Relational.survivorshipMerge(rows, "c", "seq", "id",
        Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.getString(2)),
          Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    // a from (seq 3, id 2); b survives from the OLDER row that carried it
    assert(got("u1") == ((4L, Some("z"), Some(7L))))
    assert(got("u2") == ((1L, None, None)))
  }

  test("bitemporalAsOf: two-axis point-in-time pick, late corrections honored") {
    import spark.implicits._
    val v = Seq(
      ("k1", 1L, 10L, 20L, 1L),
      ("k1", 2L, 15L, 40L, 2L), // late-arriving correction (tx 40)
      ("k1", 3L, 12L, 18L, 3L),
      ("k2", 4L, 99L, 99L, 9L)) // valid after the query point
      .toDF("k", "id", "valid_ms", "tx_ms", "v")
    def at(validAt: Long, txAt: Long) =
      Relational.bitemporalAsOf(v, "k", "valid_ms", "tx_ms", "id",
          Seq("v"), validAt, txAt)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // at T=25 the correction isn't known yet: (12, 18) wins
    val early = at(15L, 25L)
    assert(early("k1") == ((12L, 18L, 3L)))
    assert(!early.contains("k2"), "not-yet-valid keys are absent")
    // at T=50 the late correction (valid 15) is believed
    assert(at(15L, 50L)("k1") == ((15L, 40L, 2L)))
  }

  test("scd2ValidityAudit: overlaps, gaps, dangling current, per-key verdicts") {
    import spark.implicits._
    val dim = Seq(
      // A: clean tiling with one legitimate gap -> ok (gaps don't fail)
      ("A", 0L, Some(10L)), ("A", 10L, Some(20L)), ("A", 25L, Some(30L)),
      // B: [0,15) overlaps [10,20); closed by a current row -> overlap fails
      ("B", 0L, Some(15L)), ("B", 10L, Some(20L)),
      ("B", 20L, Option.empty[Long]),
      // C: an OPEN version followed by another -> dangling current
      ("C", 0L, Option.empty[Long]), ("C", 5L, Some(10L)))
      .toDF("k", "vf", "vt")
    val got = Relational.scd2ValidityAudit(dim, "k", "vf", "vt")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getBoolean(6)))).toMap
    assert(got("A") == ((3L, 0L, 1L, 0L, 0L, true)))
    assert(got("B") == ((3L, 1L, 0L, 1L, 0L, false)))
    assert(got("C") == ((2L, 0L, 0L, 1L, 1L, false)))
  }
}
