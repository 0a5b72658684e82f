package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  private def pts(rows: (Long, Double, Double)*) =
    rows.toSeq.toDF("id", "lat", "lon")

  private def pairs(df: org.apache.spark.sql.DataFrame, r: Double = 100.0) =
    Spatial.radiusSelfJoin(df, "id", "lat", "lon", r,
        cellLatDeg = 1.0, cellLonDeg = 2.0)
      .select("a", "b").as[(Long, Long)].collect().toSet

  test("pair straddling a cell boundary is found; far pair is not") {
    // 0.999° and 1.001° latitude: different lat cells, ~0.22 km apart
    val found = pairs(pts((1L, 0.999, 10.0), (2L, 1.001, 10.0),
      (3L, 30.0, -120.0)))
    assert(found == Set((1L, 2L)))
  }

  test("longitude wrap: pairs across the antimeridian are found") {
    val found = pairs(pts((1L, 5.0, 179.95), (2L, 5.0, -179.95)))
    // ~11 km apart across the dateline; cells 179 and -180 must neighbor
    assert(found == Set((1L, 2L)))
  }

  test("grid-blocked result equals the brute-force cross join") {
    val df = (1L to 400L).toDF("id")
      .select(col("id"), Spatial.latticeLat(col("id")).as("lat"),
        Spatial.latticeLon(col("id")).as("lon"))
    val blocked = Spatial.radiusSelfJoin(df, "id", "lat", "lon", 300.0,
        cellLatDeg = 3.0, cellLonDeg = 6.0) // wider net for a few hundred points
      .select("a", "b").as[(Long, Long)].collect().toSet
    // brute force over the same rounded-distance predicate
    val a = df.select(col("id").as("a"), col("lat").as("la"), col("lon").as("lo"))
    val b = df.select(col("id").as("b"), col("lat").as("lb"), col("lon").as("lb2"))
    val brute = a.crossJoin(b).where(col("a") < col("b"))
      .withColumn("d", round(Spatial.haversineKm(
        col("la"), col("lo"), col("lb"), col("lb2")), 3))
      .where(col("d") <= 300.0)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture must produce at least one pair")
    assert(blocked == brute)
  }

  test("coverage requires a wide-enough cell for the radius") {
    val df = pts((1L, 0.0, 0.0))
    intercept[IllegalArgumentException] {
      Spatial.radiusSelfJoin(df, "id", "lat", "lon", 200.0,
        cellLatDeg = 1.0, cellLonDeg = 2.0) // 1° lat ≈ 111 km < 200
    }
  }

  test("maxCell drops a degenerate cell whole, keeps the rest") {
    // 50 coincident points in one cell + one honest nearby pair elsewhere
    val degenerate = (10L to 59L).map(i => (i, 20.0005, 20.0005))
    val honest = Seq((1L, 40.0, 40.0), (2L, 40.001, 40.001))
    val found = Spatial.radiusSelfJoin(pts(degenerate ++ honest: _*),
        "id", "lat", "lon", 100.0, cellLatDeg = 1.0, cellLonDeg = 2.0,
        maxCell = 10)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(found == Set((1L, 2L)))
  }

  private def dbscan(df: org.apache.spark.sql.DataFrame, minPts: Int) =
    Spatial.dbscanClusters(df, "id", "lat", "lon", epsKm = 5.0,
        minPts = minPts, cellLatDeg = 1.0, cellLonDeg = 2.0)
      .as[(Long, Option[Long], String)].collect()
      .map { case (id, c, r) => id -> ((c, r)) }.toMap

  test("dbscan: core clump, attached border, isolated noise") {
    // 0.01° latitude ≈ 1.11 km; the clump is mutually within ε = 5 km,
    // id 4 reaches only id 3 (0.04° ≈ 4.45 km; 0.05° ≈ 5.56 km > ε)
    val got = dbscan(pts((1L, 10.00, 10.0), (2L, 10.01, 10.0),
      (3L, 10.02, 10.0), (4L, 10.06, 10.0), (9L, 30.0, -120.0)), minPts = 3)
    assert(got(1L) == ((Some(1L), "core")))
    assert(got(2L) == ((Some(1L), "core")))
    assert(got(3L) == ((Some(1L), "core")))
    assert(got(4L) == ((Some(1L), "border"))) // 2 < minPts neighbors, 1 core
    assert(got(9L) == ((None, "noise")))
  }

  test("dbscan: minPts boundary — a pair is a cluster at 2, noise at 3") {
    val two = pts((1L, 0.0, 0.0), (2L, 0.01, 0.0))
    val at2 = dbscan(two, minPts = 2)
    assert(at2(1L) == ((Some(1L), "core")) && at2(2L) == ((Some(1L), "core")))
    val at3 = dbscan(two, minPts = 3)
    // no core anywhere ⇒ no border either, everything is noise
    assert(at3(1L) == ((None, "noise")) && at3(2L) == ((None, "noise")))
  }

  test("dbscan: border between two clusters takes the MINIMUM label") {
    // two dense 4-clumps (every member sees 3 clump-mates + itself = 4);
    // id 20 sits between them reaching exactly one core of each (0.04°),
    // everything else ≥ 0.05° away — border, never a bridge (not core)
    val a = Seq((11L, 0.00), (12L, 0.01), (13L, 0.02), (14L, 0.03))
    val b = Seq((1L, 0.11), (2L, 0.12), (3L, 0.13), (4L, 0.14))
    val x = Seq((20L, 0.07))
    val got = dbscan(pts((a ++ b ++ x).map { case (i, la) => (i, la, 10.0) }: _*),
      minPts = 4)
    a.foreach { case (i, _) => assert(got(i) == ((Some(11L), "core"))) }
    b.foreach { case (i, _) => assert(got(i) == ((Some(1L), "core"))) }
    // adjacent cores live in clusters 11 and 1 — the min rule picks 1,
    // regardless of which clump was generated or scanned first
    assert(got(20L) == ((Some(1L), "border")))
  }
}
