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
}
