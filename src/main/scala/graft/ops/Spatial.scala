package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial blocking: grid-cell candidate generation + exact great-circle
  * verification — the geo analogue of the LSH-band / trigram-postings
  * discipline (candidates from a cheap equi-join on a blocking key, then
  * an exact predicate kills coincidences; provably nothing is lost).
  *
  * A radius self-join done naively is an n² cross product — at 100 TB it
  * is not a slow plan, it is no plan. The grid bound makes the candidate
  * space Σ |cell|·|3×3 neighborhood| — proportional to local density, not
  * corpus size — and every stage is an equi-join Catalyst shuffles on the
  * cell key like any other join.
  */
object Spatial {

  private def frac(salt: String, id: Column): Column =
    (graft.functions.HashExpressions.md5Prefix64(concat(lit(salt), lit("|"), id.cast("string")), 4).cast("double") + lit(0.5)) / lit(65536.0)

  /** Deterministic synthetic latitude in [−60, 60) off the md5 lattice —
    * bounded away from the poles so a fixed longitude cell width keeps a
    * real metric width (at ±60°, 1° of longitude is still ~55.7 km).
    * Same-expression reproducible by any engine from the id alone.
    */
  def latticeLat(id: Column): Column = lit(-60.0) + lit(120.0) * frac("lat", id)

  /** Deterministic synthetic longitude in [−180, 180) off the md5 lattice. */
  def latticeLon(id: Column): Column = lit(-180.0) + lit(360.0) * frac("lon", id)

  /** Great-circle distance in km (haversine, R = 6371): a pure codegen'd
    * sin/cos/asin chain — no UDF. Trig goes through libm, so consumers
    * that compare or rank on the distance must round first (the q129
    * cross-libm discipline); [[radiusSelfJoin]] rounds to 3 d.p. (metre
    * precision) before thresholding.
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2.0 * 6371.0) * asin(sqrt(a))
  }

  /** All unordered pairs within `radiusKm`, as `(a, b, dist_km)` with
    * `a < b` and `dist_km` rounded to 3 d.p. (the threshold applies to
    * the ROUNDED value, so both engines decide boundary pairs from the
    * same number).
    *
    * Mechanics: each point lands in one `(latCell, lonCell)` grid cell
    * (plain `floor` on IEEE division — exact, engine-independent, unlike
    * trig); the probe side re-emits each point into its 3×3 cell
    * neighborhood (longitude wraps modulo the cell count); candidates are
    * the cell equi-join with `a < b`; haversine verifies. Coverage proof:
    * two points within `radiusKm` differ by < `cellLatDeg` latitude and
    * < `cellLonDeg` longitude (the `require`s pin the worst case at
    * `latMaxAbs`), so their cells differ by ≤ 1 in each axis and the
    * neighborhood finds the pair — exactly once, because the 9 exploded
    * cells are distinct (needs ≥ 3 longitude cells).
    *
    * `maxCell` drops pathologically hot cells whole (every point at one
    * location) — the maxBucket discipline of the LSH/banding family; the
    * default keeps everything.
    */
  def radiusSelfJoin(df: DataFrame, idCol: String, latCol: String,
      lonCol: String, radiusKm: Double, cellLatDeg: Double = 0.5,
      cellLonDeg: Double = 1.0, latMaxAbs: Double = 60.0,
      maxCell: Int = Int.MaxValue): DataFrame = {
    val kmPerDegLat = 111.045 // mean meridian degree; worst case is smaller
    require(cellLatDeg * kmPerDegLat >= radiusKm,
      s"latitude cell ${cellLatDeg}° covers less than $radiusKm km")
    require(cellLonDeg * kmPerDegLat * math.cos(math.toRadians(latMaxAbs)) >= radiusKm,
      s"longitude cell ${cellLonDeg}° at ±$latMaxAbs° covers less than $radiusKm km")
    val nLon = math.round(360.0 / cellLonDeg)
    require(nLon >= 3, "need >= 3 longitude cells for distinct neighborhoods")
    require(360.0 % cellLonDeg == 0.0, "longitude cells must tile 360°")

    val pts = df.select(col(idCol).as("id"),
        col(latCol).cast("double").as("lat"), col(lonCol).cast("double").as("lon"))
      .withColumn("lc", floor(col("lat") / cellLatDeg))
      .withColumn("gc", floor(col("lon") / cellLonDeg))
    val kept = Dedup.pruneHotKeys(pts, Seq("lc", "gc"), maxCell)
    // probe side: 9 neighbor cells per point, longitude wrapped
    val probe = kept.select(col("id").as("b_id"), col("lat").as("b_lat"),
        col("lon").as("b_lon"),
        explode(sequence(lit(-1), lit(1))).as("dlc"), col("lc"), col("gc"))
      .select(col("b_id"), col("b_lat"), col("b_lon"),
        (col("lc") + col("dlc")).as("lc"),
        explode(sequence(lit(-1), lit(1))).as("dgc"), col("gc"))
      .select(col("b_id"), col("b_lat"), col("b_lon"), col("lc"),
        pmod(col("gc") + col("dgc") + lit(nLon), lit(nLon)).as("gc"))
    kept.withColumn("gc", pmod(col("gc") + lit(nLon), lit(nLon)))
      .join(probe, Seq("lc", "gc"))
      .where(col("id") < col("b_id"))
      .withColumn("dist_km",
        round(haversineKm(col("lat"), col("lon"), col("b_lat"), col("b_lon")), 3))
      .where(col("dist_km") <= radiusKm)
      .select(col("id").as("a"), col("b_id").as("b"), col("dist_km"))
  }

  /** DBSCAN density clusters over the grid-blocked radius join — the
    * geo-clustering step (POI discovery, event hot-spot grouping) that
    * plain k-means can't do because cluster count and shape are unknown.
    * Classic semantics, determinized: a point is `core` when its
    * ε-neighborhood holds ≥ `minPts` points (ITSELF INCLUDED); clusters
    * are the connected components of the core-core ε-graph, labeled by
    * minimum member id ([[Dedup.connectedComponents]] — a core point
    * with no core neighbor is its own singleton cluster); a non-core
    * point with ≥ 1 core ε-neighbor is a `border` point and joins the
    * MINIMUM cluster label among its core neighbors (the one
    * under-specified choice in DBSCAN, pinned to an order-free rule —
    * no "first scan wins" nondeterminism); everything else is `noise`
    * (cluster null). Distances inherit [[radiusSelfJoin]]'s 3-d.p.
    * rounding, so both engines decide every boundary pair identically.
    *
    * Scale shape: pair generation is the grid join (candidates ∝ local
    * density², `maxCell` backstop); degrees and border assignment are
    * one aggregate each over the pair list; component labeling is the
    * O(log diameter)-round pointer-doubled min-label propagation (the
    * percolated ε-graph's diameter is NOT small — sf0.1 already exceeds
    * 50 hops, which is what forced the doubling). Nothing is quadratic in
    * the corpus — only in per-cell density, DBSCAN's intrinsic cost.
    */
  def dbscanClusters(df: DataFrame, idCol: String, latCol: String,
      lonCol: String, epsKm: Double, minPts: Int,
      cellLatDeg: Double = 0.5, cellLonDeg: Double = 1.0,
      maxCell: Int = Int.MaxValue): DataFrame = {
    require(minPts >= 2, s"minPts must be >= 2, got $minPts")
    val pts = df.select(col(idCol).as("id")).distinct()
    val pairs = radiusSelfJoin(df, idCol, latCol, lonCol, epsKm,
        cellLatDeg, cellLonDeg, maxCell = maxCell)
      .localCheckpoint(true) // consumed 4× below; never re-run the grid join
    val sym = pairs.select(col("a").as("id"), col("b").as("nb"))
      .union(pairs.select(col("b").as("id"), col("a").as("nb")))
    val deg = sym.groupBy("id").agg(count(lit(1)).as("nnb"))
    // neighborhood size counts the point itself
    val core = pts.join(deg, Seq("id"), "left")
      .where(coalesce(col("nnb"), lit(0L)) + 1 >= minPts)
      .select(col("id"))
    // core-core edges label the components; coreless cores are their own
    // singleton cluster (connectedComponents only returns ids with edges)
    val coreEdges = pairs
      .join(core.select(col("id").as("a")), Seq("a"))
      .join(core.select(col("id").as("b")), Seq("b"))
      .select(col("a"), col("b"))
    val labeled = Dedup.connectedComponents(coreEdges)
    // referenced THREE times by the assembly below (border join, border
    // anti, final join) — each lazy reference re-derived core (= the
    // pts⋈degree aggregate over the checkpointed pair set) plus the
    // label join; one lazy checkpoint collapses that (round-16)
    val coreLabels = core
      .join(labeled, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
      .localCheckpoint(false)
    val borderLabels = sym
      .join(coreLabels.select(col("id").as("nb"), col("cluster")), Seq("nb"))
      .groupBy("id").agg(min(col("cluster")).as("cluster"))
      .join(coreLabels.select(col("id")), Seq("id"), "left_anti")
    pts
      .join(coreLabels.withColumn("role", lit("core")), Seq("id"), "left")
      .join(borderLabels.withColumnRenamed("cluster", "b_cluster"), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("cluster"), col("b_cluster")).as("cluster"),
        coalesce(col("role"),
          when(col("b_cluster").isNotNull, lit("border"))
            .otherwise(lit("noise"))).as("role"))
  }
}
