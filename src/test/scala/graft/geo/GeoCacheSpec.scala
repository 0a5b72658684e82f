package graft.geo

import graft.SparkSpec
import graft.elb.{ElbFixtures, ElbParser, ElbSchema}
import java.nio.file.Files
import java.sql.Timestamp

class GeoCacheSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("load returns empty frame with canonical schema when cache absent") {
    val df = GeoCache.load(spark, "/tmp/does-not-exist-geo.parquet")
    assert(df.schema == ElbSchema.geo)
    assert(df.count() == 0)
  }

  test("offline resolver is deterministic and failure-shaped") {
    val r = new OfflineGeoResolver()
    val a = r.resolve(Seq("1.2.3.4", "5.6.7.8"))
    val b = r.resolve(Seq("1.2.3.4", "5.6.7.8"))
    assert(a == b)
    assert(a.forall(g => g.status == "success" || g.status == "fail"))
    assert(a.forall(_.query.nonEmpty))
  }

  test("upsert keeps the fresh row on key collision") {
    import spark.implicits._
    val t = Timestamp.valueOf("2025-01-01 00:00:00")
    val old = Seq(GeoRecord("success", None, Some("OldLand"), Some("OL"), None,
      None, None, None, None, None, "9.9.9.9", t)).toDF()
    val fresh = Seq(GeoRecord("success", None, Some("NewLand"), Some("NL"), None,
      None, None, None, None, None, "9.9.9.9", t)).toDF()
    val merged = GeoCache.upsert(old, fresh).collect()
    assert(merged.length == 1)
    assert(merged.head.getAs[String]("country") == "NewLand")
  }

  test("miss resolution is bounded per run and converges across runs") {
    import spark.implicits._
    val cachePath = Files.createTempDirectory("geo").resolve("cache.parquet").toString
    val logs = (1 to 10).map(i => s"10.0.0.$i").toDF("client_ip")
    val calls = scala.collection.mutable.ArrayBuffer.empty[Int]
    val counting = new GeoResolver {
      private val inner = new OfflineGeoResolver()
      def resolve(ips: Seq[String]) = { calls += ips.size; inner.resolve(ips) }
    }
    GeoCache.enrich(spark, logs, cachePath, counting, maxMissesPerRun = 4)
    assert(calls.toSeq == Seq(4), "first run must resolve exactly the cap")
    assert(GeoCache.load(spark, cachePath).count() == 4)
    GeoCache.enrich(spark, logs, cachePath, counting, maxMissesPerRun = 4)
    GeoCache.enrich(spark, logs, cachePath, counting, maxMissesPerRun = 4)
    assert(calls.toSeq == Seq(4, 4, 2),
      "successive runs must retire the deferred backlog")
    assert(GeoCache.load(spark, cachePath).count() == 10)
    // the cache is complete: a further run must not touch the resolver
    GeoCache.enrich(spark, logs, cachePath, new GeoResolver {
      def resolve(ips: Seq[String]) =
        throw new IllegalStateException("resolver must not be called on full cache")
    }, maxMissesPerRun = 4)
  }

  test("capped miss selection is deterministic and counts the true remainder") {
    import spark.implicits._
    val logs = (1 to 10).map(i => s"10.0.0.$i").toDF("client_ip")
    val empty = GeoCache.load(spark, "/tmp/does-not-exist-geo.parquet")
    // lexicographic order of 10.0.0.1..10 puts 10.0.0.10 second
    val (ips, deferred) = GeoCache.selectMisses(spark, logs, empty, 4)
    assert(ips == Seq("10.0.0.1", "10.0.0.10", "10.0.0.2", "10.0.0.3"),
      "selection must be the lexicographically-first cap-many misses")
    assert(deferred == 6L)
    // repartitioned input: same slice regardless of layout
    val (ips2, _) = GeoCache.selectMisses(spark, logs.repartition(7), empty, 4)
    assert(ips2 == ips)
    // backlog == cap exactly: complete run, nothing deferred
    val (all, none) = GeoCache.selectMisses(spark, logs, empty, 10)
    assert(all.size == 10 && none == 0L)
  }

  test("end-to-end enrich: misses resolved, cache persisted, join + rename applied") {
    val cachePath = Files.createTempDirectory("geo").resolve("cache.parquet").toString
    val logs = ElbParser.parse(spark, Seq(ElbFixtures.standardFixture()))
    val enriched = GeoCache.enrich(spark, logs, cachePath, new OfflineGeoResolver())
    assert(enriched.columns.contains("countryName"))
    assert(enriched.columns.contains("query"))
    // every row got a cache hit (resolver answered every distinct IP)
    assert(enriched.filter(col("query").isNull).count() == 0)
    // cache file persisted with one row per distinct IP
    val cache = GeoCache.load(spark, cachePath)
    assert(cache.count() == logs.select("client_ip").distinct().count())
    // second run: no misses → same result, cache unchanged
    val again = GeoCache.enrich(spark, logs, cachePath, new GeoResolver {
      def resolve(ips: Seq[String]) =
        throw new IllegalStateException("resolver must not be called on full cache hit")
    })
    assert(again.count() == enriched.count())
  }
}
