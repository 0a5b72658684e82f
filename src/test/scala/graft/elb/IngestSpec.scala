package graft.elb

import graft.SparkSpec
import java.nio.file.Files

class IngestSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("staged landing zone parses identically to direct .gz parse") {
    val gz = ElbFixtures.standardFixture()
    val staged = Files.createTempDirectory("staged").toString + "/landing"
    Ingest.recompress(spark, Seq(gz), staged, targetPartitions = 3)
    val direct = ElbParser.parse(spark, Seq(gz)).drop("log_source_file")
    val viaStage = Ingest.parseStaged(spark, staged).drop("log_source_file")
    assert(direct.count() == viaStage.count())
    assert(direct.except(viaStage).count() == 0)
    assert(viaStage.except(direct).count() == 0)
    // staging produced splittable parquet, not gz text
    assert(new java.io.File(staged).listFiles().exists(_.getName.endsWith(".parquet")))
  }

  test("approximate rollup mode keeps schema and approximates the exact one") {
    val gz = ElbFixtures.standardFixture()
    val cache = Files.createTempDirectory("geo-i").resolve("c.parquet").toString
    val fin = Features(graft.geo.GeoCache.enrich(spark,
      ElbParser.parse(spark, Seq(gz)), cache, new graft.geo.OfflineGeoResolver()))
    val exact = Sinks.hourlyAggregation(fin, exact = true).cache()
    val approx = Sinks.hourlyAggregation(fin, exact = false).cache()
    assert(exact.columns.toSeq == approx.columns.toSeq)
    assert(exact.count() == approx.count())
    // at this tiny scale HLL++ and exact distinct counts should agree
    val joined = exact.select(col("countryName"), col("request_hour"),
        col("unique_client_ips_count").as("e"))
      .join(approx.select(col("countryName"), col("request_hour"),
        col("unique_client_ips_count").as("a")), Seq("countryName", "request_hour"))
    assert(joined.filter(col("e") =!= col("a")).count() == 0)
  }
}
