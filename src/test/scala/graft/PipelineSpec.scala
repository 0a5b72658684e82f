package graft

import graft.elb.ElbFixtures
import java.nio.file.Files

class PipelineSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  lazy val outDir = {
    val out = Files.createTempDirectory("pipeline-out").toString
    val fixture = ElbFixtures.standardFixture()
    Pipeline.run(spark, Pipeline.Config(
      Seq(fixture), out, s"$out/ip_geolocation_cache.parquet"))
    out
  }

  test("cleaned logs: hive layout with zero-padded partitions, time stringified") {
    val dirs = new java.io.File(s"$outDir/cleaned_logs").listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("year=2025")))
    val months = new java.io.File(s"$outDir/cleaned_logs/year=2025").listFiles().map(_.getName)
    assert(months.contains("month=05"))
    val df = spark.read.parquet(s"$outDir/cleaned_logs")
    assert(df.count() > 0)
    // time is an Eastern local string with offset, e.g. 2025-05-26 19:55:02-0400
    val t = df.select("time").collect().head.getString(0)
    assert(t.matches("""\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}[+-]\d{4}"""))
    // null-countryCode rows are absent (pandas null-group semantics)
    assert(df.filter(col("countryCode").isNull).count() == 0)
  }

  test("hourly aggregation has the nine measures and non-null group keys") {
    val agg = spark.read.parquet(s"$outDir/aggregated_stats/hourly_traffic_by_geo.parquet")
    val expected = Set("request_year", "request_month", "request_day", "request_hour",
      "countryName", "city", "request_count", "unique_client_ips_count",
      "average_total_processing_time", "median_total_processing_time",
      "sum_sent_bytes", "sum_received_bytes", "count_2xx", "count_4xx", "count_5xx")
    assert(agg.columns.toSet == expected)
    assert(agg.count() > 0)
    assert(agg.filter(col("countryName").isNull || col("city").isNull).count() == 0)
  }

  test("error report CSV contains only 4xx/5xx rows with the 13 columns") {
    val err = spark.read.option("header", "true").csv(s"$outDir/reports/error_summary_geo.csv")
    assert(err.columns.length == 13)
    assert(err.count() > 0) // fixture has 404/503/503 rows
    assert(err.select("elb_status_code").collect()
      .forall(r => { val c = r.getString(0).toInt; c >= 400 && c < 600 }))
  }

  test("bot reports: details parquet + origin summary CSV") {
    val bots = spark.read.parquet(s"$outDir/reports/bot_traffic_details.parquet")
    assert(bots.count() == 1) // one Googlebot line in the fixture
    val summary = spark.read.option("header", "true")
      .csv(s"$outDir/reports/bot_traffic_by_origin_summary.csv")
    assert(summary.columns.toSeq == Seq("countryName", "isp", "bot_request_count"))
  }

  test("second run reuses the geo cache (no resolver calls) and overwrites cleanly") {
    val fixture = ElbFixtures.standardFixture()
    Pipeline.run(spark, Pipeline.Config(
      Seq(fixture), outDir, s"$outDir/ip_geolocation_cache.parquet",
      resolver = _ => throw new IllegalStateException("cache should be warm")))
    assert(spark.read.parquet(s"$outDir/cleaned_logs").count() > 0)
  }
}
