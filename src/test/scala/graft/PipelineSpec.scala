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

  test("hot-dir salt bounds files per dir and leaves rows + layout unchanged") {
    import graft.elb.{ElbParser, Features, Sinks, SyntheticElb}
    import graft.geo.{GeoCache, OfflineGeoResolver}
    val glob = SyntheticElb.dataset(2000)
    val cache = Files.createTempDirectory("salt-geo").resolve("cache.parquet").toString
    val fin = Features(GeoCache.enrich(spark,
      ElbParser.parse(spark, Seq(glob)), cache, new OfflineGeoResolver()))
    val base = Files.createTempDirectory("salt-base").toString
    val salted = Files.createTempDirectory("salt-k3").toString
    Sinks.writeCleanedLogs(fin, base)
    // AQE correctly re-merges SMALL salt groups (at scale only hot dirs
    // stay spread); disable coalescing here so the spread is observable
    // on this tiny corpus
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(key, "false")
    try Sinks.writeCleanedLogs(fin, salted, filesPerDir = 3)
    finally spark.conf.unset(key)
    def leafDirs(f: java.io.File): Seq[java.io.File] =
      if (f.getName.startsWith("countryCode=")) Seq(f)
      else f.listFiles().filter(_.isDirectory).toSeq.flatMap(leafDirs)
    val counts = leafDirs(new java.io.File(s"$salted/cleaned_logs"))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
    assert(counts.nonEmpty)
    counts.foreach { case (d, n) =>
      assert(n >= 1 && n <= 3, s"dir $d has $n files (cap 3)") }
    assert(counts.map(_._2).sum > counts.size,
      "the salt should spread at least one dir across multiple files")
    // identical rows and identical dir layout — only the file count changed
    val b = spark.read.parquet(s"$base/cleaned_logs")
    val s = spark.read.parquet(s"$salted/cleaned_logs")
    assert(s.count() == b.count() && s.count() > 0)
    assert(s.exceptAll(b).count() == 0 && b.exceptAll(s).count() == 0)
    val dirNames = (root: String) => leafDirs(new java.io.File(s"$root/cleaned_logs"))
      .map(_.getPath.stripPrefix(root)).toSet
    assert(dirNames(salted).map(_.replaceFirst("/[^/]*cleaned_logs", "")) ==
      dirNames(base).map(_.replaceFirst("/[^/]*cleaned_logs", "")))
  }

  test("second run reuses the geo cache (no resolver calls) and overwrites cleanly") {
    val fixture = ElbFixtures.standardFixture()
    Pipeline.run(spark, Pipeline.Config(
      Seq(fixture), outDir, s"$outDir/ip_geolocation_cache.parquet",
      resolver = _ => throw new IllegalStateException("cache should be warm")))
    assert(spark.read.parquet(s"$outDir/cleaned_logs").count() > 0)
  }
}
