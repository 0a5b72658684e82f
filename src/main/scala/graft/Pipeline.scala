package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel
import graft.elb.{ElbParser, Features, Sinks}
import graft.geo.{GeoCache, GeoResolver, OfflineGeoResolver}

/** The full batch pipeline — the reference's `main()` as one lazy DataFrame
  * DAG (reference: advanced_elb_logs_etl.py:395-442):
  *
  *   scan+parse → geo enrich (cached, effectful, driver-side misses) →
  *   feature windows → { cleaned parquet, hourly agg, error CSV, bot reports }
  *
  * The feature-complete frame is persisted once and fanned out to the four
  * sinks — Spark recomputes per action otherwise, which is a *correctness*
  * problem here (the geo stage is effectful), not just 4× work (SURVEY.md
  * §7.4.7). MEMORY_AND_DISK keeps the stage spill-safe at scale.
  */
object Pipeline {

  final case class Config(
      inputGlobs: Seq[String],
      outputDir: String,
      geoCachePath: String,
      resolver: GeoResolver = new OfflineGeoResolver())

  /** Runs the pipeline; returns the sample JSON lines (reference logs them). */
  def run(spark: SparkSession, config: Config): Seq[String] = {
    val parsed = ElbParser.parse(spark, config.inputGlobs)
    val sample = Sinks.sampleJson(parsed)
    val enriched = GeoCache.enrich(spark, parsed, config.geoCachePath, config.resolver)
    val fin = Features(enriched).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      Sinks.writeCleanedLogs(fin, config.outputDir)
      Sinks.writeHourlyAggregation(fin, config.outputDir)
      Sinks.writeErrorReport(fin, config.outputDir)
      Sinks.writeBotReports(fin, config.outputDir)
    } finally fin.unpersist()
    sample
  }
}
