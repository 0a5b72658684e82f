package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.elb.{ElbParser, Features, SyntheticElb, Sinks}
import graft.geo.{GeoCache, OfflineGeoResolver}

/** The ELB-domain pipeline surfaced as rows-only queries (the raw `.gz`
  * log format isn't a DuckDB-readable table, so these get the driver's
  * rows>0 check; their semantics are covered by the ScalaTest specs and
  * the relational oracles that exercise the same operators on harness
  * tables).
  *
  * The synthetic dataset size scales with the harness SF so the bench
  * measures parse throughput meaningfully.
  */
object ElbQueries {
  type Q = (SparkSession, String) => DataFrame

  private def rowsFor(dir: String): Int =
    if (dir.endsWith("sf0.1")) 200000
    else if (dir.endsWith("sf0.01")) 20000
    else 2000

  /** Shared featured frame for the ELB queries. Deliberately NOT
    * persisted: each query projects a narrow column subset, and letting
    * Catalyst prune per query is cheaper than materializing the full
    * 45-column frame (measured: persist made q18+q32 ~20% slower — the
    * Pipeline's persist-then-fan-out is right for its four sinks that
    * consume everything; it is wrong here).
    */
  // one cache path per corpus size, reused across invocations — a fresh
  // temp dir per call would re-resolve every distinct IP each time and
  // accumulate tmpdirs
  private val geoCachePaths =
    scala.collection.concurrent.TrieMap.empty[Int, String]

  private def featured(s: SparkSession, dir: String): DataFrame = {
    val rows = rowsFor(dir)
    val glob = SyntheticElb.dataset(rows)
    val parsed = ElbParser.parse(s, Seq(glob))
    val cachePath = geoCachePaths.getOrElseUpdate(rows, java.nio.file.Files
      .createTempDirectory(s"elbq-geo-$rows").resolve("cache.parquet").toString)
    val enriched = GeoCache.enrich(s, parsed, cachePath, new OfflineGeoResolver())
    Features(enriched)
  }

  /** Full reference pipeline minus sinks: parse → geo enrich (offline
    * resolver, temp cache) → feature windows.
    */
  val q18ElbPipeline: Q = (s, dir) =>
    featured(s, dir)
      .select("time", "client_ip", "http_method", "hostname", "path",
        "status_code_type", "countryName", "city", "is_bot",
        "session_id", "rolling_5min_req_count", "rolling_1h_avg_proc_time")

  /** The hourly rollup (A1) over the synthetic pipeline output. */
  val q32ElbHourlyRollup: Q = (s, dir) =>
    Sinks.hourlyAggregation(featured(s, dir))

  val all: Map[String, Q] = Map(
    "q18_elb_pipeline" -> q18ElbPipeline,
    "q32_elb_hourly_rollup" -> q32ElbHourlyRollup)

  /** No DuckDB oracles — raw-log domain; rows-only checks. */
  val oracles: Map[String, String] = Map.empty
}
