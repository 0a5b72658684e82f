package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.SyntheticWarc

/** WARC/WET container-source queries (round 13): the
  * [[graft.sources.WarcDataSource]] container walk, header parse, payload
  * handling, type pushdown, and streaming offsets all sit under the
  * rows+schema+hash gate. The oracle side reads the SAME logical records
  * from a parquet staging table generated distributed from
  * [[SyntheticWarc.record]] — NOT re-read from the containers — so the
  * container encode→walk round-trip is exactly what the hash check
  * proves (the q18/q97 stageRawLines discipline).
  */
object WarcQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Same SF→size law as the ELB corpus: the driver verifies at sf0.01
    * against static oracle SQL embedding the verify-size staging path;
    * only the bench SFs diverge (sf0.1 10×, local sf1 decade 100×).
    */
  private[graft] def rowsFor(dir: String): Int =
    if (dir.endsWith("sf0.1")) 200000
    else if (dir.endsWith("sf1")) 2000000
    else 20000
  private[graft] val verifyRows = 20000

  private def stagedPath(n: Int): String =
    SyntheticWarc.dirFor(n).resolve("_staged").resolve("records.parquet").toString

  private val stagedOnce = scala.collection.concurrent.TrieMap.empty[Int, Boolean]

  /** Stage the corpus's logical records as parquet for the DuckDB side —
    * generated distributed (`spark.range` → `record(i)`), never re-read
    * from the `.warc.gz` containers.
    */
  private def stage(s: SparkSession, n: Int): Unit =
    stagedOnce.getOrElseUpdate(n, {
      import s.implicits._
      s.range(n).map(i => SyntheticWarc.record(i))
        .select(col("i"), col("warcType").as("warc_type"),
          col("recordId").as("record_id"), col("targetUri").as("target_uri"),
          col("dateMs").as("date_ms"), col("contentType").as("content_type"),
          col("payloadText").as("payload_text"))
        .coalesce(4).write.mode("overwrite").parquet(stagedPath(n))
      true
    })

  private def scan(s: SparkSession, dir: String): DataFrame = {
    val n = rowsFor(dir)
    val glob = SyntheticWarc.dataset(n)
    stage(s, n)
    s.read.format("warc").load(glob)
  }

  // ————————————————————————————— WET extracted-text scan (q359)
  // (the entry point of a crawl→corpus build: conversion records only —
  //  the warc_type equality pushes down, so request/response/metadata
  //  payloads are skipped, never allocated — with the text fingerprint,
  //  byte length, host, and event-time surfaced for the downstream
  //  dedup/quality pipeline. Record-level output = maximal hash surface
  //  over the walk: every header field and every payload byte counts.)
  val q359WarcWet: Q = (s, dir) =>
    scan(s, dir)
      .where(col("ok") && col("warc_type") === "conversion")
      .select(col("record_id"), col("target_uri"),
        regexp_extract(col("target_uri"), "://([^/?#]+)", 1).as("host"),
        unix_millis(col("warc_date")).as("date_ms"),
        col("content_length"),
        length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("fp"))
  private val q359Sql: String = s"""
    SELECT record_id, target_uri,
      regexp_extract(target_uri, '://([^/?#]+)', 1) AS host,
      date_ms,
      CAST(length(payload_text) AS BIGINT) AS content_length,
      CAST(length(payload_text) AS BIGINT) AS n_bytes,
      md5(payload_text) AS fp
    FROM read_parquet('${stagedPath(verifyRows)}/*.parquet')
    WHERE warc_type = 'conversion'"""

  // ————————————————————————————— HTTP response dissection (q360)
  // (WARC `response` records carry the raw HTTP exchange: status line,
  //  headers, body after the first CRLFCRLF. Dissection is string math
  //  shared verbatim with the oracle — strpos/locate for the header
  //  boundary, anchored regexes that always match the synthetic
  //  corpus — so no engine's regex dialect quirks are in play.)
  val q360WarcHttp: Q = (s, dir) =>
    scan(s, dir)
      .where(col("ok") && col("warc_type") === "response")
      .select(col("record_id"),
        decode(col("payload"), "UTF-8").as("t"))
      .select(col("record_id"),
        regexp_extract(col("t"), "^HTTP/1\\.1 (\\d+)", 1).as("status"),
        regexp_extract(col("t"), "Content-Type: ([^\r\n]+)", 1).as("http_content_type"),
        regexp_extract(col("t"), "<title>([^<]*)</title>", 1).as("title"),
        (length(col("t")) - locate("\r\n\r\n", col("t")) - lit(3))
          .cast("long").as("body_chars"))
  private val q360Sql: String = s"""
    SELECT record_id,
      regexp_extract(payload_text, 'HTTP/1\\.1 (\\d+)', 1) AS status,
      regexp_extract(payload_text, 'Content-Type: ([^\r\n]+)', 1) AS http_content_type,
      regexp_extract(payload_text, '<title>([^<]*)</title>', 1) AS title,
      CAST(length(payload_text)
        - strpos(payload_text, chr(13)||chr(10)||chr(13)||chr(10)) - 3
        AS BIGINT) AS body_chars
    FROM read_parquet('${stagedPath(verifyRows)}/*.parquet')
    WHERE warc_type = 'response'"""

  // ————————————————————————————— record-type inventory (q361)
  // (header-only scan: payload is pruned OUT of the projection, so the
  //  reader skips every payload byte — the shape of a 100 TB crawl
  //  audit. The isin pushes down as In; warcinfo records exist only in
  //  the containers (one per file, not staged), so the In filter is
  //  also what keeps engine and oracle over the same record set.)
  val q361WarcTypes: Q = (s, dir) =>
    scan(s, dir)
      .where(col("ok") && col("warc_type")
        .isin("conversion", "request", "response", "metadata"))
      .groupBy("warc_type")
      .agg(count(lit(1)).as("n"),
        sum("content_length").as("bytes"),
        countDistinct("target_uri").as("n_uri"))
  private val q361Sql: String = s"""
    SELECT warc_type, count(*) AS n,
      CAST(sum(length(payload_text)) AS BIGINT) AS bytes,
      count(DISTINCT target_uri) AS n_uri
    FROM read_parquet('${stagedPath(verifyRows)}/*.parquet')
    WHERE warc_type IN ('conversion', 'request', 'response', 'metadata')
    GROUP BY 1"""

  // ————————————————————————————— streaming container ingest (q362)
  // (the same source through `readStream.format("warc")`: file-count
  //  offsets over the sorted container listing, drained AvailableNow
  //  into a per-host rollup — the q98 pattern; the batch oracle equals
  //  the drain because the aggregation is order-free.)
  private val streamCounter = new java.util.concurrent.atomic.AtomicLong()
  val q362WarcStream: Q = (s, dir) => {
    val n = rowsFor(dir)
    val glob = SyntheticWarc.dataset(n)
    stage(s, n)
    val agg = s.readStream.format("warc").load(glob)
      .where(col("ok") && col("warc_type") === "conversion")
      .groupBy(regexp_extract(col("target_uri"), "://([^/?#]+)", 1).as("host"))
      .agg(count(lit(1)).as("n"), sum("content_length").as("bytes"))
    graft.streaming.StreamingSessions.drainAvailableNow(s, agg,
      s"warc_stream_${streamCounter.incrementAndGet()}",
      noDataBatch = false) // Complete-mode aggregate: teardown-only batch
  }
  private val q362Sql: String = s"""
    SELECT regexp_extract(target_uri, '://([^/?#]+)', 1) AS host,
      count(*) AS n,
      CAST(sum(length(payload_text)) AS BIGINT) AS bytes
    FROM read_parquet('${stagedPath(verifyRows)}/*.parquet')
    WHERE warc_type = 'conversion'
    GROUP BY 1"""

  val all: Map[String, Q] = Map(
    "q359_warc_wet" -> q359WarcWet,
    "q360_warc_http" -> q360WarcHttp,
    "q361_warc_types" -> q361WarcTypes,
    "q362_warc_stream" -> q362WarcStream)

  val oracles: Map[String, String] = Map(
    "q359_warc_wet" -> q359Sql,
    "q360_warc_http" -> q360Sql,
    "q361_warc_types" -> q361Sql,
    "q362_warc_stream" -> q362Sql)
}
