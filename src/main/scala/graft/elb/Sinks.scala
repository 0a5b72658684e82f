package graft.elb

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** The four output sinks (reference: advanced_elb_logs_etl.py:326-393).
  *
  * Exact-semantics notes (SURVEY.md §7.4):
  *  - partition dirs are zero-padded (`month=05`) → partition on
  *    pre-formatted *string* columns, matching the reference's f-strings
  *    (advanced_elb_logs_etl.py:333-334);
  *  - pandas groupby drops null-keyed groups, so rows without a
  *    countryCode are absent from the cleaned output (the reference's
  *    'UNK' branch is dead code) — reproduced with an explicit filter;
  *  - `time` is serialized as an Eastern local string with offset
  *    (`%Y-%m-%d %H:%M:%S%z`) on every sink;
  *  - the reference's per-partition all-null column drop is a documented
  *    deviation (plan schemas are fixed; all-null and absent columns read
  *    identically under parquet schema merge).
  */
object Sinks {

  /** Eastern local render with RFC-822 offset, matching strftime `%z`.
    *
    * `date_format(..., "Z")` renders the *session* zone's offset (UTC here),
    * not the shifted zone's, so the offset is computed explicitly from the
    * wall-clock delta that `from_utc_timestamp` applied — DST-correct via
    * the zone rules, e.g. `-0400` in summer, `-0500` in winter.
    */
  def timeString(c: Column): Column = {
    val local = from_utc_timestamp(c, ElbSchema.localZone)
    val offMin = ((unix_millis(local) - unix_millis(c)) / lit(60000L)).cast("int")
    concat(
      date_format(local, "yyyy-MM-dd HH:mm:ss"),
      format_string("%+03d%02d", (offMin / 60).cast("int"), abs(offMin % 60).cast("int")))
  }

  /** K1: cleaned logs partitioned by year/month/day/countryCode.
    *
    * The repartition on the partition keys routes each output directory's
    * rows to ONE task, so every dir holds one parquet file instead of
    * one-per-shuffle-partition (measured: 960 → ~#dirs files on the 200k
    * corpus). Without it, a 100 TB run with thousands of reducers sprays
    * every dir with thousands of small files — the small-file problem at
    * the sink.
    *
    * `filesPerDir` > 1 is the hot-partition escape hatch: one
    * country/day dominating the corpus otherwise serializes its whole
    * write into a single task. A bounded salt (hash of ip+time, so the
    * spread is deterministic and independent of the dir keys' skew) is
    * added to the REPARTITION ONLY — the written rows and the directory
    * layout are unchanged; each dir just holds at most `filesPerDir`
    * parquet files, written by up to that many parallel tasks. AQE's
    * partition coalescing composes correctly with the salt: salt groups
    * of a genuinely hot dir exceed the advisory partition size and stay
    * parallel, while small dirs' groups are merged back — so the knob
    * can be left on without spraying small dirs.
    */
  def writeCleanedLogs(df: DataFrame, outDir: String, filesPerDir: Int = 1): Unit = {
    require(filesPerDir >= 1, s"filesPerDir must be >= 1, got $filesPerDir")
    val staged = df.filter(col("countryCode").isNotNull)
      .withColumn("time", timeString(col("time")))
      .withColumn("year", col("request_year").cast("string"))
      .withColumn("month", format_string("%02d", col("request_month")))
      .withColumn("day", format_string("%02d", col("request_day")))
    val dirKeys = Seq(col("year"), col("month"), col("day"), col("countryCode"))
    val routed =
      if (filesPerDir == 1) staged.repartition(dirKeys: _*)
      else staged.repartition(
        dirKeys :+ pmod(hash(col("client_ip"), col("time")), lit(filesPerDir)): _*)
    routed.write.partitionBy("year", "month", "day", "countryCode")
      .mode("overwrite").parquet(s"$outDir/cleaned_logs")
  }

  /** A1 + K2: hourly traffic rollup by geo.
    *
    * `exact = true` reproduces the reference bit-for-bit (exact distinct
    * count + exact median). At 100 TB both are the rollup's only
    * full-shuffle-width measures; `exact = false` swaps in
    * `approx_count_distinct` (HLL++, mergeable sketch) and
    * `approx_percentile` — constant-size partial state, same shuffle
    * shape as the sums.
    */
  def hourlyAggregation(df: DataFrame, exact: Boolean = true): DataFrame = {
    val uniqueIps =
      if (exact) countDistinct(col("client_ip"))
      else approx_count_distinct(col("client_ip"))
    val medianProc =
      if (exact) median(col("total_processing_time_ms"))
      else approx_percentile(col("total_processing_time_ms"), lit(0.5), lit(10000))
        .cast("double")
    df.filter(col("countryName").isNotNull && col("city").isNotNull)
      .groupBy(col("request_year"), col("request_month"), col("request_day"),
        col("request_hour"), col("countryName"), col("city"))
      .agg(
        count(col("client_ip")).as("request_count"),
        uniqueIps.as("unique_client_ips_count"),
        avg(col("total_processing_time_ms")).as("average_total_processing_time"),
        medianProc.as("median_total_processing_time"),
        sum(col("sent_bytes")).as("sum_sent_bytes"),
        sum(col("received_bytes")).as("sum_received_bytes"),
        count_if(col("status_code_type") === "2xx_Success").as("count_2xx"),
        count_if(col("status_code_type") === "4xx_ClientError").as("count_4xx"),
        count_if(col("status_code_type") === "5xx_ServerError").as("count_5xx"))
  }

  def writeHourlyAggregation(df: DataFrame, outDir: String): Unit =
    hourlyAggregation(df).coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/aggregated_stats/hourly_traffic_by_geo.parquet")

  /** F5 + K3: 4xx/5xx error rows, selected columns, CSV with header. */
  def errorReport(df: DataFrame): DataFrame =
    df.filter(col("status_code_type").isin("4xx_ClientError", "5xx_ServerError"))
      .withColumn("time", timeString(col("time")))
      .select("time", "client_ip", "city", "countryName", "isp", "http_method",
        "full_url", "elb_status_code", "target_status_code_list", "user_agent",
        "ua_browser_family", "ua_os_family", "error_reason")

  def writeErrorReport(df: DataFrame, outDir: String): Unit =
    errorReport(df).coalesce(1).write.mode("overwrite").option("header", "true")
      .csv(s"$outDir/reports/error_summary_geo.csv")

  /** F6 + K2/K3 + A2: bot detail parquet + per-origin summary CSV. */
  def botAggregation(bots: DataFrame): DataFrame =
    bots.filter(col("countryName").isNotNull && col("isp").isNotNull)
      .groupBy(col("countryName"), col("isp"))
      .agg(count(lit(1)).as("bot_request_count"))

  def writeBotReports(df: DataFrame, outDir: String): Unit = {
    val bots = df.filter(col("is_bot"))
      .withColumn("time", timeString(col("time")))
    bots.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/reports/bot_traffic_details.parquet")
    botAggregation(bots).coalesce(1).write.mode("overwrite")
      .option("header", "true")
      .csv(s"$outDir/reports/bot_traffic_by_origin_summary.csv")
  }

  /** K4: first-N sample as JSON lines (driver-side, for logging). */
  def sampleJson(df: DataFrame, n: Int = 5): Seq[String] =
    df.limit(n).toJSON.collect().toSeq
}
