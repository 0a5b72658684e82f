package graft.elb

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced feature engineering: type refinement, status bucketing, local
  * time parts, path features, and the per-client ordered window block
  * (lag → gap → sessionization → rolling frames).
  *
  * Re-expresses reference behavior (advanced_elb_logs_etl.py:279-320):
  *  - sentinel int casts of status/byte counters (:284-287)
  *  - status class bucketing (:268-277, :290)
  *  - Eastern-local time parts with narrow int casts (:292-298)
  *  - path depth / main segment incl. the astype(str) null→0 quirk (:300-301)
  *  - 30-minute-gap sessionization (:303-308)
  *  - 5-min / 60-min *half-open* time-range rolling windows (:310-319)
  *
  * Scale notes: all four windows share one partitioning (`client_ip`) and
  * one sort key (`_ts_us`), so Catalyst plans a single hash-partition
  * exchange + one sort for the whole block — at 100 TB this is the only
  * wide dependency in the feature stage, keyed on a high-cardinality column
  * (client IP) that distributes well; AQE handles residual skew (hot IPs).
  */
object Features {

  /** Status-code class bucket; null/unparseable → Unknown
    * (reference: advanced_elb_logs_etl.py:268-277).
    */
  def statusCodeType(code: Column): Column =
    when(code.between(100, 199), "1xx_Informational")
      .when(code.between(200, 299), "2xx_Success")
      .when(code.between(300, 399), "3xx_Redirection")
      .when(code.between(400, 499), "4xx_ClientError")
      .when(code.between(500, 599), "5xx_ServerError")
      .otherwise("Unknown")

  /** Pandas-style time-range rolling frame: half-open `(t-w, t]` — Spark
    * range frames are closed on both ends, so the lower bound shrinks by
    * one microsecond (the sort key is epoch micros).
    */
  private def halfOpenTrailing(w: org.apache.spark.sql.expressions.WindowSpec,
      windowMicros: Long) =
    w.rangeBetween(-(windowMicros - 1), Window.currentRow)

  val fiveMinUs: Long = 5L * 60 * 1000000
  val oneHourUs: Long = 60L * 60 * 1000000

  def apply(df: DataFrame): DataFrame = {
    val local = from_utc_timestamp(col("time"), ElbSchema.localZone)

    val typed = df
      // F4: rows missing the critical key are dropped
      .filter(col("client_ip").isNotNull)
      .withColumns(Map(
        "elb_status_code" -> ElbParser.nullSentinelLong(col("elb_status_code")).cast("int"),
        "target_status_code" -> ElbParser.nullSentinelLong(col("target_status_code")).cast("int"),
        "received_bytes" -> ElbParser.nullSentinelLong(col("received_bytes")),
        "sent_bytes" -> ElbParser.nullSentinelLong(col("sent_bytes")),
        "total_processing_time_ms" -> col("total_processing_time_ms").cast("float")
      ))
      .withColumns(Map(
        "status_code_type" -> statusCodeType(col("elb_status_code")),
        "request_year" -> year(local).cast("short"),
        "request_month" -> month(local).cast("byte"),
        "request_day" -> dayofmonth(local).cast("byte"),
        "request_hour" -> hour(local).cast("byte"),
        "request_day_of_week" -> date_format(local, "EEEE"),
        "request_week_of_year" -> weekofyear(local).cast("byte"),
        // null path stringifies to "None" in the reference ⇒ depth 0, one token
        "path_depth" -> coalesce(regexp_count(col("path"), lit("/")), lit(0)).cast("int"),
        "path_main_segment" -> when(size(split(col("path"), "/")) > 1,
          element_at(split(col("path"), "/"), 2))
      ))

    // ——— ordered window block: one exchange (client_ip) + one sort.
    // trace_id (unique per request in ALB logs) breaks same-microsecond
    // ties so lag/new_session assignment is run-deterministic — pandas got
    // this for free from its stable sort of the input order
    val sortKeys =
      if (typed.columns.contains("trace_id")) Seq(col("_ts_us"), col("trace_id"))
      else Seq(col("_ts_us"))
    val byIp = Window.partitionBy("client_ip").orderBy(sortKeys: _*)
    val runningRows = byIp.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // range frames must order by the single numeric key (and don't need
    // the tiebreak: RANGE includes all same-value peers regardless)
    val byIpRange = Window.partitionBy("client_ip").orderBy("_ts_us")

    typed
      .withColumn("_ts_us", unix_micros(col("time")))
      .withColumn("prev_time", lag(col("time"), 1).over(byIp))
      .withColumn("time_diff_min",
        (col("_ts_us") - unix_micros(col("prev_time"))) / lit(60e6))
      .withColumn("new_session",
        col("time_diff_min") > 30 || col("time_diff_min").isNull)
      .withColumn("session_no",
        sum(when(col("new_session"), 1).otherwise(0)).over(runningRows).cast("int"))
      .withColumn("session_id",
        concat(col("session_no").cast("string"), lit("-"), col("client_ip")))
      .withColumn("rolling_5min_req_count",
        count(col("request")).over(halfOpenTrailing(byIpRange, fiveMinUs)))
      .withColumn("rolling_1h_avg_proc_time",
        avg(col("total_processing_time_ms")).over(halfOpenTrailing(byIpRange, oneHourUs)))
      .drop("_ts_us")
  }
}
