package graft.elb

import org.apache.spark.sql.types._

/** Schemas for the ELB access-log engine.
  *
  * The 29-column raw layout mirrors the reference's positional column list
  * (reference: advanced_elb_logs_etl.py:43-49). All fields are strings at
  * parse time — numeric/timestamp refinement happens in the parse projection
  * ([[ElbParser]]) and feature stage ([[Features]]), exactly as the reference
  * defers typing to its enrichment steps.
  */
object ElbSchema {

  /** Positional names of the 29 raw ALB access-log fields. */
  val rawColumns: Seq[String] = Seq(
    "type", "time", "elb", "client_ip_port", "target_ip_port",
    "request_processing_time", "target_processing_time",
    "response_processing_time", "elb_status_code", "target_status_code",
    "received_bytes", "sent_bytes", "request", "user_agent", "ssl_cipher",
    "ssl_protocol", "target_group_arn", "trace_id", "domain_name",
    "chosen_cert_arn", "matched_rule_priority", "request_creation_time",
    "actions_executed", "redirect_url", "error_reason", "target_port_list",
    "target_status_code_list", "classification", "classification_reason"
  )

  /** All-string 29-column schema used by the space-separated CSV tokenizer. */
  val raw: StructType =
    StructType(rawColumns.map(StructField(_, StringType, nullable = true)))

  /** Geolocation cache schema — 12 columns keyed on `query` = IP
    * (reference: advanced_elb_logs_etl.py:203-206). `api_fetch_timestamp`
    * is a UTC instant.
    */
  val geo: StructType = StructType(Seq(
    StructField("status", StringType),
    StructField("message", StringType),
    StructField("country", StringType),
    StructField("countryCode", StringType),
    StructField("region", StringType),
    StructField("regionName", StringType),
    StructField("city", StringType),
    StructField("lat", DoubleType),
    StructField("lon", DoubleType),
    StructField("isp", StringType),
    StructField("query", StringType),
    StructField("api_fetch_timestamp", TimestampType)
  ))

  /** Local timezone the reference renders timestamps in
    * (reference: advanced_elb_logs_etl.py:29). Instants are kept UTC
    * internally; this zone is applied only at derivation/format edges.
    */
  val localZone = "America/New_York"
}
