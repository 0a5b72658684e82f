package graft

import graft.elb.ElbFixtures
import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Golden-output gate for the four sinks: `Pipeline.run` over the fixed
  * fixture must reproduce checked-in schemas and row digests exactly.
  * Catches sink-layer regressions (zero-padded partition dirs, %z time
  * serialization, null-group drop, column selections) without re-deriving
  * anything. The digest is canonical — columns sorted by name, rows
  * sorted, values stringified — so layout-only changes (file count,
  * row order) don't trip it, value changes do. `log_source_file` is
  * excluded: it embeds the fixture's temp path.
  */
class GoldenPipelineSpec extends SparkSpec {

  private lazy val outDir = {
    val out = Files.createTempDirectory("golden-out").toString
    Pipeline.run(spark, Pipeline.Config(
      Seq(ElbFixtures.standardFixture()), out, s"$out/geo_cache.parquet"))
    out
  }

  private def canon(df: DataFrame): (String, String) = {
    val kept = df.columns.filterNot(_ == "log_source_file").sorted
    val schema = df.schema.fields.filterNot(_.name == "log_source_file")
      .sortBy(_.name).map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
    // cast to string IN SPARK: timestamp/double rendering then follows
    // the session timezone (UTC) and Spark's formatting rules, not the
    // JVM default timezone / Java toString of the test host
    val rows = df.select(kept.map(c => col(c).cast("string")).toSeq: _*)
      .collect()
      .map(_.toSeq.map(v => if (v == null) "\u0000" else v.toString)
        .mkString("\u0001"))
      .sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach(r => md.update(r.getBytes("UTF-8")))
    (schema, md.digest().map("%02x".format(_)).mkString)
  }

  private def check(name: String, df: DataFrame,
      goldenSchema: String, goldenDigest: String): Unit = {
    val (schema, dig) = canon(df)
    assert(schema == goldenSchema, s"$name schema drifted:\n got $schema")
    assert(dig == goldenDigest, s"$name rows drifted: got digest $dig")
  }

  test("cleaned logs match golden") {
    check("cleaned_logs", spark.read.parquet(s"$outDir/cleaned_logs"),
      "actions_executed:string,api_fetch_timestamp:timestamp,chosen_cert_arn:string,city:string,classification:string,classification_reason:string,client_ip:string,client_ip_port:string,countryCode:string,countryName:string,day:int,domain_name:string,elb:string,elb_status_code:int,error_reason:string,full_url:string,hostname:string,http_method:string,http_version:string,is_bot:boolean,isp:string,lat:double,lon:double,matched_rule_priority:string,message:string,month:int,new_session:boolean,path:string,path_depth:int,path_main_segment:string,port:int,prev_time:timestamp,protocol:string,query:string,query_params:string,received_bytes:bigint,redirect_url:string,region:string,regionName:string,request:string,request_creation_time:string,request_day:tinyint,request_day_of_week:string,request_hour:tinyint,request_month:tinyint,request_processing_time:string,request_week_of_year:tinyint,request_year:smallint,response_processing_time:string,rolling_1h_avg_proc_time:double,rolling_5min_req_count:bigint,sent_bytes:bigint,session_id:string,session_no:int,ssl_cipher:string,ssl_protocol:string,status:string,status_code_type:string,target_group_arn:string,target_ip_port:string,target_port_list:string,target_processing_time:string,target_status_code:int,target_status_code_list:string,time:string,time_diff_min:double,total_processing_time_ms:float,trace_id:string,type:string,ua_browser_family:string,ua_os_family:string,user_agent:string,year:int", "52943d2df98d53d8f1ab9d3b13ecbbaf")
  }

  test("hourly aggregation matches golden") {
    check("hourly", spark.read.parquet(
      s"$outDir/aggregated_stats/hourly_traffic_by_geo.parquet"),
      "average_total_processing_time:double,city:string,count_2xx:bigint,count_4xx:bigint,count_5xx:bigint,countryName:string,median_total_processing_time:double,request_count:bigint,request_day:tinyint,request_hour:tinyint,request_month:tinyint,request_year:smallint,sum_received_bytes:bigint,sum_sent_bytes:bigint,unique_client_ips_count:bigint", "d3a2f84a0162995327eda3019d0fd7ba")
  }

  test("error report matches golden") {
    check("errors", spark.read.option("header", "true")
      .csv(s"$outDir/reports/error_summary_geo.csv"),
      "city:string,client_ip:string,countryName:string,elb_status_code:string,error_reason:string,full_url:string,http_method:string,isp:string,target_status_code_list:string,time:string,ua_browser_family:string,ua_os_family:string,user_agent:string", "4eb797ac151e653b0ec20b00926efc61")
  }

  test("bot reports match golden") {
    check("bot_details", spark.read.parquet(
      s"$outDir/reports/bot_traffic_details.parquet"),
      "actions_executed:string,api_fetch_timestamp:timestamp,chosen_cert_arn:string,city:string,classification:string,classification_reason:string,client_ip:string,client_ip_port:string,countryCode:string,countryName:string,domain_name:string,elb:string,elb_status_code:int,error_reason:string,full_url:string,hostname:string,http_method:string,http_version:string,is_bot:boolean,isp:string,lat:double,lon:double,matched_rule_priority:string,message:string,new_session:boolean,path:string,path_depth:int,path_main_segment:string,port:int,prev_time:timestamp,protocol:string,query:string,query_params:string,received_bytes:bigint,redirect_url:string,region:string,regionName:string,request:string,request_creation_time:string,request_day:tinyint,request_day_of_week:string,request_hour:tinyint,request_month:tinyint,request_processing_time:string,request_week_of_year:tinyint,request_year:smallint,response_processing_time:string,rolling_1h_avg_proc_time:double,rolling_5min_req_count:bigint,sent_bytes:bigint,session_id:string,session_no:int,ssl_cipher:string,ssl_protocol:string,status:string,status_code_type:string,target_group_arn:string,target_ip_port:string,target_port_list:string,target_processing_time:string,target_status_code:int,target_status_code_list:string,time:string,time_diff_min:double,total_processing_time_ms:float,trace_id:string,type:string,ua_browser_family:string,ua_os_family:string,user_agent:string", "1a5f383be1c041b4ee521b5642f522d8")
    check("bot_summary", spark.read.option("header", "true")
      .csv(s"$outDir/reports/bot_traffic_by_origin_summary.csv"),
      "bot_request_count:string,countryName:string,isp:string", "112f2f67451a44291c745516ea1fbcfc")
  }
}
