package graft.tools

import org.apache.spark.sql.SparkSession
import graft.elb.ElbParser

/** Minimal CLI over the parse stage: `runMain graft.tools.ElbParseCli
  * <path.gz> [<path.gz> ...]` — parses ALB access logs and prints the
  * derived columns, row counts, and a JSON sample. Doubles as the
  * library's smallest end-to-end driveable surface.
  */
object ElbParseCli {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ElbParseCli <path-or-glob> [...]")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("elb-parse-cli")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = ElbParser.parse(spark, args.toSeq).cache()
    val total = df.count()
    println(s"parsed_rows=$total")
    val derived = df.select("time", "client_ip", "http_method", "hostname", "port",
      "path", "query_params", "total_processing_time_ms", "ua_browser_family",
      "ua_os_family", "is_bot", "log_source_file")
    derived.show(20, truncate = false)
    println("sample_json:")
    df.limit(3).toJSON.collect().foreach(println)
    spark.stop()
  }
}
