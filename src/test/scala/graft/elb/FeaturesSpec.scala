package graft.elb

import graft.SparkSpec
import org.apache.spark.sql.Row
import java.sql.Timestamp

class FeaturesSpec extends SparkSpec {

  lazy val featured = {
    val path = ElbFixtures.standardFixture()
    Features(ElbParser.parse(spark, Seq(path))).cache()
  }

  def sessionRows: Array[Row] =
    featured.filter(featured("client_ip") === "10.1.1.1")
      .orderBy("time").collect()

  test("status bucketing and typed casts") {
    val golden = featured.filter(featured("client_ip") === "3.135.238.214").collect().head
    assert(golden.getAs[Int]("elb_status_code") == 200)
    assert(golden.getAs[String]("status_code_type") == "2xx_Success")
    assert(golden.getAs[Long]("sent_bytes") == 1013L)
    val dash = featured.filter(featured("client_ip") === "10.0.0.1").collect().head
    assert(dash.isNullAt(dash.fieldIndex("elb_status_code")))
    assert(dash.getAs[String]("status_code_type") == "Unknown")
  }

  test("time parts are Eastern-local") {
    // golden: 2025-05-26T23:55:02Z = 2025-05-26 19:55:02 EDT (UTC-4)
    val g = featured.filter(featured("client_ip") === "3.135.238.214").collect().head
    assert(g.getAs[Short]("request_year") == 2025)
    assert(g.getAs[Byte]("request_month") == 5)
    assert(g.getAs[Byte]("request_day") == 26)
    assert(g.getAs[Byte]("request_hour") == 19)
    assert(g.getAs[String]("request_day_of_week") == "Monday")
  }

  test("path features incl. null-path quirk") {
    val g = featured.filter(featured("client_ip") === "3.135.238.214").collect().head
    assert(g.getAs[Int]("path_depth") == 2) // "/api/browser-ext-user"
    assert(g.getAs[String]("path_main_segment") == "api")
    val deep = featured.filter(featured("client_ip") === "10.0.0.2").collect().head
    assert(deep.getAs[Int]("path_depth") == 3) // /a/b/c
    assert(deep.getAs[String]("path_main_segment") == "a")
    // malformed request → null path → depth 0, null segment (astype(str) quirk)
    val bad = featured.filter(featured("client_ip") === "10.0.0.5").collect().head
    assert(bad.getAs[Int]("path_depth") == 0)
    assert(bad.isNullAt(bad.fieldIndex("path_main_segment")))
  }

  test("sessionization: 30-min gap starts a new session") {
    val rows = sessionRows
    assert(rows.length == 7) // 4-burst + 3-burst
    val sessionIds = rows.map(_.getAs[String]("session_id")).toSeq
    // first burst session 1, second burst (40-min gap) session 2
    assert(sessionIds.take(4).forall(_ == "1-10.1.1.1"))
    assert(sessionIds.drop(4).forall(_ == "2-10.1.1.1"))
    val newFlags = rows.map(_.getAs[Boolean]("new_session")).toSeq
    assert(newFlags == Seq(true, false, false, false, true, false, false))
    // gap of burst2 start = 12:40 - 12:03 = 37 min
    assert(math.abs(rows(4).getAs[Double]("time_diff_min") - 37.0) < 1e-9)
  }

  test("rolling 5-min count is half-open (row exactly 5 min earlier excluded)") {
    val rows = sessionRows
    // burst1 at 12:00,12:01,12:02,12:03 → counts 1,2,3,4 (all within 5 min)
    assert(rows.take(4).map(_.getAs[Long]("rolling_5min_req_count")).toSeq == Seq(1L, 2L, 3L, 4L))
    // burst2 at 12:40,12:41,12:42 → window restarts: 1,2,3
    assert(rows.drop(4).map(_.getAs[Long]("rolling_5min_req_count")).toSeq == Seq(1L, 2L, 3L))
  }

  test("rolling 5-min half-open boundary: event exactly 300s earlier drops out") {
    import spark.implicits._
    val df = Seq(
      ("1.1.1.1", Timestamp.valueOf("2025-01-01 00:00:00")),
      ("1.1.1.1", Timestamp.valueOf("2025-01-01 00:05:00"))
    ).toDF("client_ip", "time")
      .withColumn("request", org.apache.spark.sql.functions.lit("GET / HTTP/1.1"))
      .withColumn("total_processing_time_ms", org.apache.spark.sql.functions.lit(1.0))
    val cols = Seq("client_ip_port", "target_ip_port", "request_processing_time",
      "target_processing_time", "response_processing_time", "elb_status_code",
      "target_status_code", "received_bytes", "sent_bytes", "user_agent", "path")
    val padded = cols.foldLeft(df)((d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, org.apache.spark.sql.functions.lit("-")))
    val out = Features(padded).orderBy("time").collect()
    // pandas rolling('5T') is (t-5min, t]: the 00:00:00 row is NOT in the
    // 00:05:00 row's window
    assert(out.map(_.getAs[Long]("rolling_5min_req_count")).toSeq == Seq(1L, 1L))
  }

  test("rolling 1h avg ignores nulls") {
    val rows = sessionRows
    // all rows have total 60.0 ms ⇒ avg stays 60
    assert(rows.forall(r => math.abs(r.getAs[Double]("rolling_1h_avg_proc_time") - 60.0) < 1e-6))
  }

  test("the whole window block plans ONE exchange and ONE sort") {
    val path = ElbFixtures.standardFixture()
    val featured = Features(ElbParser.parse(spark, Seq(path)))
    val plan = featured.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
    val sorts = plan.collect {
      case s: org.apache.spark.sql.execution.SortExec => s }
    // lag + sessionization + both rolling frames share the client_ip
    // partitioning and the _ts_us sort — the headline plan property the
    // feature stage relies on at 100 TB
    assert(exchanges.length == 1,
      s"expected exactly one shuffle, got ${exchanges.length}:\n$plan")
    assert(exchanges.head.toString.contains("client_ip"))
    assert(sorts.length == 1,
      s"expected exactly one sort, got ${sorts.length}:\n$plan")
  }
}
