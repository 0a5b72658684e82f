package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries — the
  * explain-audit loop (pushdown reaching scans, broadcast joins chosen,
  * exchange counts) run after correctness each round.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q02_pricing_summary", "q03_revenue_by_nation",
        "q09_rolling_5min_count", "q73_span_dedup", "q76_bloom_admission",
        "q80_ivfpq_ann")
    names.foreach { n =>
      println(s"########## $n ##########")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
