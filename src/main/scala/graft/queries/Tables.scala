package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Test-table loaders over the driver-generated parquet (TESTDATA.md).
  *
  * `events.ts` is nanosecond-precision parquet, which Spark 4 refuses as a
  * timestamp; sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`
  * (done by Verify/Bench/tests), and [[events]] converts the raw ns long to
  * a microsecond timestamp — the identical truncation DuckDB applies when
  * it reads the same file, so oracle comparisons line up exactly.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = t(spark, dir, "embeddings")

  /** `events` with `ts` as a proper µs timestamp (see scaladoc above). */
  def events(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events").withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Spark-session config required to read the ns-timestamp parquet. */
  val requiredConfig: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")
}
