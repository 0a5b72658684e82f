package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Test-table loaders over the driver-generated parquet (TESTDATA.md).
  *
  * `events.ts` has shipped in two physical forms across testdata
  * generations: nanosecond int64 (read as long under
  * `spark.sql.legacy.parquet.nanosAsLong=true`, which Verify/Bench/tests
  * still set so either generation loads) and microsecond timestamp
  * (timezone-naive → TIMESTAMP_NTZ in Spark). [[events]] adapts to the
  * dtype the scan actually reports instead of hard-coding either contract:
  * ns-long is truncated to a µs timestamp (the identical truncation DuckDB
  * applies to a ns file), and NTZ is cast to the session-timezone timestamp
  * — an exact wall-clock identity because every engine session pins
  * `spark.sql.session.timeZone=UTC`, matching DuckDB's naive read of the
  * same file.
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
    normalizeEventTs(t(spark, dir, "events"))

  /** Adapt an events frame's `ts` to TimestampType regardless of which
    * physical contract the parquet was written under. Fails fast with a
    * named error on an unrecognized dtype — a silent mis-scale (ns read as
    * µs) is the failure mode this guards against.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => // ns int64 under nanosAsLong: truncate to µs
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // µs naive: wall-clock identity under UTC session
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts: unsupported physical dtype $other — expected ns int64, " +
          "TIMESTAMP_NTZ, or TIMESTAMP (see Tables scaladoc)")
    }

  /** Spark-session config required to read a ns-timestamp events parquet
    * generation (harmless for the µs-timestamp generation).
    */
  val requiredConfig: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** Columns every loader in this object assumes present, per table.
    * Dtypes are deliberately NOT pinned except where a loader branches on
    * them ([[normalizeEventTs]]) — the round-7 lesson is that the driver
    * may regenerate testdata under a different physical type, and the
    * engine should either adapt (events.ts) or keep working unchanged
    * (everything numeric reads through Spark's standard parquet
    * promotion). What CAN'T silently change is column presence.
    */
  val expectedColumns: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey", "r_name"),
    "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
      "c_mktsegment"),
    "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size",
      "p_retailprice"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"),
    "events" -> Seq("event_id", "ts", "user_id", "event_type", "value",
      "props"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  /** Startup data-contract guard for Verify/Bench: prints every table's
    * physical schema (one line each — the round-N diagnosis artifact) and
    * fails fast with a NAMED error when a loader assumption is violated,
    * instead of letting 36 queries die one analysis-exception at a time
    * (round 7) or — worse — mis-scale silently (the streaming µs-as-ns
    * failure mode). Checks: every expected column present, and `events.ts`
    * one of the dtypes [[normalizeEventTs]] handles.
    */
  def checkContract(spark: SparkSession, dir: String): Unit = {
    val problems = expectedColumns.toSeq.sortBy(_._1).flatMap {
      case (name, cols) =>
        try {
          val schema = t(spark, dir, name).schema
          System.err.println(s"[contract] $name: " + schema.fields
            .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", "))
          val missing = cols.filterNot(schema.fieldNames.contains)
          val tsBad = if (name == "events" && missing.isEmpty)
            schema("ts").dataType match {
              case LongType | TimestampNTZType | TimestampType => None
              case other => Some(s"events.ts unsupported dtype $other")
            } else None
          (if (missing.nonEmpty)
            Seq(s"$name missing columns: ${missing.mkString(", ")}")
          else Nil) ++ tsBad
        } catch { case e: Throwable =>
          Seq(s"$name unreadable: ${e.getMessage}")
        }
    }
    if (problems.nonEmpty) throw new IllegalStateException(
      "TESTDATA CONTRACT VIOLATION — " + problems.mkString("; "))
  }
}
