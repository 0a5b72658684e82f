package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale mechanics: skew-salted joins and bucketed (co-located) tables.
  *
  * AQE's skew-join handling covers most hot-key cases at runtime; explicit
  * salting remains the tool when a single key dominates so heavily that
  * even split partitions of it won't fit (e.g. one client IP emitting a
  * double-digit percent of 100 TB of logs), or when the skewed operation
  * is an aggregation rather than a join.
  */
object Scale {

  /** Inner/left equi-join with the big (skewed) side salted into
    * `numSalts` sub-keys and the small side replicated once per salt.
    * Results equal the plain join; the hot key's rows spread over
    * `numSalts` tasks instead of one.
    *
    * The salt is derived deterministically from `saltSource` (pick a
    * high-cardinality column of the big side, e.g. an event id).
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
      numSalts: Int, saltSource: Column, joinType: String = "inner"): DataFrame = {
    require(numSalts > 0)
    val salted = big.withColumn("_salt", pmod(abs(hash(saltSource)), lit(numSalts)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(numSalts - 1))))
    salted.join(replicated,
        salted(key) === replicated(key) && salted("_salt") === replicated("_salt"),
        joinType)
      .drop(replicated(key)).drop(salted("_salt")).drop(replicated("_salt"))
  }

  /** Skew-tolerant aggregation: two-phase (salted partial → final).
    * `aggs` must be decomposable (sum/count/min/max-style). Spark already
    * does map-side partial aggregation; this adds a *shuffle-level* split
    * for keys whose post-combine partial state is still too hot.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      numSalts: Int, saltSource: Column): DataFrame =
    df.withColumn("_salt", pmod(abs(hash(saltSource)), lit(numSalts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valueCol)).as("_s"), count(col(valueCol)).as("_c"))
      .groupBy(col(key))
      .agg(sum(col("_s")).as(s"sum_$valueCol"), sum(col("_c")).as(s"count_$valueCol"))

  /** Write a table bucketed (+ sorted) by its join key. Two tables
    * bucketed the same way join with ZERO exchanges — the 100 TB answer
    * to repeated fact-to-fact joins on the same key.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
