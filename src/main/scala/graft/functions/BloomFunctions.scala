package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session registration for Spark's OWN Bloom-filter expressions —
  * `BloomFilterAggregate` and `BloomFilterMightContain` — which Catalyst
  * ships for its runtime join-filter optimization but does not expose in
  * the public FunctionRegistry. Re-registering them under graft names
  * makes the distributed bloom build (a partial-aggregable
  * `TypedImperativeAggregate`, map-side combined like any agg) and the
  * probe predicate available to SQL text, where the bloom side can be
  * written as a scalar subquery — the one form `BloomFilterMightContain`
  * accepts besides a literal (its type check rejects plain attribute
  * references, so a cross-joined bloom column cannot work).
  *
  * Nothing here is a UDF: both expressions are Spark-native Catalyst
  * code, the same ones `spark.sql.optimizer.runtime.bloomFilter` injects.
  */
object BloomFunctions {
  val aggName = "graft_bloom_agg"
  val mightContainName = "graft_might_contain"

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      aggName,
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      mightContainName,
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "scala_udf")
  }

  /** Spark's formula for the optimal bit count at a target false-positive
    * rate (delegates to the sketch library the aggregate itself uses).
    */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long =
    org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)
}
