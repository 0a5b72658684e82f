package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational combinators that Spark lacks as single built-ins. */
object Relational {

  /** Keep-last upsert: rows of `fresh` replace same-key rows of `base`
    * (pandas `concat` + drop-dup keep='last' semantics — reference:
    * advanced_elb_logs_etl.py:244-246). `dropDuplicates` alone keeps an
    * arbitrary row, so source priority is made explicit and resolved with
    * a `row_number` window. One shuffle on the key — at scale this is the
    * canonical SCD-1 merge shape.
    *
    * Precondition: each side is unique per key. With duplicate keys
    * *within* a side there is no further ordering to break the tie and
    * the survivor among same-side duplicates is arbitrary (pandas'
    * keep='last' uses input order, which a distributed frame doesn't
    * have); deduplicate per side first if that matters.
    */
  def keepLastUpsert(base: DataFrame, fresh: DataFrame, keys: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_src").desc)
    base.withColumn("_src", lit(0))
      .unionByName(fresh.withColumn("_src", lit(1)), allowMissingColumns = true)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_src", "_rn")
  }
}
