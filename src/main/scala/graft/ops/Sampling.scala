package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training pipelines.
  *
  * `df.sample()` / TABLESAMPLE draw per-partition, so the selected rows
  * change with partitioning, executor count, and engine — unusable for
  * train/val/test splits that must be stable across reruns and reproducible
  * by other systems. These operators derive the assignment from an md5
  * bucket of the row id instead: pure narrow projection, engine-portable
  * (any SQL dialect reproduces it), and stable under any layout. The
  * 16-bit hex prefix gives 65536 lattice points spread uniformly; bucket
  * skew is O(2^-16) relative.
  */
object Sampling {

  /** Uniform [0, 100) bucket from the md5 of the id. */
  def hashBucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long") % 100

  /** Deterministic percentage sample: keeps rows whose bucket < `pct`. */
  def hashSample(df: DataFrame, idCol: String, pct: Int): DataFrame = {
    require(0 <= pct && pct <= 100)
    df.where(hashBucket(col(idCol)) < pct)
  }

  /** Stable split assignment, e.g. `Seq("train" -> 80, "val" -> 10,
    * "test" -> 10)`: adds a `split` column. Weights must sum to 100.
    */
  def hashSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Int)]): DataFrame = {
    require(weights.map(_._2).sum == 100, "split weights must sum to 100")
    require(weights.nonEmpty)
    val cum = weights.map(_._2).scanLeft(0)(_ + _).tail
    val b = hashBucket(col(idCol))
    val cases = weights.map(_._1).zip(cum).init
    val assigned = cases.foldLeft(Option.empty[Column]) {
      case (acc, (name, bound)) =>
        Some(acc.map(_.when(b < bound, name))
          .getOrElse(when(b < bound, name)))
    }
    val split = assigned.map(_.otherwise(weights.last._1))
      .getOrElse(lit(weights.last._1))
    df.withColumn("split", split)
  }
}
