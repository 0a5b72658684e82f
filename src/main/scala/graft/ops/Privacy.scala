package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Privacy curation: k-anonymity style suppression over quasi-identifier
  * columns — the release-gating step of a data-sharing pipeline. A row is
  * re-identifiable when its quasi-identifier combination is rare; rows in
  * groups smaller than `k` get those columns suppressed (nulled) rather
  * than dropped, so downstream counts stay intact.
  */
object Privacy {

  /** Suppress quasi-identifiers of rows whose QI group has fewer than `k`
    * members. Adds `group_size` (the pre-suppression QI group count —
    * nulls group together, as both Spark and SQL `PARTITION BY` define)
    * and `suppressed`; all other columns pass through untouched.
    *
    * Plan: one window count over the QI columns — a single exchange on
    * the QI key, no join back (the [[Dedup.pruneHotKeys]] argument: the
    * count rides the partition the data already needs). At 100 TB the QI
    * key follows normal aggregation skew rules — a degenerate QI (all
    * rows one group) is one partition, but such a group is by definition
    * ≥ k and could short-circuit via a pre-count if it ever mattered.
    */
  def kAnonymize(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty && k >= 1)
    val w = Window.partitionBy(qiCols.map(col): _*)
    val counted = df.withColumn("group_size", count(lit(1)).over(w))
      .withColumn("suppressed", col("group_size") < k)
    qiCols.foldLeft(counted) { (acc, c) =>
      acc.withColumn(c, when(!col("suppressed"), col(c)))
    }
  }
}
