package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic cardinality sketches. Spark ships HLL++
  * (`approx_count_distinct`), but its estimate is engine-specific — no
  * cross-engine oracle can gate it. KMV (k minimum values) gives the
  * same one-pass, mergeable, bounded-memory shape with arithmetic both
  * engines reproduce exactly: k smallest 32-bit hashes per group, and
  * the classic estimator `(k-1) · 2³² / kth_min` — one integer product
  * and one IEEE division, bit-identical everywhere.
  *
  * Scale shape: the candidate set is cut to ≤ salts·k rows per group by
  * a two-phase salted min-k (same trick as [[Web.domainDocCap]]) before
  * the exact per-group rank, so a mega-group never lands one task —
  * state is O(groups · salts · k), the sketch contract. Groups with
  * fewer than k distinct values return their EXACT count (the sketch
  * degenerates to a distinct set — standard KMV behavior).
  */
object Sketches {

  /** Per-group distinct-count estimate: (group, n_kept, est) where
    * `n_kept` = min(k, true distinct) and `est` is exact below k,
    * estimated above it (rounded to 2 d.p.).
    */
  def kmvDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64, salts: Int = 16): DataFrame = {
    // 32-bit uniform hash of the VALUE — distinct values, not rows,
    // drive the sketch
    val h32 = conv(substring(md5(col(valueCol).cast("string")), 1, 8),
      16, 10).cast("long")
    val hashes = df.select(col(groupCol).as("g"), h32.as("h")).distinct()
    val pre = Window.partitionBy(col("g"), col("_salt")).orderBy("h")
    val fin = Window.partitionBy(col("g")).orderBy("h")
    val kept = hashes
      .withColumn("_salt", pmod(hash(col("h")), lit(salts)))
      .withColumn("_pr", row_number().over(pre))
      .where(col("_pr") <= k) // any global top-k row survives its salt's top-k
      .withColumn("_r", row_number().over(fin))
      .where(col("_r") <= k)
    kept.groupBy("g")
      .agg(count(lit(1)).as("n_kept"), max("h").as("kth"))
      .select(col("g").as(groupCol), col("n_kept"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(lit((k - 1) * 4294967296.0) / col("kth"), 2))
          .as("est"))
  }
}
