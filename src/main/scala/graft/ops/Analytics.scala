package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral event analytics: ordered-step funnels within sessions and
  * cohort retention matrices — the two queries every event warehouse
  * runs daily, expressed engine-side so they inherit the windowing
  * discipline (one shuffle + one sort per key) of the sessionization
  * family.
  *
  * Everything is integer arithmetic on epoch µs/days/weeks — no float
  * crosses an engine boundary.
  */
object Analytics {

  /** Gap-based session index per user (the q08/q31 semantics: a new
    * session starts when the µs gap to the previous event is ≥ `gapUs`).
    * Adds `_us` (event µs) and `sess` (0-based per-user session index).
    */
  private def sessionized(events: DataFrame, gapUs: Long): DataFrame = {
    val ord = Window.partitionBy("user_id").orderBy("_us", "event_id")
    events
      .withColumn("_us", unix_micros(col("ts")))
      .withColumn("_new",
        when(lag("_us", 1).over(ord).isNull ||
          col("_us") - lag("_us", 1).over(ord) >= gapUs, 1L).otherwise(0L))
      .withColumn("sess",
        sum("_new").over(ord.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .drop("_new")
  }

  /** Ordered three-step funnel within each session: the first `steps(0)`
    * event, the first `steps(1)` event strictly AFTER it, the first
    * `steps(2)` strictly after that. One row per session with nullable
    * epoch-ms step times — a later step is null whenever an earlier one
    * is (ordered-funnel semantics, not mere presence).
    *
    * Three chained projections over the SAME (user) partitioning — the
    * sort/exchange is planned once; step k's window min references step
    * k-1's value row-wise, which a single grouped aggregate cannot
    * express without re-joining.
    */
  def sessionFunnel(events: DataFrame, steps: Seq[String],
      gapUs: Long = 1800000000L): DataFrame = {
    require(steps.length == 3, "three-step funnel")
    val w = Window.partitionBy("user_id", "sess")
    val s = sessionized(events, gapUs)
      .withColumn("s1",
        min(when(col("event_type") === steps(0), col("_us"))).over(w))
      .withColumn("s2",
        min(when(col("event_type") === steps(1) && col("_us") > col("s1"),
          col("_us"))).over(w))
      .withColumn("s3",
        min(when(col("event_type") === steps(2) && col("_us") > col("s2"),
          col("_us"))).over(w))
    s.select(col("user_id"), col("sess"),
        expr("s1 div 1000").as("step1_ms"),
        expr("s2 div 1000").as("step2_ms"),
        expr("s3 div 1000").as("step3_ms"))
      .distinct()
  }

  /** Cohort retention matrix: users grouped by the epoch-week of their
    * first event; one row per (cohort_week, week_offset) with the count
    * of distinct cohort users active that week. Weeks are epoch-aligned
    * (`µs → day → week` by integer division), offsets start at 0.
    *
    * Two shuffles total: first-event per user (map-side-combined min),
    * then the distinct-count per matrix cell; the matrix itself is
    * weeks² — tiny at any corpus scale.
    */
  def cohortRetention(events: DataFrame): DataFrame = {
    val firsts = events
      .groupBy("user_id")
      .agg(min(expr("unix_micros(ts) div 86400000000 div 7")).as("cohort_week"))
    events
      .withColumn("wk", expr("unix_micros(ts) div 86400000000 div 7"))
      .join(firsts, "user_id")
      .groupBy(col("cohort_week"), (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct("user_id").as("n_users"))
  }
}
