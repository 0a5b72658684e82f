package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus health reporting: the one-table "report card" a curation run
  * publishes per group (source, language, …) — volume, token mass,
  * exact-duplicate load, model-quality pass rate, and mean quality
  * score in a single pass.
  *
  * Scale shape: one narrow scoring projection (the q93 model + token
  * count + canonical fingerprint are all scan-side), one map-side-
  * combined aggregate keyed by (fp) for duplicate attribution, and one
  * final aggregate keyed by the group — group cardinality is report
  * cardinality, thousands at most, so the last exchange is trivially
  * small. Nothing here is quadratic and nothing collects.
  */
object Reporting {

  /** Per-`groupCol` corpus report: doc count, whitespace-token mass,
    * exact-duplicate count (docs whose canonical fingerprint group
    * keeper is another doc), linear-model pass count, and mean model
    * score rounded to 6 d.p. (cross-engine float hygiene for the one
    * order-dependent aggregate).
    */
  def corpusReport(df: DataFrame, textCol: String, idCol: String,
      groupCol: String): DataFrame = {
    val scored = TextOps.linearQualityModel(df, textCol, idCol)
    val groups = Dedup.exactGroups(df, textCol, idCol)
      .select(col("fp"), col("keeper"))
    df.select(col(idCol), col(groupCol),
        TextOps.fingerprint(col(textCol)).as("fp"),
        TextOps.wsTokenCount(col(textCol)).as("_n_tok"))
      .join(groups, "fp")
      .join(scored, idCol)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_n_tok")).as("n_tokens"),
        count_if(col(idCol) =!= col("keeper")).as("n_dups"),
        count_if(col("keep")).as("n_keep"),
        round(avg(col("score")), 6).as("mean_score"))
  }

  /** Schema-driven table profile — the data-quality audit every ingest
    * runs before a table joins the corpus: one row per column with row
    * count, non-null count, exact distinct count, and min/max rendered
    * as strings (the only type that can carry every column's extrema
    * through one output schema).
    *
    * Shape: one independent aggregate per column, unioned. Deliberate:
    * each aggregate's scan prunes to THAT column (columnar formats read
    * one column per pass, `ReadSchema` proves it), whereas a single
    * multi-distinct aggregate expands the full row stream once per
    * DISTINCT clause — strictly more I/O and a wider shuffle. At
    * 100 TB, swap `countDistinct` for `approx_count_distinct` (or the
    * q109 KMV sketch when cross-engine reproducibility matters) and the
    * per-column plans are otherwise unchanged.
    */
  def tableProfile(df: DataFrame): DataFrame =
    df.schema.fields.toSeq.map { f =>
      val c = col(f.name)
      df.agg(
          count(lit(1)).as("n_rows"),
          count(c).as("n_non_null"),
          countDistinct(c).as("n_distinct"),
          min(c).cast("string").as("min_s"),
          max(c).cast("string").as("max_s"))
        .select(lit(f.name).as("col_name"), col("n_rows"),
          col("n_non_null"), col("n_distinct"), col("min_s"), col("max_s"))
    }.reduce(_ unionByName _)
}
