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
}
