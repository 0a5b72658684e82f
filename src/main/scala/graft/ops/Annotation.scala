package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Annotation aggregation — the label-consolidation step of an RLHF /
  * supervised-data pipeline: many annotators, conflicting votes, one
  * training label per item with a confidence.
  */
object Annotation {

  /** Accuracy-weighted majority vote (a one-round Dawid–Skene): plain
    * per-item majority first, then each annotator's global agreement
    * with those majorities becomes their vote weight, then a weighted
    * re-vote. Annotators who usually agree with consensus count more;
    * a spammer's votes are discounted without being dropped.
    *
    * Every intermediate stays in exact integer space: weights are
    * parts-per-million via `(10⁶ · matches) div total` (integer
    * division — no float whose cross-engine rounding could flip a
    * rank), weighted sums are sums of longs, and all argmaxes break
    * ties toward the lexicographically smallest label. `confidence`
    * (winning share of the item's total vote weight) is the single
    * final double division.
    *
    * Plan: three aggregations (item-label counts, annotator accuracy,
    * weighted re-vote) + two small joins; the accuracy frame is one row
    * per annotator — broadcast-sized by construction. No window over
    * the full vote stream; ranks run per item-label group.
    */
  def aggregateLabels(votes: DataFrame, itemCol: String,
      annotatorCol: String, labelCol: String): DataFrame = {
    val v = votes.select(col(itemCol).as("item"),
      col(annotatorCol).as("annotator"), col(labelCol).as("label"))
    val counts = v.groupBy("item", "label").agg(count(lit(1)).as("cnt"))
    val wMaj = Window.partitionBy("item")
      .orderBy(col("cnt").desc, col("label"))
    val majority = counts.withColumn("rn", row_number().over(wMaj))
      .where(col("rn") === 1).select(col("item"), col("label").as("maj_label"))
    val acc = v.join(majority, "item")
      .groupBy("annotator")
      .agg((lit(1000000L) * sum(when(col("label") === col("maj_label"), 1L)
          .otherwise(0L))).as("m"), count(lit(1)).as("t"))
      .select(col("annotator"), expr("m div t").as("w_ppm"))
    val weighted = v.join(acc, "annotator")
      .groupBy("item", "label")
      .agg(count(lit(1)).as("n"), sum("w_ppm").as("wsum"))
    val wFinal = Window.partitionBy("item")
      .orderBy(col("wsum").desc, col("label"))
    val totals = weighted.groupBy("item")
      .agg(sum("wsum").as("w_total"), sum("n").as("n_votes"))
    weighted.withColumn("rn", row_number().over(wFinal))
      .where(col("rn") === 1)
      .join(totals, "item").join(majority, "item")
      .select(col("item"), col("maj_label"), col("label").as("final_label"),
        col("n_votes"), col("wsum"),
        round(col("wsum").cast("double") / col("w_total").cast("double"), 6)
          .as("confidence"))
  }

  /** Pairwise Cohen's κ between every annotator pair — the
    * inter-annotator agreement matrix a labeling pipeline reports before
    * trusting its gold set (raw agreement flatters annotators who
    * over-use the majority label; κ subtracts chance agreement).
    *
    * Exact-integer identity: over the n items BOTH annotators labeled,
    * with a = agreements and per-label marginals nAₗ/nBₗ,
    * `κ = (n·a − Σₗ nAₗ·nBₗ) / (n² − Σₗ nAₗ·nBₗ)` — numerator and
    * denominator are exact BIGINTs, the division is the single final
    * double (6 d.p.), and a zero denominator (both annotators constant
    * on the same label) yields null rather than a fake 1.0.
    *
    * Expects one vote per (annotator, item). Plan: one self-join on the
    * item key (per-item cost ∝ annotators-per-item², the co-labeling
    * structure itself), one pair-level count aggregate, one marginal
    * aggregate joined on (pair, label) — everything downstream of the
    * self-join is O(annotator-pairs · labels).
    */
  def cohensKappa(votes: DataFrame, itemCol: String, annotatorCol: String,
      labelCol: String): DataFrame = {
    val v = votes.select(col(itemCol).as("item"),
      col(annotatorCol).as("ann"), col(labelCol).as("label"))
    val co = v.as("x").join(v.as("y"),
        col("x.item") === col("y.item") && col("x.ann") < col("y.ann"))
      .select(col("x.ann").as("ann_a"), col("y.ann").as("ann_b"),
        col("x.label").as("la"), col("y.label").as("lb"))
    val base = co.groupBy("ann_a", "ann_b")
      .agg(count(lit(1)).as("n"),
        sum(when(col("la") === col("lb"), 1L).otherwise(0L)).as("n_agree"))
    val margA = co.groupBy("ann_a", "ann_b", "la")
      .agg(count(lit(1)).as("ca"))
    val margB = co.groupBy("ann_a", "ann_b", "lb")
      .agg(count(lit(1)).as("cb"))
    val pe = margA.join(margB,
        margA("ann_a") === margB("ann_a") && margA("ann_b") === margB("ann_b")
          && margA("la") === margB("lb"))
      .groupBy(margA("ann_a").as("ann_a"), margA("ann_b").as("ann_b"))
      .agg(sum(col("ca") * col("cb")).as("pe_num"))
    base.join(pe, Seq("ann_a", "ann_b"), "left")
      .select(col("ann_a"), col("ann_b"), col("n"), col("n_agree"),
        coalesce(col("pe_num"), lit(0L)).as("pe_num"))
      .withColumn("kappa",
        when(col("n") * col("n") === col("pe_num"), lit(null))
          .otherwise(round(
            (col("n") * col("n_agree") - col("pe_num")).cast("double")
              / (col("n") * col("n") - col("pe_num")).cast("double"), 6)))
  }
}
