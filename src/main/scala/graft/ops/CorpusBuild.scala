package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end corpus-build composition — the pipeline a training-data
  * run actually ships, chaining the already-proven operators in their
  * production order:
  *
  *   1. [[TextOps.qualityFilter]]   — C4-style cleaning (narrow, first)
  *   2. [[Dedup.deduped]]           — exact dedup (the documented
  *                                    precondition that keeps LSH buckets
  *                                    bounded)
  *   3. [[Dedup.minhashNearDupPairs]] + [[Dedup.dedupedByClusters]]
  *                                  — near-dup clusters, one keeper each
  *   4. [[Sampling.hashSplit]]      — deterministic train/val/test
  *   5. [[Dedup.contamination]]     — drop eval docs sharing any long
  *                                    n-gram with train (their held-out
  *                                    value is compromised; dropping them
  *                                    leaves the training distribution
  *                                    untouched)
  *   6. [[Sampling.packSequences]]  — token-budget batch layout
  *
  * Returns one row per surviving document: (idCol, split, shard, bin) —
  * the physical grouping key for the downstream batch write.
  *
  * Stage materialization: the composition references the exact-dedup and
  * decontaminated frames more than once (LSH candidates + verification
  * shingles + the keeper anti-join all read `exact`; packing and the
  * split join-back both read `decont`). Spark does not CSE across
  * DataFrame references, so without a cut each action would re-run the
  * whole upstream chain per reference — `localCheckpoint(eager)` caps
  * every stage at one evaluation. At production scale the same role is
  * played by writing each stage to durable parquet between jobs (a 100 TB
  * corpus outlives any single session); the in-session checkpoint is the
  * faithful small-scale shape of that.
  */
object CorpusBuild {

  /** Knobs for every stage; defaults mirror the individual operators'. */
  case class Config(
      minWords: Long = 30, maxWords: Long = 120,
      minStopwordRatio: Double = 0.08, minAlphaRatio: Double = 0.5,
      lang: Option[String] = None,
      shingleN: Int = 3, numHashes: Int = 12, rowsPerBand: Int = 3,
      jaccardThreshold: Double = 0.8, maxBucket: Int = Int.MaxValue,
      splits: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10),
      trainSplit: String = "train", evalSplit: String = "test",
      contamN: Int = 13, contamMaxDocFreq: Int = Int.MaxValue,
      // decontamination policy: None = any shared n-gram contaminates
      // (the q71/q72 legacy rule); Some(len) = drop an eval doc only when
      // its longest contiguous shared stretch reaches `len` WORDS
      // ([[Dedup.contaminationSpans]].max_shared_len >= len — a
      // length-thresholded policy, the shape real pipelines use)
      contamMinSharedLen: Option[Int] = None,
      packBudget: Long = 500, packShards: Int = 8)

  def corpus(df: DataFrame, textCol: String, idCol: String,
      cfg: Config = Config()): DataFrame = {
    val clean = TextOps.qualityFilter(df, textCol, cfg.minWords, cfg.maxWords,
      cfg.minStopwordRatio, cfg.minAlphaRatio, cfg.lang)
    // exact-dedup-first: byte-identical copies collapse before LSH ever
    // sees them, so no band bucket inherits a duplicate pile-up
    // lazy: materialized once by the first consuming action, shared by
    // the LSH build and the keeper anti-join — an eager checkpoint here
    // is one more barrier job (round-15 job-count finding)
    val exact = Dedup.deduped(clean, textCol, idCol).localCheckpoint(false)
    val pairs = Dedup.minhashNearDupPairs(exact, textCol, idCol, cfg.shingleN,
      cfg.numHashes, cfg.rowsPerBand, cfg.jaccardThreshold, cfg.maxBucket)
    val kept = Dedup.dedupedByClusters(exact, idCol, pairs)
    val split = Sampling.hashSplit(kept, idCol, cfg.splits)
    val contaminated = (cfg.contamMinSharedLen match {
      case None => Dedup.contamination(split, textCol, idCol, "split",
        cfg.trainSplit, cfg.evalSplit, cfg.contamN, cfg.contamMaxDocFreq)
      case Some(len) => Dedup.contaminationSpans(split, textCol, idCol,
        "split", cfg.trainSplit, cfg.evalSplit, cfg.contamN,
        cfg.contamMaxDocFreq)
        .where(col("max_shared_len") >= len)
    }).select(col("id"))
    val decont = split
      .join(contaminated, split(idCol) === contaminated("id"), "left_anti")
      .localCheckpoint(false) // lazy for the same reason as `exact`
    val packed = Sampling.packSequences(
      decont.select(col(idCol), TextOps.wsTokenCount(col(textCol)).as("_tok")),
      idCol, "_tok", cfg.packBudget, cfg.packShards)
    packed.join(decont.select(col(idCol).as("id"), col("split")), "id")
      .select(col("id").as(idCol), col("split"), col("shard"), col("bin"))
  }
}
