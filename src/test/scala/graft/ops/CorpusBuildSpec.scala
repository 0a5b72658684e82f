package graft.ops

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.functions._

/** End-to-end corpus-build composition (q72): the six stages chained under
  * one call must agree with running them stage by stage, and the output
  * must be a valid batch layout (one row per survivor, bins contiguous
  * per shard).
  */
class CorpusBuildSpec extends SparkSpec {

  private lazy val docs =
    Tables.documents(spark, sf()).filter(col("doc_id") < 1000).cache()

  private val cfg = CorpusBuild.Config(lang = Some("en"),
    jaccardThreshold = 0.5, maxBucket = 1000,
    packBudget = 500, packShards = 4)

  private lazy val out = CorpusBuild.corpus(docs, "text", "doc_id", cfg).cache()

  test("composition equals the stage-by-stage chain") {
    val clean = TextOps.qualityFilter(docs, "text", cfg.minWords,
      cfg.maxWords, cfg.minStopwordRatio, cfg.minAlphaRatio, cfg.lang)
    val exact = Dedup.deduped(clean, "text", "doc_id")
    val kept = Dedup.dedupedByClusters(exact, "doc_id",
      Dedup.minhashNearDupPairs(exact, "text", "doc_id", cfg.shingleN,
        cfg.numHashes, cfg.rowsPerBand, cfg.jaccardThreshold, cfg.maxBucket))
    val split = Sampling.hashSplit(kept, "doc_id", cfg.splits)
    val contam = Dedup.contamination(split, "text", "doc_id", "split",
      cfg.trainSplit, cfg.evalSplit, cfg.contamN)
    val decont = split.join(contam.select(col("id")),
      split("doc_id") === col("id"), "left_anti")

    val expectedIds = decont.select("doc_id").collect().map(_.getLong(0)).toSet
    val gotIds = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotIds == expectedIds)
    assert(gotIds.nonEmpty, "fixture should leave survivors")
    // each stage must have actually dropped something at this fixture,
    // otherwise the composition test is vacuous for that stage
    assert(clean.count() < docs.count(), "quality filter dropped nothing")
    assert(kept.count() < exact.count(), "near-dup stage dropped nothing")
  }

  test("length-thresholded decontamination policy follows contaminationSpans") {
    val lenCfg = cfg.copy(contamMinSharedLen = Some(20))
    val got = CorpusBuild.corpus(docs, "text", "doc_id", lenCfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // expected: identical chain, but only eval docs whose longest shared
    // stretch reaches 20 words are dropped
    val clean = TextOps.qualityFilter(docs, "text", cfg.minWords,
      cfg.maxWords, cfg.minStopwordRatio, cfg.minAlphaRatio, cfg.lang)
    val exact = Dedup.deduped(clean, "text", "doc_id")
    val kept = Dedup.dedupedByClusters(exact, "doc_id",
      Dedup.minhashNearDupPairs(exact, "text", "doc_id", cfg.shingleN,
        cfg.numHashes, cfg.rowsPerBand, cfg.jaccardThreshold, cfg.maxBucket))
    val split = Sampling.hashSplit(kept, "doc_id", cfg.splits)
    val contam = Dedup.contaminationSpans(split, "text", "doc_id", "split",
      cfg.trainSplit, cfg.evalSplit, cfg.contamN)
      .where(col("max_shared_len") >= 20)
    val expected = split.join(contam.select(col("id")),
      split("doc_id") === col("id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    // the policy knob must be LESS aggressive than (or equal to) the
    // any-overlap default: everything the default keeps, it keeps
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet.subsetOf(got))
  }

  test("output is one row per survivor with a valid split") {
    assert(out.count() == out.select("doc_id").distinct().count())
    val splits = out.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
  }

  test("bins are contiguous from 0 within every shard") {
    // stream-chunking packing: within a shard the bins are the budget
    // windows of an id-ordered concatenation — 0..max with no holes
    val bad = out.groupBy("shard")
      .agg(min(col("bin")).as("lo"), max(col("bin")).as("hi"),
        countDistinct(col("bin")).as("n"))
      .where(col("lo") =!= 0 || col("n") =!= col("hi") + 1)
    assert(bad.count() == 0)
  }
}
