package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("seen-set carries across micro-batches; admitted fps = distinct") {
    val dir = java.nio.file.Files.createTempDirectory("sdedup").toString
    // batch 1 and batch 2 share content: "alpha" re-arrives in file 2
    // and must NOT be re-admitted
    Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f1")
    Seq((3L, "alpha beta gamma"), (4L, "eta theta iota"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$dir/f2")
    val ckpt = java.nio.file.Files.createTempDirectory("sdedup-ckpt").toString
    val stream = spark.readStream
      .schema("doc_id long, text string")
      .option("maxFilesPerTrigger", "1") // force one file per micro-batch
      .parquet(s"$dir/f*/part-*.parquet")
    val q = StreamingDedup.dedupFps(stream).writeStream
      .format("memory").queryName("sdedup_t")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val fps = spark.table("sdedup_t").as[String].collect().toSeq
    spark.catalog.dropTempView("sdedup_t")
    // 3 distinct texts among 4 docs; each admitted exactly once
    assert(fps.length == 3, s"admitted $fps")
    assert(fps.distinct.length == 3)
    val batchFps = Seq("alpha beta gamma", "delta epsilon zeta", "eta theta iota")
      .toDF("text").select(graft.ops.TextOps.fingerprint(col("text")))
      .as[String].collect().toSet
    assert(fps.toSet == batchFps)
  }
}
