package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Similarity
import graft.queries.Tables

/** One-off audit for the q183 streaming-IVF watch row (round-15 queue):
  * times each leg of the ingest — centroid staging, the initial build,
  * each incremental upsert, and the final probe — so "which leg grew" is
  * a measurement, not a guess. Usage:
  *   runMain graft.tools.IvfIngestAudit <sfDir> [reps]
  */
object IvfIngestAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[ivfaudit] $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    (1 to reps).foreach { rep =>
      println(s"[ivfaudit] ---- rep $rep ----")
      val emb = Tables.embeddings(spark, sfDir)
      val centroids = timed("centroid staging") {
        emb.filter(col("vec_id") < 16)
          .select(col("vec_id").as("cid"),
            Similarity.asDouble(col("embedding")).as("cvec"))
          .localCheckpoint(true)
      }
      val queryDf = emb.filter(col("vec_id") === 0)
        .select(Similarity.asDouble(col("embedding")).as("qvec"))
      val path = java.nio.file.Files
        .createTempDirectory("graft-ivf-audit").resolve("index.parquet").toString
      val rows = timed("fixture collect") {
        emb.filter(col("vec_id") >= 16)
          .select(col("vec_id"), Similarity.asDouble(col("embedding")))
          .as[(Long, Seq[Double])].collect().sortBy(_._1)
      }
      val batches = (0 until 4).map(k => rows.filter(_._1 % 4 == k).toSeq)
      batches.zipWithIndex.foreach { case (b, k) =>
        timed(s"batch $k (stage)") {
          graft.streaming.StreamingIvf.appendBatch(
            b.toDF("vec_id", "embedding"), centroids, path, k.toLong)
        }
      }
      timed("fold pending") {
        Similarity.foldIvfPending(spark, path)
      }
      timed("probe topk") {
        Similarity.ivfTopKIndexed(path, centroids, queryDf, k = 10, nProbe = 2)
          .write.format("noop").mode("overwrite").save()
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
