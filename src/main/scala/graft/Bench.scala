package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query seconds.
  *
  * Honesty details: results are written to the `noop` sink — a bare
  * `count()` lets Catalyst prune every projection, so narrow transform
  * queries would measure ~nothing. A warm-up query runs first so JVM/
  * codegen startup isn't billed to the first timed query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def exec(name: String): Double = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0 // sentinel: a failed query must not look like a fast one
      }
    }

    // warm-up: JVM + codegen + parquet footer caches for the TPC-H-ish and
    // events read paths, plus the one-time synthetic ELB corpus generation
    // (driver-side, would otherwise be billed to q18's first run)
    exec("q03_revenue_by_nation")
    exec("q01_hourly_agg")
    exec("q18_elb_pipeline")

    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> exec(n))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    // a failed query must not shrink the aggregate into a fake speedup:
    // the total only counts successes, and "failed" flags the run
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
