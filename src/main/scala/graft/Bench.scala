package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query seconds.
  *
  * Honesty details: results are written to the `noop` sink — a bare
  * `count()` lets Catalyst prune every projection, so narrow transform
  * queries would measure ~nothing. A warm-up query runs first so JVM/
  * codegen startup isn't billed to the first timed query. Each query runs
  * `SPARK_GRAFT_BENCH_ITERS` (default 2) times and reports the per-query
  * MIN (plus median) — a single contended run on a noisy driver machine
  * can otherwise distort the record by 10-40× (observed round 1); the
  * minimum is the reproducible quiet-machine number. The total is the sum
  * of minima, and any failed iteration marks the query failed rather than
  * letting it shrink the total into a fake speedup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(name: String): Double = {
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

    /** (min, median) over `iters` runs; any failed run poisons the query. */
    def exec(name: String): (Double, Double) = {
      val ts = (1 to iters).map(_ => once(name))
      if (ts.exists(_ < 0)) (-1.0, -1.0)
      else {
        val sorted = ts.sorted
        val mid =
          if (sorted.size % 2 == 1) sorted(sorted.size / 2)
          else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2
        (sorted.head, mid)
      }
    }

    // warm-up: JVM + codegen + parquet footer caches for the TPC-H-ish and
    // events read paths, plus the one-time synthetic ELB corpus generation
    // (driver-side, would otherwise be billed to q18's first run)
    once("q03_revenue_by_nation")
    once("q01_hourly_agg")
    once("q18_elb_pipeline")
    // q55's warm-up covers the one-time zstd landing-zone staging write,
    // which would otherwise be billed to its first timed iteration
    once("q55_elb_staged")

    val results = SparkEntry.queries.keys.toSeq.sorted.map(n => n -> exec(n))
    def obj(f: ((Double, Double)) => Double) = results
      .map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val failed = results.count(_._2._1 < 0)
    // a failed query must not shrink the aggregate into a fake speedup:
    // the total only counts successes, and "failed" flags the run
    val total = results.map(_._2._1).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"iters":$iters,"queries":${obj(_._1)},"queries_median":${obj(_._2)},"sf":"$sfDir"}"""
    println(line)
    // the artifact is also written as a FILE: scraping the sbt tail for
    // the stdout line truncates under log interleaving (observed round 2
    // — only medians were recoverable from the clipped tail)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), line + "\n")
    spark.stop()
  }
}
