package graft.geo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.elb.ElbSchema

/** Parquet-backed memo cache for geolocation lookups + the enrichment join.
  *
  * Reference dataflow (advanced_elb_logs_etl.py:231-265): load cache →
  * distinct IPs → misses = IPs ∉ cache → serial fetch → keep-last upsert →
  * rewrite cache → left-join logs → rename `country`→`countryName`.
  *
  * Spark-first mapping: the miss set is a `left_anti` join; the keep-last
  * upsert is a `row_number` window over an explicit source-priority column
  * (`dropDuplicates` keeps an arbitrary row — not equivalent); the final
  * enrichment is a *broadcast* left join (the cache is bounded by distinct
  * IP cardinality, orders of magnitude smaller than the 100 TB log side, so
  * it never deserves a shuffle of the big table).
  */
object GeoCache {

  /** Schema-defensive cache load: missing path / empty dir → empty frame
    * with the canonical 12-column schema (reference: advanced_elb_logs_etl.py:201-229).
    */
  def load(spark: SparkSession, path: String): DataFrame = {
    // Hadoop FS API, not java.io.File — the cache may live on S3/HDFS,
    // where a local-file existence check would silently report "absent"
    // and defeat the memoization on every run
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasData = fs.exists(p) && (fs.getFileStatus(p).isFile ||
      fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet")))
    if (hasData) spark.read.schema(ElbSchema.geo).parquet(path)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ElbSchema.geo)
  }

  /** Distinct non-null client IPs in `logs` that are absent from `cache`. */
  def misses(logs: DataFrame, cache: DataFrame): DataFrame =
    logs.select(col("client_ip")).where(col("client_ip").isNotNull).distinct()
      .join(cache.select(col("query")), col("client_ip") === col("query"), "left_anti")

  /** Keep-last upsert: rows in `fresh` replace same-key rows in `cache`
    * (reference: advanced_elb_logs_etl.py:244-246 — concat + drop-dup keep
    * 'last', i.e. new wins).
    */
  def upsert(cache: DataFrame, fresh: DataFrame): DataFrame =
    graft.ops.Relational.keepLastUpsert(cache, fresh, Seq("query"))

  /** Atomically replace the cache parquet at `path` with `updated`.
    * Writes to a sibling temp dir first — Spark cannot overwrite a path it
    * is lazily reading from. The temp/old names carry a unique token so
    * concurrent runs can't collide on the STAGING paths, and the live
    * cache is moved aside (not deleted) before promotion, so a crash
    * mid-rewrite can lose at most the fresh rows — never the whole cache.
    * The promote re-checks the destination and aborts if a concurrent
    * rewrite has promoted in between; a small window remains between the
    * check and the rename — truly concurrent writers need an external
    * lock (e.g. an atomic lock-file create next to the cache).
    */
  def rewrite(updated: DataFrame, path: String): Unit = {
    val token = java.util.UUID.randomUUID().toString.take(8)
    val tmp = new org.apache.hadoop.fs.Path(s"$path.tmp-$token")
    updated.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val dst = new org.apache.hadoop.fs.Path(path)
    // resolve the filesystem FROM the path (like load) — FileSystem.get
    // would return the default FS and throw 'Wrong FS' for an s3a:// cache
    val fs = dst.getFileSystem(
      updated.sparkSession.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(s"$path.old-$token")
    val hadLive = fs.exists(dst)
    val displaced = hadLive && fs.rename(dst, old)
    // If the live cache exists but cannot be moved aside, ABORT: Hadoop's
    // rename(tmp, dst) onto an existing directory nests tmp INSIDE dst
    // and returns true — the promote would "succeed" while corrupting
    // the cache layout and silently dropping the fresh rows.
    if (hadLive && !displaced) throw new java.io.IOException(
      s"geo cache rewrite aborted: cannot move live cache $path aside; " +
      s"fresh data left at $tmp, live cache untouched")
    // Re-check immediately before the promote: a concurrent rewrite can
    // promote its own tmp here after our displace step, and Hadoop's
    // rename(tmp, dst) onto an existing directory nests tmp INSIDE dst
    // and returns true — a "successful" promote that corrupts the layout.
    if (fs.exists(dst)) throw new java.io.IOException(
      s"geo cache rewrite aborted: $path reappeared before promote " +
      s"(concurrent rewrite?); fresh data left at $tmp" +
      (if (displaced) s", displaced cache left at $old" else ""))
    // Hadoop signals many rename failures by returning false, not
    // throwing — swallowing it here would silently lose the cache
    if (!fs.rename(tmp, dst)) {
      if (displaced) fs.rename(old, dst) // put the live cache back
      throw new java.io.IOException(
        s"geo cache rewrite failed: rename $tmp -> $path returned false " +
        "(previous cache restored; fresh data stranded at the .tmp path)")
    }
    if (displaced) fs.delete(old, true)
  }

  /** One run's capped miss selection: the lexicographically-FIRST `max`
    * misses (deterministic — a bare `limit` takes a partitioning-dependent
    * subset, so two runs over the same backlog would retire different
    * slices) plus the counted deferred remainder. The sort executes as
    * TakeOrderedAndProject (per-partition top-K + merge), never a global
    * sort materialization; the remainder count re-runs the anti-join but
    * only on a capped run, where one more column-pruned pass is noise
    * next to the serial lookup burst it precedes.
    */
  private[geo] def selectMisses(spark: SparkSession, logs: DataFrame,
      cache: DataFrame, max: Int): (Seq[String], Long) = {
    import spark.implicits._
    val missSet = misses(logs, cache)
    val ips = missSet.orderBy(col("client_ip")).limit(max)
      .as[String].collect().toSeq
    // backlog == cap exactly is a complete run, not a deferral
    val deferred = if (ips.size == max) missSet.count() - max else 0L
    (ips, deferred)
  }

  /** Full enrichment stage: resolve cache misses via `resolver`, upsert +
    * persist the cache, then broadcast-left-join onto `logs` and apply the
    * reference's column standardization (`country` → `countryName`).
    *
    * `maxMissesPerRun` bounds the driver-side collect: at 100 TB the
    * distinct-miss set alone can be tens of millions of rows — an
    * unbounded collect OOMs the driver before the rate limiter even
    * matters. Rows beyond the cap stay unenriched this run (null geo
    * columns after the left join, same as a failed lookup) and the memo
    * cache converges over successive runs. The reference resolves serially
    * per-IP anyway (advanced_elb_logs_etl.py:239-242), so bounding changes
    * no semantics, only how much of the backlog one run retires.
    */
  def enrich(spark: SparkSession, logs: DataFrame, cachePath: String,
      resolver: GeoResolver, maxMissesPerRun: Int = 100000): DataFrame = {
    import spark.implicits._
    val cache = load(spark, cachePath)
    val (missIps, deferred) = selectMisses(spark, logs, cache, maxMissesPerRun)
    if (deferred > 0)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"geo cache: resolved the per-run cap of $maxMissesPerRun misses; " +
        s"deferring $deferred to the next run (memo cache converges)")
    val updated = if (missIps.nonEmpty) {
      val fresh = resolver.resolve(missIps).toDF()
        .select(ElbSchema.geo.fieldNames.map(col).toSeq: _*)
      val u = upsert(cache, fresh)
      rewrite(u, cachePath)
      load(spark, cachePath)
    } else cache
    logs.join(broadcast(updated), logs("client_ip") === updated("query"), "left")
      .withColumnRenamed("country", "countryName")
  }
}
