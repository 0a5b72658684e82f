package graft.elb

import graft.SparkSpec
import graft.ops.Scale
import org.apache.spark.sql.functions._

/** Skew at the ELB domain: one client IP holding ~30% of all rows (the
  * hot-NAT / hot-scraper scenario at 100 TB). Asserts the engine's three
  * answers to it:
  *  - the production geo join is a BROADCAST join — the big side never
  *    shuffles on client_ip, so the hot key cannot skew it at all;
  *  - if a shuffle join is ever forced (cache too big to broadcast), AQE
  *    splits the skewed partition (`skew=true` in the executed plan);
  *  - explicit salting spreads the hot key across tasks and returns
  *    byte-identical results, for when even split partitions are too hot.
  * The per-client window block itself is keyed sequential work (a window
  * over one key cannot be split without changing semantics) — the spec
  * asserts it stays *correct* under the hot key.
  */
class ElbSkewSpec extends SparkSpec {
  import spark.implicits._

  private val hotIp = "10.99.99.99"
  private val n = 20000

  /** Synthetic corpus with ~30% of lines rewritten to one client IP.
    * The IP lives in the 4th space-separated token; the first five tokens
    * are unquoted, so a limit-5 split is safe against the quoted fields.
    */
  private lazy val parsed = {
    val lines = (0 until n).map { i =>
      val l = SyntheticElb.line(i)
      if (i % 10 < 3) {
        val parts = l.split(" ", 5)
        parts(3) = s"$hotIp:12345"
        parts.mkString(" ")
      } else l
    }
    val raw = lines.toDF("value").withColumn("log_source_file", lit("mem"))
    ElbParser.enrich(ElbParser.tokenize(raw)).cache()
  }

  /** Small per-IP dimension standing in for the geo cache — materialized
    * driver-side so its own derivation contributes no exchanges to the
    * join plans under assertion (mirrors the real cache: a small table
    * read from parquet).
    */
  private lazy val geoDim = parsed.select($"client_ip".as("ip")).distinct()
    .as[String].collect().toSeq.toDF("ip")
    .withColumn("geo_tag", concat(lit("g-"), $"ip"))

  test("window block stays correct under a 30% hot key") {
    val featured = Features(parsed)
    val hotRows = featured.filter($"client_ip" === hotIp)
    assert(hotRows.count() >= (0.29 * n).toLong, "hot key should hold ~30%")
    // sessionization semantics hold for the hot key: the running session
    // counter reaches its max and every row carries a session id
    val agg = hotRows.agg(
      max("session_no").as("max_s"),
      count(when($"session_id".isNull, 1)).as("null_ids"),
      min("rolling_5min_req_count").as("min_roll")).head()
    assert(agg.getAs[Int]("max_s") >= 1)
    assert(agg.getAs[Long]("null_ids") == 0)
    assert(agg.getAs[Long]("min_roll") >= 1)
  }

  test("production-shape geo join broadcasts: the skewed side never shuffles") {
    val joined = parsed.join(broadcast(geoDim), parsed("client_ip") === geoDim("ip"), "left")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"big side must not shuffle for the geo join:\n$plan")
  }

  test("forced shuffle join: AQE splits the skewed partition") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.get(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // test data is KBs, production thresholds are 256 MB — scale them
      // down so the skew detector sees this corpus the way it would see
      // a hot multi-GB partition at 100 TB
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val joined = parsed.select("client_ip", "trace_id")
        .join(geoDim, $"client_ip" === $"ip")
      // collect() executes THIS DataFrame's query execution — count()
      // would spawn a separate one and leave this AQE plan non-final
      assert(joined.collect().length == n)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join split in:\n$plan")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("salted join spreads the hot key and equals the plain join") {
    val logs = parsed.select("client_ip", "trace_id")
    // salt distribution: the hot key's rows land on every salt, none
    // holding more than ~2x the fair share
    val numSalts = 8
    val perSalt = logs.filter($"client_ip" === hotIp)
      .withColumn("_salt", pmod(abs(hash($"trace_id")), lit(numSalts)))
      .groupBy("_salt").count().select("count").as[Long].collect()
    assert(perSalt.length == numSalts, "hot key must spread over all salts")
    val fair = perSalt.sum / numSalts
    assert(perSalt.max <= fair * 2, s"unbalanced salts: ${perSalt.toSeq}")
    // equivalence with the plain join
    val dim = geoDim.withColumnRenamed("ip", "client_ip")
    val plain = logs.join(dim, logs("client_ip") === dim("client_ip"))
      .select(logs("client_ip"), col("trace_id"), col("geo_tag"))
    val salted = Scale.saltedEquiJoin(logs, dim, "client_ip", numSalts,
      $"trace_id").select(logs("client_ip"), col("trace_id"), col("geo_tag"))
    assert(plain.count() == salted.count())
    assert(plain.except(salted).isEmpty && salted.except(plain).isEmpty)
  }
}
