package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Weighted sampling (A-ES) and rendezvous sharding laws. */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.queries.Tables.documents(spark, sf())

  test("weightedSample: at most k rows per stratum, ranks 1..k dense") {
    val out = Sampling.weightedSample(docs, "doc_id", "n_chars", "lang", k = 7)
    val per = out.groupBy("stratum").agg(count("*").as("n"),
      max("rk").as("mx"), min("rk").as("mn")).collect()
    per.foreach { r =>
      assert(r.getAs[Long]("n") <= 7L)
      assert(r.getAs[Long]("mn") == 1L)
      assert(r.getAs[Long]("mx") == r.getAs[Long]("n")) // dense, no gaps
    }
  }

  test("weightedSample: top-k nests (k=3 winners are a subset of k=8's)") {
    def ids(k: Int) = Sampling.weightedSample(docs, "doc_id", "n_chars",
      "lang", k).select("id").as[Long].collect().toSet
    val small = ids(3)
    val big = ids(8)
    assert(small.subsetOf(big))
    assert(small.size < big.size)
  }

  test("weightedSample: stable under repartitioning (lattice, not sample())") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(df, "doc_id", "n_chars", "lang", k = 5)
        .select("id").as[Long].collect().toSet
    assert(run(docs) == run(docs.repartition(13)))
  }

  test("weightedSample: non-positive weights are excluded, never sampled") {
    val d = Seq((1L, 100L, "a"), (2L, 0L, "a"), (3L, -5L, "a"))
      .toDF("doc_id", "w", "lang")
    val out = Sampling.weightedSample(d, "doc_id", "w", "lang", k = 10)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("weightedSample: a dominant weight stochastically wins the stratum") {
    // u^(1/w) → 1 as w → ∞: one row with weight 10^9 among weight-1 rows
    // must take rank 1 unless its lattice u is astronomically unlucky.
    val d = ((1L to 50L).map(i => (i, 1L, "s")) :+ (99L, 1000000000L, "s"))
      .toDF("doc_id", "w", "lang")
    val top = Sampling.weightedSample(d, "doc_id", "w", "lang", k = 1)
      .select("id").as[Long].head()
    assert(top == 99L)
  }

  test("rendezvousShard: shard in [0, N); deterministic across runs") {
    val out = Sampling.rendezvousShard(docs, "doc_id", numShards = 8)
    val rng = out.agg(min("shard"), max("shard")).head()
    assert(rng.getLong(0) >= 0L && rng.getLong(1) <= 7L)
    val a = out.select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sampling.rendezvousShard(docs.repartition(11), "doc_id", 8)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("rendezvousShard: minimal movement — adding shard N only moves keys INTO it") {
    val n8 = Sampling.rendezvousShard(docs, "doc_id", 8)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n9 = Sampling.rendezvousShard(docs, "doc_id", 9)
      .select("doc_id", "shard").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(n8.keySet == n9.keySet)
    val moved = n8.keys.filter(k => n8(k) != n9(k)).toSeq
    // every mover lands on the NEW shard — no reshuffling among old shards
    assert(moved.forall(k => n9(k) == 8L))
    // ~1/9 of keys expected to move; wide slack either side
    val frac = moved.size.toDouble / n8.size
    assert(frac > 0.02 && frac < 0.30, s"moved fraction $frac")
  }

  test("serpentineShards: hand block walk — descending ranks snake across shards") {
    import spark.implicits._
    val items = Seq((0L, 10L), (1L, 8L), (2L, 6L), (3L, 4L), (4L, 2L))
      .toDF("id", "sz")
    val got = Sampling.serpentineShards(items, "id", "sz", numShards = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._3).toSeq
    // ranks 0..4 → block 0: shards 0,1; block 1 (reversed): 1,0; block 2: 0
    assert(got == Seq((0L, 10L, 0L, 0L), (1L, 8L, 1L, 1L),
      (2L, 6L, 2L, 1L), (3L, 4L, 3L, 0L), (4L, 2L, 4L, 0L)))
  }

  test("serpentineShards: near-balanced loads on skewed real sizes; plain round-robin is worse") {
    val docs = graft.queries.Tables.documents(spark, sf())
      .select(col("doc_id"), col("n_chars"))
    val s = Sampling.serpentineShards(docs, "doc_id", "n_chars", numShards = 8)
    val loads = s.groupBy("shard").agg(sum("size").as("load"))
      .orderBy("shard").select("load").as[Long].collect()
    assert(loads.length == 8)
    val spread = (loads.max - loads.min).toDouble / loads.min
    assert(spread < 0.05, s"serpentine loads should be near-equal: ${loads.toSeq}")
    // same ranks, plain round-robin (no serpentine reversal): every block
    // gives its largest item to shard 0 — strictly worse balance
    val rr = s.withColumn("rr_shard", col("rank") % 8)
      .groupBy("rr_shard").agg(sum("size").as("load"))
      .select("load").as[Long].collect()
    val rrSpread = (rr.max - rr.min).toDouble / rr.min
    assert(spread <= rrSpread,
      s"serpentine ($spread) must not lose to round-robin ($rrSpread)")
  }

  test("negativeSample: never a seen item, block-constrained, k-bounded, " +
      "deterministic") {
    import org.apache.spark.sql.functions.col
    val inter = Seq((1L, 10L), (1L, 11L), (2L, 10L))
      .toDF("u", "item")
    val items = (10L to 60L).toDF("id")
    def run() = Sampling.negativeSample(inter, "u", "item", items, "id",
      k = 3, blocks = 2)
    val got = run().as[(Long, Long, Long)].collect()
    // never a previously interacted item
    val seen = Set((1L, 10L), (1L, 11L), (2L, 10L))
    assert(got.forall(r => !seen.contains((r._1, r._2))))
    // at most k per user, ranks dense from 1
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.length <= 3 && rs.map(_._3).sorted.sameElements(1L to rs.length))
    }
    // block constraint: sampled item's md5 block equals the user's
    def blk(x: Long) = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(x.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(h, 16) % 2
    }
    assert(got.forall(r => blk(r._1) == blk(r._2)))
    // replayable draw
    assert(run().as[(Long, Long, Long)].collect().toSet == got.toSet)
  }

  test("exactKPerGroup: k smallest draws per group, short groups whole") {
    import spark.implicits._
    val df = ((1L to 5L).map(i => (i, "a")) ++ Seq((10L, "b"), (11L, "b")))
      .toDF("id", "g")
    val got = Sampling.exactKPerGroup(df, "id", "g", k = 3)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    assert(got.count(_._1 == "a") == 3)
    assert(got.count(_._1 == "b") == 2, "short groups keep everything")
    // the kept a-rows are exactly the 3 smallest md5 draws
    def draw(i: Long): BigInt = BigInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"ek|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    val expectA = (1L to 5L).sortBy(i => (draw(i), i)).take(3).toSet
    assert(got.filter(_._1 == "a").map(_._2).toSet == expectA)
    // deterministic replay
    val again = Sampling.exactKPerGroup(df, "id", "g", k = 3)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    assert(again.toSet == got.toSet)
  }

  test("waterFillAllocation: threshold, remainder, conservation, regimes") {
    import spark.implicits._
    val demands = Seq(("a", 2L), ("b", 5L), ("c", 10L))
      .toDF("id", "d")
    def alloc(b: Long) = Sampling.waterFillAllocation(demands, "id", "d", b)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // B=10: a fully funded (2), threshold t=4 caps b and c
    assert(alloc(10L) == Map("a" -> 2L, "b" -> 4L, "c" -> 4L))
    // B=11: the +1 remainder goes to the first capped row in order
    assert(alloc(11L) == Map("a" -> 2L, "b" -> 5L, "c" -> 4L))
    // B >= total demand: everyone fully funded
    assert(alloc(20L) == Map("a" -> 2L, "b" -> 5L, "c" -> 10L))
    // tiny budget: nobody full, pure remainder split
    assert(alloc(2L) == Map("a" -> 1L, "b" -> 1L, "c" -> 0L))
    // conservation law at every budget
    (1L to 20L).foreach { b =>
      assert(alloc(b).values.sum == math.min(b, 17L), s"budget $b")
    }
    // non-positive demand fails by name
    val e = intercept[Exception] {
      Sampling.waterFillAllocation(Seq(("z", 0L)).toDF("id", "d"),
        "id", "d", 5L).collect()
    }
    assert(e.toString.contains("waterFillAllocation") ||
      Option(e.getCause).exists(_.toString.contains("waterFillAllocation")))
  }
}
