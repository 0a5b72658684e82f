package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  private def digest(df: org.apache.spark.sql.DataFrame) =
    Integrity.datasetDigest(df, Seq(col("id"), col("s")), buckets = 4)
      .collect().map(r => (Option(r.get(0)), r.getLong(1), r.getLong(2)))
      .toSet

  test("digest is order- and partitioning-independent") {
    val rows = (1 to 200).map(i => (i.toLong, s"doc-$i"))
    val a = rows.toDF("id", "s")
    val b = spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(rows), 7)
        .map { case (i, s) => org.apache.spark.sql.Row(i, s) },
      a.schema)
    assert(digest(a) == digest(b))
  }

  test("a single changed row flips exactly its bucket and the total") {
    val base = (1 to 200).map(i => (i.toLong, s"doc-$i")).toDF("id", "s")
    val tweaked = (1 to 200).map(i =>
      (i.toLong, if (i == 57) "doc-57-CORRUPT" else s"doc-$i")).toDF("id", "s")
    val d0 = digest(base)
    val d1 = digest(tweaked)
    assert(d0 != d1)
    // the grand total count is unchanged but its digest flips, and the
    // damage localizes: at most the row's old bucket, its new bucket
    // (content change moves the row — bucket hashes the content) and
    // the total differ
    val t0 = d0.collectFirst { case (None, n, h) => (n, h) }.get
    val t1 = d1.collectFirst { case (None, n, h) => (n, h) }.get
    assert(t0._1 == t1._1 && t0._2 != t1._2)
    val diff = (d0 -- d1).map(_._1)
    assert(diff.size <= 3 && diff.contains(None))
  }

  test("a duplicated row is caught by the count even though XOR cancels") {
    val base = (1 to 50).map(i => (i.toLong, s"doc-$i"))
    val dup = base ++ Seq(base(7), base(7)) // row 8 now appears 3x
    val d0 = digest(base.toDF("id", "s"))
    val d1 = digest(dup.toDF("id", "s"))
    assert(d0 != d1)
    assert(d0.map(t => (t._1, t._2)) != d1.map(t => (t._1, t._2)))
  }

  test("bucket counts sum to the grand total; buckets are within range") {
    val d = digest((1 to 333).map(i => (i.toLong, s"x$i")).toDF("id", "s"))
    val total = d.collectFirst { case (None, n, _) => n }.get
    val perBucket = d.collect { case (Some(b), n, _) => (b, n) }
    assert(total == 333 && perBucket.map(_._2).sum == 333)
    assert(perBucket.forall { case (b, _) =>
      b.asInstanceOf[Long] >= 0 && b.asInstanceOf[Long] < 4 })
  }

  test("null values digest under the sentinel, distinctly from the string") {
    val withNull = Seq((1L, null.asInstanceOf[String])).toDF("id", "s")
    val withSentinel = Seq((1L, "~NULL~")).toDF("id", "s")
    // identical by design (documented contract: callers own sentinel
    // collisions) — the digest must at least be deterministic for both
    assert(digest(withNull) == digest(withSentinel))
  }
}
