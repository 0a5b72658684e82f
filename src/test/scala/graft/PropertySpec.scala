package graft

import org.apache.spark.sql.functions._
import graft.elb.{ElbParser, Features}

/** Property-style laws from SURVEY.md §5.2, over seeded pseudo-random
  * inputs (deterministic — no flaky sampling): sentinel casts total on any
  * string, status bucketing total on any int, timestamp two-format
  * round-trip, sessionization invariants.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("sentinel casts are total: any string maps to null or its numeric value") {
    val strs: Seq[String] = Seq("-", "", "0", "-1", "9223372036854775807",
      "9223372036854775808", "1.5", "abc", " 42", "42 ", "+7", "0x10", "NaN") ++
      (1 to 80).map(_ => rnd.nextInt(5) match {
        case 0 => rnd.nextLong().toString
        case 1 => rnd.nextDouble().toString
        case 2 => rnd.alphanumeric.take(rnd.nextInt(8)).mkString
        case 3 => "-"
        case _ => rnd.nextInt().toString + "x"
      })
    val out = strs.toDF("s")
      .select(ElbParser.nullSentinelLong(col("s")).as("l")).collect()
    out.zip(strs).foreach { case (r, s) =>
      // reference to_int uses Python int(), which (like try_cast) accepts
      // surrounding whitespace — trim before the Scala comparison
      val expected = if (s == "-") None else s.trim.toLongOption
      val actual = if (r.isNullAt(0)) None else Some(r.getLong(0))
      assert(actual == expected, s"input '$s'")
    }
  }

  test("status bucketing is total and agrees with the range definition") {
    val codes = (1 to 200).map(_ => rnd.nextInt(2001) - 1000)
    val out = codes.toDF("c")
      .select(Features.statusCodeType(col("c")).as("b")).as[String].collect()
    out.zip(codes).foreach { case (b, c) =>
      val expected =
        if (c >= 100 && c < 200) "1xx_Informational"
        else if (c >= 200 && c < 300) "2xx_Success"
        else if (c >= 300 && c < 400) "3xx_Redirection"
        else if (c >= 400 && c < 500) "4xx_ClientError"
        else if (c >= 500 && c < 600) "5xx_ServerError"
        else "Unknown"
      assert(b == expected, s"code $c")
    }
  }

  test("timestamp parse accepts both reference layouts and rejects others") {
    (1 to 40).foreach { _ =>
      val sec = math.abs(rnd.nextLong()) % 4102444800L
      val us = rnd.nextInt(1000000)
      val inst = java.time.Instant.ofEpochSecond(sec, us * 1000L)
      val base = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd'T'HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
        .format(inst)
      val cases = Seq(f"$base.$us%06dZ", s"${base}Z", base /* no Z → reject */)
      val out = cases.toDF("t")
        .select(ElbParser.parseTime(col("t")).as("ts")).collect()
      assert(!out(0).isNullAt(0), s"micros layout: ${cases(0)}")
      assert(!out(1).isNullAt(0), s"seconds layout: ${cases(1)}")
      assert(out(0).getTimestamp(0).getTime / 1000 == sec)
      assert(out(1).getTimestamp(0).getTime / 1000 == sec)
      assert(out(2).isNullAt(0), s"missing Z must reject: ${cases(2)}")
    }
  }

  test("sessionization invariant: sessions per user = gaps>30min + 1") {
    (1 to 5).foreach { trial =>
      val nUsers = 1 + rnd.nextInt(4)
      val gapsMin = (1 to 30).map(_ => if (rnd.nextBoolean()) 1L + rnd.nextInt(29)
        else 31L + rnd.nextInt(600))
      val rows = (0 until nUsers).flatMap { u =>
        var t = 0L
        gapsMin.map { g => t += g * 60000; (s"10.0.$trial.$u", new java.sql.Timestamp(t)) }
      }
      val df = rows.toDF("client_ip", "time")
        .withColumn("request", lit("GET / HTTP/1.1"))
        .withColumn("total_processing_time_ms", lit(1.0))
        .withColumn("path", lit("/"))
        .withColumn("user_agent", lit("ua"))
        .withColumn("elb_status_code", lit("200"))
        .withColumn("target_status_code", lit("200"))
        .withColumn("received_bytes", lit("1"))
        .withColumn("sent_bytes", lit("1"))
      val sessions = Features(df).select("session_id").distinct().count()
      // the first element offsets the first event, so only tail gaps are
      // inter-event gaps
      val bigGaps = gapsMin.tail.count(_ > 30)
      assert(sessions == nUsers.toLong * (bigGaps + 1))
    }
  }

  test("hash split is a partition: every id gets exactly one in-range bucket") {
    val ids = ((1 to 200).map(_ => rnd.nextLong()) ++
      Seq(Long.MinValue, Long.MaxValue, 0L, -1L)).distinct
    val df = ids.toDF("id")
    val buckets = df.select(graft.ops.Sampling.hashBucket(col("id")).as("b"))
      .as[Long].collect()
    assert(buckets.forall(b => b >= 0 && b < 100))
    // split assignment is exhaustive and single-valued: same row count,
    // no null split, weights partition [0,100)
    val split = graft.ops.Sampling.hashSplit(df, "id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10))
    assert(split.count() == ids.size)
    assert(split.filter(col("split").isNull).count() == 0)
    // sample(p) + sample-complement partitions the table
    val p80 = graft.ops.Sampling.hashSample(df, "id", 80).count()
    val p100 = graft.ops.Sampling.hashSample(df, "id", 100).count()
    assert(p100 == ids.size && p80 <= ids.size)
  }
}
