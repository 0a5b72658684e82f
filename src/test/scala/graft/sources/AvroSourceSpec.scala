package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The `graftavro` DataSource V2 + [[AvroStage]] writer: lossless
  * round-trip over the primitive lattice (nulls included),
  * schema-from-container inference, plan-level column pruning, and loud
  * failure on out-of-contract types.
  */
class AvroSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val fixture = Seq(
    (1L, Some("alpha"), Some(1.5), Some(true), Some(7)),
    (2L, None, Some(-2.25), Some(false), None),
    (3L, Some("gamma"), None, None, Some(-1)))
    .toDF("id", "name", "score", "flag", "rank")

  private lazy val staged = {
    val p = java.nio.file.Files.createTempDirectory("avro-spec")
      .resolve("t.avro").toString
    AvroStage.write(fixture.repartition(2), p, "t")
    p
  }

  test("round-trip: values, nulls, and inferred schema survive exactly") {
    val back = spark.read.format("graftavro").load(staged)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Seq("id" -> LongType, "name" -> StringType, "score" -> DoubleType,
        "flag" -> BooleanType, "rank" -> IntegerType))
    assert(back.schema.fields.forall(_.nullable))
    val got = back.as[(Long, Option[String], Option[Double], Option[Boolean],
      Option[Int])].collect().toSet
    val want = fixture.as[(Long, Option[String], Option[Double],
      Option[Boolean], Option[Int])].collect().toSet
    assert(got == want)
  }

  test("column pruning reaches the scan (ReadSchema shows only requested)") {
    val pruned = spark.read.format("graftavro").load(staged).select("name")
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: BatchScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.description().contains("ReadSchema: name"),
      scans.head.scan.description())
  }

  test("one partition per container file") {
    val n = new java.io.File(staged).listFiles()
      .count(_.getName.endsWith(".avro"))
    assert(n == 2, s"expected 2 staged files, got $n")
    assert(spark.read.format("graftavro").load(staged).rdd.getNumPartitions == 2)
  }

  test("binary columns round-trip byte-exactly") {
    val p = java.nio.file.Files.createTempDirectory("avro-spec-bin")
      .resolve("b.avro").toString
    val src = Seq((1L, Array[Byte](0, 1, -1, 127)),
      (2L, Array.empty[Byte])).toDF("id", "payload")
    AvroStage.write(src, p, "b")
    val got = spark.read.format("graftavro").load(p)
      .as[(Long, Array[Byte])].collect().toMap
    assert(got(1L).toSeq == Seq[Byte](0, 1, -1, 127))
    assert(got(2L).isEmpty)
  }

  test("out-of-contract types fail loudly on write") {
    val nested = Seq((1L, Seq(1, 2))).toDF("id", "xs")
    val e = intercept[IllegalArgumentException] {
      AvroStage.toAvroSchema(nested.schema, "bad")
    }
    assert(e.getMessage.contains("unsupported Spark type"))
  }
}
