package graft.functions

import graft.SparkSpec
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("DotProduct matches the HOF fold bit-for-bit") {
    VectorExpressions.register(spark)
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, -0.2), Seq(0.3, 0.7)),
      (Seq.empty[Double], Seq.empty[Double])
    ).toDF("a", "b")
    val rows = df.select(
      VectorExpressions.dotProduct(col("a"), col("b")).as("fast"),
      Similarity.dot(col("a"), col("b")).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(2).getDouble(0) == 0.0)
  }

  test("DotProduct null semantics: null array -> null, length mismatch -> shorter") {
    VectorExpressions.register(spark)
    val df = Seq(
      (Some(Seq(1.0, 2.0)), None: Option[Seq[Double]]),
      (Some(Seq(1.0, 2.0, 100.0)), Some(Seq(3.0, 4.0)))
    ).toDF("a", "b")
    val rows = df.select(VectorExpressions.dotProduct(col("a"), col("b"))).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getDouble(0) == 11.0)
  }

  test("fused CosineSimilarity is bit-identical to the composed three-pass formula") {
    VectorExpressions.register(spark)
    val emb = graft.queries.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
    val pairs = emb.as("x").crossJoin(emb.as("y"))
      .where(col("x.vec_id") < col("y.vec_id") && col("x.vec_id") < 30)
    val rows = pairs.select(
      VectorExpressions.cosineSim(col("x.e"), col("y.e")).as("fused"),
      (VectorExpressions.dotProduct(col("x.e"), col("y.e")) /
        (sqrt(VectorExpressions.dotProduct(col("x.e"), col("x.e"))) *
         sqrt(VectorExpressions.dotProduct(col("y.e"), col("y.e")))))
        .as("composed"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"fused ${r.getDouble(0)} != composed ${r.getDouble(1)}"))
  }

  test("registration via GraftExtensions exposes dot_product to SQL") {
    // same-JVM second session with the extensions class
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val r = s2.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .collect().head.getDouble(0)
    assert(r == 11.0)
    // every native kernel the engine ships resolves through the same
    // injection tuples (installed directly — in a shared-session JVM
    // getOrCreate ignores the extensions config, so the SQL above only
    // proves the builder route when this suite runs first)
    GraftExtensions.injections.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    val fns = spark.sql(
      """SELECT simhash_digest(array('a','b'), 16), minhash_band_sigs(array('a'), 12, 3),
        |  winnowing_fps('abcdef', 3, 4),
        |  graft_repetition_stats(array('a','a','b')).top_count,
        |  graft_might_contain(CAST(null AS BINARY), xxhash64('x'))
        |""".stripMargin).collect().head
    assert(fns.getLong(3) == 2L)
    assert(fns.isNullAt(4)) // null bloom -> null, the expression's contract
  }

  test("float arrays are implicitly widened, not read as garbage strides") {
    VectorExpressions.register(spark)
    // a raw array<float> embedding column — the natural SQL call; the
    // declared input types must widen it element-wise to array<double>
    val r = spark.sql(
      """SELECT
        |  cosine_sim(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
        |             array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS c,
        |  dot_product(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)),
        |              array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT))) AS d
        |""".stripMargin).collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 11.0)
    // non-array input is an analysis error, not runtime garbage
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_sim('not an array', array(1.0d))").collect()
    }
  }
}
