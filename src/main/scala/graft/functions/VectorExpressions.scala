package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The composable alternative — `aggregate(zip_with(a, b, *), 0.0, +)` —
  * materializes an intermediate product array per row and evaluates its
  * lambdas interpreter-side; this expression generates a tight primitive
  * loop inside whole-stage codegen instead (engine design preference (b):
  * custom `Expression` before custom plans or UDFs). The left-to-right
  * summation order matches the HOF fold exactly, so swapping
  * implementations cannot change results.
  *
  * Null semantics: null if either array is null; null *elements*
  * contribute 0 (embedding data has no null elements; keeps the loop
  * branch-light). Callers cast inputs to `array<double>`.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"
  // declared input types make the analyzer reject non-array inputs and
  // implicitly WIDEN array<float>/array<int> to array<double> — without
  // this, getDouble over a float array reads 8-byte strides of 4-byte
  // elements and returns garbage under codegen
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
         |    $acc += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Fused cosine similarity: ONE traversal of the pair accumulating
  * dot(a,b), dot(a,a), dot(b,b) — the composed form costs three passes
  * over the arrays per row. Accumulation order per accumulator is the
  * same left-to-right order as three separate [[DotProduct]] loops, and
  * the final `dab / (sqrt(daa) * sqrt(dbb))` is the identical arithmetic,
  * so fusing CANNOT change a single bit of any result (zero-norm inputs
  * yield the same NaN). Null semantics mirror the composition: null if
  * either array is null; a null *element* drops out of the accumulators
  * it would have fed.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // see DotProduct.inputTypes: reject non-arrays, widen float arrays
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements()
    val nb = y.numElements()
    val n = math.max(na, nb)
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      val hasA = i < na && !x.isNullAt(i)
      val hasB = i < nb && !y.isNullAt(i)
      if (hasA) { val v = x.getDouble(i); daa += v * v }
      if (hasB) { val w = y.getDouble(i); dbb += w * w }
      if (hasA && hasB) dab += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dab / (java.lang.Math.sqrt(daa) * java.lang.Math.sqrt(dbb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dab = ctx.freshName("dab")
      val daa = ctx.freshName("daa")
      val dbb = ctx.freshName("dbb")
      val hasA = ctx.freshName("hasA")
      val hasB = ctx.freshName("hasB")
      val v = ctx.freshName("v")
      val w = ctx.freshName("w")
      s"""
         |int $na = $x.numElements();
         |int $nb = $y.numElements();
         |int $n = java.lang.Math.max($na, $nb);
         |double $dab = 0.0; double $daa = 0.0; double $dbb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  boolean $hasA = $i < $na && !$x.isNullAt($i);
         |  boolean $hasB = $i < $nb && !$y.isNullAt($i);
         |  if ($hasA) { double $v = $x.getDouble($i); $daa += $v * $v; }
         |  if ($hasB) { double $w = $y.getDouble($i); $dbb += $w * $w; }
         |  if ($hasA && $hasB) { $dab += $x.getDouble($i) * $y.getDouble($i); }
         |}
         |${ev.value} = $dab / (java.lang.Math.sqrt($daa) * java.lang.Math.sqrt($dbb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  val functionName = "dot_product"
  val cosineName = "cosine_sim"

  /** Idempotent per-session registration (temp functions). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName, exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      cosineName, exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
  }

  /** Column-level dot product; requires [[register]] (or the extensions
    * class below) on the session.
    */
  def dotProduct(a: Column, b: Column): Column = call_function(functionName, a, b)

  /** Column-level fused cosine similarity; requires [[register]]. */
  def cosineSim(a: Column, b: Column): Column = call_function(cosineName, a, b)
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` registers the
  * engine's native functions at session build (production route; tests
  * and entry points may also call the per-object `register`s). The
  * injection list is public so a test can install the SAME tuples into
  * an existing session's registry — `getOrCreate` in a shared-session
  * JVM silently ignores the extensions config, so an in-suite test
  * through the builder would only ever see functions other tests
  * happened to register.
  */
object GraftExtensions {
  val injections: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier(VectorExpressions.functionName),
      new ExpressionInfo(classOf[DotProduct].getName, VectorExpressions.functionName),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))),
    (FunctionIdentifier(VectorExpressions.cosineName),
      new ExpressionInfo(classOf[CosineSimilarity].getName, VectorExpressions.cosineName),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))),
    (FunctionIdentifier(SimhashExpressions.functionName),
      new ExpressionInfo(classOf[SimhashDigest].getName, SimhashExpressions.functionName),
      SimhashExpressions.builder _),
    (FunctionIdentifier(MinhashExpressions.functionName),
      new ExpressionInfo(classOf[MinhashBandSigs].getName, MinhashExpressions.functionName),
      MinhashExpressions.builder _),
    (FunctionIdentifier(WinnowingExpressions.functionName),
      new ExpressionInfo(classOf[WinnowingFingerprints].getName,
        WinnowingExpressions.functionName),
      WinnowingExpressions.builder _),
    (FunctionIdentifier(WinnowingExpressions.anchorsName),
      new ExpressionInfo(classOf[WinnowingAnchors].getName,
        WinnowingExpressions.anchorsName),
      WinnowingExpressions.anchorsBuilder _),
    (FunctionIdentifier(WinnowingExpressions.extendName),
      new ExpressionInfo(classOf[ExtendMatch].getName,
        WinnowingExpressions.extendName),
      WinnowingExpressions.extendBuilder _),
    (FunctionIdentifier(RepetitionExpressions.functionName),
      new ExpressionInfo(classOf[RepetitionStats].getName,
        RepetitionExpressions.functionName),
      (exprs: Seq[Expression]) => RepetitionStats(exprs(0))),
    (FunctionIdentifier(NormalizeExpressions.functionName),
      new ExpressionInfo(classOf[UnicodeNormalize].getName,
        NormalizeExpressions.functionName),
      NormalizeExpressions.builder _),
    (FunctionIdentifier(BootstrapExpressions.functionName),
      new ExpressionInfo(classOf[BootstrapWeights].getName,
        BootstrapExpressions.functionName),
      BootstrapExpressions.builder _),
    (FunctionIdentifier(BloomFunctions.aggName),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        BloomFunctions.aggName),
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1), exprs(2))),
    (FunctionIdentifier(BloomFunctions.mightContainName),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        BloomFunctions.mightContainName),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1))))
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach(e.injectFunction)
}
