package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity — the record-linkage scorer
  * (name/title matching across registries) that neither `levenshtein`
  * (edit counts ignore WHERE edits happen; "martha"/"marhta" scores the
  * same as "martha"/"marthx") nor token Jaccard (one-word names have no
  * tokens to intersect) covers. Classic Jaro: matches within a
  * ⌊max(len)/2⌋−1 byte window, half-transposition penalty; Winkler
  * boost `+ℓ·0.1·(1−jaro)` for the common prefix ℓ ≤ 4, applied only
  * when jaro > 0.7.
  *
  * Semantics are pinned BYTE-level (UTF-8), empty-string → 0.0, window
  * clamped at 0 — each probed against DuckDB's
  * `jaro_winkler_similarity` so the oracle gates this kernel exactly
  * (non-ASCII: DuckDB measured byte-wise, e.g. 'héllo'/'hello' =
  * 0.84 = the 6-vs-5-BYTE jaro + 1-byte prefix boost, not the
  * 5-vs-5-char value — this expression reproduces that).
  *
  * Scale shape: O(len·window) per pair on the raw bytes, no allocation
  * beyond two small boolean arrays, fully inside whole-stage codegen
  * via a static-shaped call — the verify kernel of a blocked
  * similarity join (never run it all-pairs; block first, then score).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"
  // type deliberately inferred — see DotProduct.inputTypes
  override def inputTypes = Seq(StringType, StringType)

  /** Public: invoked from generated code via an object reference. */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0 // DuckDB: 0 even for "" vs ""
    val w = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - w)
      val hi = math.min(i + w + 1, l2)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // half-transpositions: matched bytes compared in sequence order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // FLOORED half-transpositions: DuckDB computes t/2 in integer math,
    // so an odd out-of-order count (e.g. the 3-cycle '054'/'405' in
    // otherwise-equal strings) penalizes as 1, not 1.5 — textbook
    // float halving diverges by a full 1/(3m) there (probed)
    val jaro = (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
    if (jaro > 0.7) {
      val maxP = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < maxP && s1(p) == s2(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("jw", this, classOf[JaroWinkler].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $self.compute($x, $y);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringSimilarityExpressions {
  val jaroWinklerName = "jaro_winkler"

  private[functions] def builder(exprs: Seq[Expression]): Expression =
    JaroWinkler(exprs.head, exprs(1))

  /** Idempotent per-session registration (temp function). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      jaroWinklerName, builder, "scala_udf")

  /** Column-level similarity; registers on the thread's active session
    * like [[SimhashExpressions.simhash]].
    */
  def jaroWinkler(a: Column, b: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(jaroWinklerName, a, b)
  }
}
