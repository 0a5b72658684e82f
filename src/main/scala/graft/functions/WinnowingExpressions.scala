package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing (MOSS) fingerprint selection over one document.
  *
  * The relational shape ([[graft.ops.TextOps.winnowingFingerprintRowsRelational]],
  * kept as the checked reference) explodes one row per character k-gram —
  * ~len(text) rows per document — and needs a per-document sort window
  * for the sliding minima: an exchange plus sort whose input is the
  * CHARACTER count of the corpus. This expression selects the same
  * fingerprint set in one pass per row: hash every k-gram (md5, first 8
  * hex chars as an unsigned 32-bit value — exactly `conv(substr(md5(g),
  * 1, 8), 16, 10)`), slide the w-window with a monotonic deque (O(len)
  * total), and return the DISTINCT selected values sorted. Only the
  * selected fingerprints (a w-fold reduction) ever become rows.
  *
  * Substring positions are code-point based via `UTF8String.substring`,
  * matching Spark's `substring` exactly on non-ASCII text. Documents
  * with fewer than k+w-1 characters return an empty array — `explode`
  * then drops them, matching the reference chain's window filter.
  */
case class WinnowingFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k > 0 && w > 0, s"bad winnowing parameters k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowing_fps"
  // type deliberately inferred — see DotProduct.inputTypes
  override def inputTypes = Seq(StringType)

  @transient private lazy val mdLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Public: invoked from generated code via an object reference. */
  def compute(text: UTF8String): GenericArrayData = {
    val len = text.numChars()
    val nGrams = len - k + 1
    if (nGrams < w) return new GenericArrayData(Array.empty[Any])
    val md = mdLocal.get()
    val hvs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      md.reset()
      val d = md.digest(text.substring(i, i + k).getBytes)
      // unsigned value of the first 8 hex chars == first 4 digest bytes
      hvs(i) = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      i += 1
    }
    // sliding minima via monotonic deque: O(nGrams) total
    val selected = new java.util.TreeSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < nGrams) {
      while (!deque.isEmpty && hvs(deque.peekLast()) >= hvs(i)) deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst() <= i - w) deque.pollFirst()
      if (i >= w - 1) selected.add(hvs(deque.peekFirst()))
      i += 1
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnow", this,
      classOf[WinnowingFingerprints].getName)
    nullSafeCodeGen(ctx, ev, input => s"${ev.value} = $self.compute($input);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowingExpressions {
  val functionName = "winnowing_fps"

  private[functions] def builder(exprs: Seq[Expression]): Expression = {
    def intLit(e: Expression): Int = e.eval(null) match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(
        s"winnowing_fps parameters must be integer literals, got $other")
    }
    WinnowingFingerprints(exprs.head, intLit(exprs(1)), intLit(exprs(2)))
  }

  /** Idempotent per-session registration (temp function). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      functionName, builder, "scala_udf")

  /** Column-level fingerprint set; registers on the thread's active
    * session like [[SimhashExpressions.simhash]].
    */
  def fingerprints(text: Column, k: Int, w: Int): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function(functionName, text, lit(k), lit(w))
  }
}
