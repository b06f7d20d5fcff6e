package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The most frequent word n-gram of a document, in one byte-scan pass —
  * the per-doc histogram argmax behind the Gopher "fraction of characters
  * in the most common n-gram" repetition rule (Rae et al. 2021, A1.1),
  * which [[NgramStats]]' distinct-count ratio cannot express.
  *
  * Same zero-materialization identity as [[NgramStats]]: an n-gram
  * re-joined with single spaces is exactly the (offset, length) byte
  * window of the original text from its first token's start to its last
  * token's end, so the histogram keys are zero-copy UTF8String views.
  * Only the winning gram is ever surfaced as a value.
  *
  * Ties break to the byte-wise SMALLEST gram (UTF8String binary order ==
  * DuckDB/ANSI binary collation), so the result is deterministic and
  * oracle-replayable with `ORDER BY cnt DESC, gram LIMIT 1`.
  *
  * Returns struct<n_grams: bigint, top_count: bigint, top_gram: string>;
  * NULL when the text has fewer than n tokens (no histogram to rank) or
  * the input is null.
  */
case class NgramTop(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("top_gram", StringType, nullable = false)))

  // null for sub-n docs, not just null input
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    NgramTop.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => s"""
      ${ev.value} = graft.plans.NgramTop.compute($str, $n);
      ${ev.isNull} = (${ev.value} == null);
    """)

  override protected def withNewChildInternal(newChild: Expression): NgramTop =
    copy(child = newChild)

  override def prettyName: String = "ngram_top"
}

object NgramTop {
  /** One pass: token starts from the space positions, histogram of the
    * [start(i), end(i+n-1)) windows as zero-copy views, then the argmax
    * with (count DESC, bytes ASC) tie-break. Called from generated code.
    */
  def compute(s: UTF8String, n: Int): InternalRow = {
    val bytes = s.getBytes
    val len = bytes.length
    var m = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') m += 1; i += 1 }
    val total = if (m >= n) (m - n + 1).toLong else 0L
    if (total == 0L) return null
    val starts = new Array[Int](m + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(m) = len + 1
    val counts = new java.util.HashMap[UTF8String, Int](
      math.min(total, 1024L).toInt * 2)
    var g = 0
    while (g < total) {
      val from = starts(g)
      val view = UTF8String.fromBytes(bytes, from, starts(g + n) - 1 - from)
      counts.merge(view, 1, (a, b) => a + b)
      g += 1
    }
    var bestGram: UTF8String = null
    var bestCount = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > bestCount ||
        (c == bestCount && e.getKey.compareTo(bestGram) < 0)) {
        bestCount = c
        bestGram = e.getKey
      }
    }
    new GenericInternalRow(Array[Any](total, bestCount.toLong, bestGram))
  }
}
