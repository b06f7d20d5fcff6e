package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram count + distinct count over a space-tokenized string, in
  * ONE pass with ZERO per-gram string materialization.
  *
  * The built-in formulation (`transform(sequence(...), concat_ws(...))`
  * + `array_distinct` + two `size`s) builds the token array, the index
  * array, and one concatenated string PER GRAM per row — on a corpus
  * where intra-doc repetition is scored for every document, that
  * allocation train is the hot path (text_repetition was the catalog's
  * steepest-slope query). The identity this expression exploits: tokens
  * are the single-space splits of the text, and an n-gram re-joined
  * with single spaces is therefore EXACTLY the substring of the
  * original text spanning its first token's start to its last token's
  * end — so distinct n-grams are distinct (offset, length) byte windows
  * of the input, countable with UTF8String views into the row's bytes
  * (no copies, no concat). Equality/hashing of the views is byte-exact,
  * so the count matches the built-in string semantics bit for bit,
  * including empty tokens from consecutive/leading/trailing spaces
  * (Spark's split keeps them; so does the byte scan).
  *
  * Returns struct<n_grams: bigint, n_distinct: bigint>; (0, 0) when the
  * text has fewer than n tokens; null input → null. The repetition
  * ratio is then plain arithmetic on the struct, and other quality
  * gates (type-token ratio, burstiness) can read the same counts.
  */
case class NgramStats(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    NgramStats.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.plans.NgramStats.compute($str, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramStats =
    copy(child = newChild)

  override def prettyName: String = "ngram_stats"
}

object NgramStats {
  /** One pass: token starts from the space positions (0x20 is never a
    * continuation byte in UTF-8, so the byte scan is safe), then each
    * window [start(i), end(i+n-1)) enters a hash set as a zero-copy
    * UTF8String view. Called from generated code.
    */
  def compute(s: UTF8String, n: Int): InternalRow = {
    val bytes = s.getBytes
    val len = bytes.length
    // token i spans [starts(i), starts(i+1) - 1); sentinel start = len+1
    var m = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') m += 1; i += 1 }
    val total = if (m >= n) (m - n + 1).toLong else 0L
    if (total == 0L)
      return new GenericInternalRow(Array[Any](0L, 0L))
    val starts = new Array[Int](m + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(m) = len + 1
    val seen = new java.util.HashSet[UTF8String](math.min(total, 1024L).toInt * 2)
    var g = 0
    var distinct = 0L
    while (g < total) {
      val from = starts(g)
      val to = starts(g + n) - 1 // end of token g+n-1
      if (seen.add(UTF8String.fromBytes(bytes, from, to - from))) distinct += 1
      g += 1
    }
    new GenericInternalRow(Array[Any](total, distinct))
  }
}
