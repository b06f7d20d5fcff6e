package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Native NgramTop vs a driver-side reference histogram: identical
  * (total, top count, top gram) on repetition, all-distinct ties
  * (byte-order tie-break), empty tokens from space runs, multi-byte
  * UTF-8, and sub-n docs (null) — plus SQL-name resolution and codegen.
  */
class NgramTopSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  private val corpus = Seq(
    "a b a b a b",             // clear winner "a b" (3 of 5)
    "a b c a",                 // all grams count 1 -> tie -> smallest "a b"
    "x y z x y",               // "x y" twice
    "one",                     // sub-n -> null
    "",                        // single empty token -> null
    "a  b a  b",               // empty tokens: grams include "a " and " b"
    " a b",                    // leading space: first token empty
    "héllo wörld héllo wörld héllo wörld",
    "z a z a z")               // tie between "z a" (2) and "a z" (2) -> "a z"

  /** Reference: split(" ", -1) (Spark keeps trailing empties), n-grams
    * joined by one space, histogram argmax with (count DESC, UTF-8 bytes
    * ASC) tie-break.
    */
  private def ref(text: String, n: Int): Option[(Long, Long, String)] = {
    val toks = text.split(" ", -1)
    if (toks.length < n) return None
    val grams = toks.sliding(n).map(_.mkString(" ")).toSeq
    val byteLt = (a: String, b: String) => {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val c = java.util.Arrays.compareUnsigned(x, y)
      c < 0
    }
    val counts = grams.groupBy(identity).view.mapValues(_.size).toMap
    val top = counts.toSeq.sortWith { case ((g1, c1), (g2, c2)) =>
      c1 > c2 || (c1 == c2 && byteLt(g1, g2))
    }.head
    Some((grams.size.toLong, top._2.toLong, top._1))
  }

  test("native == reference histogram argmax, n=1/2/3") {
    for (n <- Seq(1, 2, 3)) {
      val rows = corpus.toDF("text")
        .select(col("text"), TextAnalysis.ngramTop(col("text"), n).as("tp"))
        .collect()
      rows.foreach { r =>
        val text = r.getString(0)
        ref(text, n) match {
          case None =>
            assert(r.isNullAt(1), s"n=$n text='$text': want null")
          case Some((total, cnt, gram)) =>
            val got = r.getStruct(1)
            assert(got.getLong(0) == total && got.getLong(1) == cnt &&
              got.getString(2) == gram,
              s"n=$n text='$text': want ($total,$cnt,'$gram') got $got")
        }
      }
    }
  }

  test("resolves by SQL name through GraftExtensions") {
    corpus.toDF("text").createOrReplaceTempView("ngram_top_docs")
    val r = s.sql(
      "SELECT ngram_top(text, 2).top_gram AS g, ngram_top(text, 2).top_count AS c " +
        "FROM ngram_top_docs WHERE text = 'a b a b a b'").head()
    assert(r.getString(0) == "a b" && r.getLong(1) == 3L)
  }

  test("stays inside generated code (no interpreter fallback)") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.types.StringType
    import graft.plans.NgramTop
    val expr = NgramTop(BoundReference(0, StringType, nullable = true), 2)
    GenerateUnsafeProjection.generate(Seq(expr)) // throws on codegen failure
  }

  test("null text yields null") {
    val r = Seq((1, Option.empty[String])).toDF("id", "text")
      .select(TextAnalysis.ngramTop(col("text"), 2).as("tp")).head()
    assert(r.isNullAt(0))
  }
}
