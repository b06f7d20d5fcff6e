package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  private def eval1(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  test("shingles emits word 3-grams in order, empty below n tokens") {
    assert(
      eval1(TextAnalysis.shingles(lit("a b c d"), 3)) ==
        Seq("a b c", "b c d"))
    assert(eval1(TextAnalysis.shingles(lit("a b"), 3)) == Seq())
  }

  test("token counting and distinct ratio") {
    assert(eval1(TextAnalysis.tokenCount(lit("  x y  z x "))) == 4L)
    assert(eval1(TextAnalysis.distinctTokenCount(lit("x y z x"))) == 3L)
    assert(eval1(TextAnalysis.distinctRatio(lit("x x x x"))) == 0.25)
  }

  test("qualityFlag gates on length and diversity") {
    val longRepetitive = ("w " * 100).trim // 100 tokens, 1 distinct
    val healthy = (1 to 100).map(i => s"t$i").mkString(" ")
    assert(eval1(TextAnalysis.qualityFlag(lit("too short"))) == 0L)
    assert(eval1(TextAnalysis.qualityFlag(lit(longRepetitive))) == 0L)
    assert(eval1(TextAnalysis.qualityFlag(lit(healthy))) == 1L)
  }

  test("langIdHeuristic hits the first matching marker word") {
    val m = Seq("en" -> "the", "de" -> "der")
    assert(eval1(TextAnalysis.langIdHeuristic(lit("over the hill"), m)) == "en")
    assert(eval1(TextAnalysis.langIdHeuristic(lit("über der Brücke"), m)) == "de")
    assert(eval1(TextAnalysis.langIdHeuristic(lit("sans marqueur"), m)) == "und")
  }

  test("bpeTokenCount splits contractions, digits, and punctuation runs") {
    // don ' t [don|'t]... "don't stop, it's 42km!!" ->
    // don, 't, stop, ",", it, 's, 42, km, !!
    assert(eval1(TextAnalysis.bpeTokenCount(lit("don't stop, it's 42km!!"))) == 9L)
    assert(eval1(TextAnalysis.bpeTokenCount(lit("plain words"))) == 2L)
  }

  test("fingerprint depends only on the leading 64 chars") {
    val a = "x" * 64
    assert(eval1(TextAnalysis.fingerprint(lit(a))) ==
      eval1(TextAnalysis.fingerprint(lit(a + "tail"))))
  }

  test("scrubPii redacts every email and phone occurrence") {
    assert(
      eval1(TextAnalysis.scrubPii(
        lit("mail a.b+c@x-y.org or b@c.io, call 555-867-5309 x555-12"))) ==
        "mail <EMAIL> or <EMAIL>, call <PHONE> x555-12")
  }

  test("repetitionRatio is the repeated-bigram fraction") {
    // bigrams of "a b a b a b": [a b, b a, a b, b a, a b] -> 2 distinct / 5
    assert(math.abs(
      eval1(TextAnalysis.repetitionRatio(lit("a b a b a b")))
        .asInstanceOf[Double] - 0.6) < 1e-15)
    assert(eval1(TextAnalysis.repetitionRatio(lit("all unique words")))
      .asInstanceOf[Double] == 0.0)
  }

  test("tokenChunks covers every token with the declared overlap") {
    // 10 tokens, size 4, stride 3 -> starts 0,3,6,9; last chunk is 1 token
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val rows = eval1(TextAnalysis.tokenChunks(lit(text), chunkSize = 4, stride = 3))
      .asInstanceOf[scala.collection.Seq[org.apache.spark.sql.Row]]
      .map(r => (r.getLong(0), r.getSeq[String](1).toList)).toList
    assert(rows == List(
      0L -> List("t1", "t2", "t3", "t4"),
      1L -> List("t4", "t5", "t6", "t7"),
      2L -> List("t7", "t8", "t9", "t10"),
      3L -> List("t10")))
    // a short doc still yields one chunk
    val one = eval1(TextAnalysis.tokenChunks(lit("a b"), 40, 32))
      .asInstanceOf[scala.collection.Seq[org.apache.spark.sql.Row]]
    assert(one.length == 1 && one.head.getSeq[String](1) == Seq("a", "b"))
    intercept[IllegalArgumentException](TextAnalysis.tokenChunks(lit("x"), 8, 9))
  }
}
