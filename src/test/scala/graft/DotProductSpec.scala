package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Native DotProduct expression vs the zip_with reference implementation:
  * identical arithmetic (sequential fold), float and double arrays, null
  * and length-mismatch handling, and SQL-name resolution through
  * GraftExtensions.
  */
class DotProductSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  test("native == zip_with on double arrays, bit for bit") {
    val df = Seq(
      (Seq(1.5, -2.25, 3.125), Seq(0.5, 4.0, -1.0)),
      (Seq(0.1, 0.2, 0.3), Seq(0.7, 0.8, 0.9)),
      (Seq.empty[Double], Seq.empty[Double]))
      .toDF("a", "b")
    val out = df.select(
      Similarity.dot(col("a"), col("b")).as("ref"),
      Similarity.dotNative(col("a"), col("b")).as("native")).collect()
    out.foreach(r => assert(r.getDouble(0) == r.getDouble(1), r))
  }

  test("float arrays work without an explicit cast") {
    val df = Seq((Seq(1.5f, 2.5f), Seq(2.0f, 4.0f))).toDF("a", "b")
    val v = df.select(Similarity.dotNative(col("a"), col("b"))).head().getDouble(0)
    assert(v == 13.0)
  }

  test("null array yields null; length mismatch folds over the shorter") {
    val df = Seq((Some(Seq(1.0, 2.0, 3.0)), Seq(10.0))).toDF("a", "b")
    assert(df.select(Similarity.dotNative(col("a"), col("b"))).head().getDouble(0) == 10.0)
    val withNull = df.select(
      Similarity.dotNative(lit(null).cast("array<double>"), col("b")).as("v"))
    assert(withNull.head().isNullAt(0))
  }

  test("several DotProducts in ONE generated projection compile (no interpreter fallback)") {
    // regression: the loop variable must be freshName'd — a cosine
    // projection evaluates dot(a,b), dot(a,a), dot(b,b) in one codegen
    // function, and a shared `int i` fails compilation, silently kicking
    // the projection out of codegen. generate() (unlike create()) throws
    // instead of falling back.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val arr = ArrayType(DoubleType)
    val a = BoundReference(0, arr, nullable = false)
    val b = BoundReference(1, arr, nullable = false)
    val proj = GenerateUnsafeProjection.generate(Seq(
      graft.plans.DotProduct(a, b),
      graft.plans.DotProduct(a, a),
      graft.plans.DotProduct(b, b)))
    val row = InternalRow(
      ArrayData.toArrayData(Array(1.0, 2.0)),
      ArrayData.toArrayData(Array(3.0, 4.0)))
    val out = proj(row)
    assert(out.getDouble(0) == 11.0 && out.getDouble(1) == 5.0 && out.getDouble(2) == 25.0)
  }

  test("resolves by name in SQL through GraftExtensions") {
    val v = spark.sql("SELECT dot_productf(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .head().getDouble(0)
    assert(v == 11.0)
  }
}
