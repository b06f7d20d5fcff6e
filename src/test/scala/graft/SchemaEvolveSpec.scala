package graft

import org.apache.spark.sql.types._

import graft.sources.SchemaEvolve

/** Schema evolution across ingest generations: declared renames, type
  * widening, null-fill for added columns — all as pure projections.
  */
class SchemaEvolveSpec extends SparkSpec {
  private lazy val s = spark
  import s.implicits._

  test("widen: integral ladder, fractional promotion, decimal enclosure") {
    assert(SchemaEvolve.widen(IntegerType, LongType) == LongType)
    assert(SchemaEvolve.widen(ByteType, ShortType) == ShortType)
    assert(SchemaEvolve.widen(IntegerType, IntegerType) == IntegerType)
    // int ∪ float must NOT be float: 31 bits don't fit a 24-bit mantissa
    assert(SchemaEvolve.widen(IntegerType, FloatType) == DoubleType)
    assert(SchemaEvolve.widen(FloatType, DoubleType) == DoubleType)
    assert(SchemaEvolve.widen(DecimalType(10, 2), DecimalType(12, 0)) == DecimalType(14, 2))
    assert(SchemaEvolve.widen(LongType, DecimalType(10, 2)) == DecimalType(22, 2))
    assert(SchemaEvolve.widen(DecimalType(10, 2), DoubleType) == DoubleType)
    assert(SchemaEvolve.widen(DateType, TimestampType) == TimestampType)
    assert(SchemaEvolve.widen(TimestampNTZType, DateType) == TimestampNTZType)
    intercept[IllegalArgumentException](SchemaEvolve.widen(StringType, LongType))
  }

  test("targetSchema: first-seen order, widened types, absent => nullable") {
    val a = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("v", FloatType, nullable = false)))
    val b = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tag", StringType, nullable = false)))
    val t = SchemaEvolve.targetSchema(Seq(a, b))
    assert(t.fieldNames.toSeq == Seq("id", "v", "tag"))
    assert(t("id") == StructField("id", LongType, nullable = false))
    assert(t("v") == StructField("v", FloatType, nullable = true)) // absent in b
    assert(t("tag") == StructField("tag", StringType, nullable = true)) // absent in a
    val bad = StructType(Seq(StructField("id", StringType)))
    val e = intercept[IllegalArgumentException](SchemaEvolve.targetSchema(Seq(a, bad)))
    assert(e.getMessage.contains("column id"))
  }

  test("unionEvolved merges generations: rename + widen + null-fill, exact rows") {
    val genA = Seq((1, 10.5f), (2, 20.0f)).toDF("id", "order_value")
    val genB = Seq((3L, 30.25, "web"), (4L, 40.0, "store"))
      .toDF("id", "value", "channel")
    val merged = SchemaEvolve.unionEvolved(Seq(
      genA -> Map("order_value" -> "value"), genB -> Map.empty[String, String]))
    assert(merged.schema.fieldNames.toSeq == Seq("id", "value", "channel"))
    assert(merged.schema("id").dataType == LongType)
    assert(merged.schema("value").dataType == DoubleType)
    val rows = merged.collect().map(r =>
      (r.getLong(0), r.getDouble(1), if (r.isNullAt(2)) null else r.getString(2)))
      .sortBy(_._1).toSeq
    assert(rows == Seq((1L, 10.5, null), (2L, 20.0, null),
      (3L, 30.25, "web"), (4L, 40.0, "store")))
  }

  test("rename onto an existing column is rejected, not silently merged") {
    val df = Seq((1, 2)).toDF("old_id", "id")
    intercept[IllegalArgumentException](
      SchemaEvolve.unionEvolved(Seq(df -> Map("old_id" -> "id"))))
  }

  test("alignment is projection-only: no shuffle enters the plan") {
    val genA = Seq((1, 1.0f)).toDF("id", "v")
    val genB = Seq((2L, 2.0, "x")).toDF("id", "v", "tag")
    val merged = SchemaEvolve.unionEvolved(Seq(
      genA -> Map.empty[String, String], genB -> Map.empty[String, String]))
    val physical = merged.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"), s"alignment must not shuffle:\n$physical")
  }
}
