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

  test("property: decimal widening is representable-or-throw, never lossy") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // The exact decimal a numeric type encloses: its own shape for
    // decimals, the full-range decimal for integrals (the same table
    // SchemaEvolve uses — asserting against an independent statement of
    // the contract, not the implementation's private helper).
    def shape(t: DataType): (Int, Int) = t match {
      case d: DecimalType => (d.precision - d.scale, d.scale)
      case ByteType => (3, 0)
      case ShortType => (5, 0)
      case IntegerType => (10, 0)
      case LongType => (20, 0)
      case other => fail(s"unexpected generator output $other")
    }
    val decGen: Gen[DataType] = for {
      p <- Gen.chooseNum(1, DecimalType.MAX_PRECISION)
      s <- Gen.chooseNum(0, p)
    } yield DecimalType(p, s)
    val typeGen: Gen[DataType] = Gen.frequency(
      4 -> decGen,
      1 -> Gen.oneOf(ByteType, ShortType, IntegerType, LongType))
    val pairGen = Gen.zip(typeGen, typeGen)
    (1 to 400).foreach { i =>
      val (a, b) = pairGen.pureApply(Gen.Parameters.default, Seed(7000L + i))
      val (ia, sa) = shape(a)
      val (ib, sb) = shape(b)
      val needInt = math.max(ia, ib)
      val needScale = math.max(sa, sb)
      val fits = needInt + needScale <= DecimalType.MAX_PRECISION
      val got = try Some(SchemaEvolve.widen(a, b))
        catch { case _: IllegalArgumentException => None }
      got match {
        case Some(r) =>
          assert(fits, s"widen($a, $b) = $r returned where only " +
            s"Decimal(${needInt + needScale}, $needScale) could hold both " +
            s"— a silently lossy union")
          // representable: the result's integer digits and scale both
          // enclose each input's — no value of either type can overflow
          // or lose fractional digits in the cast
          val (ir, sr) = shape(r)
          assert(ir >= needInt && sr >= needScale,
            s"widen($a, $b) = $r cannot hold both inputs " +
              s"(needs int digits $needInt, scale $needScale)")
          // and the result is itself a legal Spark decimal
          assert(ir + sr <= DecimalType.MAX_PRECISION)
          // commutativity: column order across generations must not
          // change the unified schema
          assert(SchemaEvolve.widen(b, a) == r, s"widen not commutative on ($a, $b)")
        case None =>
          // throw is only acceptable when NO legal decimal holds both —
          // two same-family integrals always widen, so reaching here
          // means at least one side was a decimal and the union overflows
          assert(!fits, s"widen($a, $b) threw but Decimal(" +
            s"${needInt + needScale}, $needScale) is representable")
          assert(
            try { SchemaEvolve.widen(b, a); false }
            catch { case _: IllegalArgumentException => true },
            s"widen($b, $a) must throw symmetrically")
      }
    }
  }
}
