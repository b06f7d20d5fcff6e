package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types._

/** Schema evolution across ingest generations.
  *
  * A long-lived feed changes shape: columns get added, legacy names get
  * replaced, and narrow types get widened (int ids outgrow 32 bits, a
  * date column starts carrying time-of-day). The reference pins one
  * 30-all-string staging schema per feed (consumer.sql:17–49) and so
  * never faces this; a 100 TB corpus accumulated over years always does —
  * historical parquet keeps the schema it was written with, and rewriting
  * history on every upstream change is exactly the O(corpus) job this
  * module avoids. Spark's own `mergeSchema` handles only the add-column
  * case; renames and retypes need declared intent, which is what
  * [[alignTo]]/[[unionEvolved]] provide.
  *
  * Everything here is a pure projection (rename + cast + null-fill):
  * map-side, codegen'd, zero shuffle — alignment cost at 100 TB is the
  * scan itself, and filters/pruning still push through to each
  * generation's files.
  */
object SchemaEvolve {

  /** The widened type two generations of one column unify to, or an
    * error for genuinely incompatible drift (silent stringification
    * hides corruption — incompatibility should fail the load):
    *
    *  - integrals widen up (byte < short < int < long);
    *  - any integral ∪ any fractional → double (NOT float — an int's 31
    *    bits don't survive a float's 24-bit mantissa);
    *  - decimal ∪ decimal → the enclosing decimal (max integer digits,
    *    max scale); integral ∪ decimal → the decimal enclosing both;
    *    fractional ∪ decimal → double (the decimal's exactness is
    *    already lost on the fractional side);
    *  - date ∪ timestamp (with or without time zone) → that timestamp
    *    type (midnight extension).
    */
  def widen(a: DataType, b: DataType): DataType = (a, b) match {
    case (x, y) if x == y => x
    case (x, y) if isInt(x) && isInt(y) =>
      if (intRank(x) >= intRank(y)) x else y
    case (x: DecimalType, y: DecimalType) =>
      val intDigits = math.max(x.precision - x.scale, y.precision - y.scale)
      val scale = math.max(x.scale, y.scale)
      // No silent clamp: Decimal(38,0) ∪ Decimal(10,10) would "widen" to
      // Decimal(38,10), which cannot hold (38,0)'s range — the cast would
      // overflow at load time (ANSI error / silent null), violating this
      // module's contract that incompatible drift fails at widen time.
      if (intDigits + scale > DecimalType.MAX_PRECISION)
        throw new IllegalArgumentException(
          s"incompatible schema drift: $a vs $b needs Decimal(${intDigits + scale}," +
            s" $scale), beyond MAX_PRECISION ${DecimalType.MAX_PRECISION}")
      DecimalType(intDigits + scale, scale)
    case (x, y: DecimalType) if isInt(x) => widen(intDecimal(x), y)
    case (x: DecimalType, y) if isInt(y) => widen(x, intDecimal(y))
    case (_: DecimalType, FloatType | DoubleType) |
        (FloatType | DoubleType, _: DecimalType) => DoubleType
    case (x, FloatType | DoubleType) if isInt(x) => DoubleType
    case (FloatType | DoubleType, y) if isInt(y) => DoubleType
    case (FloatType, DoubleType) | (DoubleType, FloatType) => DoubleType
    case (DateType, TimestampType | TimestampNTZType) => b
    case (TimestampType | TimestampNTZType, DateType) => a
    case _ =>
      throw new IllegalArgumentException(
        s"incompatible schema drift: $a vs $b has no safe widening")
  }

  private def isInt(t: DataType): Boolean = intRank(t) >= 0

  private def intRank(t: DataType): Int = t match {
    case ByteType => 0
    case ShortType => 1
    case IntegerType => 2
    case LongType => 3
    case _ => -1
  }

  /** The exact decimal enclosing an integral type's full range. */
  private def intDecimal(t: DataType): DecimalType = t match {
    case ByteType => DecimalType(3, 0)
    case ShortType => DecimalType(5, 0)
    case IntegerType => DecimalType(10, 0)
    case _ => DecimalType(20, 0)
  }

  /** The unified target of several generations' schemas (AFTER renames):
    * by-name union in first-seen column order, each shared column
    * [[widen]]ed, and every column missing from any generation nullable.
    */
  def targetSchema(schemas: Seq[StructType]): StructType = {
    val order = scala.collection.mutable.LinkedHashMap.empty[String, StructField]
    schemas.foreach(_.foreach { f =>
      order.get(f.name) match {
        case None => order(f.name) = f
        case Some(prev) =>
          val t =
            try widen(prev.dataType, f.dataType)
            catch {
              case e: IllegalArgumentException =>
                throw new IllegalArgumentException(s"column ${f.name}: ${e.getMessage}")
            }
          order(f.name) = StructField(f.name, t, prev.nullable || f.nullable)
      }
    })
    val names = order.keys.toSeq
    StructType(names.map { n =>
      val f = order(n)
      val everywhere = schemas.forall(_.fieldNames.contains(n))
      if (everywhere) f else f.copy(nullable = true)
    })
  }

  /** Project one generation onto `target`: apply its legacy→canonical
    * `renames`, cast each present column to the target type, fill absent
    * columns with typed nulls. Columns outside the target are dropped —
    * when the target came from [[targetSchema]] over all generations
    * there are none; an explicit contract schema drops extras by design.
    */
  def alignTo(df: DataFrame, target: StructType,
      renames: Map[String, String] = Map.empty): DataFrame = {
    renames.foreach { case (from, to) =>
      require(!(df.columns.contains(to) && df.columns.contains(from)),
        s"rename $from->$to collides: frame already has $to")
    }
    val renamed = df.withColumnsRenamed(renames)
    val have = renamed.columns.toSet
    renamed.select(target.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Union several generations under their evolved common schema: each
    * frame's renames are applied, the [[targetSchema]] is derived from
    * the renamed schemas, every frame is [[alignTo]]-projected, and the
    * results union positionally (all aligned). One logical scan per
    * generation plus a union — no shuffle, no data rewrite.
    */
  def unionEvolved(gens: Seq[(DataFrame, Map[String, String])]): DataFrame = {
    require(gens.nonEmpty, "unionEvolved needs at least one generation")
    val renamed = gens.map { case (df, rn) =>
      rn.foreach { case (from, to) =>
        require(!(df.columns.contains(to) && df.columns.contains(from)),
          s"rename $from->$to collides: frame already has $to")
      }
      df.withColumnsRenamed(rn)
    }
    val target = targetSchema(renamed.map(_.schema))
    renamed.map(alignTo(_, target)).reduce(_.unionByName(_))
  }
}
