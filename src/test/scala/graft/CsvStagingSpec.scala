package graft

import java.nio.file.Files

import org.apache.spark.sql.types.StringType

import graft.sources.Staging

/** S1 fidelity: the staging CSV reader types every column as string with
  * NO schema inference, so dirty values survive staging and get typed (or
  * nulled) only at the warehouse load — exactly the reference's
  * VARCHAR(255) external tables.
  */
class CsvStagingSpec extends SparkSpec {

  test("all-string CSV scan keeps dirty values intact") {
    val dir = Files.createTempDirectory("graft_csv")
    val csv = dir.resolve("feed.csv")
    Files.writeString(csv,
      """id,amount,order_date,name
        |1,12.50,31-12-2023,Jane Roe -dirt
        |oops,not-a-number,13-13-2023,Bob#42
        |3,,,"quoted, comma"
        |""".stripMargin)

    val df = Staging.readCsvAllString(
      spark, csv.toString, Seq("id", "amount", "order_date", "name"))
    assert(df.schema.fields.forall(_.dataType == StringType))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    // bad values survive as raw strings (PG would have stored them too)
    assert(rows.exists(r => r.getString(0) == "oops" &&
      r.getString(1) == "not-a-number"))
    // quoting respected, empty fields are null
    assert(rows.exists(r => r.getString(3) == "quoted, comma"))
    assert(rows.exists(r => r.getString(0) == "3" && r.isNullAt(1)))

    // typing happens at load: the bad date nulls instead of failing
    import org.apache.spark.sql.functions._
    val typed = df.select(
      graft.functions.Cleaning.parseSourceDate(col("order_date")).as("d"))
    assert(typed.filter(col("d").isNotNull).count() == 1)
  }

  test("alignSchema conforms drifted batches to the declared staging schema") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val s = spark
    import s.implicits._
    val target = StructType(Seq(
      StructField("id", LongType), StructField("amount", DoubleType),
      StructField("order_date", StringType)))
    // drifted feed: missing order_date, extra vendor column, string id
    val drifted = Seq(("7", 1.5, "x")).toDF("id", "amount", "vendor_flag")
    def shape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq
    val (aligned, dropped) = Staging.alignSchema(drifted, target)
    assert(shape(aligned.schema) == shape(target))
    assert(dropped == Seq("vendor_flag"))
    val row = aligned.head()
    assert(row.getLong(0) == 7L && row.getDouble(1) == 1.5 && row.isNullAt(2))
    // a conforming batch passes through unchanged (and re-ordered)
    val ok = Seq((1L, 2.0, "2024-01-01")).toDF("id", "amount", "order_date")
      .select("order_date", "amount", "id")
    val (aligned2, dropped2) = Staging.alignSchema(ok, target)
    assert(shape(aligned2.schema) == shape(target) && dropped2.isEmpty)
    // case drift matches (spark.sql.caseSensitive=false default): data
    // survives under the declared name instead of null-filling
    val cased = Seq(("9", 3.5, "2024-02-02")).toDF("Id", "AMOUNT", "Order_Date")
    val (aligned3, dropped3) = Staging.alignSchema(cased, target)
    assert(dropped3.isEmpty)
    val r3 = aligned3.head()
    assert(r3.getLong(0) == 9L && r3.getDouble(1) == 3.5 &&
      r3.getString(2) == "2024-02-02")
  }

  test("strict typing quarantines rows whose casts fail instead of nulling them in") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_csv2")
    val csv = dir.resolve("feed.csv")
    Files.writeString(csv,
      """id,amount,order_date
        |1,12.50,31-12-2023
        |2,not-a-number,30-11-2023
        |3,7.25,13-13-2023
        |4,,01-01-2024
        |""".stripMargin)
    val staged = Staging.readCsvAllString(
      spark, csv.toString, Seq("id", "amount", "order_date"))
    val (typed, quarantined) = Staging.typedWithQuarantine(staged, Seq(
      ("amount_d", "amount", expr("try_cast(amount AS DOUBLE)")),
      ("order_d", "order_date",
        graft.functions.Cleaning.parseSourceDate(col("order_date")))))
    // rows 2 and 3 fail a cast; row 4's null amount is legitimately null
    assert(quarantined.select("id").collect().map(_.getString(0)).sorted
      .toSeq == Seq("2", "3"))
    assert(typed.select("id").collect().map(_.getString(0)).sorted
      .toSeq == Seq("1", "4"))
    assert(typed.filter(col("id") === "1").head().getAs[Double]("amount_d") == 12.5)
  }
}
