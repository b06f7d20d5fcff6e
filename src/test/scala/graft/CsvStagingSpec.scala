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
}
