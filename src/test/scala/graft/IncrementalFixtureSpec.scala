package graft

import java.nio.file.{Files, Path, Paths}
import java.sql.Date

import org.apache.commons.compress.archivers.sevenz.SevenZFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.functions.Cleaning
import graft.operators.{QualityChecks, Scd2}
import graft.sources.{Staging, TableStore}

/** Replays the reference's OWN incremental-load fixtures
  * (`Source files/Incremental loads/incremental_consumer.7z` /
  * `incremental_corp_home.7z` — the second-batch CSVs its ETL reruns
  * consume) through this library's staging + SCD machinery. The archives
  * are plain single-file LZMA2 7z containers, readable with the
  * commons-compress `SevenZFile` already on Spark's classpath, so the
  * fixtures are extracted at test time rather than copied into the repo.
  *
  * What a replay certifies that the synthesized-feed specs can't: the
  * REAL batch data exercises the documented dirt conventions end to end —
  * `#`-suffixed keys (bl_cl.sql:101–105, 143–147), `' -'`-suffixed names
  * (bl_cl.sql:106–110, 148–152), dd-MM-yyyy dates (bl_cl.sql:1246),
  * corporate single-field `Employee Name` split (bl_cl.sql:1069–1070) —
  * and the incremental contract itself: staging the same batch twice must
  * trip the duplicate-load guard (bl_cl.sql:49–62), and re-applying an
  * already-applied batch through SCD2 must be a no-op (reference M1–M8
  * reruns are idempotent per load).
  *
  * Skips (doesn't fail) when the reference checkout isn't present.
  */
class IncrementalFixtureSpec extends SparkSpec {

  private val archiveDir = Paths.get("/root/reference/Source files/Incremental loads")

  // FIXTURES.md §1/§2 staging column names (consumer.sql:17–49,
  // corporate.sql:17–49) — positional, the CSV header row is skipped.
  private val consumerCols = Seq(
    "Row_ID", "Order_Number", "Employee_FirstName", "Employee_LastName",
    "Employee_Nr", "Order_Date", "Ship_Date", "Ship_Mode", "Customer_Nr",
    "Customer_Name", "Address", "Gender", "Age_Group", "Email", "Segment",
    "City", "State", "Country", "Postal_Code", "Market", "Product_Nr",
    "Category_Name", "Sub_Category_Name", "Product_Name", "Sales",
    "Quantity", "Discount", "Profit", "Shipping_Cost", "Order_Priority")
  private val corporateCols = Seq(
    "Row_ID", "Order_ID", "Employee_Name", "Employee_ID", "Order_Date",
    "Shipping", "Ship_Mode", "Customer_ID", "Tax_Number", "Sector",
    "Contact_Person", "Shipping_Address", "Email", "Segment", "City",
    "State", "Country", "Postal_Code", "Market", "Region", "Product_ID",
    "Category", "Sub_Category", "Product_Name", "Sales", "Quantity",
    "Discount", "Profit", "Shipping_Cost", "Order_Priority")

  /** Extract the (single) CSV entry of a reference 7z archive to a temp
    * file; None when the reference checkout is absent.
    */
  private def extract(archive: String): Option[Path] = {
    val p = archiveDir.resolve(archive)
    if (!Files.exists(p)) None
    else {
      val sz = SevenZFile.builder().setFile(p.toFile).get()
      try {
        Iterator.continually(sz.getNextEntry).takeWhile(_ != null)
          .find(!_.isDirectory)
          .map { entry =>
            val buf = new Array[Byte](entry.getSize.toInt)
            var off = 0
            while (off < buf.length) {
              val n = sz.read(buf, off, buf.length - off)
              require(n > 0, s"short read extracting ${entry.getName}")
              off += n
            }
            val out = Files.createTempDirectory("graft_fixture")
              .resolve(entry.getName)
            Files.write(out, buf)
            out
          }
      } finally sz.close()
    }
  }

  private def staged(archive: String, cols: Seq[String]): Option[DataFrame] =
    extract(archive).map(p => Staging.readCsvAllString(spark, p.toString, cols))

  test("both incremental batches stage all-string with the declared 30-column schemas") {
    val consumer = staged("incremental_consumer.7z", consumerCols)
    assume(consumer.isDefined, "reference incremental fixtures not present")
    val corporate = staged("incremental_corp_home.7z", corporateCols).get
    for (df <- Seq(consumer.get, corporate)) {
      assert(df.schema.fields.length == 30)
      assert(df.schema.fields.forall(_.dataType == StringType))
    }
    assert(consumer.get.count() == 194)
    assert(corporate.count() == 195)
  }

  test("the real batch data exercises every documented dirt convention") {
    val consumerOpt = staged("incremental_consumer.7z", consumerCols)
    assume(consumerOpt.isDefined, "reference incremental fixtures not present")
    val consumer = consumerOpt.get.cache()
    val corporate = staged("incremental_corp_home.7z", corporateCols).get.cache()

    // the fixtures really DO carry the dirt (otherwise these assertions
    // would vacuously pass on clean data)
    assert(consumer.filter(col("Customer_Nr").contains("#")).count() > 0)
    assert(consumer.filter(col("Customer_Name").contains(" -")).count() > 0)
    assert(corporate.filter(col("Customer_ID").contains("#")).count() > 0)
    assert(corporate.filter(col("Contact_Person").contains(" -")).count() > 0)

    // F1/F2 cleaning leaves no residue and never nulls a present value
    val cleaned = consumer.select(
      Cleaning.stripHashSuffix(col("Customer_Nr")).as("cid"),
      Cleaning.stripDashSuffix(col("Customer_Name")).as("cname"))
    assert(cleaned.filter(col("cid").contains("#")).count() == 0)
    assert(cleaned.filter(col("cname").contains(" -")).count() == 0)
    assert(cleaned.filter(col("cid").isNull || col("cname").isNull).count() == 0)

    // F6: every order/ship date in both real batches parses as dd-MM-yyyy
    assert(consumer.filter(
      Cleaning.parseSourceDate(col("Order_Date")).isNull ||
        Cleaning.parseSourceDate(col("Ship_Date")).isNull).count() == 0)
    assert(corporate.filter(
      Cleaning.parseSourceDate(col("Order_Date")).isNull ||
        Cleaning.parseSourceDate(col("Shipping")).isNull).count() == 0)

    // F10: every measure in both real batches casts cleanly
    for (df <- Seq(consumer, corporate)) {
      assert(df.filter(
        Cleaning.asMeasure(col("Sales")).isNull ||
          col("Quantity").cast("int").isNull ||
          Cleaning.asMeasure(col("Discount")).isNull ||
          Cleaning.asMeasure(col("Profit")).isNull ||
          Cleaning.asMeasure(col("Shipping_Cost")).isNull).count() == 0)
    }

    // M7 name handling: corporate names split into non-empty first/last
    assert(corporate.filter(
      Cleaning.namePart(col("Employee_Name"), 1) === "" ||
        Cleaning.namePart(col("Employee_Name"), 2) === "").count() == 0)
  }

  test("restaging the same batch trips the duplicate-load guard; SCD2 re-apply is a no-op") {
    val consumerOpt = staged("incremental_consumer.7z", consumerCols)
    assume(consumerOpt.isDefined, "reference incremental fixtures not present")
    val consumer = consumerOpt.get

    // S3: the same load id may not be staged twice
    val store = new TableStore(spark,
      Files.createTempDirectory("graft_fixture_wh").toString)
    Staging.stageAppend(store, "src_consumer", consumer, loadId = 1)
    val e = intercept[IllegalStateException](
      Staging.stageAppend(store, "src_consumer", consumer, loadId = 1))
    assert(e.getMessage.contains("already"))
    assert(Staging.nextLoadId(store, "src_consumer") == 2)

    // M1–M2: bootstrap dim_customer from the real batch, then re-apply
    // the SAME batch as a later load — no closes, no inserts, bit-equal.
    // The bootstrap round-trips through the store first (the production
    // shape: an SCD target is persisted state, never a live plan sharing
    // lineage with its own source).
    val src = consumer.select(
      Cleaning.stripHashSuffix(col("Customer_Nr")).as("customer_id"),
      Cleaning.stripDashSuffix(col("Customer_Name")).as("customer_name"),
      col("Segment").as("segment"))
    store.overwrite("dim_customer",
      Scd2.initial(src, Seq("customer_id"), Date.valueOf("2024-01-01")))
    val dim0 = store.read("dim_customer")
    val dim1 = Scd2.scd2Apply(
      dim0, src, Seq("customer_id"),
      changeCols = Seq("customer_name", "segment"),
      runDate = Date.valueOf("2024-02-01"))
    assert(dim1.count() == dim0.count())
    assert(dim1.filter(!col(Scd2.IsActive)).count() == 0)
    assert(dim1.exceptAll(dim0).count() == 0 && dim0.exceptAll(dim1).count() == 0)
  }

  test("two-source SCD2 over the real batches keeps the M3-M6 invariants") {
    val consumerOpt = staged("incremental_consumer.7z", consumerCols)
    assume(consumerOpt.isDefined, "reference incremental fixtures not present")
    val corporate = staged("incremental_corp_home.7z", corporateCols).get

    // both feeds conformed to the dim's attribute shape (M3-M6: the
    // second source watches its OWN columns but must carry every
    // attribute for its inserts)
    def conform(df: org.apache.spark.sql.DataFrame, idRaw: String) = df.select(
      Cleaning.stripHashSuffix(col(idRaw)).as("customer_id"),
      col("Email").as("email"),
      col("Segment").as("segment"))
    val consumerSrc = conform(consumerOpt.get, "Customer_Nr")
    val corpSrc = conform(corporate, "Customer_ID")

    val store = new TableStore(spark,
      Files.createTempDirectory("graft_fixture_wh2").toString)
    store.overwrite("dim",
      Scd2.initial(consumerSrc, Seq("customer_id"), Date.valueOf("2024-01-01")))
    val dim1 = Scd2.scd2Apply(
      store.read("dim"), corpSrc, Seq("customer_id"),
      changeCols = Seq("segment"), runDate = Date.valueOf("2024-02-01"))

    // at most one active version per key, no overlapping intervals
    assert(QualityChecks.scd2ActiveViolations(dim1, Seq("customer_id")).isEmpty)
    assert(QualityChecks.scd2OverlapViolations(dim1, Seq("customer_id")).isEmpty)
    // the real feeds carry DISJOINT customer populations (consumer
    // customers vs corporate accounts — the reference's segmentation),
    // so the second source must be pure insert: every corporate customer
    // arrives active as of the run date, and not one consumer version
    // closes
    val sharedKeys = corpSrc.select("customer_id")
      .intersect(consumerSrc.select("customer_id")).count()
    assert(sharedKeys == 0, "fixture premise: feeds are disjoint populations")
    val newKeys = corpSrc.select("customer_id").distinct().count()
    assert(dim1.filter(
      col(Scd2.StartDt) === Date.valueOf("2024-02-01") && col(Scd2.IsActive))
      .count() == newKeys)
    assert(dim1.filter(col(Scd2.EndDt) === Date.valueOf("2024-02-01")).count() == 0)
    // consumer history passes through bit-identical
    val dim0 = store.read("dim")
    assert(dim1.join(corpSrc.select("customer_id").distinct(),
        Seq("customer_id"), "left_anti")
      .exceptAll(dim0).count() == 0)
  }
}
