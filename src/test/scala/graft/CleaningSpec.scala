package graft

import org.apache.spark.sql.functions._

import graft.functions.Cleaning

/** F1–F3/F6 cleaning expressions (reference bl_cl.sql:101-110, 1069-1070,
  * 1246): suffix strips, name split, source-date parsing.
  */
class CleaningSpec extends SparkSpec {

  private def eval1(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  test("stripHashSuffix removes a # suffix and passes clean values through") {
    assert(eval1(Cleaning.stripHashSuffix(lit("Phone#123"))) == "Phone")
    assert(eval1(Cleaning.stripHashSuffix(lit("Phone"))) == "Phone")
    // idempotent
    assert(eval1(Cleaning.stripHashSuffix(Cleaning.stripHashSuffix(lit("a#b#c")))) == "a")
  }

  test("stripDashSuffix removes a ' -' suffix only") {
    assert(eval1(Cleaning.stripDashSuffix(lit("Jane Roe -dirt"))) == "Jane Roe")
    assert(eval1(Cleaning.stripDashSuffix(lit("Jane-Roe"))) == "Jane-Roe")
  }

  test("namePart splits first/last on the first space (SPLIT_PART semantics)") {
    assert(eval1(Cleaning.namePart(lit("Ada Lovelace"), 1)) == "Ada")
    assert(eval1(Cleaning.namePart(lit("Ada Lovelace"), 2)) == "Lovelace")
    // missing part -> empty string, like PostgreSQL SPLIT_PART
    assert(eval1(Cleaning.namePart(lit("Ada"), 2)) == "")
  }

  test("parseSourceDate reads dd-MM-yyyy") {
    assert(
      eval1(Cleaning.parseSourceDate(lit("31-12-2023"))) ==
        java.sql.Date.valueOf("2023-12-31"))
  }

  test("naKey defaults nulls to the NA member") {
    assert(eval1(Cleaning.naKey(lit(null).cast("string"))) == "NA")
    assert(eval1(Cleaning.naKey(lit("x"))) == "x")
  }
}
