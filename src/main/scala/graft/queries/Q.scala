package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark DataFrame builder over the harness
  * test tables plus (where SQL-expressible) an equivalent ANSI SQL oracle
  * the driver runs in DuckDB. Column names and types must match exactly —
  * the driver sorts columns by name and hashes values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)

  // --- Shared oracle SQL fragments (exact cross-engine arithmetic) --------

  /** Order-independent exact sum of a double expression (see
    * [[graft.functions.Cleaning.dsum]]): accumulate in DECIMAL, emit DOUBLE.
    */
  def DS(x: String): String =
    s"CAST(SUM(CAST(($x) AS DECIMAL(18,4))) AS DOUBLE)"

  /** As [[DS]] but rounded to 2 decimals in decimal space (engine-stable:
    * round(dec, 2) is half-away-from-zero in both Spark and ANSI engines;
    * a decimal downscale CAST is not — DuckDB truncates it).
    */
  def DS2(x: String): String =
    s"CAST(round(SUM(CAST(($x) AS DECIMAL(18,4))), 2) AS DOUBLE)"

  /** count(*) pinned to BIGINT (DuckDB would otherwise return HUGEINT). */
  val C: String = "CAST(count(*) AS BIGINT)"

  /** The md5 hash byte of an id expression, 0-255 — the SQL replay of
    * [[graft.operators.Sampling.md5Byte]] (and therefore of every
    * hashSplit threshold). ONE definition so the byte reconstruction
    * can't drift between the split oracles.
    */
  def md5Byte(expr: String): String = {
    val hex = "0123456789abcdef"
    s"(strpos('$hex', substr(md5(CAST(($expr) AS VARCHAR)), 1, 1)) - 1) * 16" +
      s" + (strpos('$hex', substr(md5(CAST(($expr) AS VARCHAR)), 2, 1)) - 1)"
  }

  /** hashSplit's train/val/test CASE over [[md5Byte]] (default 205/230
    * cuts — keep in sync with [[graft.operators.Sampling.hashSplit]]).
    */
  def splitCase(expr: String): String =
    s"""CASE WHEN ${md5Byte(expr)} < 205 THEN 'train'
       |     WHEN ${md5Byte(expr)} < 230 THEN 'val'
       |     ELSE 'test' END""".stripMargin
}
