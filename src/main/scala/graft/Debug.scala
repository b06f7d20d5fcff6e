package graft

import org.apache.spark.sql.SparkSession

object Debug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        df.show(5, false)
        println(s"$name OK rows=${df.count()}")
      } catch {
        case e: Throwable =>
          println(s"$name FAILED: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
