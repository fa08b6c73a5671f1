package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession for all suites. */
object SparkSessionTestWrapper {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .getOrCreate()

  val sf: String = "/root/testdata/sf0.001"
}

trait SparkSessionTestWrapper {
  lazy val spark: SparkSession = SparkSessionTestWrapper.spark
  lazy val sf: String = SparkSessionTestWrapper.sf
}
