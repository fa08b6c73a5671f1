package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading for the driver-generated testdata layout
  * (`TESTDATA.md`): one parquet file per table under an sf dir.
  *
  * At cluster scale the same entry point takes a directory of many
  * parquet files per table; `spark.read.parquet` splits by row-group,
  * so nothing here assumes a single file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
