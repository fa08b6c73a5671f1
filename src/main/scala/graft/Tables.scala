package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS), which Spark 4 refuses to read as
      // a timestamp; read nanos as long and truncate to µs (floor —
      // matching DuckDB's second-level truncation downstream). The
      // legacy flag is scoped set/restore: leaking it session-wide
      // would silently change how any later ns-timestamp parquet in
      // the same session is read (raw long instead of timestamp).
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try
        spark.read.parquet(s"$dir/$name.parquet")
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    } else spark.read.parquet(s"$dir/$name.parquet")
}
