package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev diagnostic: interleaved A/B of the chunk-checksum hash — the
  * md5-based cross-engine hash (conv(substr(md5,1,15),16,10)) vs
  * Spark's native codegen xxhash64 — over the same normalized row
  * string and the same groupBy, in ONE JVM so host drift hits both
  * arms equally.
  *
  *   sbt "runMain graft.HashProbe [reps] [sfDir]"
  */
object HashProbe {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 5
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Norm
    import graft.operators.Compare
    val cols = Compare.ordersNorm
    val chunk = floor(col("o_orderkey") / 1000).cast("long")
    def run(tag: String, h: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      Tables.load(spark, d, "orders")
        .groupBy(chunk.as("chunk_id"))
        .agg(count(lit(1)), sum(h.cast(DecimalType(38, 0))))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val row = Norm.sparkRow(cols)
    // warm both shapes once (codegen)
    run("warm-md5", Norm.xhash64(row)); run("warm-xx", xxhash64(row))
    (1 to reps).foreach { i =>
      val a = run("md5", Norm.xhash64(row))
      val b = run("xx", xxhash64(row))
      println(f"[hashprobe] rep=$i md5=$a%.3f s xxhash64=$b%.3f s")
    }
    spark.stop()
  }
}
