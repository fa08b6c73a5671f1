package graft

import org.apache.spark.sql.SparkSession

import graft.functions.Dedup

/** Dev diagnostic: time the d3 candidate-pair pipeline and the d6
  * connected-components loop separately (d6 reuses d3's persisted
  * pairs, so its time is the iteration loop alone). Set
  * GRAFT_CC_DEBUG=1 to print per-round label sums / convergence.
  *
  *   sbt "runMain graft.CcProbe [sfDir]"
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    var t0 = System.nanoTime()
    val pairs = Dedup.d3MinhashLsh(spark, d)
    val np = pairs.count()
    println(f"d3 pairs=$np%d  t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val cc = Dedup.d6DupClusters(spark, d)
    val nc = cc.count()
    println(f"d6 rows=$nc%d  t=${(System.nanoTime() - t0) / 1e9}%.2f s (pairs cached)")
    spark.stop()
  }
}
