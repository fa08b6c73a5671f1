package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: run ONE registered query N times in one JVM and
  * print per-run wall seconds plus the GC-time delta — separates
  * "slow because collecting" from "slow because the host stole the
  * CPU" (the round-3 bench stalls re-measured 10-200x faster on
  * re-run; this is the adjudication tool).
  *
  * Note memoized inputs (d3 pairs, IVF cell assignment) persist
  * across runs in one JVM, so run 1 is the cold cost and runs 2+
  * measure the consumer alone — both numbers matter.
  *
  *   sbt "runMain graft.QueryProbe <name> [runs] [sfDir]"
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = if (args.length > 1) args(1).toInt else 5
    val d = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    // A/B experiment aid: SPARK_GRAFT_EXTRA_CONF="k=v;k=v" lets a
    // probe run flip one optimizer/conf knob without a code edit
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      })
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    import scala.jdk.CollectionConverters._
    def gcMs(): Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala
      .map(b => math.max(b.getCollectionTime, 0L)).sum
    (1 to runs).foreach { i =>
      val g0 = gcMs()
      val t0 = System.nanoTime()
      val n = fn(spark, d).count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $name run=$i rows=$n%d t=$t%.2f s gc=${(gcMs() - g0) / 1e3}%.2f s")
    }
    spark.stop()
  }
}
