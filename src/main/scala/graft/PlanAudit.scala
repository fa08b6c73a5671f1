package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic main: flags BroadcastNestedLoopJoin / CartesianProduct
  * in every registered query's physical plan. The only acceptable
  * BNLs are bounded-broadcast-side by design: ann1/ann3/ann4/ann6/
  * ann7 (ann7's stage-1 coarse scan; its exact re-rank is an
  * equi-join)
  * (broadcast query set — the exact recall baseline; ann6 adds the
  * broadcast centroid ranking and single-row recall crossJoins;
  * ann9 inherits ann1's broadcast-query scan through the memoized
  * truth relation — its own lexical/fusion joins are all equi), the
  * IVF centroid assignment inside ann2/d5/d11 (O(N·C) with C
  * centroids broadcast), ann8's single-row recall crossJoins (its
  * training/encode/ADC paths are all equi-joins on a broadcast
  * codebook/distance table), a19's crossJoin of two single-row
  * summary aggregates, a39's crossJoin of the single-row stream
  * total onto the 10-row heavy-hitter relation, pipe5's (and
  * pipe9's) crossJoin of the
  * single-row corpus/weight totals onto the per-language bucket
  * summaries (resp. O(sources) rows), and pipe8's crossJoin of the
  * single-row leakage audit onto the 3-row split summary.
  * Anything else appearing here is a scale regression.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, d).queryExecution.executedPlan.toString
        val flags = Seq(
          "BNL" -> plan.contains("BroadcastNestedLoopJoin"),
          "CARTESIAN" -> plan.contains("CartesianProduct"))
          .filter(_._2).map(_._1)
        println(f"$name%-28s ${if (flags.isEmpty) "ok" else flags.mkString(",")}")
      } catch {
        case e: Throwable =>
          // String.valueOf: getMessage is null for bare NPEs etc.
          println(f"$name%-28s ERR ${String.valueOf(e.getMessage).take(60)}")
      }
    }
    spark.stop()
  }
}
