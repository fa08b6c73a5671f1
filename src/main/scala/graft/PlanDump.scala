package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dev diagnostic: dump `.explain("formatted")` for registered
  * queries to files — the optimization-round evidence artifact
  * (plans/r16/<query>_<tag>.txt). Like [[PlanAudit]], building a
  * query's DataFrame may run the operator's bounded driver-side jobs
  * (chunk planning, PQ training, streaming runs whose registered
  * query is the read-back of the stream's output); the dumped plan is
  * the registered DataFrame's — the thing Bench times with
  * `.count()`.
  *
  *   sbt "runMain graft.PlanDump <outDir> <tag> [sfDir] [q1,q2,...]"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val names: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet)
      else None
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val picked = names match {
      case Some(ns) => SparkEntry.queries.filter { case (n, _) => ns(n) }
      case None => SparkEntry.queries
    }
    var failed = 0
    picked.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val body =
        try fn(spark, sfDir).queryExecution.explainString(FormattedMode)
        catch {
          case e: Throwable =>
            failed += 1
            s"PLAN FAILED: ${String.valueOf(e.getMessage).take(500)}"
        }
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"),
        body.getBytes("UTF-8"))
      println(s"[plandump] $name -> $outDir/${name}_$tag.txt")
    }
    spark.stop()
    if (failed > 0) { println(s"[plandump] $failed FAILED"); sys.exit(1) }
  }
}
