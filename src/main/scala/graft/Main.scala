package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{TaskModes, TransferdbConfig}

/** The engine's user-facing CLI — the reference binary's contract
  * (`transferdb -config config.toml -mode <mode> -source <db> -target
  * <db>`; flag grid `config.go:196-205`, dispatch
  * `server/server.go:28-82`) on Spark:
  *
  * {{{
  *   spark-submit --class graft.Main graft.jar \
  *     --config ./config.toml --mode compare \
  *     --data /path/to/tables --out ./task_out \
  *     [--source oracle] [--target mysql]
  * }}}
  *
  * `--config` is optional (the reference's example config is the
  * default, [[TaskModes.ExampleConfig]]); `--data` points at the
  * parquet table dir (the sandbox's stand-in for the source
  * connection). The mode's report prints as a show() and persists to
  * `<out>/report_<mode>.parquet`; artifact files (reverse/check/fix
  * SQL, CSV exports, the migrated target) land under `--out` or the
  * config's `*-dir` knobs.
  */
object Main {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.stripPrefix("--") -> v
    }.toMap

  def main(args: Array[String]): Unit = {
    val a = parseArgs(args)
    val mode = a.getOrElse("mode",
      throw new IllegalArgumentException(
        "flag [mode] can not null or value configure error"))
    // a user-supplied config owns its artifact paths verbatim; the
    // built-in default is the PORTABLE example (artifact dirs
    // stripped, so artifacts land under --out instead of the example
    // author's filesystem)
    val configText = a.get("config")
      .map(p => java.nio.file.Files.readString(java.nio.file.Paths.get(p)))
      .getOrElse(TaskModes.ExampleConfigPortable)
    val knobs = TransferdbConfig.knobs(configText)
    val data = a.getOrElse("data", "/root/testdata/sf0.001")
    val out = a.getOrElse("out", "task_out")
    val spark = SparkSession.builder()
      .appName(s"graft-$mode")
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    try {
      val report = TaskModes.runMode(spark, mode, knobs, data, out,
        sourceDb = a.getOrElse("source", "oracle"),
        targetDb = a.getOrElse("target", "mysql"))
      report.write.mode("overwrite").parquet(s"$out/report_$mode.parquet")
      report.show(50, truncate = false)
    } finally spark.stop()
  }
}
