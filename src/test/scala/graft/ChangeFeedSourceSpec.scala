package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.ChangeFeedSource
import graft.streaming.Cdc

class ChangeFeedSourceSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def writeFeedFile(dir: String, name: String, rows: Seq[String])
      : Unit = {
    Files.createDirectories(java.nio.file.Paths.get(dir))
    Files.writeString(java.nio.file.Paths.get(s"$dir/$name"),
      rows.mkString("\n") + "\n")
  }

  private def csvLines(n: Int, fromScn: Long): Seq[String] =
    (0 until n).map { i =>
      val scn = fromScn + i / 4
      s"$scn,${i % 4},${if (i % 7 == 0) "DELETE" else "UPDATE"},t1,${i % 50},${i * 1.5}"
    }

  test("DSv2 source ingests windows exactly once across restarts") {
    val tmp = Files.createTempDirectory("graft_dsv2").toString
    val feed = s"$tmp/feed"; val log = s"$tmp/log"; val ckpt = s"$tmp/ckpt"
    writeFeedFile(feed, "w001.csv", csvLines(100, 1000))
    writeFeedFile(feed, "w002.csv", csvLines(80, 2000))

    def runOnce(): Long = {
      spark.readStream.format(classOf[ChangeFeedSource].getName)
        .option("path", feed).load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.write.mode("append").parquet(log)
        }.start().awaitTermination(120000)
      spark.read.parquet(log).count()
    }

    assert(runOnce() == 180)
    // restart with no new windows: nothing re-ingested
    assert(runOnce() == 180)
    // a NEW window is picked up incrementally
    writeFeedFile(feed, "w003.csv", csvLines(20, 3000))
    assert(runOnce() == 200)
  }

  test("DSv2 source plans one input partition per window file — the " +
    "parallel-ingest shape a log-mining backlog needs") {
    val tmp = Files.createTempDirectory("graft_dsv2c").toString
    val feed = s"$tmp/feed"
    (1 to 5).foreach(i =>
      writeFeedFile(feed, f"w$i%03d.csv", csvLines(10, 1000L * i)))
    @volatile var parts = -1
    @volatile var rows = -1L
    val finished = spark.readStream
      .format(classOf[ChangeFeedSource].getName)
      .option("path", feed).load()
      .writeStream.option("checkpointLocation", s"$tmp/ck")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        parts = b.rdd.getNumPartitions
        rows = b.count()
      }.start().awaitTermination(120000)
    assert(finished, "stream did not terminate within 120s")
    // a 5-file backlog lands as ONE batch of 5 concurrent partitions
    // (one reader per window file), not a serial file loop
    assert(parts == 5, s"partitions=$parts")
    assert(rows == 50, s"rows=$rows")
  }

  test("DSv2 rows carry the full change schema with correct types",
    SlowTests) {
    val tmp = Files.createTempDirectory("graft_dsv2b").toString
    val feed = s"$tmp/feed"
    writeFeedFile(feed, "w1.csv",
      Seq("5,0,INSERT,users,42,3.25", "5,1,DELETE,users,42,NULL"))
    val df = spark.readStream.format(classOf[ChangeFeedSource].getName)
      .option("path", feed).load()
    assert(df.schema == Cdc.changeSchema)
    val out = s"$tmp/out"
    df.writeStream.option("checkpointLocation", s"$tmp/ck")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").parquet(out)
      }.start().awaitTermination(120000)
    val rows = spark.read.parquet(out).orderBy("seq").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 5L && rows(0).getString(2) == "INSERT"
      && rows(0).getLong(4) == 42L && rows(0).getDouble(5) == 3.25)
    assert(rows(1).isNullAt(5))
    // the parsed feed applies through the same engine path
    val state = Cdc.applyChanges(spark.read.parquet(out))
    assert(state.isEmpty) // last op for the only key is DELETE
  }
}
