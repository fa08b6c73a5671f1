package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** Every registered query must run (not necessarily return rows)
  * against EMPTY inputs with the real schemas — the production edge a
  * migration/curation engine hits constantly: an empty source table
  * in the task list, a shard with no documents, a day with no events.
  * This sweep caught five real crashes when introduced (NULL min/max
  * unboxed in chunk planners, a bloom filter with no backing bitmap,
  * schema inference over zero parquet files, a non-null encoder fed
  * NULL aggregates) — all fixed to degrade to empty results; this
  * spec keeps them fixed.
  */
class EmptySweepSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("all registered queries degrade to empty results on empty tables",
    SlowTests) {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    for (t <- Tables.all) {
      val schema = Tables.load(spark, sf, t).schema
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} " +
            String.valueOf(e.getMessage).replace('\n', ' ').take(100))
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on empty input:\n" +
        failures.mkString("\n"))
  }

  test("all registered queries survive single-row tables", SlowTests) {
    // minimum CARDINALITY, not absence: one-row inputs reach branches
    // the zero-row sweep never does — window frames with a real first
    // row but no second, min==max chunk guards, singleton clusters,
    // centroid sets of one — while every aggregate/join still has
    // data flowing through it
    val dir = java.nio.file.Files.createTempDirectory("graft_one").toString
    for (t <- Tables.all) {
      Tables.load(spark, sf, t).limit(1)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).count(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName} " +
            String.valueOf(e.getMessage).replace('\n', ' ').take(100))
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on single-row input:\n" +
        failures.mkString("\n"))
  }
}
