package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Ledger, Migrate}

class LedgerSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_ledger").toString + "/l"

  test("fresh ledger returns the full plan; progress shrinks it") {
    val path = tmp()
    val task = Ledger.newTaskName()
    val plan = Migrate.planChunks(0, 7999, 8000, 1000)
    assert(plan.size == 8)
    Ledger.init(spark, path, task, "orders", plan)
    assert(Ledger.pending(spark, path, task, "orders", plan).size == 8)
    Ledger.mark(spark, path, task, "orders", Seq(0, 1, 2, 3, 4),
      Ledger.Success, updateSeq = 1)
    val rest = Ledger.pending(spark, path, task, "orders", plan)
    assert(rest.map(_.id).sorted == Seq(5, 6, 7))
  }

  test("later marks win: FAILED then SUCCESS resumes as done") {
    val path = tmp()
    val task = Ledger.newTaskName()
    val plan = Migrate.planChunks(0, 999, 1000, 500)
    Ledger.init(spark, path, task, "t", plan)
    Ledger.mark(spark, path, task, "t", Seq(0), Ledger.Failed, 1)
    assert(Ledger.failedChunks(spark, path, task, "t") == Seq(0))
    Ledger.mark(spark, path, task, "t", Seq(0), Ledger.Success, 2)
    assert(Ledger.failedChunks(spark, path, task, "t").isEmpty)
    assert(Ledger.pending(spark, path, task, "t", plan).map(_.id) == Seq(1))
  }

  test("plan drift under a task refuses to resume (full.go:287-331)") {
    val path = tmp()
    val task = Ledger.newTaskName()
    val plan = Migrate.planChunks(0, 7999, 8000, 1000)
    Ledger.init(spark, path, task, "orders", plan)
    val replanned = Migrate.planChunks(0, 7999, 8000, 500) // 16 chunks
    intercept[IllegalArgumentException] {
      Ledger.pending(spark, path, task, "orders", replanned)
    }
  }

  test("equal-count replan with shifted boundaries refuses to resume") {
    val path = tmp()
    val task = Ledger.newTaskName()
    // 8 chunks over keys 0..7999
    val plan = Migrate.planChunks(0, 7999, 8000, 1000)
    Ledger.init(spark, path, task, "orders", plan)
    Ledger.mark(spark, path, task, "orders", Seq(0, 1), Ledger.Success, 1)
    // table grew: still 8 chunks, but over 0..15999 — same count,
    // different key spans; a count-only guard would silently skip the
    // new ranges behind SUCCESS ids
    val replanned = Migrate.planChunks(0, 15999, 16000, 2000)
    assert(replanned.size == plan.size)
    intercept[IllegalArgumentException] {
      Ledger.pending(spark, path, task, "orders", replanned)
    }
  }

  test("state reports plan bounds even after a mark wins the arg-max") {
    import org.apache.spark.sql.functions.col
    val path = tmp()
    val task = Ledger.newTaskName()
    val plan = Migrate.planChunks(0, 999, 1000, 500) // [0,499],[500,999]
    Ledger.init(spark, path, task, "t", plan)
    Ledger.mark(spark, path, task, "t", Seq(0), Ledger.Success, 1)
    // regression: marks carry (0,0) placeholder bounds; the marked
    // chunk's state must still show the PLAN's real key range
    val r = Ledger.state(spark, path, task, "t")
      .filter(col("chunk_id") === 0).collect()(0)
    assert(r.getAs[String]("status") == Ledger.Success)
    assert((r.getAs[Long]("lower"), r.getAs[Long]("upper")) == (0L, 499L))
  }

  test("ledgers are task- and table-scoped") {
    val path = tmp()
    val t1 = Ledger.newTaskName(); val t2 = Ledger.newTaskName()
    val plan = Migrate.planChunks(0, 999, 1000, 500)
    Ledger.init(spark, path, t1, "a", plan)
    Ledger.init(spark, path, t2, "a", plan)
    Ledger.mark(spark, path, t1, "a", Seq(0, 1), Ledger.Success, 1)
    assert(Ledger.pending(spark, path, t1, "a", plan).isEmpty)
    assert(Ledger.pending(spark, path, t2, "a", plan).size == 2)
  }
}
