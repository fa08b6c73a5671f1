package graft.operators

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Migrate.ChunkSpec

/** Cross-run resume ledger — the reference's meta-DB checkpoint triage
  * (`wait_sync_meta`/`full_sync_meta` models `database/meta/
  * sync_meta_{wait,full}.go`, triage `module/migrate/sql/oracle/o2m/
  * full.go:114-331`): the chunk plan is persisted as rows, completed
  * chunks are marked, and a restarted task resumes exactly the
  * unfinished remainder — IF the recorded plan still matches
  * (`full.go:287-331` aborts resume when chunk counts differ).
  *
  * Storage is an append-only parquet log; current state is
  * last-writer-wins by `update_seq` — the same arg-max merge-on-read
  * shape as the CDC apply, so marking progress never rewrites the
  * ledger (object stores are append-friendly, and 10⁶ chunk rows is
  * still driver-trivial to plan over).
  */
object Ledger {

  val Waiting = "WAITING"
  val Success = "SUCCESS"
  val Failed = "FAILED"

  /** UUID task names (F9, `full.go:724`). */
  def newTaskName(): String = s"graft-${UUID.randomUUID()}"

  private def log(s: SparkSession, path: String): DataFrame =
    s.read.parquet(path)

  /** Current chunk state: arg-max over the append log. Equal
    * update_seq ties resolve by status PROGRESS RANK (WAITING <
    * FAILED < SUCCESS), never by the status string itself —
    * lexicographically "WAITING" beats "SUCCESS", which would
    * resurrect completed chunks on a seq collision.
    *
    * Bounds come from the PLAN row (update_seq 0) in the same single
    * aggregate — progress marks carry placeholder bounds, and an
    * earlier version let a winning mark surface its (0,0) as the
    * chunk's bounds, forcing callers to re-read init rows to learn
    * the real ranges.
    */
  def state(s: SparkSession, path: String, task: String,
      table: String): DataFrame = {
    val rank = when(col("status") === Success, 2)
      .when(col("status") === Failed, 1).otherwise(0)
    log(s, path)
      .filter(col("task") === task && col("table_name") === table)
      .groupBy(col("chunk_id"))
      .agg(
        max(struct(col("update_seq"), rank.as("rank"), col("status")))
          .as("last"),
        // max ignores the nulls of non-plan rows; one plan row per
        // chunk means this IS that row's bounds
        max(when(col("update_seq") === 0L,
          struct(col("lower"), col("upper")))).as("plan"))
      .select(col("chunk_id"), col("last.status").as("status"),
        col("plan.lower").as("lower"), col("plan.upper").as("upper"))
  }

  /** Record the plan: one WAITING row per chunk (update_seq 0). */
  def init(s: SparkSession, path: String, task: String, table: String,
      chunks: Seq[ChunkSpec]): Unit = {
    import s.implicits._
    chunks.map(c => (task, table, c.id, c.lower, c.upper, Waiting, 0L))
      .toDF("task", "table_name", "chunk_id", "lower", "upper", "status",
        "update_seq")
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** Mark chunk completion (or failure) — append-only. `updateSeq`
    * must be positive: 0 is reserved for the plan rows [[init]]
    * writes.
    */
  def mark(s: SparkSession, path: String, task: String, table: String,
      chunkIds: Seq[Int], status: String, updateSeq: Long): Unit = {
    require(updateSeq > 0, "updateSeq 0 is reserved for init plan rows")
    import s.implicits._
    chunkIds.map(id => (task, table, id, 0L, 0L, status, updateSeq))
      .toDF("task", "table_name", "chunk_id", "lower", "upper", "status",
        "update_seq")
      .write.mode(SaveMode.Append).parquet(path)
  }

  /** Checkpoint triage on restart (`full.go:287-331`): returns the
    * chunks still to run. A planned-vs-recorded mismatch — count OR
    * any chunk's key boundaries — means the plan changed under the
    * task; resuming would silently skip or double-run key ranges
    * (an equal-count replan with shifted ranges is the dangerous
    * case: SUCCESS ids would be skipped even though their new ranges
    * cover different keys), so it is an error, exactly as in the
    * reference.
    */
  def pending(s: SparkSession, path: String, task: String, table: String,
      planned: Seq[ChunkSpec]): Seq[ChunkSpec] = {
    val recorded = state(s, path, task, table).collect()
    if (recorded.isEmpty) return planned
    require(recorded.length == planned.size,
      s"resume refused: recorded ${recorded.length} chunks but plan has " +
        s"${planned.size} — wipe the ledger or re-plan (full.go:287-331)")
    // state carries the plan-row bounds per chunk, so the boundary
    // drift check reads straight off it — one scan of the ledger
    val plannedById = planned.map(c => c.id -> c).toMap
    recorded.foreach { r =>
      val id = r.getAs[Int]("chunk_id")
      val p = plannedById.get(id)
      // a mark without its plan row means the ledger was partially
      // wiped — refuse loudly, don't NPE unboxing the null bounds
      require(!r.isNullAt(r.fieldIndex("lower")),
        s"resume refused: chunk $id has progress marks but no plan row " +
          "— the ledger is incomplete; wipe it or re-init")
      require(p.exists(c => c.lower == r.getAs[Long]("lower") &&
        c.upper == r.getAs[Long]("upper")),
        s"resume refused: chunk $id boundaries drifted " +
          s"(recorded [${r.getAs[Long]("lower")},${r.getAs[Long]("upper")}]" +
          s" vs planned ${p.map(c => s"[${c.lower},${c.upper}]")})")
    }
    val done = recorded.filter(_.getAs[String]("status") == Success)
      .map(_.getAs[Int]("chunk_id")).toSet
    planned.filterNot(c => done.contains(c.id))
  }

  /** Failed chunks for operator attention (`chunk_error_detail`
    * analogue; failures are quarantined, not fatal — `full.go:497-524`).
    */
  def failedChunks(s: SparkSession, path: String, task: String,
      table: String): Seq[Int] =
    state(s, path, task, table).filter(col("status") === Failed)
      .select("chunk_id").collect().map(_.getInt(0)).toSeq
}
