package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Catalog, Check}

class CheckSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("snapshot covers every table with 1-based dense ordinals") {
    val snap = Catalog.snapshot(spark, sf).cache()
    assert(snap.select("table_name").distinct().count() == Tables.all.size)
    val bad = snap.groupBy("table_name")
      .agg(count(lit(1)).as("n"), min("ordinal").as("mn"), max("ordinal").as("mx"))
      .filter(col("mn") =!= 1 || col("mx") =!= col("n"))
    assert(bad.isEmpty)
    snap.unpersist()
  }

  test("structDiff of a snapshot against itself is empty") {
    val snap = Catalog.snapshot(spark, sf)
    assert(Check.structDiff(snap, snap).isEmpty)
  }

  test("structDiff classifies each drift kind with executable fix SQL") {
    val diff = Check.k1StructDiff(spark, sf).cache()
    val kinds = diff.select("change").distinct().collect()
      .map(_.getString(0)).toSet
    assert(kinds == Set("ADD", "DROP", "MODIFY_TYPE", "MODIFY_NULL"),
      kinds.toString)
    // every target-added audit column surfaces as a DROP
    assert(diff.filter(col("column_name") === "audit_ts").count() ==
      Tables.all.size)
    // fix SQL is always present and ALTER-shaped
    assert(diff.filter(!col("fix_sql").startsWith("ALTER TABLE steven."))
      .isEmpty)
    // MODIFY_NULL restores the source's nullability wording
    val mn = diff.filter(col("change") === "MODIFY_NULL")
      .select("fix_sql").collect().map(_.getString(0))
    assert(mn.nonEmpty && mn.forall(_.endsWith(" NULL;")))
    diff.unpersist()
  }

  test("assess report artifact renders every section with data rows") {
    val report = Check.renderAssessReport(spark, sf)
    Check.reportSections.foreach(sec =>
      assert(report.contains(s"== ${sec.title} =="), sec.title))
    assert(report.contains("lineitem"))
    val path = java.nio.file.Files.createTempDirectory("graft_rep")
      .toString + "/assess_report.txt"
    graft.reverse.Ddl.writeArtifact(path, Seq(report))
    assert(java.nio.file.Files.size(java.nio.file.Paths.get(path)) > 500)
  }

  test("html assess report renders every section as a table") {
    val html = Check.renderAssessReportHtml(spark, sf)
    assert(html.startsWith("<!DOCTYPE html>"))
    Check.reportSections.foreach(sec =>
      assert(html.contains(s"<h2>${sec.title
        .replace("<", "&lt;").replace(">", "&gt;")}"), sec.title))
    assert("<section>".r.findAllIn(html).size == Check.reportSections.size)
    assert(html.contains("<td>lineitem</td>"))
    // the >= in the wide-tables title must arrive escaped
    assert(html.contains("&gt;= 5 COLUMNS"))
  }

  test("a36: assembled report writes bounded artifacts and one " +
    "checksum row per section") {
    val outDir = java.nio.file.Files.createTempDirectory("graft_a36")
      .toString
    val df = Check.a36AssessReportTo(spark, sf, outDir).cache()
    val rows = df.collect()
    assert(rows.length == Check.reportSections.size)
    assert(rows.map(_.getAs[String]("section")).toSet ==
      Check.reportSections.map(_.key).toSet)
    // every section carried content and a computed checksum
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") > 0, r.toString)
      assert(r.getAs[String]("checksum") != null, r.toString)
    }
    // both artifacts exist and are bounded driver-side files: big
    // enough to carry every section, small enough that the report
    // stayed a report (no data spill into the artifact)
    for (f <- Seq("assess_report.txt", "assess_report.html")) {
      val sz = java.nio.file.Files.size(
        java.nio.file.Paths.get(s"$outDir/$f"))
      assert(sz > 2000 && sz < 1024 * 1024, s"$f size=$sz")
    }
    // the text artifact renders exactly the section list, in order
    val txt = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$outDir/assess_report.txt"))
    val idxs = Check.reportSections.map(sec =>
      txt.indexOf(s"== ${sec.title} =="))
    assert(idxs.forall(_ >= 0) && idxs == idxs.sorted, idxs.toString)
    df.unpersist()
    ()
  }

  test("k5: jdbc-introspected snapshot feeds the same check surface") {
    val diff = Check.k5JdbcCatalog(spark, sf).cache()
    // one audit_ts DROP per introspected table
    assert(diff.filter(col("column_name") === "audit_ts").count() == 3)
    val kinds = diff.select("change").distinct().collect()
      .map(_.getString(0)).toSet
    assert(kinds.subsetOf(Set("ADD", "DROP", "MODIFY_TYPE", "MODIFY_NULL")),
      kinds.toString)
    assert(diff.filter(!col("fix_sql").startsWith("ALTER TABLE steven."))
      .isEmpty)
    diff.unpersist()
  }

  test("k6: unsupported mysql types divert to manual, never a runnable fix") {
    val k6 = Check.k6M2oStructDiff(spark, sf).cache()
    assert(k6.count() == graft.reverse.Reverse.mysqlZoo.size)
    val manual = k6.filter(col("verdict") === "MANUAL").cache()
    assert(manual.count() == 2) // SET + ENUM
    assert(manual.filter(!col("fix_sql").startsWith("-- manual")).isEmpty)
    val mism = k6.filter(col("verdict") === "TYPE_MISMATCH")
    assert(mism.filter(!col("fix_sql").startsWith("ALTER TABLE steven."))
      .isEmpty)
    // Oracle dialect: MODIFY wraps the column clause in parens
    assert(mism.filter(!col("fix_sql").contains(" MODIFY (")).isEmpty)
    manual.unpersist(); k6.unpersist()
  }

  test("diff is symmetric: swapping sides flips ADD and DROP") {
    val snap = Catalog.snapshot(spark, sf)
    val drifted = Check.driftedSnapshot(snap)
    val fwd = Check.structDiff(snap, drifted)
    val rev = Check.structDiff(drifted, snap)
    val fwdAdd = fwd.filter(col("change") === "ADD").count()
    val revDrop = rev.filter(col("change") === "DROP").count()
    assert(fwdAdd == revDrop)
  }

  test("k11 CHECK fixes are version-gated both ways (diff.go:374-383)") {
    // above the 8.0.15 gate: missing CKs get runnable ADD CONSTRAINT
    val modern = Check.k11ConstraintDiffFor(spark, "8.0.20")
      .filter(col("kind") === "CK" && col("verdict") =!= "OK").collect()
    assert(modern.nonEmpty)
    modern.foreach { r =>
      assert(r.getAs[String]("verdict") == "MISSING")
      assert(r.getAs[String]("fix_sql").contains("ADD CONSTRAINT"))
    }
    // below the gate: the same rows divert to VERSION_SKIPPED, no fix
    val legacy = Check.k11ConstraintDiffFor(spark, "5.7.30")
      .filter(col("kind") === "CK" && col("verdict") =!= "OK").collect()
    assert(legacy.nonEmpty)
    legacy.foreach { r =>
      assert(r.getAs[String]("verdict") == "VERSION_SKIPPED")
      assert(r.isNullAt(r.fieldIndex("fix_sql")))
    }
    // non-CK fixes are never gated
    val fk = Check.k11ConstraintDiffFor(spark, "5.7.30")
      .filter(col("kind") === "FK").head
    assert(fk.getAs[String]("fix_sql").contains("ADD FOREIGN KEY"))
  }
}
