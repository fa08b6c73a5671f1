package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Compare

class CompareSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("symmetric diff finds exactly the injected drift") {
    val diff = Compare.j4SymmetricDiff(spark, sf).cache()
    val orders = Tables.load(spark, sf, "orders")
    val deleted = orders.filter(col("o_orderkey") % 97 === 0).count()
    val updated = orders.filter(col("o_orderkey") % 101 === 0 &&
      col("o_orderkey") % 97 =!= 0).count()
    val inserted = orders.filter(col("o_orderkey") % 89 === 0).count()
    // deletes+updates are SRC_ONLY; updates also appear TGT_ONLY (new value)
    val srcOnly = diff.filter(col("diff_side") === "SRC_ONLY").count()
    val tgtOnly = diff.filter(col("diff_side") === "TGT_ONLY").count()
    assert(srcOnly == deleted + updated, s"srcOnly=$srcOnly")
    assert(tgtOnly == updated + inserted, s"tgtOnly=$tgtOnly")
    diff.unpersist()
  }

  test("identical inputs produce an empty diff and no mismatched chunks") {
    val o = Tables.load(spark, sf, "orders")
    assert(Compare.symmetricDiff(o, o, Compare.ordersNorm, "o_orderkey").isEmpty)
  }

  test("chunk compare flags only chunks containing drift") {
    val flagged = Compare.a2bChunkCompare(spark, sf)
      .select("chunk_id").as[Long](spark.implicits.newLongEncoder).collect().toSet
    val expected = Tables.load(spark, sf, "orders")
      .filter(col("o_orderkey") % 97 === 0 || col("o_orderkey") % 101 === 0)
      .select(floor(col("o_orderkey") / 1000).cast("long"))
      .as[Long](spark.implicits.newLongEncoder).collect().toSet ++
      Tables.load(spark, sf, "orders")
        .filter(col("o_orderkey") % 89 === 0)
        .select(floor((col("o_orderkey") + 1000000L) / 1000).cast("long"))
        .as[Long](spark.implicits.newLongEncoder).collect().toSet
    assert(flagged == expected)
  }

  test("fix actions: every SRC_ONLY row becomes an INSERT, TGT_ONLY a DELETE") {
    val fix = Compare.c2FixActions(spark, sf)
    assert(fix.filter(col("action") === "INSERT" &&
      !col("fix_sql").startsWith("REPLACE INTO")).count() == 0)
    assert(fix.filter(col("action") === "DELETE" &&
      !col("fix_sql").startsWith("DELETE FROM")).count() == 0)
  }

  test("fix SQL survives hostile values: escaped quotes, executable shape") {
    val fix = Compare.c2FixActions(spark, sf)
      .filter(col("action") === "INSERT").cache()
    val sqls = fix.select("fix_sql").collect().map(_.getString(0))
    assert(sqls.nonEmpty)
    // statement shape: single REPLACE, closes its VALUES list
    assert(sqls.forall(s => s.startsWith("REPLACE INTO orders VALUES (")
      && s.endsWith(");")))
    // an unescaped interior quote would leave an odd count of
    // unescaped quotes; verify every statement parses as balanced
    def balanced(s: String): Boolean = {
      var i = 0; var open = false
      while (i < s.length) {
        s.charAt(i) match {
          case '\\' if open => i += 1 // skip escaped char inside literal
          case '\'' => open = !open
          case _ =>
        }
        i += 1
      }
      !open
    }
    assert(sqls.forall(balanced), sqls.find(s => !balanced(s)).getOrElse(""))
    // hostile payloads (keys ≡1 mod 6 carry a quote) actually occur
    assert(sqls.exists(_.contains("it\\'s ")))
    // the literal 4-char string "NULL" stays a QUOTED value; true
    // NULLs render bare — the sentinel form couldn't tell them apart
    assert(sqls.exists(_.endsWith(",'NULL');")), "quoted 'NULL' missing")
    assert(sqls.exists(_.endsWith(",NULL);")), "bare NULL missing")
    fix.unpersist()
  }

  test("c3 narrowing is lossless and actually narrows") {
    val narrowed = Compare.c3NarrowedDiff(spark, sf)
    // losslessness: the narrowed diff equals the full unnarrowed diff
    val full = Compare.j4SymmetricDiff(spark, sf)
      .withColumn("chunk_id", floor(col("row_key") / 1000).cast("long"))
      .select("chunk_id", "diff_side", "row_key", "row_str")
    assert(narrowed.exceptAll(full).isEmpty && full.exceptAll(narrowed).isEmpty)
    // narrowing: a single-row drift flags EXACTLY its own chunk, so
    // phase 2 rescans 1 chunk, not the table (the standard fixture's
    // 97-periodic drift touches every /1000 chunk — build a sparse one)
    val o = Tables.load(spark, sf, "orders")
    val oneRowDrift = o.withColumn("o_totalprice",
      when(col("o_orderkey") === 500, col("o_totalprice") + lit(1.0))
        .otherwise(col("o_totalprice")))
    val bucket = floor(col("o_orderkey") / 100).cast("long")
    val srcSum = Compare.chunkSummary(o, bucket, Compare.ordersNorm)
    val tgtSum = Compare.chunkSummary(oneRowDrift, bucket, Compare.ordersNorm)
      .withColumnRenamed("row_checksum", "tgt_checksum")
      .withColumnRenamed("n_rows", "tgt_rows")
    val bad = srcSum.join(tgtSum, Seq("chunk_id"))
      .filter(col("row_checksum") =!= col("tgt_checksum") ||
        col("n_rows") =!= col("tgt_rows"))
      .select("chunk_id").collect().map(_.getLong(0)).toSeq
    assert(bad == Seq(5L), s"expected only chunk 5 flagged, got $bad")
  }

  test("c3 chunk-list cap: past the cap the semi-join fallback produces " +
    "identical rows and no driver-sized InSet") {
    // cap=1 forces the overflow path on the standard fixture (whose
    // drift flags hundreds of chunks); the fallback must be
    // row-identical to the driver-list path (multiset compare)
    val capped = Compare.c3NarrowedDiffImpl(spark, sf, 1)
    val normal = Compare.c3NarrowedDiff(spark, sf)
    assert(capped.exceptAll(normal).isEmpty &&
      normal.exceptAll(capped).isEmpty)
    // plan shape: the fallback narrows via a JOIN on chunk_id, not an
    // isin/InSet literal list (the unbounded-driver-collect hazard)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), "fallback must plan a semi join")
    val normalPlan = normal.queryExecution.executedPlan.toString
    assert(!normalPlan.contains("LeftSemi"),
      "default path must keep the pushdown-envelope form")
  }

  test("md5 boundary: output-exposed checksum columns derive from md5, " +
    "never from the engine-internal xxhash64 summary") {
    // r16 moved the engine-INTERNAL compare checksum to native
    // xxhash64; every checksum the ORACLE compares by value must stay
    // on the md5-based cross-engine hash (DuckDB has no xxhash64).
    // Representative output-exposed set (the full surface is enforced
    // by the oracle hash gate itself — an xxhash64 value there can
    // never match DuckDB): chunk-checksum reports, the parquet/JDBC
    // roundtrips, and pipe2's compare report.
    import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, ExprId, Md5, XxHash64}
    val names = Seq("a2_chunk_checksum", "a2c_summary_onepass",
      "s7_parquet_roundtrip", "s7b_jdbc_roundtrip", "pipe2_migration")
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sf)
      val plan = df.queryExecution.analyzed
      val checksumAttrs = plan.output.filter(
        _.name.toLowerCase.contains("checksum"))
      assert(checksumAttrs.nonEmpty,
        s"$n no longer exposes a checksum column — update this spec")
      // resolve each output checksum attr to the full TRANSITIVE
      // expression lineage that computes it: start from its alias,
      // then follow every attribute reference inside that subtree to
      // ITS producing alias (pass-through renames, struct extraction
      // over an aggregate buffer — a2c's shape), accumulating every
      // reached subtree
      val allAliases: Map[ExprId, Alias] = plan.collect {
        case p => p.expressions.flatMap(_.collect {
          case a: Alias => a.exprId -> a })
      }.flatten.toMap
      def lineage(id: ExprId, seen: Set[ExprId]): Seq[Alias] =
        if (seen(id)) Seq.empty
        else allAliases.get(id) match {
          case None => Seq.empty // a base relation column
          case Some(a) =>
            val refs = a.collect { case r: AttributeReference => r.exprId }
            a +: refs.distinct.flatMap(lineage(_, seen + id))
        }
      for (attr <- checksumAttrs) {
        val trees = lineage(attr.exprId, Set.empty)
        assert(trees.nonEmpty, s"$n: no producing alias for ${attr.name}")
        assert(trees.forall(
          _.collectFirst { case _: XxHash64 => () }.isEmpty),
          s"$n: output column ${attr.name} is xxhash64-derived — " +
            "must use chunkSummaryXEngine/sparkRowChecksum (md5)")
        assert(trees.exists(
          _.collectFirst { case _: Md5 => () }.nonEmpty),
          s"$n: output column ${attr.name} is not md5-derived")
      }
    }
  }

  test("fix.sql artifact: boxed summary per mismatched chunk, every " +
    "fix statement present, matched chunks absent") {
    val path = java.nio.file.Files.createTempDirectory("graft_fixsql")
      .toString + "/fix.sql"
    Compare.writeC2FixArtifact(spark, sf, path)
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    // every fix statement the hash-gated c2 query emits is in the file
    val fixes = Compare.c2FixActions(spark, sf)
      .select("fix_sql").collect().map(_.getString(0))
    assert(fixes.nonEmpty)
    fixes.foreach(f => assert(txt.contains(f), f.take(60)))
    // one boxed header per mismatched chunk; chunk ids strictly
    // ascending (deterministic artifact)
    val ids = """ chunk (\d+) differs""".r
      .findAllMatchIn(txt).map(_.group(1).toLong).toSeq
    assert(ids.nonEmpty && ids == ids.sorted && ids.distinct == ids)
    // line-anchored: the hostile payload itself contains '/*' tokens
    assert("(?m)^/\\*$".r.findAllIn(txt).size == ids.size)
    // drift leaves keys %97==0 deleted and %89==0 duplicated-shifted:
    // chunk 0 is affected, but a chunk with no drifted keys must NOT
    // appear — cross-check against the summary-side mismatch count
    val fixChunks = Compare.c2FixActions(spark, sf)
      .select(floor(col("row_key") / 1000).cast("long").as("c"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(ids.toSet == fixChunks)
    // both sides' count SQL rendered per box
    assert(txt.contains("SELECT COUNT(1) FROM orders WHERE") &&
      txt.contains("SELECT COUNT(1) FROM steven.orders WHERE"))
  }

  test("c7 sampled pre-compare: zero false positives (sampled-dirty " +
    "⊆ full-dirty) and nonzero coverage") {
    val sampledDirty = graft.operators.Compare
      .c7SampledCompare(spark, sf).select("chunk_id")
      .collect().map(_.getLong(0)).toSet
    val fullDirty = graft.operators.Compare
      .a2bChunkCompare(spark, sf).select("chunk_id")
      .collect().map(_.getLong(0)).toSet
    // a sampled-key difference is a REAL difference: every chunk the
    // sample flags must be flagged by the full compare too
    assert(sampledDirty.subsetOf(fullDirty),
      s"false positives: ${(sampledDirty -- fullDirty).toSeq.sorted}")
    // and at a 1/4 rate over this drift the sample actually catches
    // something — a pre-check that never fires is untested code
    assert(sampledDirty.nonEmpty)
  }

  test("normalization maps '' and NULL to the same canonical value") {
    val n = Compare.p2CompareNorm(spark, sf)
    val nulls = n.filter(col("o_orderkey") % 5 === 0).select("norm_str").distinct()
    val empties = n.filter(col("o_orderkey") % 5 === 1).select("norm_str").distinct()
    assert(nulls.collect().map(_.getString(0)).toSeq == Seq("NULL"))
    assert(empties.collect().map(_.getString(0)).toSeq == Seq("NULL"))
    // leading-dot decimals are zero-padded
    val halves = n.filter(col("o_orderkey") % 3 === 0).select("norm_num").distinct()
    assert(halves.collect().map(_.getString(0)).toSeq == Seq("0.50"))
  }
}
