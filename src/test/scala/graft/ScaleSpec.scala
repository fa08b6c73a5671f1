package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Catalog
import graft.streaming.Cdc
import graft.streaming.Cdc.LogFile

/** Scale-pattern demonstrations: the mechanisms a 1000-executor run
  * leans on, proven at test scale — co-located bucketed joins (no
  * shuffle), footer-only stats, log-window selection.
  */
class ScaleSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("bucketed co-located join runs with NO shuffle exchange") {
    val o = Tables.load(spark, sf, "orders")
    val l = Tables.load(spark, sf, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // pre-bucketing both fact tables on the join key is the
    // co-located-join setup for repeated large joins (SURVEY §2.3)
    o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    l.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    // disable auto-broadcast so the test exercises the big-big join
    // path (at 100 TB neither side broadcasts)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") &&
        !plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() == l.count())
    } finally spark.conf.set(key, prev)
  }

  test("filters and projections reach the parquet scan " +
    "(pushdown + pruning, the 100 TB scan contract)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    // sparkPlan, not executedPlan: the pre-AQE physical plan exposes
    // the scan nodes directly, and scan metadata holds the FULL
    // PushedFilters list (the plan STRING truncates it)
    def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] =
      df.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
    // p3: BOTH predicates land in PushedFilters — the scan skips row
    // groups by footer stats instead of materializing rows to filter
    val p3Scan = scans(graft.operators.Relational.p3ChunkFilter(spark, sf))
    assert(p3Scan.nonEmpty)
    val p3Pushed = p3Scan.head.metadata("PushedFilters")
    assert(p3Pushed.contains("GreaterThanOrEqual(l_orderkey,2000)") &&
      p3Pushed.contains("LessThanOrEqual(l_orderkey,4000)") &&
      p3Pushed.contains("GreaterThan(l_quantity,"), p3Pushed)
    // ...and the 16-column lineitem scan reads ONLY the 3 live columns
    assert(p3Scan.head.requiredSchema.fieldNames.toSet ==
      Set("l_orderkey", "l_linenumber", "l_quantity"),
      p3Scan.head.requiredSchema.treeString)
    // t3: the documents scan prunes to (doc_id, text) — lang/source/
    // n_chars never leave the footer. At 100 TB the text column IS the
    // table; reading even one dead sibling column is a material cost.
    val t3Scan = scans(graft.functions.TextAnalysis.t3TokenCount(spark, sf))
    assert(t3Scan.head.requiredSchema.fieldNames.toSet ==
      Set("doc_id", "text"), t3Scan.head.requiredSchema.treeString)
    // q1: the aggregate pushes its date predicate and prunes to the
    // aggregation inputs — no key or dead column reaches the scan
    val q1Scan = scans(graft.operators.Relational.q1PricingSummary(spark, sf))
    val q1Pushed = q1Scan.head.metadata("PushedFilters")
    assert(q1Pushed.contains("LessThanOrEqual(l_shipdate"), q1Pushed)
    val q1Cols = q1Scan.head.requiredSchema.fieldNames.toSet
    assert(!q1Cols.contains("l_orderkey") && !q1Cols.contains("l_partkey"),
      q1Cols.toString)
  }

  test("footer stats equal true counts with zero data scan") {
    val stats = Catalog.tableStats(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Tables.all.foreach { t =>
      assert(stats(t) == Tables.load(spark, sf, t).count(), t)
    }
    assert(stats.values.forall(_ > 0))
  }

  test("multi-file table dirs produce identical results to single files") {
    // at scale every table is a directory of many parquet parts;
    // nothing may assume the single-file testdata layout
    val multi = java.nio.file.Files.createTempDirectory("graft_multi")
      .toString + "/lineitem.parquet"
    Tables.load(spark, sf, "lineitem").repartition(7).write.parquet(multi)
    val single = graft.operators.Relational.a2ChunkChecksum(spark, sf)
    val viaMulti = Tables.load(spark,
      multi.stripSuffix("/lineitem.parquet"), "lineitem")
    assert(viaMulti.rdd.getNumPartitions >= 1 && viaMulti.count() ==
      Tables.load(spark, sf, "lineitem").count())
    val multiSum = viaMulti
      .groupBy(floor(col("l_orderkey") / 1000).cast("long").as("chunk_id"))
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.Norm.sparkRowChecksum(
          graft.operators.Relational.lineitemNorm).as("row_checksum"))
    assert(multiSum.exceptAll(single).isEmpty &&
      single.exceptAll(multiSum).isEmpty)
  }

  test("schema evolution: mergeSchema unions columns across file generations") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evo")
      .toString + "/t"
    Seq((1L, "a")).toDF("id", "v1").write.parquet(dir)
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "v1", "v2"))
    // old-generation rows surface NULL for the added column
    assert(merged.filter(col("id") === 1).select("v2").head.isNullAt(0))
  }

  test("partitioned layout: filters prune partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part")
      .toString + "/docs"
    Tables.load(spark, sf, "documents")
      .write.partitionBy("lang").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("lang") === "en")
    val scan = q.queryExecution.executedPlan.toString
    // the predicate lands in PartitionFilters — whole directories are
    // skipped, the per-row filter never runs
    assert(scan.contains("PartitionFilters: [isnotnull(lang"), scan)
    val expected = Tables.load(spark, sf, "documents")
      .filter(col("lang") === "en").count()
    assert(q.count() == expected)
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true)") {
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      // shrink AQE's skew thresholds to fixture scale and forbid
      // broadcast so the join is a shuffled SMJ with one hot partition
      conf.set(keys(0), "256KB")
      conf.set(keys(1), "64KB")
      conf.set(keys(2), "2")
      conf.set(keys(3), "-1")
      val fact = spark.range(300000).select(
        when(col("id") % 10 < 9, lit(1L)).otherwise(col("id") % 100)
          .as("key"),
        concat(lit("payload_payload_payload_"), col("id")).as("pl"))
      val dim = spark.range(100).select(col("id").as("key"),
        concat(lit("dim_"), col("id")).as("dname"))
      val j = fact.join(dim, "key")
      // execute THIS dataset's own QueryExecution (count() would plan
      // a separate collapsed query and leave j's plan un-finalized)
      assert(j.collect().length == 300000)
      // the FINAL adaptive plan must carry a skew-split SMJ — this is
      // the runtime answer to hot keys that no static plan gives
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(4000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("IVF at rest: cell-partitioned embeddings prune to probed cells") {
    import graft.functions.Similarity
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf")
      .toString + "/cells"
    // the IVF layout: cell id as the physical partition key — this is
    // the 100 TB query path, where a probe reads its cells' dirs and
    // the rest of the corpus is never opened
    val assigned = Similarity.assignedCells(spark, sf)
    assigned.write.partitionBy("cell").parquet(dir)
    val probe = assigned.limit(1).select("cell").collect()(0).getLong(0)
    val q = spark.read.parquet(dir).filter(col("cell") === probe)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(cell"), scan)
    assert(q.count() == assigned.filter(col("cell") === probe).count())
  }

  test("sf1 smoke: engine-replicated 10x corpus, no headline query " +
    "goes superlinear", SlowTests) {
    // the scale-cliff detector (see ScaleUp's scaladoc): replicate
    // sf0.1 10x BY THE ENGINE, run the most expensive queries plus the
    // dedup family at both scales in this JVM, and assert each sf1
    // time stays within 10x its measured sf0.1 time (+ a floor for
    // sub-second base times, where constant overheads dominate and a
    // ratio on noise would flap). A pair-generation path gone
    // quadratic shows up as ~100x here, far outside the gate.
    val sf01 = "/root/testdata/sf0.1"
    val sf1 = java.nio.file.Files
      .createTempDirectory("graft_sf1").toString
    graft.operators.ScaleUp.replicate(spark, sf01, sf1, 10)
    // replication contract: 10x rows, keys copy-disjoint
    val li = spark.read.parquet(s"$sf1/lineitem.parquet")
    assert(li.count() ==
      10 * spark.read.parquet(s"$sf01/lineitem.parquet").count())
    assert(li.select(countDistinct(floor(
      col("l_orderkey") / graft.operators.ScaleUp.KeyOffset)))
      .head.getLong(0) == 10)
    val heads = Seq(
      "pipe2_migration", "c6b_jdbc_merge", "s16_zorder_layout",
      "s7_parquet_roundtrip", "s7b_jdbc_roundtrip", "s13_compaction",
      "c2_fix_actions", "j4_symmetric_diff", "t12_context_chunks",
      "a1_chunk_counts",
      "d1_exact_dedup", "d2_ngram_jaccard", "d3_minhash_lsh",
      "d4_simhash", "d4b_simhash_pairs", "d6_dup_clusters",
      "d8_incremental_dedup", "d9_estimator_calibration",
      "d10_cluster_canonical", "pipe5_token_mixture",
      "pipe6_incremental_curation", "d12_exact_substring",
      "t14_rarity_profile", "pipe7_dataset_card",
      // round-7 late additions with scale-relevant shapes: w11's
      // single-shuffle double window over 10x events, d14's
      // vocab-bound FastSS signature join (10x part rows, SAME name
      // vocabulary — cost must track the vocab, not the table)
      "w11_sessionize", "d14_fuzzy_name_pairs",
      // t16 is vocab-bound after one corpus pass (must stay near
      // flat); pipe10 is corpus-linear (four bucketed flag joins);
      // s17 is a write-layout job like s13/s15 plus an O(files)
      // planning collect
      "t16_bpe_merges", "pipe10_gate_ablation", "s17_manifest_skipping",
      // round-8: c6d's REPLACE path is row-linear like c6b's MERGE;
      // t17's model is vocab-bound (10x corpus, SAME vocabulary —
      // cost must track tokens, not bigram-pair space); c7 is the
      // 1/4-sampled a2b (compare volume scales with the sample);
      // s8c is a no-shuffle render/parse pass.
      // ann10 is deliberately NOT a head, same reason ann1 isn't: its
      // decision-query wrapper embeds the exact O(N·Q) truth verifier
      // (and the O(N·C) assignment), both quadratic at 10x BY DESIGN
      // — the serving path alone (probe ranking + cell-restricted
      // ADC) is the production shape and is covered by the
      // plan-asserted equi-join contract in DedupSpec
      "c6d_jdbc_replace_native", "t17_bigram_lm",
      "c7_sampled_compare", "s8c_csv_dialect",
      // round-9: the config-driven task modes are corpus-linear
      // (three concurrent csv renders / chunk-summary compares); the
      // streaming arms are row-linear signature work + capped-bucket
      // state over a fixed micro-batch overhead
      "pipe11_config_driven", "pipe12_compare_config",
      "d15_streaming_near_dup", "d16_streaming_exact_dedup",
      // round-10: t18 is corpus-linear (one tagged explode + doc-keyed
      // windows); t19 is vocab-bound like t17 (10x corpus, SAME
      // vocabulary); t20 is a per-row projection + per-partition
      // top-k (near-flat); d17 rides d9's candidate histogram plus a
      // fixed 127-row grid — its ratio tracks d9's
      "t18_gopher_repetition", "t19_nb_quality", "t20_weighted_sample",
      "d17_band_planner",
      // a40 is one corpus-linear scan ending in a ~60-row report;
      // m6 is one fmt-keyed window + groupBy (t9's packing shape).
      // ann11 is NOT a head for ann1/ann10's reason: its shortlist
      // input embeds the deliberately O(N·Q) exact-truth build; the
      // MMR pass itself is bounded (queries × C(10,2) pairs, K steps)
      "a40_drift_gate", "m6_shard_plan",
      // d18 rides d6's memoized clusters + one doc-keyed left join;
      // d19 is the banded explode + a bounded-fan-out index probe
      "d18_soft_dedup_weights", "d19_incremental_near_dup",
      // pipe13 rides d18 plus one doc-keyed join and a groupBy(lang).
      // ann12 is NOT a head for ann1/ann11's reason: its filtered
      // truth relation is the deliberately O(N·Q) exact build; the
      // serving arms are bounded equi-joins
      "pipe13_weighted_mixture",
      // round-10: d20 rides the memoized shingle index — one distinct
      // (source, shingle) reduction plus a pair join whose fan-out is
      // bounded by the FIXED source count, so it must track the index
      // build; s18 is two pruned scans + an O(files) sweep. ann13 is
      // NOT a head for ann1's reason: the centroid stand-in rule
      // (vec_id % 50) grows C with N, making its O(N·C) assignment
      // quadratic at 10x BY CONSTRUCTION — production C is fixed
      "d20_source_overlap", "s18_overlap_depth",
      // a41 is seven aggregate-then-join passes, each linear in its
      // child table with a key-domain shuffle; pipe14 is two corpus
      // writes + bounded audit aggregates
      "a41_fk_audit", "pipe14_wap_publish",
      // c11 is row-linear stream-stream join state over 10x events;
      // s19 is two partitioned writes + a per-day groupBy; t21 rides
      // t17's vocab-bound model plus one per-language sort
      "c11_streaming_interval_join", "s19_dynamic_overwrite",
      "t21_ccnet_buckets",
      // round-11: t22 trains on the vocab (t16's bound) then encodes
      // in one corpus-linear pass of literal replaces; a43 is
      // row-linear streaming with bucket-table-sized state (a40's
      // report shape under the d15/d16 micro-batch overhead)
      "t22_bpe_encode", "a43_streaming_drift",
      // t23 rides t22's cached merge table + encode pass plus one
      // doc-keyed join and a per-source window — t9's packing shape;
      // pipe15 is pipe14's write/audit envelope plus one
      // shard-vs-published fingerprint anti-join (d8's shape)
      "t23_bpe_packing", "pipe15_incremental_wap",
      // a44/a45 are single-scan partial-aggregable sketches ending in
      // bounded register/histogram tables (a44 also carries the
      // deliberately-exact countDistinct it exists to replace — the
      // one linear-shuffle term in its ratio)
      "a44_hll_distinct", "a45_hist_quantiles",
      // s20 is one hash exchange + within-shard sort + write — the
      // at-scale global shuffle (never a global orderBy); w12 is
      // row-linear session-window state evicted at close, plus one
      // keyed window over the sessions-sized output
      "s20_epoch_shuffle", "w12_streaming_sessionize",
      // round-12: a46/a47 are row-linear streaming passes whose
      // state is the bounded register/histogram table (a43's shape
      // under the same micro-batch overhead)
      "a46_streaming_hll", "a47_streaming_quantiles",
      // round-13: a48 is the same complete-mode shape with the
      // bounded D×W cell table as state, plus a39's bounded probe
      // read-off batch-side; a49 is three row-linear passes ending
      // in bounded histograms / one aggregate row
      "a48_streaming_cms", "a49_outlier_mad",
      // t24 is one feature-stream (unigram+bigram, row-local) groupBy
      // into a FIXED 8192-bucket model + one equi-join back + a
      // per-doc groupBy — two corpus-linear exchanges, model size
      // constant in N; m8 is d4b's banded-pair
      // plan over the perceptual hash (cap bounds the join fan-out);
      // pipe19 is pipe15's admission loop (linear staging writes +
      // bounded audits) under the micro-batch overhead, publish
      // metadata-only against the memoized landing dir
      "t24_dsir_select", "m8_phash_neardup",
      "pipe19_streaming_admission",
      // round-15: the lifecycle GC pair — pipe20's expiry is
      // manifest arithmetic + dir deletes (its setup's publish/
      // admit/compact and its report's live-tip recount are the
      // corpus-linear terms); pipe21's sweep is one listing per
      // namespace + O(orphans) deletes over the same setup shape
      "pipe20_snapshot_expire", "pipe21_orphan_sweep")
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // cold-vs-cold in a CLEAN storage pool: by this point the JVM has
    // run every other suite and its storage memory is full of their
    // persisted relations — a 10x measurement taken in that state
    // times eviction and GC, not the operator (observed: d2 sf1 152 s
    // dirty vs ~70 s clean, flipping the verdict). Purge the memo
    // caches and the catalog cache once before EACH scale's pass —
    // within a pass the family memoization stays live (the production
    // shape: the shingle index is built once per corpus), so the
    // ratio compares family-amortized passes at both scales.
    def cleanPool(): Unit = {
      graft.functions.Memo.purgeAllCaches()
      spark.catalog.clearCache()
    }
    cleanPool()
    val t01s = heads.map(name => name -> time(name, sf01)).toMap
    cleanPool()
    val t1s = heads.map(name => name -> time(name, sf1)).toMap
    val ratios = heads.map { name =>
      val (t01, t1raw) = (t01s(name), t1s(name))
      val bound = 10.0 * math.max(t01, 0.5)
      // re-sample on exceed, keep the min (the bench's best-of-2
      // policy): one cold Derby boot or stolen-CPU window must not
      // decide a superlinearity verdict — a genuinely superlinear
      // query exceeds on both samples
      val t1 = if (t1raw > bound) math.min(t1raw, time(name, sf1))
      else t1raw
      info(f"$name%-24s sf0.1=$t01%6.2fs sf1=$t1%7.2fs " +
        f"ratio=${t1 / t01}%5.1fx bound=$bound%6.1fs")
      (name, t01, t1, bound)
    }
    val over = ratios.filter { case (_, _, t1, bound) => t1 > bound }
    assert(over.isEmpty, "superlinear at 10x: " + over.map {
      case (n, t01, t1, b) => f"$n (sf0.1=$t01%.2fs sf1=$t1%.2fs bound=$b%.1fs)"
    }.mkString(", "))
  }

  test("log-window selection covers the checkpoint, in SCN order (C2)") {
    val logs = Seq(
      LogFile("arch1", 0, 1000), LogFile("arch2", 1000, 2000),
      LogFile("redo1", 2000, 3000), LogFile("redo2", 3000, Long.MaxValue))
    // mid-archive checkpoint: its file plus everything after
    assert(Cdc.selectLogWindow(logs, 1500).map(_.path) ==
      Seq("arch2", "redo1", "redo2"))
    // exactly at a boundary: the earlier file is fully consumed
    assert(Cdc.selectLogWindow(logs, 2000).map(_.path) ==
      Seq("redo1", "redo2"))
    // fresh start mines everything; far-future mines only current redo
    assert(Cdc.selectLogWindow(logs, 0).size == 4)
    assert(Cdc.selectLogWindow(logs, 99999999L).map(_.path) == Seq("redo2"))
  }
}
