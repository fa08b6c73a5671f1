package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite with SparkSessionTestWrapper {

  test("t5 winnowing survives wide (non-Latin) codepoints") {
    import spark.implicits._
    // regression: ascii() yields the full Unicode codepoint, so an
    // un-widened 32-bit polynomial overflows from codepoint 2326 up
    // (ANSI mode: SparkArithmeticException; legacy: silent wrap that
    // diverges from the oracle)
    val tmp = java.nio.file.Files.createTempDirectory("graft_t5w").toString
    Seq(
      (1L, "一二三四五六七八九十"),
      (2L, "short"),
      (3L, "plain ascii text that winnows normally"))
      .toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = TextAnalysis.t5WinnowFingerprint(spark, tmp)
      .orderBy("doc_id").collect()
    assert(rows.length == 3)
    // the CJK doc has 10 chars → 6 windows → winnowed minima exist,
    // and every hash stayed positive int64 (no wrap)
    assert(rows(0).getInt(1) > 0)
    assert(rows(0).getLong(2) > 0L, s"checksum wrapped: ${rows(0)}")
    // 5-char doc: one window, one fingerprint
    assert(rows(1).getInt(1) == 1)
  }

  test("t6 sample is partitioning-invariant (same docs on any layout)") {
    val a = TextAnalysis.t6HashSample(spark, sf).select("doc_id")
    // re-derive the sample from a violently different layout — a
    // hash sample must not care how the data is partitioned
    val shuffled = Tables.load(spark, sf, "documents").repartition(13)
    val tmp = java.nio.file.Files.createTempDirectory("graft_t6").toString
    shuffled.write.parquet(s"$tmp/documents.parquet")
    val b = TextAnalysis.t6HashSample(spark, tmp).select("doc_id")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // and it actually samples: strictly between 0 and all docs
    val n = a.count()
    assert(n > 0 && n < shuffled.count())
  }

  test("pipe1 accounting: docs survive gate+dedup, never multiply") {
    val out = TextAnalysis.pipe1TrainingPipeline(spark, sf)
    val total = out.agg(sum("n_docs")).head.getLong(0)
    val source = Tables.load(spark, sf, "documents").count()
    assert(total > 0 && total <= source)
    // dedup invariant: distinct canonical texts >= surviving docs
    val distinctCanon = Tables.load(spark, sf, "documents")
      .select(lower(regexp_replace(col("text"), "\\s+", " ")).as("c"))
      .distinct().count()
    assert(total <= distinctCanon)
  }

  test("t5 fingerprint sets are whitespace/case-insensitive") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_t5c").toString
    Seq((1L, "The Quick   Brown Fox"), (2L, "the quick brown fox"))
      .toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val rows = TextAnalysis.t5WinnowFingerprint(spark, tmp)
      .select("n_fingerprints", "fp_checksum").distinct().collect()
    assert(rows.length == 1, "canonicalization must collapse both docs")
  }

  test("t12 windows cover every token exactly (tail window included)") {
    // per doc: last chunk must reach the final token, windows must
    // overlap by window-stride, and no chunk may be empty
    val chunks = TextAnalysis.t12ContextChunks(spark, sf)
      .groupBy("doc_id")
      .agg(max(col("chunk_idx") * 48 + col("n_tokens")).as("reach"),
        min(col("n_tokens")).as("min_len"),
        count(lit(1)).as("n_chunks"))
    val words = Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_words"))
    val joined = chunks.join(words, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Int]("reach") >= r.getAs[Int]("n_words"),
        s"doc ${r.getAs[Long]("doc_id")} tail tokens uncovered")
      assert(r.getAs[Int]("min_len") > 0)
    }
  }

  test("t13 is total over the corpus and flags iff fraction > 0.2") {
    import spark.implicits._
    val out = TextAnalysis.t13RepetitionFilter(spark, sf)
    assert(out.count() == Tables.load(spark, sf, "documents").count())
    assert(out.filter(col("flagged") =!= (col("dup_fraction") > 0.2))
      .isEmpty)
    // short docs come back unflagged with zero fraction, not dropped
    val tmp = java.nio.file.Files.createTempDirectory("graft_t13").toString
    Seq((1L, "single"), (2L, "a a a a a a")).toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val edge = TextAnalysis.t13RepetitionFilter(spark, tmp)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("dup_fraction"), r.getAs[Boolean]("flagged")))
      .toMap
    assert(edge(1L) == ((0.0, false)), "1-word doc must be total+clean")
    assert(edge(2L)._2, "pure repetition must flag")
  }

  test("pipe4 only removes docs relative to pipe1 (gates are subsets)") {
    def total(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum("n_docs")).head.getLong(0)
    val p1 = total(TextAnalysis.pipe1TrainingPipeline(spark, sf))
    val p4 = total(TextAnalysis.pipe4Curation(spark, sf))
    assert(p4 > 0, "curation emptied the corpus")
    assert(p4 <= p1,
      s"pipe4 ($p4) kept more docs than pipe1 ($p1) — extra gates " +
        "must only remove")
    // determinism: the whole composition is hash-driven, a second
    // run must agree exactly
    val again = total(TextAnalysis.pipe4Curation(spark, sf))
    assert(again == p4)
  }

  test("pipe5 budgets are respected within one greedy-boundary doc") {
    val rows = TextAnalysis.pipe5TokenMixture(spark, sf).collect()
    assert(rows.length == 5) // one mix row per weighted language
    val maxTok = graft.Tables.load(spark, sf, "documents")
      .select(max(size(TextAnalysis.words(col("text")))).cast("long"))
      .head.getLong(0)
    rows.foreach { r =>
      val (tot, bud, nSel, tokSel) = (r.getAs[Long]("tok_total"),
        r.getAs[Long]("budget"), r.getAs[Long]("n_sel"),
        r.getAs[Long]("tok_sel"))
      assert(nSel <= r.getAs[Long]("n_docs") && tokSel <= tot)
      if (tot <= bud) {
        // supply under budget: everything is selected
        assert(tokSel == tot && nSel == r.getAs[Long]("n_docs"))
      } else {
        // greedy prefix: each of the 64 buckets may overshoot its
        // remaining budget by at most one doc
        assert(tokSel < bud + 64 * maxTok,
          s"${r.getAs[String]("lang")}: sel=$tokSel budget=$bud")
        // and it cannot leave more than a boundary doc per bucket
        // unfilled while supply remains
        assert(tokSel > bud - 64 * maxTok,
          s"${r.getAs[String]("lang")}: sel=$tokSel budget=$bud")
      }
    }
  }

  test("pipe13 weighted mixture: shares coherent, dedup only discounts") {
    val rows = TextAnalysis.pipe13WeightedMixture(spark, sf).collect()
    assert(rows.nonEmpty)
    // soft-dedup weight ≤ 1 doc's mass: effective can never exceed raw
    rows.foreach { r =>
      assert(r.getAs[Long]("tok_eff") <= r.getAs[Long]("tok_raw"),
        r.getAs[String]("lang"))
    }
    // floor-div basis points: each share sums to (10000 - floor loss)
    for (c <- Seq("share_raw_bp", "share_eff_bp")) {
      val s = rows.map(_.getAs[Long](c)).sum
      assert(s <= 10000 && s > 10000 - rows.length, s"$c sums to $s")
    }
    // the shifts reallocate mass, they don't create it
    val shift = rows.map(_.getAs[Long]("shift_bp")).sum
    assert(math.abs(shift) < rows.length, s"net shift $shift")
  }

  test("pipe5 per-doc window is bucketed, never per-language global") {
    // the scale contract from pipe5's scaladoc: the per-doc prefix
    // cumsum must partition by (lang, bucket) — a (lang)-only window
    // here is the single-reducer-per-language bottleneck the bucketed
    // design exists to remove. Partition keys print WITHOUT a sort
    // direction in windowspecdefinition, so the bucketed shape is
    // "lang#n, bucket#n, doc_id#n ASC" — bucket as a partition key.
    val plan = TextAnalysis.pipe5TokenMixture(spark, sf)
      .queryExecution.executedPlan.toString
    assert(
      "windowspecdefinition\\(lang#\\d+, bucket#\\d+L?, doc_id#\\d+L? ASC"
        .r.findFirstIn(plan).isDefined, plan.take(3000))
    assert(
      "windowspecdefinition\\(lang#\\d+, doc_id#\\d+L? ASC"
        .r.findFirstIn(plan).isEmpty, "per-language global doc window found")
  }

  test("pipe6 funnel conserves the shard and composes d8's verdicts") {
    val rows = TextAnalysis.pipe6IncrementalCuration(spark, sf).collect()
    assert(rows.nonEmpty)
    // conservation: every arriving doc lands in exactly one bucket
    rows.foreach { r =>
      assert(r.getAs[Long]("n_arrived") ==
        r.getAs[Long]("n_dup_corpus") + r.getAs[Long]("n_dup_shard") +
          r.getAs[Long]("n_low_quality") + r.getAs[Long]("n_admitted"),
        s"funnel leak in lang ${r.getAs[String]("lang")}")
    }
    // composition: pipe6's dedup buckets are EXACTLY d8's verdicts on
    // the same shard (same salt, same fingerprint rule) — the funnel
    // must not re-decide dedup, only extend it with the quality gate
    val d8 = graft.functions.Dedup.d8IncrementalDedup(spark, sf)
      .groupBy("verdict").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def tot(c: String) = rows.map(_.getAs[Long](c)).sum
    assert(tot("n_dup_corpus") == d8.getOrElse("DUP_OF_CORPUS", 0L))
    assert(tot("n_dup_shard") == d8.getOrElse("DUP_IN_SHARD", 0L))
    assert(tot("n_low_quality") + tot("n_admitted") ==
      d8.getOrElse("NEW", 0L))
    // and the quality gate actually bites somewhere in the funnel
    assert(tot("n_admitted") > 0)
  }

  test("t14 rarity bands: hapax, shared, and hot trigrams account exactly") {
    import spark.implicits._
    // A: 2 unique trigrams (all hapax). B=C: identical 5-token docs,
    // 3 trigrams each at df=2. D: too short for any trigram. E..I:
    // share the "c1 c2 c3" trigram (df=5) plus 2 per-doc hapax grams.
    val docs = Seq(
      (1L, "x1 x2 x3 x4"),
      (2L, "y1 y2 y3 y4 y5"), (3L, "y1 y2 y3 y4 y5"),
      (4L, "z1 z2")) ++
      (5L to 9L).map(i => (i, s"c1 c2 c3 e${i}a e${i}b"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_t14").toString
    docs.toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.t14RarityProfile(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> (
        r.getAs[Long]("n_grams"), r.getAs[Long]("n_df1"),
        r.getAs[Long]("n_df2_4"), r.getAs[Long]("n_df5_24"),
        r.getAs[Long]("n_df25p"), r.getAs[Long]("min_df"),
        r.getAs[Long]("max_df"), r.getAs[Long]("hapax_per_mille")))
      .toMap
    assert(got(1L) == ((2L, 2L, 0L, 0L, 0L, 1L, 1L, 1000L)))
    assert(got(2L) == ((3L, 0L, 3L, 0L, 0L, 2L, 2L, 0L)))
    assert(got(2L) == got(3L))
    assert(got(4L) == ((0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)))
    (5L to 9L).foreach(i =>
      assert(got(i) == ((3L, 2L, 0L, 1L, 0L, 1L, 5L, 666L)), s"doc $i"))
  }

  test("pipe7 dataset card: metrics self-consistent, artifact renders them") {
    val card = TextAnalysis.pipe7DatasetCard(spark, sf)
    val rows = card.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // every doc has exactly one fingerprint, so the exact-dup
    // accounting must close over the corpus count
    assert(rows(("dedup", "n_exact_dup_docs")) ==
      rows(("corpus", "n_docs")) - rows(("dedup", "n_exact_groups")))
    // quality bands partition the corpus
    val bands = rows.collect { case (("quality", _), v) => v }.sum
    assert(bands == rows(("corpus", "n_docs")))
    // passage mass: flagged docs exist at this corpus and their token
    // mass is positive iff any doc is flagged
    val nPass = rows(("dedup", "n_dup_passage_docs"))
    val tokPass = rows(("dedup", "total_dup_passage_tokens"))
    assert((nPass > 0) == (tokPass > 0))
    val tmp = java.nio.file.Files.createTempDirectory("graft_card").toString
    val path = s"$tmp/dataset_card.md"
    TextAnalysis.writeDatasetCard(path, card)
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    assert(text.startsWith("# Dataset Card"))
    Seq("## corpus", "## dedup", "## quality").foreach(h =>
      assert(text.contains(h), s"missing section $h"))
    assert(text.contains(
      s"- n_docs: ${rows(("corpus", "n_docs"))}"))
  }

  test("t15 keyword rank is (tf desc, df asc, term asc), top-3 only") {
    import spark.implicits._
    // doc 1: "b b b a a c d" → b(tf3) first; a(tf2) second; c vs d tie
    // on tf=1 → df decides: c appears in doc 2 too (df 2), d only
    // here (df 1) → d outranks c. doc 2: same df rule demotes its c
    // below e and f (df 1 each), whose own tie breaks lexically.
    val tmp = java.nio.file.Files.createTempDirectory("graft_t15").toString
    Seq((1L, "b b b a a c d"), (2L, "c e f"))
      .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.t15TfidfKeywords(spark, tmp)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank"),
        r.getAs[String]("term")))
    assert(got.toSeq == Seq(
      (1L, 1, "b"), (1L, 2, "a"), (1L, 3, "d"),
      (2L, 1, "e"), (2L, 2, "f"), (2L, 3, "c")), got.mkString("; "))
  }

  test("pipe9 sqrt-temperature budgets: exact integers, rate capped") {
    import spark.implicits._
    // two sources, 400 vs 100 tokens (docs of 4 words each):
    // weights 20 vs 10, B = 250 → budgets 166 vs 83: the small
    // source gets 33% of the budget at 20% of the mass — the
    // tail-boost that IS the point of temperature scaling.
    val tmp = java.nio.file.Files.createTempDirectory("graft_p9").toString
    val docs =
      (1 to 100).map(i => (i.toLong, "a b c d", "big")) ++
        (1 to 25).map(i => (1000L + i, "a b c d", "small"))
    docs.toDF("doc_id", "text", "source")
      .write.parquet(s"$tmp/documents.parquet")
    val got = TextAnalysis.pipe9TemperatureMixture(spark, tmp)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("tokens"), r.getAs[Long]("weight"),
          r.getAs[Long]("budget"), r.getAs[Long]("rate_bp"))).toMap
    assert(got("big") == ((400L, 20L, 166L, 4150L)), got("big").toString)
    assert(got("small") == ((100L, 10L, 83L, 8300L)), got("small").toString)
  }

  test("t16 BPE: the elected merge is gone from round 2 and the fused " +
    "symbol takes its place") {
    val rows = TextAnalysis.t16BpeMerges(spark, sf).collect()
    val r1 = rows.filter(_.getAs[Long]("round") == 1L)
    val r2 = rows.filter(_.getAs[Long]("round") == 2L)
    assert(r1.nonEmpty && r2.nonEmpty)
    // round-1 winner under the same total order the operator uses
    val winner = r1.minBy(r =>
      (-r.getAs[Long]("n"), r.getAs[String]("pair"))).getAs[String]("pair")
    // every occurrence was rewritten, so the winning pair cannot be
    // adjacent anywhere in round 2
    assert(!r2.exists(_.getAs[String]("pair") == winner),
      s"merged pair $winner survived into round 2")
    // and the fused symbol participates in new pairs
    assert(r2.exists(_.getAs[String]("pair").contains("@")),
      "no round-2 pair contains the fused symbol")
    // counts are freq-weighted positives
    rows.foreach(r => assert(r.getAs[Long]("n") > 0))
  }

  test("t22 BPE encode: merges continue t16's per-round argmax and the " +
    "corpus token counts match a driver-side replay") {
    val merges = TextAnalysis.bpeTrainMerges(spark, sf)
    assert(merges.length == 6)
    // rounds 1-2 must elect exactly what t16 reports (same trainer,
    // same tie-break) — the merge table is t16 CONTINUED, not a fork
    val t16 = TextAnalysis.t16BpeMerges(spark, sf).collect()
    def winner(round: Long): String = t16
      .filter(_.getAs[Long]("round") == round)
      .minBy(r => (-r.getAs[Long]("n"), r.getAs[String]("pair")))
      .getAs[String]("pair")
    assert(merges(0)._1 == winner(1L))
    assert(merges(1)._1 == winner(2L))
    // independent replay: plain JVM string ops (String.replace is the
    // same leftmost non-overlapping global literal rewrite), word by
    // word, on a sample of docs — pins the distributed encode against
    // a second implementation, not just the shared SQL dialect
    def encodeLen(w: String): Int =
      if (w.matches("^[a-z]+$"))
        merges.foldLeft(w) { case (acc, (p, sym)) =>
          acc.replace(p, sym) }.length
      else w.length
    val got = TextAnalysis.t22BpeEncode(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("bpe_tokens"), r.getAs[Long]("ws_tokens"))).toMap
    val sample = graft.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") % 17 === 0)
      .select("doc_id", "text").collect()
    assert(sample.nonEmpty)
    for (r <- sample) {
      val ws = r.getAs[String]("text").split(" ", -1)
      val expect = (ws.map(encodeLen(_).toLong).sum, ws.length.toLong)
      assert(got(r.getAs[Long]("doc_id")) == expect,
        s"doc ${r.getAs[Long]("doc_id")}: " +
          s"${got(r.getAs[Long]("doc_id"))} != $expect")
    }
  }

  test("t23 BPE packing conserves each source's token mass and doc count") {
    import org.apache.spark.sql.functions.sum
    val bins = TextAnalysis.t23BpePacking(spark, sf).collect()
    assert(bins.nonEmpty)
    val bySrcTok = bins.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("bin_tokens")).sum).toMap
    val bySrcDocs = bins.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val expect = TextAnalysis.t22BpeEncode(spark, sf)
      .join(graft.Tables.load(spark, sf, "documents")
        .select("doc_id", "source"), "doc_id")
      .groupBy("source").agg(sum(col("bpe_tokens")).as("tok"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("tok"), r.getAs[Long]("n"))).toMap
    assert(bySrcTok.keySet == expect.keySet)
    for ((src, (tok, n)) <- expect) {
      assert(bySrcTok(src) == tok, s"$src token mass")
      assert(bySrcDocs(src) == n, s"$src doc count")
    }
    // bin ids start at 0 per source (first doc's running sum excludes
    // itself) and every bin holds at least one doc
    for ((_, rs) <- bins.groupBy(_.getAs[String]("source")))
      assert(rs.map(_.getAs[Long]("bin_id")).min == 0L)
    bins.foreach(r => assert(r.getAs[Long]("n_docs") >= 1L))
  }

  test("pipe10 ablation cells partition the train candidates") {
    import org.apache.spark.sql.functions._
    val cells = TextAnalysis.pipe10GateAblation(spark, sf).collect()
    assert(cells.nonEmpty)
    val nTrainCandidates = graft.Tables.load(spark, sf, "documents")
      .withColumn("is_eval",
        pmod(graft.functions.Norm.xhash64(concat_ws("|", lit("eval"),
          col("doc_id").cast("string"))), lit(50L)) === 0)
      .filter(!col("is_eval")).count()
    assert(cells.map(_.getAs[Long]("n_docs")).sum == nTrainCandidates,
      "ablation cells must partition the candidate set exactly")
    // flag combos are distinct cells
    val keys = cells.map(r => (r.getBoolean(0), r.getBoolean(1),
      r.getBoolean(2), r.getBoolean(3)))
    assert(keys.distinct.length == keys.length)
  }

  test("t17 bigram LM: hand-computed smoothed reciprocals, unseen " +
    "bigram on the held-out slice") {
    import spark.implicits._
    // train slice (id % 10 != 0): docs 1-2 → c12(a,b)=3, c12(b,a)=1,
    // c1(a)=3, c1(b)=1, V={a,b}=2. held-out: doc 10 seen bigram,
    // doc 20 an UNSEEN one (z not in the train vocab), so add-one
    // smoothing is what scores it: S = floor((c1+V)/(c12+1))
    val tmp = java.nio.file.Files.createTempDirectory("graft_t17").toString
    Seq((1L, "a b a b"), (2L, "a b"), (10L, "a b"), (20L, "a z"))
      .toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val got = graft.functions.TextAnalysis.t17BigramLm(spark, tmp)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("in_train"), r.getAs[Long]("n_bigrams"),
          r.getAs[Long]("n_unseen"), r.getAs[Long]("sum_recip"))))
      .toMap
    // doc 1: pairs (a,b)(b,a)(a,b) → S = 1+1+1 (floor(5/4), floor(3/2))
    assert(got(1L) == ((1L, 3L, 0L, 3L)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((1L, 1L, 0L, 1L)), s"doc2: ${got(2L)}")
    assert(got(10L) == ((0L, 1L, 0L, 1L)), s"doc10: ${got(10L)}")
    // unseen (a,z): c12=0 → S = floor((3+2)/1) = 5
    assert(got(20L) == ((0L, 1L, 1L, 5L)), s"doc20: ${got(20L)}")
  }

  test("t18 Gopher gates: hand-computed fractions on a loop, a clean doc, a short doc") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_t18").toString
    Seq(
      (1L, "a b a b a b a b"), // pure loop: every 5-gram duplicated
      // all-distinct and LONG ENOUGH that even the top (once-seen)
      // n-gram stays under the gates — a short clean doc still trips
      // top2 because one bigram can cover >20% of it (doc 3 proves it)
      (2L, ('a' to 'z').map(c => s"$c$c$c").mkString(" ")), // 26 distinct words
      (3L, "x y")) // too short for 4/5-grams
      .toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val got = graft.functions.TextAnalysis.t18GopherRepetition(spark, tmp)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("top2_frac"), r.getAs[Double]("top3_frac"),
          r.getAs[Double]("top4_frac"), r.getAs[Double]("dup5_frac"),
          r.getAs[Boolean]("flagged"))))
      .toMap
    // doc 1 (15 chars, 8 words): top bigram "a b" ×4, len 3 → 12/15;
    // top trigram "a b a" ×3, len 5 → 15/15 = 1.0; top 4-gram
    // "a b a b" ×3 (overlapping occurrences COUNT, the published
    // approximation), len 7 → 21/15 > 1; all four 5-gram windows are
    // one of two grams each seen twice → dup coverage = all 8 words
    assert(got(1L) == ((12.0 / 15, 1.0, 21.0 / 15, 1.0, true)),
      s"doc1: ${got(1L)}")
    // doc 2: every n-gram unique → top cnt 1; no dup 5-grams
    val d2 = got(2L)
    assert(d2._4 == 0.0 && !d2._5, s"doc2: $d2")
    // doc 3 (3 chars, 2 words): only the bigram exists — "x y" covers
    // the whole doc (3/3); 3/4/5-gram signals coalesce to 0; flagged
    // because top2 = 1.0 > 0.20 (Gopher gates short docs elsewhere)
    assert(got(3L) == ((1.0, 0.0, 0.0, 0.0, true)), s"doc3: ${got(3L)}")
  }

  test("t19 seed classifier: learned token polarity generalizes to the unlabeled band") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_t19").toString
    // HIGH seed (>= 20 words, uniq) full of "good"-class tokens; LOW
    // seed (< 10 words) of "bad"-class; one MEDIUM doc (10-19 words,
    // unlabeled) built from the HIGH side's vocabulary must come back
    // pred_high even though no rule labeled it
    val hi = (('a' to 't').map(_.toString) :+ "good").mkString(" ") // 21 uniq words
    val lo = "bad bad bad noise"
    val mid = ('a' to 'j').map(_.toString).mkString(" ") // 10 words, all hq vocab
    Seq((1L, hi), (2L, lo), (3L, mid))
      .toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val got = graft.functions.TextAnalysis.t19NbQuality(spark, tmp)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("seed_band"), r.getAs[Long]("score"),
          r.getAs[Boolean]("pred_high"))))
      .toMap
    assert(got(1L)._1 == "HIGH" && got(1L)._3, s"doc1: ${got(1L)}")
    assert(got(2L)._1 == "LOW" && !got(2L)._3, s"doc2: ${got(2L)}")
    // the interesting row: unlabeled, scored purely by learned tokens
    assert(got(3L)._1 == "MEDIUM" && got(3L)._2 > 0 && got(3L)._3,
      s"doc3: ${got(3L)}")
    // per-token arithmetic: each hq-only token scores
    // floor(1*10^6/3) = 333333; 10 of them
    assert(got(3L)._2 == 10L * 333333L, s"doc3 score: ${got(3L)}")
  }

  test("m6 shard plan: byte-budgeted next-fit within each format stream") {
    val rows = graft.functions.Multimodal.m6ShardPlan(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("fmt"), r.getAs[Long]("shard_id"),
        r.getAs[Long]("n_items"), r.getAs[Long]("shard_bytes")))
    val total = Tables.load(spark, sf, "documents").count()
    assert(rows.map(_._3).sum == total)
    // payloads are all 32 bytes -> every shard except each format's
    // last holds exactly 4096/32 = 128 items, and bytes = items * 32
    rows.foreach { case (_, _, n, b) => assert(b == n * 32) }
    rows.groupBy(_._1).foreach { case (fmt, rs) =>
      val last = rs.map(_._2).max
      rs.filter(_._2 != last).foreach { case (_, sid, n, _) =>
        assert(n == 128L, s"$fmt shard $sid has $n items")
      }
      // shard ids are dense from 0
      assert(rs.map(_._2).sorted.toSeq == (0L until rs.length).toSeq)
    }
  }

  test("t20 weighted sample: exact priority order, partition-invariant") {
    val docs = Tables.load(spark, sf, "documents")
    val got = graft.functions.TextAnalysis.t20WeightedSample(spark, sf)
      .collect()
    assert(got.length == math.min(100L, docs.count()).toInt)
    // recompute every priority independently and check the selection
    // IS the k smallest (ties impossible: priorities are distinct)
    val all = docs.select(org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")).as("w"))
      .collect()
      .map { r =>
        val id = r.getLong(0); val w = r.getInt(1)
        val md5hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"t20|$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val u = java.lang.Long.parseLong(md5hex.take(15), 16) %
          1048576L + 1L
        (id, u.toDouble / 1048576.0 / w)
      }
    val want = all.sortBy { case (id, p) => (p, id) }.take(got.length)
      .map(_._1).toSet
    assert(got.map(_.getAs[Long]("doc_id")).toSet == want)
    // a same-data different-layout write selects the same docs
    val tmp = java.nio.file.Files.createTempDirectory("graft_t20").toString
    docs.repartition(13).write.parquet(s"$tmp/documents.parquet")
    val again = graft.functions.TextAnalysis.t20WeightedSample(spark, tmp)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(again == want)
  }

  test("t22: the literal encode chain still plans, codegens, and " +
    "executes at K=64 merges (the representation's proven ceiling)") {
    // 64 synthetic merges in a realistic shape: two-char [a-z] pairs,
    // each fused to a distinct single non-[a-z], non-metacharacter
    // symbol (U+00C0..) — the same literal-pattern contract as the
    // trained table
    val pairs = for { a <- 'a' to 'h'; b <- 'a' to 'h' } yield s"$a$b"
    val merges = pairs.zipWithIndex.map { case (p, i) =>
      (p, ('À' + i).toChar.toString)
    }
    assert(merges.length == 64)
    // fallback=false: a whole-stage codegen compile failure now
    // THROWS instead of silently degrading to interpreted mode — so
    // executing the chain IS the gate (isolated session: the conf
    // must not leak into other suites)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.codegen.fallback", "false")
    // the input must NOT be a local relation: ConvertToLocalRelation
    // would evaluate the whole chain at optimize time and leave a
    // LocalTableScan with nothing to codegen — a range scan keeps
    // the projection in a real generated stage
    val df = ss.range(0L, 3L)
      .select(col("id"), element_at(
        array(lit("aaaaaaaa"), lit("zzzq"), lit("abcdefgh")),
        (col("id") + 1).cast("int")).as("w"))
      .select(col("id"), graft.functions.TextAnalysis
        .bpeEncodeChain(merges)(col("w")).as("enc"))
    val got = df.collect().sortBy(_.getLong(0)).map(_.getString(1))
    // merge 0 is "aa" -> U+00C0, leftmost non-overlapping: 8 a's
    // fuse to 4 symbols; a word outside the alphabet passes through
    assert(got(0) == "ÀÀÀÀ", got(0))
    assert(got(1) == "zzzq")
    val plan = df.queryExecution.executedPlan
    // typed check, not a toString grep: treeString renders the node
    // as a "*(1)" marker, not by class name
    assert(plan.collectFirst {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, "the 64-merge projection fell out of whole-stage codegen")
    // the compiled stage must also sit under the huge-method limit —
    // past it, WholeStageCodegenExec silently falls back AT RUNTIME
    // even with fallback=false (a different escape hatch)
    import org.apache.spark.sql.execution.debug._
    val hugeLimit =
      ss.conf.get("spark.sql.codegen.hugeMethodLimit").toInt
    for ((_, _, stats) <- codegenStringSeq(plan))
      assert(stats.maxMethodCodeSize < hugeLimit,
        s"generated method ${stats.maxMethodCodeSize} bytes exceeds " +
          s"the $hugeLimit-byte runtime fallback limit")
  }

  test("m8 phash near-dup: plain-JVM replay — banding finds exactly " +
    "the capped Hamming<=3 pairs, and pigeonhole holds") {
    def md5hex(t: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.load(spark, sf, "documents")
      .filter(org.apache.spark.sql.functions.col("text").isNotNull)
      .select("doc_id", "text").collect()
    val vars = scala.collection.mutable.Map.empty[Long, String]
    for (r <- docs) {
      val p = md5hex(r.getString(1)) + md5hex(r.getString(1) + "x")
      vars(r.getLong(0)) = p
      if (r.getLong(0) % 7 == 0)
        vars(-r.getLong(0) - 1L) =
          p.substring(0, 4) + "f" + p.substring(5, 39) + "0" + p.substring(40)
    }
    def bitsOf(p: String): Array[Int] = {
      val nb = p.map(c => Integer.parseInt(c.toString, 16)).toArray
      val tot = nb.sum
      nb.map(n => if (n * 64 > tot) 1 else 0)
    }
    val bits = vars.map { case (d, p) => d -> bitsOf(p) }
    def bands(bs: Array[Int]): Seq[(Int, Int)] =
      (0 until 4).map(j =>
        j -> (0 until 16).map(k => bs(16 * j + k) << k).sum)
    val buckets = scala.collection.mutable
      .Map.empty[(Int, Int), List[Long]].withDefaultValue(Nil)
    for ((d, bs) <- bits; (j, bv) <- bands(bs))
      buckets((j, bv)) = d :: buckets((j, bv))
    def ham(a: Long, b: Long): Int =
      bits(a).zip(bits(b)).count { case (x, y) => x != y }
    val expect = (for {
      (_, ds) <- buckets.toSeq if ds.length <= 64
      a <- ds; b <- ds if a < b
    } yield (a, b)).distinct
      .filter { case (a, b) => ham(a, b) <= 3 }
      .map { case (a, b) => (a, b, ham(a, b).toLong, a == -b - 1L) }
      .sortBy(x => (x._1, x._2))
    // pigeonhole sanity: with NO cap, every Hamming<=3 pair shares a
    // band — the banding itself loses nothing
    val all = bits.keys.toSeq.sorted
    for (i <- all.indices; j <- (i + 1) until all.length
         if ham(all(i), all(j)) <= 3)
      assert(bands(bits(all(i))).toSet
        .intersect(bands(bits(all(j))).toSet).nonEmpty)
    val got = graft.functions.Multimodal.m8PhashNearDup(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
      .sortBy(x => (x._1, x._2)).toSeq
    assert(got == expect)
    assert(got.nonEmpty, "the injected re-encodes must be found")
  }

  test("m9 phash clusters: every re-encode pair lands in ONE cluster " +
    "with the real original canonical; clusters partition the pair " +
    "nodes; drop list keeps exactly one asset per cluster") {
    val pairs = graft.functions.Multimodal.m8PhashNearDup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    val rows = graft.functions.Multimodal.m9PhashClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4)))
    val cluster = rows.map(t => t._1 -> t._2).toMap
    // node set = exactly the docs touched by >= 1 pair
    assert(cluster.keySet ==
      pairs.flatMap(p => Seq(p._1, p._2)).toSet)
    // every mined pair (re-encode or not) is intra-cluster
    for ((a, b, _) <- pairs)
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split across clusters")
    // canonical: per cluster exactly one keeper, and it is the min
    // REAL (non-negative) id when the cluster has one — a synthetic
    // re-encode must never be elected over its original
    val byCluster = rows.groupBy(_._2)
    for ((_, members) <- byCluster) {
      assert(members.count(_._4) == 1, "exactly one canonical per cluster")
      val can = members.find(_._4).get._3
      val reals = members.map(_._1).filter(_ >= 0)
      if (reals.nonEmpty) assert(can == reals.min)
      else assert(can == members.map(_._1).min)
      assert(members.forall(_._3 == can))
      assert(members.forall(_._5 == members.length.toLong))
    }
    // the injected re-encodes exist and collapse: at least one
    // cluster holds a negative (synthetic) member whose canonical is
    // its original
    val reencPairs = pairs.filter(_._3)
    assert(reencPairs.nonEmpty)
    for ((syn, orig, _) <- reencPairs)
      assert(cluster(syn) == cluster(orig) &&
        byCluster(cluster(syn)).find(_._1 == syn).get._3 >= 0)
  }

  test("t24 DSIR: plain-JVM re-derivation of the model and the quota") {
    val B = graft.functions.TextAnalysis.DsirBuckets.toInt
    def h(str: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(str.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    // independent replay: scala collections + MessageDigest, no Spark
    val docs = Tables.load(spark, sf, "documents")
      .select("doc_id", "lang", "source", "text").collect()
    val toks = docs.flatMap { r =>
      val ws = r.getAs[String]("text").split(" ", -1)
      val feats = ws ++ ws.sliding(2).filter(_.length == 2)
        .map(p => p(0) + " " + p(1))
      feats.map(t =>
        (r.getLong(0), r.getString(1), r.getString(2),
          (h("t24|" + t) % B).toInt))
    }
    val cR = toks.groupBy(_._4).map { case (b, xs) => b -> xs.length.toLong }
    val cT = toks.groupBy(_._4).map { case (b, xs) =>
      b -> xs.count(_._2 == "en").toLong }
    val nT = cT.values.sum
    val nR = cR.values.sum
    // the EXACT expression tree of the operator: two IEEE divisions,
    // one subtract, one scale, floor — order matters for bit equality
    val s = cR.keys.map { b =>
      b -> math.floor(
        ((cT(b) + 1L).toDouble / (nT + B).toDouble
          - (cR(b) + 1L).toDouble / (nR + B).toDouble) * 1000000000.0).toLong
    }.toMap
    val expect = toks.groupBy(x => (x._1, x._2, x._3)).toSeq
      .map { case ((id, lang, src), xs) =>
        (id, lang, src, xs.length.toLong, xs.map(x => s(x._4)).sum) }
      .sortBy(x => (-x._5, x._1)).take(150)
    val got = graft.functions.TextAnalysis.t24DsirSelect(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expect)
    // DSIR pulls toward the target: selected docs' mean en-bucket
    // affinity must be non-trivial — every selected score positive
    // would be too strong for a shared vocab, but the top doc must
    // strictly beat the bottom of the quota
    assert(got.head._5 >= got.last._5)
  }

  test("t25 streaming DSIR: the streamed model equals the batch " +
    "model row-for-row, and the state is bounded by B") {
    val streamed = graft.functions.TextAnalysis
      .t25StreamingDsirModel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val batch = graft.functions.TextAnalysis.t24Model(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1).toSeq
    assert(streamed == batch,
      "online model must equal the batch-trained model exactly")
    assert(streamed.nonEmpty &&
      streamed.size <= graft.functions.TextAnalysis.DsirBuckets,
      s"model state must stay bounded by B (${streamed.size})")
  }

  test("t24 DSIR: selection is layout-invariant", SlowTests) {
    import org.apache.spark.sql.functions.col
    val a = graft.functions.TextAnalysis.t24DsirSelect(spark, sf)
    val tmp = java.nio.file.Files.createTempDirectory("graft_t24").toString
    Tables.load(spark, sf, "documents").repartition(13)
      .write.parquet(s"$tmp/documents.parquet")
    val b = graft.functions.TextAnalysis.t24DsirSelect(spark, tmp)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.count() > 0)
    // integer-exact scores: the same doc has the same score bit-for-
    // bit on both layouts (join on doc_id, compare)
    val j = a.alias("x").join(b.alias("y"), Seq("doc_id"))
      .filter(col("x.dsir_score") =!= col("y.dsir_score"))
    assert(j.isEmpty)
  }
}
