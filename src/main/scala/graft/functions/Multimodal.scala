package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, and a batched per-partition
  * decode/feature-extract stage.
  *
  * The real decode (image/audio codecs) is STUBBED — the container
  * ships no media libraries — behind [[decodeStub]], a deterministic
  * fake keyed on payload bytes. Everything around it is the real
  * Spark shape: schema, partitioning, batch iteration via
  * `mapPartitions` (the Scala analogue of `mapInPandas` — one
  * iterator per partition so a codec/model loads once per task, not
  * per row), and a typed `Dataset[MediaFeature]` result.
  */
object Multimodal {

  /** Typed metadata riding next to the binary payload. */
  final case class MediaMeta(doc_id: Long, fmt: String, width: Int,
      height: Int, n_bytes: Long)

  final case class MediaRecord(doc_id: Long, fmt: String, width: Int,
      height: Int, payload: Array[Byte])

  final case class MediaFeature(doc_id: Long, fmt: String,
      feat_mean: Double, feat_dim: Int, features: Array[Float])

  /** STUB decode: a real implementation would decode the codec and
    * run feature extraction; this derives a deterministic float vector
    * from payload bytes so the pipeline shape is testable end-to-end.
    */
  def decodeStub(payload: Array[Byte], dim: Int = 8): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      out(i % dim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Synthesize a media-bearing table from `documents`: payload =
    * md5-derived bytes (stand-in for an image blob), metadata derived
    * deterministically from doc_id.
    */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    graft.Tables.load(s, d, "documents").select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, lit("png"))
        .when(col("doc_id") % 3 === 1, lit("jpeg"))
        .otherwise(lit("wav")).as("fmt"),
      (lit(64) + col("doc_id") % 192).cast("int").as("width"),
      (lit(64) + (col("doc_id") * 7) % 192).cast("int").as("height"),
      unhex(concat(md5(col("text")), md5(concat(col("text"), lit("x")))))
        .as("payload"))

  /** Batched decode over partitions: the codec state (here: nothing;
    * in production: a JNI codec / ONNX session) initializes once per
    * partition, then streams the iterator — constant memory, no
    * per-row setup, no driver involvement.
    */
  def extractFeatures(media: DataFrame): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "fmt", "width", "height", "payload")
      .as[MediaRecord]
      .mapPartitions { rows =>
        // per-partition init would go here (codec/model load)
        rows.map { r =>
          val f = decodeStub(r.payload)
          // feat_mean in DOUBLE over payload bytes in byte order —
          // deterministic and engine-reproducible (float32 slot
          // accumulation would diverge from any SQL oracle at ulp
          // scale); equals the mean of the stub's slot sums
          val meanD = r.payload.map(b => (b & 0xff) / 255.0).sum / f.length
          MediaFeature(r.doc_id, r.fmt, meanD, f.length, f)
        }
      }
  }

  // ------------------------------------------------------------- queries

  /** m1: media metadata extraction — binary payload length and header
    * bytes plus typed metadata. (Header bytes compared via the md5 hex
    * prefix: DuckDB 1.0 can't slice BLOBs, so the hex string is the
    * cross-engine form of "first 4 payload bytes".)
    */
  def m1MediaMeta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d).select(
      col("doc_id"), col("fmt"), col("width"), col("height"),
      length(col("payload")).as("n_bytes"),
      substring(hex(col("payload")), 1, 8).as("header_hex"))

  val m1Sql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'png'
      |       WHEN doc_id % 3 = 1 THEN 'jpeg'
      |       ELSE 'wav' END AS fmt,
      |  CAST(64 + doc_id % 192 AS INT) AS width,
      |  CAST(64 + (doc_id * 7) % 192 AS INT) AS height,
      |  octet_length(unhex(md5(text) || md5(text || 'x'))) AS n_bytes,
      |  upper(substr(md5(text), 1, 8)) AS header_hex
      |FROM documents""".stripMargin

  /** m2: batched feature extraction through [[extractFeatures]] —
    * the mapPartitions path itself. The float feature VECTOR stays a
    * stub artifact (pinned by ScalaTest determinism checks), but
    * `feat_mean` is double arithmetic over the payload bytes, which
    * the oracle reproduces byte-for-byte from the hex string (DuckDB
    * 1.0 cannot slice BLOBs, but `substr` on the hex text yields each
    * byte).
    */
  def m2MediaFeatures(s: SparkSession, d: String): DataFrame =
    extractFeatures(mediaTable(s, d))
      .toDF()
      .select(col("doc_id"), col("fmt"), col("feat_dim"),
        round(col("feat_mean"), 4).as("feat_mean_r"))

  val m2Sql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'png'
      |       WHEN doc_id % 3 = 1 THEN 'jpeg'
      |       ELSE 'wav' END AS fmt,
      |  8 AS feat_dim,
      |  round(list_sum(list_transform(range(1, 33),
      |    i -> CAST('0x' || substr(hx, CAST(2*i-1 AS INT), 2) AS INT)
      |         / 255.0)) / 8.0, 4) AS feat_mean_r
      |FROM (SELECT doc_id, md5(text) || md5(text || 'x') AS hx
      |      FROM documents) t""".stripMargin

  /** m3: frame sampling — each media row is treated as a container of
    * `n_frames` frames (metadata-derived; a real video's frame count
    * comes from the demuxer) and up to 5 frames are sampled at
    * UNIFORM temporal stride (frame i·n/k — the standard video
    * keyframe sampling for training pipelines), exploded to one row
    * per sampled frame with a payload-derived frame stub. All
    * arithmetic is integral, all operators codegen'd
    * (sequence/transform/explode); the decode of the sampled frame
    * stays stubbed like m2's.
    */
  def m3FrameSample(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .withColumn("n_frames", (lit(1) + col("doc_id") % 30).cast("int"))
      .withColumn("k", least(lit(5), col("n_frames")))
      .select(col("doc_id"), col("fmt"), col("n_frames"),
        explode(transform(sequence(lit(0), col("k") - 1), i =>
          ((i.cast("long") * col("n_frames")) / col("k")).cast("int")))
          .as("frame_idx"),
        col("payload"))
      .withColumn("frame_hex",
        substring(hex(col("payload")), col("frame_idx") * 2 + 1, lit(6)))
      .drop("payload")

  val m3Sql: String =
    """SELECT doc_id, fmt, n_frames, frame_idx,
      |  substr(hx, frame_idx * 2 + 1, 6) AS frame_hex
      |FROM (
      |  SELECT doc_id, fmt, n_frames,
      |    CAST(unnest(range(0, k)) * n_frames // k AS INT) AS frame_idx,
      |    hx
      |  FROM (
      |    SELECT doc_id,
      |      CASE WHEN doc_id % 3 = 0 THEN 'png'
      |           WHEN doc_id % 3 = 1 THEN 'jpeg'
      |           ELSE 'wav' END AS fmt,
      |      CAST(1 + doc_id % 30 AS INT) AS n_frames,
      |      least(5, CAST(1 + doc_id % 30 AS INT)) AS k,
      |      upper(md5(text) || md5(text || 'x')) AS hx
      |    FROM documents) base) f""".stripMargin

  // ------------------------------------------------------------- registry

  /** m4: exact media dedup — duplicate blobs by BINARY content hash
    * (multimodal corpora carry the same image/audio under many doc
    * ids; the d1 groupBy ladder applies to the binary column
    * unchanged). Emits per-content keeper, copy count and the bytes a
    * dedup pass reclaims. One partial-aggregable groupBy on the
    * content hex — the payload bytes never shuffle, only their hash.
    */
  def m4MediaDedup(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .groupBy(hex(col("payload")).as("content_hex"))
      .agg(min("doc_id").as("keep_id"),
        count(lit(1)).as("n_copies"),
        (max(length(col("payload"))).cast("long") *
          (count(lit(1)) - lit(1L))).as("bytes_saved"))

  val m4Sql: String =
    """SELECT upper(md5(text) || md5(text || 'x')) AS content_hex,
      |  min(doc_id) AS keep_id, count(*) AS n_copies,
      |  CAST(max(octet_length(unhex(md5(text) || md5(text || 'x'))))
      |       * (count(*) - 1) AS BIGINT) AS bytes_saved
      |FROM documents GROUP BY 1""".stripMargin

  final case class ResizePlan(doc_id: Long, fmt: String, width: Int,
      height: Int, target_w: Long, target_h: Long,
      n_bytes_resized: Long, scale_bp: Long)

  /** m5: resize planning + stub execution — the remaining verb of the
    * multimodal quartet (decode m2 / frame-sample m3 / dedup m4 /
    * RESIZE). Aspect-preserving fit into 224×224, never upscaling;
    * the new edge is computed in pure integer round-half-up
    * (`(h·448 + w) div (2w)` = ⌊224·h/w + ½⌋), so both engines agree
    * bit-for-bit with no float division. Runs through the same
    * `mapPartitions` batch stage as m2 (one codec init per
    * partition; the pixel rewrite is the stubbed step — the
    * container ships no codecs), emitting the plan row per media:
    * target dims, resized byte count (RGB), and the megapixel
    * reduction in basis points. At 100 TB this is the map-only
    * pre-pass that sizes the GPU decode batches.
    */
  def m5ResizePlan(s: SparkSession, d: String): DataFrame = {
    val spark = s
    import spark.implicits._
    mediaTable(s, d).select("doc_id", "fmt", "width", "height", "payload")
      .as[MediaRecord]
      .mapPartitions { rows =>
        // per-partition init would go here (codec load)
        rows.map { r =>
          val (w, h) = (r.width.toLong, r.height.toLong)
          val (tw, th) =
            if (math.max(w, h) <= 224) (w, h)
            else if (w >= h) (224L, (h * 448 + w) / (2 * w))
            else ((w * 448 + h) / (2 * h), 224L)
          ResizePlan(r.doc_id, r.fmt, r.width, r.height, tw, th,
            tw * th * 3, tw * th * 10000L / (w * h))
        }
      }.toDF()
  }

  val m5Sql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'png'
      |         WHEN doc_id % 3 = 1 THEN 'jpeg'
      |         ELSE 'wav' END AS fmt,
      |    CAST(64 + doc_id % 192 AS BIGINT) AS w,
      |    CAST(64 + (doc_id * 7) % 192 AS BIGINT) AS h
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, fmt, w, h,
      |    CASE WHEN greatest(w, h) <= 224 THEN w
      |         WHEN w >= h THEN 224
      |         ELSE (w * 448 + h) // (2 * h) END AS target_w,
      |    CASE WHEN greatest(w, h) <= 224 THEN h
      |         WHEN w >= h THEN (h * 448 + w) // (2 * w)
      |         ELSE 224 END AS target_h
      |  FROM m)
      |SELECT doc_id, fmt, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
      |  target_w, target_h,
      |  target_w * target_h * 3 AS n_bytes_resized,
      |  (target_w * target_h * 10000) // (w * h) AS scale_bp
      |FROM p""".stripMargin

  /** Shard byte budget for [[m6ShardPlan]] — small against real
    * webdataset shards (~1 GB) because the synthetic payloads are 32
    * bytes; the arithmetic is budget-independent.
    */
  private val ShardBytes = 4096L

  /** m6: media shard packing — the webdataset/tar sharding pass a
    * multimodal training pipeline runs before the GPU loaders: assign
    * media records, in a deterministic total order, to consecutive
    * byte-budgeted shards, so loaders stream fixed-size archives
    * instead of billions of small objects. A record lands in shard
    * ⌊(cumulative bytes before it) / budget⌋ — the classic
    * next-fit-by-running-sum plan (records larger than a budget get a
    * shard range to themselves; nothing splits). Emits the per-shard
    * manifest: item count, payload bytes, record span, and the
    * format mix.
    *
    * Scale shape: shards are packed WITHIN each format stream (the
    * loaders want modality-homogeneous archives, and it keeps the
    * running sum t9's partitioned-window shape — one keyed window,
    * never a global single-partition sort) plus one partial-
    * aggregable groupBy on (fmt, shard id). The payload bytes
    * themselves never shuffle — the plan works on lengths; the
    * actual tar write would be a partitionBy(fmt, shard) file job.
    */
  def m6ShardPlan(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("fmt").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    mediaTable(s, d)
      .select(col("doc_id"), col("fmt"),
        length(col("payload")).cast("long").as("n_bytes"))
      .withColumn("bytes_before",
        coalesce(sum(col("n_bytes")).over(w), lit(0L)))
      .withColumn("shard_id", (col("bytes_before") / ShardBytes)
        .cast("long"))
      .groupBy(col("fmt"), col("shard_id"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("shard_bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  val m6Sql: String =
    s"""WITH m AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN 'png'
       |         WHEN doc_id % 3 = 1 THEN 'jpeg'
       |         ELSE 'wav' END AS fmt,
       |    CAST(octet_length(unhex(md5(text) || md5(text || 'x')))
       |      AS BIGINT) AS n_bytes
       |  FROM documents),
       |planned AS (
       |  SELECT doc_id, fmt, n_bytes,
       |    CAST(coalesce(sum(n_bytes) OVER (PARTITION BY fmt
       |      ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      // $ShardBytes AS BIGINT) AS shard_id
       |  FROM m)
       |SELECT fmt, shard_id, count(*) AS n_items,
       |  CAST(sum(n_bytes) AS BIGINT) AS shard_bytes,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM planned GROUP BY 1, 2""".stripMargin

  /** The media corpus materialized as REAL FILES on disk, once per
    * (session, input): every m-query so far synthesizes the payload
    * as a column; this is the other half of multimodal reality — the
    * corpus arrives as a directory of blobs. Written by one
    * foreachPartition job (each task writes its rows' files — the
    * fixture-builder side, not the operator under test) into a
    * doc_id-named layout the source can invert.
    */
  private val blobDir: (SparkSession, String) => String =
    Memo.memoizedValue("multimodal.blobDir") { (s, d) =>
      val dir = graft.operators.Migrate.tempDir("m7_blobs")
      val dirB = dir
      mediaTable(s, d).select("doc_id", "fmt", "payload")
        .foreachPartition {
          (rows: Iterator[org.apache.spark.sql.Row]) =>
            rows.foreach { r =>
              java.nio.file.Files.write(
                java.nio.file.Paths.get(dirB,
                  f"doc_${r.getLong(0)}%08d.${r.getString(1)}"),
                r.getAs[Array[Byte]]("payload"))
            }
        }
      dir
    }

  Memo.memoWarmers.put("multimodal.blobDir",
    (s: SparkSession, d: String) =>
      s.read.format("binaryFile").load(blobDir(s, d)).select("length"))

  /** m7: binary-file ingest — Spark's `binaryFile` source reading the
    * media corpus from a DIRECTORY OF BLOBS (how multimodal data
    * actually arrives before anyone curates it), doc ids parsed back
    * out of the file names, content VERIFIED against the metadata
    * table by exact byte comparison. The oracle recomputes the
    * expected bytes closed-form, so the hash gate covers the whole
    * ingest: file naming, source fidelity, and the join back to
    * metadata. Scale note: binaryFile partitions by file, so a
    * billion small blobs is the classic small-file problem — the
    * production shape is this ingest ONCE, then m6's byte-budgeted
    * shard packing so every later epoch streams archives; the
    * lossless-ingest contract m7 pins is what makes that repack safe.
    */
  def m7BinaryIngest(s: SparkSession, d: String): DataFrame = {
    val files = s.read.format("binaryFile").load(blobDir(s, d))
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.", 1)
          .cast("long").as("doc_id"),
        regexp_extract(col("path"), "\\.([a-z]+)$", 1).as("ext"),
        col("length"), col("content"))
    files.join(mediaTable(s, d), Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("ext"), col("fmt"),
        col("length").as("n_bytes"),
        (col("ext") === col("fmt") &&
          hex(col("content")) === hex(col("payload"))).as("lossless"))
  }

  val m7Sql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'png'
      |       WHEN doc_id % 3 = 1 THEN 'jpeg'
      |       ELSE 'wav' END AS ext,
      |  CASE WHEN doc_id % 3 = 0 THEN 'png'
      |       WHEN doc_id % 3 = 1 THEN 'jpeg'
      |       ELSE 'wav' END AS fmt,
      |  CAST(octet_length(unhex(md5(text) || md5(text || 'x')))
      |    AS BIGINT) AS n_bytes,
      |  TRUE AS lossless
      |FROM documents""".stripMargin

  /** m8: perceptual near-duplicate detection — the aHash family
    * (average-hash perceptual fingerprints, the image-dedup staple)
    * over the media payloads, with Hamming-banded pair mining. The
    * stub "decode" reads the payload's 64 hex nibbles as the 8×8
    * grayscale grid a real decoder would produce (m1's discipline:
    * the hex string is the cross-engine form of the bytes); the hash
    * sets bit i iff pixel i exceeds the frame mean (as integers:
    * nibble·64 > Σnibbles — no division, no float). Re-encodes are
    * simulated by perturbing two nibbles of every 7th payload — the
    * "same image, different compression" case exact binary dedup (m4)
    * is blind to. Pairs are mined d4b-style: 4 bands × 16 bits, exact
    * pigeonhole for Hamming ≤ 3 (any closer pair shares at least one
    * full band), hot buckets capped at 64 (d3's bound — a degenerate
    * band value must not quadratically explode the join), then the
    * survivors are verified by exact 64-bit Hamming distance.
    *
    * Scale shape: hashing is one scan-projection; candidates come
    * from a band-value equi-join whose fan-out the cap bounds; the
    * payload bytes never shuffle — only 64-int bit arrays ride the
    * exchange. At 100 TB this is d4b's plan with the SimHash swapped
    * for a perceptual hash.
    */
  /** The perceptual-hash relation (doc_id, 64 bits) — persisted per
    * (session, input): the hashing lineage is two interpreted
    * higher-order lambdas over 64 nibbles per row (CodegenFallback),
    * and m8's plan otherwise re-derives it SIX times (bucket sizes,
    * the cap join, both self-join sides, and the verify arrays) —
    * measured 16 s at sf0.1 against ~1.5 s from the at-rest table.
    * At 100 TB this relation IS the phash index, computed once at
    * ingest by construction (d3's shingle-index discipline).
    *
    * Simulated re-encodes live in the NEGATIVE id namespace
    * (synthetic id = −doc_id − 1): a fixed positive offset collided
    * with real doc_ids once the corpus passed the offset (duplicate
    * ids in the union, is_reencode false positives for real pairs
    * exactly offset apart) — negation can never overlap a
    * non-negative id space at any corpus size.
    */
  private[graft] val phashBits: (SparkSession, String) => DataFrame =
    graft.functions.Memo.memoizedTable("multimodal.phashBits") { (s, d) =>
      val origs = graft.Tables.load(s, d, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          concat(md5(col("text")), md5(concat(col("text"), lit("x"))))
            .as("px"))
      val reenc = origs.filter(col("doc_id") % 7 === 0)
        .select((-col("doc_id") - 1L).as("doc_id"),
          concat(substring(col("px"), 1, 4), lit("f"),
            substring(col("px"), 6, 34), lit("0"),
            substring(col("px"), 41, 24)).as("px"))
      origs.unionByName(reenc)
        .withColumn("tot", expr(
          "aggregate(transform(sequence(1, 64), i -> " +
            "cast(conv(substring(px, i, 1), 16, 10) as int)), 0, " +
            "(acc, x) -> acc + x)"))
        .withColumn("bits", expr(
          "transform(sequence(1, 64), i -> " +
            "IF(cast(conv(substring(px, i, 1), 16, 10) as int) * 64 > tot, " +
            "1, 0))"))
        .select("doc_id", "bits")
    }

  /** The VERIFIED near-dup pair relation (id_a < id_b, exact Hamming
    * ≤ 3) — persisted and memoized per (session, input) because two
    * consumers read it: m8's pair report and m9's cluster fixpoint
    * (the d3-pairs sharing discipline, one level up from
    * [[phashBits]]). At rest this is the pair index a curation
    * decision replays against; the mining (band explode → cap →
    * bucket self-join → exact verify) runs once.
    */
  private[graft] val m8Pairs: (SparkSession, String) => DataFrame =
    graft.functions.Memo.memoizedTable("multimodal.m8Pairs") { (s, d) =>
      val banded = phashBits(s, d)
        .select(col("doc_id"), col("bits"), explode(expr(
          "transform(sequence(0, 3), j -> struct(j AS band, " +
            "aggregate(transform(sequence(1, 16), k -> " +
            "element_at(bits, 16 * j + k) * shiftleft(1, k - 1)), 0, " +
            "(acc, x) -> acc + x) AS bv))")).as("e"))
        .select(col("doc_id"), col("bits"),
          col("e.band").as("band"), col("e.bv").as("bv"))
      val okBuckets = banded.groupBy("band", "bv")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") <= 64).select("band", "bv")
      val capped = banded.join(okBuckets, Seq("band", "bv"))
      val pairs = capped.alias("a").join(capped.alias("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          col("a.bits").as("ba"), col("b.bits").as("bb"))
        .groupBy("id_a", "id_b")
        .agg(first(col("ba")).as("ba"), first(col("bb")).as("bb"))
      pairs
        .withColumn("hamming", expr(
          "aggregate(zip_with(ba, bb, (x, y) -> abs(x - y)), 0, " +
            "(acc, x) -> acc + x)").cast("long"))
        .filter(col("hamming") <= 3)
        .select(col("id_a"), col("id_b"), col("hamming"))
    }

  def m8PhashNearDup(s: SparkSession, d: String): DataFrame =
    m8Pairs(s, d).select(col("id_a"), col("id_b"), col("hamming"),
      // a synthetic re-encode id is −orig − 1 (strictly negative), so
      // in an ordered pair it is always id_a; the pair is a re-encode
      // pair iff id_a is exactly id_b's negation image
      (col("id_a") === -col("id_b") - 1L).as("is_reencode"))

  val m8Sql: String =
    """WITH origs AS (
      |  SELECT doc_id, md5(text) || md5(text || 'x') AS px
      |  FROM documents WHERE text IS NOT NULL),
      |reenc AS (
      |  SELECT -doc_id - 1 AS doc_id,
      |    substr(px,1,4) || 'f' || substr(px,6,34) || '0'
      |      || substr(px,41,24) AS px
      |  FROM origs WHERE doc_id % 7 = 0),
      |v AS (SELECT * FROM origs UNION ALL SELECT * FROM reenc),
      |h AS (SELECT doc_id,
      |   list_transform(range(1,65), i ->
      |     CAST(('0x' || substr(px, CAST(i AS INT), 1)) AS BIGINT)) AS nb
      |  FROM v),
      |bt AS (SELECT doc_id, nb, list_sum(nb) AS tot FROM h),
      |bits AS (SELECT doc_id,
      |   list_transform(range(1,65), i ->
      |     CASE WHEN nb[CAST(i AS INT)] * 64 > tot THEN 1 ELSE 0 END)
      |     AS bits
      |  FROM bt),
      |banded AS (
      |  SELECT doc_id, bits, j AS band,
      |    list_sum(list_transform(range(1,17), k ->
      |      bits[CAST(16*j + k AS INT)] * (1 << CAST(k-1 AS INT)))) AS bv
      |  FROM bits, (SELECT unnest(range(0,4)) AS j)),
      |sizes AS (SELECT band, bv, count(*) AS n FROM banded GROUP BY 1,2),
      |capped AS (SELECT banded.* FROM banded JOIN sizes USING (band, bv)
      |  WHERE n <= 64),
      |pairs AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
      |    a.bits AS ba, b.bits AS bb
      |  FROM capped a JOIN capped b
      |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
      |ham AS (SELECT id_a, id_b,
      |  CAST(list_sum(list_transform(range(1,65), i ->
      |    abs(ba[CAST(i AS INT)] - bb[CAST(i AS INT)]))) AS BIGINT)
      |    AS hamming
      |  FROM pairs)
      |SELECT id_a, id_b, hamming, id_a = -id_b - 1 AS is_reencode
      |FROM ham WHERE hamming <= 3""".stripMargin

  /** m9: perceptual near-dup CLUSTERS — the curation decision m8's
    * pair relation feeds: connected components over the verified
    * Hamming-≤3 pairs (min-label propagation, [[Dedup
    * .connectedComponents]] — the d6 machinery over a different edge
    * relation), then per-cluster canonical election: the keeper is
    * the minimum REAL asset id (synthetic re-encodes live in the
    * negative namespace and must never be elected canonical — a
    * cluster that is all re-encodes of one lost original falls back
    * to its min id). Re-encode chains collapse to ONE canonical
    * asset; `is_canonical` marks the keeper so the downstream drop
    * list is `WHERE NOT is_canonical` (d10's decision shape).
    *
    * The oracle replays the label propagation as a recursive
    * transitive-closure CTE (a completely different algorithm — the
    * d6 cross-check discipline), so the fixpoint itself is
    * hash-gated, not just the pair mining.
    *
    * Scale shape: the pair relation is the at-rest [[m8Pairs]] table
    * (bounded by the band cap); components run label propagation
    * over it — near-dup components are tiny, O(log diameter) rounds,
    * cluster state is (near-dup docs only) — and the election is one
    * partial-aggregable groupBy over that small relation.
    */
  /** The cluster fixpoint is memoized per (session, input) like d6's
    * (iterative multi-job computation, tiny output, shared across
    * bench re-samples); the election re-derives per call from the
    * cached label relation.
    */
  private val m9Labels: (SparkSession, String) => DataFrame =
    graft.functions.Memo.memoized("multimodal.m9Clusters") { (s, d) =>
      // same size-gated fault-tolerance switch as d6: m8Pairs is an
      // at-rest table, so the count reads parquet metadata; past the
      // threshold the fixpoint runs on scratch parquet instead of
      // executor block storage
      val pairs = m8Pairs(s, d).select(col("id_a").as("doc_a"),
        col("id_b").as("doc_b"))
      val nPairs = pairs.count()
      Dedup.connectedComponents(pairs,
        reliable = nPairs > Dedup.CcReliableEdges, edgeCountHint = nPairs)
    }

  def m9PhashClusters(s: SparkSession, d: String): DataFrame = {
    val cc = m9Labels(s, d)
    val elected = cc.groupBy("cluster_id")
      .agg(coalesce(min(when(col("doc_id") >= 0, col("doc_id"))),
          min(col("doc_id"))).as("canonical_id"),
        count(lit(1)).as("cluster_size"))
    cc.join(elected, Seq("cluster_id"))
      .select(col("doc_id"), col("cluster_id"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"),
        col("cluster_size"))
  }

  // composed by concatenation, NOT one stripMargin over the whole
  // string: m8Sql contains a line whose first non-blank char is the
  // || concat operator, and a second stripMargin would eat its first
  // pipe (binder error '|(VARCHAR, VARCHAR)')
  val m9Sql: String =
    s"WITH RECURSIVE m8p AS ($m8Sql),\n" +
      """edges AS (SELECT id_a AS s, id_b AS t FROM m8p
        |          UNION SELECT id_b, id_a FROM m8p),
        |reach(s, t) AS (
        |  SELECT s, t FROM edges
        |  UNION
        |  SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s),
        |lab AS (SELECT s AS doc_id, least(s, min(t)) AS cluster_id
        |        FROM reach GROUP BY s),
        |can AS (SELECT cluster_id,
        |    coalesce(min(CASE WHEN doc_id >= 0 THEN doc_id END),
        |             min(doc_id)) AS canonical_id,
        |    count(*) AS cluster_size
        |  FROM lab GROUP BY 1)
        |SELECT l.doc_id, l.cluster_id, c.canonical_id,
        |  l.doc_id = c.canonical_id AS is_canonical, c.cluster_size
        |FROM lab l JOIN can c USING (cluster_id)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m9_phash_clusters" -> m9PhashClusters,
    "m8_phash_neardup" -> m8PhashNearDup,
    "m7_binary_ingest" -> m7BinaryIngest,
    "m6_shard_plan" -> m6ShardPlan,
    "m5_resize_plan" -> m5ResizePlan,
    "m1_media_meta" -> m1MediaMeta,
    "m2_media_features" -> m2MediaFeatures,
    "m3_frame_sample" -> m3FrameSample,
    "m4_media_dedup" -> m4MediaDedup)

  val oracles: Map[String, String] = Map(
    "m9_phash_clusters" -> m9Sql,
    "m8_phash_neardup" -> m8Sql,
    "m7_binary_ingest" -> m7Sql,
    "m6_shard_plan" -> m6Sql,
    "m5_resize_plan" -> m5Sql,
    "m1_media_meta" -> m1Sql,
    "m2_media_features" -> m2Sql,
    "m3_frame_sample" -> m3Sql,
    "m4_media_dedup" -> m4Sql)
}
