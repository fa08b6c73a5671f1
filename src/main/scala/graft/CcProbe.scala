package graft

import org.apache.spark.sql.SparkSession

import graft.functions.Dedup

/** Dev diagnostic: time the d3 candidate-pair pipeline and the d6
  * connected-components loop separately (d6 reuses d3's persisted
  * pairs, so its time is the iteration loop alone). Set
  * GRAFT_CC_DEBUG=1 to print per-round label sums / convergence.
  *
  *   sbt "runMain graft.CcProbe [sfDir]"
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    var t0 = System.nanoTime()
    val pairs = Dedup.d3MinhashLsh(spark, d)
    val np = pairs.count()
    println(f"d3 pairs=$np%d  t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val cc = Dedup.d6DupClusters(spark, d)
    val nc = cc.count()
    println(f"d6 rows=$nc%d  t=${(System.nanoTime() - t0) / 1e9}%.2f s (pairs cached)")
    // fast-vs-reliable on the same warmed pair relation — the
    // SCALE.md overhead figure (interleaved so window drift hits
    // both modes evenly)
    for (mode <- Seq("fast", "reliable", "fast", "reliable")) {
      t0 = System.nanoTime()
      val n = Dedup.connectedComponents(pairs,
        reliable = mode == "reliable", edgeCountHint = np).count()
      println(f"cc $mode%-8s rows=$n%d  t=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // `synth` arg: probe the SHUFFLE regime — a deterministic
    // 4M-edge graph over 1M nodes, the CcReliableEdges scale where
    // reliable mode actually engages and the label side is past the
    // broadcast threshold (forced with -1 so the probe doesn't
    // depend on size estimation). This is the regime the bucketed
    // edge layout exists for: per-round joins re-shuffle only the
    // label side. GRAFT_CC_PLAIN_EDGES=1 A/Bs the pre-bucketing
    // hosting.
    if (args.contains("synth")) {
      import org.apache.spark.sql.functions._
      val nNodes = 1000000L
      val synth = spark.range(4000000L).select(
        pmod(hash(col("id")), lit(nNodes)).cast("long").as("doc_a"),
        pmod(hash(col("id") + 7654321L), lit(nNodes)).cast("long")
          .as("doc_b"))
        .filter(col("doc_a") =!= col("doc_b"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val nSynth = synth.count()
      for (mode <- Seq("fast", "reliable", "fast", "reliable")) {
        t0 = System.nanoTime()
        val n = Dedup.connectedComponents(synth, maxIters = 60,
          reliable = mode == "reliable", edgeCountHint = nSynth).count()
        println(f"cc-synth $mode%-8s rows=$n%d  " +
          f"t=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
    spark.stop()
  }
}
