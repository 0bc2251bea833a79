package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: ONE JSON line on stdout
  * `{"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}`.
  *
  * `runMain graft.Bench scaling` additionally measures the flagship KG
  * pipeline at two parallelism levels (local[8] vs local[32], same input)
  * and reports throughput + scaling efficiency — the sandbox stand-in for
  * N→4N executors (BASELINE.json north_rule).
  */
object Bench {

  /** Headline queries: the KG pipeline + one representative per family.
    * `rml_exec` joined in round 6 so the front-end surface (mapping
    * parse → shared-scan fusion → ref-object join) has a regression
    * canary — the r3–r5 battery had gone flat because every addition was
    * off the headline path. `graphql_query` joined in round 7 for the
    * same reason: the remaining front-end family (GraphQL → parent/child
    * join compilation) now has sf0.1 regression visibility too.
    */
  val headline: Seq[String] = Seq(
    "kg_canonical_triples", "kg_triples", "kg_mentions", "kg_graph_stats",
    "ngs_hash", "ngs_filter_even", "sbs_groupby",
    "dedup_exact", "dedup_minhash", "text_quality", "embed_topk",
    "rml_exec", "graphql_query", "sportal_qd_all",
    // r9: the HDT encode→decode loop — binary-source regression canary
    "rdf_hdt_scan")

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-bench-$cpus")
      // partitions = cores + AQE. (Measured: a 4x initialPartitionNum made
      // the multi-shuffle LSH query 10x SLOWER at this scale — more stages
      // x more tiny tasks; plain cores-sized shuffles win.)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      // SPARK_GRAFT_AQE=false isolates AQE's contribution (the salt
      // bench uses it to measure the no-AQE regime)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Run the flagship extraction+linking+dedup over a `factor`-times
    * replicated corpus (compute-bound at any factor>~8 — fixed per-job
    * overhead amortized like on a real cluster), return (sec, rowsOut).
    */
  private def flagship(spark: SparkSession, sfDir: String, factor: Int): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = graft.pipeline.Kg.canonicalTriplesOver(
      graft.sources.Transcripts.scaled(spark, sfDir, factor), spark, sfDir)
      .count()
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    if (args.headOption.contains("scaling")) {
      val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "16").toInt
      val Array(n1, n2) = sys.env.getOrElse("SPARK_GRAFT_SCALE_LEVELS", "8,32")
        .split(",").map(_.trim.toInt)
      val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
      // same input, two parallelism levels; stop the session between runs.
      // best-of-N per level: this box's throughput fluctuates ±50% from
      // external interference, which only ever ADDS time — min is the
      // honest estimate of the job's own cost.
      val results = Seq(n1, n2).map { k =>
        val s = session(k)
        try {
          flagship(s, sfDir, factor) // warm (JIT + codegen)
          val runs = (1 to reps).map(_ => flagship(s, sfDir, factor))
          System.err.println(s"[scaling] local[$k] runs: " +
            runs.map(r => f"${r._1}%.1fs").mkString(", "))
          (runs.map(_._1).min, runs.head._2)
        } finally s.stop()
      }
      val Seq((tLo, rLo), (tHi, rHi)) = results
      require(rLo == rHi, s"row mismatch across parallelism: $rLo vs $rHi")
      val speedup = tLo / tHi
      val efficiency = speedup / (n2.toDouble / n1)
      System.err.println(f"[scaling] rows=$rLo local[$n1]=$tLo%.2fs " +
        f"local[$n2]=$tHi%.2fs speedup=$speedup%.2fx efficiency=$efficiency%.2f")
      println(s"""{"metric":"scaling_efficiency_${n1}_to_$n2","value":$efficiency,"unit":"ratio","queries":{"lo_sec":$tLo,"hi_sec":$tHi,"triples":$rLo,"lo_triples_per_sec":${rLo / tLo},"hi_triples_per_sec":${rHi / tHi}},"sf":"$sfDir"}""")
      return
    }

    if (args.headOption.contains("dedup")) {
      // MinHash-LSH dedup at scale: the ×factor dup corpus (replica
      // texts made DISTINCT so rep-collapse cannot shrink the LSH input)
      // at two parallelism levels (N→4N evidence for the dedup path
      // specifically), plus one run with the bucket cap engaged to show
      // the logged drop and its cost/recall effect.
      import org.apache.spark.sql.functions._
      val factor = sys.env.getOrElse("SPARK_GRAFT_DEDUP_FACTOR", "16").toInt
      val Array(n1, n2) = sys.env.getOrElse("SPARK_GRAFT_SCALE_LEVELS", "2,8")
        .split(",").map(_.trim.toInt)
      val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
      // two replica shapes: `similar = false` inserts a replica marker
      // between EVERY pair of tokens, so replica shingle sets are
      // DISJOINT and pairs grow linearly in factor (the honest scaling
      // workload); `similar = true` only prefixes the text, making every
      // doc a near-dup of its factor−1 siblings — pair count grows
      // QUADRATICALLY in factor, the pathological hot-bucket case the
      // maxBucketSize cap exists for
      def corpus(s: SparkSession, similar: Boolean) = {
        val base = graft.ops.TrainingSuite.dupCorpus(s, sfDir)
        (0 until factor).map { k =>
          val text =
            if (similar) concat(lit(s"r$k "), col("text"))
            else concat_ws(s" x$k ", split(col("text"), " "))
          base.select((col("doc_id") + k.toLong * 10000000L).as("doc_id"),
            text.as("text"))
        }.reduce(_ unionAll _).localCheckpoint(true)
      }
      def run(s: SparkSession, c: org.apache.spark.sql.DataFrame,
          cap: Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = graft.dedup.Dedup.minhashPairs(c, n = 3, threshold = 0.6,
          maxBucketSize = cap).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val results = Seq(n1, n2).map { k =>
        val s = session(k)
        try {
          val c = corpus(s, similar = false)
          run(s, c, Long.MaxValue) // warm
          val runs = (1 to reps).map(_ => run(s, c, Long.MaxValue))
          System.err.println(s"[dedup] local[$k] runs: " +
            runs.map(r => f"${r._1}%.1fs").mkString(", "))
          (runs.map(_._1).min, runs.head._2)
        } finally s.stop()
      }
      val Seq((tLo, pLo), (tHi, pHi)) = results
      require(pLo == pHi, s"pair mismatch across parallelism: $pLo vs $pHi")
      val eff = (tLo / tHi) / (n2.toDouble / n1)
      // cap demo on the PATHOLOGICAL corpus at the high level: uncapped
      // vs capped time + pairs; the drop is LOGGED by minhashPairs
      val cap = sys.env.getOrElse("SPARK_GRAFT_DEDUP_CAP", "16").toLong
      val s2 = session(n2)
      val (tBad, pBad, tCap, pCap) =
        try {
          val c = corpus(s2, similar = true)
          val (tb, pb) = run(s2, c, Long.MaxValue)
          val (tc, pc) = run(s2, c, cap)
          (tb, pb, tc, pc)
        } finally s2.stop()
      System.err.println(
        f"[dedup] pairs=$pLo local[$n1]=$tLo%.2fs local[$n2]=$tHi%.2fs " +
          f"eff=$eff%.2f; pathological corpus: uncapped $tBad%.2fs " +
          f"($pBad pairs) vs cap=$cap $tCap%.2fs ($pCap pairs, " +
          f"recall ${pCap.toDouble / pBad}%.3f)")
      println(s"""{"metric":"dedup_scaling_${n1}_to_$n2","value":$eff,"unit":"ratio","queries":{"lo_sec":$tLo,"hi_sec":$tHi,"pairs":$pLo,"pathological_sec":$tBad,"pathological_pairs":$pBad,"capped_sec":$tCap,"capped_pairs":$pCap,"factor":$factor},"sf":"$sfDir"}""")
      return
    }

    if (args.headOption.contains("path")) {
      // doubling vs seminaive transitive closure on the two canonical
      // shapes: a LONG CHAIN (diameter = n: doubling needs log2 n rounds,
      // seminaive n) and a BUSHY TREE (child→parent edges, diameter =
      // log2 m: seminaive does frontier-sized work per round, doubling
      // re-joins the whole closed set). Winner per shape goes to
      // BASELINE.md; pathPattern keeps doubling as the default (bounded
      // log-diameter rounds — the safe choice when the shape is unknown).
      import org.apache.spark.sql.functions._
      val spark = session(cpus)
      val chainLen = sys.env.getOrElse("SPARK_GRAFT_PATH_CHAIN", "256").toInt
      val treeN = sys.env.getOrElse("SPARK_GRAFT_PATH_TREE", "200000").toInt
      val chain = spark.range(chainLen - 1).select(
        concat(lit("n"), col("id")).as("s"),
        concat(lit("n"), col("id") + 1).as("o"))
        .localCheckpoint(true)
      val tree = spark.range(1, treeN).select(
        concat(lit("t"), col("id")).as("s"),
        concat(lit("t"), expr("id div 2")).as("o"))
        .localCheckpoint(true)
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      // warm both code paths on a tiny graph (codegen compile)
      graft.ops.PathOps.closure(chain.limit(50)).count()
      graft.ops.PathOps.closureSeminaive(chain.limit(50)).count()
      val (cd, cdN) = time(graft.ops.PathOps.closure(chain).count())
      val (cs, csN) = time(graft.ops.PathOps.closureSeminaive(chain).count())
      require(cdN == csN, s"chain closure mismatch: $cdN vs $csN")
      val (td, tdN) = time(graft.ops.PathOps.closure(tree).count())
      val (ts, tsN) = time(graft.ops.PathOps.closureSeminaive(tree).count())
      require(tdN == tsN, s"tree closure mismatch: $tdN vs $tsN")
      System.err.println(
        f"[path] chain($chainLen): doubling=$cd%.1fs seminaive=$cs%.1fs " +
          f"pairs=$cdN; tree($treeN): doubling=$td%.1fs seminaive=$ts%.1fs " +
          f"pairs=$tdN")
      println(s"""{"metric":"path_closure_doubling_vs_seminaive","value":${cd + td},"unit":"sec","queries":{"chain_doubling":$cd,"chain_seminaive":$cs,"chain_pairs":$cdN,"tree_doubling":$td,"tree_seminaive":$ts,"tree_pairs":$tdN},"sf":"synthetic"}""")
      spark.stop()
      return
    }

    if (args.headOption.contains("sportal")) {
      // the sportal battery AS A PIPELINE over a ×factor corpus: the raw
      // qf battery alone is 10 whole-scans where the reference fans ONE
      // publish()ed scan into all subscribers (MainCliVoidGenerator
      // .java:536-555). Two forms at two parallelism levels: naive =
      // every query re-derives the corpus plan (N scans), shared = the
      // corpus is materialized once (localCheckpoint — Spark's publish())
      // and all 16 queries read it. Efficiency reported on the shared
      // form (the scale path).
      val factor = sys.env.getOrElse("SPARK_GRAFT_SPORTAL_FACTOR", "64").toInt
      val Array(n1, n2) = sys.env.getOrElse("SPARK_GRAFT_SCALE_LEVELS", "2,8")
        .split(",").map(_.trim.toInt)
      val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val results = Seq(n1, n2).map { k =>
        val s = session(k)
        try {
          // warm all 16 plan shapes (janino codegen) on a tiny corpus;
          // best-effort like the headline warmup — a missing warmup dir
          // must not abort the measured run
          try graft.rules.Sportal.runBattery(
            graft.sources.SyntheticQuads.sportalScaled(s, "/root/testdata/sf0.001", 2))
          catch { case _: Throwable => }
          val lazyCorpus = graft.sources.SyntheticQuads.sportalScaled(s, sfDir, factor)
          // naive is a demonstration number (16 queries × factor×8
          // re-derived scans — measured 6× slower than shared at factor 4
          // and growing with factor); opt-in via SPARK_GRAFT_SPORTAL_NAIVE
          // so the big-factor scaling run doesn't burn its wall-clock on
          // the known-bad plan. -1 = not measured.
          val naive =
            if (sys.env.get("SPARK_GRAFT_SPORTAL_NAIVE").contains("1"))
              time(graft.rules.Sportal.runBattery(lazyCorpus))
            else -1.0
          // qf fusion over the NON-cached corpus: here each raw query
          // re-derives the input, so 1 derivation vs 8 is the real
          // cold-data tradeoff (the cached comparison below isolates the
          // Expand cost instead)
          val (raw8Cold, fusedCold) =
            if (sys.env.get("SPARK_GRAFT_SPORTAL_NAIVE").contains("1"))
              (time((1 to 8).foreach(i =>
                 graft.rules.Sportal.runRaw(s"qf$i", lazyCorpus).distinct().collect())),
               time(graft.rules.Sportal.fusedQfCounts(lazyCorpus).collect()))
            else (-1.0, -1.0)
          // fixed corpus layout across parallelism levels (a real job
          // reads the same table layout at N and 4N executors); without
          // this the checkpoint inherits the generator's partitioning
          val parts = sys.env.getOrElse("SPARK_GRAFT_SPORTAL_PARTS", "64").toInt
          val corpus = lazyCorpus.repartition(parts).localCheckpoint(true)
          val nTriples = corpus.count()
          val shared = (1 to reps)
            .map(_ => time(graft.rules.Sportal.runBattery(corpus))).min
          // multi-agg fusion: the 8 raw qf global counts as 8 separate
          // queries vs ONE fused aggregation pass (Sportal.fusedQfCounts).
          // collect(), not count(): the outputs are ≤8 rows, and count()
          // would let Catalyst PRUNE the aggregate values entirely (the
          // exploded row count is static) — timing nothing.
          val raw8 = (1 to reps).map(_ => time(
            (1 to 8).foreach(i =>
              graft.rules.Sportal.runRaw(s"qf$i", corpus).distinct().collect()))).min
          val fused = (1 to reps)
            .map(_ => time(graft.rules.Sportal.fusedQfCounts(corpus).collect())).min
          System.err.println(f"[sportal] local[$k] triples=$nTriples " +
            f"naive=$naive%.1fs shared=$shared%.1fs qf_raw8=$raw8%.1fs " +
            f"qf_fused=$fused%.1fs (${raw8 / fused}%.2fx cached)" +
            (if (raw8Cold > 0) f"; cold qf_raw8=$raw8Cold%.1fs " +
              f"qf_fused=$fusedCold%.1fs (${raw8Cold / fusedCold}%.2fx)" else ""))
          (naive, shared, nTriples, raw8, fused)
        } finally s.stop()
      }
      val Seq((nLo, sLo, t1, r8Lo, fLo), (nHi, sHi, t2, r8Hi, fHi)) = results
      require(t1 == t2, s"corpus mismatch across levels: $t1 vs $t2")
      val eff = (sLo / sHi) / (n2.toDouble / n1)
      System.err.println(f"[sportal] shared $n1->$n2 speedup=${sLo / sHi}%.2fx " +
        f"efficiency=$eff%.2f; qf fusion at local[$n2]: ${r8Hi / fHi}%.2fx" +
        (if (nHi > 0) f"; shared-vs-naive at local[$n2]: ${nHi / sHi}%.2fx" else ""))
      println(s"""{"metric":"sportal_battery_shared_scan_efficiency_${n1}_to_$n2","value":$eff,"unit":"ratio","queries":{"naive_lo_sec":$nLo,"shared_lo_sec":$sLo,"naive_hi_sec":$nHi,"shared_hi_sec":$sHi,"qf_raw8_lo_sec":$r8Lo,"qf_fused_lo_sec":$fLo,"qf_raw8_hi_sec":$r8Hi,"qf_fused_hi_sec":$fHi,"triples":$t1,"queries_run":16},"sf":"$sfDir"}""")
      return
    }

    if (args.headOption.contains("trig")) {
      // ONE giant TriG document: sequential wholetext parse vs the
      // chunked document-parallel parse (TrigChunker), same file
      import org.apache.spark.sql.functions._
      val spark = session(cpus)
      val factor = sys.env.getOrElse("SPARK_GRAFT_TRIG_FACTOR", "8").toInt
      val q0 = graft.sources.SyntheticQuads(spark, sfDir).drop("idx")
      val scaled = (0 until factor).map(k =>
        q0.withColumn("graph",
          concat(lit(s"<rep$k-"), expr("substring(graph, 2)")))).reduce(_ union _)
      val dir = java.nio.file.Files.createTempDirectory("graft-trigbench")
      val out = dir.resolve("giant")
      graft.sources.RdfIO.trigLines(scaled).coalesce(1)
        .write.mode("overwrite").text(out.toString)
      val listing = java.nio.file.Files.list(out)
      val file =
        try listing.toArray.map(_.toString).filter(_.endsWith(".txt"))
          .headOption.getOrElse(out.toString) // spark text sink: part-*.txt
        finally listing.close()
      val bytes = new java.io.File(file).length()
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      // warm BOTH code paths (JIT + codegen + page cache) before timing
      graft.sources.RdfIO.readTrig(spark, file).count()
      graft.sources.TrigChunker.readTrigChunked(spark, file,
        minPartitions = cpus).count()
      val (seqT, seqN) = time(graft.sources.RdfIO.readTrig(spark, file).count())
      val (chunkT, chunkN) = time(
        graft.sources.TrigChunker.readTrigChunked(spark, file,
          minPartitions = cpus).count())
      require(seqN == chunkN, s"row mismatch: $seqN vs $chunkN")
      System.err.println(f"[trig] bytes=$bytes quads=$seqN " +
        f"wholetext=$seqT%.1fs chunked=$chunkT%.1fs speedup=${seqT / chunkT}%.2fx")
      println(s"""{"metric":"trig_chunk_speedup","value":${seqT / chunkT},"unit":"x","queries":{"wholetext_sec":$seqT,"chunked_sec":$chunkT,"quads":$seqN,"bytes":$bytes},"sf":"$sfDir"}""")
      spark.stop()
      return
    }

    if (args.headOption.contains("salt")) {
      // SaltedJoin vs plain-shuffle(+AQE) vs broadcast on a PLANTED-SKEW
      // mention join (VERDICT r8 task 4): one "stop-word" surface occurs
      // in `hotFrac` of all turns, the gazetteer is sized past the
      // broadcast cutoff, and all three join forms must return the same
      // count. Broadcast is the truth baseline (and the engine's default
      // while the gazetteer fits); the question measured here is which
      // SHUFFLE form carries the hot key better once it doesn't.
      import org.apache.spark.sql.functions._
      val spark = session(cpus)
      import spark.implicits._
      // Defaults = the regime the strategy is FOR (fact >> dim x buckets,
      // extreme skew). At small volume (2M turns) salting loses ~2x to
      // the dim replication — both regimes recorded in BASELINE.md.
      val turns = sys.env.getOrElse("SPARK_GRAFT_SALT_TURNS", "40000000").toLong
      val gazN = sys.env.getOrElse("SPARK_GRAFT_SALT_GAZ", "2500000").toLong
      val hotPct = sys.env.getOrElse("SPARK_GRAFT_SALT_HOTPCT", "80").toInt
      // every turn is one token so ngramSpans emits exactly one 1-gram;
      // hotPct% carry the hot surface, the rest unique cold tokens
      val t = spark.range(turns).select(
        concat(lit("c"), (col("id") % 1000).cast("string")).as("conv_id"),
        col("id").cast("int").as("turn_idx"),
        when(col("id") % 100 < hotPct, lit("hotword"))
          .otherwise(concat(lit("cold"), col("id").cast("string")))
          .as("text")).localCheckpoint()
      // gazetteer: the hot surface + (gazN-1) cold ones (mostly no match)
      val gaz = spark.range(gazN).select(
        when(col("id") === 0, lit("hotword"))
          .otherwise(concat(lit("cold"), col("id").cast("string")))
          .as("surface"),
        concat(lit("http://graft.io/alias/S"), col("id").cast("string"))
          .as("alias_iri")).localCheckpoint()
      def run(mode: String): (Double, Long) = {
        val buckets = sys.env.getOrElse("SPARK_GRAFT_SALT_BUCKETS", "8")
        mode match {
          case "broadcast" => ()
          case "shuffle" => spark.conf.set("graft.gazetteer.saltBuckets", "1")
          case "salted" => spark.conf.set("graft.gazetteer.saltBuckets", buckets)
        }
        val forced = if (mode == "broadcast") Some(true) else Some(false)
        val t0 = System.nanoTime()
        val n = graft.linking.Gazetteer.mentionsRaw(t, gaz, Seq(1), forced)
          .count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      run("broadcast") // warm JIT/codegen on the cheapest form
      val results = Seq("broadcast", "shuffle", "salted").map(m => m -> run(m))
      val counts = results.map(_._2._2).distinct
      require(counts.size == 1, s"join forms disagree: $results")
      results.foreach { case (m, (s, n)) =>
        System.err.println(f"[salt] $m%-10s $s%7.2fs rows=$n")
      }
      val times = results.toMap
      val speedup = times("shuffle")._1 / times("salted")._1
      val qs = results.map { case (m, (s, _)) => s""""${m}_sec":$s""" }
        .mkString("{", ",", s""","rows":${counts.head},"turns":$turns,"gaz":$gazN,"hot_pct":$hotPct}""")
      println(s"""{"metric":"salted_vs_shuffle_speedup","value":$speedup,"unit":"x","queries":$qs,"sf":"$sfDir"}""")
      spark.stop()
      return
    }

    if (args.headOption.contains("volume")) {
      // The FULL headline battery at ×factor corpus volume (VERDICT r8
      // task 3): the flagship/dedup/sportal paths have ×16–×64 evidence,
      // but the other headline entries had only sf0.1 seconds-scale
      // numbers where fixed overhead dominates. A ×factor copy of the
      // sf dir is materialized once (fact tables replicated with shifted
      // key blocks — every scaled key domain stays contiguous so the
      // transcripts' `doc_id = event_id % n` join keeps full selectivity;
      // dims copied as-is, the realistic scale direction), then the
      // standard battery runs against it: same entries, same dir-shaped
      // API, twice each (run1 = cold incl. per-dir memo builds like the
      // RML fixture write and the flagship shared materialization,
      // run2 = steady state). growth_x = run-vs-sf0.1-single-run ratio;
      // growth/factor ≤ ~1 means the entry scales (sub)linearly in
      // corpus volume. NOTE factor ≤ 20 at sf0.1: dupCorpus's planted-dup
      // id offsets (+100000/+200000) must stay above the scaled doc_id
      // domain (factor × 5000) or replica ids collide with planted dups.
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.DataFrame
      val factor = sys.env.getOrElse("SPARK_GRAFT_VOLUME_FACTOR", "16").toInt
      require(factor <= 20,
        s"SPARK_GRAFT_VOLUME_FACTOR=$factor: above 20 the scaled doc_id " +
          "domain collides with dupCorpus's planted-dup offsets " +
          "(+100000/+200000) and the dedup entries run on a corrupted " +
          "corpus — the NOTE above")
      val volDir = sys.env.getOrElse("SPARK_GRAFT_VOLUME_DIR",
        s"/tmp/graft-volume-${new java.io.File(sfDir).getName}-x$factor")
      val spark = session(cpus)
      val marker = new java.io.File(s"$volDir/_SCALED_OK")
      if (!marker.exists()) {
        def base(t: String) = spark.read.parquet(s"$sfDir/$t.parquet")
        def write(t: String, df: DataFrame): Unit = df
          .repartition(spark.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(s"$volDir/$t.parquet")
        Seq("region", "nation", "supplier", "part", "lineitem")
          .foreach(t => write(t, base(t)))
        val rep = broadcast(spark.range(factor).select(col("id").as("__rep")))
        // key stride = max+1 so replica blocks never overlap; contiguity
        // asserted where a modulo join depends on it (documents)
        def stride(df: DataFrame, key: String, contig: Boolean = false): Long = {
          val r = df.agg(max(col(key)).cast("long"), count(lit(1))).head
          val s = r.getLong(0) + 1
          if (contig) require(s == r.getLong(1),
            s"$key not contiguous: max+1=$s count=${r.getLong(1)}")
          s
        }
        def scaleKeys(t: String, keys: Seq[String], contig: Set[String] = Set(),
            extra: DataFrame => DataFrame = identity): Unit = {
          val df = base(t)
          val strides = keys.map(k => k -> stride(df, k, contig(k))).toMap
          val shifted = keys.foldLeft(df.crossJoin(rep)) { (d, k) =>
            d.withColumn(k,
              (col(k) + col("__rep") * strides(k)).cast(df.schema(k).dataType))
          }
          write(t, extra(shifted).drop("__rep"))
        }
        scaleKeys("events", Seq("event_id", "user_id"))
        // replica doc texts get a distinct suffix: exact-dup groups must
        // NOT grow with factor (rep-collapse would otherwise hand
        // dedup_minhash the ×1 workload back)
        scaleKeys("documents", Seq("doc_id"), contig = Set("doc_id"),
          extra = _.withColumn("text",
            concat(col("text"), lit(" rk"), col("__rep").cast("string"))))
        scaleKeys("embeddings", Seq("vec_id"))
        scaleKeys("orders", Seq("o_orderkey"))
        scaleKeys("customer", Seq("c_custkey"))
        require(marker.createNewFile(), s"marker exists under $volDir")
        System.err.println(s"[volume] wrote x$factor corpus at $volDir")
      }
      // plan-shape warmup at the smallest sf (same as the driver battery)
      headline.foreach { name =>
        try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
        catch { case _: Throwable => }
      }
      def timed(name: String, dir: String): Double = {
        val t0 = System.nanoTime()
        try { SparkEntry.queries(name)(spark, dir).count()
          (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[volume] $name failed: ${e.getMessage}"); -1.0 }
      }
      // no silent caps: rdf_hdt_scan's fixture encode is bounded by
      // HdtIO.MaxWriteTriples (≈738 k distinct triples per ×1 at sf0.1),
      // so at high factors it is EXCLUDED with a log line rather than
      // reported as a runtime failure
      val volumeBattery = headline.filter { name =>
        val keep = name != "rdf_hdt_scan" ||
          factor * 740000L <= graft.sources.HdtIO.MaxWriteTriples
        if (!keep) System.err.println(
          s"[volume] dropping $name: x$factor fixture would exceed " +
            s"HdtIO.MaxWriteTriples=${graft.sources.HdtIO.MaxWriteTriples}")
        keep
      }
      val results = volumeBattery.map { name =>
        val base1 = timed(name, sfDir) // ×1 reference, single-run protocol
        val r1 = timed(name, volDir)
        val r2 = timed(name, volDir)
        val growth = if (base1 > 0 && r1 > 0) r1 / base1 else -1.0
        System.err.println(f"[volume] $name%-22s x1=$base1%6.2fs " +
          f"cold=$r1%7.2fs steady=$r2%7.2fs growth=$growth%5.1fx/$factor")
        (name, base1, r1, r2)
      }
      val qs = results.map { case (n, b, r1, r2) =>
        s""""$n":{"x1_sec":$b,"cold_sec":$r1,"steady_sec":$r2}"""
      }.mkString("{", ",", "}")
      val total = results.map(_._3).filter(_ >= 0).sum
      println(s"""{"metric":"battery_volume_x$factor","value":$total,"unit":"sec","queries":$qs,"sf":"$volDir"}""")
      spark.stop()
      return
    }

    if (args.headOption.contains("hdt")) {
      // HDT decode scaling: a cap-scale (5 M triple) file decoded at two
      // parallelism levels — the zero-shuffle broadcast-decode claim,
      // measured. The fixture encodes once (deterministic synthetic
      // triples: 8-predicate runs per subject, the BitmapTriples shape).
      import org.apache.spark.sql.functions._
      val path = "/tmp/graft-hdt-bench.hdt"
      if (!new java.io.File(path).exists) {
        val s = session(cpus)
        val n = graft.sources.HdtIO.MaxWriteTriples
        // INTEGER division — Column./ is floating-point and would mint 5M
        // fractional single-triple subjects instead of 8-predicate runs
        val df = s.range(n).select(
          concat(lit("<urn:s"), expr("id div 8"), lit(">")).as("subj"),
          concat(lit("<urn:p"), col("id") % 8, lit(">")).as("pred"),
          concat(lit("\"v"), col("id"), lit("\"")).as("obj"))
        graft.sources.HdtIO.writeHdt(df, path)
        s.stop()
        System.err.println(s"[hdt] wrote $n-triple fixture at $path")
      }
      val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
      val times = Seq(2, 8).map { c =>
        val s = session(c)
        try {
          graft.sources.HdtIO.readHdt(s, path).count() // warm (JIT)
          (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            graft.sources.HdtIO.readHdt(s, path).count()
            (System.nanoTime() - t0) / 1e9
          }.min
        } finally s.stop()
      }
      // decompose: every readHdt pays a FIXED driver-side load (file
      // parse + broadcast) before the distributed decode — report both
      // the end-to-end ratio and the decode-only ratio so the fixed cost
      // is visible instead of silently deflating the scaling number
      val loadSec = {
        val t0 = System.nanoTime()
        graft.sources.HdtIO.load(path)
        (System.nanoTime() - t0) / 1e9
      }
      val n = graft.sources.HdtIO.MaxWriteTriples.toDouble
      val eff = (times(0) / times(1)) / 4.0
      val decodeEff =
        ((times(0) - loadSec) / (times(1) - loadSec)) / 4.0
      println(s"""{"metric":"hdt_decode_scaling_2_to_8","value":$eff,""" +
        s""""unit":"ratio","queries":{"lo_sec":${times(0)},""" +
        s""""hi_sec":${times(1)},"fixed_load_sec":$loadSec,""" +
        s""""decode_only_eff":$decodeEff,"triples":${n.toLong},""" +
        s""""lo_triples_per_sec":${n / times(0)},""" +
        s""""hi_triples_per_sec":${n / times(1)}},"sf":"synthetic-5M"}""")
      return
    }

    if (args.headOption.contains("gaz")) {
      // mention-scan cost vs gazetteer size: the token-ngram broadcast
      // hash join must be ~flat in surface count (the build side is a
      // hash map), unlike the O(rows × surfaces) contains-scan it replaced
      import org.apache.spark.sql.functions._
      val spark = session(cpus)
      val t = graft.sources.Transcripts(spark, sfDir).localCheckpoint()
      val real = graft.linking.Gazetteer(spark, sfDir)
      def gazOf(n: Int) = real.unionAll(
        spark.range(n).select(
          concat(lit("ENTITY "), col("id").cast("string")).as("surface"),
          concat(lit("http://graft.io/alias/E"), col("id").cast("string"))
            .as("alias_iri")))
      graft.linking.Gazetteer.mentions(t, gazOf(1000)).count() // warm
      val sizes = Seq(1000, 10000, 100000, 1000000)
      val times = sizes.map { n =>
        val t0 = System.nanoTime()
        graft.linking.Gazetteer.mentions(t, gazOf(n)).count()
        n -> (System.nanoTime() - t0) / 1e9
      }
      val qs = times.map { case (n, s) => s""""surfaces_$n":$s""" }
        .mkString("{", ",", "}")
      val ratio = times.last._2 / times.head._2
      println(s"""{"metric":"gazetteer_scaling_1k_to_1m","value":$ratio,"unit":"time_ratio_x1000_surfaces","queries":$qs,"sf":"$sfDir"}""")
      spark.stop()
      return
    }

    val spark = session(cpus)
    // drift-check knobs: SPARK_GRAFT_BENCH_ONLY=q1,q2 restricts the
    // battery; SPARK_GRAFT_BENCH_REPS=N times each query N times and
    // reports the min (the quiet-window best-of protocol, BASELINE.md).
    // CAVEAT: entries with session memos (kg_canonical_triples' shared
    // materialization, the RML fixtures) return cache hits from rep 2 on
    // — REPS>1 totals are steady-state numbers, NOT comparable to the
    // driver's single-run protocol; use REPS for per-query drift checks
    // of non-memoized entries
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSeq)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt
    val battery = only.getOrElse(headline)
    // warmup at the smallest sf: JIT + janino codegen compile once per plan
    // shape, so the timed runs measure steady-state data throughput
    battery.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => }
    }
    val results = battery.map { name =>
      val runs = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          -1.0 // failure must be visible in the stdout JSON
        }
      }
      if (reps > 1) System.err.println(s"[bench] $name runs: " +
        runs.map(r => f"$r%.2fs").mkString(", "))
      name -> (if (runs.exists(_ < 0)) -1.0 else runs.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
