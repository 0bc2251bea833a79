package graft.materialize

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Graph materializer: deduplicated triples written as named-graph-bucketed
  * parquet with per-partition lineage metrics and resumable checkpoints.
  *
  * Reference semantics: quad sink + atomic tmp-file move
  * (SparqlIntegrateCmdImpls.java:303-325,894-896) and DISTINCT triple
  * output (CmdRml2Exec.java:72). Spark-first re-expression:
  *
  *  - named-graph partitions: graph cardinality is unbounded (one per
  *    conversation), so the partition column is a stable HASH BUCKET of
  *    the graph IRI (`pmod(xxhash64(graph), nBuckets)`) — bounded
  *    directory fan-out at any scale, co-locates each graph in one bucket.
  *  - dedup: `distinct()` over (graph, subj, pred, obj) — one shuffle,
  *    partial aggregation map-side.
  *  - resumability: each bucket is written independently; a done-marker
  *    (`_bucket_N.done`) records completion, and a resumed run skips
  *    completed buckets. Every stage is a pure function of input, so a
  *    retried bucket reproduces identical bytes (determinism under
  *    retries — SURVEY.md §7.2.7).
  *  - lineage/metrics: a `_metrics` table with per-bucket triple counts +
  *    distinct graphs, written after data, read back by `verifyCounts`.
  */
object Materializer {

  def bucketed(triples: DataFrame, nBuckets: Int): DataFrame =
    triples.distinct()
      .withColumn("bucket", pmod(xxhash64(col("graph")), lit(nBuckets)).cast("int"))

  /** Write all buckets (optionally resuming), then the metrics table. */
  def write(triples: DataFrame, outDir: String, nBuckets: Int = 64,
      resume: Boolean = false): Unit = {
    val spark = triples.sparkSession
    val data = bucketed(triples, nBuckets)
    Files.createDirectories(Paths.get(outDir))
    val done = (0 until nBuckets)
      .filter(b => Files.exists(Paths.get(s"$outDir/_bucket_$b.done"))).toSet
    if (resume) {
      // resume soundness: a crash can leave bucket data committed but
      // unmarked (the data job commits before the marker loop runs), so
      // re-appending would duplicate rows. Wipe every UNMARKED bucket dir
      // first — marked buckets are skipped, unmarked ones are rebuilt
      // from scratch; the rebuild is byte-identical (pure function of
      // input), so the operation is idempotent.
      (0 until nBuckets).filterNot(done).foreach { b =>
        val dir = Paths.get(s"$outDir/triples/bucket=$b")
        if (Files.exists(dir))
          Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.delete(p))
      }
    }
    val todo = if (resume) data.filter(!col("bucket").isin(done.toSeq: _*))
               else data
    // subject-clustered layout inside each bucket: parquet min/max stats
    // on subj then prune star-join scans (the reference's sorted-ntriples
    // binary-search idea — SansaQueryRewrite.java:4-7 — done storage-side)
    todo.sortWithinPartitions(col("bucket"), col("subj"))
      .write.mode(if (resume) SaveMode.Append else SaveMode.Overwrite)
      .partitionBy("bucket").parquet(s"$outDir/triples")
    // marker per completed bucket (driver-side, after the job commits)
    (0 until nBuckets).foreach { b =>
      Files.write(Paths.get(s"$outDir/_bucket_$b.done"), Array.emptyByteArray)
    }
    val metrics = spark.read.parquet(s"$outDir/triples")
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_triples"),
        countDistinct(col("graph")).as("n_graphs"))
    metrics.write.mode(SaveMode.Overwrite).parquet(s"$outDir/_metrics")
  }

  /** Lineage check: metrics table totals must equal the data itself. */
  def verifyCounts(spark: SparkSession, outDir: String): Boolean = {
    val data = spark.read.parquet(s"$outDir/triples")
    val m = spark.read.parquet(s"$outDir/_metrics")
    val total = m.agg(sum("n_triples")).head.getLong(0)
    total == data.count()
  }

  /** Serialize a triple DF to N-Quads lines (quad sink equivalent). */
  def toNQuads(triples: DataFrame): DataFrame =
    triples.select(concat_ws(" ", col("subj"), col("pred"), col("obj"),
      col("graph"), lit(".")).as("line"))
}
