package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming re-expression of the reference's stream model
  * (`ngs`/`sbs` process RxJava flowables of graphs/bindings —
  * NgsCmdImpls.java:72-81): `readStream` sources, watermarked windowed
  * aggregation, and custom per-key state via `flatMapGroupsWithState`.
  * Every transform here is the streaming twin of a batch operator in this
  * repo, so results are testable against the batch path on a bounded
  * stream (`Trigger.AvailableNow`).
  */
object StreamOps {

  /** Streaming N-Quads text source → (graph, subj, pred, obj): the
    * line-splittable scan of [[graft.sources.RdfIO.readNQuads]] lifted to
    * `readStream` (new files in `dir` become micro-batches; malformed
    * lines drop like the batch reader).
    */
  def readNQuadsStream(spark: SparkSession, dir: String,
      defaultGraph: String = "<urn:x-arq:DefaultGraph>"): DataFrame = {
    import spark.implicits._
    spark.readStream.text(dir).as[String]
      .flatMap { line =>
        val t = graft.sources.RdfIO.parseLine(line)
        if (t == null) None
        else Some((if (t.length == 4) t(3) else defaultGraph, t(0), t(1), t(2)))
      }
      .toDF("graph", "subj", "pred", "obj")
  }

  /** Watermarked event-time window aggregation: per-role turn counts per
    * window — the streaming form of the batch `groupBy(window, role)`
    * (late data beyond the watermark is dropped, state is bounded).
    */
  def roleCountsWindowed(transcripts: DataFrame,
      window_ : String = "1 day", watermark: String = "1 hour"): DataFrame =
    transcripts
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("role"))
      .count()

  /** Event-time windowed aggregation over a STREAMING quad source: turns
    * per UTC day, event time taken from each turn's `p:ts` triple (an
    * epoch-micros xsd:long literal). Watermark bounds state; the batch
    * twin is a plain `groupBy(window(ts))` with identical results.
    */
  def tsWindowCounts(quads: DataFrame): DataFrame =
    quads.where(col("pred") === "<http://graft.io/p/ts>")
      // nullif guards ANSI mode: a malformed p:ts literal makes
      // regexp_extract yield "" and a bare cast would throw, killing the
      // stream — NULL ts rows drop at the window instead (matches
      // numTermVal's batch-side handling)
      .withColumn("ts",
        timestamp_micros(nullif(
          regexp_extract(col("obj"), "^\"(\\d+)\"", 1), lit("")).cast("long")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("window_start_us"), col("n"))

  /** Drain a BOUNDED stream (`Trigger.AvailableNow`: all available input,
    * then stop) into a memory sink and return the result table — the
    * shared scaffolding of every CORRECTNESS-gate streaming entry.
    */
  private def runToMemorySink(df: DataFrame, prefix: String, dir: String,
      mode: OutputMode): DataFrame = {
    val spark = df.sparkSession
    val ckptPath = java.nio.file.Files
      .createTempDirectory("graft-stream-ckpt")
    // per-invocation nonce: repeated runs in one session must not silently
    // overwrite each other's memory-sink table
    val name = prefix +
      java.lang.Long.toHexString(dir.hashCode.toLong & 0xffffffffL) +
      "_" + nonce.getAndIncrement()
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(mode)
      .option("checkpointLocation", ckptPath.toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // AvailableNow is done here — the checkpoint has no further use;
    // delete it instead of accumulating one temp dir per invocation
    deleteRecursively(ckptPath)
    spark.table(name)
  }

  private val nonce = new java.util.concurrent.atomic.AtomicLong(0L)

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      // walk holds directory handles — close it or leak an fd per call
      val all = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      all.foreach(f => try java.nio.file.Files.deleteIfExists(f) catch {
        case _: java.io.IOException => () // best-effort cleanup
      })
    }
  }

  /** [[tsWindowCounts]] over an N-Quads directory as a bounded stream —
    * complete mode emits every window; same oracle SQL as the batch twin.
    */
  def runTsWindowCounts(spark: SparkSession, dir: String): DataFrame =
    runToMemorySink(tsWindowCounts(readNQuadsStream(spark, dir)),
      "graft_stream_win_", dir, OutputMode.Complete)

  /** Streaming exact dedup: `dropDuplicates` over the quad key on a
    * bounded N-Quads stream (append mode — each distinct quad emits
    * exactly once; on an unbounded stream pair it with a watermark via
    * `dropDuplicatesWithinWatermark` to bound state). Batch twin:
    * `SELECT DISTINCT` over the same quads.
    */
  def runDedupQuads(spark: SparkSession, dir: String): DataFrame =
    runToMemorySink(
      readNQuadsStream(spark, dir)
        .dropDuplicates("graph", "subj", "pred", "obj"),
      "graft_stream_dedup_", dir, OutputMode.Append)

  /** Custom running state (SURVEY §2.9 / the reference's per-record
    * accumulation): running turn count per conversation, emitted on every
    * update — `flatMapGroupsWithState` keeps one Long per key, so state
    * size is #conversations, not #turns.
    */
  def runningTurnCounts(spark: SparkSession, transcripts: DataFrame): DataFrame = {
    import spark.implicits._
    transcripts.select(col("conv_id").cast("string")).as[String]
      .groupByKey(identity)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (conv: String, turns: Iterator[String], state: GroupState[Long]) => {
          val c = state.getOption.getOrElse(0L) + turns.size
          state.update(c)
          Iterator((conv, c))
        })
      .toDF("conv_id", "n_turns")
  }
}
