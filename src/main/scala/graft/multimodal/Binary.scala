package graft.multimodal

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `binary` columns + typed metadata, with the decode step STUBBED
  * (deterministic fake — the real decoder libs are not in this container;
  * the Spark-side schema/partitioning/batching is real and tested).
  *
  * At 100 TB the binary column dominates I/O: metadata extraction reads
  * only cheap prefixes (column pruning keeps untouched payload bytes out
  * of later stages), and frame sampling explodes to one row per sampled
  * offset without materializing decoded frames.
  */
object Binary {

  /** Synthesize a deterministic binary payload column from text (stands in
    * for real image/audio bytes; magic prefix marks the fake format).
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload",
      to_binary(concat(lit("47464D31"), // "GFM1" fake magic, hex
        hex(encode(col("text"), "UTF-8"))), lit("hex")))

  /** Metadata extraction: size, magic, stubbed width/height derived
    * deterministically from the payload length (STUB for a real decoder).
    */
  def metadata(withBin: DataFrame): DataFrame =
    withBin.select(col("doc_id"),
      length(col("payload")).cast("long").as("n_bytes"),
      hex(substring(col("payload"), 1, 4)).as("magic"),
      // STUB decode: a real impl calls the codec here
      (pmod(length(col("payload")).cast("long"), lit(640L)) + 1L).as("width"),
      (pmod(length(col("payload")).cast("long"), lit(480L)) + 1L).as("height"))

  /** Frame sampling: one row per sampled byte-offset "frame" (every
    * `stride` bytes), payload bytes untouched — the decode of each frame
    * is the stubbed part; the explode/batch shape is the real plumbing.
    */
  def sampleFrames(withBin: DataFrame, stride: Int): DataFrame =
    withBin.select(col("doc_id"), length(col("payload")).as("len"),
        posexplode(sequence(lit(0),
          greatest(((length(col("payload")) - 1) / stride).cast("int"), lit(0)))))
      .select(col("doc_id"), col("col").cast("long").as("frame_idx"),
        (col("col") * stride).cast("long").as("byte_offset"))
}
