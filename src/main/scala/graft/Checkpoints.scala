package graft

import org.apache.spark.sql.{DataFrame, Dataset}

/** Lineage-truncation strategy switch. Every iterative or memoized path
  * in this engine (closure rounds, rank offsets, dedup shingles, session
  * memos, script update steps) truncates lineage so plans do not grow
  * unboundedly. On a single box `localCheckpoint` is the right tool —
  * fast, no filesystem round-trip — but its blocks die with the executor
  * that holds them, so on a real cluster a lost executor would fail the
  * job unrecoverably.
  *
  * Setting `-Dgraft.checkpointDir=<shared-fs-path>` (HDFS/NFS/S3A on a
  * cluster) flips EVERY site to reliable `Dataset.checkpoint`, which
  * persists to that directory and survives executor loss; unset keeps
  * the single-box behavior. One switch, no per-site decisions — the
  * tradeoff (write amplification vs recoverability) is global by nature.
  */
object Checkpoints {

  def reliableDir: Option[String] = sys.props.get("graft.checkpointDir")

  private def ensureDir(ds: Dataset[_], d: String): Unit = {
    val sc = ds.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d)
  }

  implicit final class TruncateOps[T](private val ds: Dataset[T])
      extends AnyVal {
    /** Truncate lineage: `localCheckpoint(eager)` single-box, reliable
      * `checkpoint(eager)` when `graft.checkpointDir` is set.
      */
    def truncateLineage(eager: Boolean = true): Dataset[T] =
      reliableDir match {
        case Some(d) =>
          ensureDir(ds, d)
          if (eager) {
            // cache before checkpointing: the reliable checkpoint writes
            // its files in a second job that would otherwise recompute the
            // full lineage (see truncateRdd); lazy checkpoints skip this —
            // there is no job yet to share the cache with
            ds.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try ds.checkpoint(eager = true)
            finally ds.unpersist(blocking = false)
          } else ds.checkpoint(eager = false)
        case None => ds.localCheckpoint(eager)
      }
  }

  /** RDD-level truncation for plans that reference one source several
    * times (the seminaive `delta ⋈ edges ∖ all` shape trips Spark 4's
    * Dataset.checkpoint attribute mapping — PathOps.materialize): rebuild
    * the frame as a flat scan over a checkpointed RDD with fresh ids.
    */
  def truncateRdd(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    reliableDir match {
      case Some(d) =>
        ensureDir(df, d)
        // persist first: ReliableRDDCheckpointData writes checkpoint files
        // in a SECOND job after the count — without a cached copy that job
        // recomputes the whole lineage, doubling every closure round
        val r = df.rdd
        r.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        r.checkpoint()
        r.count() // materializes the cache AND triggers the checkpoint write
        val out = spark.createDataFrame(r, df.schema)
        r.unpersist(blocking = false) // checkpoint files now back the RDD
        out
      case None =>
        val r = df.rdd.localCheckpoint()
        r.count()
        spark.createDataFrame(r, df.schema)
    }
  }
}
