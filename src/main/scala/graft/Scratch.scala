package graft

import org.apache.spark.sql.SparkSession

/** Dev-only timer: args = query cores parts initialPartitionNum [sfDir] */
object Scratch {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val cores = args(1)
    val parts = args(2)
    val init = args(3)
    val sfDir = args.drop(4).headOption.getOrElse("/root/testdata/sf0.1")
    val b = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (init != "0")
      b.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", init)
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (cold, n0) = once()
    val (el, n) = once()
    println(f"[scratch] q=$q cores=$cores parts=$parts init=$init cold=${cold}%.2fs warm=${el}%.2fs rows=$n")
    spark.stop()
  }
}
