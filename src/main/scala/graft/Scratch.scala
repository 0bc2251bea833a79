package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only flagship timer (not part of the driver contract).
  * args: cores shufflePartitions [factor]
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = args(0)
    val parts = args(1)
    val factor = args.drop(2).headOption.map(_.toInt).getOrElse(16)
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def flagship(): Long = {
      val t = sources.Transcripts.scaled(spark, sfDir, factor)
      val base = rules.TranscriptRules.triples(t)
      val cc = pipeline.Kg.aliasCc(spark, sfDir)
      val m = linking.Gazetteer.mentions(t, linking.Gazetteer(spark, sfDir))
        .join(broadcast(cc), col("alias_iri") === col("node"))
        .select(
          concat(lit("<http://graft.io/conv/"), col("conv_id"), lit("/turn/"),
            col("turn_idx").cast("string"), lit(">")).as("subj"),
          lit("<http://graft.io/p/mentions>").as("pred"),
          concat(lit("<"), col("component"), lit(">")).as("obj"),
          concat(lit("<http://graft.io/g/"), col("conv_id"), lit(">")).as("graph"))
      base.unionByName(m).distinct().count()
    }
    flagship() // warm
    val t0 = System.nanoTime()
    val n = flagship()
    val el = (System.nanoTime() - t0) / 1e9
    println(f"[flagship] cores=$cpus parts=$parts factor=$factor ${el}%.2fs rows=$n rate=${(n / el).toLong}/s")
    spark.stop()
  }
}
