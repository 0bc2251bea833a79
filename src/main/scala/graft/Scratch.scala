package graft

import org.apache.spark.sql.SparkSession

/** Dev-only timer: args = variant(fused|joined) cores [factor] */
object Scratch {
  def main(args: Array[String]): Unit = {
    val variant = args(0)
    val cores = args(1)
    val factor = args.drop(2).headOption.map(_.toInt).getOrElse(16)
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(): (Double, Long) = {
      val t = sources.Transcripts.scaled(spark, sfDir, factor)
      val df = if (variant == "fused")
        pipeline.Kg.canonicalTriplesOver(t, spark, sfDir)
      else {
        import org.apache.spark.sql.functions._
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
        base.unionByName(m).distinct()
      }
      val t0 = System.nanoTime()
      val n = df.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val (cold, _) = once()
    val (warm, n) = once()
    println(f"[flag] variant=$variant cores=$cores factor=$factor cold=$cold%.2fs warm=$warm%.2fs rows=$n")
    spark.stop()
  }
}
