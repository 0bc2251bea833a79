package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime(); val n = f
    println(f"$label: ${(System.nanoTime()-t0)/1e9}%.1fs rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.1"
    def t = sources.Transcripts.scaled(spark, sfDir, 16)
    pipeline.Kg.canonicalTriplesOver(sources.Transcripts.scaled(spark, "/root/testdata/sf0.001", 2), spark, "/root/testdata/sf0.001").count()
    time("scaled_only")(t.count())
    time("base_triples")(rules.TranscriptRules.triples(t).count())
    time("mentionsRaw")(linking.Gazetteer.mentionsRaw(t, linking.Gazetteer(spark, sfDir)).count())
    time("flagship")(pipeline.Kg.canonicalTriplesOver(t, spark, sfDir).count())
    time("flagship2")(pipeline.Kg.canonicalTriplesOver(t, spark, sfDir).count())
    spark.stop()
  }
}
