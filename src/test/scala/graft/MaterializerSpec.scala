package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.materialize.Materializer
import graft.pipeline.Kg
import java.nio.file.{Files, Paths}

class MaterializerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-mat").toString

  test("write dedups, buckets cover all graphs, metrics match data") {
    val out = tmp()
    val triples = Kg.canonicalTriples(spark, TestSpark.sf0001)
    // inject duplicates — materializer must collapse them
    Materializer.write(triples.unionAll(triples.limit(500)), out, nBuckets = 8)
    val back = spark.read.parquet(s"$out/triples")
    assert(back.count() === triples.distinct().count())
    assert(back.select("bucket").distinct().count() <= 8)
    assert(Materializer.verifyCounts(spark, out))
    // deterministic under rewrite (retry-safety)
    val out2 = tmp()
    Materializer.write(triples, out2, nBuckets = 8)
    val back2 = spark.read.parquet(s"$out2/triples")
    assert(back.exceptAll(back2).count() === 0)
    assert(back2.exceptAll(back).count() === 0)
  }

  test("resume skips completed buckets") {
    val out = tmp()
    val triples = Kg.canonicalTriples(spark, TestSpark.sf0001).cache()
    Materializer.write(triples, out, nBuckets = 4)
    val full = spark.read.parquet(s"$out/triples").count()
    // simulate a partial failure: bucket 2 lost its marker and data
    Files.delete(Paths.get(s"$out/_bucket_2.done"))
    val lost = spark.read.parquet(s"$out/triples")
      .filter($"bucket" === 2).count()
    assert(lost > 0)
    // wipe bucket 2's directory
    val dir = Paths.get(s"$out/triples/bucket=2")
    Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    assert(spark.read.parquet(s"$out/triples").count() === full - lost)
    Materializer.write(triples, out, nBuckets = 4, resume = true)
    assert(spark.read.parquet(s"$out/triples").count() === full)
    assert(Materializer.verifyCounts(spark, out))
  }

  test("nquads serialization shape") {
    val df = Seq(("<s>", "<p>", "\"o\"", "<g>")).toDF("subj", "pred", "obj", "graph")
    assert(Materializer.toNQuads(df).as[String].head ===
      "<s> <p> \"o\" <g> .")
  }
}
