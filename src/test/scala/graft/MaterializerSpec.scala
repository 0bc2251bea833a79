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

  test("crash-resume: staged buckets are moved, never recomputed; no dups") {
    val triples = Kg.canonicalTriples(spark, TestSpark.sf0001).cache()
    val expectDir = tmp()
    Materializer.write(triples, expectDir, nBuckets = 4)
    val expected = spark.read.parquet(s"$expectDir/triples")

    // hand-build a mid-phase-2 crash state: staging complete (_SUCCESS),
    // bucket 0 moved+marked, bucket 1 moved but UNMARKED (crash between
    // its move and its marker), buckets 2,3 still staged
    val out = tmp()
    Files.writeString(Paths.get(s"$out/_manifest.json"), """{"nBuckets":4}""")
    Materializer.bucketed(triples, 4)
      .sortWithinPartitions(col("bucket"), col("subj"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$out/_staging")
    Files.createDirectories(Paths.get(s"$out/triples"))
    Files.move(Paths.get(s"$out/_staging/bucket=0"), Paths.get(s"$out/triples/bucket=0"))
    Files.write(Paths.get(s"$out/_bucket_0.done"), Array.emptyByteArray)
    Files.move(Paths.get(s"$out/_staging/bucket=1"), Paths.get(s"$out/triples/bucket=1"))

    // resume with a POISONED input — evaluating any row throws, proving
    // phase 1 never recomputes once staging is complete
    val poison = raise_error(lit("phase 1 must not recompute")).cast("string")
    val poisoned = spark.range(1).select(poison.as("subj"), poison.as("pred"),
      poison.as("obj"), poison.as("graph"))
    Materializer.write(poisoned, out, nBuckets = 4, resume = true)

    val back = spark.read.parquet(s"$out/triples")
    assert(back.count() === expected.count())
    assert(back.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(back).count() === 0)
    assert((0 until 4).forall(b => Files.exists(Paths.get(s"$out/_bucket_$b.done"))))
    assert(Materializer.verifyCounts(spark, out))
  }

  test("resume with a different nBuckets fails loudly") {
    val out = tmp()
    val triples = Kg.canonicalTriples(spark, TestSpark.sf0001)
    Materializer.write(triples, out, nBuckets = 4)
    intercept[IllegalArgumentException] {
      Materializer.write(triples, out, nBuckets = 8, resume = true)
    }
  }

  test("readGraph prunes the scan to one bucket directory") {
    val out = tmp()
    val triples = Kg.canonicalTriples(spark, TestSpark.sf0001).cache()
    Materializer.write(triples, out, nBuckets = 8)
    val g = triples.select("graph").head.getString(0)
    val got = Materializer.readGraph(spark, out, g) // nBuckets from manifest
    val expected = triples.filter($"graph" === g)
    assert(got.count() === expected.count())
    assert(got.select(expected.columns.map(col): _*)
      .exceptAll(expected).count() === 0)
    // the bucket predicate constant-folds into a partition filter:
    // exactly ONE bucket=N directory survives pruning
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    val scannedBuckets = got.select(input_file_name()).distinct()
      .as[String].collect().map(_.replaceAll(".*bucket=([0-9]+).*", "$1")).toSet
    assert(scannedBuckets.size === 1, scannedBuckets)
  }

  test("nquads serialization shape") {
    val df = Seq(("<s>", "<p>", "\"o\"", "<g>")).toDF("subj", "pred", "obj", "graph")
    assert(Materializer.toNQuads(df).as[String].head ===
      "<s> <p> \"o\" <g> .")
  }
}
