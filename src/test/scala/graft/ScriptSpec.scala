package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Script
import graft.pipeline.Script.{Query, Update}

class ScriptSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("statement sequence: updates mutate the shared view state in order") {
    val result = Script.run(spark, Seq(
      // LOAD-style: bind the base table
      Update("acc", s => Seq((1, "a"), (2, "b")).toDF("k", "v")),
      // query-over-state, then an update DERIVED FROM the previous state
      Query(s => s.table("acc")),
      Update("acc", s => s.table("acc")
        .unionAll(s.table("acc").select($"k" + 10, upper($"v")))),
      // DELETE-style update
      Update("acc", s => s.table("acc").filter($"k" =!= 2)),
      Query(s => s.table("acc").orderBy("k"))
    )).get
    assert(result.as[(Int, String)].collect().toSeq ===
      Seq((1, "a"), (11, "A"), (12, "B")))
  }

  test("update materializes eagerly: later redefinition cannot change it") {
    Script.run(spark, Seq(
      Update("src", s => Seq(1).toDF("x")),
      Update("snap", s => s.table("src").select($"x" + 1 as "x")),
      Update("src", s => Seq(100).toDF("x")), // must NOT affect snap
      Query(s => s.table("snap"))
    )).get.as[Long].head match {
      case 2 => ()
      case other => fail(s"snapshot leaked through view rebind: $other")
    }
  }

  test("env substitution: substituted text parses, unknown name fails") {
    import graft.rules.ConstructParser
    assert(ConstructParser.envSubst("GRAPH <env:G> {", Map("G" -> "urn:g"))
      === "GRAPH <urn:g> {")
    intercept[IllegalArgumentException](
      ConstructParser.envSubst("<env:MISSING>", Map()))
  }

  test("writeSplit: one independent resumable sink per rule group") {
    import graft.materialize.Materializer
    val out = java.nio.file.Files.createTempDirectory("graft-split").toString
    val a = Seq(("<s1>", "<p>", "\"1\"", "<g1>")).toDF("subj", "pred", "obj", "graph")
    val b = Seq(("<s2>", "<p>", "\"2\"", "<g2>")).toDF("subj", "pred", "obj", "graph")
    Materializer.writeSplit(Map("core" -> a, "mentions" -> b), out, nBuckets = 2)
    val backA = spark.read.parquet(s"$out/core/triples")
    val backB = spark.read.parquet(s"$out/mentions/triples")
    assert(backA.select("subj").as[String].collect().toSeq === Seq("<s1>"))
    assert(backB.select("subj").as[String].collect().toSeq === Seq("<s2>"))
    assert(Materializer.verifyCounts(spark, s"$out/core"))
    intercept[IllegalArgumentException](
      Materializer.writeSplit(Map("../evil" -> a), out))
  }
}
