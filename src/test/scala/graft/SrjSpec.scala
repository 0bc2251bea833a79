package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ResultSetIO

class SrjSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("readSrj decodes uri/bnode/plain/lang/typed; unbound and ghost vars are NULL") {
    val doc =
      """{"head":{"vars":["s","o","ghost"]},
        | "results":{"bindings":[
        |   {"s":{"type":"uri","value":"http://ex.org/a"},
        |    "o":{"type":"literal","value":"plain \"q\""}},
        |   {"s":{"type":"bnode","value":"b0"},
        |    "o":{"type":"literal","value":"hallo","xml:lang":"de"}},
        |   {"s":{"type":"uri","value":"http://ex.org/c"},
        |    "o":{"type":"literal","value":"42","datatype":"http://www.w3.org/2001/XMLSchema#integer"}},
        |   {"s":{"type":"uri","value":"http://ex.org/d"}}
        | ]}}""".stripMargin
    val f = java.nio.file.Files.createTempFile("graft", ".srj")
    java.nio.file.Files.writeString(f, doc)
    val df = ResultSetIO.readSrj(spark, f.toString)
    assert(df.columns.sorted.toSeq === Seq("ghost", "o", "s"))
    val rows = df.select("s", "o", "ghost").as[(String, String, String)]
      .collect().toSet
    assert(rows === Set(
      ("<http://ex.org/a>", "\"plain \\\"q\\\"\"", null),
      ("_:b0", "\"hallo\"@de", null),
      ("<http://ex.org/c>", "\"42\"^^<http://www.w3.org/2001/XMLSchema#integer>", null),
      ("<http://ex.org/d>", null, null)))
    // raw-values view: lexical forms only
    val vals = ResultSetIO.readSrjValues(spark, f.toString)
      .select("s", "o").as[(String, String)].collect().toSet
    assert(vals.contains(("b0", "hallo")))
    assert(vals.contains(("http://ex.org/d", null)))
  }
}
