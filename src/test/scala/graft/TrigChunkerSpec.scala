package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{RdfIO, TrigChunker}

/** Document-parallel TriG: the chunked parse must produce the same quads
  * as the sequential wholetext parse (up to the arbitrary fresh labels of
  * anonymous bnodes, which are document-scoped per RDF semantics), while
  * actually splitting one document into multiple independent chunks.
  */
class TrigChunkerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val GenLabel = "^_:(?:gen|c\\d+g)\\d+$".r

  /** Relabel generated anon-bnode labels by first occurrence in row order
    * (both parse modes emit quads in document order, so the canonical
    * sequences agree iff the quad structures agree).
    */
  private def canon(rows: Seq[(String, String, String, String)])
      : Seq[(String, String, String, String)] = {
    val m = scala.collection.mutable.HashMap.empty[String, String]
    def c(t: String): String =
      if (GenLabel.matches(t)) m.getOrElseUpdate(t, "_:canon" + m.size) else t
    rows.map { case (g, s, p, o) => (g, c(s), p, c(o)) }
  }

  private def collectQuads(df: org.apache.spark.sql.DataFrame) =
    df.collect().toSeq.map(r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))

  private def tmp(name: String): String =
    sys.props("java.io.tmpdir") + "/graft_chunk_" + name

  test("chunked parse of the nation fixture equals wholetext, >1 chunk") {
    val path = tmp("fixture.trig")
    RdfIO.writeTrigFixture(spark, TestSpark.sf0001, path)
    val plan = TrigChunker.planFor(spark, path, minPartitions = 8)
    assert(plan.isDefined, "fixture must be chunk-safe")
    assert(plan.get._1 >= 2, s"expected >=2 chunks, got ${plan.get._1}")
    assert(plan.get._2.contains("@prefix ex:"))
    // the zero-shuffle strategy must engage (bulk text stays in place;
    // only small head fragments move)
    assert(TrigChunker.strategyFor(spark, path, minPartitions = 8) === "assembly")
    val whole = canon(collectQuads(RdfIO.readTrig(spark, path)))
    val chunked = canon(collectQuads(
      TrigChunker.readTrigChunked(spark, path, minPartitions = 8)))
    assert(chunked.sorted === whole.sorted)
    assert(whole.nonEmpty)
  }

  test("long literals spanning lines survive mid-literal splits") {
    val doc = new StringBuilder("@prefix ex: <http://ex.org/> .\n")
    (0 until 40).foreach { k =>
      doc.append(s"""ex:s$k ex:body \"\"\"line one of $k
        |line two has { braces } and a dot .
        |line three 'quotes' and # no comment
        |\"\"\" ; ex:n $k .
        |""".stripMargin)
    }
    val path = tmp("long.trig")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), doc.toString)
    val plan = TrigChunker.planFor(spark, path, minPartitions = 10)
    assert(plan.isDefined && plan.get._1 >= 2)
    val whole = canon(collectQuads(RdfIO.readTrig(spark, path)))
    val chunked = canon(collectQuads(
      TrigChunker.readTrigChunked(spark, path, minPartitions = 10)))
    assert(chunked.sorted === whole.sorted)
    assert(whole.size === 80)
  }

  test("graph blocks with `}` and a lone `.` terminator line stay whole") {
    // `}` followed by a statement-final `.` on its own line: the `.` line
    // belongs to the same statement, so no boundary may fall between them
    val doc = new StringBuilder("@prefix ex: <http://ex.org/> .\n")
    (0 until 30).foreach { k =>
      doc.append(s"ex:g$k {\n  ex:a$k ex:p ex:b$k .\n}\n.\n")
    }
    val path = tmp("dotline.trig")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), doc.toString)
    val whole = canon(collectQuads(RdfIO.readTrig(spark, path)))
    val chunked = canon(collectQuads(
      TrigChunker.readTrigChunked(spark, path, minPartitions = 8)))
    assert(chunked.sorted === whole.sorted)
    assert(whole.size === 30)
  }

  test("directives after data force the sequential fallback") {
    val doc =
      """@prefix ex: <http://ex.org/> .
        |ex:a ex:p ex:b .
        |@prefix ox: <http://ox.org/> .
        |ox:c ox:q ox:d .
        |""".stripMargin
    val path = tmp("middir.trig")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), doc)
    assert(TrigChunker.planFor(spark, path, minPartitions = 4).isEmpty)
    // the fallback still parses correctly
    val got = collectQuads(TrigChunker.readTrigChunked(spark, path, minPartitions = 4))
    assert(got.size === 2)
  }

  test("document ending inside an unterminated block is not chunk-safe") {
    val doc = "@prefix ex: <http://ex.org/> .\nex:g { ex:a ex:p ex:b .\n"
    val path = tmp("unterm.trig")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), doc)
    assert(TrigChunker.planFor(spark, path, minPartitions = 2).isEmpty)
    intercept[Exception] { // fallback = wholetext parse, which fails loudly
      TrigChunker.readTrigChunked(spark, path, minPartitions = 2).collect()
    }
  }

  test("property: random documents parse identically under any split") {
    def randomDoc(seed: Long): String = {
      val r = new scala.util.Random(seed)
      val sb = new StringBuilder(
        "@prefix ex: <http://ex.org/> .\n" +
          "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n\n")
      val n = 30 + r.nextInt(40)
      (0 until n).foreach { k =>
        r.nextInt(8) match {
          case 0 => sb.append(s"ex:s$k ex:p ex:o$k .\n")
          case 1 => sb.append(s"ex:s$k ex:p \"v$k\" ;\n  ex:q $k , true .\n")
          case 2 => sb.append(
            s"ex:g$k {\n  ex:a$k ex:p \"x{y}.z\" .\n  ex:b$k ex:q ex:a$k\n}\n")
          case 3 => sb.append("ex:s" + k +
            " ex:long \"\"\"line1 .\nline { 2 }\n'quote' # not a comment\n\"\"\" .\n")
          case 4 => sb.append(s"ex:s$k ex:esc \"q\\\"q \\\\ t\\tend\" .\n")
          case 5 => sb.append(
            s"ex:s$k ex:meta [ ex:rank $k ; ex:tags (\"a\" \"b\") ] .\n")
          case 6 => sb.append(s"# comment $k with {{ brace . }\n\n")
          case 7 => sb.append(s"GRAPH ex:h$k { ex:x$k a ex:T }\n")
        }
      }
      sb.toString
    }
    var assemblies = 0
    (1 to 10).foreach { seed =>
      val path = tmp(s"prop$seed.trig")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
        randomDoc(seed))
      val whole = canon(collectQuads(RdfIO.readTrig(spark, path)))
      Seq(3, 9).foreach { parts =>
        if (TrigChunker.strategyFor(spark, path, parts) == "assembly")
          assemblies += 1
        val chunked = canon(collectQuads(
          TrigChunker.readTrigChunked(spark, path, minPartitions = parts)))
        assert(chunked.sorted === whole.sorted, s"seed=$seed parts=$parts")
      }
    }
    assert(assemblies >= 10, s"assembly strategy should dominate: $assemblies/20")
  }

  test("anonymous bnode labels never collide across chunks") {
    val doc = new StringBuilder("@prefix ex: <http://ex.org/> .\n")
    (0 until 40).foreach(k => doc.append(s"ex:s$k ex:meta [ ex:rank $k ] .\n"))
    val path = tmp("anon.trig")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), doc.toString)
    val df = TrigChunker.readTrigChunked(spark, path, minPartitions = 8)
    val labels = collectQuads(df).collect {
      case (_, s, _, _) if s.startsWith("_:") => s
    }
    assert(labels.size === 40)
    assert(labels.distinct.size === 40, "fresh labels must be chunk-unique")
  }

  test("backslash outside literals (PN_LOCAL escape) is unsafe, never a boundary") {
    // `ex:obj\.` — without the guard the trailing `\.` would be scored as
    // a statement end and a chunk boundary could split the statement
    val fx = TrigChunker.scanLine("ex:s ex:p ex:obj\\.", 0)
    assert(fx.unsafe, "PN_LOCAL escape line must be unsafe")
    // inside a literal a backslash stays a normal escape (safe)
    val ok = TrigChunker.scanLine("""ex:s ex:p "a\"b" .""", 0)
    assert(!ok.unsafe && ok.endsStatement)
  }

  test("gz input routes straight to wholetext (no single-chunk planning)") {
    val plain = tmp("gzfix.trig")
    RdfIO.writeTrigFixture(spark, TestSpark.sf0001, plain)
    val gz = tmp("gzfix.trig.gz")
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(plain))
    val out = new java.util.zip.GZIPOutputStream(
      java.nio.file.Files.newOutputStream(java.nio.file.Paths.get(gz)))
    try in.transferTo(out) finally { in.close(); out.close() }
    assert(TrigChunker.strategyFor(spark, gz) === "wholetext-gz")
    // and the parse still works through the Hadoop codec, same quads
    val whole = canon(collectQuads(RdfIO.readTrig(spark, plain)))
    val viaGz = canon(collectQuads(TrigChunker.readTrigChunked(spark, gz)))
    assert(viaGz.sorted === whole.sorted)
  }
}
