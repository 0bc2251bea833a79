package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.rules.ConstructParser

/** The last stray reference scripts run VERBATIM (round-8 conformance
  * tail — VERDICT r7 task 3):
  *
  *  - `fix-geom.sparql` (test resource; pure REPLACE/STRDT polygon fix)
  *  - `unsorted-tests/sorted-service.sparql` (binsearch file-SERVICE
  *    over a machine-specific path → `graft.fileAliases`)
  *  - `unsorted-tests/service-test-all-triples.sparql` (INSERT from a
  *    UNION of file SERVICEs, each a default/GRAPH UNION)
  *  - `docs/examples/test3.sparql` (`FROM <file:///home/raven/…>` →
  *    `graft.fileAliases`)
  *
  * The two /home/raven paths point at files that are NOT in the
  * reference repo, so their fixture content here is ours (tiny,
  * deterministic, shaped after what the query expects); the query TEXTS
  * are byte-for-byte upstream.
  */
class StrayScriptsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // the one shared classpath loader (RelationalSuite) — no second copy
  private def res(dir: String, name: String): String =
    graft.ops.RelationalSuite.refResource(name, dir)

  private def withProp[A](key: String, value: String)(f: => A): A = {
    val old = sys.props.get(key)
    sys.props(key) = value
    try f
    finally old match {
      case Some(v) => sys.props(key) = v
      case None => sys.props.remove(key)
    }
  }

  test("fix-geom.sparql verbatim: REPLACE/STRDT closes the polygon ring") {
    // the script uses geo: undeclared — the reference parses under
    // Jena's well-known prefix map; geo = the GeoSPARQL namespace
    val q = "PREFIX geo: <http://www.opengis.net/ont/geosparql#>\n" +
      res("reference", "fix-geom.sparql")
    val out = ConstructParser.parseSelect(q)
      .run(ConstructParser.unitFrame(spark)).collect()
    assert(out.length === 1)
    val first = "11.118292808532715 46.069896058164055"
    val second = "11.118561029434204 46.069352683251914"
    assert(out.head.getAs[String]("x") === s"POLYGON(($first, $second))")
    // the one-liner re-appends the FIRST point before the closing )) —
    // a closed ring — and types the result as geo:wktLiteral
    assert(out.head.getAs[String]("oneLiner") ===
      s""""POLYGON(($first, $second, $first))"""" +
        "^^<http://www.opengis.net/ont/geosparql#wktLiteral>")
  }

  test("sorted-service.sparql verbatim: binsearch file-SERVICE via fileAliases") {
    val lsq = "http://lsq.aksw.org/res/le-swdf-q-db01d0b8-02016-29-18_04:29:53-tp-1"
    val dir = java.nio.file.Files.createTempDirectory("graft_lsq")
    // stand-in for the machine-local deleteme.sorted.nt: the queried
    // subject plus a decoy, subject-sorted like a binsearch endpoint file
    java.nio.file.Files.writeString(dir.resolve("deleteme.sorted.nt"),
      s"""<http://lsq.aksw.org/res/other> <http://ex.org/p> "decoy" .
         |<$lsq> <http://ex.org/hits> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
         |<$lsq> <http://ex.org/text> "select ..." .
         |""".stripMargin)
    withProp("graft.fileAliases", s"/home/raven/Projects/Data/LSQ=$dir") {
      val out = ConstructParser.parseSelect(res("unsorted", "sorted-service.sparql"))
        .run(ConstructParser.unitFrame(spark)).collect()
        .map(r => (r.getAs[String]("p"), r.getAs[String]("o"))).toSet
      assert(out === Set(
        "<http://ex.org/hits>" ->
          "\"42\"^^<http://www.w3.org/2001/XMLSchema#integer>",
        "<http://ex.org/text>" -> "\"select ...\""))
    }
  }

  test("service-test-all-triples.sparql verbatim: INSERT from a UNION of " +
      "file SERVICEs, each a default/GRAPH UNION") {
    val base = java.nio.file.Files.createTempDirectory("graft_stray").toString
    for (n <- Seq("triples.ttl", "quads.trig"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(base, n), res("unsorted", n))
    withProp("graft.sparql.base", base) {
      val out = graft.pipeline.Script
        .runSparql(spark, res("unsorted", "service-test-all-triples.sparql"))
        .dataset.collect()
        .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSet
      val T = "http://www.example.org/triple/"
      val Q = "http://www.example.org/quad/"
      // triples.ttl: default-graph branch only (no named graphs in a .ttl);
      // quads.trig: one default + one named graph, both branches hit
      assert(out === Set(
        (s"<${T}s>", s"<${T}p>", s"<${T}o>"),
        (s"<${Q}a>", s"<${Q}b>", s"<${Q}c>"),
        (s"<${Q}x>", s"<${Q}y>", s"<${Q}z>")))
    }
  }

  test("docs/examples/test3.sparql verbatim: FROM <file:///home/raven/…> " +
      "via fileAliases") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dcat")
    // stand-in dcat.ttl (the real dataset file is machine-local): a
    // minimal DCAT description, exercising Turtle prefixes + typed parse
    java.nio.file.Files.writeString(dir.resolve("dcat.ttl"),
      """@prefix dcat: <http://www.w3.org/ns/dcat#> .
        |@prefix dct: <http://purl.org/dc/terms/> .
        |<http://ex.org/ds/bikes> a dcat:Dataset ;
        |  dct:title "Electric bikesharing stations" .
        |""".stripMargin)
    withProp("graft.fileAliases",
      "/home/raven/Projects/Eclipse/qrowd-rdf-data-integration/datasets/" +
        s"1014-electric-bikesharing-stations=$dir") {
      // FROM replaces the session dataset with the file's default graph
      val rows = ConstructParser.parseSelect(res("unsorted", "test3.sparql"))
        .run(quadlessSession()).collect()
        .map(r => (r.getAs[String]("s"), r.getAs[String]("p"),
          r.getAs[String]("o"))).toSet
      assert(rows === Set(
        ("<http://ex.org/ds/bikes>",
          "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
          "<http://www.w3.org/ns/dcat#Dataset>"),
        ("<http://ex.org/ds/bikes>", "<http://purl.org/dc/terms/title>",
          "\"Electric bikesharing stations\"")))
    }
  }

  test("docs/examples/test2.sparql verbatim: SERVICE <file:///home/raven/…> " +
      "via fileAliases") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dcat2")
    java.nio.file.Files.writeString(dir.resolve("dcat.ttl"),
      """@prefix dct: <http://purl.org/dc/terms/> .
        |<http://ex.org/ds/bikes> dct:title "Electric bikesharing stations" .
        |""".stripMargin)
    withProp("graft.fileAliases",
      "/home/raven/Projects/Eclipse/qrowd-rdf-data-integration/datasets/" +
        s"1014-electric-bikesharing-stations=$dir") {
      val rows = ConstructParser.parseSelect(res("unsorted", "test2.sparql"))
        .run(ConstructParser.unitFrame(spark)).collect()
        .map(r => (r.getAs[String]("s"), r.getAs[String]("p"),
          r.getAs[String]("o"))).toSet
      assert(rows === Set(
        ("<http://ex.org/ds/bikes>", "<http://purl.org/dc/terms/title>",
          "\"Electric bikesharing stations\"")))
    }
  }

  /** An empty session quad frame — FROM must hide it entirely. */
  private def quadlessSession(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq(("<http://g/1>", "<http://hidden/s>", "<http://hidden/p>", "\"x\""))
      .toDF("graph", "subj", "pred", "obj")
  }
}
