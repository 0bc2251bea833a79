package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property test pinning [[graft.ops.CannedQueries.tree]]'s set-at-a-time
  * rewrite to the upstream per-row semantics
  * (rdf-processing-toolkit-cli/src/main/resources/tree.rq: for every
  * triple, a term that appears BOTH as some subject and as some object —
  * `IF(EXISTS { [] ?p1 ?t . ?t ?p2 [] }, bnode(?t), ?t)` — is replaced by
  * a deterministic blank node). The in-memory oracle below implements
  * exactly that row-at-a-time rule; 40 seeded random graphs (tree and
  * per-graph gtree) must agree with the distributed plan on every row.
  */
class CannedTreeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  /** The upstream rule, row at a time. */
  private def expected(rows: Seq[(String, String, String, String)],
      perGraph: Boolean): Seq[(String, String, String, String)] = {
    def key(g: String) = if (perGraph) g else ""
    val subjects = rows.groupBy(r => key(r._1))
      .view.mapValues(_.map(_._2).toSet).toMap
    val objects = rows.groupBy(r => key(r._1))
      .view.mapValues(_.map(_._4).toSet).toMap
    rows.map { case (g, s, p, o) =>
      def sw(t: String) =
        if (subjects(key(g)).contains(t) && objects(key(g)).contains(t))
          "_:n" + md5hex(t)
        else t
      (g, sw(s), p, sw(o))
    }
  }

  test("tree/gtree ≡ upstream per-row EXISTS rule on 40 random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 40) {
      val perGraph = trial % 2 == 1
      val nGraphs = 1 + rnd.nextInt(3)
      val nNodes = 2 + rnd.nextInt(7)
      val nTriples = 1 + rnd.nextInt(14)
      def node() = s"<urn:n${rnd.nextInt(nNodes)}>"
      val rows = (0 until nTriples).map { _ =>
        val g = s"<urn:g${rnd.nextInt(nGraphs)}>"
        val o = if (rnd.nextBoolean()) node() else s""""L${rnd.nextInt(4)}""""
        (g, node(), s"<urn:p${rnd.nextInt(3)}>", o)
      }
      val df = rows.toDF("graph", "subj", "pred", "obj")
      val got = graft.ops.CannedQueries.tree(df, perGraph = perGraph)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
        .toSeq.sorted
      val want = expected(rows, perGraph).sorted
      assert(got === want,
        s"trial $trial (perGraph=$perGraph): input=${rows.mkString("; ")}")
    }
  }
}
