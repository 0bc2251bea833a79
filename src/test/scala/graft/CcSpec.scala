package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graphops.ConnectedComponents

/** Connected components vs an in-memory union-find oracle. */
class CcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def unionFind(edges: Seq[(String, String)]): Map[String, String] = {
    val parent = scala.collection.mutable.Map[String, String]()
    def find(x: String): String = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // canonical = min member: with ordered union above, root IS the min
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def ccOf(edges: Seq[(String, String)]): Map[String, String] =
    ConnectedComponents(edges.toDF("src", "dst"))
      .as[(String, String)].collect().toMap

  /** force the distributed star-contraction path */
  private def ccDist(edges: Seq[(String, String)]): Map[String, String] =
    ConnectedComponents(edges.toDF("src", "dst"), localSolveThreshold = 0)
      .as[(String, String)].collect().toMap

  test("chain, clique, self-loop, two components") {
    val edges = Seq(
      "a" -> "b", "b" -> "c", "c" -> "d",            // chain
      "k1" -> "k2", "k2" -> "k3", "k1" -> "k3",      // triangle
      "x" -> "x",                                    // self loop (dropped)
      "p" -> "q")
    val got = ccOf(edges)
    assert(got("d") === "a" && got("a") === "a")
    assert(got("k3") === "k1")
    assert(got("q") === "p")
    assert(!got.contains("x")) // self-loop-only node has no edges
  }

  test("property: matches union-find on seeded random graphs") {
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 2 + rnd.nextInt(40)
      val m = 1 + rnd.nextInt(80)
      val es = Seq.fill(m)((f"n${rnd.nextInt(n)}%03d", f"n${rnd.nextInt(n)}%03d"))
        .filter(e => e._1 != e._2)
      if (es.nonEmpty) {
        val expected = unionFind(es)
        assert(ccOf(es) === expected, s"seed=$seed (local path)")
        if (seed <= 3) // distributed star-contraction path on a subset
          assert(ccDist(es) === expected, s"seed=$seed (dist path)")
      }
    }
  }

  test("huge localSolveThreshold sentinel still solves (r10 limit-probe overflow)") {
    // Long.MaxValue as an "always local" sentinel must not overflow the
    // LIMIT threshold+1 probe into an empty collect (review r10)
    val edges = Seq("a" -> "b", "b" -> "c", "p" -> "q")
    val got = ConnectedComponents(edges.toDF("src", "dst"),
      localSolveThreshold = Long.MaxValue)
      .as[(String, String)].collect().toMap
    assert(got === unionFind(edges))
  }

  test("long chain converges within log-bounded iterations") {
    val chain = (0 until 120).map(i => (f"c$i%04d", f"c${i + 1}%04d"))
    val got = ccDist(chain) // distributed path must contract the chain
    assert(got.values.toSet === Set("c0000"))
    assert(got.size === 121)
  }
}
