package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.ops.Bgp

/** Model-based check of the §8.3 compatibility operators: every Bgp
  * compat variant must agree with a brute-force implementation of SPARQL
  * solution-mapping algebra (solutions as partial maps, unbound =
  * absent) on randomized frames with NULLs.
  */
class BgpCompatSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** A solution mapping: bound vars only. */
  private type Sol = Map[String, String]

  private def compatible(a: Sol, b: Sol): Boolean =
    a.keySet.intersect(b.keySet).forall(k => a(k) == b(k))

  private def merge(a: Sol, b: Sol): Sol = b ++ a

  private def bruteJoin(l: Seq[Sol], r: Seq[Sol]): Seq[Sol] =
    for { a <- l; b <- r if compatible(a, b) } yield merge(a, b)

  private def bruteOptional(l: Seq[Sol], r: Seq[Sol]): Seq[Sol] =
    l.flatMap { a =>
      val ms = r.filter(compatible(a, _))
      if (ms.isEmpty) Seq(a) else ms.map(merge(a, _))
    }

  /** SPARQL §8.3 MINUS: drop μ1 when a compatible μ2 shares ≥1 bound var. */
  private def bruteMinus(l: Seq[Sol], r: Seq[Sol]): Seq[Sol] =
    l.filterNot(a => r.exists(b =>
      compatible(a, b) && a.keySet.intersect(b.keySet).nonEmpty))

  private def bruteSemi(l: Seq[Sol], r: Seq[Sol], anti: Boolean): Seq[Sol] =
    if (anti) l.filterNot(a => r.exists(compatible(a, _)))
    else l.filter(a => r.exists(compatible(a, _)))

  private def toDf(cols: Seq[String], sols: Seq[Sol]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        sols.map(s => Row(cols.map(c => s.get(c).orNull): _*)), 2),
      StructType(cols.map(c => StructField(c, StringType))))

  /** Multiset of solutions (NULL columns dropped back out of the map). */
  private def sols(df: DataFrame): Seq[Sol] = {
    val cols = df.columns
    df.collect().toSeq.map(r =>
      cols.zipWithIndex.collect {
        case (c, k) if !r.isNullAt(k) => c -> r.getString(k)
      }.toMap)
  }

  private def sorted(s: Seq[Sol]) = s.map(_.toSeq.sorted).sortBy(_.toString)

  private def randomFrame(rnd: scala.util.Random, cols: Seq[String],
      n: Int): Seq[Sol] =
    (0 until n).map { _ =>
      cols.flatMap { c =>
        rnd.nextInt(4) match {
          case 0 => None // unbound
          case v => Some(c -> v.toString)
        }
      }.toMap
    }

  test("compatJoin / compatOptional / minusCompat / compatSemi match the " +
      "brute-force SPARQL solution algebra on randomized NULL-bearing frames") {
    val lCols = Seq("a", "b")
    val rCols = Seq("b", "c")
    (1 to 12).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val l = randomFrame(rnd, lCols, 1 + rnd.nextInt(7))
      val r = randomFrame(rnd, rCols, 1 + rnd.nextInt(7))
      val (lf, rf) = (toDf(lCols, l), toDf(rCols, r))
      assert(sorted(sols(Bgp.compatJoin(lf, rf))) ===
        sorted(bruteJoin(l, r)), s"join seed=$seed")
      assert(sorted(sols(Bgp.compatOptional(lf, rf))) ===
        sorted(bruteOptional(l, r)), s"optional seed=$seed")
      assert(sorted(sols(Bgp.minusCompat(lf, rf))) ===
        sorted(bruteMinus(l, r)), s"minus seed=$seed")
      assert(sorted(sols(Bgp.compatSemi(lf, rf, anti = false))) ===
        sorted(bruteSemi(l, r, anti = false)), s"semi seed=$seed")
      assert(sorted(sols(Bgp.compatSemi(lf, rf, anti = true))) ===
        sorted(bruteSemi(l, r, anti = true)), s"anti seed=$seed")
    }
  }

  test("equi fast paths agree with compat variants when nothing is NULL") {
    val lCols = Seq("a", "b")
    val rCols = Seq("b", "c")
    val rnd = new scala.util.Random(7)
    // all-bound frames: compat and plain operators must coincide
    val l = (0 until 8).map(_ => lCols.map(c => c -> (1 + rnd.nextInt(3)).toString).toMap)
    val r = (0 until 8).map(_ => rCols.map(c => c -> (1 + rnd.nextInt(3)).toString).toMap)
    val (lf, rf) = (toDf(lCols, l), toDf(rCols, r))
    assert(sorted(sols(Bgp.compatJoin(lf, rf))) === sorted(sols(Bgp.join(lf, rf))))
    assert(sorted(sols(Bgp.compatOptional(lf, rf))) === sorted(sols(Bgp.optional(lf, rf))))
    assert(sorted(sols(Bgp.minusCompat(lf, rf))) === sorted(sols(Bgp.minus(lf, rf))))
    assert(sorted(sols(Bgp.compatSemi(lf, rf, anti = false))) ===
      sorted(sols(Bgp.exists(lf, rf))))
    assert(sorted(sols(Bgp.compatSemi(lf, rf, anti = true))) ===
      sorted(sols(Bgp.notExists(lf, rf))))
  }

  test("an erroring BIND feeding a join routes through §8.3 compat: " +
      "YEAR of a malformed literal is unbound, so it merges with any ?y") {
    import org.apache.spark.sql.SparkSession
    implicit val s: SparkSession = spark
    import s.implicits._
    val quads = Seq(
      ("<a>", "<http://ex.org/date>", "\"2020-02-02\""),
      ("<b>", "<http://ex.org/date>", "\"garbage\""), // YEAR → NULL
      ("<c>", "<http://ex.org/date2>", "\"2020-12-31\""),
      ("<d>", "<http://ex.org/date2>", "\"2021-05-05\"")
    ).toDF("subj", "pred", "obj")
    val q =
      """PREFIX ex: <http://ex.org/>
        |SELECT ?s ?s2 ?y WHERE {
        |  ?s ex:date ?d .
        |  BIND(YEAR(?d) AS ?y)
        |  { SELECT ?s2 ?y WHERE { ?s2 ex:date2 ?d2 . BIND(YEAR(?d2) AS ?y) } }
        |}""".stripMargin
    val got = graft.rules.ConstructParser.parseSelect(q).run(quads)
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // §8.3: <b>'s unbound ?y is compatible with EVERY subquery solution
    // (the equi fast path would silently drop both <b> rows)
    assert(got === Set(
      ("<a>", "<c>", 2020L),
      ("<b>", "<c>", 2020L),
      ("<b>", "<d>", 2021L)))
  }
}
