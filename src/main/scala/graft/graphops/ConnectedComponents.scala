package graft.graphops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Checkpoints.TruncateOps

/** Connected components over an edge list via alternating large-star /
  * small-star contraction (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC'14 — a published algorithm, re-implemented
  * here on DataFrames).
  *
  * Why not label propagation: star contraction converges in O(log n)
  * rounds instead of O(diameter), and the high-degree hub a celebrity
  * entity creates is exactly the shape large-star contracts first — the
  * skew case is the fast case. Why not GraphX: RDD-based (excluded by
  * input_hint); this loop stays in Catalyst/Tungsten.
  *
  * Each round = two hash aggregations (min over neighborhood) + a join
  * back to edges; `localCheckpoint` truncates lineage so the plan does
  * not grow across iterations (hard part #1 in SURVEY.md §7.2.6). On a
  * cluster, replace localCheckpoint with reliable `checkpoint` to a
  * shared FS for resumability.
  */
object ConnectedComponents {

  /** @param edges two string columns (src, dst), undirected semantics.
    * @return (node, component) where component = least node id (string
    *         ordering) in the node's connected component; every node that
    *         appears in `edges` is present.
    */
  def apply(edges: DataFrame, maxIter: Int = 20,
      // driver-heap budget: 2^18 string edges ≈ tens of MB incl. HashMap
      // overhead (2^20 could approach ~1 GB with long IRIs)
      localSolveThreshold: Long = 1 << 18): DataFrame = {
    val spark = edges.sparkSession
    // canonical direction + dedup once up front
    var e = edges.select(col("src").cast("string"), col("dst").cast("string"))
      .filter(col("src") =!= col("dst"))
      .select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst")) // src > dst invariant
      .distinct()
      .truncateLineage(false) // materialized by the first fingerprint job

    // Hybrid solve: an alias graph far below cluster scale is cheaper on
    // the driver (one collect + union-find) than as log-n shuffle rounds —
    // the iterative path below exists for edge lists that do NOT fit.
    // The threshold probe is a LIMIT threshold+1 collect, not a separate
    // count(): one job instead of two, and the driver never holds more
    // than threshold+1 rows — if the limit truncated, the edge list is
    // over budget and the distributed loop runs instead. Thresholds at
    // or beyond Int.MaxValue-1 cannot ride a LIMIT (review r10: +1
    // would overflow / truncate silently) — they keep the count probe.
    val capped: Option[Array[org.apache.spark.sql.Row]] =
      if (localSolveThreshold < Int.MaxValue.toLong - 1) {
        val a = e.limit(localSolveThreshold.toInt + 1).collect()
        if (a.length <= localSolveThreshold) Some(a) else None
      } else if (e.count() <= localSolveThreshold) Some(e.collect())
      else None
    if (capped.isDefined) {
      val pairs = capped.get.map(r => (r.getString(0), r.getString(1)))
      val parent = scala.collection.mutable.HashMap[String, String]()
      def find(x0: String): String = { // iterative w/ path compression
        var x = x0
        while (parent.getOrElseUpdate(x, x) != x) x = parent(x)
        var y = x0
        while (parent(y) != x) { val n = parent(y); parent(y) = x; y = n }
        x
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val rows = parent.keys.toSeq.map(k => (k, find(k)))
      import spark.implicits._
      return rows.toDF("node", "component")
    }

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // large-star: for every node u over symmetric neighborhood, attach
      // strictly-greater neighbors to min(N(u) ∪ {u}).
      val sym = e.select(col("src").as("u"), col("dst").as("v"))
        .unionAll(e.select(col("dst").as("u"), col("src").as("v")))
      val largeMin = sym.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val large = sym.join(largeMin, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()

      // small-star: for every node u, attach its ≤ neighbors (and u) to
      // the min of that set. Edges already satisfy src > dst.
      val smallMin = large.groupBy(col("src").as("u"))
        .agg(min(col("dst")).as("m"))
      val small = large.join(smallMin, large("src") === smallMin("u"))
        .select(col("dst").as("v"), col("m"), col("u"))
      val next = small.filter(col("v") =!= col("m"))
        .select(col("v").as("src"), col("m").as("dst"))
        .unionAll(small.select(col("u").as("src"), col("m").as("dst")))
        .filter(col("src") =!= col("dst"))
        .select(greatest(col("src"), col("dst")).as("src"),
          least(col("src"), col("dst")).as("dst"))
        .distinct()
        .truncateLineage(false) // materialized by the fingerprint below

      // converged when the edge set is a stable set of stars. Cheap
      // order-independent fingerprint (count + hash-sum) instead of two
      // exceptAll shuffles — one tiny aggregate job per round.
      def fp(df: DataFrame) = df.agg(
        count(lit(1)), expr("bit_xor(xxhash64(src, dst))")).head
      converged = fp(next) == fp(e)
      e = next
      iter += 1
    }
    if (!converged)
      // a non-converged contraction would yield a partially-contracted
      // (non-canonical) mapping — fail loudly rather than return it
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds")

    // star edges: (member -> root). Roots map to themselves.
    val members = e.select(col("src").as("node"), col("dst").as("component"))
    val roots = e.select(col("dst").as("node")).distinct()
      .withColumn("component", col("node"))
    members.unionByName(roots).distinct()
  }

  /** DuckDB oracle for CC as a recursive min-label walk; `edgesCte` must
    * define `alias_edges(src, dst)`. Returns (node, component).
    */
  def oracleSql(edgesCte: String): String =
    s"""WITH RECURSIVE $edgesCte,
       |nodes AS (SELECT src AS n FROM alias_edges UNION SELECT dst FROM alias_edges),
       |sym AS (SELECT src AS a, dst AS b FROM alias_edges UNION SELECT dst, src FROM alias_edges),
       |walk(node, lbl) AS (
       |  SELECT n, n FROM nodes
       |  UNION
       |  SELECT s.a, w.lbl FROM sym s JOIN walk w ON w.node = s.b
       |)
       |SELECT node, min(lbl) AS component FROM walk GROUP BY node""".stripMargin
}
