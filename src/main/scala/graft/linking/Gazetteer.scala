package graft.linking

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Entity-linking stage: dictionary gazetteer + broadcast mention scan.
  *
  * Mirrors the reference's index-lookup join shape (cached subject lookup,
  * MainCliVoidGeneratorMinimal.java:149-153 ≈ a broadcast hash build side).
  *
  * Scale: the gazetteer is the small dimension (thousands-millions of
  * surfaces) — `broadcast()` keeps the mention scan shuffle-free; the fact
  * side (transcripts) streams through codegen. Skew in mention frequency
  * (hot "celebrity" entities) is therefore free here: no shuffle key ever
  * equals the entity. Downstream joins keyed by entity use salting /
  * AQE skew-join (see Kg.canonicalTriples).
  */
object Gazetteer {

  val AliasNs = "http://graft.io/alias/"

  /** Deterministic gazetteer from the `nation` dimension: three surface
    * variants per entity, each its own alias IRI (the alias graph links
    * them; CC canonicalization picks the least IRI).
    */
  def apply(spark: SparkSession, sfDir: String): DataFrame = {
    val n = spark.read.parquet(s"$sfDir/nation.parquet")
      .select(col("n_nationkey").cast("long").as("k"))
    val key = col("k").cast("string")
    def alias(v: Int) = concat(lit(AliasNs + "NATION_"), key, lit("/" + v))
    n.select(concat(lit("NATION_"), key).as("surface"), alias(0).as("alias_iri"))
      .unionAll(n.select(concat(lit("nation "), key).as("surface"), alias(1).as("alias_iri")))
      .unionAll(n.select(concat(lit("Nation-"), key).as("surface"), alias(2).as("alias_iri")))
  }

  /** Undirected alias edges: a chain 0-1-2 per entity plus an extra
    * high-degree node on entity 0 (the skew case).
    */
  def aliasEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val n = spark.read.parquet(s"$sfDir/nation.parquet")
      .select(col("n_nationkey").cast("long").as("k"))
    val key = col("k").cast("string")
    def alias(v: Int) = concat(lit(AliasNs + "NATION_"), key, lit("/" + v))
    val chain = n.select(alias(0).as("src"), alias(1).as("dst"))
      .unionAll(n.select(alias(1).as("src"), alias(2).as("dst")))
    val extra = n.filter(col("k") === 0)
      .select(alias(3).as("src"), alias(0).as("dst"))
      .unionAll(n.filter(col("k") === 0)
        .select(alias(3).as("src"), alias(2).as("dst")))
    chain.unionAll(extra)
  }

  /** Word-boundary matching without per-pair regex: every non-alphanumeric
    * char maps 1:1 to a space (STATIC pattern — compiled once, codegen),
    * after which "surface at word boundaries" ≡ plain `contains` of the
    * space-padded normalized surface. Exact for all occurrences (the 1:1
    * mapping preserves positions); avoids NATION_1 false-linking inside
    * NATION_12. (A dynamic `regexp_like('(^|\\W)'||surface||…)` was
    * measured 50× slower — per-row pattern compilation.)
    */
  def boundaryNormText(text: Column): Column =
    concat(lit(" "), regexp_replace(text, "[^A-Za-z0-9]", " "), lit(" "))

  def boundaryNormSurface(surface: Column): Column =
    concat(lit(" "), translate(surface, "_-", "  "), lit(" "))

  /** Mention detection: broadcast the gazetteer and scan each turn's text
    * for surfaces at word boundaries. One row per (turn, matching surface).
    * The normalized text is computed once per row BEFORE the join, not per
    * (row × surface) pair.
    */
  def mentions(transcripts: DataFrame, gaz: DataFrame): DataFrame =
    transcripts
      .withColumn("__bt", boundaryNormText(col("text")))
      .join(broadcast(gaz.withColumn("__bs", boundaryNormSurface(col("surface")))),
        contains(col("__bt"), col("__bs")))
      .select(col("conv_id"), col("turn_idx"), col("surface"), col("alias_iri"))

  /** DuckDB CTE bodies kept in lockstep with the builders above. */
  def gazOracleCte: String =
    """gaz AS (
      |  SELECT 'NATION_' || CAST(n_nationkey AS VARCHAR) AS surface,
      |         'http://graft.io/alias/NATION_' || CAST(n_nationkey AS VARCHAR) || '/0' AS alias_iri FROM nation
      |  UNION ALL
      |  SELECT 'nation ' || CAST(n_nationkey AS VARCHAR),
      |         'http://graft.io/alias/NATION_' || CAST(n_nationkey AS VARCHAR) || '/1' FROM nation
      |  UNION ALL
      |  SELECT 'Nation-' || CAST(n_nationkey AS VARCHAR),
      |         'http://graft.io/alias/NATION_' || CAST(n_nationkey AS VARCHAR) || '/2' FROM nation
      |)""".stripMargin

  def edgesOracleCte: String =
    """alias_edges AS (
      |  SELECT 'http://graft.io/alias/NATION_' || CAST(n_nationkey AS VARCHAR) || '/0' AS src,
      |         'http://graft.io/alias/NATION_' || CAST(n_nationkey AS VARCHAR) || '/1' AS dst FROM nation
      |  UNION ALL
      |  SELECT 'http://graft.io/alias/NATION_' || CAST(n_nationkey AS VARCHAR) || '/1',
      |         'http://graft.io/alias/NATION_' || CAST(n_nationkey AS VARCHAR) || '/2' FROM nation
      |  UNION ALL
      |  SELECT 'http://graft.io/alias/NATION_0/3', 'http://graft.io/alias/NATION_0/0' FROM nation WHERE n_nationkey = 0
      |  UNION ALL
      |  SELECT 'http://graft.io/alias/NATION_0/3', 'http://graft.io/alias/NATION_0/2' FROM nation WHERE n_nationkey = 0
      |)""".stripMargin
}
