package graft.embed

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exact baseline: probes broadcast to
  * every partition, the dot product is a `aggregate(zip_with(...))`
  * column expression (codegen, no UDF), ranking is a per-probe window.
  * The scale path is random-hyperplane LSH bucketing: each vector hashes
  * to a `nPlanes`-bit signature; candidates are same-bucket pairs only,
  * turning the all-pairs scan into an equi-join — the standard ANN
  * trade (recall vs bucket count) at 100 TB.
  */
object Similarity {

  /** cosine(a, b) as a pure column expression over two double arrays. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  private def asDouble(c: Column): Column =
    transform(c, x => x.cast("double"))

  /** Exact top-k neighbors for each probe vector (probe ids given by
    * `probeFilter`). Ties broken by (rounded sim desc, vec_id asc) so the
    * ranking is engine-independent.
    */
  def bruteForceTopK(embeddings: DataFrame, probeFilter: Column, k: Int): DataFrame = {
    val base = embeddings.select(col("vec_id"),
      asDouble(col("embedding")).as("v"))
    val probes = base.filter(probeFilter)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"))
    val scored = base.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(cosine(col("pv"), col("v")), 4).as("sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 folded to [-1, 1]. No RNG state — reproducible anywhere.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(2000001L)) - 1000000L) / 1000000.0d

  /** LSH signature: one sign bit per hyperplane. */
  def lshSignature(vec: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x * planeComponent(p, i)),
        lit(0.0d), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** ANN top-k: candidates restricted to same-LSH-bucket vectors, then
    * exact cosine rank within the candidate set. Smaller `nPlanes` →
    * bigger buckets → higher recall & cost.
    */
  def annTopK(embeddings: DataFrame, probeFilter: Column, k: Int,
      nPlanes: Int = 8): DataFrame = {
    val base = embeddings.select(col("vec_id"),
        asDouble(col("embedding")).as("v"))
      .withColumn("bucket", lshSignature(col("v"), nPlanes))
    val probes = base.filter(probeFilter)
      .select(col("vec_id").as("probe_id"), col("v").as("pv"),
        col("bucket").as("pb"))
    val scored = base.join(broadcast(probes),
        col("bucket") === col("pb") && col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        round(cosine(col("pv"), col("v")), 4).as("sim"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
