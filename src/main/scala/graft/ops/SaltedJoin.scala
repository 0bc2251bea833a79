package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew handling for shuffle joins on hot keys (north-rule
  * requirement; complements AQE's runtime skew-join splitting, which is
  * enabled in every session this engine builds).
  *
  * The pattern: the skewed (fact) side gets a deterministic salt in
  * [0, buckets) derived from OTHER columns via xxhash64 — spreading a hot
  * key over `buckets` reducers — and the dim side is replicated once per
  * salt value. Equivalent join result, bounded per-task key volume.
  * Use when the dim side is too big to broadcast but small enough to
  * replicate `buckets`×; otherwise prefer broadcast (0 shuffles) or plain
  * shuffle join + AQE.
  */
object SaltedJoin {

  /** Inner equi-join `fact.key == dim.key`, fact-side salt derived from
    * `saltSource` columns (must not be constant per hot key).
    */
  def inner(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Seq[Column], buckets: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(saltSource: _*), lit(buckets)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }
}
