package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ledger-drift gate: the driver-query registry is counted HERE, so
  * BASELINE.md prose can never silently disagree with the registry again
  * (the round-5 verdict caught a 117-vs-118 miscount). Update the
  * constants when adding queries — the failure message says how.
  */
class RegistrySpec extends AnyFunSuite {

  /** Total `SparkEntry.queries` entries (= rows the driver verifies). */
  private val ExpectedQueries = 126

  /** Registry keys that intentionally have NO DuckDB oracle — each one
    * hash-seeded or data-dependent, and each bridged by an
    * exact-baseline ScalaTest (TrainingSpec / KgSpec / FnSpec).
    */
  private val RowsOnly = Set("dedup_minhash", "dedup_simhash",
    "text_fingerprint", "embed_ann", "embed_ivf", "kg_fuzzy_mentions")

  test(s"registry holds exactly $ExpectedQueries queries") {
    val n = SparkEntry.queries.size
    assert(n === ExpectedQueries,
      s"SparkEntry.queries has $n entries, expected $ExpectedQueries — " +
        "update ExpectedQueries AND the BASELINE.md ledger prose together")
  }

  test("every query is oracled except the documented rows-only set") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracles without queries: ${(o -- q).toSeq.sorted}")
    assert((q -- o) === RowsOnly,
      s"un-oracled queries drifted from the documented rows-only set: " +
        s"extra=${(q -- o -- RowsOnly).toSeq.sorted} " +
        s"missing=${(RowsOnly -- (q -- o)).toSeq.sorted}")
  }
}
