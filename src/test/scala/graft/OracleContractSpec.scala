package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle-coverage contract: every SparkEntry query either has a
  * DuckDB oracle (hash gate) or a machine-readable proof row pointing at
  * the hash-checked companions that cover its machinery — never neither,
  * never both. Catches a future entry silently landing un-oracled. */
class OracleContractSpec extends AnyFunSuite {

  test("every query id is oracled XOR proof-mapped; no orphans either way") {
    val queries = SparkEntry.queries.keySet
    val oracled = SparkEntry.oracleSql.keySet
    val proofed = SparkEntry.oracleProofs.keySet

    val unoracled = queries -- oracled
    assert(unoracled == proofed,
      s"no-oracle entries without a proof row: ${(unoracled -- proofed).toSeq.sorted}; " +
        s"proof rows for oracled/unknown entries: ${(proofed -- unoracled).toSeq.sorted}")
    assert((oracled -- queries).isEmpty,
      s"oracleSql keys with no query: ${(oracled -- queries).toSeq.sorted}")
  }

  test("every proof companion is itself a hash-checked oracle entry") {
    val oracled = SparkEntry.oracleSql.keySet
    for ((id, companions) <- SparkEntry.oracleProofs) {
      assert(companions.nonEmpty, s"$id has an empty proof list")
      val bad = companions.filterNot(oracled.contains)
      assert(bad.isEmpty, s"$id lists non-oracled companions: $bad")
    }
  }
}
