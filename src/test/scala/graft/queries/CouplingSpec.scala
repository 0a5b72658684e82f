package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Pins the SF ↔ oracle coupling for the ELB queries: their static oracle
  * SQL embeds staging paths for the `verifyRows` corpus, while the Spark
  * side sizes the corpus per SF via `rowsFor`. Every SF the driver can
  * VERIFY at must therefore map to exactly `verifyRows` — only the
  * bench-only sf0.1 corpus may diverge (its oracles are never executed).
  * If this law breaks, q18/q32/q45/q55 false-fail with the engine
  * computing over one corpus and the oracle reading another.
  */
class CouplingSpec extends AnyFunSuite {

  test("every verifiable SF maps to the oracle's staged corpus size") {
    for (sf <- Seq("sf0.001", "sf0.01")) {
      assert(ElbQueries.rowsFor(s"/root/testdata/$sf") == ElbQueries.verifyRows,
        s"$sf corpus size must equal the oracle staging size")
    }
  }

  test("only the bench and local-scaling SFs use big corpora") {
    assert(ElbQueries.rowsFor("/root/testdata/sf0.1") == 200000)
    // the local synthetic sf1 decade (never driver-verified) gets 10×
    assert(ElbQueries.rowsFor("/tmp/sf1") == 2000000)
    // an unknown dir falls back to the verify-safe size, never the big one
    assert(ElbQueries.rowsFor("/some/new/sfdir") == ElbQueries.verifyRows)
  }
}
