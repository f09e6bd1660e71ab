package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Gate on the tracked scale-probe ledger (round-12 verdict ask #1):
  * tools/probes.py measures every PLANS.md-audited query at 1x/10x/100x
  * and grades each last-decade growth ratio against the query's
  * documented class (linear / n log n / m^1.5, with slack and an
  * absolute floor so constant-overhead entries never trip). The runner
  * itself exits nonzero on a FLAG; this spec makes `sbt test` re-assert
  * the same thing on the COMMITTED artifact, so a flagged entry cannot
  * sit unnoticed in the ledger between probe runs — the growth-class
  * contract is part of the suite, not just of the tool.
  *
  * No JSON dependency is available to tests beyond the JVM, so the
  * check is a deliberately narrow textual scan for the verdict field
  * the tool writes ("verdict": "FLAG:..."): probes.py owns the
  * grading; this spec only refuses a ledger that carries a flag.
  */
class ProbesLedgerSpec extends AnyFunSuite {
  test("PROBES.json carries no growth-class flags") {
    val p = Paths.get("PROBES.json")
    assume(Files.exists(p), "PROBES.json not generated yet (tools/probes.py)")
    val text = new String(Files.readAllBytes(p), "UTF-8")
    val flagged = "\"verdict\": \"FLAG".r.findAllIn(text).size
    assert(flagged == 0,
      s"$flagged probe entries exceed their documented growth class — " +
        "run `python3 tools/probes.py --check` for the list; either the " +
        "plan regressed (fix it) or the class is wrong (re-document it)")
  }
}
