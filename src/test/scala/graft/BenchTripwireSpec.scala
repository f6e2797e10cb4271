package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench regression tripwire (VERDICT r8 #5): the min(mid,warm)
  * reporting protocol must not be able to silently absorb a query that is
  * elevated in BOTH post-JIT passes. Pure-function tests — the tripwire's
  * value is its logic, not a Spark run. */
class BenchTripwireSpec extends AnyFunSuite {

  test("parseQueriesJson extracts the per-query map from a bench line") {
    val line =
      """{"metric":"total","value":61.606,"unit":"sec","queries":{"q01":0.797,""" +
        """"q10":1.649,"q23e":0.443},"cold_total":186.1,"failed":[],"sf":"x"}"""
    val m = Bench.parseQueriesJson(line)
    assert(m === Map("q01" -> 0.797, "q10" -> 1.649, "q23e" -> 0.443))
  }

  test("parseQueriesJson is empty on a line without a queries object") {
    assert(Bench.parseQueriesJson("""{"metric":"total","value":1.0}""") === Map.empty)
  }

  test("flags a query elevated >1.5x AND >0.3s over its reference row") {
    val ref = Map("q10" -> 1.0, "q20b" -> 2.0)
    val rep = Map("q10" -> 1.8, "q20b" -> 2.1)
    assert(Bench.tripwire(rep, ref) === Seq("q10"))
  }

  test("the absolute floor suppresses noise-floor ratios (r8's q23e case)") {
    // 0.443 -> 0.712 is 1.61x but only a 0.27s delta: noise, not regression
    val ref = Map("q23e" -> 0.443)
    assert(Bench.tripwire(Map("q23e" -> 0.712), ref) === Seq.empty)
    // same ratio on a row big enough to matter IS flagged
    assert(Bench.tripwire(Map("q23e" -> 7.12), Map("q23e" -> 4.43)) === Seq("q23e"))
  }

  test("queries new this round (absent from reference) are skipped, not flagged") {
    assert(Bench.tripwire(Map("q99" -> 30.0), Map("q10" -> 1.0)) === Seq.empty)
  }

  test("failed passes (-1) never trip, in report or reference") {
    assert(Bench.tripwire(Map("q10" -> -1.0), Map("q10" -> 1.0)) === Seq.empty)
    assert(Bench.tripwire(Map("q10" -> 5.0), Map("q10" -> -1.0)) === Seq.empty)
  }

  test("the pinned bench/reference.json parses to a full per-query map") {
    val p = java.nio.file.Paths.get("bench/reference.json")
    assume(java.nio.file.Files.exists(p))
    val m = Bench.parseQueriesJson(
      new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
    assert(m.size > 100, s"reference capture should cover the suite, got ${m.size}")
    assert(m.values.forall(_ >= 0))
  }

  test("the reference capture declares its scale factor (the tripwire's SF guard reads it)") {
    // a growth run at x10/x20 data must not be compared against the sf0.1
    // reference — the guard keys off this field, so it must be present
    val p = java.nio.file.Paths.get("bench/reference.json")
    assume(java.nio.file.Files.exists(p))
    val raw = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    assert(Bench.parseSfField(raw) === "/root/testdata/sf0.1")
    assert(Bench.parseSfField("""{"queries":{}}""") === "")
    assert(Bench.parseSfField("""{"sf":"/tmp/sfx10"}""") === "/tmp/sfx10")
  }
}
