package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench evidence chain's pure parts: round discovery from the
  * driver's recorded artifacts and prior-time scavenging (full tracked
  * file preferred, truncated driver tail as fallback) — the inputs the
  * contention guard keys off. */
class BenchChainSpec extends AnyFunSuite {

  private def tmpRepo(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("bench_chain").toFile
    new java.io.File(d, "docs").mkdirs()
    d
  }

  private def write(repo: java.io.File, name: String, text: String): Unit =
    java.nio.file.Files.write(new java.io.File(repo, name).toPath,
      text.getBytes("UTF-8"))

  test("lastRecordedRound: max BENCH_r<N>.json, 0 when none") {
    val repo = tmpRepo()
    assert(Bench.lastRecordedRound(repo) == 0)
    write(repo, "BENCH_r01.json", "{}")
    write(repo, "BENCH_r08.json", "{}")
    write(repo, "BENCH_nope.json", "{}")
    write(repo, "CORRECTNESS_r09.json", "{}")
    assert(Bench.lastRecordedRound(repo) == 8)
  }

  test("priorTimes prefers the full tracked file over the driver artifact") {
    val repo = tmpRepo()
    write(repo, "BENCH_r07.json",
      """{"n":7,"rc":0,"tail":"\"q_b\":9.99}","sf":0.1}""")
    write(repo, "docs/bench_r07.json",
      """{"queries":{"q_a":1.25,"q_b":2.5,"q_fail":-1.0},"sf":"x","runs":3,"metric":"total","unit":"sec","value":3.75}""")
    val p = Bench.priorTimes(repo, 7)
    // tracked file wins, failed (-1) and non-query scalar keys excluded
    assert(p == Map("q_a" -> 1.25, "q_b" -> 2.5))
  }

  test("priorTimes scavenges the truncated driver tail when no tracked file exists") {
    val repo = tmpRepo()
    // the driver artifact: JSON whose tail field holds a TRUNCATED
    // fragment of the stdout line (starts mid-map), like BENCH_r08.json
    write(repo, "BENCH_r08.json",
      """{"n": 8, "rc": 0, "cpus": 32, "sf": 0.1, "tail": "rep\":0.885,\"j5_snap_ts\":1.318,\"value\":70.9", "parsed": null}""")
    val p = Bench.priorTimes(repo, 8)
    // the severed leading pair ("...rep":0.885 lost its name start is
    // still a name:value match on its surviving suffix) is fine for the
    // guard; scalar keys (sf, value) must be excluded
    assert(p.get("j5_snap_ts").contains(1.318))
    assert(!p.contains("sf") && !p.contains("value") && !p.contains("n"))
    assert(Bench.priorTimes(repo, 3).isEmpty) // no artifact for that round
  }

  test("priorTimes ignores the fixtures map (query names recur there)") {
    val repo = tmpRepo()
    // r10+ tracked file: fixtures reuse query names with SMALLER values;
    // scavenging past the "fixtures" key would shadow the query time and
    // fire the contention guard on every media query next round
    write(repo, "docs/bench_r10.json",
      """{"queries":{"cv_pupil":5.5,"q_a":1.0},"fixtures":{"cv_pupil":2.2},"sf":"x","runs":3,"metric":"total","unit":"sec","value":6.5}""")
    assert(Bench.priorTimes(repo, 10) ==
      Map("cv_pupil" -> 5.5, "q_a" -> 1.0))
    // escaped form (driver artifact embeds the line as a JSON string)
    val repo2 = tmpRepo()
    write(repo2, "BENCH_r10.json",
      """{"n":10,"tail":"{\"queries\":{\"cv_pupil\":5.5},\"fixtures\":{\"cv_pupil\":2.2},\"value\":5.5}"}""")
    assert(Bench.priorTimes(repo2, 10).get("cv_pupil").contains(5.5))
  }

  test("priorTimes ignores the deep min-of-runs map (r17: query names recur there too)") {
    // the driver-artifact tail can start AFTER "fixtures" was cut off,
    // leaving the compact line's "deep" map in scope — its min-of-5
    // values reuse the 10 slowest queries' names. Scavenging past it
    // would make next round's guard compare a median against a MIN,
    // firing spuriously on exactly the expensive queries.
    val repo = tmpRepo()
    write(repo, "BENCH_r17.json",
      """{"n":17,"tail":"3,\"deep_q\":12.3,\"other_q\":4.0},\"queries_omitted\":5,\"calibration_ratio\":0.95,\"deep\":{\"deep_q\":9.1,\"other_q\":2.9},\"deep_ratio\":0.9,\"value\":100.0}"}""")
    val p = Bench.priorTimes(repo, 17)
    assert(p.get("deep_q").contains(12.3) && p.get("other_q").contains(4.0),
      s"median values lost: $p")
    // plain (unescaped) form in a tracked file missing "fixtures"
    val repo2 = tmpRepo()
    write(repo2, "docs/bench_r17.json",
      """{"queries":{"q_a":5.5},"deep":{"q_a":3.3},"deep_ratio":0.9,"value":5.5}""")
    assert(Bench.priorTimes(repo2, 17) == Map("q_a" -> 5.5))
  }

  test("priorFixtures reads only the fixtures map (engine-time guard input)") {
    val repo = tmpRepo()
    // r11+ tracked file: an "engines" map follows fixtures, reusing the
    // same query names — priorFixtures must stop at the fixtures map's
    // closing brace, and priorTimes must still stop before it
    write(repo, "docs/bench_r11.json",
      """{"queries":{"cv_pupil":5.5,"q_a":1.0},"fixtures":{"cv_pupil":2.2},"engines":{"cv_pupil":3.3},"sf":"x","runs":3,"metric":"total","unit":"sec","value":6.5}""")
    assert(Bench.priorFixtures(repo, 11) == Map("cv_pupil" -> 2.2))
    assert(Bench.priorTimes(repo, 11) == Map("cv_pupil" -> 5.5, "q_a" -> 1.0))
    // pre-split rounds (no fixtures map): empty — guard degrades to raw
    val repo2 = tmpRepo()
    write(repo2, "docs/bench_r09.json",
      """{"queries":{"q_a":1.0},"sf":"x","runs":3,"metric":"total","unit":"sec","value":1.0}""")
    assert(Bench.priorFixtures(repo2, 9).isEmpty)
    // escaped driver-artifact form
    val repo3 = tmpRepo()
    write(repo3, "BENCH_r10.json",
      """{"n":10,"tail":"{\"queries\":{\"cv_pupil\":5.5},\"fixtures\":{\"cv_pupil\":2.2},\"value\":5.5}"}""")
    assert(Bench.priorFixtures(repo3, 10).get("cv_pupil").contains(2.2))
  }

  test("every fixtureFrames key is a real query (attribution can't dangle)") {
    val qs = SparkEntry.queries.keySet
    val orphans = Queries.fixtureFrames.keySet.diff(qs)
    assert(orphans.isEmpty,
      s"fixtureFrames entries with no matching query: $orphans")
  }

  test("every query has an oracle row (the correctness gate is total)") {
    // rows-only by NECESSITY, each with a named non-replayable stage and
    // a compensating attestation (spec floor + SCALE.md measurement +
    // 10x standing) — anything else here is a bug, keep this set tiny.
    // EMPTY since r14: the last member (ann_opq_real_recall, learned OPQ
    // rotation = Procrustes SVD) was reshaped into a closed-form
    // recall-floor row, so the gate is fully total
    val rowsOnlyByNecessity = Set.empty[String]
    val missing = SparkEntry.queries.keySet
      .diff(SparkEntry.oracleSql.keySet).diff(rowsOnlyByNecessity)
    assert(missing.isEmpty, s"queries with no oracleSql entry: $missing")
    assert(rowsOnlyByNecessity.subsetOf(SparkEntry.queries.keySet),
      "stale rows-only allowlist entry")
    assert(rowsOnlyByNecessity.intersect(SparkEntry.oracleSql.keySet).isEmpty,
      "allowlisted query HAS an oracle now — shrink the allowlist")
    val stale = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(stale.isEmpty, s"oracleSql rows with no query: $stale")
  }
}
