package graft

import org.scalatest.funsuite.AnyFunSuite

/** The committed-quiet-baseline annotation (VERDICT r12 #2) must flag the
  * etl/ktruss-class inflation the calibration probes proved blind to —
  * replayed here with the ROUND-12 NUMBERS: the driver artifact read
  * etl 43.1 s / ktruss 24.0 s while the judge's isolated medians were
  * 17.98 / 13.98, and every probe read quiet.
  */
class BenchBaselineSpec extends AnyFunSuite {

  test("parse: queries, sf, and quiet calibration from a bench artifact") {
    val json =
      """{"metric":"total","value":10.0,"queries":{"a":1.5,"b":20.0},
        |"calibration":{"start":{"median":0.12,"span":[0,1]},
        |"mid":{"median":0.109,"span":[5,6]},
        |"end":{"median":0.5,"span":[9,10]},"spread":1.1},
        |"sf":"/root/testdata/sf0.1"}""".stripMargin.replace("\n", "")
    val (qs, sf, cal) = BenchBaseline.parse(json)
    assert(qs === Map("a" -> 1.5, "b" -> 20.0))
    assert(sf === "/root/testdata/sf0.1")
    // quiet cal = min(start, mid); the degraded end checkpoint is ignored
    assert(cal === 0.109)
  }

  test("suspects: replay of the round-12 driver phantoms the probes passed") {
    // committed quiet baseline ~= the judge's isolated medians
    val base = Map("etl_pipeline" -> 17.98, "q_ktruss" -> 13.98,
      "q_betweenness" -> 14.97, "q_stl" -> 0.71)
    // the contaminated driver run (probes read quiet -> box factor ~1)
    val cur = Map("etl_pipeline" -> 43.141, "q_ktruss" -> 24.032,
      "q_betweenness" -> 19.318, "q_stl" -> 0.80)
    val out = BenchBaseline.suspects(cur, base, boxFactor = 1.0)
    // etl at 2.4x and ktruss at 1.7x MUST be flagged (epoch_suspect was
    // empty on exactly this run — the blind spot this annotation closes)
    assert(out.contains("etl_pipeline") && out("etl_pipeline") > 2.0)
    assert(out.contains("q_ktruss") && out("q_ktruss") > 1.5)
    // betweenness at 1.29x sits under the 1.4 threshold; stl is sub-5s
    assert(!out.contains("q_betweenness"))
    assert(!out.contains("q_stl"))
  }

  test("suspects: box factor clamped into [1, BoxCap]") {
    val base = Map("heavy" -> 10.0)
    // mild epoch drift (within BoxCap) scales the baseline: 15.5 s vs
    // 10 s at box 1.1 is ratio 1.41 -> just flags; at box 1.15 it's
    // 1.348 -> passes
    assert(BenchBaseline.suspects(Map("heavy" -> 15.5), base, 1.15).isEmpty)
    assert(BenchBaseline.suspects(Map("heavy" -> 15.5), base, 1.1)
      === Map("heavy" -> 1.409))
    // a probe reading FAR above the baseline's is contamination, not
    // legitimacy — the live r13 replay: 28 spinners inflated probes
    // 2.18x but legs only ~1.3x, and an unclamped factor (x2.18 on the
    // baseline) masked a 1.7x-inflated leg entirely. Capped at BoxCap,
    // the 1.7x leg still flags.
    assert(BenchBaseline.suspects(Map("heavy" -> 17.0), base, 2.18)
      === Map("heavy" -> math.round(17.0 / 11.5 * 1000.0) / 1000.0))
    // a FASTER current box (factor < 1) must not hide a regression:
    // clamped to 1, so 15 s vs baseline 10 still flags
    assert(BenchBaseline.suspects(Map("heavy" -> 15.0), base, 0.5)
      === Map("heavy" -> 1.5))
  }

  test("suspects: legs without a baseline entry are skipped") {
    assert(BenchBaseline.suspects(Map("new_leg" -> 50.0), Map.empty, 1.0).isEmpty)
    assert(BenchBaseline.suspects(Map("z" -> 50.0), Map("z" -> -1.0), 1.0).isEmpty)
  }

  test("epochScale: deflates a loaded rerun epoch, never inflates") {
    // the r12 benchgate case: rerun cal 0.139 vs quiet floor 0.109
    assert(math.abs(BenchBaseline.epochScale(0.139, 0.109) - 0.109 / 0.139) < 1e-12)
    assert(BenchBaseline.epochScale(0.08, 0.109) === 1.0) // faster epoch: clamp
    assert(BenchBaseline.epochScale(-1.0, 0.109) === 1.0) // missing cal
    assert(BenchBaseline.epochScale(0.1, 0.0) === 1.0)    // missing floor
  }

  test("adjudicate: the r13 etl phantom self-corrects in-artifact") {
    // r13 driver: etl raw 92.3 vs baseline 20.0 (flagged 4.6x). The
    // end-of-run isolated reading on the judge's quiet box: 21.7 with a
    // quiet rerun cal -> scaled 21.7 <= 1.4 * 20.0 * box -> phantom.
    val (v, s) = BenchBaseline.adjudicate(
      iso = 21.7, base = 20.0, boxFactor = 1.0,
      rerunCal = 0.099, quietFloor = 0.099)
    assert(v === "phantom" && math.abs(s - 21.7) < 1e-9)
    // a REAL regression survives: isolated 35 s stays confirmed even
    // under the BoxCap'd allowance
    val (v2, _) = BenchBaseline.adjudicate(35.0, 20.0, 1.15, 0.099, 0.099)
    assert(v2 === "confirmed-suspect")
    // a loaded RERUN epoch deflates the reading before the verdict: raw
    // 33.6 in a 1.28x slower epoch scales to 26.25 < 28.0 -> phantom
    val (v3, s3) = BenchBaseline.adjudicate(33.6, 20.0, 1.0, 0.128, 0.1)
    assert(v3 === "phantom" && math.abs(s3 - 33.6 * 0.1 / 0.128) < 1e-9)
    // failed rerun is named, not silently mixed
    assert(BenchBaseline.adjudicate(-1.0, 20.0, 1.0, 0.1, 0.1)._1
      === "rerun-failed")
  }
}
