package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contention adjudicator — each rule pinned, including the
  * late-onset shape that shipped a silently-contended r14 artifact.
  */
class BenchAdjudicateSpec extends AnyFunSuite {

  test("quiet host: flat timings stay clean") {
    val p = Bench.adjudicate(Seq(1.0, 1.05, 0.95))
    assert(!p.contended)
    assert(p.drift > 1.0 && p.drift < 1.2)
  }

  test("rule a: mid/end disagreement over 1.5x flags") {
    assert(Bench.adjudicate(Seq(1.0, 1.0, 1.6)).contended)
    assert(Bench.adjudicate(Seq(1.0, 1.7, 1.05)).contended)
  }

  test("rule b: inflated start inside the 2x warmup allowance stays clean") {
    // C2 warmup: start 1.8x the later floor is expected on an idle host
    assert(!Bench.adjudicate(Seq(1.8, 1.0, 1.05)).contended)
    assert(Bench.adjudicate(Seq(2.3, 1.0, 1.05)).contended)
  }

  test("rule c: late-onset contention has no allowance — the r14 exhibit") {
    // heavy probe 1.09 -> 2.31 -> 1.78: rules a (1.30) and b (0.61) are
    // silent; the quiet-start/inflated-rest shape must flag
    assert(Bench.adjudicate(Seq(1.093, 2.313, 1.782)).contended)
    // mild tail drift below the bar stays clean
    assert(!Bench.adjudicate(Seq(1.0, 1.3, 1.4)).contended)
  }

  test("degenerate inputs: one or zero points never flag") {
    assert(!Bench.adjudicate(Seq(1.0)).contended)
    assert(!Bench.adjudicate(Seq.empty).contended)
  }

  test("artifact routing: a suspect run never overwrites a clean artifact") {
    val clean = Some("""{"metric":"total","value":264.08,"value_suspect":false,...}""")
    val dirty = Some("""{"metric":"total","value":374.90,"value_suspect":true,...}""")
    // the r14 working-tree failure mode: suspect run over a clean file
    assert(Bench.artifactTarget(suspect = true, clean) == "dev/bench_suspect.json")
    // latest noise may replace stale noise; clean always takes the canon
    assert(Bench.artifactTarget(suspect = true, dirty) == "dev/bench_latest.json")
    assert(Bench.artifactTarget(suspect = true, None) == "dev/bench_latest.json")
    assert(Bench.artifactTarget(suspect = false, clean) == "dev/bench_latest.json")
    assert(Bench.artifactTarget(suspect = false, dirty) == "dev/bench_latest.json")
    assert(Bench.artifactTarget(suspect = false, None) == "dev/bench_latest.json")
  }

  test("anchorDriftCount: over-2x rows above the floor, unanchored ignored") {
    val anchors = Map("a" -> 1.0, "b" -> 0.3, "c" -> 2.0)
    val qs = Map("a" -> 2.5, "b" -> 1.0, "c" -> 3.9, "d" -> 9.0)
    // a is over 2x; b's anchor sits below the 0.5s floor; c is under 2x;
    // d has no anchor
    assert(Bench.anchorDriftCount(qs, anchors) == 1)
    assert(Bench.anchorDriftCount(Map("a" -> 2.01), anchors) == 1)
    assert(Bench.anchorDriftCount(Map("a" -> 2.0), anchors) == 0)
    assert(Bench.anchorDriftCount(Map("a" -> -1.0), anchors) == 0) // failed run
  }
}
