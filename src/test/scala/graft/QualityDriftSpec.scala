package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the nine no-oracle queries against SILENT quality drift: their
  * floors are checked every round, but a metric can sag 0.92 -> 0.86 ->
  * 0.80 across rounds with every single round green. This spec
  * red-flags any >10% adverse round-over-round move in the committed
  * QUALITY_r{N}.json artifacts, and pins the drift rule itself. */
class QualityDriftSpec extends AnyFunSuite {

  test("no metric moved >10% adversely between the two most recent rounds") {
    val rounds = Quality.loadRounds()
    assert(rounds.size >= 2, s"need >=2 QUALITY_r*.json files, got ${rounds.map(_._1)}")
    val drifts = Quality.driftReport(rounds)
    assert(drifts.isEmpty, drifts.map { case (q, k, p, c) =>
      f"$q.$k: $p%.6f -> $c%.6f" }.mkString("adverse drift: ", "; ", ""))
  }

  test("committed history file exists and matches the per-round artifacts") {
    val f = new java.io.File("quality_history.json")
    assert(f.exists(), "quality_history.json missing — run `runMain graft.Quality " +
      "/root/testdata/sf0.01 QUALITY_r<N>.json` (it refreshes the history)")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(f)
    val rounds = Quality.loadRounds()
    val histRounds = scala.jdk.CollectionConverters
      .IteratorHasAsScala(node.get("rounds").elements()).asScala.map(_.asInt()).toSeq
    assert(histRounds == rounds.map(_._1),
      s"history covers $histRounds, repo has ${rounds.map(_._1)} — regenerate")
    // spot-check: every latest-round value is recorded verbatim
    val (r, latest) = rounds.last
    for ((q, ms) <- latest; (k, v) <- ms) {
      val h = node.get("queries").get(q).get(k).get(s"r$r")
      assert(h != null && math.abs(h.asDouble() - v) < 1e-9, s"$q.$k r$r mismatch")
    }
  }

  test("the drift rule: direction-aware, 10% threshold, floor-scaled epsilon") {
    // higher-better: recall 0.92 -> 0.86 is a 6.5% drop — sag, not alert;
    // 0.92 -> 0.82 is >10% — alert (the VERDICT r11 example)
    assert(!Quality.adverseDrift("recall_at_10", 0.92, 0.86, Some(0.85)))
    assert(Quality.adverseDrift("recall_at_10", 0.92, 0.82, Some(0.85)))
    // improvement is never adverse
    assert(!Quality.adverseDrift("recall_at_10", 0.86, 0.95, Some(0.85)))
    // lower-better: error rising >10% + epsilon flags
    assert(Quality.adverseDrift("max_rel_error", 0.0067, 0.05, Some(0.05)))
    // ... but noise near zero under the floor-scaled epsilon does not
    assert(!Quality.adverseDrift("max_rel_error", 0.0, 0.001, Some(0.05)))
    assert(!Quality.adverseDrift("max_rank_error_frac", 0.0, 0.0, Some(1e-4)))
    // a monotonicity violation appearing from zero flags (no floor key)
    assert(Quality.adverseDrift("monotonic_violations", 0.0, 1.0, None))
    // informational metrics never flag
    assert(!Quality.adverseDrift("pairs", 17.0, 3.0, None))
    assert(!Quality.adverseDrift("explained_top8_share", 0.20, 0.10, None))
    // every metric in the committed artifacts has a declared direction —
    // a NEW metric must be classified, not silently unguarded
    val known = Quality.MetricDirection.keySet
    for ((_, qs) <- Quality.loadRounds(); (q, ms) <- qs; k <- ms.keys)
      assert(known(k), s"unclassified quality metric $q.$k — add to MetricDirection")
  }
}
