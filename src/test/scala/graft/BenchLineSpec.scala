package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench→driver output channel: the driver captures only the
  * last 2000 chars of stdout, so the final JSON line must stay under
  * [[Bench.DriverLineBudget]] for the FULL query surface — including
  * worst-case (wide) formatted times — or per-query perf data silently
  * disappears from the driver board (this happened in round 7 when the
  * spread map rode the final line).
  */
class BenchLineSpec extends AnyFunSuite {

  // 9.94 renders "9.9" — every fmt tier caps at 3 chars, and this value
  // exercises the widest (1-dp) tier rather than the 2-char "99" or the
  // saturating "999" renders.
  private def fullSurface: Seq[(String, Double)] =
    (SparkEntry.queries.keys.filterNot(_ == "q25_stream_batch_parity").toSeq.sorted
      :+ "q25_stream_parity" :+ "stream_ingest").map(_ -> 9.94)

  test("driver line fits the tail-capture budget at the full query surface") {
    // 9.94 s per query formats at worst-case width, so a pass here
    // means any real bench line is shorter still. The retried list is
    // at its worst case too: BenchRetryMax keys, all 3-digit numbers
    // (the widest shortKey render), plus the noisy flag.
    val worstRetried = fullSurface.map(_._1)
      .filter(_.drop(1).takeWhile(_.isDigit).length >= 3)
      .take(Bench.BenchRetryMax)
      .padTo(Bench.BenchRetryMax, "q999_pad")
    // worst case carries every optional annotation at once: a noisy,
    // host-disturbed, max-retried board with a band_total (slice too,
    // impossible together with stream keys in practice but cheap to
    // prove the budget against)
    val line = Bench.driverLine(9999.99, fullSurface,
      "/root/testdata/sf0.1", 999999.0, isNoisy = true,
      retried = worstRetried, slice = Some("A"),
      bandTotalSec = Some(9999.9), hostDisturbed = true)
    assert(line.length <= Bench.DriverLineBudget)
    assert(line.contains("\"retried\":["))
    assert(line.startsWith("{\"metric\":\"total\""))
    assert(line.endsWith("}"))
    // The queries map must actually be on the line (that's what r07 lost).
    assert(line.contains("\"queries\":{"))
    assert(line.contains("\"1\":"), "zero-pad-stripped keys present")
    assert(line.contains("\"s\":"), "stream ingest key present")
    // key shortening must not collide (query numbers are unique by naming
    // convention; this guards a future q65_a/q65_b mistake — and the
    // zero-pad strip must not alias "01" with a future "1")
    val shortKeys = fullSurface.map(p => Bench.shortKey(p._1))
    assert(shortKeys.distinct.size == shortKeys.size)
  }

  test("driver line is valid single-line JSON shape") {
    val line = Bench.driverLine(1.23, Seq("q01" -> 0.5, "q02" -> -1.0),
      "/root/testdata/sf0.01", 48730.0)
    assert(!line.contains("\n"))
    assert(line.contains("\"2\":-1"), "failed queries stay visible as -1")
    assert(!line.contains("noisy"), "green canary stays off the line")
    val flagged = Bench.driverLine(1.23, Seq("q01" -> 0.5),
      "/root/testdata/sf0.01", 48730.0, isNoisy = true)
    assert(flagged.endsWith("\"noisy\":true}"), "red canary rides the line")
  }

  test("an over-budget line fails loudly instead of silently truncating") {
    // un-shortenable keys (no underscore, no q-prefix digits) survive
    // shortKey whole, so 100 of them overflow even the capped map
    val bloated = (1 to 100).map(i => s"averyveryverylongquerykeyname$i" -> 1.0)
    val e = intercept[IllegalArgumentException] {
      Bench.driverLine(1.0, bloated, "/root/testdata/sf0.1", 1.0)
    }
    assert(e.getMessage.contains("budget"))
  }

  test("capped map keeps the cost head, every failure, and stream keys") {
    val qs = (1 to 170).map(i => f"q$i%03d_x" -> i * 0.01) ++ Seq(
      "q171_fail" -> -1.0, "q25_stream_parity" -> 0.1, "stream_ingest" -> 0.2)
    val line = Bench.driverLine(100.0, qs, "/root/testdata/sf0.1", 1000.0)
    assert(line.contains("\"171\":-1"), "failed query always visible")
    assert(line.contains("\"25\":") && line.contains("\"s\":"),
      "stream keys always visible")
    assert(line.contains("\"170\":1.7"), "most expensive kept")
    assert(!line.contains("\"1\":0.0"), "cheapest dropped by the cap")
    assert(line.contains("\"nq\":173"), "surface size reported")
    // exactly BenchTopK + failures + stream keys entries
    val n = "\"[0-9s]+\":".r.findAllIn(line.drop(line.indexOf("queries"))).size
    assert(n == Bench.BenchTopK + 3)
  }

  // --- session-health canary: replayed against RECORDED profiles ---

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  /** minTimes map from a recorded spread file (full query names). */
  private def spreadMinTimes(path: String): (Map[String, Double], Seq[(String, (Double, Double))]) = {
    val node = om.readTree(new java.io.File(path)).get("spread")
    val pairs = scala.jdk.CollectionConverters.IteratorHasAsScala(node.fieldNames()).asScala.map { k =>
      val a = node.get(k)
      k -> (a.get(0).asDouble(), a.get(1).asDouble())
    }.toSeq
    (pairs.map { case (k, (a, b)) => k -> math.min(a, b) }.toMap, pairs)
  }

  test("canary is GREEN on the quiet local profiles (r09 runJ/runL, r10 runA)") {
    val bands = Bench.loadQuietBands()
    for (p <- Seq("bench_local_r09_runJ.json", "bench_local_r09_runL.json",
        "bench_local_r10_runA.json")) {
      val (mins, pairs) = spreadMinTimes(p)
      val ratio = Bench.medianRunRatio(pairs)
      assert(ratio < 2.2, s"$p quiet ratio $ratio")
      assert(Bench.sentinelTrips(mins).isEmpty, s"$p sentinels quiet")
      val trips = Bench.quietBandTrips(mins, bands)
      assert(trips.size < Bench.QuietBandMinKeys, s"$p band trips $trips")
      assert(!Bench.noisy(mins, ratio, trips), s"$p must read green")
    }
  }

  test("canary is RED on the r10 driver board via the quiet-band check") {
    // The r10 board carried 26 keys at 2.4-9x quiet levels spanning
    // BOTH runs of each pair (q38: 5.36/5.07) — invisible to the
    // run-ratio median (1.529) and, under the old 3-4x bands, to the
    // sentinels (q36 read 0.622, 5x quiet, under its old 0.8 band).
    // The committed per-key quiet bands catch it: 20 non-stream keys
    // past 3x (vs 0-1 on every quiet session). bench_board_r10.json is
    // the round-10 board spread snapshotted to a stable name
    // (bench_spread_last.json is overwritten by every local run).
    val bands = Bench.loadQuietBands()
    assert(bands.nonEmpty, "bench_quiet_bands.json missing or unparseable")
    val (mins, pairs) = spreadMinTimes("bench_board_r10.json")
    val ratio = Bench.medianRunRatio(pairs)
    assert(ratio < 2.2, "the r10 disturbance is invisible to the run ratio")
    val trips = Bench.quietBandTrips(mins, bands)
    assert(trips.size >= Bench.QuietBandMinKeys,
      s"r10 board must trip the band check, got ${trips.size}: $trips")
    assert(Bench.noisy(mins, ratio, trips), "r10 board must read noisy")
  }

  test("quiet-bands file parses, has sane values, and names live queries") {
    val bands = Bench.loadQuietBands()
    assert(bands.size >= 200, s"bands cover ${bands.size} keys")
    // every band key must be a live query: a renamed/deleted query
    // leaves a stale band that silently checks nothing. The two
    // stream-path measurement keys (not in the queries map) are allowed:
    // they exist only to cap band_total, never to trip (stream-named).
    val surface = SparkEntry.queries.keySet - "q25_stream_batch_parity" +
      "q25_stream_parity" + "stream_ingest"
    val stale = bands.keySet -- surface
    assert(stale.isEmpty, s"stale band keys: ${stale.take(5)}")
    assert(bands.keySet("q25_stream_parity") && bands.keySet("stream_ingest"),
      "stream-path cap entries present")
    assert(bands.values.forall(v => v > 0 && v < 60), "bands in (0, 60) s")
    // a missing file degrades to an empty map (band arm off), never throws
    assert(Bench.loadQuietBands("no_such_file.json").isEmpty)
  }

  test("every band's provenance names the quiet run that produced it") {
    // VERDICT r12 #2 (refreshed again in r13 after the q50/q208 constant
    // cuts — stale-high bands weaken the 3x trip arm): bands derive from
    // the three r13 quiet runs; band_source pins WHICH run produced each
    // band, and this test re-derives each band from its named source
    // file — a band edited by hand (or a provenance gone stale after
    // the next refresh) fails here.
    val root = om.readTree(new java.io.File(Bench.QuietBandsFile))
    val bandsN = root.get("bands"); val srcN = root.get("band_source")
    assert(srcN != null, "band_source provenance map missing")
    val runs = Map(
      "runA" -> "bench_local_r13_runA.json",
      "runB" -> "bench_local_r13_runB.json",
      "runC" -> "bench_local_r13_runC.json",
      "runD" -> "bench_local_r13_runD.json")
    val loaded = runs.map { case (tag, p) =>
      val node = om.readTree(new java.io.File(p))
      val sp = node.get("spread")
      val mins = scala.jdk.CollectionConverters
        .IteratorHasAsScala(sp.fieldNames()).asScala.map { k =>
          k -> math.min(sp.get(k).get(0).asDouble(), sp.get(k).get(1).asDouble())
        }.toMap
      val stream = Seq("q25_stream_parity", "stream_ingest")
        .map(k => k -> node.get("stream").get(k).asDouble()).toMap
      tag -> (mins ++ stream)
    }
    val it = scala.jdk.CollectionConverters
      .IteratorHasAsScala(bandsN.fieldNames()).asScala
    it.foreach { k =>
      val band = bandsN.get(k).asDouble()
      val tag = srcN.get(k).asText()
      val sourceVal = loaded(tag)(k)
      assert(math.abs(band - sourceVal) < 5e-4,
        f"$k: band $band%.3f != $tag value $sourceVal%.3f")
      // and min-provenance: no other run's value is lower
      val allVals = loaded.values.flatMap(_.get(k)).filter(_ > 0)
      assert(band <= allVals.min + 5e-4, s"$k: band is not the min across runs")
    }
  }

  test("canary is RED on the r09 driver board's timing profile") {
    // The r09 board carried 25 keys at 2.2-15x their quiet level
    // (adjudicated as a driver-host disturbance, VERDICT r09). Replay
    // its driver line: the sentinels alone must flag the session even
    // without run-ratio evidence (the board has only min times).
    val tail = om.readTree(new java.io.File("BENCH_r09.json")).get("tail").asText()
    val line = tail.split('\n').find(_.contains("\"metric\":\"total\"")).get
    val json = line.substring(line.indexOf('{'))
    val qs = om.readTree(json).get("queries")
    // short board keys ("11") -> full names ("q11_set_ops")
    val byShort = SparkEntry.queries.keys.map(k => Bench.shortKey(k) -> k).toMap
    val mins = scala.jdk.CollectionConverters.IteratorHasAsScala(qs.fieldNames()).asScala
      .flatMap(s => byShort.get(s).map(_ -> qs.get(s).asDouble())).toMap
    assert(Bench.sentinelTrips(mins).size >= 2,
      "the inflated board keys must trip >=2 sentinels")
    assert(Bench.noisy(mins, 1.5), "board profile must read noisy")
  }

  test("a single-operator regression does NOT trip the canary") {
    // one sentinel 10x over its band (a genuine code regression in one
    // file) with everything else quiet: session stays green — the
    // regression shows on the board as that key's own time instead.
    val (mins, pairs) = spreadMinTimes("bench_local_r09_runJ.json")
    val bumped = mins.updated("q119_transition_matrix", 18.0)
    assert(!Bench.noisy(bumped, Bench.medianRunRatio(pairs)))
  }

  test("persisted spread file parses and covers the full query surface") {
    // Written by every `runMain graft.Bench` (overwrite-per-run); the
    // round driver commits it with the round, so the BOARD's own
    // per-query raw runs land in git. Stale file (surface drift) fails
    // here: re-run a local bench after adding queries.
    val f = new java.io.File("bench_spread_last.json")
    assert(f.exists(), "bench_spread_last.json missing — run graft.Bench")
    val node = om.readTree(f)
    for (k <- Seq("metric", "cpus", "sf", "noisy", "ratio", "stream", "spread",
        "band_trips", "band_trips_healed", "retry"))
      assert(node.has(k), s"spread file key $k")
    val keys = scala.jdk.CollectionConverters
      .IteratorHasAsScala(node.get("spread").fieldNames()).asScala.toSet
    val surface = SparkEntry.queries.keySet - "q25_stream_batch_parity"
    assert(keys == surface,
      s"spread file surface drift: missing=${(surface -- keys).take(5)} extra=${(keys -- surface).take(5)}")
    assert(node.get("stream").has("q25_stream_parity") &&
      node.get("stream").has("stream_ingest"))
  }

  test("stream floor ledger covers every stream-named query") {
    // Written by `Test/runMain graft.AdmissionSweep ledger` on a quiet
    // machine: query -> (trigger count, seconds, per-trigger floor).
    // Streaming keys are excluded from the quiet-band canary arm because
    // this class legitimately swings 2-5x across sessions — the ledger
    // is what makes a board's streaming delta attributable anyway.
    // Stale after ADDING a stream query: re-run the ledger mode.
    val f = new java.io.File("stream_floor_ledger.json")
    assert(f.exists(), "stream_floor_ledger.json missing — run " +
      "`Test/runMain graft.AdmissionSweep ledger`")
    val node = om.readTree(f).get("queries")
    val keys = scala.jdk.CollectionConverters
      .IteratorHasAsScala(node.fieldNames()).asScala.toSet
    // stream-CLASS coverage (VERDICT r12 #6): the name-based filter plus
    // the explicit extras (q126_transform_state) — every key the band
    // arm excuses must carry a measured per-trigger floor instead
    val expected = SparkEntry.queries.keySet.filter(Bench.isStreamClass)
    assert(keys == expected,
      s"ledger drift: missing=${(expected -- keys).take(5)} " +
        s"extra=${(keys -- expected).take(5)}")
    for (k <- Seq("q126_transform_state", "q130_stream_history",
        "q137_stream_quota", "q140_stream_type_seq",
        "q141_stream_timer_sessions", "q251_stream_ntile"))
      assert(keys(k), s"typed-state key $k missing a ledger floor")
    keys.foreach { k =>
      val e = node.get(k)
      assert(e.get("triggers").asInt() >= 1, s"$k: no triggers recorded")
      assert(e.get("seconds").asDouble() > 0 &&
        e.get("per_trigger_sec").asDouble() > 0, s"$k: degenerate floor")
    }
  }

  test("budget leaves headroom for sbt epilogue inside the 2000-char window") {
    // the epilogue after the line is `\n[success] Total time: NNN s
    // (H:MM:SS), completed <Month> <DD>, <YYYY>, <H>:<MM>:<SS> <AM|PM>\n`
    // — 84 chars at worst-case field widths (measured 73 in real bench
    // logs; runMain stdout carries no [info] prefix under -batch), plus
    // the line's own newline and a margin char.
    assert(Bench.DriverLineBudget <= 2000 - 84 - 1 - 1)
  }

  test("worst-case line leaves room for 15 more queries before the budget") {
    // forward headroom check: simulate the surface grown by the 15
    // queries the next round would ACTUALLY add — the successors of the
    // current max query number (self-updating as the surface grows) —
    // so round N+1 does not hit the guard on its first operator batch.
    val maxNum = SparkEntry.queries.keys
      .map(_.drop(1).takeWhile(_.isDigit).toInt).max
    val grown = fullSurface ++
      (1 to 15).map(i => s"q${maxNum + i}_future" -> 9.94)
    val line = Bench.driverLine(9999.99, grown,
      "/root/testdata/sf0.1", 999999.0, isNoisy = true,
      retried = Seq.fill(Bench.BenchRetryMax)("q999_pad"),
      slice = Some("A"), bandTotalSec = Some(9999.9), hostDisturbed = true)
    assert(line.length <= Bench.DriverLineBudget)
  }

  // --- self-heal: replayed against the RECORDED r11 board ---

  test("self-heal names the r11 board's inflated keys and corrects the board") {
    // The r11 driver board (bench_board_r11.json — snapshotted from the
    // committed bench_spread_last.json) read 595.5 s noisy:true with 21
    // band trips; judge re-timing pinned every tripped key at quiet
    // levels (q124: 2.9 s vs the board's 131.8 s). Replay: the retry
    // plan must name those keys (most inflated first, inside the cap),
    // and healing them with the quiet runE times must turn the board
    // green with totals at quiet levels.
    val bands = Bench.loadQuietBands()
    val (mins, pairs) = spreadMinTimes("bench_board_r11.json")
    val observedTrips = Bench.quietBandTrips(mins, bands)
    assert(observedTrips.size >= Bench.QuietBandMinKeys,
      s"r11 board must trip the band check pre-heal, got $observedTrips")
    val ratio = Bench.medianRunRatio(pairs)
    assert(Bench.noisy(mins, ratio, observedTrips), "r11 board reads red pre-heal")

    val plan = Bench.retryKeys(mins, bands)
    assert(plan.nonEmpty && plan.size <= Bench.BenchRetryMax)
    assert(observedTrips.toSet.subsetOf(plan.toSet) ||
      plan.size == Bench.BenchRetryMax,
      "every observed trip is retried unless the cap binds")
    // most-inflated-first: the two headline keys (q201 79.7x its band,
    // q124 ~80x — 131.8 s vs ~1.6 s) lead the plan
    assert(plan.take(2).toSet ==
      Set("q124_embedding_cov", "q201_poisson_boot"),
      s"worst keys first, got ${plan.take(3)}")

    // transient disturbance: the retry run lands at quiet levels
    // (bench_local_r11_runE min-of-2 stands in for the re-measurement)
    val (quietMins, _) = spreadMinTimes("bench_local_r11_runE.json")
    val retryTimes = plan.flatMap(k => quietMins.get(k).map(k -> _)).toMap
    val healed = Bench.heal(mins.toSeq, retryTimes).toMap
    val healedTrips = Bench.quietBandTrips(healed, bands)
    assert(healedTrips.size < Bench.QuietBandMinKeys,
      s"healed board trips residue: $healedTrips")
    assert(!Bench.noisy(healed, ratio, healedTrips),
      "healed r11 board must read green")
    // the healed totals land at quiet levels: the ~290 s of disturbance
    // concentrated in the retried keys is gone
    val delta = plan.map(k => mins(k) - healed(k)).sum
    assert(delta > 200, f"self-heal recovered only $delta%.1f s")
    // and the corrected line names the retried keys
    val line = Bench.driverLine(300.0, healed.toSeq,
      "/root/testdata/sf0.1", 60000.0, isNoisy = false, retried = plan)
    assert(line.contains("\"retried\":[") && line.contains("\"124\""))
    assert(!line.contains("noisy"))
  }

  test("r12 board: sustained disturbance yields a defensible band_total") {
    // The r12 driver board (bench_board_r12.json) is the failure mode
    // min-of-3 alone cannot fix: the disturbance moved INTO the retry
    // window (its recorded retry map reads q54 105.3 s vs the 1.14 s
    // quiet re-time), so healing with the SESSION'S OWN retries leaves
    // the board red at ~540 s where the quiet engine measures 280.5 s
    // (bench_local_r12_runC). The band_total emitted for exactly this
    // case must land within 10% of the CURRENT engine's quiet total
    // (the bands are r13 evidence, so the defensible number they yield
    // is the r13 engine — bench_local_r13_runC — not the slower r12
    // engine the board was contemporary with).
    val bands = Bench.loadQuietBands()
    val node = om.readTree(new java.io.File("bench_board_r12.json"))
    val (mins, pairs) = spreadMinTimes("bench_board_r12.json")
    val retryN = node.get("retry")
    val retries = scala.jdk.CollectionConverters
      .IteratorHasAsScala(retryN.fieldNames()).asScala
      .map(k => k -> retryN.get(k).asDouble()).toMap
    val healed = Bench.heal(mins.toSeq, retries).toMap
    val trips = Bench.quietBandTrips(healed, bands)
    assert(trips.size >= Bench.QuietBandMinKeys,
      s"r12 board must stay red after its own (hot) retries: $trips")
    assert(Bench.noisy(healed, Bench.medianRunRatio(pairs), trips))

    val stream = Seq("q25_stream_parity", "stream_ingest")
      .map(k => k -> node.get("stream").get(k).asDouble()).toMap
    val bt = Bench.bandTotal(healed ++ stream, bands)
    val quietC = {
      val c = om.readTree(new java.io.File("bench_local_r13_runC.json"))
      val sp = c.get("spread")
      val batch = scala.jdk.CollectionConverters
        .IteratorHasAsScala(sp.fieldNames()).asScala
        .map(k => math.min(sp.get(k).get(0).asDouble(), sp.get(k).get(1).asDouble()))
        .filter(_ > 0).sum
      batch + c.get("stream").get("q25_stream_parity").asDouble() +
        c.get("stream").get("stream_ingest").asDouble()
    }
    assert(math.abs(bt - quietC) / quietC <= 0.10,
      f"band_total $bt%.1f vs quiet runC total $quietC%.1f — off by " +
        f"${100 * math.abs(bt - quietC) / quietC}%.1f%%")
    // the raw healed board stays visibly wrong without the cap
    val healedTotal = healed.values.filter(_ > 0).sum + stream.values.sum
    assert(healedTotal > 1.5 * quietC,
      "precondition: the r12 board really is ~2x the engine")
    // and the driver line renders both annotations
    val line = Bench.driverLine(healedTotal, (healed ++ stream).toSeq,
      "/root/testdata/sf0.1", 2917.0, isNoisy = true,
      retried = retries.keys.toSeq, bandTotalSec = Some(bt),
      hostDisturbed = true)
    assert(line.contains("\"band_total\":") &&
      line.contains("\"host_disturbed\":true") && line.contains("\"noisy\":true"))
    assert(line.length <= Bench.DriverLineBudget)
  }

  test("retry-window sentinel bracket separates sustained from transient") {
    // all three hot -> sustained; one hot -> still a (healable) transient
    assert(Bench.retryWindowHot(Map(
      "q03_filter_project" -> 5.0, "q42_stratified_mix" -> 4.0,
      "q200_weighted_sample" -> 3.0)))
    assert(!Bench.retryWindowHot(Map(
      "q03_filter_project" -> 5.0, "q42_stratified_mix" -> 0.2,
      "q200_weighted_sample" -> 0.1)))
    assert(!Bench.retryWindowHot(Map.empty))
    // a FAILED sentinel re-run (-1) must count as hot, not exonerate:
    // two failures alone flag the window even with the third quiet
    assert(Bench.retryWindowHot(Map(
      "q03_filter_project" -> -1.0, "q42_stratified_mix" -> -1.0,
      "q200_weighted_sample" -> 0.1)))
    // one failure + one hot is sustained too
    assert(Bench.retryWindowHot(Map(
      "q03_filter_project" -> -1.0, "q42_stratified_mix" -> 4.0,
      "q200_weighted_sample" -> 0.1)))
    // every retry sentinel must have a pinned session-health band and
    // exist on the live surface
    val bands = Bench.SentinelBands.toMap
    Bench.RetrySentinels.foreach { k =>
      assert(bands.contains(k), s"$k has no sentinel band")
      assert(SparkEntry.queries.contains(k), s"$k not a live query")
    }
  }

  test("bandTotal caps only above-band keys and skips failures") {
    val bands = Map("a" -> 1.0, "b" -> 2.0)
    val t = Bench.bandTotal(
      Map("a" -> 10.0, "b" -> 1.5, "c" -> 3.0, "d" -> -1.0), bands)
    // a capped at 1.0, b observed 1.5 (below band is kept), c no band
    // rides observed, d failed is skipped
    assert(math.abs(t - (1.0 + 1.5 + 3.0)) < 1e-9, s"got $t")
    // with NO bands (a non-sf0.1 run) it degrades to the observed sum —
    // the flagged-line contract "read band_total" still has a field to
    // read even when no quiet evidence exists to cap with
    val t2 = Bench.bandTotal(Map("a" -> 10.0, "b" -> 1.5), Map.empty)
    assert(math.abs(t2 - 11.5) < 1e-9, s"got $t2")
  }

  test("a sustained disturbance survives the retry and stays red") {
    // negative control: if the retry runs are ALSO inflated (a
    // disturbance spanning the whole session including the heal pass),
    // min-of-3 changes nothing and the board must remain noisy.
    val bands = Bench.loadQuietBands()
    val (mins, pairs) = spreadMinTimes("bench_board_r11.json")
    val plan = Bench.retryKeys(mins, bands)
    val stillInflated = plan.map(k => k -> mins(k)).toMap
    val healed = Bench.heal(mins.toSeq, stillInflated).toMap
    val trips = Bench.quietBandTrips(healed, bands)
    assert(trips.size >= Bench.QuietBandMinKeys)
    assert(Bench.noisy(healed, Bench.medianRunRatio(pairs), trips))
  }

  test("quiet profiles produce an empty (or near-empty) retry plan") {
    val bands = Bench.loadQuietBands()
    for (p <- Seq("bench_local_r09_runJ.json", "bench_local_r10_runA.json",
        "bench_local_r11_runE.json")) {
      val (mins, _) = spreadMinTimes(p)
      // quiet sessions trip 0-3 keys (runE trips 3: q228/q213/q232 sit
      // just past bands refreshed from a different session) — the heal
      // pass costs at most those few extra executions when quiet
      val plan = Bench.retryKeys(mins, bands)
      assert(plan.size <= 4, s"$p quiet retry plan too big: $plan")
    }
  }

  test("split-half slices partition the surface exactly") {
    val all = SparkEntry.queries.keys
      .filterNot(_ == "q25_stream_batch_parity").toSeq.sorted
    val a = Bench.sliceNames(all, Some("A"))
    val b = Bench.sliceNames(all, Some("B"))
    assert(a ++ b == all, "A then B is the whole sorted surface")
    assert((a.toSet & b.toSet).isEmpty, "no key runs in both halves")
    assert(math.abs(a.size - b.size) <= 1)
    assert(Bench.sliceNames(all, None) == all)
    assert(Bench.sliceNames(all, Some("bogus")) == all)
  }

  test("heal never resurrects a failure and never raises a time") {
    val results = Seq("a" -> 5.0, "b" -> -1.0, "c" -> 2.0)
    val healed = Bench.heal(results,
      Map("a" -> 1.0, "b" -> 0.5, "c" -> 9.0)).toMap
    assert(healed("a") == 1.0, "min-of-3 takes the retry when faster")
    assert(healed("b") == -1.0, "a failed query stays -1")
    assert(healed("c") == 2.0, "a slower retry changes nothing")
    val failedRetry = Bench.heal(Seq("a" -> 5.0), Map("a" -> -1.0)).toMap
    assert(failedRetry("a") == 5.0, "a failed retry changes nothing")
  }

  // --- stream-class self-heal arm (VERDICT r13 #2): replayed against
  //     the RECORDED r13 driver board ---

  test("stream arm heals the r13 board's disturbed q116 and spares real swings") {
    // The r13 driver board shipped q116_stream_distinct at 31 s — 5.3x
    // its then-committed quiet floor (5.809 s), same-day 8-core re-read
    // 3.9 s — as a fake 0.52x regression, because stream keys are
    // exempt from the band arm (their 2-5x per-trigger swing is
    // legitimate) and so could never heal. Replay the board's parsed
    // driver line against the r13-era floors, PINNED as literals here:
    // the live ledger is regenerated whenever the stream operators get
    // faster, and this replay must keep testing the r13 scenario.
    val r13Floors = Map(
      "q116_stream_distinct" -> 5.809, "q126_transform_state" -> 3.228,
      "q58_stream_admission" -> 7.217, "q106_stream_observe" -> 3.631,
      "q141_stream_timer_sessions" -> 3.476)
    val qs = om.readTree(new java.io.File("BENCH_r13.json"))
      .get("parsed").get("queries")
    val shortToFull = SparkEntry.queries.keySet
      .map(k => Bench.shortKey(k) -> k).toMap
    val mins = scala.jdk.CollectionConverters
      .IteratorHasAsScala(qs.fieldNames()).asScala
      .flatMap(s => shortToFull.get(s).map(_ -> qs.get(s).asDouble())).toMap
    assert(mins("q116_stream_distinct") == 31.0, "board precondition")
    val plan = Bench.streamRetryKeys(mins, r13Floors)
    assert(plan == Seq("q116_stream_distinct"),
      s"exactly the disturbed stream key retries, got $plan")
    // healing with the same-day re-measurement lands the key sane
    val healed = Bench.heal(mins.toSeq,
      Map("q116_stream_distinct" -> 3.9)).toMap
    assert(healed("q116_stream_distinct") <= 7.0, "q116 healed")
    // a genuine swing at 4.99x the floor never trips
    assert(Bench.streamRetryKeys(
      Map("q126_transform_state" -> 3.228 * 4.99), r13Floors).isEmpty)
    // ...and just past 5x it does
    assert(Bench.streamRetryKeys(
      Map("q126_transform_state" -> 3.228 * 5.01), r13Floors)
      == Seq("q126_transform_state"))
    // keys without ledger evidence never retry (nothing to heal toward)
    assert(Bench.streamRetryKeys(
      Map("q999_stream_x" -> 100.0), r13Floors).isEmpty)
    // non-stream keys are invisible to this arm (the band arm owns them)
    assert(Bench.streamRetryKeys(Map("q124_embedding_cov" -> 1000.0),
      Map("q124_embedding_cov" -> 1.0)).isEmpty)
    // the cap binds, most-inflated first
    val wide = (1 to 20).map(i => f"q$i%03d_stream_t" -> 1000.0 * i).toMap
    val floors = (1 to 20).map(i => f"q$i%03d_stream_t" -> 1.0).toMap
    val capped = Bench.streamRetryKeys(wide, floors)
    assert(capped.size == Bench.StreamRetryMax)
    assert(capped.head == "q020_stream_t", "most inflated first")
    // failed keys (-1) never enter the stream arm
    assert(Bench.streamRetryKeys(
      Map("q116_stream_distinct" -> -1.0), r13Floors).isEmpty)
  }

  test("stream floors loader reads the committed ledger") {
    val floors = Bench.loadStreamFloors()
    assert(floors.nonEmpty, "stream_floor_ledger.json must parse")
    // the loader's floors are the ledger's `seconds` field and sane
    floors.foreach { case (k, f) =>
      assert(f > 0 && f < 60, s"$k floor $f degenerate")
      assert(Bench.isStreamClass(k), s"$k in ledger but not stream-class")
    }
    // observing every key AT its floor trips nothing (v = f < 5f)
    assert(Bench.streamRetryKeys(floors, floors).isEmpty)
    // a missing file degrades to no-op, never throws
    assert(Bench.loadStreamFloors("/nonexistent.json").isEmpty)
  }

  test("driver line fits with BOTH retry arms at their caps") {
    val maxNum = SparkEntry.queries.keys
      .map(_.drop(1).takeWhile(_.isDigit).toInt).max
    val grown = fullSurface ++
      (1 to 15).map(i => s"q${maxNum + i}_future" -> 9.94)
    val retried = Seq.fill(Bench.BenchRetryMax)("q999_pad") ++
      Seq.fill(Bench.StreamRetryMax)("q998_pad")
    val line = Bench.driverLine(9999.99, grown,
      "/root/testdata/sf0.1", 999999.0, isNoisy = true,
      retried = retried, slice = Some("A"), bandTotalSec = Some(9999.9),
      hostDisturbed = true)
    assert(line.length <= Bench.DriverLineBudget)
  }
}
