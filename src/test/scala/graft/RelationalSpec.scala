package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  private lazy val nEvents = Tables.events(spark, sf).count()

  test("q01 sliding window: every event falls in exactly 3 windows") {
    val df = Relational.q01SlidingWindowAgg(spark, sf)
    val totalCnt = df.agg(sum("cnt")).head.getLong(0)
    assert(totalCnt === 3 * nEvents)
  }

  test("q01 window starts are multiples of the 20s slide") {
    val bad = Relational.q01SlidingWindowAgg(spark, sf)
      .filter(col("window_start") % 20 =!= 0).count()
    assert(bad === 0)
  }

  test("q02 tumbling window: counts partition the input") {
    val df = Relational.q02TumblingWindowAgg(spark, sf)
    assert(df.agg(sum("cnt")).head.getLong(0) === nEvents)
  }

  test("q03 filter keeps only matching rows") {
    val df = Relational.q03FilterProject(spark, sf)
    assert(df.count() > 0)
    assert(df.filter(col("etype") =!= "PURCHASE").count() === 0)
    assert(df.filter(col("value_x2") <= 100.0).count() === 0)
  }

  test("q04 keyBy+reduce: one row per user, sums match global") {
    val df = Relational.q04KeyByReduce(spark, sf).cache()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(df.count() === users)
    val total = df.agg(sum("cnt")).head.getLong(0)
    assert(total === nEvents)
  }

  test("q05 range filter bounds hold") {
    val df = Relational.q05RangeWindowFilter(spark, sf)
    assert(df.filter(col("window_start") < 1704412800L ||
      col("window_end") > 1705017600L).count() === 0)
  }

  test("q06 broadcast enrich covers all events (every user_id has a customer)") {
    val df = Relational.q06BroadcastEnrich(spark, sf)
    assert(df.agg(sum("cnt")).head.getLong(0) === nEvents)
  }

  test("q10 topk is sorted desc and limited") {
    val rows = Relational.q10TopK(spark, sf).collect()
    assert(rows.length === 10)
    val vals = rows.map(_.getAs[Double]("total_value"))
    assert(vals.sameElements(vals.sorted(Ordering[Double].reverse)))
  }

  test("q13 rollup grand total equals event count") {
    val all = Relational.q13Rollup(spark, sf)
      .filter(col("etype") === "(all)").head
    assert(all.getAs[Long]("cnt") === nEvents)
  }

  test("results are partitioning-invariant: q01/q07/q37 identical at width 3 and 8") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def runAll(): Seq[Seq[org.apache.spark.sql.Row]] = Seq(
      graft.operators.Relational.q01SlidingWindowAgg(spark, sf).collect().toSeq,
      graft.operators.Percentiles.q07PctHistogram(spark, sf).collect().toSeq,
      graft.operators.TextAnalysis.q37TfIdf(spark, sf).collect().toSeq)
    val atDefault = runAll()
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try {
      val atThree = runAll()
      // decimal sums, histogram merges, and rounded tf-idf ranking must
      // not depend on partition count / merge order (the 1000-executor
      // determinism property dsum exists for)
      assert(atDefault === atThree)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("q34 approx distinct is within 5% of exact countDistinct") {
    val approx = Relational.q34ApproxDistinct(spark, sf)
      .select("event_type", "approx_users").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy("event_type").agg(countDistinct("user_id").as("u")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.05,
        s"$k: approx=${approx(k)} exact=$e")
    }
  }

  test("q14 analytic window: at most 3 rows per user, rn in 1..3") {
    val df = Relational.q14AnalyticWindow(spark, sf).cache()
    assert(df.groupBy("user_id").count().filter(col("count") > 3).count() === 0)
    assert(df.filter(col("rn") < 1 || col("rn") > 3).count() === 0)
  }

  test("q63 CDC merge: updates win, deletes drop, untouched keys survive") {
    val rows = Relational.q63CdcMerge(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val keys = Tables.orders(spark, sf).select("o_orderkey").collect()
      .map(_.getLong(0))
    val updated = keys.count(k => k % 7 == 0 && k % 11 != 0)
    val deleted = keys.count(k => k % 7 == 0 && k % 11 == 0)
    assert(rows.getOrElse("U", 0L) === updated,
      "every non-deleted update key must surface at its new status")
    assert(rows.values.sum === keys.length - deleted,
      "merged snapshot = base minus deletes")
    assert(deleted > 0 && updated > 0, "the feed must exercise both paths")
  }

  test("q57 approx quantiles: rank error bounded by the GK accuracy guarantee") {
    // GK guarantee: the returned value's true rank is within n/accuracy
    // of the requested rank. Verify by computing each returned value's
    // exact rank per group.
    val approx = Relational.q57ApproxQuantiles(spark, sf).collect()
      .map(r => r.getString(0) -> Seq(0.5 -> r.getDouble(1),
        0.95 -> r.getDouble(2), 0.99 -> r.getDouble(3))).toMap
    val values = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(approx.keySet == values.keySet)
    approx.foreach { case (k, qs) =>
      val vs = values(k); val n = vs.length
      qs.foreach { case (p, v) =>
        val rank = vs.count(_ <= v)
        val want = p * n
        assert(math.abs(rank - want) <= n / 10000.0 + 1,
          s"$k p$p: value $v has rank $rank, expected ~$want of $n")
      }
    }
  }

  test("q75 gap fill: full hour grid, zero-filled gaps, mass conserved") {
    val df = Relational.q75GapFill(spark, sf).cache()
    val rows = df.collect()

    // The grid is exactly [min hour, max hour] x distinct types.
    val hours = rows.map(_.getLong(0)).distinct.sorted
    val types = rows.map(_.getString(1)).distinct.sorted
    assert(rows.length === hours.length * types.length,
      "every (hour, type) cell must be present exactly once")
    hours.zip(hours.tail).foreach { case (a, b) =>
      assert(b - a === 3600L, "hour grid must be dense, no missing steps")
    }

    // Zero-filled cells exist (the corpus has gaps) and carry (0, 0.0).
    val zeros = rows.filter(_.getLong(2) == 0L)
    assert(zeros.nonEmpty, "sf0.001 events must leave at least one gap")
    zeros.foreach(r => assert(r.getDouble(3) === 0.0))

    // Mass conservation: grid totals equal the raw corpus totals.
    val ev = Tables.events(spark, sf)
    assert(rows.map(_.getLong(2)).sum === ev.count())
    val rawSum = ev.agg(sum("value")).head.getDouble(0)
    val gridSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(gridSum - rawSum) < 1e-6)

    // Non-empty cells match a direct (hour, type) aggregation.
    val direct = ev.select(
        (floor(col("ts").cast("long") / 3600) * 3600).cast("long").as("ws"),
        col("event_type"), col("value"))
      .groupBy("ws", "event_type").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val want = direct.getOrElse((r.getLong(0), r.getString(1)), 0L)
      assert(r.getLong(2) === want)
    }
  }

  test("q78 timeline anomaly: z-scores match the dense-grid model") {
    val grid = Relational.q75GapFill(spark, sf)
      .select("window_start", "event_type", "cnt").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = grid.groupBy(_._2).toSeq.flatMap { case (et, cells) =>
      val n = cells.length
      val s1 = cells.map(_._3).sum
      val s2 = cells.map(c => c._3 * c._3).sum
      // the operator's exact double shape: integer sums, then one fixed
      // sequence of IEEE ops — bit-reproducible
      val mean = s1.toDouble / n
      val sd = math.sqrt((s2.toDouble - s1.toDouble * s1.toDouble / n) / (n - 1))
      cells.toSeq.map { case (ws, _, cnt) =>
        ((ws, et), (cnt, (cnt.toDouble - mean) / sd)) }
    }.toMap.filter { case (_, (_, z)) => math.abs(z) >= Relational.ZThresh }
    val got = Relational.q78TimelineAnomaly(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getDouble(4))))
      .toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, (cnt, z)) =>
      assert(got(k)._1 === cnt)
      assert(got(k)._2 === z, s"z at $k must be bit-equal to the model")
    }
    // the sparse grid keeps per-cell means low, so only the spike tail
    // can clear 2.5 sigma on this corpus — but it must actually fire
    assert(got.nonEmpty && got.values.forall(_._2 >= Relational.ZThresh),
      "this corpus's anomalies are all spikes (counts are bounded below by 0)")
  }
  test("q85 cube: marginals and grand total are consistent with the cells") {
    val rows = Relational.q85CubeSummary(spark, sf).collect()
      .map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val cells = rows.filter { case ((e, h), _) => e != "(all)" && h != -1 }
    // grand total equals the sum of the finest cells
    val (gn, gs) = rows(("(all)", -1))
    assert(gn === cells.values.map(_._1).sum)
    assert(math.abs(gs - cells.values.map(_._2).sum) < 1e-6 * math.abs(gs))
    // each event_type marginal equals the sum of its hour cells
    rows.keys.collect { case (e, -1) if e != "(all)" => e }.foreach { e =>
      val (n, s) = rows((e, -1))
      val sub = cells.filter(_._1._1 == e).values
      assert(n === sub.map(_._1).sum, s"count marginal for $e")
      assert(math.abs(s - sub.map(_._2).sum) < 1e-6 * math.abs(s).max(1.0))
    }
    // and symmetrically for each hour marginal
    rows.keys.collect { case ("(all)", h) if h != -1 => h }.foreach { h =>
      val (n, _) = rows(("(all)", h))
      assert(n === cells.filter(_._1._2 == h).values.map(_._1).sum)
    }
  }

  test("q89 pivot cells equal the direct (hr, type) group counts; rows sum to hour totals") {
    val ev = Tables.events(spark, sf)
      .select(hour(col("ts")).as("hr"), col("event_type"))
    val direct = ev.groupBy("hr", "event_type").count().collect()
      .map(r => ((r.getInt(0), r.getString(1)), r.getLong(2))).toMap
    val hourTotals = ev.groupBy("hr").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    val types = Seq("click", "error", "purchase", "signup", "view")
    val rows = Relational.q89Pivot(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSet === hourTotals.keySet)
    rows.foreach { r =>
      val hr = r.getInt(0)
      val cells = types.zipWithIndex.map { case (t, i) => t -> r.getLong(i + 1) }
      cells.foreach { case (t, n) => assert(n === direct.getOrElse((hr, t), 0L),
        s"cell ($hr, $t)") }
      assert(cells.map(_._2).sum === hourTotals(hr), s"row total at hr=$hr")
    }
  }

  test("q90 unpivot: every metric profiled over every row, stats match direct aggs") {
    val li = Tables.lineitem(spark, sf)
    val n = li.count()
    val rows = Relational.q90Unpivot(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(rows.keySet === Set("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    rows.foreach { case (m, (cnt, mn, mx, sm)) =>
      assert(cnt === n, s"metric $m must cover all rows")
      val d = li.agg(min(col(m)), max(col(m)),
        Relational.dsum(col(m))).head()
      assert(mn === d.getDouble(0) && mx === d.getDouble(1) && sm === d.getDouble(2),
        s"stats for $m")
    }
  }

  test("q91 json extraction: k parses for every event and stays in the generator range") {
    val rows = Relational.q91JsonExtract(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total === nEvents, "props.k must parse on every row")
    rows.foreach { r =>
      assert(r.getLong(2) >= 0 && r.getLong(3) <= 99, s"k range for ${r.getString(0)}")
      assert(r.getLong(5) <= 100, "distinct k bounded by the generator domain")
    }
  }

  test("q92 funnel agrees with an in-memory model of next-purchase gaps") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val windowUs = 24L * 3600 * 1000000
    val expected = evs.groupBy(_._1).flatMap { case (uid, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._3))
      val gaps = ordered.zipWithIndex.collect { case ((_, "click", _, ts), i) =>
        ordered.drop(i + 1).collectFirst { case (_, "purchase", _, pts) => pts - ts }
      }
      if (gaps.isEmpty) None
      else {
        val conv = gaps.flatten.filter(_ <= windowUs)
        Some(uid -> ((gaps.length.toLong, conv.length.toLong,
          if (conv.isEmpty) None else Some(conv.sum))))
      }
    }
    val got = Relational.q92FunnelLag(spark, sf).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    }.toMap
    assert(got === expected)
    // both regimes must occur on this corpus: converted and unconverted clicks
    assert(got.values.exists(_._2 > 0) && got.values.exists(v => v._1 > v._2))
  }
  test("q93 typed sessions align with q08 session windows (same gap, same sessions)") {
    val q08 = Relational.q08SessionWindow(spark, sf).collect()
      .map(r => ((r.getLong(1), r.getLong(0)), r.getLong(2))).toMap
    val q93 = graft.operators.TypedOps.q93TypedSessions(spark, sf).collect()
      .map(r => ((r.getLong(0), Math.floorDiv(r.getLong(1), 1000000L)), r.getLong(2)))
      .toMap
    assert(q93.keySet === q08.keySet, "session identity (user, start-second)")
    q93.foreach { case (k, n) => assert(n === q08(k), s"n_events at $k") }
    // the typed features must be internally consistent
    val rows = graft.operators.TypedOps.q93TypedSessions(spark, sf).collect()
    rows.foreach { r =>
      val n = r.getLong(2); val trans = r.getLong(3)
      assert(trans <= n - 1, "transitions bounded by adjacent pairs")
      if (n == 1) assert(r.isNullAt(4), "singleton sessions have no gap")
      else assert(r.getLong(4) <= 300L * 1000000, "gaps within a session stay under the gap bound")
    }
  }
  test("q96 SCD2: interval chains are well-formed and is_current is exact") {
    val rows = Relational.q96Scd2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getInt(3)), r.getBoolean(4)))
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (k, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.head._2 === 0, s"key $k must start at version 0")
      // each non-last version's valid_to == the next version
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 === Some(b._2), s"chain at key $k")
        case _ =>
      }
      assert(sorted.last._4.isEmpty, s"last version of $k is open-ended")
      // exactly one current row for live keys, none for deleted ones
      val deletedLast = k % 7 == 0 && k % 11 == 0
      assert(vs.count(_._5) === (if (deletedLast) 0 else 1), s"is_current at $k")
    }
    // updated keys carry two versions, untouched keys one
    assert(byKey.filter(_._1 % 7 == 0).forall(_._2.length == 2))
    assert(byKey.filterNot(_._1 % 7 == 0).forall(_._2.length == 1))
  }

  test("q98 star flagship equals the SQL-on-views reference answer") {
    Seq("lineitem", "orders", "customer", "nation", "region").foreach { t =>
      Tables.load(spark, sf, t).createOrReplaceTempView(t)
    }
    val viaSql = spark.sql(Relational.q98Sql).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val got = Relational.q98StarFlagship(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got === viaSql)
    assert(got.nonEmpty, "the 1996/ASIA slice is non-empty at every SF")
    // every ASIA nation present in customer data should appear
    assert(got.forall(_._3 > 0))
  }

  test("q102 decay features match a hand-computed per-user reference") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("value"), unix_timestamp(col("ts")).as("sec"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).map { case (u, rows) =>
      val tmax = rows.map(_._3).max
      val ws = rows.map { case (_, v, s) =>
        val k = math.min((tmax - s) / Relational.HalfLifeSec,
          Relational.MaxHalfLives)
        val w = 1.0 / (1L << k)
        (v * w, w)
      }
      // reference sums in BigDecimal to stay order-free like the operator
      val dv = ws.map(x => BigDecimal(x._1 * (1L << Relational.MaxHalfLives))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
        .toDouble / (1L << Relational.MaxHalfLives)
      u -> (dv, ws.map(_._2).sum, rows.length.toLong, tmax)
    }
    val got = Relational.q102DecayFeatures(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (u, (dv, dc, n, last)) =>
      val (gdv, gdc, gn, glast) = got(u)
      assert(gn === n && glast === last, s"counts/last at $u")
      assert(math.abs(gdc - dc) < 1e-9, s"decayed_count at $u")
      assert(math.abs(gdv - dv) < 1e-9, s"decayed_value at $u")
      // the newest event always contributes weight 1; nothing exceeds n
      assert(gdc >= 1.0 && gdc <= n.toDouble, s"weight bounds at $u")
    }
  }

  test("q103 skyline equals brute-force dominance over all parts") {
    val parts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    val expected = parts.filter { case (_, pr, sz) =>
      !parts.exists { case (_, pr2, sz2) =>
        pr2 <= pr && sz2 <= sz && (pr2 < pr || sz2 < sz)
      }
    }.map(_._1).toSet
    val got = Relational.q103Skyline(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q104 trend stats match a driver-side exact recomputation") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), unix_timestamp(col("ts")).as("x"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val got = Relational.q104RegrTrend(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val n = rows.length.toDouble
      val sx = rows.map(_._3.toDouble).sum
      val sxx = rows.map(r => BigDecimal(r._3) * BigDecimal(r._3)).sum.toDouble
      val sy = rows.map(_._2).sum
      val sxy = rows.map(r => r._3.toDouble * r._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val (gn, gslope, gint, gr2) = got(t)
      assert(gn === rows.length.toLong)
      assert(math.abs(gslope - slope * 3600.0) < 1e-4, s"slope at $t")
      assert(math.abs(gint - (sy - slope * sx) / n) < 1e-3, s"intercept at $t")
      assert(gr2 >= 0.0 && gr2 <= 1.0 + 1e-9, s"r2 in range at $t")
    }
  }

  test("q105 observed metrics equal the result rows — one scan, zero extra pass") {
    val res = graft.operators.Observability.q105ObserveQuality(spark, sf)
    val rows = res.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val metrics = res.queryExecution.observedMetrics("graft_quality")
    val names = graft.operators.Observability.rules.map(_._1)
    names.foreach { rule =>
      assert(metrics.getAs[Long](rule) === rows(rule)._1,
        s"observe counter for $rule must equal the aggregated result")
    }
    assert(metrics.getAs[Long]("n_rows") === rows(names.head)._2)
    // at least one rule fires on this corpus, none flags every row
    assert(rows.values.exists(_._1 > 0))
    assert(rows.values.forall(v => v._1 < v._2))
  }

  test("q107 grouped top-k: exactly k ranked winners per group, correctly ordered") {
    val rows = Relational.q107GroupedTopK(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(4)))
    val byType = rows.groupBy(_._1)
    byType.foreach { case (t, vs) =>
      assert(vs.map(_._4).sorted.toSeq === (1 to Relational.TopKPerGroup),
        s"ranks at $t")
      val ordered = vs.sortBy(_._4).map(_._3)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b },
        s"descending totals at $t")
    }
    // winner really is the group max of the per-user totals
    val totals = Tables.events(spark, sf)
      .groupBy(col("event_type"), col("user_id"))
      .agg(Relational.dsum(col("value")).as("tv"))
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    byType.foreach { case (t, vs) =>
      val best = totals.filter(_._1 == t).map(_._2).max
      assert(vs.find(_._4 == 1).get._3 === best, s"winner at $t")
    }
  }

  test("q108 equal-frequency bins: balanced counts, ordered non-overlapping ranges") {
    val rows = Relational.q108EqualFreqBins(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    rows.groupBy(_._1).foreach { case (t, vs) =>
      assert(vs.map(_._2).sorted.toSeq === (1 to Relational.CalibBins), s"bins at $t")
      val counts = vs.map(_._3)
      assert(counts.max - counts.min <= 1, s"equal-frequency at $t")
      val ordered = vs.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4 + 1e-12,
          s"bin ranges must not overlap at $t")
        case _ =>
      }
    }
  }

  test("q109 skew profile matches a direct recount for every candidate key") {
    val li = Tables.lineitem(spark, sf)
    val got = graft.operators.Profiling.q109SkewProfile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    graft.operators.Profiling.SkewCols.foreach { c =>
      val counts = li.groupBy(col(c)).count().collect().map(_.getLong(1))
      val (ndv, n, mx) = got(c)
      assert(ndv === counts.length.toLong, s"ndv at $c")
      assert(n === counts.sum, s"rows at $c")
      assert(mx === counts.max, s"max at $c")
    }
    // the profiler orders the skew decision: flag columns separate from keys
    assert(got("l_returnflag")._1 < got("l_orderkey")._1)
  }

  test("q110 sliding distinct equals per-window exact distinct; n_users <= n_events") {
    val rows = Relational.q110SlidingDistinct(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall { case (_, u, e) => u >= 1 && u <= e })
    // brute-force one window: recompute its distinct users directly
    val (ws, nu, _) = rows(rows.length / 2)
    val direct = Tables.events(spark, sf)
      .filter(unix_timestamp(col("ts")).geq(ws) &&
        unix_timestamp(col("ts")).lt(ws + 60))
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(nu === direct, s"window $ws distinct users")
  }

  test("q111 cohort retention: offset-0 retention is 1.0 and counts are monotone-bounded") {
    val rows = Relational.q111CohortRetention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (c, vs) =>
      val d0 = vs.find(_._2 == 0L).get
      assert(d0._3 === d0._4 && d0._5 === 1.0,
        s"every cohort member is active on their first day ($c)")
      vs.foreach { v =>
        assert(v._3 <= v._4, s"active never exceeds cohort size at $c")
        assert(v._2 >= 0, s"no negative offsets at $c")
      }
    }
    // cohort sizes partition the user base exactly
    val users = Tables.events(spark, sf)
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(byCohort.values.map(_.head._4).sum === users)
  }

  test("q118 pareto: cumulative share is monotone to 1.0, head flag flips once") {
    val rows = Relational.q118ParetoShare(spark, sf).collect()
      .map(r => (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .sortBy(_._1)
    assert(rows.head._1 === 1)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 <= b._3 + 1e-12, "cumulative share is monotone")
        assert(a._2 >= b._2, "revenue ranks descending")
        assert(a._4 || !b._4, "head flag never turns back on")
      case _ =>
    }
    assert(math.abs(rows.last._3 - 1.0) < 1e-9, "shares sum to 1")
    assert(rows.exists(_._4) && rows.exists(!_._4), "the 0.8 cut is interior")
  }

  test("q119 transition matrix: probabilities row-normalize, counts conserve") {
    val rows = Relational.q119TransitionMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (from, vs) =>
      assert(math.abs(vs.map(_._4).sum - 1.0) < 1e-6, s"row $from normalizes")
      val rowN = vs.map(_._3).sum
      vs.foreach(v => assert(
        math.abs(v._4 - v._3.toDouble / rowN) < 1e-9, s"p at $from->${v._2}"))
    }
    // total transitions = events - users (each user contributes n-1 pairs)
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select(countDistinct(col("user_id")))
      .collect()(0).getLong(0)
    assert(rows.map(_._3).sum === expected)
  }

  test("q112 snapshot diff: classes partition the key space with exact counts") {
    val rows = Relational.q112SnapshotDiff(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val n = Tables.orders(spark, sf).count()
    val keys = Tables.orders(spark, sf).select(col("o_orderkey"))
      .collect().map(_.getLong(0))
    val removed  = keys.count(_ % 13 == 0)
    val added    = keys.count(_ % 17 == 0)
    val changed  = keys.filter(_ % 13 != 0)
      .count(k => k % 7 == 0 || k % 5 == 0)
    assert(rows("removed")._1 === removed)
    assert(rows("added")._1 === added)
    assert(rows("changed")._1 === changed)
    assert(rows("unchanged")._1 === n - removed - changed)
    // per-column deltas decompose the changed class
    assert(rows("changed")._2 === keys.filter(_ % 13 != 0).count(_ % 7 == 0))
    assert(rows("changed")._3 === keys.filter(_ % 13 != 0).count(_ % 5 == 0))
  }

  test("q121 concurrency sweep: deltas telescope to zero, active matches a direct recount") {
    val rows = Relational.q121SessionConcurrency(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // the sweep opens and closes every session exactly once
    assert(rows.map(_._2).sum === 0L, "deltas telescope to 0")
    assert(rows.last._3 === 0L, "after the last boundary nothing is active")
    assert(rows.forall(_._3 >= 0L), "active count never goes negative")
    // active at each boundary = running sum of deltas (window parity)
    var run = 0L
    rows.foreach { case (m, d, a) => run += d; assert(a === run, s"at $m") }
    // direct recount at 3 sample minutes: sessions overlapping the minute
    val sess = {
      val evs = Tables.events(spark, sf)
        .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .groupBy(_._1)
      evs.values.flatMap { g =>
        val ts = g.map(t => (t._2, t._3)).sorted
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var s = ts.head._1; var p = ts.head._1
        ts.tail.foreach { case (t, _) =>
          if (t - p > 300000000L) { out += ((s, p)); s = t }
          p = t
        }
        out += ((s, p)); out
      }.toSeq
    }
    val boundaries = rows.map(_._1)
    Seq(boundaries.head, boundaries(boundaries.length / 2),
        boundaries(boundaries.length / 4)).foreach { m =>
      val expected = sess.count { case (s, e) =>
        s / 60000000L * 60 <= m && e / 60000000L * 60 >= m }
      val got = rows.filter(_._1 <= m).map(_._2).sum
      assert(got === expected, s"active sessions at minute $m")
    }
  }

  test("q131: merged base+delta partial states equal the direct full aggregate") {
    import org.apache.spark.sql.functions._
    val inc = operators.Relational.q131IncrementalAgg(spark, sf)
    val full = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(25,6)")).cast("double").as("sum_value"),
        (sum(col("value").cast("decimal(25,6)")).cast("double") /
          count(lit(1))).as("avg_value"),
        max(col("ts")).as("last_ts"))
    assert(inc.count() == full.count())
    assert(inc.except(full).count() == 0 && full.except(inc).count() == 0)
  }

  test("q131: the delta partition is non-empty (the merge path is actually exercised)") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val cut = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0).toInstant
      .minus(java.time.Duration.ofDays(1))
    val delta = ev.filter(col("ts") >= lit(java.sql.Timestamp.from(cut))).count()
    val base = ev.count() - delta
    assert(delta > 0 && base > 0, s"base=$base delta=$delta")
  }

  test("q132: a single-row mutation flips exactly its own bucket's checksum") {
    import org.apache.spark.sql.functions._
    val orders = Tables.orders(spark, sf).cache()
    val clean = operators.Relational.checksumOrders(orders).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val victim = orders.select("o_orderkey").orderBy("o_orderkey")
      .limit(1).collect()(0).getLong(0)
    val mutated = orders.withColumn("o_custkey",
      when(col("o_orderkey") === victim, col("o_custkey") + 1)
        .otherwise(col("o_custkey")))
    val dirty = operators.Relational.checksumOrders(mutated).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(clean.keySet == dirty.keySet)
    val diff = clean.keySet.filter(b => clean(b) != dirty(b))
    assert(diff == Set(victim % operators.Relational.ChecksumBuckets),
      s"diverged buckets: $diff")
    // counts and key sums survive an attribute mutation - only the xor moves
    val b = diff.head
    assert(clean(b)._1 == dirty(b)._1 && clean(b)._3 == dirty(b)._3)
    assert(clean(b)._2 != dirty(b)._2)
  }

  test("q132: checksum is partitioning-invariant (xor/count/sum are order-free)") {
    val orders = Tables.orders(spark, sf)
    val a = operators.Relational.checksumOrders(orders).collect().toSeq
    val b = operators.Relational.checksumOrders(
      orders.repartition(13)).collect().toSeq
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet)
  }

  test("q138: pair supports match a driver-side basket recompute; lift exact") {
    val rows = Relational.q138ItemsetPairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    val baskets = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000"),
        col("event_type")).distinct().collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getString(2)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nB = baskets.size.toLong
    val marg = baskets.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val pairCounts = baskets.values.toSeq
      .flatMap(ts => ts.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows.nonEmpty)
    assert(rows.map(t => (t._1, t._2)).toSet == pairCounts.keySet)
    rows.foreach { case (t1, t2, pn, c1, c2, n, lift) =>
      assert(pn == pairCounts((t1, t2)))
      assert(c1 == marg(t1) && c2 == marg(t2) && n == nB)
      assert(pn <= math.min(c1, c2), "support bounded by marginals")
      val exp = BigDecimal(pn.toDouble * n / (c1.toDouble * c2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(lift === exp, s"lift of ($t1,$t2)")
    }
  }

  test("q139: clean FK edges report zero orphans and consistent fanout") {
    val rows = operators.Profiling.q139FkProfile(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.length == 4)
    rows.foreach { case (edge, nRows, nKeys, oRows, oKeys, refKeys, fanout) =>
      assert(oRows == 0L && oKeys == 0L, s"$edge must be clean")
      assert(refKeys == nKeys, s"$edge: all child keys referenced")
      assert(nRows >= nKeys && fanout >= 1.0, s"$edge fanout sane")
    }
  }

  test("q139: the orphan detector fires on a planted dangling key") {
    val child = Tables.lineitem(spark, sf)
    val victimRows = 7L
    val mutated = child.withColumn("l_orderkey",
      when(row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy("l_orderkey", "l_linenumber")) <= victimRows,
        lit(-999L)).otherwise(col("l_orderkey")))
    val prof = operators.Profiling.fkProfileEdge("probe",
      mutated, "l_orderkey", Tables.orders(spark, sf), "o_orderkey")
      .collect()(0)
    assert(prof.getLong(3) == victimRows, "orphan rows counted exactly")
    assert(prof.getLong(4) == 1L, "one dangling key")
  }

  test("q152: correlation stats match a driver-side zero-filled series recompute") {
    val rows = Relational.q152SeriesCorr(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getDouble(8)))
    val ev = Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) div 3600000000 AS hr", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (h0, h1) = (ev.map(_._1).min, ev.map(_._1).max)
    val types = ev.map(_._2).distinct.sorted
    val counts = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .withDefaultValue(0L)
    val series = types.map(t =>
      t -> (h0 to h1).map(h => counts((h, t)))).toMap
    assert(rows.length == types.combinations(2).size)
    rows.foreach { case (t1, t2, n, sx, sy, sxy, sxx, syy, r) =>
      val (xs, ys) = (series(t1), series(t2))
      assert(n == xs.length)
      assert(sx == xs.sum && sy == ys.sum)
      assert(sxy == xs.zip(ys).map { case (a, b) => a * b }.sum)
      assert(sxx == xs.map(a => a * a).sum && syy == ys.map(a => a * a).sum)
      val num = n.toDouble * sxy - sx.toDouble * sy
      val den = math.sqrt(n.toDouble * sxx - sx.toDouble * sx) *
        math.sqrt(n.toDouble * syy - sy.toDouble * sy)
      val exp = BigDecimal(num / den)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r === exp, s"corr of ($t1,$t2)")
      assert(r >= -1.0 && r <= 1.0)
    }
  }

  test("q153: interpolated points lie on the segment between their neighbors") {
    val rows = Relational.q153InterpResample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getString(3)))
    assert(rows.nonEmpty)
    // UNROUNDED observed means (the engine interpolates from these, then
    // rounds once — interpolating from the rounded outputs drifts 1e-6)
    val rawObs = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) div 3600000000 AS hr",
        "CAST(value AS DECIMAL(25,6)) AS v")
      .groupBy("event_type", "hr")
      .agg(expr("CAST(SUM(v) AS DOUBLE) / COUNT(*)").as("obs"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    rows.groupBy(_._1).foreach { case (t, series) =>
      val sorted = series.sortBy(_._2)
      // grid is contiguous
      assert(sorted.map(_._2).toSeq ==
        (sorted.head._2 to sorted.last._2).toSeq, s"grid of $t")
      val obs = sorted.filter(_._4 == "obs")
      assert(obs.nonEmpty)
      sorted.filter(_._4 == "interp").foreach { case (_, h, Some(v), _) =>
        val ph = obs.filter(_._2 < h).maxBy(_._2)._2
        val nh = obs.filter(_._2 > h).minBy(_._2)._2
        val (pv, nv) = (rawObs((t, ph)), rawObs((t, nh)))
        val exp = BigDecimal(pv + (nv - pv) * (h - ph) / (nh - ph))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(v === exp, s"interp at ($t, $h)")
      case other => fail(s"interp row with null value: $other")
      }
      // edges have no value and never sit between two observations
      sorted.filter(_._4 == "edge").foreach { case (_, h, v, _) =>
        assert(v.isEmpty)
        assert(h < obs.map(_._2).min || h > obs.map(_._2).max)
      }
    }
  }

  test("q154: weighted median satisfies the half-mass property exactly") {
    val rows = Relational.q154WeightedMedian(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val docs = Tables.documents(spark, sf)
      .selectExpr("lang", "n_chars",
        "CAST(size(split(trim(text), ' +')) AS LONG) AS w")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(rows.map(_._1).toSet == docs.keySet)
    rows.foreach { case (lang, med, mass) =>
      val ds = docs(lang)
      assert(mass == ds.map(_._3).sum)
      val below = ds.filter(_._2 <= med).map(_._3).sum
      val strictlyBelow = ds.filter(_._2 < med).map(_._3).sum
      assert(below * 2 >= mass, s"$lang: half the mass at or below the median")
      assert(strictlyBelow * 2 < mass, s"$lang: median is the SMALLEST such value")
    }
  }

  test("q155: burstiness bounded and sufficient stats match a driver recompute") {
    val rows = Relational.q155InterEventStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val byUser = Tables.events(spark, sf)
      .selectExpr("user_id", "CAST(FLOOR(unix_micros(ts) / 1e6) AS LONG) AS s",
        "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (t._2, t._3)).map(_._2)).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (u, n, sg, sgg, mean, b) =>
      val gaps = byUser(u).toSeq.sliding(2)
        .collect { case Seq(a, c) => c - a }.toSeq
      assert(n == gaps.length && sg == gaps.sum)
      assert(sgg == gaps.map(g => g * g).sum)
      assert(mean === BigDecimal(sg.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(b >= -1.0 && b <= 1.0, s"burstiness bounds for user $u")
    }
  }

  test("q158: top paths match a driver-side path count over ordered user journeys") {
    val rows = Relational.q158PathMining(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val journeys = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(t => (t._2, t._3)).map(_._4).toSeq).toMap
    val counts = journeys.values.toSeq
      .flatMap(_.sliding(3).filter(_.length == 3).map(_.mkString(">")))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = counts.values.sum
    val expTop = counts.toSeq.sortBy { case (p, n) => (-n, p) }
      .take(Relational.PathTopK).sortBy(_._1)
    assert(rows.map(t => (t._1, t._2)).toSeq == expTop)
    rows.foreach { case (p, n, sh) =>
      val exp = BigDecimal(n.toDouble / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(sh === exp, s"share of $p")
    }
  }

  test("q159: Wilson intervals bracket p_hat, stay in [0,1], and narrow with n") {
    val rows = Relational.q159FunnelCi(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty && rows.forall(t => t._1 >= 0 && t._1 < 24))
    rows.foreach { case (h, n, k, p, lo, hi) =>
      assert(k <= n)
      assert(math.abs(p - BigDecimal(k.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(lo >= 0.0 && hi <= 1.0, s"hour $h: interval clipped to [0,1]")
      assert(lo <= p + 1e-9 && p <= hi + 1e-9, s"hour $h: p inside interval")
      // exact Wilson recompute
      val z = 1.96
      val ph = k.toDouble / n
      val den = 1.0 + z * z / n
      val ctr = ph + z * z / (2.0 * n)
      val rad = z * math.sqrt(ph * (1 - ph) / n + z * z / (4.0 * n * n))
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(lo === r6((ctr - rad) / den) && hi === r6((ctr + rad) / den),
        s"hour $h: Wilson bounds")
    }
  }

  test("q180 MI audit: cells recount, zero cells contribute zero MI") {
    val docs = Tables.documents(spark, sf).select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toLong
    val cell = docs.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap.withDefaultValue(0L)
    val mi = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val mj = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val rows = Relational.q180MiAudit(spark, sf).collect()
    assert(rows.length === mi.size * mj.size, "full grid incl zero cells")
    assert(rows.map(_.getLong(2)).sum === n, "cells partition the corpus")
    rows.foreach { r =>
      val (l, s, nij, ni, nj) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nij === cell((l, s)))
      assert(ni === mi(l) && nj === mj(s))
      val e = ni.toDouble * nj / n
      assert(r.getDouble(5) === e, s"expected at ($l,$s)")
      if (nij == 0) assert(r.getDouble(6) === 0.0, "zero-cell MI term")
      val dev = nij.toDouble - e
      assert(r.getDouble(7) === dev * dev / e, s"chi2 at ($l,$s)")
    }
  }

  test("q181 rules: directions agree with q138 supports, thresholds hold") {
    val pairs = Relational.q138ItemsetPairs(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val rules = Relational.q181AssocRules(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(5), r.getDouble(6)))
    assert(rules.nonEmpty, "the event corpus produces rules")
    rules.foreach { case (ant, con, pn, c1, nb, conf) =>
      val key = if (ant < con) (ant, con) else (con, ant)
      assert(pairs(key) === pn, s"$ant->$con support equals q138's pair")
      assert(conf === pn.toDouble / c1, s"$ant->$con confidence")
      assert(pn.toDouble >= Relational.RuleMinSupport * nb)
      assert(conf >= Relational.RuleMinConf)
    }
    // directedness: confidence must differ across directions somewhere
    // (marginals differ), even when both directions survive the prune
    val conf = rules.map(r => (r._1, r._2) -> r._6).toMap
    assert(conf.exists { case ((a, c), v) =>
      conf.get((c, a)).forall(_ != v) },
      "confidence is asymmetric whenever marginals differ")
  }

  test("q182 Spearman: rho matches an average-rank brute force per pair") {
    val counts = Tables.documents(spark, sf)
      .selectExpr("source", "explode(split(trim(text), ' +')) AS t")
      .groupBy("source", "t").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySource = counts.groupBy(_._1).view
      .mapValues(_.map(x => x._2 -> x._3).toMap).toMap
    def doubledRanks(xs: Seq[Long]): Map[Long, Long] = {
      // doubled average rank per VALUE: 2*minrank + ties - 1
      val sorted = xs.sorted
      sorted.distinct.map { v =>
        val lt = sorted.count(_ < v); val ties = sorted.count(_ == v)
        v -> (2L * (lt + 1) + ties - 1)
      }.toMap
    }
    val rows = Relational.q182SpearmanDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.take(5).foreach { r =>
      val (s1, s2, n, rho) = (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(8))
      val sharedToks = bySource(s1).keySet intersect bySource(s2).keySet
      assert(n === sharedToks.size.toLong, s"shared vocab of ($s1,$s2)")
      val ca = sharedToks.toSeq.map(bySource(s1))
      val cb = sharedToks.toSeq.map(bySource(s2))
      val (rka, rkb) = (doubledRanks(ca), doubledRanks(cb))
      val xs = ca.map(rka); val ys = cb.map(rkb)
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val sxx = xs.map(x => x * x).sum; val syy = ys.map(y => y * y).sum
      val exp = BigDecimal(
        (n.toDouble * sxy - sx.toDouble * sy) /
          (math.sqrt(n.toDouble * sxx - sx.toDouble * sx) *
            math.sqrt(n.toDouble * syy - sy.toDouble * sy)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rho === exp, s"rho of ($s1,$s2)")
      assert(rho >= -1.0 && rho <= 1.0)
    }
  }

  test("q173 k-anonymity: k/l flags fire exactly on planted classes") {
    import spark.implicits._
    val df = (
      // class (0,0): k=6, l=3 — safe
      Seq("A", "B", "C", "A", "B", "C").map(s => (0, 0L, s)) ++
      // class (1,0): k=2 < 5 — at risk even with l=2
      Seq("A", "B").map(s => (1, 0L, s)) ++
      // class (2,0): k=6 >= 5 but l=1 — attribute disclosure
      Seq.fill(6)((2, 0L, "A"))
    ).toDF("nation", "bal_band", "seg")
    val got = operators.Profiling
      .kAnonymityAudit(df, Seq("nation", "bal_band"), "seg").collect()
      .map(r => (r.getInt(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSet === Set(
      (0, 6L, 3L, false), (1, 2L, 2L, true), (2, 6L, 1L, true)))
  }

  test("q173: classes partition the table — k sums to the row count") {
    val rows = operators.Profiling.q173KAnonymity(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum === Tables.customer(spark, sf).count())
    assert(rows.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= 5),
      "l is bounded by the segment cardinality")
  }

  test("q175 exact quantile: multi-pass narrowing equals the sorted truth") {
    val vals = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice").as("v")).cache()
    val sorted = vals.collect().map(_.getDouble(0)).sorted
    val n = sorted.length
    // buckets=4, threshold=16 forces ~log_4(6000/16) ≈ 5 narrowing
    // passes — the 100 TB code path, not the small-input shortcut.
    Seq(1L, 2L, n / 2L, n - 1L, n.toLong).foreach { k =>
      val got = operators.Profiling.exactKth(vals, k,
        buckets = 4, threshold = 16)
      assert(got === sorted(k.toInt - 1), s"k=$k")
    }
    vals.unpersist()
  }

  test("q176 Benford audit: counts, shares, and chi2 terms match a recount") {
    val prices = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0))
      .filter(_ >= 1.0)
    val digitOf = (x: Double) => math.floor(x).toLong.toString.head.asDigit
    val counts = prices.groupBy(digitOf).view.mapValues(_.length.toLong)
      .toMap.withDefaultValue(0L)
    val total = prices.length.toLong
    val rows = operators.Profiling.q176Benford(spark, sf).collect()
    assert(rows.length === 9, "all nine digits present even at count 0")
    rows.foreach { r =>
      val (d, n, share, e, chi) = (r.getInt(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(n === counts(d), s"digit $d count")
      assert(share === n.toDouble / total)
      val dev = n.toDouble - e * total
      assert(chi === dev * dev / (e * total), s"digit $d chi2 term")
    }
    assert(rows.map(_.getLong(1)).sum === total)
  }

  test("q177 KS drift: D equals the brute-force two-sample statistic") {
    val vals = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice"), col("l_orderkey")).collect()
      .map(r => (r.getDouble(0), r.getLong(1) % 2 == 0))
    val a = vals.filter(_._2).map(_._1).sorted
    val b = vals.filterNot(_._2).map(_._1).sorted
    val cuts = (a ++ b).distinct.sorted
    val brute = cuts.map { v =>
      val d = math.abs(a.count(_ <= v).toDouble / a.length
        - b.count(_ <= v).toDouble / b.length)
      (d, v)
    }.maxBy { case (d, v) => (d, -v) }
    val row = operators.Profiling.q177KsDrift(spark, sf).collect()(0)
    assert(row.getLong(0) === a.length.toLong)
    assert(row.getLong(1) === b.length.toLong)
    assert(row.getDouble(3) === brute._1, "exact D statistic")
    assert(row.getDouble(2) === brute._2, "argmax value, smallest on ties")
  }

  test("q175: output ranks follow k = ceil(q*n) and values are data values") {
    val rows = operators.Profiling.q175ExactQuantile(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2)))
    val sorted = Tables.lineitem(spark, sf)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    val n = sorted.length
    assert(rows.map(_._1).toSeq == operators.Profiling.QuantileQs)
    rows.foreach { case (q, k, v) =>
      assert(k === math.max(1L, math.ceil(q * n).toLong), s"rank rule at $q")
      assert(v === sorted(k.toInt - 1), s"value at $q")
    }
  }

  test("q198 markov power matches a driver-side integer matrix cube") {
    // independent replay: per-user chains sorted by (ts, event_id),
    // pair counts, micro-unit rows, two integer multiply-rescale steps
    val ev = Tables.events(spark, sf)
    val rows = ev.select(col("user_id"),
        Tables.tsMicrosCol(ev).as("tsu"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getString(3)))
    val counts = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    rows.groupBy(_._1).values.foreach { chain =>
      val types = chain.sortBy(e => (e._2, e._3)).map(_._4)
      types.sliding(2).foreach {
        case Array(a, b) => counts((a, b)) += 1
        case _           =>
      }
    }
    val rowN = counts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val p = counts.map { case ((a, b), n) => (a, b) -> n * 1000000L / rowN(a) }
    def mul(x: Map[(String, String), Long], y: Map[(String, String), Long]) = {
      val s = scala.collection.mutable.Map[(String, String), Long]()
        .withDefaultValue(0L)
      for (((a, m), pv) <- x; ((m2, b), qv) <- y if m == m2)
        s((a, b)) += pv * qv
      s.map { case (k, v) => k -> v / 1000000L }.toMap
    }
    val expect = mul(mul(p.toMap, p.toMap), p.toMap)
    val got = Relational.q198MarkovPower(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expect, "bit-exact micro-unit matrix cube")
    // after rescaling, every row's 3-step mass stays near 1.0 (floor
    // division only loses mass, never gains)
    got.groupBy(_._1._1).values.foreach { row =>
      val mass = row.values.sum
      assert(mass <= 1000000L && mass > 900000L, s"row mass $mass")
    }
  }

  test("q201 poisson bootstrap matches a driver replay; CI brackets the mean") {
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cdf = Array(0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
      0.9810118431238462, 0.9963401531726563, 0.9994058151824183,
      0.9999167588507119)
    def w(docId: Long, b: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s"$docId:$b".getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString.take(12)
      val u = (java.lang.Long.parseLong(hex, 16) + 1.0) / 281474976710657.0
      cdf.indexWhere(u < _) match { case -1 => 7L; case k => k.toLong }
    }
    val expect = (0 until operators.Profiling.BootB).map { b =>
      var (sw, swx) = (0L, 0L)
      for ((id, x) <- docs) { val wi = w(id, b); sw += wi; swx += wi * x }
      (b.toLong, sw, BigDecimal(swx.toDouble / sw)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = operators.Profiling.q201PoissonBoot(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === expect, "bit-exact resample weights and means")
    // the bootstrap distribution brackets the true mean
    val trueMean = docs.map(_._2).sum.toDouble / docs.length
    val means = got.map(_._3).sorted
    assert(means.head <= trueMean && trueMean <= means.last,
      s"true mean $trueMean outside [${means.head}, ${means.last}]")
  }

  test("q202 CUSUM changepoints match an exact driver-side scan") {
    val docs = Tables.documents(spark, sf).select("source", "doc_id", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, rows) =>
      val xs = rows.sortBy(_._2)
      val n = xs.length.toLong
      val s = xs.map(_._3).sum
      var (px, k) = (0L, 0L)
      var (peak, cp) = (-1L, 0L)
      for ((_, docId, x) <- xs) {
        px += x; k += 1
        val a = math.abs(n * px - k * s)
        if (a > peak) { peak = a; cp = docId } // first (smallest doc_id) wins
      }
      (src, n, cp, peak, BigDecimal(peak.toDouble / (n * s.toDouble))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = operators.Profiling.q202SourceCusum(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got === expect, "exact scaled-integer CUSUM peak and argmax")
    // the normalized drift lives in [0, 1) by construction
    assert(got.forall(t => t._5 >= 0.0 && t._5 < 1.0))
  }

  test("q210 AMS F2 sketch matches an exact integer replay") {
    val keys = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey").collect().map(_.getLong(0))
    val f = keys.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val exactF2 = f.values.map(v => v * v).sum
    def sign(j: Int, k: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s"$j:$k".getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString.take(8)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1L else -1L
    }
    val z = (1 to 32).map(j => f.map { case (k, v) => sign(j, k) * v }.sum)
    val means = z.grouped(8).map(g => g.map(v => v * v).sum / 8).toSeq
    val sorted = means.sorted // grp tiebreak irrelevant for the SUM of mid-2
    val est = (sorted(1) + sorted(2)) / 2
    val row = operators.Profiling.q210AmsF2(spark, sf).collect().head
    assert(row.getLong(0) === f.size.toLong, "n_keys")
    assert(row.getLong(1) === keys.length.toLong, "n_rows")
    assert(row.getLong(2) === exactF2, "exact_f2")
    assert(row.getLong(3) === est, "identical median-of-means estimate")
    assert(row.getLong(4) ===
      1000000L * math.abs(est - exactF2) / exactF2, "err_ppm")
    // median-of-means over 4 groups of 8: inside ~sqrt(2/8) whp — pin a
    // generous deterministic ceiling on this corpus
    assert(row.getLong(4) <= 600000L, s"err_ppm ${row.getLong(4)}")
  }

  test("q222 rendezvous audit matches a replay; HRW moves keys only to the new shard") {
    val ids = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0))
    def hkey(s: Int, d: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$s:$d".getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString.take(12)
      java.lang.Long.parseLong(hex, 16) * 16 + s
    }
    val assign = ids.map { d =>
      val keys = (0 until 9).map(s => hkey(s, d))
      (d, keys.take(8).max % 16, keys.max % 16)
    }
    val expect = (0L until 9L).map { s =>
      (s, assign.count(_._2 == s).toLong, assign.count(_._3 == s).toLong,
        assign.count(a => a._3 == s && a._2 != a._3).toLong)
    }
    val got = operators.Bucketing.q222RendezvousAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expect, "exact HRW assignments before and after the grow")
    // minimal disruption: NO old shard gains a key; both rings carry the
    // whole population; the new shard takes ~1/9 (binomial, wide slack)
    assert(got.filter(_._1 < 8L).forall(_._4 === 0L),
      "HRW must move keys only to the new shard")
    assert(got.map(_._2).sum === ids.length.toLong)
    assert(got.map(_._3).sum === ids.length.toLong)
    val moved = got.last._4.toDouble / ids.length
    assert(moved > 1.0 / 18 && moved < 2.0 / 9, s"moved fraction $moved")
  }

  test("q220 RFM segmentation matches a driver replay; population conserved") {
    import org.apache.spark.sql.functions.unix_micros
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val mOrd = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(operators.Relational.dsum(col("o_totalprice")).as("m")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val mx = ev.map(_._2).max
    val users = ev.groupBy(_._1).toSeq.map { case (u, es) =>
      (u, (mx - es.map(_._2).max) / 86400000000L, es.length.toLong,
        mOrd.getOrElse(u, 0.0))
    }
    def terciles[A](xs: Seq[(Long, A)])(implicit ord: Ordering[A])
        : Map[Long, Long] = {
      val sorted = xs.sortBy { case (id, v) => (v, id) }
      val n = sorted.size
      val (base, extra) = (n / 3, n % 3)
      sorted.zipWithIndex.map { case ((id, _), i) =>
        // ntile: the first (n mod 3) buckets carry one extra row
        val cut1 = base + (if (extra >= 1) 1 else 0)
        val cut2 = cut1 + base + (if (extra >= 2) 1 else 0)
        id -> (if (i < cut1) 1L else if (i < cut2) 2L else 3L)
      }.toMap
    }
    val rT = terciles(users.map(u => (u._1, u._2)))
    val fT = terciles(users.map(u => (u._1, u._3)))
    val mT = terciles(users.map(u => (u._1, u._4)))
    val expect = users.groupBy(u => (rT(u._1), fT(u._1), mT(u._1))).toSeq
      .sortBy(_._1).map { case ((r, f, m), us) =>
        val sumM = us.map(u => BigDecimal(u._4)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
        (r, f, m, us.size.toLong,
          1000000L * us.map(_._3).sum / us.size, sumM.toDouble)
      }
    val got = operators.Relational.q220RfmSegments(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got === expect, "exact tercile grid, populations, and revenue")
    assert(got.map(_._4).sum === users.size.toLong, "population conserved")
    // each tercile's marginal population is balanced to within one
    for (dim <- Seq[((Long, Long, Long, Long, Long, Double)) => Long](
        _._1, _._2, _._3)) {
      val byT = got.groupBy(dim).view.mapValues(_.map(_._4).sum)
      assert(byT.values.max - byT.values.min <= 1L, s"tercile balance $byT")
    }
  }

  test("q215 U-shaped attribution matches a replay; credit mass conserved") {
    import org.apache.spark.sql.functions.unix_micros
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._3)
    val dayUs = 86400L * 1000000L
    val credits = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    var nCredited = 0L
    for ((_, us, u, t) <- ev if t == "purchase") {
      val path = byUser(u)
        .filter(e => e._4 != "purchase" && e._2 >= us - dayUs && e._2 < us)
        .sortBy(e => (e._2, e._1))
      val n = path.length.toLong
      if (n > 0) {
        nCredited += 1
        path.zipWithIndex.foreach { case (e, i) =>
          val rn = i + 1L
          val c =
            if (n == 1) 1000000L
            else if (n == 2) 500000L
            else if (rn == 1) 400000L + (200000L - 200000L / (n - 2) * (n - 2))
            else if (rn == n) 400000L
            else 200000L / (n - 2)
          val (cnt, s) = credits.getOrElse(e._4, (0L, 0L))
          credits(e._4) = (cnt + 1, s + c)
        }
      }
    }
    val expect = credits.toSeq.sortBy(_._1).map { case (t, (cnt, s)) =>
      (t, cnt, s, s / cnt)
    }
    val got = operators.Relational.q215Attribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expect, "exact per-type credit totals")
    // every credited conversion hands out exactly 1e6 ppm
    assert(got.map(_._3).sum === 1000000L * nCredited, "credit mass")
    assert(nCredited > 0)
  }

  test("q213 t-closeness matches an exact integer replay") {
    val rows = Tables.customer(spark, sf)
      .selectExpr("CAST(c_nationkey AS BIGINT)",
        "CAST(floor(c_acctbal / 1000.0) AS BIGINT)",
        "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val n = rows.length.toLong
    val glob = rows.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val expect = rows.groupBy(t => (t._1, t._2)).toSeq.sortBy(_._1)
      .map { case ((nat, band), cs) =>
        val k = cs.length.toLong
        val byV = cs.groupBy(_._3).view.mapValues(_.length.toLong).toMap
        val sdiff = glob.map { case (v, cntV) =>
          math.abs(byV.getOrElse(v, 0L) * n - cntV * k)
        }.sum
        val tv = 1000000L * sdiff / (2L * k * n)
        (nat, band, k, tv, tv >= 400000L)
      }
    val got = operators.Profiling.q213TCloseness(spark, sf).collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(got === expect, "exact scaled-integer total variation per class")
    assert(got.forall(t => t._4 >= 0L && t._4 < 1000000L))
    // a singleton class concentrates all mass on one value: with no
    // majority segment globally its TV must breach — the leak k-anonymity
    // flags for size and t-closeness flags for distribution
    assert(got.filter(_._3 == 1L).forall(_._5),
      "every k=1 class must breach t-closeness")
  }

  test("q236 KM survival matches a driver-side estimator replay; " +
      "monotone and censoring-consistent") {
    val got = Relational.q236KmSurvival(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.nonEmpty)
    // replay: per user first event + first purchase, censor at horizon
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val horizon = ev.map(_._2).max
    val durations = ev.groupBy(_._1).values.map { es =>
      val first = es.map(_._2).min
      val conv = es.filter(_._3 == "purchase").map(_._2).minOption
      conv match {
        case Some(c) => ((c - first) / 3600000000L, true)
        case None    => ((horizon - first) / 3600000000L, false)
      }
    }.toSeq
    val byT = durations.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (t, ds) => (t, ds.count(_._2).toLong, ds.count(!_._2).toLong)
    }
    var atRisk = durations.size.toLong
    var s = 1.0
    val expected = byT.map { case (t, d, c) =>
      val row = if (d == atRisk) { s = 0.0; (t, atRisk, d, c, 0.0) }
      else {
        if (d > 0) s *= (atRisk - d).toDouble / atRisk
        (t, atRisk, d, c, s)
      }
      atRisk -= d + c
      row
    }
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert((g._1, g._2, g._3, g._4) == ((e._1, e._2, e._3, e._4)), s"$g vs $e")
      // the engine runs the product as a 6-dp-rounded ln sum — the replay's
      // raw product agrees to well inside the per-step rounding budget
      assert(math.abs(g._5 - e._5) < 1e-4 * expected.length, s"$g vs $e")
    }
    // survival is non-increasing from 1 toward 0, and the risk sets telescope
    assert(got.map(_._5).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
    assert(got.head._2 == durations.size)
    assert(got.map(r => r._3 + r._4).sum == durations.size,
      "every user leaves the risk set exactly once")
  }

  test("q237 seasonal indices: population-weighted mean index is 1e6 and " +
      "a quiet bucket indexes below a busy one in the replay") {
    val got = Relational.q237SeasonalIndex(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.map(_._1).distinct.sorted.toSeq == Seq("dow", "hod"))
    assert(got.count(_._1 == "hod") == 24)
    val ev = Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) div 3600000000 AS hr")
      .collect().map(_.getLong(0))
    val (h0, h1) = (ev.min, ev.max)
    val counts = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .withDefaultValue(0L)
    val grid = (h0 to h1).map(h => (h % 24, (h / 24 + 4) % 7, counts(h)))
    val total = grid.map(_._3).sum
    got.foreach { case (dim, bucket, nCells, nEvents, ppm) =>
      val cells = grid.filter(g =>
        (if (dim == "hod") g._1 else g._2) == bucket)
      assert(nCells == cells.length && nEvents == cells.map(_._3).sum)
      assert(ppm ==
        1000000L * nEvents * grid.length / (nCells * total), s"$dim $bucket")
    }
    // cell-weighted mean index = 1e6 by construction (floor slack < 1 ppm
    // per bucket); exactness is the oracle's job, this pins the semantics
    for (d <- Seq("hod", "dow")) {
      val rows = got.filter(_._1 == d)
      val mean = rows.map(r => r._3 * r._5).sum.toDouble / grid.length
      assert(math.abs(mean - 1000000.0) < rows.length,
        s"$d mean index $mean")
    }
  }

  test("q238 ACF matches a driver-side series replay; r_24 captures the " +
      "daily cycle at least as well as the off-cycle lags' median") {
    val got = Relational.q238Acf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == (1L to 24L))
    val ev = Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) div 3600000000 AS hr")
      .collect().map(_.getLong(0))
    val counts = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .withDefaultValue(0L)
    val xs = (ev.min to ev.max).map(counts(_))
    val n = xs.length
    val mu = xs.sum.toDouble / n
    val den = xs.map(x => (x - mu) * (x - mu)).sum
    got.foreach { case (lag, m, sxy, r) =>
      val k = lag.toInt
      assert(m == n - k)
      val pairs = xs.dropRight(k).zip(xs.drop(k))
      assert(sxy == pairs.map { case (a, b) => a * b }.sum)
      val num = pairs.map { case (a, b) => (a - mu) * (b - mu) }.sum
      assert(math.abs(r - num / den) < 1e-6, s"lag $k: $r vs ${num / den}")
      assert(r > -1.0 && r < 1.0)
    }
  }

  private def sourceLengths(): Map[String, Seq[Long]] =
    Tables.documents(spark, sf).select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap

  test("q240 Mann-Whitney: 2U1 equals a brute-force discordant-pair count " +
      "and U1 + U2 telescopes to n1*n2") {
    val got = Relational.q240MannWhitney(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    val lens = sourceLengths()
    val srcs = lens.keys.toSeq.sorted
    assert(got.map(g => (g._1, g._2)).toSeq ==
      (for (a <- srcs; b <- srcs if a < b) yield (a, b)))
    got.foreach { case (s1, s2, n1, n2, twoU1, ties, z) =>
      val (xs, ys) = (lens(s1), lens(s2))
      assert(n1 == xs.length && n2 == ys.length)
      // brute force: U1 = #{y < x} + half-ties, doubled to stay integer
      val brute = (for (x <- xs; y <- ys) yield
        if (y < x) 2L else if (y == x) 1L else 0L).sum
      assert(twoU1 == brute, s"($s1,$s2) 2U1")
      // U1 + U2 = n1 n2 (every cross pair counted once from each side)
      val brute2 = (for (x <- xs; y <- ys) yield
        if (x < y) 2L else if (y == x) 1L else 0L).sum
      assert(brute + brute2 == 2L * n1 * n2)
      val pooled = (xs ++ ys).groupBy(identity).values.map(_.size.toLong)
      assert(ties == pooled.map(t => t * t * t - t).sum, s"($s1,$s2) ties")
      val nn = (n1 + n2).toDouble
      val varU = n1.toDouble * n2 / 12.0 *
        ((nn + 1) - ties.toDouble / (nn * (nn - 1)))
      val expZ = (twoU1 - n1.toDouble * n2) / (2.0 * math.sqrt(varU))
      assert(math.abs(z - expZ) < 1e-6, s"($s1,$s2) z")
    }
  }

  test("q241 Welch t: statistics match a driver-side two-sample replay; " +
      "df bracketed by min(n)-1 and n1+n2-2") {
    val got = Relational.q241WelchT(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    val lens = sourceLengths()
    assert(got.nonEmpty)
    got.foreach { case (s1, s2, n1, n2, t, df) =>
      val (xs, ys) = (lens(s1), lens(s2))
      assert(n1 == xs.length && n2 == ys.length)
      def mv(v: Seq[Long]) = {
        val m = v.sum.toDouble / v.length
        (m, v.map(x => (x - m) * (x - m)).sum / (v.length - 1))
      }
      val ((m1, v1), (m2, v2)) = (mv(xs), mv(ys))
      val se1 = v1 / n1; val se2 = v2 / n2
      val expT = (m1 - m2) / math.sqrt(se1 + se2)
      val expDf = (se1 + se2) * (se1 + se2) /
        (se1 * se1 / (n1 - 1) + se2 * se2 / (n2 - 1))
      assert(math.abs(t - expT) < 1e-5, s"($s1,$s2) t: $t vs $expT")
      assert(math.abs(df - expDf) < math.max(1e-5, 1e-9 * expDf),
        s"($s1,$s2) df")
      // Welch-Satterthwaite bounds: min(n1,n2)-1 <= df <= n1+n2-2
      assert(df >= math.min(n1, n2) - 1.000001 && df <= n1 + n2 - 2 + 1e-6)
    }
  }

  test("q243 Kruskal-Wallis: rank sums match a pooled average-rank replay; " +
      "rank mass conserves and H is omnibus-consistent") {
    val got = Relational.q243KruskalWallis(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7),
        r.getDouble(8)))
    val lens = sourceLengths()
    val pooled = lens.values.flatten.toSeq.sorted
    val n = pooled.size
    // average rank per value, doubled to stay exact
    val twoRank = pooled.zipWithIndex.groupBy(_._1).view.mapValues { g =>
      g.map(_._2 + 1L).sum * 2L / g.size // = 2*minrank + ties - 1, exact
    }.toMap
    got.foreach { case (s, ni, twoRi, meanPpm, k, nTot, ties, h, hc) =>
      assert(ni == lens(s).size && nTot == n && k == lens.size)
      assert(twoRi == lens(s).map(twoRank).sum, s"$s rank sum")
      assert(meanPpm == 1000000L * twoRi / (2L * ni))
      assert(ties == pooled.groupBy(identity).values
        .map(g => { val t = g.size.toLong; t * t * t - t }).sum)
      val sumTerms = got.map(r =>
        BigDecimal(r._3.toDouble * r._3 / r._2)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
      val expH = 3.0 * sumTerms.toDouble / (n.toDouble * (n + 1)) - 3.0 * (n + 1)
      assert(math.abs(h - expH) < 1e-5, s"H $h vs $expH")
      assert(math.abs(hc - expH / (1.0 - ties.toDouble /
        (n.toDouble * n * n - n))) < 1e-5)
      assert(hc >= h - 1e-9, "tie correction inflates H (denominator < 1)")
    }
    // rank mass conservation: sum of all doubled rank sums = 2*(1+...+N)
    assert(got.map(_._3).sum == n.toLong * (n + 1))
  }

  test("q246 Mann-Kendall S/var and Theil-Sen slope match a driver-side " +
      "pairwise replay") {
    val r = Relational.q246MannKendall(spark, sf).collect()
    assert(r.length == 1)
    val (n, s, tie, varS, z, slope) = (r(0).getLong(0), r(0).getLong(1),
      r(0).getLong(2), r(0).getLong(3), r(0).getDouble(4), r(0).getDouble(5))
    val ev = Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) div 3600000000 AS hr")
      .collect().map(_.getLong(0))
    val cnt = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .withDefaultValue(0L)
    val xs = (ev.min to ev.max).map(cnt(_)).toArray
    assert(n == xs.length)
    val pairs = for (i <- xs.indices; j <- i + 1 until xs.length)
      yield (j - i, xs(j) - xs(i))
    assert(s == pairs.map(p => java.lang.Long.signum(p._2).toLong).sum)
    val tieRep = xs.groupBy(identity).values
      .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) }).sum
    assert(tie == tieRep)
    assert(varS ==
      (n * (n - 1) * (2 * n + 5) - tie) / 18)
    val expZ =
      (if (s > 0) (s - 1).toDouble else if (s < 0) (s + 1).toDouble else 0.0) /
        math.sqrt(varS.toDouble)
    assert(math.abs(z - expZ) < 1e-6)
    // Theil-Sen: median of the pairwise slopes (two-middles interpolation)
    val slopes = pairs.map { case (dt, dx) => dx.toDouble / dt }.sorted
    val m = slopes.length
    val med = if (m % 2 == 1) slopes(m / 2)
      else (slopes(m / 2 - 1) + slopes(m / 2)) / 2
    assert(math.abs(slope - med) < 1e-6, s"slope $slope vs $med")
    // sanity: z and slope agree on trend direction (or both ~flat)
    assert(z * slope >= 0 || math.abs(slope) < 1e-6 || math.abs(z) < 2)
  }

  test("q247 Fano factors match a driver-side zero-filled series replay; " +
      "the verdict column is consistent with F vs 1") {
    val got = Relational.q247FanoFactor(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getBoolean(6)))
    val ev = Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) div 3600000000 AS hr", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (h0, h1) = (ev.map(_._1).min, ev.map(_._1).max)
    val cnt = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .withDefaultValue(0L)
    assert(got.map(_._1).toSeq == ev.map(_._2).distinct.sorted.toSeq)
    got.foreach { case (t, n, sx, sxx, meanPpm, fano, over) =>
      val xs = (h0 to h1).map(h => cnt((h, t)))
      assert(n == xs.length && sx == xs.sum && sxx == xs.map(x => x * x).sum)
      assert(meanPpm == 1000000L * sx / n)
      val expF = (n.toDouble * sxx - sx.toDouble * sx) / (n.toDouble * sx)
      assert(math.abs(fano - expF) < 1e-6, s"$t fano")
      assert(over == (fano > 1.0) ||
        math.abs(fano - 1.0) < 1e-6, s"$t verdict")
      assert(fano > 0.0)
    }
  }

  test("q250 CCF matches a driver-side two-series replay and its lag-0 " +
      "column IS q152's Pearson r for every pair") {
    val got = Relational.q250Ccf(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1), r.getLong(2)),
        (r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val ev = Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) div 3600000000 AS hr", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val (h0, h1) = (ev.map(_._1).min, ev.map(_._1).max)
    val cnt = ev.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .withDefaultValue(0L)
    val types = ev.map(_._2).distinct.sorted
    val ser = types.map(t => t -> (h0 to h1).map(h => cnt((h, t)))).toMap
    val n = (h1 - h0 + 1).toInt
    assert(got.size == types.combinations(2).size * 13)
    for (Array(t1, t2) <- types.combinations(2); k <- -6L to 6L) {
      val (m, sab, ccf) = got((t1, t2, k))
      val (xa, xb) = (ser(t1), ser(t2))
      val pairs = (0 until n).flatMap { i =>
        val j = i + k.toInt
        if (j >= 0 && j < n) Some((xa(i), xb(j))) else None
      }
      assert(m == pairs.length)
      assert(sab == pairs.map { case (p, q) => p * q }.sum)
      val (sa, sb) = (xa.sum.toDouble, xb.sum.toDouble)
      val (ma, mb) = (sa / n, sb / n)
      val num = pairs.map { case (p, q) => (p - ma) * (q - mb) }.sum
      val da = math.sqrt(xa.map(x => (x - ma) * (x - ma)).sum)
      val db = math.sqrt(xb.map(x => (x - mb) * (x - mb)).sum)
      assert(math.abs(ccf - num / (da * db)) < 1e-6, s"($t1,$t2,$k)")
    }
    // lag 0 is exactly q152's zero-lag Pearson for every pair
    val r152 = Relational.q152SeriesCorr(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(8))).toMap
    r152.foreach { case ((t1, t2), r) =>
      assert(math.abs(got((t1, t2, 0L))._3 - r) < 1e-6,
        s"lag-0 CCF vs q152 on ($t1,$t2)")
    }
  }
}
