package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** q32/q33 — BPE-ish tokenization and rolling-hash fingerprints. */
class TextOpsSpec extends SparkSpec {

  test("q32: BPE token count >= whitespace token count, distinct <= total") {
    val bpe = TextAnalysis.q32BpeTokens(spark, sf)
    val ws = TextAnalysis.q16TokenStats(spark, sf)
      .select(col("doc_id"), col("n_tokens"))
    val joined = bpe.join(ws, "doc_id").cache()
    assert(joined.count() > 0)
    // the pre-tokenizer splits at least wherever whitespace splits
    assert(joined.filter(col("n_bpe_tokens") < col("n_tokens")).count() == 0)
    assert(joined.filter(col("n_distinct_bpe") > col("n_bpe_tokens")).count() == 0)
  }

  test("q33: rolling hash is deterministic and collision-free on this corpus") {
    val a = TextAnalysis.q33RollingHash(spark, sf).collect().toSeq
    val b = TextAnalysis.q33RollingHash(spark, sf).collect().toSeq
    assert(a == b)
    val docs = Tables.documents(spark, sf).select("text").distinct().count()
    val hashes = a.map(_.getLong(1)).distinct.size
    assert(hashes.toLong == docs)
    assert(a.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 1000000007L))
  }

  test("q33: equal texts hash equal, perturbed texts hash differently") {
    import spark.implicits._
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d"))
      .toDF("doc_id", "text")
    val h = df
      .select(col("doc_id"),
        graft.functions.GraftFunctions.rollingHash(col("text")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h(1L) == h(2L))
    assert(h(1L) != h(3L))
  }

  test("RollingHash equals the HOF ascii-fold it replaced on the BMP corpus") {
    val rows = Tables.documents(spark, sf)
      .select(
        graft.functions.GraftFunctions.rollingHash(col("text")).as("native"),
        expr("""aggregate(
               |  transform(filter(split(text, ''), c -> c != ''),
               |            c -> CAST(ascii(c) AS BIGINT)),
               |  CAST(0 AS BIGINT),
               |  (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("RollingHash folds CODE POINTS: surrogate pairs hash as one value") {
    import spark.implicits._
    // "a😀": code points 97, 128512 -> h = (97*31 + 128512) mod 1e9+7
    val h = Seq("a😀").toDF("text")
      .select(graft.functions.GraftFunctions.rollingHash(col("text")))
      .head().getLong(0)
    assert(h === (97L * 31 + 128512) % 1000000007L)
    // the UTF-16 code-unit fold would instead see 97, 0xD83D, 0xDE00
    assert(h !== ((97L * 31 + 0xD83DL) % 1000000007L * 31 + 0xDE00L) % 1000000007L)
  }

  test("q55 bigram LM: per-language quartiles are balanced and monotone in avg_logprob") {
    val rows = graft.operators.TextAnalysis.q55BigramLm(spark, sf)
      .collect()
      .map(r => (r.getString(1), r.getLong(2), r.getDouble(4), r.getInt(5)))
    assert(rows.length === Tables.documents(spark, sf).count())
    // every doc here has bigrams (median length ~50 tokens)
    assert(rows.forall(_._2 >= 1))
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sizes = rs.groupBy(_._4).view.mapValues(_.size).toMap
      assert(sizes.keySet === Set(1, 2, 3, 4), s"$lang must fill 4 quartiles")
      assert(sizes.values.max - sizes.values.min <= 1,
        s"$lang quartiles must be ntile-balanced")
      // quartile order tracks avg logprob: every q1 doc scores >= every q4 doc
      val q1min = rs.filter(_._4 == 1).map(_._3).min
      val q4max = rs.filter(_._4 == 4).map(_._3).max
      assert(q1min >= q4max, s"$lang: quartile 1 must dominate quartile 4")
    }
    // smoothed log-probs are strictly negative (nothing is certain)
    assert(rows.forall(_._3 < 0.0))
  }

  test("q114 per-language top bigrams: exact ranks, verified against a direct recount") {
    val rows = TextAnalysis.q114TopGramsPerLang(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val byLang = rows.groupBy(_._1)
    byLang.foreach { case (l, vs) =>
      assert(vs.map(_._4).sorted.toSeq === (1 to TextAnalysis.TopGramsPerLang))
      val ordered = vs.sortBy(_._4)
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2),
            s"rank order at $l")
        case _ =>
      }
    }
    // direct recount of one language's winner
    val lang0 = byLang.keys.min
    val direct = Tables.documents(spark, sf).filter(col("lang") === lang0)
      .select(explode(expr(
        """transform(sequence(0, size(split(trim(text), ' +')) - 2),
          |  i -> concat(split(trim(text), ' +')[i], ' ',
          |              split(trim(text), ' +')[i+1]))""".stripMargin))
        .as("g"))
      .groupBy("g").count().orderBy(col("count").desc, col("g").asc)
      .collect().head
    val winner = byLang(lang0).find(_._4 == 1).get
    assert(winner._2 === direct.getString(0) && winner._3 === direct.getLong(1))
  }

  test("q115 quality rank: percentiles bounded, monotone in quality, deciles balanced") {
    val rows = TextAnalysis.q115QualityRank(spark, sf).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getDouble(3), r.getInt(4)))
    assert(rows.forall(r => r._3 >= 0.0 && r._3 <= 1.0))
    rows.groupBy(_._1).foreach { case (l, vs) =>
      // percent_rank is monotone in the score
      val sorted = vs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 <= b._3, s"monotone at $l")
        case _ =>
      }
      assert(sorted.head._3 === 0.0, s"lowest score ranks 0 at $l")
      // deciles balanced within 1
      val sizes = vs.groupBy(_._4).values.map(_.size)
      assert(sizes.max - sizes.min <= 1, s"decile balance at $l")
    }
  }

  test("q120 grouped quartiles equal a driver-side exact recomputation") {
    val got = TextAnalysis.q120GroupedMedian(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6))).toMap
    val lens = Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (l, vs) => l -> vs.map(_._2).sorted }
    def q(xs: Array[Long], p: Double): Double = {
      val h = p * (xs.length - 1)
      val lo = h.toInt
      if (lo == xs.length - 1) xs(lo).toDouble
      else xs(lo) + (h - lo) * (xs(lo + 1) - xs(lo))
    }
    assert(got.keySet === lens.keySet)
    lens.foreach { case (l, xs) =>
      val (n, mn, p25, med, p75, mx) = got(l)
      assert(n === xs.length && mn === xs.head && mx === xs.last)
      assert(p25 === q(xs, 0.25), s"p25 at $l")
      assert(med === q(xs, 0.5), s"median at $l")
      assert(p75 === q(xs, 0.75), s"p75 at $l")
      assert(mn <= p25 && p25 <= med && med <= p75 && p75 <= mx)
    }
  }

  test("q127: inverted index df/fingerprint/varint agree with a driver-side rebuild") {
    val got = TextAnalysis.q127InvertedIndex(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getString(2), r.getLong(3))))
      .toMap
    // independent rebuild: distinct (token, doc) pairs in plain Scala
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val postings = docs
      .flatMap { case (id, t) =>
        t.trim.toLowerCase.split(" +").distinct.map(tok => (tok, id)) }
      .groupBy(_._1).map { case (tok, ps) => tok -> ps.map(_._2).sorted }
    def vb(v: Long): Long = { // LEB128: 7 payload bits per byte
      var (x, b) = (v >> 7, 1L)
      while (x > 0) { x >>= 7; b += 1 }
      b
    }
    assert(got.keySet == postings.keySet)
    postings.foreach { case (tok, ids) =>
      val (df, fp, bytes) = got(tok)
      assert(df == ids.length, s"df of $tok")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(ids.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(fp == md, s"postings_fp of $tok")
      val expBytes = vb(ids.head) +
        ids.toSeq.sliding(2).collect { case Seq(a, b) => vb(b - a) }.sum
      assert(bytes == expBytes, s"varint_bytes of $tok")
    }
  }

  test("q128: MAD bounds and outlier count agree with a driver-side recompute") {
    val got = TextAnalysis.q128RobustStats(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val byLang = Tables.documents(spark, sf).select("lang", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2.toDouble).sorted }
    def interp(xs: Seq[Double], q: Double): Double = {
      val pos = q * (xs.length - 1)
      val lo = pos.toInt
      if (lo == xs.length - 1) xs(lo)
      else xs(lo) + (pos - lo) * (xs(lo + 1) - xs(lo))
    }
    assert(got.keySet == byLang.keySet)
    byLang.foreach { case (l, xs) =>
      val (n, med, mad, nOut) = got(l)
      assert(n == xs.length)
      assert(med === interp(xs, 0.5), s"median of $l")
      val devs = xs.map(x => math.abs(x - med)).sorted
      assert(mad === interp(devs, 0.5), s"mad of $l")
      assert(nOut == devs.count(_ > 3 * mad), s"outliers of $l")
    }
  }

  test("q129: PMI ratio is the exact count ratio and a planted collocation scores high") {
    val rows = TextAnalysis.q129PmiCollocations(spark, sf).collect()
    assert(rows.nonEmpty)
    // global totals recomputed from the returned marginals must satisfy
    // ratio == c12 * T / (cl * cr) for every row (T derived once below)
    val bg = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split(" +").sliding(2)
        .collect { case Array(a, b) => (a, b) })
    val t = bg.length.toDouble
    val c12 = bg.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cl = bg.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cr = bg.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val (w1, w2) = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == c12((w1, w2)))
      assert(r.getLong(3) == cl(w1) && r.getLong(4) == cr(w2))
      val exp = BigDecimal(r.getLong(2) * t / (cl(w1).toDouble * cr(w2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(5) === exp, s"pmi of ($w1,$w2)")
      assert(r.getLong(2) >= TextAnalysis.MinPairCount)
    }
    // sanity: the corpus's strongest surviving pair beats independence
    assert(rows.map(_.getDouble(5)).max > 1.0)
  }

  test("q133: BPE pair counts equal a driver-side weighted rebuild; argmax stable") {
    val got = TextAnalysis.q133BpeMergeStep(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val words = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.split(" +"))
      .groupBy(identity).view.mapValues(_.length.toLong)
      .filter(_._1.length >= 2)
    val exp = words.toSeq
      .flatMap { case (w, f) => w.sliding(2).map(p =>
        (p.substring(0, 1), p.substring(1, 2)) -> f) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter(_._2 >= TextAnalysis.MergeMinCount).toMap
    assert(got == exp)
    // the merge rule the step would emit: deterministic argmax
    if (exp.nonEmpty) {
      val top = exp.maxBy { case ((l, r), n) => (n, l, r) }
      assert(got(top._1) == top._2)
    }
  }

  test("q147: growth curve conserves the gram vocabulary and is cumulative") {
    val rows = TextAnalysis.q147VocabGrowth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.nonEmpty && rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
    // cum is the running sum of new
    var run = 0L
    rows.foreach { case (_, nw, cum) => run += nw; assert(cum == run) }
    // total equals the corpus's distinct trigram count
    val distinctGrams = Tables.documents(spark, sf)
      .select(explode(expr(
        """array_distinct(transform(sequence(0, size(split(trim(lower(text)), ' +')) - 3),
          |  i -> concat(split(trim(lower(text)), ' +')[i], ' ',
          |              split(trim(lower(text)), ' +')[i+1], ' ',
          |              split(trim(lower(text)), ' +')[i+2])))""".stripMargin))
        .as("g"))
      .select("g").distinct().count()
    assert(rows.last._3 == distinctGrams)
  }

  test("q149: BM25 top-k matches a driver-side scoring of the full corpus") {
    val got = TextAnalysis.q149Bm25(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.length == TextAnalysis.Bm25TopK)
    // independent reference implementation
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase.split(" +").toSeq))
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / docs.length
    val ctot = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val qts = ctot.toSeq.sortBy { case (t, c) => (-c, t) }.take(3).map(_._1)
    def r6(x: Double): Double = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = qts.map(t => t -> docs.count(_._2.contains(t)).toDouble).toMap
    val scores = docs.map { case (id, toks) =>
      val dl = toks.length.toDouble
      val parts = qts.flatMap { t =>
        val tf = toks.count(_ == t).toDouble
        if (tf == 0) None else {
          val idf = r6(math.log((n - df(t) + 0.5) / (df(t) + 0.5) + 1))
          Some(r6(idf * (tf * (1.2 + 1.0)) /
            (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))))
        }
      }
      (id, BigDecimal(parts.map(BigDecimal(_)).sum.toDouble).toDouble,
        parts.length.toLong)
    }.filter(_._3 > 0)
    val expTop = scores.sortBy { case (id, sc, _) => (-sc, id) }
      .take(TextAnalysis.Bm25TopK).sortBy(_._1)
    assert(got.map(_._1).toSeq == expTop.map(_._1).toSeq, "top-k doc set/order")
    got.zip(expTop).foreach { case ((id, sc, nt), (eid, esc, ent)) =>
      assert(id == eid && nt == ent)
      assert(math.abs(sc - esc) < 1e-9, s"score of doc $id: $sc vs $esc")
    }
  }

  test("q160: fertility ratios recompute exactly from per-doc token counts") {
    val rows = TextAnalysis.q160Fertility(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6))).toMap
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val (n, chars, bpe, words, cpt, fert) = rows(lang)
      assert(n == ds.length)
      assert(chars == ds.map(_._2.length.toLong).sum)
      assert(words == ds.map(_._2.trim.split(" +").length.toLong).sum)
      assert(bpe >= words, "BPE pre-tokenization splits at least on spaces")
      assert(cpt === r6(chars.toDouble / bpe))
      assert(fert === r6(bpe.toDouble / words))
      assert(fert >= 1.0)
    }
  }

  test("q161: Zipf slopes are negative and match an OLS recompute over ranks") {
    val rows = TextAnalysis.q161ZipfSlope(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val freq = Tables.documents(spark, sf).select("source", "text").collect()
      .flatMap(r => r.getString(1).trim.toLowerCase.split(" +")
        .map(t => (r.getString(0), t)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    def r6d(x: Double) = BigDecimal(math.round(x * 1e6)).bigDecimal
      .movePointLeft(6)
    rows.foreach { case (src, n, slope) =>
      val vocab = freq.collect { case ((s, t), f) if s == src => (t, f) }.toSeq
      assert(n == vocab.size)
      val ranked = vocab.sortBy { case (t, f) => (-f, t) }.zipWithIndex
      val xs = ranked.map { case (_, i) => r6d(math.log(i + 1.0)) }
      val ys = ranked.map { case ((_, f), _) => r6d(math.log(f.toDouble)) }
      val (sx, sy) = (xs.map(BigDecimal(_)).sum, ys.map(BigDecimal(_)).sum)
      val sxy = xs.zip(ys).map { case (a, b) => BigDecimal(a) * BigDecimal(b) }.sum
      val sxx = xs.map(a => BigDecimal(a) * BigDecimal(a)).sum
      val exp = BigDecimal(
        (n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
          (n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(slope === exp, s"slope of $src")
      assert(slope < 0.0, s"$src rank-frequency must decay")
    }
  }

  test("q179 RRF: fused ranking equals the brute-force rank recompute") {
    val pool = TextAnalysis.RrfPool
    val k = TextAnalysis.RrfK
    val bm = TextAnalysis.bm25Scores(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }.take(pool)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val qual = TextAnalysis.q17QualityScore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(5)))
      .sortBy { case (id, s) => (-s, id) }.take(pool)
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val fused = (bm.keySet ++ qual.keySet).toSeq.map { id =>
      val ra = bm.getOrElse(id, 0)
      val rb = qual.getOrElse(id, 0)
      val s = (if (ra > 0) 1.0 / (k + ra) else 0.0) +
        (if (rb > 0) 1.0 / (k + rb) else 0.0)
      (id, ra, rb, s)
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(TextAnalysis.RrfTopK)
      .sortBy(_._1)
    val got = TextAnalysis.q179RrfFusion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(got.toSeq === fused, "fusion must equal the rank-space recompute")
    got.foreach { case (_, ra, rb, _) =>
      assert(ra >= 0 && ra <= pool && rb >= 0 && rb <= pool)
      assert(ra > 0 || rb > 0, "a fused doc sits in at least one pool")
    }
  }

  test("q184 kappa: matches the confusion-matrix brute force, chance-corrected") {
    val preds = TextAnalysis.q18LangId(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(r.fieldIndex("guess"))))
    val n = preds.length.toLong
    val agree = preds.count { case (g, p) => g == p }.toLong
    val classes = (preds.map(_._1) ++ preds.map(_._2)).distinct
    val s = classes.map { c =>
      preds.count(_._1 == c).toLong * preds.count(_._2 == c).toLong
    }.sum
    val po = agree.toDouble / n
    val pe = s.toDouble / (n.toDouble * n)
    val row = TextAnalysis.q184AgreementKappa(spark, sf).collect()(0)
    assert(row.getLong(0) === n && row.getLong(1) === agree)
    assert(row.getDouble(2) === po && row.getDouble(3) === pe)
    assert(row.getDouble(4) === (po - pe) / (1.0 - pe))
    assert(row.getDouble(4) < po,
      "chance correction must bite on a skewed class distribution")
    assert(row.getDouble(4) >= -1.0 && row.getDouble(4) <= 1.0)
  }

  test("q186 perplexity buckets: xent recomputes and terciles split ~n/3") {
    val toks = Tables.documents(spark, sf)
      .selectExpr("doc_id", "explode(split(lower(trim(text)), ' +')) AS w")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val uni = toks.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val denom = (toks.length + uni.size).toDouble
    def q6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val exp = toks.groupBy(_._1).view.mapValues { ws =>
      val s = ws.map { case (_, w) => q6(-math.log((uni(w) + 1.0) / denom)) }
        .foldLeft(BigDecimal(0))(_ + _)
      (ws.length.toLong, s.toDouble / ws.length)
    }.toMap
    val rows = TextAnalysis.q186PerplexityBuckets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
    assert(rows.length === exp.size)
    rows.foreach { case (id, n, x, _) =>
      assert((n, x) === exp(id), s"xent of doc $id")
    }
    val byBucket = rows.groupBy(_._4).view.mapValues(_.length).toMap
    val nd = rows.length
    val k1 = math.ceil(nd / 3.0).toInt
    val k2 = math.ceil(2.0 * nd / 3.0).toInt
    // tercile sizes are exact up to ties at the cut values
    val sorted = rows.map(_._3).sorted
    val (c1, c2) = (sorted(k1 - 1), sorted(k2 - 1))
    assert(byBucket("head") === rows.count(_._3 <= c1))
    assert(byBucket.getOrElse("middle", 0) ===
      rows.count(r => r._3 > c1 && r._3 <= c2))
    assert(byBucket.getOrElse("tail", 0) === rows.count(_._3 > c2))
    assert(byBucket("head") >= nd / 4 && byBucket("head") <= nd / 2,
      "head is roughly a tercile")
  }

  test("q178 Gini: matches the sorted-rank brute force and sits in [0, 1)") {
    val lens = Tables.documents(spark, sf)
      .select(size(split(trim(col("text")), " +")).as("v"))
      .collect().map(_.getInt(0).toLong).sorted
    val n = lens.length.toLong
    val t = lens.sum
    val s2 = 2L * lens.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val brute = (s2.toDouble - (n.toDouble + 1.0) * t.toDouble) /
      (n.toDouble * t.toDouble)
    val row = TextAnalysis.q178GiniTokenMass(spark, sf).collect()(0)
    assert(row.getLong(0) === n)
    assert(row.getLong(1) === t)
    assert(row.getDouble(2) === brute, "tie-grouped rank sum is exact")
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) < 1.0)
  }

  test("q194 count-min: one-sided error, exact match vs a driver-side sketch") {
    val rows = TextAnalysis.q194Countmin(spark, sf).collect()
    assert(rows.length === 20)
    // CMS never under-counts: collisions only ADD mass to a cell
    assert(rows.forall(r => r.getLong(2) >= r.getLong(1)))
    // independent replay: same tokenization, same md5-row hashes, a
    // mutable 4x1024 grid on the driver
    val tokens = Tables.documents(spark, sf).select("text").collect()
      .flatMap(r => r.getString(0).trim.split(" +"))
    def bucket(j: Int, t: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest((s"$j:$t").getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex.take(8), 16) % 1024L).toInt
    }
    val grid = Array.ofDim[Long](4, 1024)
    for (t <- tokens; j <- 0 until 4) grid(j)(bucket(j, t)) += 1L
    val truth = tokens.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val probes = truth.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    val expect = probes.map { case (t, c) =>
      (t, c, (0 until 4).map(j => grid(j)(bucket(j, t))).min)
    }.toSet
    val got = rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expect, "sketch cells and probe estimates are bit-exact")
  }

  test("q196 linear probe matches a driver-side exact-Gram Cramer solve") {
    val row = TextAnalysis.q196LinearProbe(spark, sf).collect().head
    // independent replay: same 6-dp decimal features, exact BigDecimal
    // Gram sums, the same double Cramer expressions
    def d6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val docs = Tables.documents(spark, sf)
      .select("text", "lang", "n_chars").collect()
    val feats = docs.map { r =>
      val nch = r.getAs[Number]("n_chars").longValue
      val vowels = r.getString(0).count("aeiou".contains(_))
      val toks = r.getString(0).trim.split(" +")
      (d6(math.log(1.0 + nch)),
        d6(vowels.toDouble / (if (nch == 0) 1L else nch)),
        d6(toks.distinct.length.toDouble / toks.length))
    }
    val n = feats.length.toDouble
    def s(f: ((BigDecimal, BigDecimal, BigDecimal)) => BigDecimal): Double =
      feats.map(f).sum.toDouble
    val (sx1, sx2, sy) = (s(_._1), s(_._2), s(_._3))
    val (s11, s12, s22) = (s(t => t._1 * t._1), s(t => t._1 * t._2), s(t => t._2 * t._2))
    val (s1y, s2y, syy) = (s(t => t._1 * t._3), s(t => t._2 * t._3), s(t => t._3 * t._3))
    val da = n*(s11*s22 - s12*s12) - sx1*(sx1*s22 - s12*sx2) + sx2*(sx1*s12 - s11*sx2)
    val d0 = sy*(s11*s22 - s12*s12) - sx1*(s1y*s22 - s12*s2y) + sx2*(s1y*s12 - s11*s2y)
    val d1 = n*(s1y*s22 - s12*s2y) - sy*(sx1*s22 - s12*sx2) + sx2*(sx1*s2y - s1y*sx2)
    val d2 = n*(s11*s2y - s1y*s12) - sx1*(sx1*s2y - s1y*sx2) + sy*(sx1*s12 - s11*sx2)
    val r2 = 1.0 - (syy - (d0*sy + d1*s1y + d2*s2y) / da) / (syy - sy*sy / n)
    assert(row.getLong(0) === feats.length.toLong)
    assert(row.getDouble(1) === d6(d0 / da).toDouble, "intercept")
    assert(row.getDouble(2) === d6(d1 / da).toDouble, "log-length coefficient")
    assert(row.getDouble(3) === d6(d2 / da).toDouble, "vowel-ratio coefficient")
    assert(row.getDouble(4) === d6(r2).toDouble, "r2")
    assert(row.getDouble(4) >= 0.0 && row.getDouble(4) <= 1.0)
  }

  test("q203 KMV sketch matches a driver replay; estimate inside 3/sqrt(k)") {
    val grams = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).trim.split(" +"))
      .filter(_.length >= 3)
      .flatMap(t => t.sliding(3).map(_.mkString(" ")))
      .distinct
    def u(g: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(g.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(12)
      (java.lang.Long.parseLong(hex, 16) + 1.0) / 281474976710657.0
    }
    val us = grams.map(u).sorted.take(256)
    val (uk, kk) = (us.last, us.length.toLong)
    val est = math.floor((kk - 1) / uk).toLong
    val row = TextAnalysis.q203KmvDistinct(spark, sf).collect().head
    assert(row.getLong(0) === kk)
    assert(row.getDouble(1) === BigDecimal(uk)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(row.getLong(2) === est, "identical k-th order statistic estimate")
    assert(row.getLong(3) === grams.length.toLong)
    // KMV concentration: relative error within 3/sqrt(k) whp when the
    // universe genuinely exceeds k
    if (grams.length > 4 * 256)
      assert(row.getDouble(4) <= 3.0 / math.sqrt(256.0),
        s"rel_err ${row.getDouble(4)}")
  }

  test("q214 unseen-vocab estimators match an exact replay") {
    val docs = Tables.documents(spark, sf).select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expect = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (s, ds) =>
      val toks = ds.flatMap(_._2.toLowerCase.trim.split(" +"))
      val f = toks.groupBy(identity).view.mapValues(_.length.toLong)
      val (n, v) = (toks.length.toLong, f.size.toLong)
      val n1 = f.values.count(_ == 1L).toLong
      val n2 = f.values.count(_ == 2L).toLong
      val chao1 = v + (n1 * (n1 - 1L)) / (2L * (n2 + 1L))
      (s, n, v, n1, n2, 1000000L * n1 / n, chao1, 1000000L * v / chao1)
    }
    val got = TextAnalysis.q214UnseenVocab(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got === expect, "exact frequency-of-frequency estimators")
    // the richness estimate never falls below the observed vocabulary
    assert(got.forall(t => t._7 >= t._3))
    // missing mass is a proper probability (0 iff a source has no hapax)
    assert(got.forall(t => t._6 >= 0L && t._6 < 1000000L))
    assert(got.exists(_._6 > 0L), "some source must carry unseen mass")
    assert(got.forall(t => t._8 > 0L && t._8 <= 1000000L))
  }

  test("q219 Heaps fit matches an exact replay; the gram curve is a power law") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val mx = docs.map(_._1).max + 1
    def d6(v: Double): BigDecimal =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val perBucket = docs.groupBy { case (id, _) => id * 10 / mx }
    val buckets = perBucket.keys.toSeq.sorted
    val addN = buckets.map(b =>
      perBucket(b).map(_._2.toLowerCase.trim.split(" +").length.toLong).sum)
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(x => f"$x%02x").mkString
    val firstSeen = scala.collection.mutable.HashMap.empty[String, Long]
    for (b <- buckets; (_, t) <- perBucket(b);
         toks = t.toLowerCase.trim.split(" +") if toks.length >= 3;
         g <- toks.sliding(3).map(w => md5(w.mkString(" "))).toSeq.distinct)
      if (!firstSeen.contains(g)) firstSeen(g) = b
    val addV = buckets.map(b => firstSeen.values.count(_ == b).toLong)
    val (cumN, cumV) = (addN.scanLeft(0L)(_ + _).tail,
      addV.scanLeft(0L)(_ + _).tail)
    val pts = cumN.zip(cumV).map { case (n, v) =>
      (d6(math.log(n.toDouble)), d6(math.log(v.toDouble)))
    }
    val np = pts.size.toDouble
    val sx = pts.map(_._1).sum.toDouble
    val sy = pts.map(_._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val syy = pts.map(p => p._2 * p._2).sum.toDouble
    val cov = np * sxy - sx * sy
    val vx = np * sxx - sx * sx
    val vy = np * syy - sy * sy
    val row = TextAnalysis.q219HeapsFit(spark, sf).collect().head
    assert(row.getLong(0) === pts.size.toLong)
    assert(row.getDouble(1) === d6(cov / vx).toDouble, "beta")
    assert(row.getDouble(2) === d6((sy - (cov / vx) * sx) / np).toDouble,
      "ln_k")
    assert(row.getDouble(3) === d6(cov * cov / (vx * vy)).toDouble, "r2")
    // the gram vocabulary genuinely grows as a power law on this corpus
    assert(row.getDouble(1) > 0.5 && row.getDouble(1) < 1.0,
      s"beta ${row.getDouble(1)}")
    assert(row.getDouble(3) >= 0.9, s"r2 ${row.getDouble(3)}")
  }

  test("q239 winsorized/trimmed means match a driver-side order-statistics " +
      "replay and stay inside the clamp boundaries") {
    val got = TextAnalysis.q239RobustMeans(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(_._1).toSeq == docs.map(_._1).distinct.sorted.toSeq)
    got.foreach { case (lang, n, lo, hi, rawPpm, winPpm, trimPpm) =>
      val xs = docs.filter(_._1 == lang).map(_._2).sorted
      assert(n == xs.length)
      val g = (n / 10).toInt
      assert(lo == xs(g) && hi == xs(xs.length - 1 - g), s"$lang bounds")
      val core = xs.slice(g, xs.length - g)
      assert(rawPpm == 1000000L * xs.sum / n, lang)
      val winSum = core.sum + g * (lo + hi)
      assert(winPpm == 1000000L * winSum / n, lang)
      assert(trimPpm == 1000000L * core.sum / (n - 2L * g), lang)
      // both robust estimates live inside the clamp boundaries (the raw
      // mean need not — that leverage is what winsorizing removes); ppm
      // floor division concedes at most 1 ppm on the lower bound
      assert(winPpm >= 1000000L * lo - 1 && winPpm <= 1000000L * hi, lang)
      assert(trimPpm >= 1000000L * lo - 1 && trimPpm <= 1000000L * hi, lang)
    }
  }
}
