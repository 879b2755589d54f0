package graft

import org.apache.spark.sql.functions._

import graft.operators._

class TrainingDataSpec extends SparkSpec {

  test("q15 exact dedup: all texts distinct at this SF -> one group per doc") {
    val df = TextAnalysis.q15DedupExact(spark, sf)
    assert(df.count() === Tables.documents(spark, sf).count())
    assert(df.filter(col("n_copies") =!= 1).count() === 0)
  }

  test("q15 exact dedup collapses injected duplicates") {
    import spark.implicits._
    val docs = Seq((1L, "aaa bbb"), (2L, "aaa bbb"), (3L, "ccc"))
      .toDF("doc_id", "text")
    val got = docs.groupBy(md5(col("text")))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies").orderBy("keep_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((1L, 2L), (3L, 1L)))
  }

  test("q16 token stats: n_chars_calc equals the table's n_chars column") {
    val df = TextAnalysis.q16TokenStats(spark, sf)
    assert(df.filter(col("n_chars_calc") =!= col("n_chars")).count() === 0)
    assert(df.filter(col("n_tokens") <= 0).count() === 0)
  }

  test("q17 quality score stays in [0, 1]") {
    val df = TextAnalysis.q17QualityScore(spark, sf)
    assert(df.filter(col("quality") < 0.0 || col("quality") > 1.0).count() === 0)
  }

  test("q18 langid is deterministic and defined for every doc") {
    val df = TextAnalysis.q18LangId(spark, sf).cache()
    assert(df.count() === 500)
    // word-salad corpus: English markers dominate; no doc should be
    // classified as zh (no CJK markers present)
    assert(df.filter(col("guess") === "zh").count() === 0)
    assert(df.filter(col("guess").isNull).count() === 0)
  }

  test("q19 fingerprints are 16 hex chars and unique on this corpus") {
    val df = TextAnalysis.q19Fingerprint(spark, sf).cache()
    assert(df.filter(length(col("fingerprint")) =!= 16).count() === 0)
    assert(df.select("fingerprint").distinct().count() === df.count())
  }

  test("q20 minhash equals brute-force jaccard>=0.8 pairs (no LSH misses)") {
    import spark.implicits._
    val got = Dedup.q20MinHashDedup(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // independent brute force over all pairs on the small SF
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    def shingles(t: String): Set[String] = {
      val toks = t.trim.split(" +")
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }.toMap
    val exp = (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq if a < b
      inter = (sa & sb).size
      if inter > 0 && inter.toDouble / (sa | sb).size >= 0.8
    } yield (a, b)).toSet
    assert(got === exp)
    assert(got.nonEmpty) // the generator plants near-dups
  }

  test("q40 prefix-filtered join equals brute-force trigram jaccard>=0.5 (exact by construction)") {
    import spark.implicits._
    val got = Dedup.q40NgramJaccard(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // independent brute force over all pairs on the small SF
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    def shingles(t: String): Set[String] = {
      val toks = t.trim.split(" +")
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sh = docs.map { case (id, t) => id -> shingles(t) }.toMap
    val exp = (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq if a < b && sa.nonEmpty
      inter = (sa & sb).size
      if inter > 0 && inter.toDouble / (sa | sb).size >= 0.5
    } yield (a, b)).toSet
    assert(got === exp)
    assert(got.nonEmpty) // the generator plants near-dups
    // Cross-mode sanity: q20's pairs are trigram jaccard >= 0.8, so they
    // clear q40's 0.5 bar on the same shingles by definition.
    val mh = Dedup.q20MinHashDedup(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(mh.subsetOf(got))
  }

  test("q21 simhash: pairs are ordered, hamming <= 3, and overlap minhash dups") {
    import spark.implicits._
    val sim = Dedup.q21SimHashDedup(spark, sf).cache()
    assert(sim.filter(col("doc_a") >= col("doc_b")).count() === 0)
    assert(sim.filter(col("hamming") > 3).count() === 0)
    val simPairs = sim.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val mhPairs = Dedup.q20MinHashDedup(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // Cross-method recall floor (the QUALITY artifact's q21 floor):
    // SimHash approximates term-frequency cosine while q20 thresholds
    // shingle Jaccard, so full overlap is not expected — but at least
    // half the Jaccard>=0.8 planted dups must also collide in SimHash.
    // Deterministic planes + corpus: 0.6 measured, 0.5 = regression bar.
    val recall = (simPairs & mhPairs).size.toDouble / mhPairs.size
    info(f"simhash-vs-minhash overlap recall = $recall%.3f")
    assert(recall >= 0.5)
  }

  test("q21 two-level pigeonhole banding returns exactly the single-level pairs") {
    import spark.implicits._
    // Synthetic signature corpus with planted perturbations at every
    // interesting Hamming distance: for each of 200 seeded random base
    // signatures, plant copies at distance 0..5 with the flipped bits
    // drawn adversarially — concentrated in one 16-bit chunk, spread
    // across chunks, and (for the two-level path) concentrated inside a
    // single 12-bit sub-chunk of the complement. Both banding levels,
    // run through q21's exact join+filter shape, must equal brute-force
    // hamming <= 3 over all pairs.
    val rnd = new scala.util.Random(2113)
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var id = 0L
    for (_ <- 0 until 200) {
      val base = rnd.nextLong()
      rows += ((id, base)); id += 1
      for (d <- 1 to 5) {
        // exactly d DISTINCT flip positions per plant (shuffle-take, not
        // fill-distinct, so every advertised distance 0..5 really occurs)
        val positions = rnd.nextInt(3) match {
          case 0 => // all flips inside one random 16-bit chunk
            val c = rnd.nextInt(4)
            rnd.shuffle((0 until 16).toList).take(d).map(16 * c + _)
          case 1 => // spread across chunks: at most two flips per chunk,
            // so d=4 spans >= 2 chunks and d=5 spans >= 3
            rnd.shuffle(
              rnd.shuffle((0 until 4).toList)
                .flatMap(c => rnd.shuffle((0 until 16).toList).take(2)
                  .map(16 * c + _))).take(d)
          case 2 => // inside one 12-bit window (a sub-chunk-shaped burst)
            val start = rnd.nextInt(52)
            rnd.shuffle((0 until 12).toList).take(d).map(start + _)
        }
        assert(positions.distinct.size == d)
        rows += ((id, positions.foldLeft(base)((v, p) => v ^ (1L << p))))
        id += 1
      }
    }
    val sims = rows.toSeq.toDF("doc_id", "simhash")
    def pairsOf(twoLevel: Boolean): Set[(Long, Long)] = {
      val banded = Dedup.simHashBands(sims, twoLevel)
      val l = banded.as("l"); val r = banded.as("r")
      l.join(r,
          col("l.band") === col("r.band") && col("l.bh") === col("r.bh") &&
            col("l.doc_id") < col("r.doc_id"))
        .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
          bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).as("hamming"))
        .distinct()
        .filter(col("hamming") <= 3)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    }
    val brute = (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    assert(brute.nonEmpty)
    val one = pairsOf(twoLevel = false)
    val two = pairsOf(twoLevel = true)
    assert(one === brute, "single-level banding must equal brute force")
    assert(two === brute, "two-level banding must equal brute force")
  }

  test("q162 paragraph near-dup: matches the brute-force first-wins drop list") {
    import spark.implicits._
    // Brute-force reference at this SF: positional 32-token paragraphs,
    // distinct trigram shingles, ALL-pairs Jaccard >= 0.8, drop = units
    // with at least one earlier near-dup partner (count attached).
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), " +").as("toks"))
      .as[(Long, Seq[String])].collect()
    val units = docs.flatMap { case (id, toks) =>
      toks.grouped(Dedup.ParaTok).zipWithIndex.collect {
        case (p, i) if p.length >= 3 =>
          ((id, i.toLong), p.sliding(3).map(_.mkString(" ")).toSet)
      }
    }.sortBy(_._1)
    val expected = scala.collection.mutable.Map.empty[(Long, Long), Long]
    for (i <- units.indices; j <- 0 until i) {
      val inter = (units(i)._2 & units(j)._2).size
      val union = (units(i)._2 | units(j)._2).size
      if (union > 0 && inter.toDouble / union >= 0.8)
        expected(units(i)._1) = expected.getOrElse(units(i)._1, 0L) + 1L
    }
    val got = Dedup.q162ParaDedup(spark, sf)
      .select("doc_id", "para_idx", "n_earlier_dups")
      .as[(Long, Long, Long)].collect()
      .map { case (d, p, n) => (d, p) -> n }.toMap
    info(s"paragraph units = ${units.length}, dropped = ${got.size}")
    assert(got === expected.toMap)
  }

  test("q163 novelty: matches brute-force first-occurrence gram fractions") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), " +").as("toks"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    def grams(toks: Seq[String]): Set[String] =
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set.empty[String]
    val firstSeen = scala.collection.mutable.Map.empty[String, Long]
    docs.foreach { case (id, toks) => // ascending doc_id = first occurrence
      grams(toks).foreach(g => if (!firstSeen.contains(g)) firstSeen(g) = id)
    }
    val expected = docs.map { case (id, toks) =>
      val gs = grams(toks)
      (id, gs.size.toLong, gs.count(g => firstSeen(g) == id).toLong)
    }.toSeq
    val got = TextAnalysis.q163Novelty(spark, sf)
      .select("doc_id", "n_grams", "n_novel").as[(Long, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(got === expected)
    // the corpus recombines a small vocabulary, so BOTH regimes must
    // occur: novel-gram docs and docs made entirely of seen grams
    assert(expected.exists { case (_, g, n) => g > 0 && n > 0 })
    assert(expected.exists { case (_, g, n) => g > 0 && n == 0 })
  }

  test("q164 quality ROC: monotone in the threshold, complete at t=0") {
    import spark.implicits._
    val rows = TextAnalysis.q164QualityRoc(spark, sf)
      .select("thr", "n_kept", "n_total", "kept_tokens")
      .as[(Double, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.length === 10)
    assert(rows.head._1 === 0.0 && rows.head._2 === rows.head._3,
      "every doc has quality >= 0, so t=0 keeps the whole corpus")
    rows.sliding(2).foreach {
      case Array((_, kA, _, tA), (_, kB, _, tB)) =>
        assert(kB <= kA && tB <= tA, "raising the cutoff can only drop docs")
      case _ =>
    }
  }

  test("q165 OOV rate: per-source token counts are complete and rates bounded") {
    val df = TextAnalysis.q165OovRate(spark, sf).cache()
    val total = df.agg(sum("n_tokens")).head().getLong(0)
    val corpus = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), " +")).as("t")).count()
    assert(total === corpus, "every token is attributed to exactly one source")
    assert(df.filter(col("oov_rate") < 0.0 || col("oov_rate") > 1.0).count() === 0)
    // the corpus vocabulary exceeds VocabK, so some mass must be OOV
    assert(df.agg(sum("n_oov")).head().getLong(0) > 0)
  }

  test("q166 token entropy: bounded by ln(n_types), zero iff one type") {
    val df = TextAnalysis.q166TokenEntropy(spark, sf).cache()
    assert(df.filter(col("entropy") < 0.0).count() === 0)
    // uniform bound with slack for the per-term 6-dp rounding
    assert(df.filter(
      col("entropy") > log(col("n_types").cast("double"))
        + col("n_types").cast("double") * 1e-6 + 1e-9).count() === 0)
    assert(df.filter(col("n_types") === 1 && col("entropy") =!= 0.0).count() === 0)
  }

  test("q167 bigram LM: matches a brute-force add-one model") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), " +").as("toks"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    val uni = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    val big = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    docs.foreach { case (_, t) =>
      t.foreach(w => uni(w) += 1)
      t.sliding(2).filter(_.length == 2).foreach(p => big((p(0), p(1))) += 1)
    }
    val v = uni.size.toLong
    def term(w1: String, w2: String): BigDecimal =
      BigDecimal.valueOf(math.log((uni(w1) + v).toDouble / (big((w1, w2)) + 1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val expected = docs.map { case (id, t) =>
      val bs = t.sliding(2).filter(_.length == 2).toSeq
      if (bs.isEmpty) (id, 0L, None)
      else (id, bs.size.toLong,
        Some((bs.map(p => term(p(0), p(1))).sum / bs.size).toDouble))
    }.toSeq
    val got = TextAnalysis.q167BigramXent(spark, sf)
      .select("doc_id", "n_bigrams", "xent").as[(Long, Long, Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(got.map(r => (r._1, r._2)) === expected.map(r => (r._1, r._2)))
    got.zip(expected).foreach { case ((id, _, g), (_, _, e)) =>
      (g, e) match {
        case (Some(gv), Some(ev)) =>
          assert(math.abs(gv - ev) < 1e-9, s"doc $id: $gv vs $ev")
        case (a, b) => assert(a === b, s"doc $id")
      }
    }
  }

  test("q168 dedup sweep: matches a brute-force chunk census at every size") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select(split(trim(col("text")), " +").as("toks"))
      .as[Seq[String]].collect()
    val expected = TextAnalysis.SweepSizes.map { cs =>
      val chunks = docs.flatMap(t =>
        (0 until t.length by cs).map(s =>
          t.slice(s, math.min(s + cs, t.length)).mkString(" ")))
      (cs.toLong, chunks.length.toLong, chunks.distinct.length.toLong)
    }
    val got = TextAnalysis.q168ChunkDedupSweep(spark, sf)
      .select("chunk_size", "n_chunks", "n_distinct")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === expected)
    // the synthetic corpus recombines a tiny vocabulary: small chunks
    // MUST collide more than large ones or the sweep carries no signal
    val fracs = TextAnalysis.q168ChunkDedupSweep(spark, sf)
      .select("dup_frac").as[Double].collect()
    assert(fracs.head > fracs.last,
      "8-token chunks must deduplicate more than 64-token chunks")
    assert(fracs.forall(f => f >= 0.0 && f < 1.0))
  }

  test("q169 quantization audit: errors bounded by half a step, uniform n") {
    val df = Similarity.q169QuantAudit(spark, sf).cache()
    val nEmb = Tables.embeddings(spark, sf).count()
    assert(df.count() === 64)
    assert(df.filter(col("n_vals") =!= nEmb).count() === 0)
    // affine min/max quantization error is at most scale/2 (+12-dp slack)
    assert(df.filter(
      col("max_err") > (col("mx") - col("mn")) / lit(510.0) + lit(1e-12))
      .count() === 0)
    assert(df.filter(col("mae") > col("max_err")).count() === 0)
    assert(df.filter(col("mae") < 0.0).count() === 0)
  }

  test("q170 source JSD: matches a full-vocabulary brute-force recompute") {
    import spark.implicits._
    val counts = Tables.documents(spark, sf)
      .select(col("source"), explode(split(trim(col("text")), " +")).as("t"))
      .groupBy("source", "t").count()
      .as[(String, String, Long)].collect()
    val ct = counts.groupBy(_._2).map { case (t, xs) => t -> xs.map(_._3).sum }
    val n = ct.values.sum.toDouble
    val expected = counts.groupBy(_._1).map { case (src, xs) =>
      val cs = xs.map(x => x._2 -> x._3).toMap
      val ns = cs.values.sum.toDouble
      // plain full-support JSD, NO closed-form tail and NO pre-sum
      // rounding — an independent formulation of the same quantity
      val jsd = ct.map { case (t, c) =>
        val p = cs.getOrElse(t, 0L) / ns
        val q = c / n
        val m = (p + q) / 2.0
        (if (p > 0) 0.5 * p * math.log(p / m) else 0.0) +
          0.5 * q * math.log(q / m)
      }.sum
      src -> jsd
    }
    val got = TextAnalysis.q170SourceJsd(spark, sf)
      .select("source", "jsd").as[(String, Double)].collect().toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (src, v) =>
      assert(math.abs(v - expected(src)) < 1e-6, s"$src: $v vs ${expected(src)}")
      assert(v >= -1e-9 && v <= math.log(2.0) + 1e-9,
        s"$src: JSD must sit in [0, ln 2]")
    }
  }

  test("q171 winnowing: matches brute-force selection and keeps the MOSS guarantee") {
    import spark.implicits._
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex16(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
    val K = Dedup.WinnowK
    val W = Dedup.WinnowW
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), " +").as("toks"))
      .as[(Long, Seq[String])].collect()
    def winnow(toks: Seq[String]): Set[(Long, String)] = {
      if (toks.length < K) return Set.empty
      val hs = (0 to toks.length - K)
        .map(i => md5hex16(toks.slice(i, i + K).mkString(" ")))
      val lastStart = math.max(hs.length - W, 0)
      (0 to lastStart).map { j =>
        val frame = hs.slice(j, j + W).zipWithIndex
        // min hash, rightmost position on ties — the robust rule
        val (h, off) = frame.minBy { case (x, i) => (x, -i) }
        ((j + off).toLong, h)
      }.toSet
    }
    val expected = docs.flatMap { case (id, t) =>
      winnow(t).map { case (p, h) => (id, p, h) }
    }.toSet
    val got = Dedup.q171Winnow(spark, sf)
      .as[(Long, Long, String)].collect().toSet
    assert(got === expected)
    // guarantee: two docs sharing a W+K-1 token run share a fingerprint
    val byId = docs.toMap
    val fpByDoc = docs.map { case (id, t) => id -> winnow(t) }.toMap
    val runs = docs.flatMap { case (id, t) =>
      t.sliding(W + K - 1).filter(_.length == W + K - 1)
        .map(r => r.mkString(" ") -> id)
    }.groupBy(_._1).values.filter(_.length >= 2)
    assert(runs.nonEmpty, "corpus must contain shared 7-token runs")
    runs.foreach { pairs =>
      val ids = pairs.map(_._2).distinct
      for (a <- ids; b <- ids if a < b) {
        val shared = fpByDoc(a).map(_._2) intersect fpByDoc(b).map(_._2)
        assert(shared.nonEmpty,
          s"docs $a and $b share a ${W + K - 1}-token run but no fingerprint " +
            s"(|toks|=${byId(a).length},${byId(b).length})")
      }
    }
  }

  test("q22 brute-force ANN: exactly top-10 per query, cosine in [-1, 1]") {
    val df = Similarity.q22AnnBruteForce(spark, sf).cache()
    assert(df.groupBy("query_id").count().filter(col("count") =!= 10).count() === 0)
    assert(df.filter(col("cosine") < -1.0 || col("cosine") > 1.0).count() === 0)
    assert(df.filter(col("query_id") === col("neighbor_id")).count() === 0)
  }

  test("q23 LSH ANN: recall@10 >= 0.85 and candidates stay a strict corpus subset") {
    import spark.implicits._
    val exact = Similarity.q22AnnBruteForce(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.q23AnnLsh(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"LSH recall@10 = $recall")
    // 0.98 measured with the 8x6x7 multiprobe config; deterministic
    // planes, so 0.85 is regression margin, not flake allowance.
    assert(recall >= 0.85)
    // Scored fraction: the multiprobe index must remain a real filter,
    // never degenerate into brute force over the corpus.
    val n = Tables.embeddings(spark, sf).count()
    val scored = Similarity.lshCandidates(spark, sf).count()
    val frac = scored.toDouble / (n * 5)
    info(f"scored candidate fraction = $frac%.3f")
    // 0.73 measured for the (8,6,10) production config at this 500-row
    // isotropic draw (the fraction is set by the corpus's neighbor
    // spectrum, not the index — see the config note in Similarity); the
    // bound is a degenerate-to-brute-force regression gate.
    assert(frac < 0.80, "multiprobe LSH must score a strict subset of the corpus")
  }

  test("q24 multimodal stub: metadata derives from byte length; plumbing is typed") {
    val df = Multimodal.q24MultimodalStub(spark, sf).cache()
    assert(df.count() === 500)
    assert(df.filter(col("width") =!= col("n_bytes") % 64 + 1).count() === 0)
    assert(df.filter(length(col("header_hex")) =!= 16).count() === 0)
  }

  test("q39 frame sampling: every 5th frame, timestamps and resize dims consistent") {
    val meta = Multimodal.q24MultimodalStub(spark, sf)
      .select(col("doc_id"), col("n_frames"), col("width"), col("height"))
    val frames = Multimodal.q39FrameSample(spark, sf)
    // sampled index set is exactly {0, 5, 10, ...} < n_frames per doc
    val bad = frames.join(meta, "doc_id").filter(
      col("frame_idx") % 5 =!= 0 ||
        col("frame_idx") >= col("n_frames") ||
        col("ts_ms") =!= col("frame_idx") * 100L ||
        col("out_w") =!= expr("CAST(width / 2 + 1 AS INT)") ||
        col("out_h") =!= expr("CAST(height / 2 + 1 AS INT)"))
    assert(bad.count() === 0)
    val perDoc = frames.groupBy("doc_id").count()
      .join(meta, "doc_id")
      .filter(col("count") =!= expr("CAST((n_frames - 1) / 5 AS INT) + 1"))
    assert(perDoc.count() === 0)
    assert(frames.count() > 500) // multiple sampled frames per document
  }

  test("q52 incremental dedup: verdicts match an independent model, incl. injected exact dups") {
    import spark.implicits._
    // Inject exact duplicates with chosen ids: the gate corpus has all-
    // distinct texts, so the exact_corpus / exact_batch verdicts need
    // planted rows. doc_id % 5 == 0 is the incoming side.
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val someExisting = base.find(_._1 % 5 != 0).get
    val someIncoming = base.find(x => x._1 % 5 == 0 && x._2.trim.nonEmpty).get
    val maxId = base.map(_._1).max
    // next multiples of 5 above maxId: two copies of an existing text
    // (first -> exact_corpus) and one copy of an incoming text
    // (-> exact_batch, the original being first in batch)
    val id1 = (maxId / 5 + 1) * 5
    val injected = Seq(
      (id1, someExisting._2),       // exact_corpus
      (id1 + 5, someIncoming._2),   // exact_batch (someIncoming._1 < id1+5)
      (id1 + 10, someExisting._2))  // exact_corpus wins over exact_batch
    val all = base.toSeq ++ injected
    val got = graft.operators.Dedup.incrementalDedup(
        all.toDF("doc_id", "text"))
      .as[(Long, String)].collect().toMap

    // independent in-memory model
    def shingles(t: String): Set[String] = {
      val toks = t.trim.split(" +")
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val existing = all.filter(_._1 % 5 != 0)
    val incoming = all.filter(_._1 % 5 == 0)
    val existingTexts = existing.map(_._2).toSet
    val existingSh = existing.map(x => shingles(x._2)).filter(_.nonEmpty)
    val firstByText = incoming.groupBy(_._2).map { case (t, xs) =>
      t -> xs.map(_._1).min }
    val expected = incoming.map { case (id, text) =>
      val sh = shingles(text)
      val v =
        if (existingTexts.contains(text)) "exact_corpus"
        else if (firstByText(text) < id) "exact_batch"
        else if (sh.nonEmpty && existingSh.exists(es =>
          (sh & es).size.toDouble / (sh | es).size >= 0.5)) "near_dup_corpus"
        else "admitted"
      id -> v
    }.toMap
    assert(got === expected)
    assert(got(id1) === "exact_corpus")
    assert(got(id1 + 5) === "exact_batch")
    assert(got(id1 + 10) === "exact_corpus")
    // the natural corpus must exercise the near-dup path too
    assert(expected.values.count(_ == "near_dup_corpus") > 0)
  }

  test("q51 dup-ngram stats agree with an independent in-memory model") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def grams(t: String): Set[String] = {
      val toks = t.trim.split(" +")
      if (toks.length < 4) Set.empty
      else toks.sliding(4).map(_.mkString(" ")).toSet
    }
    val byDoc = docs.map { case (id, t) => id -> grams(t) }.toMap
    val df = scala.collection.mutable.Map.empty[String, Long]
    byDoc.values.foreach(_.foreach(g => df(g) = df.getOrElse(g, 0L) + 1L))
    val expected = byDoc.map { case (id, gs) =>
      val nDup = gs.count(df(_) > 1).toLong
      val maxDf = if (gs.isEmpty) 0L else gs.map(df).max
      (id, (gs.size.toLong, nDup, maxDf,
        if (gs.isEmpty) 0.0 else nDup.toDouble / gs.size))
    }
    val got = Dedup.q51DupNgramStats(spark, sf).collect()
      .map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === expected)
    // the corpus must actually exercise the signal: some docs share grams
    assert(expected.values.count(_._2 > 0) > 0)
  }

  test("q54 substring-run stats agree with an independent in-memory model") {
    val L = 8
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1).trim.split(" +").toSeq)
    // (doc, position) -> window string; shared = in >= 2 distinct docs
    val windows = docs.map { case (id, toks) =>
      id -> (if (toks.length < L) Seq.empty[(Int, String)]
             else toks.sliding(L).map(_.mkString(" ")).zipWithIndex
               .map { case (g, i) => (i, g) }.toSeq)
    }.toMap
    val docsPerGram = windows.toSeq
      .flatMap { case (id, ws) => ws.map { case (_, g) => (g, id) } }
      .distinct.groupBy(_._1).view.mapValues(_.size).toMap
    val expected = docs.map { case (id, toks) =>
      val ws = windows(id)
      val sharedPos = ws.collect { case (i, g) if docsPerGram(g) > 1 => i }.sorted
      // maximal consecutive runs
      val runs = sharedPos.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, i) if i == e + 1 => (s, i) :: rest
        case (acc, i) => (i, i) :: acc
      }.reverse
      val maxRun = if (runs.isEmpty) 0L else runs.map { case (s, e) => e - s + L }.max.toLong
      // merge overlapping token intervals [s, e+L-1]
      val ivs = runs.map { case (s, e) => (s, e + L - 1) }.sortBy(_._1)
      val covered = ivs.foldLeft(List.empty[(Int, Int)]) {
        case ((ms, me) :: rest, (s, e)) if s <= me => (ms, math.max(me, e)) :: rest
        case (acc, iv) => iv :: acc
      }.map { case (s, e) => (e - s + 1).toLong }.sum
      (id, (toks.length.toLong, ws.length.toLong, sharedPos.length.toLong, maxRun,
        if (covered == 0) 0.0 else covered.toDouble / toks.length))
    }.toMap
    val got = Dedup.q54SubstringRuns(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))).toMap
    assert(got === expected)
    // the planted near-dups must produce real runs and real coverage
    assert(expected.values.exists(_._4 >= 2 * L),
      "corpus should contain at least one long verbatim run")
    assert(expected.values.forall(_._5 <= 1.0))
  }

  test("q59 audio chunks: 25s hops, 30s windows, exact tail padding") {
    val win = 30 * 16000L; val hop = 25 * 16000L
    val rows = graft.operators.Multimodal.q59AudioChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, cs) =>
      val sorted = cs.sortBy(_._2)
      // starts advance by exactly one hop; chunk 0 starts at 0
      sorted.zipWithIndex.foreach { case ((_, idx, s, e, ms, n, pad), i) =>
        assert(idx == i && s == i * hop)
        assert(ms == s * 1000 / 16000)
        assert(e - s == n && n <= win && pad == win - n)
      }
      // all but the last chunk are full windows; consecutive chunks
      // overlap by win - hop = 5 s
      sorted.init.foreach { case (_, _, _, _, _, n, _) => assert(n == win) }
      sorted.toList.sliding(2).foreach {
        case List((_, _, _, e1, _, _, _), (_, _, s2, _, _, _, _)) =>
          assert(e1 - s2 == win - hop, "5 s overlap between chunks")
        case _ => ()
      }
      // the document is fully covered: last chunk ends at n_samples
      val totalEnd = sorted.last._4
      assert(totalEnd >= sorted.last._3)
    }
    // the corpus must exercise multi-chunk docs
    assert(rows.groupBy(_._1).values.exists(_.size >= 3))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q68 block dedup agrees with an independent in-memory model") {
    val B = Dedup.BlockB
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1).trim.split(" +").toSeq)
      .sortBy(_._1)
    val blocks = docs.flatMap { case (id, toks) =>
      toks.grouped(B).zipWithIndex.map { case (b, i) => (id, i, b.mkString(" ")) }
    }
    // first occurrence wins, scanning in (doc_id, bidx) order
    val seen = scala.collection.mutable.HashSet.empty[String]
    val kept = blocks.filter(t => seen.add(t._3)) // already (doc, bidx)-ordered
    val keptByDoc = kept.groupBy(_._1)
    val expected = docs.map { case (id, toks) =>
      val nb = ((toks.length + B - 1) / B).toLong
      val k = keptByDoc.getOrElse(id, Array.empty[(Long, Int, String)])
      val fp = if (k.isEmpty) null
               else md5hex(k.sortBy(_._2).map(_._3).mkString(" "))
      (id, (nb, k.length.toLong, fp))
    }.toMap
    val got = Dedup.q68BlockDedup(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got === expected)
    // the corpus must actually exercise removal AND reassembly identity:
    // docs with nothing removed must fingerprint to their own text
    assert(expected.values.exists(v => v._2 < v._1),
      "corpus should contain duplicate blocks")
    val intact = docs.toMap.map { case (id, toks) => id -> toks.mkString(" ") }
    expected.foreach { case (id, (nb, nk, fp)) =>
      if (nb == nk) assert(fp == md5hex(intact(id)),
        s"doc $id untouched by dedup must reassemble to itself")
    }
  }

  test("q76 boilerplate scrub agrees with an independent in-memory model " +
      "and removes ALL copies (vs q68's first-wins)") {
    val B = Dedup.BlockB
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1).trim.split(" +").toSeq)
      .sortBy(_._1)
    val blocks = docs.flatMap { case (id, toks) =>
      toks.grouped(B).zipWithIndex.map { case (b, i) => (id, i, b.mkString(" ")) }
    }
    val docFreq = blocks.groupBy(_._3).view
      .mapValues(_.map(_._1).distinct.size).toMap
    val kept = blocks.filter(t => docFreq(t._3) < Dedup.MinDocsBoiler)
    val keptByDoc = kept.groupBy(_._1)
    val expected = docs.map { case (id, toks) =>
      val nb = ((toks.length + B - 1) / B).toLong
      val k = keptByDoc.getOrElse(id, Array.empty[(Long, Int, String)])
      val fp = if (k.isEmpty) null
               else md5hex(k.sortBy(_._2).map(_._3).mkString(" "))
      (id, (nb, k.length.toLong, fp))
    }.toMap
    val got = Dedup.q76BoilerplateScrub(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(got === expected)
    // the threshold must actually fire on this corpus...
    val boiler = blocks.filter(t => docFreq(t._3) >= Dedup.MinDocsBoiler)
    assert(boiler.nonEmpty, "corpus should contain template blocks")
    // ...and the semantics must differ from q68: a template block's FIRST
    // occurrence is also removed (q68 would have kept it)
    val firstOcc = boiler.minBy(t => (t._1, t._2))
    val keptInDoc = keptByDoc.getOrElse(firstOcc._1, Array.empty)
    assert(!keptInDoc.exists(_._2 == firstOcc._2),
      "boilerplate removal must drop the first occurrence too")
  }

  test("q70 vocab stats agree with an independent in-memory model") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1).toLowerCase.trim.split(" +").toSeq)
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      val counts = ds.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toSeq
      val n = counts.map(_._2.toLong).sum
      val ranked = counts.sortBy { case (w, c) => (-c, w) }
      (lang, (n, counts.size.toLong, counts.count(_._2 == 1).toLong,
        ranked.head._1,
        counts.size.toDouble / n,
        ranked.take(TextAnalysis.TopMass).map(_._2.toLong).sum.toDouble / n))
    }
    val got = TextAnalysis.q70VocabStats(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got === expected)
    assert(got.nonEmpty && got.values.forall(v => v._5 > 0 && v._6 <= 1.0))
  }

  test("q72 unigram drift agrees with a decimal-exact in-memory model and is >= 0") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("text")).collect()
      .map(r => r.getString(0) -> r.getString(1).toLowerCase.trim.split(" +").toSeq)
    val sc = docs.flatMap { case (s, ts) => ts.map(s -> _) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap // (source,w) -> c_sw
    val cw = sc.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val ns = sc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n = cw.values.sum
    val expected = sc.groupBy(_._1._1).map { case (src, m) =>
      val s = m.map { case ((_, w), cSw) =>
        // exactly the operator's float discipline: one double ln of an
        // exact-integer ratio, rounded to DECIMAL(18,6), scaled by c_sw
        val lr = BigDecimal(math.log((cSw.toDouble * n) / (ns(src).toDouble * cw(w))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
        lr * BigDecimal(cSw)
      }.sum
      src -> (ns(src), s.toDouble / ns(src))
    }
    val got = TextAnalysis.q72UnigramDrift(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === expected)
    // Gibbs: KL >= 0 up to the 1e-6/term decimal rounding
    assert(got.values.forall(_._2 > -1e-4))
    assert(got.values.exists(_._2 > 0), "sources must show measurable drift")
  }
  test("q87 cross-split near-dups are exactly q20's pairs that straddle the split") {
    import org.apache.spark.sql.functions.{col, conv, md5, substring}
    val bucket = (conv(substring(md5(col("text")), 1, 8), 16, 10)
      .cast("long") % 100).as("bucket")
    val split = Tables.documents(spark, sf).select(col("doc_id"), bucket)
    val all = Dedup.q20MinHashDedup(spark, sf)
      .join(split.select(col("doc_id").as("doc_a"), col("bucket").as("ba")), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"), col("bucket").as("bb")), "doc_b")
    // q20 emits doc_a < doc_b; a cross-split pair can sit either way round
    val expected = all.filter(col("ba") < 90 && col("bb") >= 90)
      .select(col("doc_a").as("t"), col("doc_b").as("e"), col("jaccard"))
      .unionAll(all.filter(col("bb") < 90 && col("ba") >= 90)
        .select(col("doc_b").as("t"), col("doc_a").as("e"), col("jaccard")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Dedup.q87CrossSplitNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "this corpus plants cross-split near-dup pairs")
  }

  private def editDistance(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("q97 fuzzy vocab join equals brute-force levenshtein over the vocabulary") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val vocab = Tables.part(spark, sf)
      .groupBy(col("p_name")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val names = vocab.keys.toSeq.sorted
    val expected = (for {
      i <- names.indices; j <- (i + 1) until names.length
      d = editDistance(names(i), names(j)) if d <= Dedup.FuzzyMaxDist
    } yield (names(i), names(j), d.toLong, vocab(names(i)), vocab(names(j)))).toSet
    val got = Dedup.q97FuzzyVocabJoin(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === expected,
      "deletion-neighborhood blocking must be a complete candidate generator")
    assert(got.nonEmpty, "the part vocabulary contains near-spellings")
  }

  test("q100 column stats match direct per-column aggregates") {
    import org.apache.spark.sql.functions.{col, countDistinct, max, min}
    val li = Tables.lineitem(spark, sf)
    val got = graft.operators.Profiling.q100TableStats(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val nRows = li.count()
    graft.operators.Profiling.StatCols.foreach { c =>
      val d = li.agg(countDistinct(col(c)), min(col(c)).cast("double"),
        max(col(c)).cast("double")).collect()(0)
      val (n, nulls, ndv, mn, mx) = got(c)
      assert(n === nRows, s"$c n_rows")
      assert(nulls === li.filter(col(c).isNull).count(), s"$c nulls")
      assert(ndv === d.getLong(0), s"$c ndv")
      assert(mn === d.getDouble(1), s"$c min")
      assert(mx === d.getDouble(2), s"$c max")
    }
  }

  test("q146: matrix cells tally q20's pairs exactly and rates are consistent") {
    val cells = graft.operators.Dedup.q146SourceDupMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    val pairTotal = graft.operators.Dedup.q20MinHashDedup(spark, sf).count()
    assert(cells.map(_._3).sum == pairTotal,
      "every verified near-dup pair lands in exactly one matrix cell")
    val sizes = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    cells.foreach { case (a, b, np, na, nb, poss, ppm) =>
      assert(a <= b, "canonical cell ordering")
      assert(na == sizes(a) && nb == sizes(b))
      assert(poss == (if (a == b) na * (na - 1) / 2 else na * nb))
      assert(np <= poss)
      val exp = BigDecimal(np.toDouble / poss * 1e6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ppm === exp, s"rate at ($a,$b)")
    }
  }

  test("q188 sweep: monotone in theta and consistent with q40's pair set") {
    val pairs = Dedup.q40NgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val rows = Dedup.q188DedupSweep(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === Dedup.SweepThetas)
    rows.foreach { case (th, np, nd) =>
      val exp = pairs.filter(_._3 >= th)
      assert(np === exp.length.toLong, s"pairs at $th")
      assert(nd === exp.flatMap(p => Seq(p._1, p._2)).distinct.length.toLong,
        s"docs at $th")
      assert(nd <= 2 * np, "affected docs bounded by pair endpoints")
    }
    assert(rows.sliding(2).forall(w => w(0)._2 >= w(1)._2),
      "pair count is non-increasing in theta")
    assert(rows.head._2 === pairs.length.toLong,
      "the base threshold row IS q40's pair set")
  }

  test("q189 SNM: equals the sorted-window brute replay, subset of q40") {
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val key = docs.map { case (id, tx) =>
      id -> tx.trim.toLowerCase.split(" +").take(Dedup.SnmKeyTok).mkString(" ")
    }.toMap
    val order = docs.map(_._1).sortBy(id => (key(id), id))
    val sh = docs.map { case (id, tx) =>
      val toks = tx.trim.split(" +")
      id -> toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val expected = (for {
      i <- order.indices; j <- (i + 1) to math.min(i + Dedup.SnmW, order.length - 1)
      a = order(i); b = order(j)
      if sh(a).nonEmpty && sh(b).nonEmpty
      jac = sh(a).intersect(sh(b)).size.toDouble /
        (sh(a) union sh(b)).size
      if jac >= 0.5
    } yield (math.min(a, b), math.max(a, b), jac)).toSet
    val got = Dedup.q189SnmDedup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected, "frozen-rank window must equal the sorted replay")
    assert(got.nonEmpty, "shared openings put near-dups in the window")
    val complete = Dedup.q40NgramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.subsetOf(complete),
      "SNM verifies with the same exact Jaccard — it can only MISS pairs")
  }

  test("q174 containment equals brute force over every ordered pair") {
    import org.apache.spark.sql.functions.{col, split, trim}
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(col("text")), " +").as("toks"))
      .collect().map { r =>
        val toks = r.getSeq[String](1)
        r.getLong(0) ->
          toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
      }.filter(_._2.size >= Dedup.ContainMinSh)
    val expected = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
      c = sa.intersect(sb).size.toDouble / sa.size
      if c >= Dedup.ContainTheta
    } yield (ia, ib, c)).toSet
    val got = Dedup.q174Containment(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === expected,
      "prefix + full-index candidates must be a complete generator")
    assert(got.nonEmpty, "the corpus contains containment pairs")
  }

  test("q174: a fragment inside a compilation is caught at Jaccard far below θ") {
    import spark.implicits._
    val fragToks = (1 to 12).map(i => s"frag$i")
    val tailToks = (1 to 60).map(i => s"tail$i")
    val base = Seq(
      (1L, fragToks.mkString(" ")),
      (2L, (fragToks ++ tailToks).mkString(" ")),
      (3L, (1 to 30).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(base).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 2L, 1.0)),
      "fragment->container detected once, never the reverse direction")
    // the symmetric measure on the same pair: 10 shared trigrams of a
    // 70-trigram union — far below every Jaccard dedup threshold.
    val jac = 10.0 / 70.0
    assert(jac < Dedup.ContainTheta / 2,
      "this pair is invisible to the Jaccard family by construction")
  }

  test("q192 fingerprint near-dup: exact verify vs brute, pigeonhole recall") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf).selectExpr("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // brute replay of the parity fingerprint
    val fps = docs.flatMap { case (id, tx) =>
      val toks = tx.trim.split(" +")
      if (toks.length < 2) None
      else {
        val bits = new Array[Long](Dedup.FpBuckets)
        toks.sliding(2).foreach { w =>
          val b = (java.lang.Long.parseLong(
            md5hex(w.mkString(" ")).take(8), 16) % Dedup.FpBuckets).toInt
          bits(b) += 1
        }
        val bands = (0 until Dedup.FpBuckets / Dedup.FpBandBits).map { j =>
          (0 until Dedup.FpBandBits).map { k =>
            (bits(j * Dedup.FpBandBits + k) % 2) << k
          }.sum
        }
        Some(id -> bands)
      }
    }.toMap
    def ham(a: Seq[Long], b: Seq[Long]): Long =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum
    val ids = fps.keys.toSeq.sorted
    val brute = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      h = ham(fps(ids(i)), fps(ids(j))) if h <= Dedup.FpHamMax
    } yield (ids(i), ids(j), h)).toSet
    val got = Dedup.q192FingerprintNeardup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.nonEmpty, "the corpus's planted near-dups collide on a band")
    assert(got.subsetOf(brute),
      "the XOR+bit_count verify is exact — no false positives ever")
    // pigeonhole: < 4 flipped bits cannot touch all 4 bands, so every
    // pair within Hamming 3 MUST share an untouched band -> caught
    val guaranteed = brute.filter(_._3 < Dedup.FpBuckets / Dedup.FpBandBits)
    assert(guaranteed.subsetOf(got),
      "pairs within Hamming 3 are pigeonhole-guaranteed candidates")
  }

  test("q216 LSH tuner matches an exact replay; S-curve monotone in bands") {
    val js = Dedup.q40NgramJaccard(spark, sf).collect().map(_.getDouble(2))
    def d6(v: Double): BigDecimal =
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    def sq(x: Double, k: Int): Double = (1 to k).foldLeft(x)((e, _) => e * e)
    val expect = Dedup.LshTuneGrid.map { case (lr, lb) =>
      val (r, b) = (1 << lr, 1 << lb)
      var (sm, sx) = (BigDecimal(0), BigDecimal(0))
      var tgt = 0L
      for (s <- js) {
        val miss = sq(1.0 - sq(s, lr), lb)
        if (s >= Dedup.LshTuneTarget) { tgt += 1; sm += d6(miss) }
        else sx += d6(1.0 - miss)
      }
      (r.toLong, b.toLong, tgt, sm.toDouble, sx.toDouble, (sm + sx).toDouble)
    }.sortBy(t => (t._1, t._2))
    val got = Dedup.q216LshTuner(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toSeq
    assert(got === expect, "exact per-candidate expected miss/extra")
    // P(catch) is increasing in bands at fixed rows: more bands -> fewer
    // expected misses, more expected extra verifications
    for (Seq(a, c) <- got.groupBy(_._1).values.map(_.sortBy(_._2).toSeq)
        .flatMap(_.sliding(2)).filter(_.size == 2)) {
      assert(a._4 >= c._4, s"missed must fall with bands at r=${a._1}")
      assert(a._5 <= c._5, s"extra must rise with bands at r=${a._1}")
    }
  }
}
