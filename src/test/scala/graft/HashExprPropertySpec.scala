package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.GraftFunctions.{simHash64, sortedHashJaccard}

/** Property tests for the hash-family expressions against independent
  * Scala models — random multisets including duplicates, skew, and empty
  * edge cases that the corpus-derived tests cannot force. */
class HashExprPropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = Gen.Parameters.default

  test("property: sortedHashJaccard equals set Jaccard on 200 random long multisets") {
    // duplicates INSIDE an array must collapse (set semantics), and the
    // value range includes collisions-by-construction (small domain).
    val gen = Gen.listOfN(200, for {
      n <- Gen.choose(0, 60)
      m <- Gen.choose(0, 60)
      a <- Gen.listOfN(n, Gen.choose(-50L, 50L))
      b <- Gen.listOfN(m, Gen.choose(-50L, 50L))
    } yield (a, b))
    val cases = gen.pureApply(params, Seed(7L))

    val df = cases.toDF("a", "b")
      .select(sortedHashJaccard(sort_array(col("a")), sort_array(col("b")))
        .as("j"))
    val got = df.as[Double].collect()
    val expected = cases.map { case (a, b) =>
      val (sa, sb) = (a.toSet, b.toSet)
      if (sa.isEmpty && sb.isEmpty) 0.0
      else (sa & sb).size.toDouble / (sa | sb).size
    }
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(java.lang.Double.doubleToLongBits(g) ==
        java.lang.Double.doubleToLongBits(e), s"case $i: got $g expected $e")
    }
  }

  test("property: simHash64 equals the bit-vote model on 200 random hash multisets") {
    val gen = Gen.listOfN(200, for {
      n <- Gen.choose(0, 80)
      a <- Gen.listOfN(n, Gen.choose(Long.MinValue, Long.MaxValue))
    } yield a)
    val cases = gen.pureApply(params, Seed(11L))

    val got = cases.toDF("hs")
      .select(simHash64(col("hs")).as("s")).as[Long].collect()
    val expected = cases.map { hs =>
      (0 until 64).foldLeft(0L) { (sig, b) =>
        val votes = hs.map(h => if (((h >>> b) & 1L) == 1L) 1 else -1).sum
        if (votes > 0) sig | (1L << b) else sig
      }
    }
    got.zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
      assert(g === e, s"case $i")
    }
  }

  test("property: PQ encode/ADC round-trip matches the model on random geometry") {
    // Random unit vectors + random (non-trained) codebooks: encoding must
    // pick the L2-argmin codeword with lowest-index tie-break, and the
    // ADC score must equal the sum of query-subvector dots against the
    // chosen codewords — independent of any training quality.
    val m = 4; val bits = 3; val k = 1 << bits; val dsub = 4; val dim = m * dsub
    val rnd = new scala.util.Random(13)
    def vec(): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val books: Array[Array[Array[Double]]] =
      Array.fill(m, k)(Array.fill(dsub)(rnd.nextGaussian()))
    val booksSeq = books.map(_.map(_.toSeq).toSeq).toSeq
    val vs = Seq.fill(60)(vec())
    val q = vec()

    import graft.functions.GraftFunctions.{pqAdcScore, pqEncode, pqLut}
    val rows = vs.map(_.toSeq).toDF("v")
      .select(pqEncode(col("v"), booksSeq, bits).as("code"),
        pqAdcScore(pqEncode(col("v"), booksSeq, bits),
          pqLut(typedLit(q.toSeq), booksSeq), m, bits, k).as("adc"))
      .collect()
    rows.zip(vs).zipWithIndex.foreach { case ((r, v), ci) =>
      var wantCode = 0L
      var wantAdc = 0.0
      for (s <- 0 until m) {
        val best = (0 until k).minBy { c =>
          ((0 until dsub).map { j =>
            val x = v(s * dsub + j) - books(s)(c)(j); x * x
          }.sum, c)
        }
        wantCode |= best.toLong << (bits * s)
        var d = 0.0
        for (j <- 0 until dsub) d += q(s * dsub + j) * books(s)(best)(j)
        wantAdc += d
      }
      assert(r.getLong(0) === wantCode, s"case $ci code")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(wantAdc), s"case $ci adc")
    }
  }

  test("property: simhash Hamming distance tracks multiset overlap (sanity)") {
    // a document and a lightly-edited copy should have a far closer
    // signature than two unrelated documents — the property the q21
    // banding relies on. Deterministic token pools, 20 trials.
    val rnd = new scala.util.Random(5)
    val vocab = (0 until 1000).map(i => s"w$i")
    (1 to 20).foreach { _ =>
      val doc = Seq.fill(200)(vocab(rnd.nextInt(vocab.size)))
      val edited = doc.updated(rnd.nextInt(doc.size), vocab(rnd.nextInt(vocab.size)))
      val unrelated = Seq.fill(200)(vocab(rnd.nextInt(vocab.size)))
      val rows = Seq(doc, edited, unrelated).map(_.mkString(" ")).toDF("text")
        .select(simHash64(expr(
          "transform(split(text, ' '), t -> xxhash64(t))")).as("s"))
        .as[Long].collect()
      val near = java.lang.Long.bitCount(rows(0) ^ rows(1))
      val far  = java.lang.Long.bitCount(rows(0) ^ rows(2))
      assert(near <= far, s"near=$near far=$far")
    }
  }
}
