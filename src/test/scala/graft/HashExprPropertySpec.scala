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
