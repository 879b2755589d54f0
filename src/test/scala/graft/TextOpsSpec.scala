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
}
