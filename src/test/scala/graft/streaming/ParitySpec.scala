package graft.streaming

import graft.SparkSpec

/** q25 through the file-stream source must equal the batch flagship q01
  * row-for-row (same oracle). */
class ParitySpec extends SparkSpec {
  test("q25 file-stream parity equals batch q01") {
    val streamed = StreamParity.q25StreamBatchParity(spark, sf).collect().toSeq
    val batch = graft.operators.Relational.q01SlidingWindowAgg(spark, sf)
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }
}
