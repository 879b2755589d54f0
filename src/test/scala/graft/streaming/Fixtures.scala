package graft.streaming

/** Port of the reference's deterministic fixture `gen_records()`
  * (`example/example-utils/src/gen_record.rs:7-75`, FIXTURES.md §2):
  * 45 rows, 3 keys, values 1..15 per key, timestamps at fixed offsets
  * from 2020-03-11T12:01:00+08:00.
  */
object Fixtures {
  final case class Model(timestamp: Long, name: String, value: Long)

  /** 2020-03-11T12:01:00+08:00 in epoch millis. */
  val BaseTs: Long = 1583899260000L

  /** Per-value second offsets from BaseTs (values 1..15). */
  val Offsets: Seq[Int] =
    Seq(0, 5, 15, 20, 25, 35, 40, 45, 55, 60, 65, 75, 80, 85, 95)

  val Keys: Seq[String] = Seq("A-key-0", "B-key-0", "C-key-0")

  def genRecords(): Seq[Model] =
    for {
      key <- Keys
      (off, i) <- Offsets.zipWithIndex
    } yield Model(BaseTs + off * 1000L, key, i + 1L)

  /** Independent brute-force expectation for sliding windows of
    * (sizeSec, slideSec) with sum/max/min/count per (windowStart, key).
    * Window starts are the multiples of slide in (t-size, t]. */
  def expectedWindows(records: Seq[Model], sizeSec: Long, slideSec: Long)
      : Map[(Long, String), (Long, Long, Long, Long)] = {
    val size = sizeSec * 1000; val slide = slideSec * 1000
    records
      .flatMap { m =>
        val maxStart = math.floorDiv(m.timestamp, slide) * slide
        Iterator.iterate(maxStart)(_ - slide)
          .takeWhile(s => s > m.timestamp - size)
          .map(s => (s / 1000, m.name) -> m.value)
      }
      .groupMap(_._1)(_._2)
      .view.mapValues(vs => (vs.sum, vs.max, vs.min, vs.size.toLong))
      .toMap
  }
}
