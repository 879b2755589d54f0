package graft.streaming

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.streaming.api._

/** Property test: the facade's sliding-window bucketing (normalized
  * offset → Spark `window(col, size, slide, startTime)`) assigns every
  * timestamp to EXACTLY the windows the reference assigner produces.
  *
  * Reference model (`rlink/src/core/window.rs:42-46`,
  * `rlink/src/functions/window/mod.rs:53-77`):
  *   last_start = ts - (ts - offset + slide) % slide
  *   emit [start, start+size) stepping back by slide while start > ts-size.
  * (The reference clamps negative starts to zero — observable only for
  * timestamps within `size` of the 1970 epoch, which no event-time data
  * hits; generated timestamps here are modern epochs.)
  */
class WindowPropertySpec extends SparkSpec {
  import spark.implicits._

  private val env = StreamExecutionEnvironment(spark)

  private def referenceWindows(ts: Long, size: Long, slide: Long,
      offset: Long): Set[Long] = {
    val lastStart = ts - (ts - offset + slide) % slide
    Iterator.iterate(lastStart)(_ - slide).takeWhile(_ > ts - size).toSet
  }

  test("property: facade sliding windows equal the reference assigner (8 configs x 250 ts)") {
    val params = Gen.Parameters.default
    val configs = Gen.listOfN(8, for {
      slideSec  <- Gen.choose(1, 120)
      k         <- Gen.choose(1, 5)
      offsetSec <- Gen.choose(-(1), 1).flatMap(sign =>
        Gen.choose(0, slideSec - 1).map(o => sign * o))
    } yield (slideSec, k, offsetSec)).pureApply(params, Seed(42L))

    configs.zipWithIndex.foreach { case ((slideSec, k, offsetSec), ci) =>
      val sizeMs = slideSec.toLong * k * 1000
      val slideMs = slideSec.toLong * 1000
      val offsetMs = offsetSec.toLong * 1000
      val tss = Gen.listOfN(250, Gen.choose(0L, 6L * 3600 * 1000))
        .pureApply(params, Seed(1000L + ci))
        .map(Fixtures.BaseTs + _)

      val w = SlidingEventTimeWindows(
        Time(sizeMs), Time(slideMs), Time(offsetMs))
      val got = env.fromDataFrame(tss.toDF("ms"))
        .assignTimestampsAndWatermarks("ms", Time.seconds(1))
        .keyBy("ms")
        .window(w)
        .reduce(Agg.Count())
        .df.select(col("ms"), col("window.start").cast("long") * 1000)
        .collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap

      tss.distinct.foreach { ts =>
        val expected = referenceWindows(ts, sizeMs, slideMs, offsetMs)
        assert(got(ts) === expected,
          s"config(slide=${slideSec}s size=${k}x offset=${offsetSec}s) ts=$ts")
      }
    }
  }
}
