package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed Dataset API surface: `groupByKey` + `flatMapGroups` — the
  * imperative per-key escape hatch (the reference's KeyedStateFlatMap
  * general form, `rlink/src/functions/flat_map/keyed_state_flat_map.rs`,
  * in its BATCH shape). Everything else in this engine is declarative
  * Catalyst; this operator exists to pin down the one pattern where an
  * ordered per-key scan genuinely beats SQL: multi-feature session
  * reconstruction in one pass.
  *
  * q93 — per-user session features that need ORDERED iteration:
  * event-type transition counts, max intra-session gap, first/last event
  * type per 300 s-gap session. A pure-SQL formulation needs 2 window
  * passes + a gaps-and-islands aggregation (that IS the DuckDB oracle);
  * the typed form computes all features in one forward scan per user.
  *
  * Scale notes:
  *  - `groupByKey(user).flatMapGroups` is ONE shuffle on user_id; the
  *    per-group iterator is then processed on the executor — no state
  *    store, no driver involvement.
  *  - The in-group sort assumes one user's events fit executor memory
  *    (they must for ANY per-user sessionization, incl. the SQL window
  *    form, whose WindowExec buffers the same partition rows); for keys
  *    too hot for that, pre-aggregate or use the q31 salting shape.
  *  - Row objects are avoided inside the loop: the group is materialized
  *    once into primitive-field case-class instances (Encoders keep the
  *    shuffle in Tungsten format, not Java serialization).
  */
object TypedOps {

  private val GapUs = 300L * 1000000 // 300 s, same gap as q08

  case class Ev(userId: Long, tsUs: Long, eventId: Long, etype: String)
  case class Session(
      user_id: Long, session_start_us: Long, n_events: Long,
      n_transitions: Long, max_gap_us: Option[Long],
      first_type: String, last_type: String)

  def q93TypedSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .map { case (u, t, id, et) => Ev(u, t, id, et) }

    val sessions = ev.groupByKey(_.userId).flatMapGroups { (uid, it) =>
      // one user's events, time-ordered (event_id breaks ts ties
      // deterministically — same order the oracle's window declares)
      val evs = it.toArray.sortBy(e => (e.tsUs, e.eventId))
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      var i = 0
      while (i < evs.length) {
        // consume one session: [i, j)
        var j = i + 1
        var transitions = 0L
        var maxGap = Long.MinValue
        while (j < evs.length && evs(j).tsUs - evs(j - 1).tsUs <= GapUs) {
          if (evs(j).etype != evs(j - 1).etype) transitions += 1
          val g = evs(j).tsUs - evs(j - 1).tsUs
          if (g > maxGap) maxGap = g
          j += 1
        }
        out += Session(uid, evs(i).tsUs, j - i, transitions,
          if (j - i > 1) Some(maxGap) else None,
          evs(i).etype, evs(j - 1).etype)
        i = j
      }
      out
    }
    sessions.toDF().orderBy("user_id", "session_start_us")
  }

  /** Gaps-and-islands + two window passes — the SQL cost this operator
    * collapses into one typed scan. */
  val q93Sql: String =
    s"""WITH e AS (
       |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
       |  FROM events),
       |o AS (
       |  SELECT *,
       |         CASE WHEN lag(ts_us) OVER w IS NULL
       |                OR ts_us - lag(ts_us) OVER w > $GapUs
       |              THEN 1 ELSE 0 END AS new_s,
       |         lag(event_type) OVER w AS prev_type,
       |         ts_us - lag(ts_us) OVER w AS gap
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |s AS (
       |  SELECT *,
       |         SUM(new_s) OVER (PARTITION BY user_id
       |                          ORDER BY ts_us, event_id) AS sid
       |  FROM o),
       |r AS (
       |  SELECT *,
       |         row_number() OVER (PARTITION BY user_id, sid
       |                            ORDER BY ts_us, event_id) AS rn_a,
       |         row_number() OVER (PARTITION BY user_id, sid
       |                            ORDER BY ts_us DESC, event_id DESC) AS rn_d
       |  FROM s)
       |SELECT user_id,
       |       MIN(ts_us) AS session_start_us,
       |       COUNT(*) AS n_events,
       |       COALESCE(COUNT(*) FILTER (new_s = 0 AND event_type <> prev_type), 0)
       |         AS n_transitions,
       |       MAX(gap) FILTER (new_s = 0) AS max_gap_us,
       |       MAX(CASE WHEN rn_a = 1 THEN event_type END) AS first_type,
       |       MAX(CASE WHEN rn_d = 1 THEN event_type END) AS last_type
       |FROM r
       |GROUP BY user_id, sid
       |ORDER BY user_id, session_start_us""".stripMargin
}
