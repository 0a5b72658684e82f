package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.streaming.StreamingSessions

/** Streaming operators surfaced through the oracle harness: the streaming
  * result is drained synchronously (AvailableNow → memory sink) and its
  * final table compared against a batch SQL re-derivation.
  *
  * Gap arithmetic is done in *microseconds* on both sides: Spark merges
  * session windows on µs timestamps, so an oracle computing gaps in ms
  * would disagree whenever a gap falls within 1 ms of exactly 30 min.
  */
object StreamingQueries {
  type Q = (SparkSession, String) => DataFrame

  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)

  val q31StreamSession: Q = (s, dir) =>
    StreamingSessions.runAvailableNow(s, dir, s"stream_sessions_${counter.incrementAndGet()}")

  // session_window: a new window starts when the µs gap is >= the gap
  // duration (adjacent windows do not merge); end = last event + gap
  val q31Sql: String = """
    WITH g AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
        CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
             THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
    s AS (
      SELECT user_id, us,
        sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS UNBOUNDED PRECEDING) AS sess
      FROM g)
    SELECT user_id, min(us) // 1000 AS session_start_ms,
      (max(us) + 1800000000) // 1000 AS session_end_ms,
      count(*) AS n_events
    FROM s GROUP BY user_id, sess"""

  val q39StreamSliding: Q = (s, dir) =>
    StreamingSessions.runSlidingAvailableNow(s, dir,
      s"stream_sliding_${counter.incrementAndGet()}")

  // every event belongs to exactly windowDur/slide = 4 epoch-aligned
  // sliding windows: starts floor(ms/slide)*slide - k*slide, k in 0..3
  val q39Sql: String = """
    WITH w AS (SELECT event_type, epoch_ms(ts) AS ms, unnest(range(0, 4)) AS k
               FROM events),
    b AS (SELECT event_type, (ms // 900000) * 900000 - k * 900000 AS wstart FROM w)
    SELECT event_type, wstart AS window_start_ms,
      wstart + 3600000 AS window_end_ms, count(*) AS n
    FROM b GROUP BY 1, 2, 3"""

  // ————————————————————————————— streaming exact dedup (q79)
  // (ingest-time first-seen admission: dropDuplicates over the canonical
  //  text fingerprint, seen-set in the state store. Which row wins is
  //  arrival-order-dependent, so the query emits the fingerprint SET —
  //  order-free and equal to batch SELECT DISTINCT under any schedule.)
  val q79StreamDedup: Q = (s, dir) =>
    graft.streaming.StreamingDedup.runAvailableNow(s, dir,
      s"stream_dedup_${counter.incrementAndGet()}")
  val q79Sql: String = """
    SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
    FROM documents"""

  val all: Map[String, Q] = Map(
    "q31_stream_session" -> q31StreamSession,
    "q39_stream_sliding" -> q39StreamSliding,
    "q79_stream_dedup" -> q79StreamDedup)
  val oracles: Map[String, String] = Map(
    "q31_stream_session" -> q31Sql,
    "q39_stream_sliding" -> q39Sql,
    "q79_stream_dedup" -> q79Sql)
}
