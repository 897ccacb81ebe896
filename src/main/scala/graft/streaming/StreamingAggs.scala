package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming aggregations over event streams — the true streaming form of
  * the oracle-checked batch `stream_tumbling` query, plus a custom keyed
  * state machine on the `mapGroupsWithState` extension point.
  *
  * Scale design: both operators keep state partitioned by key (window ×
  * event_type, or user) in Spark's state store; the watermark bounds state
  * size by evicting finalized windows — no unbounded driver or executor
  * accumulation at 100 TB/day event volume.
  */
object StreamingAggs {

  /** Watermarked 1-minute tumbling counts. Late events beyond the watermark
    * are dropped; in append mode a window emits exactly once, when the
    * watermark passes its end. The same plan runs on a static DataFrame
    * (that batch form is the oracle-checked `stream_tumbling`).
    */
  def tumblingCounts(events: DataFrame, watermark: String = "2 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("bucket_s"),
        col("event_type"), col("n"), col("sum_value"))

  case class UserEvent(user_id: Long, value: Double)
  case class UserTotals(user_id: Long, n_events: Long, total: Double)

  /** Running per-user (count, sum) maintained across micro-batches via
    * `mapGroupsWithState` — the extension point for state machines the
    * built-in aggregations can't express (the reference's per-source
    * counters, main.py:432,657, generalized to keyed streaming state).
    */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          val batch = it.toSeq
          val next = UserTotals(uid, prev.n_events + batch.size,
            prev.total + batch.map(_.value).sum)
          state.update(next)
          next
      }
  }
}
