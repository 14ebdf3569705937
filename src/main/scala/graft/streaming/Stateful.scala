package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Custom stateful streaming (SURVEY.md §2.2 "stateful ops"):
  * per-user running counters via mapGroupsWithState — the primitive the
  * built-in windowed aggregations can't express (arbitrary per-key
  * state machines, e.g. funnel tracking or anomaly counters).
  *
  * State is partitioned by key across executors; each microbatch updates
  * only the keys it saw — the 100 TB shape (state store scales with
  * distinct keys, not events).
  */
object Stateful {

  final case class EventIn(user_id: Long, event_type: String, value: Double)
  final case class UserStats(user_id: Long, n_events: Long, n_purchases: Long,
      total_value: Double)

  def updateUser(id: Long, events: Iterator[EventIn],
      state: GroupState[UserStats]): UserStats = {
    val prev = state.getOption.getOrElse(UserStats(id, 0L, 0L, 0.0))
    val next = events.foldLeft(prev) { (acc, e) =>
      UserStats(id, acc.n_events + 1,
        acc.n_purchases + (if (e.event_type == "purchase") 1L else 0L),
        acc.total_value + e.value)
    }
    state.update(next)
    next
  }

  /** Streaming per-user stats over the events parquet snapshot
    * (AvailableNow). Update output mode: one row per key per batch. */
  def userStats(spark: SparkSession, dir: String): Dataset[UserStats] = {
    import spark.implicits._
    val name = "graft_stream_userstats"
    val q = Streams.eventsStream(spark, dir)
      .select(col("user_id"), col("event_type"), col("value"))
      .as[EventIn]
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(updateUser)
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).as[UserStats]
  }
}
