package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state (SURVEY §2.9 absent-row: `mapGroupsWithState`) —
  * the engine-side generalization of the reference's `ADD Log_Length 1`
  * counter (`code/modifier.py:240-249`): arbitrary per-key state maintained
  * incrementally across micro-batches instead of read-modify-write per
  * event.
  */
object Stateful {

  final case class UserEvent(user_id: Long, event_type: String, value: Double)
  final case class UserTotals(user_id: Long, n: Long, total: Double)

  /** Running per-user event count + value total (update-mode snapshot per
    * trigger). State is one small struct per key — bounded by key
    * cardinality, not stream length.
    */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotals] = {
    implicit val totalsEnc = Encoders.product[UserTotals]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, evs: Iterator[UserEvent], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          var n = prev.n
          var total = prev.total
          evs.foreach { e => n += 1; total += e.value }
          val next = UserTotals(uid, n, total)
          state.update(next)
          next
      }
  }

  /** Output mode required by mapGroupsWithState. */
  val outputMode: OutputMode = OutputMode.Update()
}
