package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming recombine: the stanza `recombine` operator
  * (plugins/container_logs.yaml:111-114) as custom keyed state —
  * `flatMapGroupsWithState` buffers partial turns per conversation and emits
  * one combined record when the final (`F|`) marker arrives; a processing-
  * time timeout flushes abandoned sessions (the operator's `force_flush`
  * semantics).
  *
  * The batch engine expresses the same thing as a window sessionization
  * (ParseOps.recombine); this is the continuous form, with state bounded per
  * active conversation rather than per window.
  */
object StatefulRecombine {

  case class PartTurn(conv_id: String, turn_idx: Int, text: String)
  case class Combined(conv_id: String, first_turn: Int, last_turn: Int,
                      n_parts: Int, combined: String)
  case class SessionBuf(parts: List[(Int, String)])

  def combine(parts: List[(Int, String)]): Combined = {
    val sorted = parts.sortBy(_._1)
    Combined(conv_id = "", first_turn = sorted.head._1, last_turn = sorted.last._1,
      n_parts = sorted.size, combined = sorted.map(_._2).mkString("\n"))
  }

  /** Per-group state transition — extracted so the timeout path is unit-
    * testable with `TestGroupState` (no wall-clock in tests).
    */
  def processGroup(convId: String, turns: Iterator[PartTurn],
                   state: GroupState[SessionBuf],
                   armTimeout: Boolean, forceFlushMs: Long): Iterator[Combined] =
    if (state.hasTimedOut) {
      // force_flush parity: emit whatever is buffered
      val buf = state.getOption.map(_.parts).getOrElse(Nil)
      state.remove()
      if (buf.isEmpty) Iterator.empty
      else Iterator(combine(buf).copy(conv_id = convId))
    } else {
      val out = scala.collection.mutable.ListBuffer[Combined]()
      var buf = state.getOption.map(_.parts).getOrElse(Nil)
      // stable order within the micro-batch
      turns.toSeq.sortBy(_.turn_idx).foreach { t =>
        buf = buf :+ (t.turn_idx -> t.text)
        if (t.text.startsWith("F|")) {
          out += combine(buf).copy(conv_id = convId)
          buf = Nil
        }
      }
      if (buf.isEmpty) state.remove()
      else {
        state.update(SessionBuf(buf))
        // force_flush parity (stanza recombine `force_flush_period`): arm
        // the timeout so an abandoned session flushes via the hasTimedOut
        // branch instead of pinning keyed state forever
        if (armTimeout) state.setTimeoutDuration(forceFlushMs)
      }
      out.iterator
    }

  def recombineStream(spark: SparkSession, parts: Dataset[PartTurn],
                      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
                      forceFlushMs: Long = 30000L)
                     : Dataset[Combined] = {
    import spark.implicits._
    val armTimeout = timeout == GroupStateTimeout.ProcessingTimeTimeout
    parts.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (convId: String, turns: Iterator[PartTurn], state: GroupState[SessionBuf]) =>
          processGroup(convId, turns, state, armTimeout, forceFlushMs)
      }
  }
}
