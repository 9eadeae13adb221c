package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming recombine: the stanza `recombine` operator
  * (plugins/container_logs.yaml:111-114) as custom keyed state —
  * `flatMapGroupsWithState` buffers partial turns per conversation and emits
  * one combined record when the final (`F|`) marker arrives; a timeout
  * flushes abandoned sessions (the operator's `force_flush_period`), in
  * either of two modes:
  *
  *   - ProcessingTimeTimeout — wall-clock idleness, FAITHFUL to the
  *     reference's ticker;
  *   - EventTimeTimeout — the watermark passing the batch's last entry +
  *     timeout, the DETERMINISTIC analog (re-running the same input gives
  *     the same flushes), used by `StreamingPipeline.streamingRecombine`.
  *
  * Identity of an emitted batch is (conv_id, first_turn) — unique while a
  * source's entries arrive in order. A post-flush late retransmit can
  * restart a batch at an already-emitted first turn_idx and repeat an
  * identity; consumers that need an exactly-once key must include a content
  * digest. There is deliberately NO session counter in state: a batch's
  * state exists only while it is OPEN (buffered partials awaiting a marker
  * or timeout) and is REMOVED on every flush, so keyed state is bounded by
  * in-flight batches, not by source cardinality.
  *
  * The batch engine expresses the same thing as a window sessionization
  * (ParseOps.recombine); this is the continuous form. Parity on in-order
  * arrival is column-for-column for marker-terminated batches (combine
  * order ties on duplicate turn_idx break by text, matching the batch
  * operator's array_sort over struct(turn_idx, text)); an entry arriving
  * AFTER its batch flushed starts the source's next batch — arrival-order
  * semantics, the same as the reference appending to a fresh batch.
  */
object StatefulRecombine {

  /** `ts` carries event time for EventTimeTimeout mode; processing-time
    * and no-timeout callers may leave it null (it is never read there).
    */
  case class PartTurn(conv_id: String, turn_idx: Int, text: String,
                      ts: java.sql.Timestamp = null)
  /** `n_parts` is Long — the batch operator's count() — so the two
    * surfaces' schemas union without a cast (they differ only in the batch
    * side's extra session_id column).
    */
  case class Combined(conv_id: String, first_turn: Int, last_turn: Int,
                      n_parts: Long, combined: String)

  /** Open-batch state: buffered (turn_idx, text) plus the max event time
    * seen over the batch's WHOLE life — the event-time flush deadline is
    * anchored to it, so a late out-of-order arrival cannot rewind the
    * timeout and force a premature split.
    */
  case class SessionBuf(parts: List[(Int, String)], maxEvtMs: Long)

  /** Duplicate-turn_idx ties break by text compared as UTF-8 BYTES, not
    * String's UTF-16 code units: the batch operator's array_sort over
    * struct(turn_idx, text) (ParseOps.scala:425) compares UTF8String
    * binary, and the two orders diverge for supplementary characters
    * (surrogates sort below U+E000..U+FFFF in UTF-16 but their UTF-8
    * encoding sorts above).
    */
  private[streaming] val partOrd: Ordering[(Int, String)] =
    new Ordering[(Int, String)] {
      def compare(a: (Int, String), b: (Int, String)): Int = {
        val byIdx = java.lang.Integer.compare(a._1, b._1)
        if (byIdx != 0) byIdx
        else java.util.Arrays.compareUnsigned(
          a._2.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          b._2.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }

  def combine(parts: List[(Int, String)]): Combined = {
    val sorted = parts.sorted(partOrd)
    Combined(conv_id = "", first_turn = sorted.head._1, last_turn = sorted.last._1,
      n_parts = sorted.size.toLong, combined = sorted.map(_._2).mkString("\n"))
  }

  /** Per-group state transition — extracted so the timeout paths are unit-
    * testable with `TestGroupState` (no wall-clock in tests).
    */
  def processGroup(convId: String, turns: Iterator[PartTurn],
                   state: GroupState[SessionBuf],
                   timeout: GroupStateTimeout, forceFlushMs: Long): Iterator[Combined] =
    if (state.hasTimedOut) {
      // force_flush parity: emit whatever is buffered, release the state
      val buf = state.getOption.map(_.parts).getOrElse(Nil)
      state.remove()
      if (buf.isEmpty) Iterator.empty
      else Iterator(combine(buf).copy(conv_id = convId))
    } else {
      val prev = state.getOption.getOrElse(SessionBuf(Nil, Long.MinValue))
      val arrived = turns.toVector
      val maxEvtMs = arrived.foldLeft(prev.maxEvtMs) { (m, t) =>
        if (t.ts == null) m else math.max(m, t.ts.getTime)
      }
      // merged turn_idx order (ties by text) — in-order arrival then
      // matches the batch sessionization exactly
      val merged = (prev.parts ++ arrived.map(t => t.turn_idx -> t.text))
        .sorted(partOrd)
      val out = scala.collection.mutable.ListBuffer[Combined]()
      val open = scala.collection.mutable.ListBuffer[(Int, String)]()
      merged.foreach { p =>
        open += p
        if (p._2.startsWith("F|")) {
          out += combine(open.toList).copy(conv_id = convId)
          open.clear()
        }
      }
      val buf = open.toList
      if (buf.isEmpty) state.remove()
      else {
        state.update(SessionBuf(buf, maxEvtMs))
        // arm the force_flush deadline so an abandoned batch flushes via
        // the hasTimedOut branch instead of pinning keyed state forever
        // (equality tests, not patterns: GroupStateTimeout's modes are Java
        // static factory methods, not stable identifiers)
        if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
          state.setTimeoutDuration(forceFlushMs)
        else if (timeout == GroupStateTimeout.EventTimeTimeout)
          // strictly ahead of the watermark, as setTimeoutTimestamp
          // requires; anchored to the batch's LIFETIME max event time
          state.setTimeoutTimestamp(
            math.max(maxEvtMs, state.getCurrentWatermarkMs() + 1L) + forceFlushMs)
        // NoTimeout: marker-only flushing
      }
      out.iterator
    }

  def recombineStream(spark: SparkSession, parts: Dataset[PartTurn],
                      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
                      forceFlushMs: Long = 30000L)
                     : Dataset[Combined] = {
    import spark.implicits._
    require(forceFlushMs > 0, "recombine: force_flush timeout must be positive")
    parts.groupByKey(_.conv_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout) {
        (convId: String, turns: Iterator[PartTurn], state: GroupState[SessionBuf]) =>
          processGroup(convId, turns, state, timeout, forceFlushMs)
      }
  }
}
