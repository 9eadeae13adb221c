package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StatefulRecombine
import graft.streaming.StatefulRecombine.{Combined, PartTurn}

class StatefulRecombineSpec extends SparkTestBase {
  import spark.implicits._

  test("stateful streaming recombine buffers partials across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[PartTurn]
    val q = StatefulRecombine.recombineStream(spark, input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("recombined").trigger(Trigger.ProcessingTime("0 seconds"))
      .start()
    try {
      // batch 1: two partials, no final → nothing emitted yet
      input.addData(PartTurn("c1", 0, "P|a"), PartTurn("c1", 1, "P|b"))
      q.processAllAvailable()
      assert(spark.table("recombined").count() == 0)

      // batch 2: final marker closes the session spanning both batches;
      // another conversation completes within the batch
      input.addData(PartTurn("c1", 2, "F|c"),
        PartTurn("c2", 0, "F|solo"))
      q.processAllAvailable()
      val rows = spark.table("recombined").as[Combined].collect()
        .map(c => c.conv_id -> c).toMap
      assert(rows("c1").combined == "P|a\nP|b\nF|c")
      assert(rows("c1").n_parts == 3)
      assert(rows("c1").first_turn == 0 && rows("c1").last_turn == 2)
      assert(rows("c2").combined == "F|solo")
    } finally q.stop()
  }

  test("streaming recombine matches the batch sessionization on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val t = graft.model.Transcripts.fromEvents(spark, sfDir)
      .filter(graft.parse.ParseOps.isMultiline)
      .select($"conv_id", $"turn_idx", $"text",
        org.apache.spark.sql.functions.lit(null).cast("timestamp").as("ts"))
      .as[PartTurn]
      .collect().toSeq
    val input = MemoryStream[PartTurn]
    val q = StatefulRecombine.recombineStream(spark, input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("recombined_batchparity").start()
    try {
      input.addData(t)
      q.processAllAvailable()
      val streamed = spark.table("recombined_batchparity").as[Combined]
        .collect().map(c => (c.conv_id, c.first_turn) -> c.combined).toMap
      val batch = graft.parse.ParseOps.recombine(
          graft.model.Transcripts.fromEvents(spark, sfDir))
        .select($"conv_id", $"first_turn", $"combined")
        .as[(String, Int, String)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      // streaming only emits F-terminated sessions; batch also emits the
      // trailing unterminated remainder per conversation
      streamed.foreach { case (k, v) => assert(batch(k) == v, s"key $k") }
      val fTerminated = batch.filter(_._2.split("\n").last.startsWith("F|"))
      assert(streamed.keySet == fTerminated.keySet)
    } finally q.stop()
  }

  test("force_flush: timeout armed on buffered state; timed-out sessions flush") {
    import org.apache.spark.sql.streaming.TestGroupState
    import org.apache.spark.api.java.Optional
    import graft.streaming.StatefulRecombine.SessionBuf

    // 1. partial-only batch: state buffered AND the processing-time timeout
    //    armed (without arming, hasTimedOut can never fire and abandoned
    //    sessions pin keyed state forever)
    val s1 = TestGroupState.create[SessionBuf](
      optionalState = Optional.empty[SessionBuf](), timeoutConf =
        org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = false)
    val out1 = StatefulRecombine.processGroup("c1",
      Iterator(PartTurn("c1", 0, "P|a"), PartTurn("c1", 1, "P|b")),
      s1, org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      forceFlushMs = 50L).toSeq
    assert(out1.isEmpty)
    assert(s1.exists && s1.get.parts.map(_._2) == List("P|a", "P|b"))
    assert(s1.getTimeoutTimestampMs.isPresent,
      "buffered state must arm the force_flush timeout")
    assert(s1.getTimeoutTimestampMs.get == 1050L)

    // 2. the timed-out invocation force-flushes the buffer and clears state
    val s2 = TestGroupState.create[SessionBuf](
      optionalState = Optional.of(SessionBuf(List(0 -> "P|a", 1 -> "P|b"), Long.MinValue)),
      timeoutConf =
        org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 2000L, eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = true)
    val out2 = StatefulRecombine.processGroup("c1", Iterator.empty,
      s2, org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      forceFlushMs = 50L).toSeq
    assert(out2.map(_.combined) == Seq("P|a\nP|b"))
    assert(out2.head.n_parts == 2 && out2.head.conv_id == "c1")
    assert(s2.isRemoved, "flushed session must release its keyed state")

    // 3. a completed (F-terminated) session never arms a timeout
    val s3 = TestGroupState.create[SessionBuf](
      optionalState = Optional.empty[SessionBuf](), timeoutConf =
        org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L, eventTimeWatermarkMs = Optional.empty[Long](),
      hasTimedOut = false)
    val out3 = StatefulRecombine.processGroup("c2",
      Iterator(PartTurn("c2", 0, "F|done")), s3,
      org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      forceFlushMs = 50L).toSeq
    assert(out3.map(_.combined) == Seq("F|done"))
    assert(!s3.exists && !s3.getTimeoutTimestampMs.isPresent)
  }
}
