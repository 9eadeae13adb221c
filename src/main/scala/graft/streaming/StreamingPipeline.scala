package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.route.Router

/** Continuous variant of the pipeline: Structured Streaming over the same
  * partitioned transcripts layout (the reference is a continuous collector;
  * our batch engine is the deterministic re-expression, this is the faithful
  * streaming one — SURVEY §1.3, §2E).
  *
  * Micro-batches ≙ the collector's batch-at-a-time ConsumeLogs; the
  * per-interval flush of logcount (processor.go:164-177) becomes an
  * event-time tumbling window with a watermark (late data: the reference
  * counts arrivals so late data is impossible; we bound state with a
  * watermark instead of unbounded counters).
  */
object StreamingPipeline {

  val TranscriptSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
    StructField("role", StringType), StructField("text", StringType),
    StructField("tool", StringType), StructField("ts", TimestampNTZType),
    StructField("year", IntegerType), StructField("month", IntegerType),
    StructField("day", IntegerType), StructField("hour", IntegerType)))

  /** The tagging + watermarked windowed count transform, over ANY streaming
    * (or batch) transcript frame — extracted so tests can drive it from a
    * MemoryStream to exercise watermark/late-data semantics directly.
    */
  def windowedRouteCounts(stream: DataFrame,
                          watermark: String = "2 hours"): DataFrame =
    Router.tagged(stream)
      .withColumn("ts_ltz", col("ts").cast("timestamp"))
      .withWatermark("ts_ltz", watermark)
      .groupBy(window(col("ts_ltz"), "1 hour"), col("route"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("route"), col("n"))

  /** Continuous logdedup (logdedupprocessor's per-interval duplicate
    * counts, §2D/§2E): a WATERMARKED windowed aggregation — dedup state is
    * one row per (window, body_md5, role) and EXPIRES as soon as the
    * watermark passes the window end, the streaming analog of the
    * processor's interval ticker flush, with state bounded at any scale.
    * The flush contract (agg + projection, first_arrival format) is the
    * SAME code as the batch operator (AggOps.dedupFlush), and the window
    * is taken over `ts` as-is, so window_start carries the input's
    * timestamp type exactly like batch windowStart does (NTZ on the
    * production parquet layout). Parameter order mirrors AggOps.logDedup:
    * interval second, the streaming-only watermark last.
    */
  def streamingLogDedup(stream: DataFrame, interval: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    graft.agg.AggOps.dedupFlush(
      stream
        .withWatermark("ts", watermark)
        .withColumn("arrival", graft.agg.AggOps.arrivalKey)
        .groupBy(window(col("ts"), interval),
          md5(col("text")).as("body_md5"), col("role")),
      col("window.start"))

  /** readStream → severity/route tagging → watermarked windowed per-route
    * counts. One file per micro-batch keeps the demo deterministic.
    */
  def routedCounts(spark: SparkSession, inputPath: String): DataFrame =
    windowedRouteCounts(spark.readStream
      .schema(TranscriptSchema)
      .option("maxFilesPerTrigger", "8")
      .parquet(inputPath))

  /** Drive the stream to completion against a static directory (batch parity
    * harness: processAllAvailable consumes every file, then the result table
    * must equal the batch pipeline's counts).
    */
  def runToCompletion(spark: SparkSession, inputPath: String,
                      queryName: String = "routed_counts"): StreamingQuery = {
    val q = routedCounts(spark, inputPath).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.ProcessingTime("0 seconds"))
      .start()
    q.processAllAvailable()
    q
  }
}
