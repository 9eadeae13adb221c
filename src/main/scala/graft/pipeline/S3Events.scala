package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The portable notification plane of awss3eventreceiver
  * (receiver/awss3eventreceiver/internal/worker/worker.go:230-300): SQS
  * messages carry S3 event notifications; each message's Records are
  * filtered to `ObjectCreated:*` events (the upstream unmarshalled name —
  * the S3 UI's `s3:` prefix is absent), object keys are URL-DECODED
  * (S3 encodes `=`, `+`, spaces in keys; a key that fails decoding is used
  * as-is, worker.go:253-259), optional bucket-name / object-key regex
  * filters apply, and a message with zero surviving records is deleted
  * (skipped). SQS is at-least-once, so the same object can be announced by
  * multiple messages — the batch model collapses announcements to DISTINCT
  * objects before any content is read, the relational form of the
  * receiver's per-object processing + the manifest's exactly-once commits.
  */
object S3Events {

  case class EventFilter(
      bucketNameRegex: Option[String] = None,
      objectKeyRegex: Option[String] = None)

  val NotificationSchema: StructType = StructType(Seq(
    StructField("Records", ArrayType(StructType(Seq(
      StructField("eventName", StringType),
      StructField("s3", StructType(Seq(
        StructField("bucket", StructType(Seq(
          StructField("name", StringType)))),
        StructField("object", StructType(Seq(
          StructField("key", StringType),
          StructField("size", LongType)))))))))))))

  /** messages(body: json string) → one row per DISTINCT created object
    * (bucket, key, size) surviving the event-name and regex filters.
    */
  def objectCreatedKeys(messages: DataFrame,
                        cfg: EventFilter = EventFilter()): DataFrame = {
    val recs = messages
      .select(explode(from_json(col("body"), NotificationSchema)
        .getField("Records")).as("r"))
      .select(
        col("r.eventName").as("event_name"),
        col("r.s3.bucket.name").as("bucket"),
        col("r.s3.object.key").as("raw_key"),
        col("r.s3.object.size").as("size"))
      // worker.go:269-276: only ObjectCreated:* records process
      .filter(col("event_name").contains("ObjectCreated:"))
      // URL-decode with use-original fallback on malformed input
      .withColumn("key",
        coalesce(try_url_decode(col("raw_key")), col("raw_key")))
    val bucketOk: Column = cfg.bucketNameRegex
      .map(col("bucket").rlike(_)).getOrElse(lit(true))
    val keyOk: Column = cfg.objectKeyRegex
      .map(col("key").rlike(_)).getOrElse(lit(true))
    recs.filter(bucketOk && keyOk)
      // at-least-once SQS: announcements collapse PER OBJECT (bucket, key)
      // before read — an overwritten object re-announced with a new size is
      // still one object (latest = max size)
      .groupBy(col("bucket"), col("key"))
      .agg(max(col("size")).as("size"))
  }
}
