package graft.data

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample stages.
  *
  * The real codecs are NOT available in this container, so the decode step
  * is a clearly-marked deterministic fake ([[FakeCodec]]); everything
  * Spark-side — schema, batch shape, partitioning, the typed mapPartitions
  * pipeline (Scala's analogue of mapInPandas batch UDFs) — is real and
  * tested. Swapping [[FakeCodec]] for a JNI/ffmpeg decoder changes no plan.
  */
object Multimodal {

  case class MediaAsset(asset_id: Long, kind: String, media: Array[Byte],
                        width: Int, height: Int, duration_ms: Long)
  case class MediaFeatures(asset_id: Long, kind: String, n_bytes: Int,
                           histogram: Array[Long], feature: Array[Float])

  /** Deterministic media corpus derived from the documents table: the text
    * bytes stand in for encoded media payloads (stable, seedless).
    */
  def assets(spark: SparkSession, sfDir: String): Dataset[MediaAsset] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id").as("asset_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("media"),
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height"),
        (col("doc_id") * 40 % 60000).as("duration_ms"))
      .as[MediaAsset]
  }

  /** The stubbed codec. Real implementation would JNI into an image/audio
    * library; this fake is deterministic so tests can assert exact values.
    */
  object FakeCodec {
    /** STUB: real decode (JPEG/PNG/PCM/H.264) unavailable in-container.
      * Deterministic fake: 16-bin byte histogram as the "decoded" signal. */
    def decode(media: Array[Byte]): Array[Long] = {
      val hist = new Array[Long](16)
      var i = 0
      while (i < media.length) { hist((media(i) & 0xFF) >> 4) += 1; i += 1 }
      hist
    }

    /** STUB resize/feature-extract: L1-normalized histogram as embedding. */
    def features(hist: Array[Long]): Array[Float] = {
      val total = math.max(1L, hist.sum).toFloat
      hist.map(_ / total)
    }

    /** STUB frame-sample: every nth byte window stands in for frames. */
    def sampleFrames(media: Array[Byte], everyN: Int): Seq[Array[Byte]] =
      media.grouped(everyN).take(8).toSeq
  }

  /** Batched decode/extract: per-partition imperative loop (genuine
    * per-partition logic — the one place `mapPartitions` is warranted),
    * preserving Spark's batch shape: one task per input split, no
    * driver-side collection.
    */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { a =>
        val hist = FakeCodec.decode(a.media)
        MediaFeatures(a.asset_id, a.kind, a.media.length, hist, FakeCodec.features(hist))
      }
    }
  }

  /** Relational summary over the extracted features (oracle-checkable: the
    * fake decode is byte arithmetic reproducible in SQL).
    */
  def mediaSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(assets(spark, sfDir))
      .select(col("asset_id"), col("kind"), col("n_bytes"),
        element_at(col("histogram"), 7).as("hist_bin6"),
        element_at(col("histogram"), 8).as("hist_bin7"))
  }
}
