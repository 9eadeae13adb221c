package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Run manifest: per-partition commit log with lineage + metrics, the
  * engine's durable state for checkpointed resume.
  *
  * Semantics mirror the reference's rehydration checkpoint
  * (internal/blobconsume/checkpoint.go:27-68): a killed run must resume
  * without re-processing committed partitions (`ShouldParse` parity), and a
  * partition only commits after ALL its sinks succeed (matching the route
  * error propagation in routereceiver/receiver.go:84-99).
  *
  * Layout: `<manifestDir>/<partitionKey>.json`, written atomically
  * (tmp + rename). This is the "Iceberg-shaped" snapshot log of SURVEY §7 —
  * one entry per hour partition; a real Iceberg catalog can replace the
  * directory without touching callers (the [[Manifest]] API is the seam).
  */
final class Manifest(manifestDir: String) {

  private val dir: Path = Paths.get(manifestDir)
  Files.createDirectories(dir)

  case class PartitionEntry(partition: String, status: String,
                            rowsIn: Long, sinkCounts: Map[String, Long],
                            inputFiles: Seq[String], wallMs: Long,
                            rowsOut: Long = -1L) {
    /** rows_out defaults to the sink total when not supplied separately. */
    def rowsWritten: Long = if (rowsOut >= 0) rowsOut else sinkCounts.values.sum
  }

  /** ShouldParse parity: a partition is skipped iff previously committed. */
  def isCommitted(partition: String): Boolean =
    Files.exists(dir.resolve(s"${sanitize(partition)}.json"))

  def committedPartitions(): Set[String] = {
    val s = Files.list(dir)
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json"))
      .toSet
    finally s.close()
  }

  /** Commit a partition: all-sinks-succeeded is the caller's contract; the
    * write is atomic so a kill mid-commit leaves either no entry (partition
    * re-runs, idempotent because sink writes are dynamic-partition
    * overwrites) or a complete one.
    */
  def commit(e: PartitionEntry): Unit = {
    val json =
      s"""{"partition": ${q(e.partition)}, "status": ${q(e.status)},
         | "rows_in": ${e.rowsIn}, "rows_out": ${e.rowsWritten},
         | "sink_counts": {${e.sinkCounts.map { case (k, v) => s"${q(k)}: $v" }.mkString(", ")}},
         | "input_files": [${e.inputFiles.map(q).mkString(", ")}],
         | "wall_ms": ${e.wallMs}}""".stripMargin
    val target = dir.resolve(s"${sanitize(e.partition)}.json")
    val tmp = dir.resolve(s".${sanitize(e.partition)}.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  def clear(): Unit = {
    val s = Files.list(dir)
    try s.iterator().asScala.filter(_.toString.endsWith(".json")).foreach(Files.delete)
    finally s.close()
  }

  private def sanitize(s: String): String = s.replaceAll("[^A-Za-z0-9=_-]", "_")
  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
