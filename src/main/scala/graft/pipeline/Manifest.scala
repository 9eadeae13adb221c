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
final class Manifest(manifestDir: String) extends TableFormat {

  // ---- TableFormat conformance (the Iceberg-replaceable surface) ----
  override def commitPartition(partition: String, rowsOut: Long,
                               inputFiles: Seq[String]): Unit =
    commit(PartitionEntry(partition, "committed", rowsOut,
      Map("out" -> rowsOut), inputFiles, 0L))
  override def isPartitionCommitted(partition: String): Boolean =
    isCommitted(partition)
  override def committed(): Set[String] = committedPartitions()
  override def committedAsOf(snapshot: Long): Set[String] =
    committedPartitionsAsOf(snapshot).map(sanitize)

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
    appendSnapshot(e)
  }

  // -------------------------------------------------------------------
  // Iceberg-shaped snapshot log: every commit also appends a
  // sequence-numbered snapshot entry with a parent pointer — the lineage
  // chain a real Iceberg catalog keeps per table commit. As-of reads
  // reconstruct the committed partition set at any earlier snapshot
  // (time travel over the run's own history). A real Iceberg catalog can
  // replace this directory without touching callers.
  // -------------------------------------------------------------------
  private val snapDir: Path = dir.resolve("_snapshots")

  // cached head sequence: one directory listing at construction, O(1) per
  // commit after (a per-commit full listing would be O(N²) over a run)
  private var lastSeq: Long = -1L

  private def snapshotSeqs(): Seq[Long] = {
    if (!Files.isDirectory(snapDir)) return Seq.empty
    val s = Files.list(snapDir)
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".json") && !n.startsWith("."))
      .map(_.stripSuffix(".json").toLong)
      .toSeq.sorted
    finally s.close()
  }

  private def appendSnapshot(e: PartitionEntry): Unit = {
    Files.createDirectories(snapDir)
    if (lastSeq < 0) lastSeq = snapshotSeqs().lastOption.getOrElse(0L)
    val seq = lastSeq + 1
    val parent = seq - 1
    val json =
      s"""{"sequence_number": $seq, "parent_id": $parent,
         | "partition": ${q(e.partition)}, "rows_out": ${e.rowsWritten},
         | "input_files": [${e.inputFiles.map(q).mkString(", ")}]}""".stripMargin
    val tmp = snapDir.resolve(s".$seq.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, snapDir.resolve(f"$seq%d.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    lastSeq = seq
  }

  // Crash reconciliation: commit() writes the partition entry, then the
  // snapshot entry — a kill between the two leaves a committed partition
  // with no lineage row (isCommitted() then skips it on resume, so the
  // lineage would disagree with committedPartitions() forever). Heal at
  // construction: re-append a snapshot entry for every committed partition
  // the lineage is missing, reconstructed from the partition file itself.
  locally {
    val inLineage: Set[String] =
      if (!Files.isDirectory(snapDir)) Set.empty
      else snapshotSeqs().flatMap { n =>
        val body = new String(Files.readAllBytes(snapDir.resolve(s"$n.json")),
          StandardCharsets.UTF_8)
        """"partition":\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(body)
          .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
      }.toSet
    val lineageStems = inLineage.map(sanitize)
    committedPartitions().toSeq.sorted
      .filterNot(stem => lineageStems.contains(stem)).foreach { stem =>
        val body = new String(
          Files.readAllBytes(dir.resolve(s"$stem.json")), StandardCharsets.UTF_8)
        // the raw (unsanitized) partition name lives in the entry body
        val p = """"partition":\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(body)
          .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
          .getOrElse(stem)
        val rowsOut = """"rows_out":\s*(-?\d+)""".r.findFirstMatchIn(body)
          .map(_.group(1).toLong).getOrElse(-1L)
        val files = """"input_files":\s*\[([^\]]*)\]""".r.findFirstMatchIn(body)
          .map(_.group(1)).getOrElse("")
          .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
          .filter(_.nonEmpty).toSeq
        appendSnapshot(PartitionEntry(p, "committed", -1L, Map.empty,
          files, 0L, rowsOut))
      }
  }

  /** Current snapshot id (0 = empty table). */
  def currentSnapshot(): Long = snapshotSeqs().lastOption.getOrElse(0L)

  /** Time travel: the committed partition set as of snapshot `seq`. */
  def committedPartitionsAsOf(seq: Long): Set[String] =
    snapshotSeqs().filter(_ <= seq).map { n =>
      val body = new String(Files.readAllBytes(snapDir.resolve(s"$n.json")),
        StandardCharsets.UTF_8)
      """"partition":\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(body)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
        .getOrElse(throw new IllegalStateException(s"corrupt snapshot $n"))
    }.toSet

  def clear(): Unit = {
    val s = Files.list(dir)
    try s.iterator().asScala.filter(_.toString.endsWith(".json")).foreach(Files.delete)
    finally s.close()
    // the snapshot lineage must clear WITH the partition state, else
    // time travel would claim cleared partitions are still committed
    if (Files.isDirectory(snapDir)) {
      val sn = Files.list(snapDir)
      try sn.iterator().asScala.filter(_.toString.endsWith(".json")).foreach(Files.delete)
      finally sn.close()
    }
    lastSeq = 0L
  }

  private def sanitize(s: String): String = s.replaceAll("[^A-Za-z0-9=_-]", "_")
  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
}
