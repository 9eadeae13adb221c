package graft.pipeline

/** The table-format seam: the catalog operations the engine needs from its
  * durable commit log. [[Manifest]] is the directory-backed implementation;
  * a real Iceberg catalog implements the same contract (snapshot-id lineage,
  * atomic per-partition commits, as-of reads) without touching callers.
  *
  * The contract a conforming implementation must honor (and that
  * `TableFormatConformance` verifies):
  *   - a partition is committed exactly once per name; re-listing after a
  *     crash must never show a half-commit;
  *   - `currentSnapshot()` is monotone in commits; snapshot 0 = empty table;
  *   - `committedAsOf(s)` reconstructs the committed set at any s ≤ head
  *     (time travel), and `committedAsOf(currentSnapshot())` equals the
  *     live committed set;
  *   - `clear()` resets the lineage WITH the partition state.
  */
trait TableFormat {
  def commitPartition(partition: String, rowsOut: Long,
                      inputFiles: Seq[String]): Unit
  def isPartitionCommitted(partition: String): Boolean
  def committed(): Set[String]
  def currentSnapshot(): Long
  def committedAsOf(snapshot: Long): Set[String]
  def clear(): Unit
}
